"""Static configuration: label vocabulary, task maps, thresholds, merge modes.

Mirrors the reference's config surface (behavioral parity only):
  - id2label 25-class vocabulary: /root/reference/glmocr/config.yaml:272-297
  - label_task_mapping:            config.yaml:239-269
  - label_visualization_mapping:   config.yaml:150-171
  - threshold (0.3):               config.yaml:186
  - layout_merge_bboxes_mode:      config.yaml:208-233
  - layout_unclip_ratio (1.0,1.0): config.yaml:204-206
  - NMS thresholds (0.6 / 0.98):   glmocr/utils/layout_postprocess_utils.py:31,238

All values are plain Python constants so they can be shipped to executors
inside pandas UDF closures with zero I/O.
"""

from __future__ import annotations

ID2LABEL: dict[int, str] = {
    0: "abstract",
    1: "algorithm",
    2: "aside_text",
    3: "chart",
    4: "content",
    5: "display_formula",
    6: "doc_title",
    7: "figure_title",
    8: "footer",
    9: "footer_image",
    10: "footnote",
    11: "formula_number",
    12: "header",
    13: "header_image",
    14: "image",
    15: "inline_formula",
    16: "number",
    17: "paragraph_title",
    18: "reference",
    19: "reference_content",
    20: "seal",
    21: "table",
    22: "text",
    23: "vertical_text",
    24: "vision_footnote",
}

LABEL2ID: dict[str, int] = {v: k for k, v in ID2LABEL.items()}

# label -> OCR task type (reference config.yaml:239-269)
LABEL_TASK_MAPPING: dict[str, list[str]] = {
    "text": [
        "abstract",
        "algorithm",
        "content",
        "doc_title",
        "figure_title",
        "paragraph_title",
        "reference_content",
        "text",
        "vertical_text",
        "vision_footnote",
        "seal",
        "formula_number",
    ],
    "table": ["table"],
    "formula": ["display_formula", "inline_formula"],
    "skip": ["chart", "image"],
    "abandon": [
        "header",
        "footer",
        "number",
        "footnote",
        "aside_text",
        "reference",
        "footer_image",
        "header_image",
    ],
}

LABEL_TO_TASK: dict[str, str] = {
    label: task for task, labels in LABEL_TASK_MAPPING.items() for label in labels
}

# label -> coarse visualization/output label (reference config.yaml:150-171,
# applied in result_formatter.py:300-310)
LABEL_VISUALIZATION_MAPPING: dict[str, list[str]] = {
    "table": ["table"],
    "formula": ["display_formula", "inline_formula"],
    "image": ["chart", "image"],
    "text": [
        "abstract",
        "algorithm",
        "content",
        "doc_title",
        "figure_title",
        "paragraph_title",
        "reference_content",
        "text",
        "vertical_text",
        "vision_footnote",
        "seal",
        "formula_number",
    ],
}

LABEL_TO_VIS: dict[str, str] = {
    label: vis for vis, labels in LABEL_VISUALIZATION_MAPPING.items() for label in labels
}

# Detection score threshold (reference config.yaml:186) and optional
# per-class overrides (glmocr/config.py:176, layout_detector.py:92-153).
SCORE_THRESHOLD: float = 0.3
SCORE_THRESHOLD_BY_CLASS: dict[int, float] = {}

# NMS thresholds (layout_postprocess_utils.py:31; iou_diff=0.98 at :238)
NMS_IOU_SAME: float = 0.6
NMS_IOU_DIFF: float = 0.98

# Oversized-image filter (layout_postprocess_utils.py:242-247)
OVERSIZE_AREA_THRESHOLD_LANDSCAPE: float = 0.82
OVERSIZE_AREA_THRESHOLD_PORTRAIT: float = 0.93

# Containment (layout_postprocess_utils.py:64-77)
CONTAINMENT_OVERLAP_RATIO: float = 0.8

# Per-class merge mode (reference config.yaml:208-233): all 'large' except
# reference(18) = 'small'.
LAYOUT_MERGE_BBOXES_MODE: dict[int, str] = {i: "large" for i in range(25)}
LAYOUT_MERGE_BBOXES_MODE[18] = "small"

# Labels always preserved by the containment filter
# (layout_postprocess_utils.py:269-273)
PRESERVE_LABELS: tuple[str, ...] = ("image", "seal", "chart")
PRESERVE_CLASS_IDS: frozenset[int] = frozenset(LABEL2ID[x] for x in PRESERVE_LABELS)

# Unclip ratio (reference default (1.0, 1.0) = no-op, config.yaml:204-206)
LAYOUT_UNCLIP_RATIO: tuple[float, float] = (1.0, 1.0)

# Virtual page geometry: all spans/bboxes are normalized to a 0-1000 page,
# matching the reference's bbox convention (layout_detector.py:288-299).
PAGE_WIDTH: int = 1000
PAGE_HEIGHT: int = 1000

# Hyphenation-merge zipf threshold (result_formatter.py:367-368)
HYPHEN_MERGE_ZIPF_THRESHOLD: float = 2.5

# Bullet left-alignment threshold (result_formatter.py:390)
BULLET_LEFT_ALIGN_THRESHOLD: float = 10.0
