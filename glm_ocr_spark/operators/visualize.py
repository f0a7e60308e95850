"""K3: layout visualization sink — SVG analog of the reference's
jpg-rendering debug sink.

The reference (glmocr/utils/visualization_utils.py:195-371 draw_layout_boxes,
:372-389 save_layout_visualization) rasterizes boxes/labels onto the page
image with PIL/cv2. No media libraries exist in this environment, and at
100 TB a raster debug sink is the wrong shape anyway — so the Spark-native
analog renders the SAME visual semantics as SVG text:

  - the 20-color palette and its label->color assignment rule
    (color of the FIRST box index where a label appears, mod 20 —
    visualization_utils.py:241-250)
  - font color by background-color index (light_indices rule,
    visualization_utils.py:97-117)
  - rect outline, label+score badge at the box's top-left, red reading-order
    number at the top-right (with the same edge-flip when the box touches
    the right page border)
  - font size max(0.018*w + 2, 12), stroke max(0.002*max(w,h), 2)
    (visualization_utils.py:262-266)

SVG strings are pure column data — renderable by any browser, diffable in
tests, and writable by a plain text sink (no executor-side image codecs).
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# The reference's 20-color palette (visualization_utils.py:10-95), RGB.
COLORMAP: list[tuple[int, int, int]] = [
    (0xFF, 0x00, 0x00), (0xCC, 0xFF, 0x00), (0x00, 0xFF, 0x66),
    (0x00, 0x66, 0xFF), (0xCC, 0x00, 0xFF), (0xFF, 0x4D, 0x00),
    (0x80, 0xFF, 0x00), (0x00, 0xFF, 0xB2), (0x00, 0x1A, 0xFF),
    (0xFF, 0x00, 0xE5), (0xFF, 0x99, 0x00), (0x33, 0xFF, 0x00),
    (0x00, 0xFF, 0xFF), (0x33, 0x00, 0xFF), (0xFF, 0x00, 0x99),
    (0xFF, 0xE5, 0x00), (0x00, 0xFF, 0x1A), (0x00, 0xB2, 0xFF),
    (0x80, 0x00, 0xFF), (0xFF, 0x00, 0x4D),
]
_DARK = (0x14, 0x0E, 0x35)
_LIGHT = (0xFF, 0xFF, 0xFF)
# Background indices needing light text (visualization_utils.py:111)
_LIGHT_INDICES = frozenset([0, 3, 4, 8, 9, 13, 14, 18, 19])


def font_colormap(color_index: int) -> tuple[int, int, int]:
    return _LIGHT if color_index in _LIGHT_INDICES else _DARK


def _rgb(c: tuple[int, int, int]) -> str:
    return f"rgb({c[0]},{c[1]},{c[2]})"


def render_layout_svg(regions: list[dict], page_w: int = 1000,
                      page_h: int = 1000, show_label: bool = True,
                      show_score: bool = True,
                      show_index: bool = True) -> str:
    """One page's region list -> standalone SVG document string.

    regions: dicts with label, bbox_2d ([x1,y1,x2,y2], page coords);
    optional score (float) and index. Deterministic output — byte-equal
    across runs and partitions for the same input.
    """
    font_size = max(int(0.018 * page_w) + 2, 12)
    thickness = max(int(max(page_w, page_h) * 0.002), 2)

    # label -> color by first-seen box index (reference rule)
    label2idx: dict[str, int] = {}
    for i, r in enumerate(regions):
        label = r.get("label", "unknown")
        if label not in label2idx:
            label2idx[label] = i % len(COLORMAP)

    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{page_w}" '
        f'height="{page_h}" viewBox="0 0 {page_w} {page_h}">',
        f'<rect width="{page_w}" height="{page_h}" fill="white"/>',
    ]
    for i, r in enumerate(regions):
        bbox = r.get("bbox_2d") or r.get("bbox")
        if not bbox:
            continue
        label = r.get("label", "unknown")
        ci = label2idx[label]
        color = _rgb(COLORMAP[ci])
        fcolor = _rgb(font_colormap(ci))
        x1 = max(0, min(int(bbox[0]), page_w - 1))
        y1 = max(0, min(int(bbox[1]), page_h - 1))
        x2 = max(0, min(int(bbox[2]), page_w - 1))
        y2 = max(0, min(int(bbox[3]), page_h - 1))
        # reversed corners (x2 < x1 / y2 < y1, possible on inputs that
        # bypassed the F8 clamp) would emit negative width/height — invalid
        # SVG per spec; normalize so the rect is always well-formed
        x1, x2 = min(x1, x2), max(x1, x2)
        y1, y2 = min(y1, y2), max(y1, y2)
        parts.append(
            f'<rect x="{x1}" y="{y1}" width="{x2 - x1}" '
            f'height="{y2 - y1}" fill="none" stroke="{color}" '
            f'stroke-width="{thickness}"/>')
        text_parts = []
        if show_label:
            text_parts.append(label)
        if show_score and r.get("score") is not None:
            text_parts.append(f"{float(r['score']):.2f}")
        if text_parts:
            text = " ".join(text_parts)
            tw, th = len(text) * (font_size * 6 // 10), font_size + 4
            # badge above the box unless it touches the top edge
            by = y1 if y1 < th else y1 - th
            parts.append(
                f'<rect x="{x1}" y="{by}" width="{tw + 4}" '
                f'height="{th + 1}" fill="{color}"/>')
            parts.append(
                f'<text x="{x1 + 2}" y="{by + font_size}" '
                f'font-size="{font_size}" fill="{fcolor}">{_esc(text)}'
                '</text>')
        if show_index:
            # red order number at top-right; flip inside when the box
            # touches the right page border (reference edge rule)
            tx = x2 + 2
            if page_w - x2 < font_size * 1.2:
                tx = int(x2 - font_size * 1.1)
            parts.append(
                f'<text x="{tx}" y="{y1 + font_size // 2}" '
                f'font-size="{font_size}" fill="red">{i + 1}</text>')
    parts.append("</svg>")
    return "".join(parts)


def _esc(s: str) -> str:
    return (s.replace("&", "&amp;").replace("<", "&lt;")
            .replace(">", "&gt;"))


def with_layout_svg(extracted: DataFrame,
                    json_col: str = "json") -> DataFrame:
    """Add a `layout_svg` column rendered from the serialized region list
    (the pipeline's `json` column: [[{index,label,content,bbox_2d}..]]).

    Arrow-batched pandas UDF — one json.loads + string build per row, no
    shuffle; at 100 TB this is a narrow map over the extracted table.
    """
    @F.pandas_udf(T.StringType())
    def _render(js: pd.Series) -> pd.Series:
        def one(s):
            if not s:
                return render_layout_svg([])
            pages = json.loads(s)
            regions = pages[0] if pages else []
            # pass the FULL region list: render_layout_svg skips bboxless
            # regions itself while keeping their positions, so reading-
            # order numbers and first-seen color indices stay aligned with
            # the true region list (pre-filtering compacted them — review
            # finding)
            return render_layout_svg(regions)
        return js.map(one)

    return extracted.withColumn("layout_svg", _render(F.col(json_col)))


def save_layout_svgs(extracted: DataFrame, out_dir: str,
                     json_col: str = "json") -> int:
    """K3 sink: write one .svg file per turn to out_dir
    (`{conv_id}_{turn_idx}.svg`), via pyarrow.fs so s3://, hdfs://, gs://
    and local paths all work (same portability rule as state._partition_
    stats). Executor-side writes from mapInPandas — no driver collect.
    Returns the number of files written."""
    svgs = with_layout_svg(extracted, json_col).select(
        "conv_id", "turn_idx", "layout_svg")

    def _write(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyarrow import fs as pafs
        filesystem, root = pafs.FileSystem.from_uri(out_dir)
        filesystem.create_dir(root, recursive=True)
        n = 0
        for pdf in batches:
            for cid, tix, svg in zip(pdf["conv_id"], pdf["turn_idx"],
                                     pdf["layout_svg"]):
                path = f"{root}/{cid}_{int(tix)}.svg"
                with filesystem.open_output_stream(path) as f:
                    f.write(svg.encode("utf-8"))
                n += 1
        yield pd.DataFrame({"n_written": [n]})

    counts = svgs.mapInPandas(_write, "n_written long")
    return int(counts.agg(F.sum("n_written")).first()[0] or 0)
