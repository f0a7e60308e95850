"""Payload canonicalization (P1/P2 of SURVEY.md §2.2).

The reference's image-side preprocessing — smart_resize snapping dimensions
to patch multiples and clamping total pixels
(/root/reference/glmocr/utils/image_utils.py:13-59), plus RGB re-encode
canonicalization (:145-177) — has a text analog:

  - unicode NFC normalization + newline canonicalization (\\r\\n -> \\n),
    the "re-encode" step;
  - length clamping to a pixel-budget analog: payloads above `max_chars`
    are truncated at the nearest block/paragraph boundary at or below the
    limit (never mid-tag), as smart_resize clamps to max_pixels while
    preserving structure (aspect ratio there, block boundaries here);
  - a `min_chars` floor mirrors min_pixels: degenerate payloads pass
    through untouched (nothing to normalize against).

Applied optionally before segmentation; extraction semantics on payloads
within budget are unchanged (identity for the common case).
"""

from __future__ import annotations

import re
import unicodedata

# defaults mirror the spirit of min_pixels/max_pixels (config.yaml:96-97):
# a generous ceiling that only triggers on pathological payloads
MAX_CHARS_DEFAULT = 262_144
MIN_CHARS_DEFAULT = 1

_BOUNDARY_RE = re.compile(r"</block>|\n\s*\n")


def canonicalize_payload(payload: str | None,
                         max_chars: int = MAX_CHARS_DEFAULT,
                         min_chars: int = MIN_CHARS_DEFAULT) -> str | None:
    """NFC + newline normalization + structure-preserving length clamp."""
    if payload is None:
        return None
    out = unicodedata.normalize("NFC", payload)
    out = out.replace("\r\n", "\n").replace("\r", "\n")
    if len(out) < min_chars or len(out) <= max_chars:
        return out
    # truncate at the last block/paragraph boundary within budget
    cut = 0
    for m in _BOUNDARY_RE.finditer(out, 0, max_chars):
        cut = m.end()
    return out[:cut] if cut > 0 else out[:max_chars]
