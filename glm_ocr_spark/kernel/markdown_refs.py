"""Markdown image-reference extraction and rewrite (K2 + T9 of SURVEY.md §2).

The reference extracts ``![](page=N,bbox=[x1,y1,x2,y2])`` tags from the final
markdown, crops those regions from the page images, saves them under imgs/,
and rewrites the tags to relative paths
(/root/reference/glmocr/utils/markdown_utils.py:19-47 extraction,
:50-142 crop+rewrite). Our geometry is character spans, not pixels, so the
"crop" is a span slice and the rewrite points at a span anchor instead of a
file path — same dataflow, storage-free.
"""

from __future__ import annotations

import re

IMG_REF_RE = re.compile(r"!\[\]\(page=(\d+),bbox=\[([\d,\s]*)\]\)")


def extract_image_refs(markdown: str) -> list[dict]:
    """T9: all image refs as {page, bbox, start, end} (offsets into the
    markdown string). Mirrors markdown_utils.extract_image_references."""
    refs = []
    for m in IMG_REF_RE.finditer(markdown or ""):
        bbox_body = m.group(2).strip()
        bbox = [int(v.strip()) for v in bbox_body.split(",")] if bbox_body else []
        refs.append({
            "page": int(m.group(1)),
            "bbox": bbox,
            "start": m.start(),
            "end": m.end(),
        })
    return refs


def rewrite_image_refs(markdown: str, prefix: str = "imgs/") -> str:
    """K2 rewrite: replace each ref with a stable relative path
    ``![](<prefix>page{N}_{x1}_{y1}_{x2}_{y2}.png)`` — the exact rewrite the
    reference performs after cropping (markdown_utils.py:100-139), minus the
    pixel crop (our payload regions are addressable by span)."""
    def repl(m: re.Match) -> str:
        bbox_body = m.group(2).strip()
        parts = [v.strip() for v in bbox_body.split(",")] if bbox_body else []
        name = "_".join([f"page{m.group(1)}"] + parts)
        return f"![]({prefix}{name}.png)"

    return IMG_REF_RE.sub(repl, markdown or "")
