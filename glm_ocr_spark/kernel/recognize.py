"""Per-region "recognition": extract content from a block's char span.

The CPU stand-in for the reference's remote OCR call
(/root/reference/glmocr/ocr_client.py:227-318 + pipeline.py:430-507): instead
of cropping pixels and POSTing to a model, we slice the payload by char span
(the crop analog, SURVEY.md §2.2 P3) and strip markup. Task dispatch mirrors
the reference's task_prompt_mapping selection (page_loader.py:281-285):

  - text    -> tag-stripped, entity-unescaped text
  - table   -> <tr>/<td> HTML converted to a Markdown table (the reference
               model emits Markdown/HTML tables); passthrough if no rows
  - formula -> raw text (LaTeX), tags stripped; formatter wraps in $$
  - skip    -> None (pipeline.py:458-462: chart/image kept but not OCR'd)
"""

from __future__ import annotations

import re

_TAG_RE = re.compile(r"<[^>]+>")
_TR_RE = re.compile(r"<tr\b[^>]*>(.*?)</tr>", re.DOTALL | re.IGNORECASE)
_CELL_RE = re.compile(r"<t[dh]\b[^>]*>(.*?)</t[dh]>", re.DOTALL | re.IGNORECASE)

_ENTITIES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),  # last, so &amp;lt; decodes to &lt; not <
)


def unescape(text: str) -> str:
    if "&" not in text:
        return text
    for ent, ch in _ENTITIES:
        text = text.replace(ent, ch)
    return text


def strip_markup(fragment: str) -> str:
    if "<" in fragment:
        fragment = _TAG_RE.sub("", fragment)
    return unescape(fragment)


def table_to_markdown(fragment: str) -> str:
    """Convert <tr><td> rows into a Markdown table; passthrough otherwise."""
    rows = _TR_RE.findall(fragment)
    if not rows:
        return strip_markup(fragment).strip()
    parsed = [[strip_markup(c).strip() for c in _CELL_RE.findall(r)] for r in rows]
    parsed = [r for r in parsed if r]
    if not parsed:
        return strip_markup(fragment).strip()
    lines = ["| " + " | ".join(parsed[0]) + " |",
             "| " + " | ".join("---" for _ in parsed[0]) + " |"]
    for row in parsed[1:]:
        lines.append("| " + " | ".join(row) + " |")
    return "\n".join(lines)


def recognize(payload: str, span: tuple[int, int], task_type: str) -> str | None:
    """Produce a block's content string from its span, by task type."""
    if task_type == "skip":
        return None
    fragment = payload[span[0]:span[1]]
    if task_type == "table":
        return table_to_markdown(fragment)
    if task_type == "formula":
        return strip_markup(fragment).strip()
    # text (and any future task types default to text handling)
    return strip_markup(fragment)
