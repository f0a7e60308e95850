"""Content cleaning and per-class formatting (T1-T8 of SURVEY.md §2.7).

Behavioral parity with:
  - _clean_content:            /root/reference/glmocr/postprocess/result_formatter.py:218-237
  - find_consecutive_repeat:   /root/reference/glmocr/utils/result_postprocess_utils.py:8-44
  - clean_repeated_content:    result_postprocess_utils.py:47-98
  - clean_formula_number:      result_postprocess_utils.py:101-115
  - _format_content (titles/formula/text): result_formatter.py:239-298
  - _map_label:                result_formatter.py:300-310
"""

from __future__ import annotations

import re
from collections import Counter

from glm_ocr_spark.config import LABEL_TO_VIS

_LEADING_TAB_RE = re.compile(r"^(\\t)+")
_TRAILING_TAB_RE = re.compile(r"(\\t)+$")
_DOT_RUN_RE = re.compile(r"(\.)\1{2,}")
_MIDDOT_RUN_RE = re.compile(r"(·)\1{2,}")
_UNDERSCORE_RUN_RE = re.compile(r"(_)\1{2,}")
_ESC_UNDERSCORE_RUN_RE = re.compile(r"(\\_)\1{2,}")
_HASH_PREFIX_RE = re.compile(r"^#+\s*")
_PAREN_ENUM_RE = re.compile(r"^(\(|\（)(\d+|[A-Za-z])(\)|\）)(.*)$")
_DOT_ENUM_RE = re.compile(r"^(\d+|[A-Za-z])(\.|\)|\）)(.*)$")
_SINGLE_NEWLINE_RE = re.compile(r"(?<!\n)\n(?!\n)")


def find_consecutive_repeat(s: str, min_unit_len: int = 10,
                            min_repeats: int = 10) -> str | None:
    """Truncate at the first >=min_repeats consecutive repeat of a
    >=min_unit_len unit, keeping one unit; None if no repeat found."""
    n = len(s)
    if n < min_unit_len * min_repeats:
        return None
    max_unit_len = n // min_repeats
    if max_unit_len < min_unit_len:
        return None
    pattern = re.compile(
        r"(.{%d,%d}?)\1{%d,}" % (min_unit_len, max_unit_len, min_repeats - 1),
        re.DOTALL,
    )
    m = pattern.search(s)
    if m:
        return s[: m.start()] + m.group(1)
    return None


def clean_repeated_content(content: str, min_len: int = 10,
                           min_repeats: int = 10,
                           line_threshold: int = 10) -> str:
    """Consecutive-repeat truncation, then line-frequency repeat truncation."""
    stripped = content.strip()
    if not stripped:
        return content

    if len(stripped) > min_len * min_repeats:
        result = find_consecutive_repeat(stripped, min_unit_len=min_len,
                                         min_repeats=min_repeats)
        if result is not None:
            return result

    lines = [ln.strip() for ln in content.split("\n") if ln.strip()]
    total = len(lines)
    if total >= line_threshold and lines:
        common, count = Counter(lines).most_common(1)[0]
        if count >= line_threshold and (count / total) >= 0.8:
            for i, line in enumerate(lines):
                if line == common:
                    consecutive = sum(
                        1 for j in range(i, min(i + 3, len(lines)))
                        if lines[j] == common
                    )
                    if consecutive >= 3:
                        original = content.split("\n")
                        non_empty = 0
                        for idx, orig in enumerate(original):
                            if orig.strip():
                                non_empty += 1
                                if non_empty == i + 1:
                                    return "\n".join(original[: idx + 1])
                        break
    return content


def clean_formula_number(number_content: str) -> str:
    """Strip one surrounding pair of () or （）."""
    s = number_content.strip()
    if s.startswith("(") and s.endswith(")"):
        return s[1:-1]
    if s.startswith("（") and s.endswith("）"):
        return s[1:-1]
    return s


def clean_content(content: str | None) -> str:
    """T1: strip literal \\t padding, collapse punctuation runs to 3,
    long-content repeat removal, strip."""
    if content is None:
        return ""
    # cheap substring guards: each pattern can only match if its literal
    # trigger is present; identical output, far fewer regex passes
    if "\\t" in content:
        content = _LEADING_TAB_RE.sub("", content).lstrip()
        content = _TRAILING_TAB_RE.sub("", content).rstrip()
    else:
        content = content.strip()
    if "..." in content:
        content = _DOT_RUN_RE.sub(r"\1\1\1", content)
    if "···" in content:
        content = _MIDDOT_RUN_RE.sub(r"\1\1\1", content)
    if "___" in content:
        content = _UNDERSCORE_RUN_RE.sub(r"\1\1\1", content)
    if "\\_\\_\\_" in content:
        content = _ESC_UNDERSCORE_RUN_RE.sub(r"\1\1\1", content)
    if len(content) >= 2048:
        content = clean_repeated_content(content)
    return content.strip()


def map_label(label: str) -> str:
    """T8: native 25-class label -> coarse output label."""
    return LABEL_TO_VIS.get(label, label)


def format_content(content: object, label: str, native_label: str) -> str | None:
    """T5/T6/T7 + T1: per-class content formatting; None passes through."""
    if content is None:
        return None

    content = clean_content(str(content))

    if native_label == "doc_title":
        content = _HASH_PREFIX_RE.sub("", content)
        content = "# " + content
    elif native_label == "paragraph_title":
        if content.startswith("- ") or content.startswith("* "):
            content = content[2:].lstrip()
        content = _HASH_PREFIX_RE.sub("", content)
        content = "## " + content.lstrip()

    if label == "formula":
        if content.startswith("$$") and content.endswith("$$"):
            content = "$$\n" + content[2:-2].strip() + "\n$$"
        elif content.startswith("\\[") and content.endswith("\\]"):
            content = "$$\n" + content[2:-2].strip() + "\n$$"
        elif content.startswith("\\(") and content.endswith("\\)"):
            content = "$$\n" + content[2:-2].strip() + "\n$$"
        else:
            content = "$$\n" + content + "\n$$"

    if label == "text":
        # first-char guards; branch structure is exact because each
        # transform's output prefix ('- ', '(', digit/letter) excludes the
        # later patterns (a '- '/'('-leading string cannot match the dot
        # enum, a transformed enum cannot re-match the bullet/paren forms)
        c0 = content[:1]
        if c0 == "·" or c0 == "•" or (c0 == "*" and content[1:2] == " "):
            content = "- " + content[1:].lstrip()
        elif c0 == "(" or c0 == "（":
            m = _PAREN_ENUM_RE.match(content)
            if m:
                _, symbol, _, rest = m.groups()
                content = f"({symbol}) {rest.lstrip()}"
        elif c0.isalnum():
            m = _DOT_ENUM_RE.match(content)
            if m:
                symbol, sep, rest = m.groups()
                sep = ")" if sep == "）" else sep
                content = f"{symbol}{sep} {rest.lstrip()}"

        if "\n" in content:
            content = _SINGLE_NEWLINE_RE.sub("\n\n", content)

    return content
