"""Column-expression versions of the T-ops (SURVEY.md §2.7).

The kernel implements T1-T8 in Python for the per-turn pandas path; these
are the same semantics as reusable Catalyst column expressions for
relational pipelines (whole-stage codegen, no Python). Where Java regex
backreferences would be needed (`(\\.)\\1{2,}`), the pattern is rewritten
backreference-free (`\\.{4,}`) with identical output.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from glm_ocr_spark.config import LABEL_TO_VIS


def clean_punct_runs_col(c: Column) -> Column:
    """T1: collapse >=4 runs of . · _ to exactly 3
    (result_formatter.py:228-231)."""
    c = F.regexp_replace(c, r"\.{4,}", "...")
    c = F.regexp_replace(c, "·{4,}", "···")
    c = F.regexp_replace(c, "_{4,}", "___")
    return c


def title_format_col(c: Column, is_doc_title: Column) -> Column:
    """T5: strip leading #/-/* markers, prefix '# ' or '## '
    (result_formatter.py:247-256)."""
    stripped = F.regexp_replace(c, r"^[#\-\*\s]+", "")
    return F.when(is_doc_title, F.concat(F.lit("# "), stripped)) \
            .otherwise(F.concat(F.lit("## "), stripped))


def formula_wrap_col(c: Column) -> Column:
    """T6: unwrap $$..$$ / \\[..\\] / \\(..\\), re-wrap as $$\\n..\\n$$
    (result_formatter.py:258-270)."""
    unwrapped = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(c, r"^\$\$(.*)\$\$$", r"$1"),
            r"^\\\[(.*)\\\]$", r"$1"),
        r"^\\\((.*)\\\)$", r"$1")
    return F.concat(F.lit("$$\n"), F.trim(unwrapped), F.lit("\n$$"))


def enum_normalize_col(c: Column) -> Column:
    """T7: bullet/enumeration prefixes -> canonical '- ' / '(n) '
    (result_formatter.py:272-297)."""
    c = F.regexp_replace(c, r"^[·•]\s*", "- ")
    c = F.regexp_replace(c, r"^\*\s+", "- ")
    c = F.regexp_replace(c, r"^\((\d+)\)\s*", r"($1) ")
    return c


def map_label_col(c: Column) -> Column:
    """T8: native 25-class label -> coarse output label as a chained when
    (broadcastable alternative: a tiny dim-table join)."""
    expr = None
    for native, coarse in LABEL_TO_VIS.items():
        cond = c == native
        expr = F.when(cond, coarse) if expr is None else expr.when(cond, coarse)
    return expr.otherwise(c)
