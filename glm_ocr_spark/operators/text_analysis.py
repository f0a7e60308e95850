"""Text-analysis operators over a documents table (doc_id, text, lang,
source, n_chars).

All pure column expressions (JVM-side, whole-stage codegen) — no Python in
the hot path. Each has an exact ANSI-SQL twin in __spark_entry__.oracle_sql
so DuckDB can verify it.

Scale notes: every operator here is a narrow map over the scan — no shuffle,
filters and column pruning push down to parquet. At 100 TB these run at
scan speed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Shared spec constants — the SQL oracles in __spark_entry__ must use the
# same values/patterns.
STOPWORD_PATTERN = r"\b(the|a|an|of|and|in|to|is|for|on|with)\b"
PUNCT_PATTERN = r"[.,;:!?]"
CJK_PATTERN = "[\\u4e00-\\u9fff]"


def token_count_col(text: Column) -> Column:
    """Whitespace token count; empty/blank text counts 0."""
    return F.when(F.trim(text) == "", F.lit(0)).otherwise(
        F.size(F.split(F.trim(text), r"\s+"))
    )


def with_token_count(docs: DataFrame) -> DataFrame:
    return docs.select(
        "doc_id", token_count_col(F.col("text")).alias("n_tokens")
    )


def with_quality_score(docs: DataFrame) -> DataFrame:
    """Length / punctuation / stopword-ratio quality score in [0, 1]
    (the Arc90/trafilatura-style boilerplate scoring of SURVEY.md §7.1.3,
    lifted from per-block to per-document granularity)."""
    n_chars = F.length("text")
    n_tokens = token_count_col(F.col("text"))
    n_stop = F.regexp_count(F.col("text"), F.lit(STOPWORD_PATTERN))
    n_punct = F.regexp_count(F.col("text"), F.lit(PUNCT_PATTERN))
    stop_ratio = F.when(n_tokens > 0, n_stop / n_tokens).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    length_term = F.least(F.lit(1.0), n_chars / F.lit(500.0))
    score = (
        F.lit(0.4) * length_term
        + F.lit(0.4) * F.least(F.lit(1.0), stop_ratio * 4)
        + F.lit(0.2) * (F.lit(1.0) - F.least(F.lit(1.0), punct_ratio * 10))
    )
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(score, 6).alias("quality_score"),
    )


def with_lang_id(docs: DataFrame) -> DataFrame:
    """Heuristic language ID: CJK codepoints -> zh, else stopword votes
    between en/de/es/fr function words; unknown -> und."""
    text = F.col("text")
    votes = {
        "en": F.regexp_count(text, F.lit(r"\b(the|and|of|is|are)\b")),
        "de": F.regexp_count(text, F.lit(r"\b(der|die|das|und|ist)\b")),
        "es": F.regexp_count(text, F.lit(r"\b(el|la|los|las|es|y)\b")),
        "fr": F.regexp_count(text, F.lit(r"\b(le|la|les|est|et|une)\b")),
    }
    best = (
        F.when(F.regexp_count(text, F.lit(CJK_PATTERN)) > 0, F.lit("zh"))
        .when(
            (votes["en"] >= votes["de"]) & (votes["en"] >= votes["es"])
            & (votes["en"] >= votes["fr"]) & (votes["en"] > 0), F.lit("en"))
        .when((votes["de"] >= votes["es"]) & (votes["de"] >= votes["fr"])
              & (votes["de"] > 0), F.lit("de"))
        .when((votes["es"] >= votes["fr"]) & (votes["es"] > 0), F.lit("es"))
        .when(votes["fr"] > 0, F.lit("fr"))
        .otherwise(F.lit("und"))
    )
    return docs.select("doc_id", "lang", best.alias("lang_pred"))


def with_fingerprint(docs: DataFrame) -> DataFrame:
    """Document fingerprint: md5 of whitespace-normalized lowercase text
    (the content-hash half of the dedup family)."""
    norm = F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " "))
    return docs.select(
        "doc_id", F.md5(F.encode(norm, "UTF-8")).alias("fingerprint")
    )
