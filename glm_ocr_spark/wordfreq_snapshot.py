"""Frozen word-frequency snapshot.

The reference validates hyphenation merges with
``wordfreq.zipf_frequency(word, 'en') >= 2.5``
(/root/reference/glmocr/postprocess/result_formatter.py:367-368).

`wordfreq` is not available in this environment and its data drifts between
releases, so we ship a frozen snapshot (SURVEY.md §7.3.6):
``wordfreq_snapshot_data.txt`` — ~22k English words with zipf-scale
frequencies, derived from public English prose (CPython/numpy/pandas/
pyspark documentation text, ~13.5M word tokens) overlaid with a
hand-curated everyday-vocabulary core; see tools/build_wordfreq_snapshot.py
for the provenance and the reproducible build. Words absent from the table
score 0.0 (below every threshold), i.e. their hyphen merges are rejected —
the same failure mode as an out-of-vocabulary word in wordfreq.

The v1 hand-picked table is kept as an overlay (max wins) so no previously
accepted word can lose membership.

This module is pure data + a lookup; it is shared by the Spark kernel and
the single-node oracle so both sides agree byte-for-byte (it is an input,
not logic under test).
"""

from __future__ import annotations

import os

# v1 overlay — zipf ~ log10(frequency per billion words); >= 2.5 means
# ">= ~0.3 per million"
_ZIPF_V1: dict[str, float] = {
    "example": 5.3, "examples": 4.9, "information": 5.5, "process": 5.2,
    "processing": 4.8, "document": 4.9, "documents": 4.7, "extraction": 3.9,
    "computer": 5.0, "computation": 3.8, "understanding": 4.7, "important": 5.3,
    "different": 5.5, "development": 5.1, "experiment": 4.3, "experiments": 4.2,
    "measurement": 3.9, "combination": 4.2, "distribution": 4.4, "partition": 3.6,
    "partitions": 3.2, "performance": 4.8, "international": 4.9, "organization": 4.6,
    "conversation": 4.5, "transformation": 3.9, "implementation": 4.1,
    "configuration": 3.9, "representation": 4.0, "consideration": 4.1,
    "approximately": 4.2, "significant": 4.7, "temperature": 4.5, "university": 5.0,
    "management": 4.9, "environment": 4.8, "community": 5.0, "technology": 4.8,
    "production": 4.8, "application": 4.6, "associated": 4.5, "particular": 4.9,
    "structure": 4.6, "function": 4.8, "functions": 4.4, "research": 5.1,
    "analysis": 4.8, "language": 4.9, "pipeline": 3.7, "parallel": 4.2,
    "sequence": 4.3, "sequential": 3.7, "algorithm": 3.9, "algorithms": 3.7,
    "benchmark": 3.3, "throughput": 3.0, "latency": 3.0, "database": 4.2,
    "cluster": 3.8, "clusters": 3.4, "executor": 2.8, "executors": 2.6,
    "streaming": 3.8, "aggregate": 3.6, "aggregation": 3.2, "column": 4.1,
    "columns": 3.9, "window": 4.8, "windows": 4.5, "table": 4.9, "tables": 4.4,
    "paragraph": 4.0, "section": 4.8, "chapter": 4.6, "formula": 4.0,
    "formulas": 3.4, "equation": 4.0, "equations": 3.8, "number": 5.3,
    "numbers": 4.8, "content": 4.8, "context": 4.6, "extract": 3.9,
    "extracted": 3.7, "because": 5.6, "become": 5.1, "between": 5.4,
    "through": 5.5, "together": 5.2, "control": 5.0, "however": 5.3,
    "therefore": 4.8, "system": 5.2, "systems": 4.9, "model": 4.9,
    "models": 4.5, "result": 5.0, "results": 4.9, "experience": 5.0,
    "knowledge": 4.8, "question": 5.2, "questions": 4.9, "answer": 5.0,
    "answers": 4.5, "problem": 5.2, "problems": 4.9, "solution": 4.6,
    "solutions": 4.3, "possible": 5.2, "probability": 4.1, "statistics": 4.1,
    "machine": 4.7, "learning": 4.9, "network": 4.5, "networks": 4.2,
    "training": 4.7, "dataset": 3.2, "datasets": 2.9, "feature": 4.4,
    "features": 4.5, "vector": 3.7, "vectors": 3.3, "matrix": 3.9,
    "product": 4.8, "products": 4.7, "project": 4.9, "projects": 4.5,
    "service": 4.9, "services": 4.8, "support": 4.9, "supported": 4.3,
    "transcript": 3.3, "transcripts": 2.9, "conversion": 3.7, "converted": 3.9,
    "generated": 4.2, "generation": 4.3, "recognition": 4.1, "detection": 4.0,
    "resolution": 4.2, "evaluation": 4.1, "operation": 4.4, "operations": 4.4,
    "operator": 3.8, "operators": 3.5, "character": 4.5, "characters": 4.3,
    "reading": 4.8, "ordering": 3.5, "layout": 3.9, "region": 4.3,
    "regions": 4.1, "segment": 3.6, "segments": 3.4, "threshold": 3.6,
    "container": 3.7, "containers": 3.3, "continue": 4.9, "continued": 4.5,
    "correct": 4.7, "correctness": 2.8, "complete": 4.8, "completed": 4.5,
    "compression": 3.3, "hypothesis": 3.8, "hyphenation": 1.9,
}

_DATA_PATH = os.path.join(os.path.dirname(__file__),
                          "wordfreq_snapshot_data.txt")

_ZIPF: dict[str, float] | None = None


def _load() -> dict[str, float]:
    global _ZIPF
    if _ZIPF is None:
        table = dict(_ZIPF_V1)
        text = None
        # importlib.resources reads through zipimport too, so a --py-files
        # zip deployment sees the same table as a directory install (a
        # plain open() would silently fall back inside a zip)
        try:
            from importlib import resources

            text = (resources.files("glm_ocr_spark")
                    .joinpath("wordfreq_snapshot_data.txt")
                    .read_text(encoding="utf-8"))
        except Exception:  # noqa: BLE001
            try:
                with open(_DATA_PATH, encoding="utf-8") as f:
                    text = f.read()
            except OSError:
                pass
        if text is not None:
            for line in text.splitlines():
                if line.startswith("#") or not line.strip():
                    continue
                w, z = line.split()
                zf = float(z)
                if table.get(w, 0.0) < zf:
                    table[w] = zf
        _ZIPF = table
    return _ZIPF


def zipf_frequency(word: str, lang: str = "en") -> float:
    """Frozen-snapshot analog of wordfreq.zipf_frequency (lowercased lookup)."""
    return _load().get(word.lower(), 0.0)
