#!/usr/bin/env python
"""Round-4 verdict ask #2: the full-bench slots of four queries regressed
r3->r4 without adjudication (passage_dedup 2.15->3.89s, top_ngrams
2.13->3.48s, decontaminate 1.80->2.99s, quota_per_source 0.48->0.95s)
while their operators were byte-unchanged. Re-measure each standalone —
fresh JVM, sf0.1 corpus, one warm pass then three interleaved timed
rounds (the dedup_ngram_jaccard adjudication method from round 4) — and
record the verdict in BENCH_adjudication.json (rendered into BENCH.md by
bench.py).

NEVER run concurrently with other Spark work (bench contamination).
"""

from __future__ import annotations

import datetime as dt
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

R3_R4 = {
    "passage_dedup": (2.15, 3.89),
    "top_ngrams": (2.13, 3.48),
    "decontaminate": (1.80, 2.99),
    "quota_per_source": (0.48, 0.95),
}
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROUNDS = 3


def main() -> None:
    from tools.quietbox import assert_quiet

    assert_quiet("adjudicate_r4")
    import __spark_entry__ as entry
    from glm_ocr_spark.pipeline import get_spark

    spark = get_spark(app="adjudicate-r4", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    runs: dict[str, list[float]] = {q: [] for q in R3_R4}
    for q in R3_R4:  # warm pass each (worker spin-up, module import)
        qs[q](spark, SF_DIR).count()
    for _ in range(ROUNDS):  # interleaved rounds decorrelate noise windows
        for q in R3_R4:
            t0 = time.time()
            qs[q](spark, SF_DIR).count()
            runs[q].append(round(time.time() - t0, 2))
    spark.stop()

    out = {"date": dt.date.today().isoformat(), "sf_dir": SF_DIR,
           "queries": {}}
    for q, (r3, r4) in R3_R4.items():
        best = min(runs[q])
        # noise if the operator standalone matches (or beats) its r3-era
        # reading; anything slower than the r4 slot would be a real find
        verdict = "box noise" if best <= r3 * 1.15 else (
            "faster than r4 slot, slower than r3 — watch" if best < r4
            else "NOT noise — investigate")
        out["queries"][q] = {"r3": r3, "r4": r4,
                             "standalone": runs[q], "verdict": verdict}
    with open(os.path.join(REPO, "BENCH_adjudication.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
