#!/usr/bin/env python
"""Round-4 verdict ask #6: drive the streaming path at bench scale.

streaming/stream.py was unit-tested only; this drives the file-drop
source over the pre-materialized sf0.1 transcripts corpus (256 parquet
files, ~630k turns) in micro-batches and records:

  - end-to-end extraction throughput (readStream -> extract_stream ->
    sink), Trigger.AvailableNow so the run drains the corpus and stops;
  - stateful_conversation_tracker throughput plus its state-store row
    count at stream end (the X4 per-unit readiness analog — state is
    bounded by live conversations, not stream length).

Writes BENCH_streaming.json (rendered into BENCH.md by bench.py) and
prints one JSON line.

NEVER run concurrently with other Spark work (bench contamination).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
BENCH_DATA = os.path.join(REPO, ".bench")
MAX_FILES_PER_TRIGGER = 20  # 256 files -> ~13 micro-batches of ~50k turns


def main() -> None:
    from tools.quietbox import assert_quiet

    assert_quiet("bench_streaming")
    os.environ["PYSPARK_SUBMIT_ARGS"] = "--driver-memory 24g pyspark-shell"
    from glm_ocr_spark.pipeline import get_spark
    from glm_ocr_spark.streaming.stream import (
        extract_stream,
        read_transcripts_stream,
        stateful_conversation_tracker,
    )

    spark = get_spark(app="bench-streaming", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")

    tpath = os.path.join(BENCH_DATA, "transcripts_sf0.1_v2")
    if not os.path.exists(os.path.join(tpath, "_SUCCESS")):
        from glm_ocr_spark.data.gen import transcripts_df

        transcripts_df(spark, 0.1).repartition(256).write.mode(
            "overwrite").parquet(tpath)
    total_rows = spark.read.parquet(tpath).count()

    out: dict = {"corpus": tpath, "total_rows": total_rows,
                 "max_files_per_trigger": MAX_FILES_PER_TRIGGER}

    def drain(df, name):
        q = (df.writeStream.format("noop")
             .option("checkpointLocation",
                     os.path.join(BENCH_DATA, f"ckpt_{name}_{time.time()}"))
             .outputMode("update")
             .trigger(availableNow=True).start())
        t0 = time.time()
        q.awaitTermination()
        sec = time.time() - t0
        progresses = q.recentProgress
        return sec, progresses

    # 1) stateless extraction stream — swept over micro-batch sizes to
    # measure the amortization claim (round-5 verdict ask #2): if the gap
    # vs the batch headline is per-batch fixed cost (checkpoint commit,
    # planning, state snapshot), throughput should rise as batches get
    # bigger and approach the batch path at 1 batch.
    out["curve"] = {}
    for mfpt in (MAX_FILES_PER_TRIGGER, 64, 256):
        stream = read_transcripts_stream(spark, tpath, mfpt)
        sec, progs = drain(extract_stream(stream), f"extract{mfpt}")
        n_batches = len([p for p in progs if p["numInputRows"] > 0])
        point = {
            "n_batches": n_batches,
            "batch_rows": round(total_rows / max(1, n_batches)),
            "total_sec": round(sec, 2),
            "rows_per_sec": round(total_rows / sec, 1),
        }
        out["curve"][str(mfpt)] = point
        if mfpt == MAX_FILES_PER_TRIGGER:  # headline fields (BENCH.md)
            out.update(point)

    # 2) stateful conversation tracker (applyInPandasWithState)
    stream2 = read_transcripts_stream(spark, tpath, MAX_FILES_PER_TRIGGER)
    sec2, progs2 = drain(stateful_conversation_tracker(stream2), "tracker")
    state_rows = None
    for p in reversed(progs2):
        ops = p.get("stateOperators") or []
        if ops and ops[0].get("numRowsTotal") is not None:
            state_rows = ops[0]["numRowsTotal"]
            break
    out["tracker_total_sec"] = round(sec2, 2)
    out["tracker_rows_per_sec"] = round(total_rows / sec2, 1)
    out["tracker_state_rows"] = state_rows
    spark.stop()

    with open(os.path.join(REPO, "BENCH_streaming.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
