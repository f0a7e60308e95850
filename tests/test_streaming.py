"""Structured Streaming tests: continuous extraction must equal the batch
result (same transformation, availableNow trigger), and the watermark rollup
must aggregate per conversation."""

import pytest
from pyspark.sql import functions as F

from glm_ocr_spark.data.gen import transcripts_df
from glm_ocr_spark.streaming import (
    conversation_progress_stream,
    extract_stream,
)
from glm_ocr_spark.streaming.stream import read_transcripts_stream


@pytest.fixture(scope="module")
def transcripts_path(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("stream") / "transcripts")
    transcripts_df(spark, 0.001).filter("turn_idx < 6").write.parquet(path)
    return path


def test_stream_extraction_equals_batch(spark, transcripts_path, tmp_path):
    from glm_ocr_spark.pipeline import extract_transcripts

    stream = read_transcripts_stream(spark, transcripts_path,
                                     max_files_per_trigger=4)
    out_path = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = (
        extract_stream(stream).writeStream
        .format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    stream_rows = sorted(
        (r["conv_id"], r["turn_idx"], r["extracted_text"], r["json"])
        for r in spark.read.parquet(out_path).collect()
    )
    batch_rows = sorted(
        (r["conv_id"], r["turn_idx"], r["extracted_text"], r["json"])
        for r in extract_transcripts(
            spark.read.parquet(transcripts_path)).collect()
    )
    assert stream_rows == batch_rows
    assert len(stream_rows) > 0


def test_stateful_tracker(spark, transcripts_path, tmp_path):
    """applyInPandasWithState per-conversation counters must converge to the
    batch ground truth across micro-batches."""
    from glm_ocr_spark.streaming import stateful_conversation_tracker

    stream = read_transcripts_stream(spark, transcripts_path,
                                     max_files_per_trigger=3)
    ckpt = str(tmp_path / "ckpt_state")
    q = (
        stateful_conversation_tracker(stream).writeStream
        .format("memory")
        .queryName("tracker")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    # last update per conversation = final state
    rows = spark.sql("""
        SELECT conv_id, max(turns_done) AS turns_done,
               max(max_turn_idx) AS max_turn_idx
        FROM tracker GROUP BY conv_id
    """).collect()
    got = {r["conv_id"]: (r["turns_done"], r["max_turn_idx"]) for r in rows}
    truth = {
        r["conv_id"]: (r["n"], r["m"])
        for r in spark.read.parquet(transcripts_path)
        .groupBy("conv_id")
        .agg(F.count("*").alias("n"), F.max("turn_idx").alias("m"))
        .collect()
    }
    assert got == truth


def test_progress_rollup(spark, transcripts_path, tmp_path):
    # 5-minute windows over the ~50-minute ts span: all but the last window
    # pass the watermark and emit in append mode
    stream = read_transcripts_stream(spark, transcripts_path,
                                     max_files_per_trigger=4)
    rollup = conversation_progress_stream(stream, watermark="1 minute",
                                          window="5 minutes")
    ckpt = str(tmp_path / "ckpt2")
    q = (
        rollup.writeStream
        .format("memory")
        .queryName("rollup")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    # append mode emits only windows fully past the watermark; with
    # availableNow + a short watermark every historical window closes
    rows = spark.sql("select * from rollup").collect()
    assert len(rows) > 0
    by_conv = {r["conv_id"]: r for r in rows}
    assert all(r["turns_done"] >= 1 for r in rows)
    assert all(r["blocks_total"] >= 0 for r in rows)
    assert len(by_conv) > 1


def test_streaming_exact_dedup(spark, transcripts_path, tmp_path):
    """First occurrence of each content hash passes; duplicates within the
    watermark horizon drop. The corpus has exact-duplicate payloads by
    construction (same generator template), so the stream output must be
    strictly smaller and hash-unique."""
    from glm_ocr_spark.streaming.stream import streaming_exact_dedup

    stream = read_transcripts_stream(spark, transcripts_path,
                                     max_files_per_trigger=100)
    ded = streaming_exact_dedup(stream, watermark="1 minute")
    ckpt = str(tmp_path / "ckpt3")
    q = (
        ded.writeStream
        .format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    rows = spark.sql("select content_hash from dedup_stream").collect()
    n_total = spark.read.parquet(transcripts_path).count()
    hashes = [r["content_hash"] for r in rows]
    assert 0 < len(hashes) <= n_total
    assert len(hashes) == len(set(hashes))  # no duplicate survives a batch


def test_curation_ops_are_stream_safe(spark, tmp_path):
    """pii_scrub / c4_filters are stateless narrow maps, so the exact same
    operator code runs under Structured Streaming — batch/stream parity on
    the documents schema (the corpus-curation service shape)."""
    import shutil

    from glm_ocr_spark.operators.curation import c4_filters, pii_scrub

    src_dir = str(tmp_path / "docs_stream")
    import os
    os.makedirs(src_dir)
    shutil.copy("/root/testdata/sf0.001/documents.parquet",
                src_dir + "/part-0.parquet")
    batch_docs = spark.read.parquet(src_dir)
    schema = batch_docs.schema
    stream = spark.readStream.schema(schema).parquet(src_dir)

    for name, op in (("pii", pii_scrub), ("c4", c4_filters)):
        out = op(stream)
        assert out.isStreaming
        q = (out.writeStream.format("memory")
             .queryName(f"curation_{name}")
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(60)
        got = spark.sql(f"select * from curation_{name}")
        want = op(batch_docs)
        assert got.count() == want.count() == batch_docs.count()
        # spot value parity: identical rows batch vs stream
        assert sorted(map(tuple, got.collect())) == \
            sorted(map(tuple, want.collect()))
