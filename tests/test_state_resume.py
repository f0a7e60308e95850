"""Checkpoint/resume tests (north rule: "resumable from checkpoint with
per-partition lineage + metrics"; SURVEY.md §5.4: kill mid-run, rerun,
assert no recomputation of completed partitions and identical output)."""

import pytest

from glm_ocr_spark.data.gen import transcripts_df
from glm_ocr_spark.state import (
    read_completed_buckets,
    run_with_checkpoint,
)

N_BUCKETS = 8


@pytest.fixture(scope="module")
def small_transcripts(spark):
    df = transcripts_df(spark, 0.001).filter("turn_idx < 10").cache()
    df.count()
    yield df
    df.unpersist()


def _collect_output(spark, path):
    rows = spark.read.parquet(path).collect()
    return sorted(
        (r["conv_id"], r["turn_idx"], r["extracted_text"], r["json"])
        for r in rows
    )


def test_kill_and_resume_identical_output(spark, small_transcripts, tmp_path):
    out_a = str(tmp_path / "out_single")
    st_a = str(tmp_path / "state_single")
    out_b = str(tmp_path / "out_resumed")
    st_b = str(tmp_path / "state_resumed")

    # uninterrupted run
    m = run_with_checkpoint(spark, small_transcripts, out_a, st_a,
                            n_buckets=N_BUCKETS)
    assert m["processed_buckets"] == N_BUCKETS

    # killed run: crash injected after 3 buckets
    with pytest.raises(RuntimeError, match="injected failure"):
        run_with_checkpoint(spark, small_transcripts, out_b, st_b,
                            n_buckets=N_BUCKETS, fail_after_buckets=3)
    done_after_kill = read_completed_buckets(spark, st_b, "v1")
    assert len(done_after_kill) == 3

    # resume: completed buckets must NOT be recomputed
    m2 = run_with_checkpoint(spark, small_transcripts, out_b, st_b,
                             n_buckets=N_BUCKETS)
    assert m2["resumed_buckets"] == 3
    assert m2["processed_buckets"] == N_BUCKETS - 3

    # byte-identical logical output
    assert _collect_output(spark, out_a) == _collect_output(spark, out_b)


def test_state_metrics_recorded(spark, small_transcripts, tmp_path):
    out = str(tmp_path / "out")
    st = str(tmp_path / "state")
    run_with_checkpoint(spark, small_transcripts, out, st,
                        n_buckets=4)
    state = spark.read.parquet(st)
    rows = state.collect()
    assert len(rows) == 4
    assert all(r["status"] == "completed" for r in rows)
    assert sum(r["rows_out"] for r in rows) == small_transcripts.count()
    assert all(r["bytes_out"] > 0 for r in rows)
    assert all(r["input_snapshot"] == "v1" for r in rows)
    assert all(r["completed_at"] is not None for r in rows)


def test_single_input_scan_for_all_pending(spark, small_transcripts, tmp_path):
    """Round-1 regression: the bucket loop re-scanned the unpartitioned
    input once per bucket (~n_buckets x read amplification at scale). All
    pending buckets must now go through ONE job / ONE input scan."""
    out = str(tmp_path / "out")
    st = str(tmp_path / "state")
    m = run_with_checkpoint(spark, small_transcripts, out, st,
                            n_buckets=N_BUCKETS)
    assert m["processed_buckets"] == N_BUCKETS
    assert m["input_scans"] == 1


def test_buckets_per_job_bounds_scans(spark, small_transcripts, tmp_path):
    out = str(tmp_path / "out")
    st = str(tmp_path / "state")
    m = run_with_checkpoint(spark, small_transcripts, out, st,
                            n_buckets=N_BUCKETS, buckets_per_job=4)
    assert m["processed_buckets"] == N_BUCKETS
    assert m["input_scans"] == 2


def test_rerun_completed_is_noop(spark, small_transcripts, tmp_path):
    out = str(tmp_path / "out")
    st = str(tmp_path / "state")
    run_with_checkpoint(spark, small_transcripts, out, st, n_buckets=4)
    m = run_with_checkpoint(spark, small_transcripts, out, st, n_buckets=4)
    assert m["resumed_buckets"] == 4
    assert m["processed_buckets"] == 0


def test_snapshot_change_invalidates(spark, small_transcripts, tmp_path):
    out = str(tmp_path / "out")
    st = str(tmp_path / "state")
    run_with_checkpoint(spark, small_transcripts, out, st, n_buckets=4,
                        input_snapshot="v1")
    m = run_with_checkpoint(spark, small_transcripts, out, st, n_buckets=4,
                            input_snapshot="v2")
    assert m["resumed_buckets"] == 0
    assert m["processed_buckets"] == 4
