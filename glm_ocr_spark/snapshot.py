"""Iceberg-style atomic snapshot commits over plain parquet.

SURVEY.md §2 K4/X7/X8 name an Iceberg state table with atomic snapshot
commits (idempotent MERGE, per-partition watermarks, lock-free); Iceberg
jars are not available in this sandbox, so this module provides the same
COMMIT PROTOCOL on the local filesystem, exactly the part of Iceberg the
design relies on:

  - a table root holds immutable data files under ``data/`` and numbered
    manifests ``manifest-%012d.json``;
  - a snapshot = one manifest listing, for every bucket, its data files +
    watermark metrics (rows/bytes/completed_at/input snapshot) — the
    "multi-table" commit: extracted output AND its state watermark become
    visible in the SAME atomic step, so a reader can never observe data
    without its watermark or a watermark without its data;
  - commit = write tmp manifest, fsync, then ``os.link`` to the final name
    (link fails if the name exists -> optimistic concurrency, the loser
    retries against the new current snapshot — Iceberg's CAS on the
    catalog pointer);
  - a crash after data files are written but before the manifest link
    leaves orphan files that no reader can see (Iceberg's unreachable
    files, GC'd later); re-processing a bucket swaps its file list in the
    next manifest — idempotent MERGE semantics;
  - time travel = read any older manifest by snapshot id.

At 10^12 rows the manifest is O(buckets) (thousands of entries), not
O(files-per-bucket x history): each manifest carries the full current
bucket map, copy-on-write from its parent. A production deployment swaps
this module for real Iceberg without touching callers (the reference
analogy: apps/backend task DB + portalocker, replaced here by CAS commits).

Deployment constraint (stated, not hidden): the manifest CAS is
``os.link``, which is atomic only on a POSIX filesystem — so the CATALOG
(manifests) must live on a local/NFS-POSIX store, and concurrent writers
are only safe against each other on that one store. Object stores (S3/GS)
have no atomic create-if-absent link; real Iceberg solves this with a
catalog service (Hive/REST/Glue) holding the pointer CAS, which is exactly
what you swap in at deployment. DATA file listing/GC, by contrast, goes
through ``pyarrow.fs`` and runs unchanged against s3:// / hdfs:// / gs://;
manifests record data files as scheme-full URIs so ``read_output`` can
hand them straight to ``spark.read.parquet`` on those stores too.
"""

from __future__ import annotations

import datetime as dt
import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession

MANIFEST_FMT = "manifest-%012d.json"


class SnapshotStore:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(os.path.join(root, "data"), exist_ok=True)

    # ------------------------------------------------------------ manifests

    def _manifest_ids(self) -> list[int]:
        out = []
        for f in os.listdir(self.root):
            if f.startswith("manifest-") and f.endswith(".json"):
                try:
                    out.append(int(f[len("manifest-"):-len(".json")]))
                except ValueError:
                    pass
        return sorted(out)

    def current_id(self) -> int | None:
        ids = self._manifest_ids()
        return ids[-1] if ids else None

    def manifest(self, snapshot_id: int | None = None) -> dict | None:
        sid = self.current_id() if snapshot_id is None else snapshot_id
        if sid is None:
            return None
        path = os.path.join(self.root, MANIFEST_FMT % sid)
        with open(path, encoding="utf-8") as f:
            return json.load(f)

    # ------------------------------------------------------------ staging

    def staging_dir(self) -> str:
        """A unique dir under data/ for one write attempt. Files written
        here are invisible until a manifest references them."""
        d = os.path.join(self.root, "data", uuid.uuid4().hex)
        os.makedirs(d, exist_ok=True)
        return d

    # ------------------------------------------------------------ commit

    def commit(self, bucket_entries: dict[int, dict],
               input_snapshot: str = "v1",
               n_buckets: int | None = None) -> int:
        """Atomically publish new/updated bucket entries merged over the
        current snapshot. Returns the new snapshot id.

        Each entry: {"files": [...], "rows_out": n, "bytes_out": n}.
        `n_buckets` records the table's bucketing in the manifest (carried
        forward from the parent when None) so later writers can validate
        they hash keys with the same layout — a mismatched writer would
        rewrite the wrong bucket and duplicate keys across two buckets.
        Retries on concurrent-commit collision (CAS loop)."""
        while True:
            cur = self.manifest()
            buckets = dict(cur["buckets"]) if cur else {}
            recorded_nb = n_buckets if n_buckets is not None else (
                cur.get("n_buckets") if cur else None)
            if (cur and cur.get("n_buckets") is not None
                    and n_buckets is not None
                    and n_buckets != cur["n_buckets"]):
                raise ValueError(
                    f"table is bucketed with n_buckets={cur['n_buckets']}, "
                    f"commit attempted with n_buckets={n_buckets}")
            now = dt.datetime.now(dt.timezone.utc).isoformat()
            for b, entry in bucket_entries.items():
                buckets[str(b)] = {**entry, "input_snapshot": input_snapshot,
                                   "completed_at": now}
            new_id = (cur["snapshot_id"] + 1) if cur else 0
            manifest = {
                "snapshot_id": new_id,
                "parent": cur["snapshot_id"] if cur else None,
                "committed_at": now,
                "n_buckets": recorded_nb,
                "buckets": buckets,
            }
            tmp = os.path.join(self.root, f".tmp-{uuid.uuid4().hex}.json")
            with open(tmp, "w", encoding="utf-8") as f:
                json.dump(manifest, f)
                f.flush()
                os.fsync(f.fileno())
            final = os.path.join(self.root, MANIFEST_FMT % new_id)
            try:
                os.link(tmp, final)  # atomic create-if-absent (the CAS)
                os.unlink(tmp)
                return new_id
            except FileExistsError:
                os.unlink(tmp)  # lost the race: merge onto the winner

    # ------------------------------------------------------------ reads

    def completed_buckets(self, input_snapshot: str = "v1",
                          snapshot_id: int | None = None) -> set[int]:
        m = self.manifest(snapshot_id)
        if not m:
            return set()
        return {int(b) for b, e in m["buckets"].items()
                if e.get("input_snapshot") == input_snapshot}

    def output_files(self, snapshot_id: int | None = None) -> list[str]:
        m = self.manifest(snapshot_id)
        if not m:
            return []
        files: list[str] = []
        for e in m["buckets"].values():
            files.extend(e["files"])
        return files

    def read_output(self, spark: SparkSession,
                    snapshot_id: int | None = None) -> DataFrame:
        """The committed output table as of a snapshot (time travel).

        The `bucket` partition column is preserved (round-2 advice: plain
        leaf-file reads silently dropped it, diverging from the
        run_with_checkpoint output schema): committed files are grouped by
        their staging dir and each group is read with that dir as
        `basePath`, so Spark re-infers bucket=N from the file paths. One
        read per commit batch (manifest-bounded), unioned by name —
        exactly the manifest's file list, never a directory listing."""
        files = self.output_files(snapshot_id)
        if not files:
            raise ValueError("no committed snapshot")
        groups: dict[str, list[str]] = {}
        for p in files:
            # .../data/<staging>/bucket=N/part-*.parquet
            staging = os.path.dirname(os.path.dirname(p))
            groups.setdefault(staging, []).append(p)
        df = None
        for staging in sorted(groups):
            part = (spark.read.option("basePath", staging)
                    .parquet(*sorted(groups[staging])))
            # allowMissingColumns = Iceberg add-column evolution: files
            # committed before a column existed read it as NULL
            df = part if df is None else df.unionByName(
                part, allowMissingColumns=True)
        return df

    # ------------------------------------------------------------ expiry

    def expire_snapshots(self, keep_from: int,
                         min_orphan_age_sec: float = 0.0) -> dict:
        """Iceberg-style maintenance: drop manifests older than `keep_from`
        and delete data files referenced by no kept manifest.

        `min_orphan_age_sec` protects files staged by an in-flight
        concurrent writer that has not committed yet (Iceberg's
        remove-orphan-files age threshold); production would use hours.
        Readers of kept snapshots are unaffected — their file lists stay
        intact.

        The data-file sweep goes through `pyarrow.fs` (like
        state._partition_stats), so the same GC runs against s3:// /
        hdfs:// / gs:// data roots; only the manifest CAS itself is
        POSIX-bound (module docstring)."""
        import time as _time

        from pyarrow import fs as pafs

        ids = self._manifest_ids()
        keep_ids = [i for i in ids if i >= keep_from]
        if not keep_ids:
            raise ValueError("expiry would drop every snapshot")
        fs, data_root = _fs_and_path(os.path.join(self.root, "data"))
        local = isinstance(fs, pafs.LocalFileSystem)
        # Normalize manifest paths the same way the listing produces them:
        # local roots list as absolute POSIX paths (abspath matches both
        # the os.walk-era manifests and the pyarrow-era ones); non-local
        # roots list scheme-less ("bucket/cat/data/…") while manifests now
        # record scheme-FULL URIs ("s3://bucket/cat/data/…", so read_output
        # can hand them to spark.read) — strip the scheme for the orphan
        # compare (a no-op on older scheme-less manifests).
        referenced: set[str] = set()
        for sid in keep_ids:
            referenced.update(
                os.path.abspath(p) if local and "://" not in p
                else (p.split("://", 1)[1] if "://" in p else p)
                for p in self.output_files(sid))
        now = _time.time()
        removed_files = 0
        sel = pafs.FileSelector(data_root, recursive=True,
                                allow_not_found=True)
        infos = fs.get_file_info(sel)
        survivors: set[str] = set()
        dirs: list[str] = []
        for info in infos:
            if info.type == pafs.FileType.Directory:
                dirs.append(info.path)
                continue
            if info.type != pafs.FileType.File:
                continue
            p = info.path
            if p in referenced:
                survivors.add(p)
                continue
            if info.mtime_ns is not None:
                age = now - info.mtime_ns / 1e9
            else:
                # unknown mtime: only deletable when the caller asked for
                # no age protection at all — never assume "old enough"
                # (the in-flight-writer guard must fail safe)
                age = float("inf") if min_orphan_age_sec <= 0 else -1.0
            if age < min_orphan_age_sec:
                survivors.add(p)
                continue
            try:
                fs.delete_file(p)
                removed_files += 1
            except OSError:
                survivors.add(p)
        # Drop staging dirs emptied by the sweep (deepest first so nested
        # partition dirs fall before their parents). pyarrow delete_dir is
        # RECURSIVE, so re-list each candidate immediately before deleting
        # — a concurrent writer may have staged files after our snapshot
        # listing, and blind delete_dir would destroy them (the age
        # threshold protects files, this re-check protects the dir sweep).
        for d in sorted(dirs, key=len, reverse=True):
            if any(s.startswith(d + "/") for s in survivors):
                continue
            recheck = fs.get_file_info(
                pafs.FileSelector(d, recursive=True, allow_not_found=True))
            if any(i.type == pafs.FileType.File for i in recheck):
                continue
            try:
                fs.delete_dir(d)
            except OSError:
                pass
        removed_manifests = 0
        for i in ids:
            if i < keep_from:
                os.unlink(os.path.join(self.root, MANIFEST_FMT % i))
                removed_manifests += 1
        return {"removed_manifests": removed_manifests,
                "removed_files": removed_files,
                "kept_snapshots": keep_ids}

    def state_rows(self, snapshot_id: int | None = None) -> list[dict]:
        m = self.manifest(snapshot_id)
        if not m:
            return []
        return [
            {"bucket": int(b), "status": "completed",
             "rows_out": e["rows_out"], "bytes_out": e["bytes_out"],
             "input_snapshot": e["input_snapshot"],
             "completed_at": e["completed_at"]}
            for b, e in m["buckets"].items()
        ]


def _fs_and_path(path: str):
    """(pyarrow filesystem, normalized path) — s3://, hdfs://, gs:// or
    local. Mirrors state._partition_stats so all data-file I/O in the
    snapshot store is object-store-capable; only the manifest CAS is
    POSIX-bound (module docstring)."""
    from pyarrow import fs as pafs

    if "://" in path:
        return pafs.FileSystem.from_uri(path)
    return pafs.LocalFileSystem(), os.path.abspath(path)


def _staged_parquet_stats(d: str) -> tuple[list[str], int, int]:
    """(parquet files, rows from footers, bytes) for one staged write.

    Footer-only reads via `pyarrow.fs` — no data re-scan, runs unchanged
    against object storage. Manifest paths are recorded WITH the root's
    filesystem scheme (``s3://bucket/...``): pyarrow listings come back
    scheme-less, but `read_output` feeds manifest paths straight to
    `spark.read.parquet`, which cannot resolve a scheme-less object-store
    path (review finding) — so the scheme is re-prefixed at record time.
    Local roots record plain absolute paths, as before."""
    import pyarrow.parquet as pq
    from pyarrow import fs as pafs

    scheme = d.split("://", 1)[0] + "://" if "://" in d else ""
    # Spark-on-Hadoop resolves object stores via s3a:// (s3:// and s3n://
    # are the legacy EMR/retired connectors), while pyarrow accepts
    # plain s3:// — normalize at record time so read_output can hand
    # manifest paths straight to spark.read.parquet (round-5 advice).
    scheme = {"s3://": "s3a://", "s3n://": "s3a://"}.get(scheme, scheme)
    fs, base = _fs_and_path(d)
    sel = pafs.FileSelector(base, recursive=True, allow_not_found=True)
    files, rows, total = [], 0, 0
    for info in fs.get_file_info(sel):
        if info.type != pafs.FileType.File:
            continue
        total += info.size or 0
        if info.path.endswith(".parquet"):
            files.append(scheme + info.path)
            with fs.open_input_file(info.path) as f:
                rows += pq.ParquetFile(f).metadata.num_rows
    return sorted(files), rows, total


def run_with_snapshots(
    spark: SparkSession,
    transcripts: DataFrame,
    catalog_root: str,
    n_buckets: int = 16,
    input_snapshot: str = "v1",
    buckets_per_commit: int | None = None,
    fail_before_commit_n: int | None = None,
    mode: str = "layout",
    config=None,
) -> dict:
    """Checkpointed extraction with atomic multi-table snapshot commits.

    Like state.run_with_checkpoint, but output data and state watermarks
    are published together through SnapshotStore.commit — the Iceberg-
    protocol path (SURVEY §7.3.5). `fail_before_commit_n` crashes after
    the Nth batch's data files are staged but BEFORE its commit: the
    atomicity test — those files must stay invisible.
    """
    from pyspark.sql import functions as F

    from glm_ocr_spark.pipeline import extract_transcripts
    from glm_ocr_spark.state import bucket_col

    store = SnapshotStore(catalog_root)
    done = store.completed_buckets(input_snapshot)
    pending = [b for b in range(n_buckets) if b not in done]
    chunk = buckets_per_commit or len(pending) or 1

    src = transcripts.withColumn("bucket", bucket_col(n_buckets))
    commits = 0
    processed = 0
    for i in range(0, len(pending), chunk):
        batch = pending[i:i + chunk]
        part = src.filter(F.col("bucket").isin(batch))
        staged = store.staging_dir()
        (extract_transcripts(part, passthrough=("bucket",))
         .write.mode("overwrite").partitionBy("bucket").parquet(staged))
        if fail_before_commit_n is not None and \
                commits + 1 >= fail_before_commit_n:
            raise RuntimeError("injected crash before snapshot commit")
        entries = {}
        for b in batch:
            bdir = os.path.join(staged, f"bucket={b}")
            files, rows, nbytes = _staged_parquet_stats(bdir)
            entries[b] = {"files": files, "rows_out": rows,
                          "bytes_out": nbytes}
        store.commit(entries, input_snapshot, n_buckets=n_buckets)
        commits += 1
        processed += len(batch)

    return {
        "resumed_buckets": len(done),
        "processed_buckets": processed,
        "commits": commits,
        "snapshot_id": store.current_id(),
    }


def merge_upsert(
    spark: SparkSession,
    store: SnapshotStore,
    updates: DataFrame,
    key_cols: list[str],
    n_buckets: int | None = None,
    input_snapshot: str = "v1",
    fail_before_commit: bool = False,
) -> dict:
    """MERGE INTO the snapshot table: matched keys are replaced by their
    update row, unmatched keys are inserted — Iceberg's copy-on-write
    MERGE at bucket granularity (the CDC/late-correction path SURVEY
    §7.3.5's idempotent-MERGE language implies).

    Only the buckets the updates hash into are rewritten: each touched
    bucket's new file set = (old rows whose key has no update: left-anti
    join) + (the update rows), staged invisibly and published for ALL
    touched buckets in ONE manifest CAS — a reader sees the table entirely
    pre-merge or entirely post-merge, never a mix, and time travel to the
    pre-merge snapshot keeps working. Untouched buckets keep their exact
    file lists (manifest copy-on-write; zero data movement).

    100 TB shape: the touched-bucket list is an O(buckets) driver-side
    distinct (same bounded collect as the state reads); the rewrite cost
    is proportional to touched data, not table size — the reason Iceberg
    MERGE is bucket/partition-COW and not a table rewrite. The anti join
    shuffles only touched buckets, and broadcasts when the update batch
    is small. Concurrency: the CAS retry merges bucket ENTRIES, so two
    writers on disjoint buckets both land; two writers on the same bucket
    are last-writer-wins (real Iceberg fails validation instead — noted
    as the delta vs the jar).

    `updates` must carry the output schema (minus `bucket`, computed here
    from conv_id like every writer). `n_buckets=None` (the default) reads
    the table's bucketing from the current manifest; passing a value that
    disagrees with the manifest raises — a mismatched writer would hash an
    update into a different bucket than the existing row, leaving the key
    duplicated across two buckets. Duplicate keys *inside* `updates` also
    raise (real Iceberg MERGE fails validation on multiple matches; a
    silent union would leave multiple rows per key). Returns merge stats.
    """
    from pyspark.sql import functions as F

    from glm_ocr_spark.state import bucket_col

    cur = store.manifest()
    table_nb = cur.get("n_buckets") if cur else None
    if n_buckets is None:
        if table_nb is None:
            raise ValueError(
                "n_buckets not recorded in the manifest (pre-upgrade table "
                "or empty store) — pass it explicitly")
        n_buckets = table_nb
    elif table_nb is not None and n_buckets != table_nb:
        raise ValueError(
            f"table is bucketed with n_buckets={table_nb}, merge called "
            f"with n_buckets={n_buckets} — updates would land in the "
            "wrong buckets")

    # localCheckpoint pins the update rows: `updates` is evaluated once,
    # so a nondeterministic source (limit over multiple partitions) cannot
    # yield a different row set between the touched-bucket scan and the
    # staged write (which would commit a bucket with an empty file list
    # and silently erase it — review finding)
    upd = (updates.withColumn("bucket", bucket_col(n_buckets))
           .localCheckpoint(eager=True))
    dup = (upd.groupBy(*key_cols).count()
           .filter(F.col("count") > 1).limit(1).collect())
    if dup:
        raise ValueError(
            f"updates contain multiple rows for key "
            f"{tuple(dup[0][k] for k in key_cols)} — MERGE requires at "
            "most one update row per key")
    touched = sorted(r["bucket"] for r in
                     upd.select("bucket").distinct().collect())
    if not touched:
        return {"touched_buckets": [], "rows_out": 0,
                "snapshot_id": store.current_id()}

    try:
        target = store.read_output(spark)
    except ValueError:  # empty table: pure insert
        target = None

    if target is not None:
        kept = (
            target.filter(F.col("bucket").isin(touched))
            .join(upd.select(*key_cols), key_cols, "left_anti")
        )
        # allowMissingColumns: consistent with read_output's add-column
        # evolution — updates in a pre-evolution schema (or carrying new
        # columns) NULL-fill instead of failing the CDC path
        merged = kept.unionByName(upd, allowMissingColumns=True)
    else:
        merged = upd

    staged = store.staging_dir()
    (merged.write.mode("overwrite").partitionBy("bucket").parquet(staged))
    if fail_before_commit:
        raise RuntimeError("injected crash before merge commit")
    entries = {}
    rows_total = 0
    for b in touched:
        bdir = os.path.join(staged, f"bucket={b}")
        files, rows, nbytes = _staged_parquet_stats(bdir)
        if not files:
            # defensive: committing files=[] for a touched bucket would
            # erase its pre-merge rows; fail loudly instead
            raise RuntimeError(
                f"merge staged no files for touched bucket {b} — "
                "refusing to commit an empty bucket entry")
        entries[b] = {"files": files, "rows_out": rows, "bytes_out": nbytes}
        rows_total += rows
    sid = store.commit(entries, input_snapshot, n_buckets=n_buckets)
    return {"touched_buckets": touched, "rows_out": rows_total,
            "snapshot_id": sid}
