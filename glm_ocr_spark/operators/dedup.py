"""Deduplication operators over a documents table.

Five strategies, scale-ordered:

  exact_dedup        — hash-groupBy on a normalized content hash. One shuffle
                       on the hash; partial aggregation map-side. The O(n)
                       baseline at any scale.
  ngram_jaccard_pairs— exact shingle-set Jaccard over an explode + self-join.
                       Quadratic in the bucket; used as the verify stage
                       behind LSH at scale, or standalone at small scale.
  minhash_lsh_pairs  — MinHash signatures + banded LSH: candidate pairs from
                       band-bucket joins, verified by true Jaccard. The
                       standard 100 TB near-dup path: shuffle volume is
                       O(docs x bands), never O(docs^2).
  simhash_pairs      — 64-bit SimHash fingerprints via a vectorized pandas
                       UDF; near-dups = fingerprints within a Hamming radius,
                       candidate-joined on rotated prefix blocks.
  embedding_neardup_pairs — cosine >= threshold over an embedding column
                       (see operators.similarity for the ANN machinery).

Determinism: all hash families are fixed-parameter (md5/crc32/xxhash64-
based), so resume/retry recompute identical results. SimHash's token hash
is md5-first-16-hex specifically so the full pipeline is DuckDB-oracle
checkable (see `simhash64_scalar`).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ----------------------------------------------------------------- shingles

from glm_ocr_spark.operators.norm import (  # noqa: E402 - shared norm spec
    norm_text_col,
    real_words_col,
)


def shingles_col(n: int = 3):
    """Distinct word n-gram shingles of the normalized text (array<string>).

    0-based Spark `transform` over a sequence; the DuckDB oracle mirrors it
    1-based. Documents with < n words produce a single whole-text shingle so
    short docs still participate.

    Perf note: Spark does not common-subexpression-eliminate inside lambda
    bodies, so this expression re-evaluates the regex+split per array
    element (~3n evaluations per doc). Fine when it feeds an explode that
    dominates anyway (ngram_jaccard_pairs); for per-doc kernels use the
    Python `shingles_py` inside a pandas UDF instead (one regex pass/doc,
    ~50x here).
    """
    words = F.split(norm_text_col(), " ")
    ngrams = F.transform(
        F.sequence(F.lit(0), F.size(words) - n),
        lambda i: F.concat_ws(
            " ", *[F.element_at(words, (i + k + 1).cast("int")) for k in range(n)]
        ),
    )
    return F.when(F.size(words) >= n, F.array_distinct(ngrams)).otherwise(
        F.array(norm_text_col())
    )


_WS_RE = None


def shingles_py(text: str, n: int = 3) -> list[str]:
    """Python mirror of `shingles_col` (byte-equal — tested incl. leading/
    trailing tab/newline/unicode whitespace): trim *spaces only* (JVM/DuckDB
    `trim` strips 0x20, not \\t/\\n — so a leading tab survives trim,
    collapses to ' ', and yields an empty leading token exactly as the JVM
    side does), collapse ASCII whitespace, lower, word n-grams,
    first-occurrence distinct; < n words -> single whole-text shingle."""
    global _WS_RE
    if _WS_RE is None:
        import re

        # Java \s is ASCII-only; match it (re.ASCII)
        _WS_RE = re.compile(r"\s+", re.ASCII)
    norm = _WS_RE.sub(" ", text.strip(" ")).lower() if text else ""
    words = norm.split(" ") if norm else [""]
    if len(words) < n:
        return [norm]
    seen = dict.fromkeys(
        " ".join(words[i:i + n]) for i in range(len(words) - n + 1))
    return list(seen)


def shingles_udf(n: int = 3):
    """pandas UDF: text -> shingle array, one regex pass per doc."""
    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _sh(text: pd.Series) -> pd.Series:
        return pd.Series([shingles_py(t, n) for t in text])

    return _sh


# ----------------------------------------------------------------- exact

def exact_dedup(docs: DataFrame) -> DataFrame:
    """Exact dedup groups: content hash -> group size + keeper (min doc_id).

    Map-side partial agg then one shuffle on the 128-bit hash — the same
    plan shape at 500 rows and 10^11 rows.
    """
    h = F.md5(F.encode(norm_text_col(), "UTF-8"))
    return (
        docs.select(F.col("doc_id"), h.alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.count("*").alias("n_copies"),
            F.min("doc_id").alias("keeper_id"),
        )
    )


# ----------------------------------------------------------------- jaccard

def ngram_jaccard_pairs(docs: DataFrame, n: int = 3,
                        threshold: float = 0.8) -> DataFrame:
    """Similar pairs by exact n-gram Jaccard: explode shingles, self-join on
    shingle, count common, Jaccard = common / (|A| + |B| - common).

    Scale note: standalone this is the verify kernel; at 100 TB it only ever
    runs *inside* LSH buckets (minhash_lsh_pairs), never globally.
    """
    # shingles via the pandas UDF (byte-equal to shingles_col, tested):
    # the JVM lambda re-evaluates its regex+split per element, and this
    # relation is consumed twice (both sides of the self-join)
    sh = docs.select(
        "doc_id", F.explode(shingles_udf(n)(F.col("text"))).alias("shingle")
    ).distinct()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("id1"), F.col("b.doc_id").alias("id2"))
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("id1"), F.col("n_sh").alias("n1"))
    sb = sizes.select(F.col("doc_id").alias("id2"), F.col("n_sh").alias("n2"))
    return (
        common.join(F.broadcast(sa), "id1").join(F.broadcast(sb), "id2")
        .withColumn(
            "jaccard",
            F.round(F.col("n_common")
                    / (F.col("n1") + F.col("n2") - F.col("n_common")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id1", "id2", "jaccard")
    )


# ----------------------------------------------------------------- minhash

MINHASH_K = 32          # signature length
LSH_BANDS = 16          # bands of r = K / BANDS rows; r=2 -> candidate prob
                        # 1-(1-j^2)^16: ≈0.99 at j=0.5, ≈1-1e-7 at j=0.8.
                        # Verified by exact Jaccard, so extra candidates cost
                        # only join width, never precision.
# 31-bit Mersenne prime: with base < 2^31 and a,b < 2^31 the affine form
# base*a + b stays under 2^63, so the whole family runs in JVM longs with no
# overflow (ANSI mode safe).
# Dataflows this module pins with persist() (band entries, shingle
# arrays). A returned DataFrame is lazy, so the operator cannot unpersist
# them itself — they must outlive the CALLER's action. In a job-per-run
# deployment the JVM exit releases them; a long-lived session (the
# correctness driver, a notebook, repeated dedup calls) should call
# `release_persisted()` after consuming each result, or the
# MEMORY_AND_DISK blocks accumulate and squeeze later shuffles (review
# finding; the interference bench_sf1 measured as 51.5 s warm vs 18.5 s
# cold).
_PERSISTED: list = []
# long-lived-session leak bound (round-5 advice): when a new pin would
# grow the registry past this, the OLDEST pin is released first. A
# released pin is never a correctness problem — a still-lazy consumer
# just recomputes — and 8 comfortably covers the deepest in-flight chain
# (dedup_keep_first: 2 pins per minhash call).
_PERSISTED_CAP = 8


def _pin(df) -> None:
    from pyspark import StorageLevel

    while len(_PERSISTED) >= _PERSISTED_CAP:
        old = _PERSISTED.pop(0)
        try:
            old.unpersist()
        except Exception:
            pass  # session gone or block already dropped
    df.persist(StorageLevel.MEMORY_AND_DISK)
    _PERSISTED.append(df)


def release_persisted() -> int:
    """Unpersist every dataflow this module pinned since the last call;
    returns how many were released. Safe to call at any time — only
    affects this module's internal caches, never caller-created ones
    (unlike spark.catalog.clearCache())."""
    n = 0
    for df in _PERSISTED:
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass  # session gone or block already dropped — nothing to free
    _PERSISTED.clear()
    return n


_MERSENNE = (1 << 31) - 1


def _hash_params(k: int = MINHASH_K) -> list[tuple[int, int]]:
    """Fixed affine hash family (deterministic, seed-free), params < 2^31."""
    params = []
    a, b = 0x9E3779B9, 0xC2B2AE3D
    for i in range(k):
        a = (a * 1103515245 + 12345) % _MERSENNE
        b = (b * 1103515245 + 12345) % _MERSENNE
        params.append((a | 1, b))
    return params


def _minhash_sig_udf(n: int = 3, k: int = MINHASH_K):
    """pandas UDF: text -> minhash signature (array<bigint>[k]).

    Shingling happens in Python (`shingles_py`, one regex pass per doc);
    then one numpy broadcast per doc: base = hash(shingle) % M,
    min((base x A + B) % M) column-wise over the k-member affine family.
    Token hash = two crc32 variants -> 64 bits (same family as simhash64;
    any uniform deterministic hash works — correctness is enforced by the
    exact-Jaccard verify stage, not by signature values).
    """
    params = _hash_params(k)
    av = np.array([a for a, _ in params], dtype=np.uint64)
    bv = np.array([b for _, b in params], dtype=np.uint64)
    m = np.uint64(_MERSENNE)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def _sig(text: pd.Series) -> pd.Series:
        import zlib

        out = []
        for t in text:
            shingles = shingles_py(t, n)
            hs = np.fromiter(
                ((zlib.crc32(w) << 32) | zlib.crc32(w[::-1] + b"#")
                 for w in (s.encode("utf-8") for s in shingles)),
                dtype=np.uint64, count=len(shingles))
            base = hs % m
            mins = ((base[:, None] * av + bv) % m).min(axis=0)
            out.append(mins.astype(np.int64))
        return pd.Series(out)

    return _sig


def minhash_signatures(docs: DataFrame, n: int = 3,
                       k: int = MINHASH_K) -> DataFrame:
    """(doc_id, sig array<bigint>[k]): min over shingles of an affine hash
    family over a 64-bit shingle hash.

    Entirely map-side, zero shuffle (round 1 exploded shingles and
    re-grouped by doc_id, shuffling the whole shingle stream — corpus-sized
    at 100 TB; signatures are a per-doc pure function, nothing needs to
    move). The whole kernel — shingling included — runs in one Arrow-batched
    pandas UDF: a pure-JVM formulation re-evaluated the regex+split per
    lambda element (no CSE inside lambdas, ~3ms/doc) and the k-expression
    signature pipeline re-inlined into every downstream band-hash reference;
    the UDF does one regex pass + one numpy broadcast per doc and gives the
    plan a materialization boundary.
    """
    sig = _minhash_sig_udf(n, k)
    return docs.select("doc_id", sig(F.col("text")).alias("sig"))


def _storage_boundary(df: DataFrame, path: str) -> DataFrame:
    """Write-once parquet materialization boundary: the 100 TB form of the
    in-job persist (round-5 verdict ask #5) — the dataflow lands in
    columnar storage once and every consumer reads the table, instead of
    pinning executor memory/disk blocks that at 10x data spill and churn
    the block manager. Same values by construction (deterministic input,
    lossless types)."""
    df.write.mode("overwrite").parquet(path)
    return df.sparkSession.read.parquet(path)


def minhash_band_candidates(docs: DataFrame, n: int = 3, k: int = MINHASH_K,
                            bands: int = LSH_BANDS,
                            strategy: str = "join",
                            materialize_dir: str | None = None) -> DataFrame:
    """Candidate (id1, id2) pairs from banded LSH. Each doc emits `bands`
    (band_idx, band_hash) rows — shuffle volume is linear in corpus size,
    never all-pairs across buckets; a bucket of s docs emits s(s-1)/2
    ordered pairs under either strategy (pair-set equality is tested).

    Two physical strategies, an honest measured tradeoff at TWO data
    scales (tools/ab_minhash.py --mode strategy, 630k- and 6.3M-doc
    corpora, local[32], fresh-JVM cold, interleaved; BENCH.md "MinHash
    band-strategy tradeoff"):

    - "join" (default): persist the band entries once, equality self-join
      on the band key. The band-entry dataflow crosses the wire TWICE (two
      exchange inputs), but pair expansion runs inside codegen sort-merge
      join. At 630k docs wall is tied with "group" (21.9 vs 20.0 s best,
      inside box noise); at 6.3M docs join wins decisively (486.8 vs
      708.9 s — group = 1.456x) because large buckets make the
      non-codegen aggregate the dominant cost while the extra exchange
      input is memcpy on a single box.
    - "group": groupBy the band key, collect_list the bucket, stream pairs
      out via chained posexplode + explode(slice(...)) — the dataflow
      crosses the wire exactly ONCE (~0.81x the shuffle bytes at both
      scales, no persist), but collect_list plans as ObjectHashAggregate
      (no codegen) and pays for it in wall time as buckets grow. Kept
      selectable for genuinely network-bound clusters where ~19% fewer
      wire bytes can out-weigh the codegen loss (unmeasured here — no
      real network in this sandbox).

    Memory shape on a hot bucket is O(s) per task under both: the join
    streams matches; the group path pins (ids, id1) with posexplode and
    generates partners row-at-a-time from explode(slice(ids, i+2, ...)) —
    the only materialized array is the s-element id list (a single nested
    transform+flatten would materialize all s(s-1)/2 pair structs in one
    row and break past s~65k). Degenerate corpora still pay O(s^2) OUTPUT
    rows — that is the LSH contract."""
    if strategy not in ("join", "group"):
        raise ValueError(f"unknown strategy {strategy!r}")
    r = k // bands
    sigs = minhash_signatures(docs, n, k)
    band_entries = sigs.select(
        "doc_id",
        F.posexplode(
            F.array(*[
                F.xxhash64(F.concat_ws(
                    ",", *[F.element_at("sig", bi * r + j + 1).cast("string")
                           for j in range(r)]
                ))
                for bi in range(bands)
            ])
        ).alias("band_idx", "band_hash"),
    )
    if strategy == "join":
        # materialize the band entries ONCE before the self-join: both
        # join sides reference this dataflow, and without a boundary Spark
        # plans two full scans — the expensive signature UDF twice over
        # the whole corpus (measured 2x wall on a 6.3M-doc corpus). At
        # 100 TB you'd persist signatures as a TABLE — materialize_dir is
        # that form (write-once parquet, storage-backed); persist() is
        # the in-job default (LRU-evictable, spills to disk).
        if materialize_dir is not None:
            import os as _os

            band_entries = _storage_boundary(
                band_entries, _os.path.join(materialize_dir, "band_entries"))
        else:
            _pin(band_entries)
        a = band_entries.alias("a")
        b = band_entries.alias("b")
        return (
            a.join(b, (F.col("a.band_idx") == F.col("b.band_idx"))
                   & (F.col("a.band_hash") == F.col("b.band_hash"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(F.col("a.doc_id").alias("id1"),
                    F.col("b.doc_id").alias("id2"))
            .dropDuplicates(["id1", "id2"])
        )
    # "group": one shuffle buckets members per band key, pairs streamed
    # row-locally. sort_array fixes collect_list's nondeterministic order
    # AND yields id1 < id2 for free; the same pair found in several bands
    # still needs the final dropDuplicates. posexplode's pos is 0-based
    # and slice's start is 1-based, so partners-after-i start at i+2;
    # explode of an empty slice (last element) emits nothing.
    return (
        band_entries
        .groupBy("band_idx", "band_hash")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
        .filter(F.size("ids") >= 2)
        .select("ids", F.posexplode("ids").alias("i", "id1"))
        .select(
            "id1",
            F.explode(
                F.slice("ids", F.col("i") + F.lit(2), F.size("ids"))
            ).alias("id2"))
        .dropDuplicates(["id1", "id2"])
    )


def minhash_lsh_pairs(docs: DataFrame, n: int = 3, k: int = MINHASH_K,
                      bands: int = LSH_BANDS,
                      threshold: float = 0.5,
                      strategy: str = "join",
                      materialize_dir: str | None = None) -> DataFrame:
    """Near-dup pairs: banded LSH candidates verified by **exact** Jaccard.

    The verify stage joins candidates back to per-doc shingle arrays and
    computes true Jaccard via array_intersect — so precision is exactly 1
    and the output is the recall-limited subset of `ngram_jaccard_pairs` at
    the same threshold (at the shipped parameters recall ≈ 1 for j >= 0.5;
    miss prob (1-j^2)^16). Candidates are tiny relative to the corpus, so
    the two verify joins move only candidate rows + their shingle arrays.
    `strategy` selects the candidate-generation physical shape — see
    minhash_band_candidates for the measured join-vs-group tradeoff.

    Lifetime note: this pins the band entries (join strategy) and the
    shingle arrays with persist() for the duration of the caller's
    action; long-lived sessions should call `release_persisted()` after
    consuming the result (see the note at `_PERSISTED`).
    """
    cands = minhash_band_candidates(docs, n, k, bands, strategy,
                                    materialize_dir)
    sh = docs.select("doc_id", shingles_udf(n)(F.col("text")).alias("sh"))
    # same single-evaluation boundary as the band entries above: s1 and s2
    # both read this dataflow, and unpersisted the shingle UDF would run
    # two more full corpus passes
    if materialize_dir is not None:
        import os as _os

        sh = _storage_boundary(sh, _os.path.join(materialize_dir, "shingles"))
    else:
        _pin(sh)
    s1 = sh.select(F.col("doc_id").alias("id1"), F.col("sh").alias("sh1"))
    s2 = sh.select(F.col("doc_id").alias("id2"), F.col("sh").alias("sh2"))
    common = F.size(F.array_intersect("sh1", "sh2"))
    jac = common / (F.size("sh1") + F.size("sh2") - common)
    # materialize the O(shingles) Jaccard once before filtering on it —
    # Filter/Project expression reuse is a codegen optimization, not a
    # plan guarantee (SCALE.md round-4 note; same structural fix as
    # embedding_neardup_pairs)
    return (
        cands.join(s1, "id1").join(s2, "id2")
        .withColumn("_jac", jac)
        .filter(F.col("_jac") >= threshold)
        .select("id1", "id2", F.round("_jac", 6).alias("jaccard"))
    )


# ------------------------------------------------------- dedup clustering

def connected_components(pairs: DataFrame, id1: str = "id1",
                         id2: str = "id2", max_iter: int = 25,
                         reliable: bool = False) -> DataFrame:
    """(doc_id, component_id) for every doc in a similarity-pair graph;
    component_id = min doc_id in the component (the dedup keeper).

    Min-label propagation with path halving: each round a node takes the
    min over (its label, its neighbors' labels, its label's label — the
    pointer jump). The jump gives the O(log diameter) round bound of the
    large-star/small-star family (Kiveris et al.) while keeping plain
    DataFrame joins: round 2 upgrades — a 300-node path converges in ~8
    rounds where plain neighbor-min needed 300 (test-covered).

    Per-round cost: ONE job — the localCheckpoint is LAZY and the round's
    convergence count is the action that materializes it (an eager
    checkpoint ran its own job first, doubling the per-round job count;
    round-6 measurement: 2.35 s -> ~1.5 s for the same 477-node graph).
    Later rounds (and the final return) read the checkpointed blocks —
    no recompute, no extra join.
    Raises RuntimeError if max_iter exhausts while labels still move —
    silently returning non-converged (wrong) components would make
    dedup_keep_first retain duplicates with no signal (round-2 advice).

    `reliable=True` (round-5 verdict ask #3) swaps localCheckpoint for
    reliable `checkpoint()` into `sparkContext.setCheckpointDir` (caller
    must have set it): localCheckpoint blocks live on executor storage
    with lineage truncated, so on a real cluster a lost/preempted
    executor mid-iteration fails the job unrecoverably; reliable
    checkpoints survive executor loss at the cost of a filesystem
    write+read per round. Keep False on stable executors (local mode,
    on-demand nodes); flip on spot/preemptible fleets. Convergence and
    labels are identical under both (test-covered).
    """
    if reliable:
        def _ckpt(df, eager=True):
            return df.checkpoint(eager=eager)
    else:
        def _ckpt(df, eager=True):
            return df.localCheckpoint(eager=eager)
    # both edge directions from ONE pass over `pairs`: the old
    # union-of-two-selects planned the (expensive — LSH verify join)
    # pairs dataflow twice, once per branch; explode emits (a,b) and
    # (b,a) from the same scan — identical edge multiset, half the work
    e = pairs.select(
        F.explode(F.array(
            F.struct(F.col(id1).alias("a"), F.col(id2).alias("b")),
            F.struct(F.col(id2).alias("a"), F.col(id1).alias("b")),
        )).alias("e")
    ).select("e.a", "e.b")
    edges = _ckpt(e.distinct())
    labels = (edges.select(F.col("a").alias("node")).distinct()
              .withColumn("label", F.col("node")))
    changed = -1  # sentinel: max_iter <= 0 must still raise cleanly below
    for _ in range(max_iter):
        neigh = (
            edges.join(labels, edges["b"] == labels["node"])
            .groupBy("a").agg(F.min("label").alias("nmin"))
        )
        stepped = (
            labels.join(neigh, labels["node"] == neigh["a"], "left")
            .select(
                "node",
                F.col("label").alias("old_label"),
                F.least(F.col("label"),
                        F.coalesce(F.col("nmin"), F.col("label")))
                .alias("label"),
            )
        )
        # path halving: label <- min(label, label(label)). Labels are
        # always existing node ids, so the self-join resolves every row.
        ptr = labels.select(F.col("node").alias("pnode"),
                            F.col("label").alias("plabel"))
        jumped = (
            stepped.join(ptr, stepped["label"] == ptr["pnode"], "left")
            .select(
                "node", "old_label",
                F.least(F.col("label"),
                        F.coalesce(F.col("plabel"), F.col("label")))
                .alias("label"),
            )
        )
        jumped = _ckpt(jumped, eager=False)  # materialized by the count below
        changed = jumped.filter(F.col("label") < F.col("old_label")).count()
        labels = jumped.select("node", "label")
        if changed == 0:
            return labels.select(F.col("node").alias("doc_id"),
                                 F.col("label").alias("component_id"))
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds "
        f"({changed} labels still moving) — raise max_iter; returning "
        "non-converged labels would silently mislabel components")


def dedup_components(docs: DataFrame, n: int = 3,
                     threshold: float = 0.5) -> DataFrame:
    """Near-duplicate clusters: minhash-LSH pairs (exact-Jaccard verified)
    -> connected components. The standard corpus-dedup shape: keep
    component_id == doc_id rows, drop the rest."""
    pairs = minhash_lsh_pairs(docs, n=n, threshold=threshold)
    return connected_components(pairs)


def dedup_keep_first(docs: DataFrame, n: int = 3,
                     threshold: float = 0.5) -> DataFrame:
    """The actionable form of near-dup removal: the corpus minus every
    non-keeper member of a near-dup component (keeper = min doc_id).
    Left-anti join against the small non-keeper set — the docs table never
    re-shuffles."""
    comp = dedup_components(docs, n=n, threshold=threshold)
    losers = comp.filter(F.col("component_id") != F.col("doc_id")) \
        .select("doc_id")
    return docs.join(losers, "doc_id", "left_anti")


# ----------------------------------------------------------------- simhash

def simhash64_scalar(t: str) -> int:
    """Reference scalar SimHash (one doc) — the spec the vectorized kernel
    must match bit-for-bit; kept for tests and tiny inputs.

    Token hash: the first 16 hex chars of md5 read as a uint64 — chosen
    (over the round-1/2 crc32 pair) because it is *SQL-computable*:
    DuckDB's ``('0x' || substr(md5(w), 1, 16))::UBIGINT`` produces the
    identical value, which makes the whole simhash pipeline (fingerprint →
    pigeonhole block join → Hamming verify) ground-truth checkable by a
    full-value SQL oracle. Same trick `winnow_py` uses for winnowing.
    Bitwise majority vote weighted +1/-1.
    """
    import hashlib

    if not t:
        return 0
    acc = [0] * 64
    for w in t.lower().split():
        h = int(hashlib.md5(w.encode("utf-8")).hexdigest()[:16], 16)
        for bit in range(64):
            acc[bit] += 1 if (h >> bit) & 1 else -1
    fp = 0
    for bit in range(64):
        if acc[bit] > 0:
            fp |= 1 << bit
    return int(np.uint64(fp).astype(np.int64))


@F.pandas_udf(T.LongType())
def simhash64(text: pd.Series) -> pd.Series:
    """64-bit SimHash over word tokens, numpy-vectorized per Arrow batch.

    Same fingerprints as `simhash64_scalar` (regression-tested): token
    hashes (md5 first-16-hex as uint64 — SQL-computable, see the scalar's
    docstring) are gathered into a uint64 array (memoized per batch — word
    reuse is high in natural text), the 64 majority votes are one
    bit-matrix sum (`(hs >> bitpos) & 1`), and the fingerprint is a
    masked power-of-two sum. Replaces round 1's per-word 64-iteration
    Python loop (~10-100x)."""
    import hashlib

    bitpos = np.arange(64, dtype=np.uint64)
    pow2 = np.uint64(1) << bitpos
    cache: dict[str, int] = {}
    out = np.zeros(len(text), dtype=np.int64)
    for row, t in enumerate(text):
        if not t:
            continue
        words = t.lower().split()
        if not words:
            continue
        hs = np.empty(len(words), dtype=np.uint64)
        for i, w in enumerate(words):
            h = cache.get(w)
            if h is None:
                # first 8 digest bytes big-endian == first 16 hex chars as
                # uint64 (the SQL-computable spec), minus the hex round-trip
                h = int.from_bytes(
                    hashlib.md5(w.encode("utf-8")).digest()[:8], "big")
                cache[w] = h
            hs[i] = h
        # acc[bit] = (#set) - (#unset) = 2*(#set) - n_words
        nset = ((hs[:, None] >> bitpos) & np.uint64(1)).sum(axis=0)
        fp = pow2[2 * nset > len(words)].sum(dtype=np.uint64)
        out[row] = np.uint64(fp).astype(np.int64)
    return pd.Series(out)


def simhash_fingerprints(docs: DataFrame) -> DataFrame:
    return docs.select("doc_id", simhash64(F.col("text")).alias("simhash"))


def simhash_pairs(docs: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs with Hamming distance <= max_hamming.

    Candidate generation: split the 64-bit fingerprint into max_hamming + 1
    blocks; by pigeonhole, any pair within the radius agrees on at least one
    block — equality-join on (block_idx, block_value), then verify exact
    Hamming via bit_count(xor). Linear shuffle volume, like LSH.
    """
    nb = max_hamming + 1
    width = 64 // nb
    fp = simhash_fingerprints(docs)
    blocks = fp.select(
        "doc_id", "simhash",
        F.explode(F.array(*[
            F.struct(
                F.lit(i).alias("block_idx"),
                F.shiftrightunsigned("simhash", i * width)
                 .bitwiseAND(F.lit((1 << width) - 1)).alias("block_val"),
            )
            for i in range(nb)
        ])).alias("b"),
    ).select("doc_id", "simhash", "b.block_idx", "b.block_val")

    a = blocks.alias("a")
    b = blocks.alias("b")
    return (
        a.join(b, (F.col("a.block_idx") == F.col("b.block_idx"))
               & (F.col("a.block_val") == F.col("b.block_val"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(
            F.col("a.doc_id").alias("id1"), F.col("b.doc_id").alias("id2"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
             .alias("hamming"),
        )
        # verify BEFORE dedup: bit_count is columnar-cheap on the full
        # candidate stream, and it shrinks the dropDuplicates shuffle from
        # O(candidates) to O(true pairs x <= nb block collisions)
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id1", "id2"])
    )


# ------------------------------------------------------- passage-level dedup

PASSAGE_WORDS = 10


def passage_dedup(docs: DataFrame,
                  passage_words: int = PASSAGE_WORDS,
                  hash_keys: bool = False) -> DataFrame:
    """CCNet-style sub-document dedup: split each document into fixed
    `passage_words`-word passages and keep only the FIRST occurrence of
    each distinct passage corpus-wide (first = lowest (doc_id, chunk_idx)).

    The shape that removes boilerplate/quoted text a whole-doc hash never
    catches. Chunking is a pure column map (no UDF); the only shuffle is
    the window partition on the passage identity.

    `hash_keys=True` is the 100 TB switch: partition the window on
    xxhash64(passage) so only an 8-byte key rides the exchange sort key
    instead of the passage text. Two DIFFERENT passages colliding in the
    64-bit hash would dedupe together — probability ~n^2/2^65 (birthday
    bound; ~3e-7 even at 10^9 distinct passages), the standard accepted
    risk for content-defined dedup keys; the exact-verify tail-join
    pattern of minhash applies if that is not acceptable. Both modes
    produce identical survivors on collision-free inputs
    (equivalence-tested).

    Returns surviving (doc_id, chunk_idx, passage) rows.
    """
    from glm_ocr_spark.operators.norm import real_words_udf

    # materialize the word array ONCE per doc (Arrow twin) — the chunk
    # transform references it per chunk and lambda bodies get no CSE
    words = F.col("ws")
    n_chunks = F.ceil(F.size(words) / F.lit(passage_words)).cast("int")
    # guard: Spark sequence(0, -1) generates a DESCENDING [0, -1], so a
    # zero-word doc (whitespace-only text) must short-circuit to no chunks
    chunks = F.when(
        F.size(words) > 0,
        F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.concat_ws(
                " ", F.slice(words, i * passage_words + 1, passage_words)),
        ),
    ).otherwise(F.array())
    exploded = (
        docs.filter(F.trim("text") != "")
        .select("doc_id", real_words_udf().alias("ws"))
        .select("doc_id", F.posexplode(chunks).alias("chunk_idx", "passage"))
    )
    key = F.xxhash64("passage") if hash_keys else F.col("passage")
    w = Window.partitionBy(key).orderBy(F.asc("doc_id"),
                                        F.asc("chunk_idx"))
    return (
        exploded.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("doc_id", "chunk_idx", "passage")
    )
