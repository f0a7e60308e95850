"""Similarity search over an embedding column (array<float>).

Two paths:
  cosine_topk        — brute-force top-k against a query vector. All JVM-side
                       (`aggregate`/`zip_with` fold in double precision), no
                       Python. Exact baseline; at 100 TB it's one scan +
                       a k-row takeOrdered — no shuffle of the vectors.
  lsh_bucketed_topk  — random-hyperplane LSH: deterministic pseudo-random
                       hyperplanes, sign-bit bucket id computed map-side;
                       probing restricts the scan to matching buckets
                       (partition-prunable if the table is written
                       bucketed/partitioned by `bucket`). The scale path:
                       candidates are a tiny fraction of the corpus.
  embedding_neardup_pairs — all pairs with cosine >= threshold via bucket
                       candidate join + exact verify.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EMB_DIM = 64


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    ))


def cosine_sim_col(vec_col, query: list[float]):
    q = F.array(*[F.lit(float(v)) for v in query])
    qn = sum(float(v) * float(v) for v in query) ** 0.5
    return F.when(
        _norm(vec_col) > 0,
        _dot(vec_col, q) / (_norm(vec_col) * F.lit(qn)),
    ).otherwise(F.lit(0.0))


def cosine_topk(emb: DataFrame, query: list[float], k: int = 10,
                exclude_id: int | None = None) -> DataFrame:
    """Exact top-k by cosine similarity (rounded to 6dp for stable compares).

    orderBy+limit compiles to TakeOrderedAndProject — each partition keeps
    only k rows, the driver merges; no full sort, no wide shuffle.
    """
    df = emb.select(
        "vec_id",
        F.round(cosine_sim_col(F.col("embedding"), query), 6).alias("cos_sim"),
    )
    if exclude_id is not None:
        df = df.filter(F.col("vec_id") != exclude_id)
    return df.orderBy(F.desc("cos_sim"), F.asc("vec_id")).limit(k)


# ------------------------------------------------------------ LSH buckets

def _hyperplanes(n_planes: int, dim: int = EMB_DIM) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (fixed LCG, no RNG state)."""
    planes = []
    state = 0x9E3779B97F4A7C15
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
            row.append((state / float(1 << 63)) * 2.0 - 1.0)
        planes.append(row)
    return planes


def bucket_col(vec_col, planes: list[list[float]]):
    """Sign-bit bucket id from hyperplane dot products (pure column math)."""
    bucket = F.lit(0)
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(v) for v in p])
        bit = F.when(_dot(vec_col, plane) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        bucket = bucket + bit
    return bucket


def with_lsh_bucket(emb: DataFrame, n_planes: int = 8) -> DataFrame:
    planes = _hyperplanes(n_planes)
    return emb.withColumn("bucket", bucket_col(F.col("embedding"), planes))


def lsh_bucketed_topk(emb: DataFrame, query: list[float], k: int = 10,
                      n_planes: int = 8, probe_hamming: int = 1) -> DataFrame:
    """ANN top-k: only scan vectors whose bucket is within `probe_hamming`
    bits of the query's bucket (multi-probe). Approximate: recall < 1 by
    construction; the bench reports recall vs cosine_topk."""
    planes = _hyperplanes(n_planes)
    qbits = 0
    for i, p in enumerate(planes):
        if sum(a * b for a, b in zip(query, p)) >= 0:
            qbits |= 1 << i
    probes = [qbits]
    if probe_hamming >= 1:
        probes += [qbits ^ (1 << i) for i in range(n_planes)]
    bucketed = with_lsh_bucket(emb, n_planes)
    cand = bucketed.filter(F.col("bucket").isin(probes))
    return cand.select(
        "vec_id",
        F.round(cosine_sim_col(F.col("embedding"), query), 6).alias("cos_sim"),
    ).orderBy(F.desc("cos_sim"), F.asc("vec_id")).limit(k)


def embedding_neardup_pairs(emb: DataFrame, threshold: float = 0.95,
                            n_planes: int = 6) -> DataFrame:
    """All near-duplicate pairs (cosine >= threshold): LSH-bucket candidate
    join + exact cosine verify. High-cosine pairs land in the same bucket
    with high probability; the join is per-bucket, never all-pairs."""
    bucketed = with_lsh_bucket(emb, n_planes)
    a = bucketed.alias("a")
    b = bucketed.alias("b")
    sim = F.round(
        _dot(F.col("a.embedding"), F.col("b.embedding"))
        / (_norm(F.col("a.embedding")) * _norm(F.col("b.embedding"))),
        6,
    )
    return (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket"))
               & (F.col("a.vec_id") < F.col("b.vec_id")))
        .select(
            F.col("a.vec_id").alias("id1"),
            F.col("b.vec_id").alias("id2"),
            sim.alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )
