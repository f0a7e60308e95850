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

Determinism: all hash families are fixed-parameter (crc32/xxhash64-based),
so resume/retry recompute identical results.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ----------------------------------------------------------------- shingles

def norm_text_col():
    return F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " "))


def shingles_col(n: int = 3):
    """Distinct word n-gram shingles of the normalized text (array<string>).

    0-based Spark `transform` over a sequence; the DuckDB oracle mirrors it
    1-based. Documents with < n words produce a single whole-text shingle so
    short docs still participate.
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
    sh = docs.select(
        "doc_id", F.explode(shingles_col(n)).alias("shingle")
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
LSH_BANDS = 8           # bands of r = K / BANDS rows
# 31-bit Mersenne prime: with base < 2^31 and a,b < 2^31 the affine form
# base*a + b stays under 2^63, so the whole family runs in JVM longs with no
# overflow (ANSI mode safe).
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


def minhash_signatures(docs: DataFrame, n: int = 3,
                       k: int = MINHASH_K) -> DataFrame:
    """(doc_id, sig array<bigint>[k]): min over shingles of affine hashes of
    xxhash64(shingle). Shingling is map-side; the only shuffle is the
    groupBy(doc_id) — O(docs x shingles) not O(docs^2)."""
    params = _hash_params(k)
    sh = docs.select("doc_id", F.explode(shingles_col(n)).alias("shingle"))
    base = F.pmod(F.xxhash64("shingle"), F.lit(_MERSENNE))
    mins = [
        F.min((base * F.lit(a) + F.lit(b)) % _MERSENNE).alias(f"h{i}")
        for i, (a, b) in enumerate(params)
    ]
    agg = sh.groupBy("doc_id").agg(*mins)
    return agg.select(
        "doc_id", F.array(*[f"h{i}" for i in range(k)]).alias("sig")
    )


def minhash_lsh_pairs(docs: DataFrame, n: int = 3, k: int = MINHASH_K,
                      bands: int = LSH_BANDS,
                      threshold: float = 0.5) -> DataFrame:
    """Near-dup pairs: banded LSH candidates verified by signature Jaccard.

    Candidates come from equality joins on (band_idx, band_hash) — each doc
    emits `bands` rows, so shuffle volume is linear in corpus size. Estimated
    Jaccard = fraction of agreeing minhash components.
    """
    r = k // bands
    sigs = minhash_signatures(docs, n, k)
    band_entries = sigs.select(
        "doc_id", "sig",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(bi).alias("band_idx"),
                    F.xxhash64(F.concat_ws(
                        ",", *[F.element_at("sig", bi * r + j + 1).cast("string")
                               for j in range(r)]
                    )).alias("band_hash"),
                )
                for bi in range(bands)
            ])
        ).alias("band"),
    ).select("doc_id", "sig", "band.band_idx", "band.band_hash")

    a = band_entries.alias("a")
    b = band_entries.alias("b")
    cands = (
        a.join(b, (F.col("a.band_idx") == F.col("b.band_idx"))
               & (F.col("a.band_hash") == F.col("b.band_hash"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(
            F.col("a.doc_id").alias("id1"), F.col("b.doc_id").alias("id2"),
            F.col("a.sig").alias("sig1"), F.col("b.sig").alias("sig2"),
        )
        .dropDuplicates(["id1", "id2"])
    )
    est = F.round(
        F.size(F.filter(F.zip_with("sig1", "sig2", lambda x, y: x == y),
                        lambda v: v)) / F.lit(k),
        6,
    )
    return (
        cands.withColumn("est_jaccard", est)
        .filter(F.col("est_jaccard") >= threshold)
        .select("id1", "id2", "est_jaccard")
    )


# ----------------------------------------------------------------- simhash

@F.pandas_udf(T.LongType())
def simhash64(text: pd.Series) -> pd.Series:
    """64-bit SimHash over word tokens (vectorized per Arrow batch).

    Token hash: two crc32 variants concatenated to 64 bits; bitwise
    majority vote weighted +1/-1.
    """
    import zlib

    out = np.zeros(len(text), dtype=np.int64)
    for row, t in enumerate(text):
        if not t:
            continue
        acc = np.zeros(64, dtype=np.int64)
        for w in t.lower().split():
            wb = w.encode("utf-8")
            h = (zlib.crc32(wb) << 32) | zlib.crc32(wb[::-1] + b"#")
            for bit in range(64):
                acc[bit] += 1 if (h >> bit) & 1 else -1
        fp = 0
        for bit in range(64):
            if acc[bit] > 0:
                fp |= 1 << bit
        out[row] = np.int64(np.uint64(fp).astype(np.int64))
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
        .dropDuplicates(["id1", "id2"])
        .filter(F.col("hamming") <= max_hamming)
    )
