"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride in `binary` columns; all Spark-side machinery
(schemas, partition-friendly metadata extraction, Arrow batch shapes for
decode UDFs) is real and tested. The actual media decode is STUBBED — the
container has no image/audio libraries — behind `decode_image_stub`, which
either raises NotImplementedError (strict mode) or produces a deterministic
fake feature vector (test mode). Swapping in PIL/ffmpeg later changes one
function body, not the pipeline.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("payload", T.BinaryType()),
    T.StructField("mime", T.StringType()),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("mime", T.StringType()),
    T.StructField("byte_len", T.IntegerType()),
    T.StructField("sha1", T.StringType()),
    T.StructField("feature", T.ArrayType(T.FloatType())),
])

_MAGIC = [
    (b"\x89PNG", "image/png"),
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"GIF8", "image/gif"),
    (b"RIFF", "audio/wav"),
    (b"%PDF", "application/pdf"),
]


def sniff_mime(payload: bytes | None) -> str:
    if not payload:
        return "application/octet-stream"
    for magic, mime in _MAGIC:
        if payload.startswith(magic):
            return mime
    return "application/octet-stream"


def decode_image_stub(payload: bytes, *, fake: bool = True,
                      dim: int = 8) -> list[float]:
    """STUB: media decode/feature-extract.

    Real implementation would decode with PIL/torchvision and return an
    embedding; here we return a deterministic fake (bytes of sha256, scaled)
    so the distributed plumbing is exercised end-to-end. Strict mode raises.
    """
    if not fake:
        raise NotImplementedError(
            "media decoding requires image/audio libraries not present in "
            "this environment; deterministic fake used for plumbing tests"
        )
    digest = hashlib.sha256(payload).digest()
    return [b / 255.0 for b in digest[:dim]]


def extract_media_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """mapInPandas over binary payloads -> typed metadata + stub features.

    Arrow moves the binary column zero-copy into the Python worker; the
    batch loop is the shape a real decoder needs (bounded memory per batch,
    no driver collect). Narrow map: no shuffle.
    """

    def _batches(batches):
        for pdf in batches:
            payloads = pdf["payload"]
            n = len(pdf)
            mimes, lens, shas, feats = [], [], [], []
            for i in range(n):
                p = payloads.iat[i]
                p = bytes(p) if p is not None else b""
                mimes.append(sniff_mime(p))
                lens.append(len(p))
                shas.append(hashlib.sha1(p).hexdigest())
                feats.append(decode_image_stub(p, fake=True, dim=dim))
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "mime": mimes,
                "byte_len": lens,
                "sha1": shas,
                "feature": feats,
            })

    return media.select("media_id", "payload").mapInPandas(
        _batches, schema=FEATURE_SCHEMA
    )


def docs_as_media(docs: DataFrame) -> DataFrame:
    """Adapter for tests/benches: treat document text bytes as an opaque
    payload so the binary plumbing can run against the synthetic corpus."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.lit("text/plain").alias("mime"),
    )
