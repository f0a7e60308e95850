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


RESIZED_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("payload", T.BinaryType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
])


def resize_image_stub(payload: bytes, target_w: int, target_h: int,
                      *, fake: bool = True) -> bytes:
    """STUB: image resize. Real implementation = PIL `Image.resize` after
    decode (the reference's smart_resize analog operates on pixel dims,
    kernel/canonicalize.py holds the boundary math). The deterministic fake
    re-hashes the payload to exactly target_w*target_h//64 bytes so batch
    memory shapes are realistic. Strict mode raises."""
    if not fake:
        raise NotImplementedError(
            "image resize requires PIL, not present in this environment")
    n = max(1, target_w * target_h // 64)
    out = bytearray()
    seed = payload or b"\x00"
    while len(out) < n:
        seed = hashlib.sha256(seed).digest()
        out.extend(seed)
    return bytes(out[:n])


def resize_media(media: DataFrame, target_w: int = 64,
                 target_h: int = 64) -> DataFrame:
    """mapInPandas resize: one output row per input, bounded per-batch
    memory (payload in, resized payload out), narrow map."""

    def _batches(batches):
        for pdf in batches:
            outs = [resize_image_stub(bytes(p) if p is not None else b"",
                                      target_w, target_h)
                    for p in pdf["payload"]]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "payload": outs,
                "width": [target_w] * len(pdf),
                "height": [target_h] * len(pdf),
            })

    return media.select("media_id", "payload").mapInPandas(
        _batches, schema=RESIZED_SCHEMA)


FRAME_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("frame_len", T.IntegerType()),
    T.StructField("frame", T.BinaryType()),
])


def sample_frames(media: DataFrame, chunk_bytes: int = 4096) -> DataFrame:
    """Video frame-sampling plumbing: one input row fans out to one row per
    fixed-size payload chunk ("frame"), inside mapInPandas — the 1->N batch
    shape a real keyframe sampler (ffmpeg) needs, with bounded memory (one
    input batch's frames at a time, never a full video in one list). The
    chunking is deterministic, so the fan-out arithmetic has an exact SQL
    oracle even though real decoding is stubbed."""

    def _batches(batches):
        for pdf in batches:
            ids, idxs, lens, frames = [], [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                p = bytes(p) if p is not None else b""
                for k in range(0, len(p), chunk_bytes):
                    chunk = p[k:k + chunk_bytes]
                    ids.append(mid)
                    idxs.append(k // chunk_bytes)
                    lens.append(len(chunk))
                    frames.append(chunk)
            yield pd.DataFrame({
                "media_id": pd.Series(ids, dtype="int64"),
                "frame_idx": pd.Series(idxs, dtype="int32"),
                "frame_len": pd.Series(lens, dtype="int32"),
                "frame": pd.Series(frames, dtype=object),
            })

    return media.select("media_id", "payload").mapInPandas(
        _batches, schema=FRAME_SCHEMA)


def docs_as_media(docs: DataFrame) -> DataFrame:
    """Adapter for tests/benches: treat document text bytes as an opaque
    payload so the binary plumbing can run against the synthetic corpus."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.lit("text/plain").alias("mime"),
    )
