"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride in `binary` columns; all Spark-side machinery
(schemas, partition-friendly metadata extraction, Arrow batch shapes for
decode UDFs) is real and tested. The actual media decode is feature-gated:
when PIL is importable (`_pil()`), `extract_media_features` decodes real
pixel dimensions + a grayscale-histogram feature and `resize_media` does a
real `Image.resize`; without PIL (this container) the deterministic stubs
run instead, so the distributed plumbing is exercised end-to-end either
way. The gate is evaluated on the EXECUTOR (inside the Arrow batch fn),
which is where the library must exist on a real cluster.
"""

from __future__ import annotations

import hashlib
import io

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


_PIL_CACHE: list = []


def _pil():
    """PIL.Image if installed, else None — the real-decode feature gate.
    Import is attempted lazily per process (executor-side), never at
    module import, so the module loads identically with or without PIL.
    The result (including a FAILED import — Python does not cache those)
    is memoized: without memoization every row in the Arrow batch loop
    would pay a full sys.path finder scan on PIL-less executors."""
    if not _PIL_CACHE:
        try:
            from PIL import Image
            _PIL_CACHE.append(Image)
        except ImportError:
            _PIL_CACHE.append(None)
    return _PIL_CACHE[0]

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
    # real pixel dims when PIL decodes the payload; NULL on the stub path
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
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


def hist_feature(hist: list[int], dim: int) -> list[float]:
    """dim-bin normalized rollup of a 256-bin grayscale histogram.

    Balanced binning (slot i covers hist[256*i//dim : 256*(i+1)//dim]) so
    every one of the 256 histogram bins lands in exactly one feature slot
    AND every feature slot covers a near-equal bin range. The two earlier
    schemes both failed a review: floor (256 // dim) dropped the tail
    bins for dim not dividing 256 (feature no longer summed to 1, all
    zeros for dim > 256), and ceiling division exhausted the 256 bins
    early (dim=100 left 14 structurally-dead trailing slots). PIL-free on
    purpose so the binning is unit-testable in this container;
    `decode_image_real` is the PIL-gated caller."""
    total = float(sum(hist)) or 1.0
    return [sum(hist[256 * i // dim:256 * (i + 1) // dim]) / total
            for i in range(dim)]


def decode_image_real(payload: bytes, dim: int = 8):
    """(width, height, feature) via PIL — the real-decode path behind the
    feature gate. Feature = dim-bin normalized grayscale histogram
    (deterministic for a given payload). Returns None on undecodable
    payloads so callers fall back to the stub."""
    img_mod = _pil()
    if img_mod is None or not payload:
        return None
    try:
        with img_mod.open(io.BytesIO(payload)) as im:
            w, h = im.size
            hist = im.convert("L").histogram()  # 256 bins
    except Exception:  # noqa: BLE001 - not an image: stub fallback
        return None
    return w, h, hist_feature(hist, dim)


def extract_media_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """mapInPandas over binary payloads -> typed metadata + features.

    With PIL on the executors, image payloads get real pixel dims + a
    grayscale-histogram feature; otherwise (this container) the
    deterministic stub runs and width/height are NULL. Arrow moves the
    binary column zero-copy into the Python worker; the batch loop is the
    shape a real decoder needs (bounded memory per batch, no driver
    collect). Narrow map: no shuffle.
    """

    def _batches(batches):
        for pdf in batches:
            payloads = pdf["payload"]
            n = len(pdf)
            mimes, lens, shas, ws, hs, feats = [], [], [], [], [], []
            for i in range(n):
                p = payloads.iat[i]
                p = bytes(p) if p is not None else b""
                mimes.append(sniff_mime(p))
                lens.append(len(p))
                shas.append(hashlib.sha1(p).hexdigest())
                real = decode_image_real(p, dim)
                if real is not None:
                    ws.append(real[0])
                    hs.append(real[1])
                    feats.append(real[2])
                else:
                    ws.append(None)
                    hs.append(None)
                    feats.append(decode_image_stub(p, fake=True, dim=dim))
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "mime": mimes,
                "byte_len": lens,
                "sha1": shas,
                "width": pd.array(ws, dtype="Int32"),
                "height": pd.array(hs, dtype="Int32"),
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


def resize_image_real(payload: bytes, target_w: int, target_h: int):
    """Real PIL resize -> PNG bytes, or None (no PIL / not an image) so
    callers fall back to the stub."""
    img_mod = _pil()
    if img_mod is None or not payload:
        return None
    try:
        with img_mod.open(io.BytesIO(payload)) as im:
            out = io.BytesIO()
            im.resize((target_w, target_h)).save(out, format="PNG")
            return out.getvalue()
    except Exception:  # noqa: BLE001 - not an image: stub fallback
        return None


def resize_media(media: DataFrame, target_w: int = 64,
                 target_h: int = 64) -> DataFrame:
    """mapInPandas resize: one output row per input, bounded per-batch
    memory (payload in, resized payload out), narrow map. Real PIL resize
    when the executor has PIL and the payload decodes; stub otherwise."""

    def _one(p) -> bytes:
        p = bytes(p) if p is not None else b""
        real = resize_image_real(p, target_w, target_h)
        return real if real is not None else resize_image_stub(
            p, target_w, target_h)

    def _batches(batches):
        for pdf in batches:
            outs = [_one(p) for p in pdf["payload"]]
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
