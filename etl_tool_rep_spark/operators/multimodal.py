"""Multimodal column plumbing: opaque binary payloads + typed
metadata, with Pandas-UDF decode/feature stages.

The Spark-side design is the real deliverable: binary columns travel
as ``BinaryType`` with a typed metadata struct; decode/feature-extract
run as Arrow-batched ``mapInPandas`` stages so each batch crosses the
JVM/Python boundary once. Partitioning guidance at scale: repartition
by a size-balanced key before the decode stage (decode cost tracks
payload bytes, not row count).

The actual image/audio decode is STUBBED: the decode libraries (PIL,
torchaudio, ...) are not in this container. ``decode_image`` raises
NotImplementedError unless PIL is importable; the feature extractor
below uses a clearly-marked deterministic fake so the pipeline shape
(schema, batching, UDF signatures) is real and testable.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # gated import — not present in this environment
    from PIL import Image  # noqa: F401
    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False

FEATURE_DIM = 8

FEATURES_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("features", T.ArrayType(T.DoubleType())),
])


def attach_payload(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Model a multimodal table: binary payload column + typed
    metadata struct (what a real image/audio table looks like; here
    the payload is the utf-8 text bytes)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col),
        payload.alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("content_type"),
            F.octet_length(payload).cast("long").alias("n_bytes"),
            F.sha2(payload, 256).alias("sha256"),
        ).alias("meta"))


def decode_image(payload: bytes):
    """Decode an image payload. STUB: requires PIL, which this
    container does not ship."""
    if not _HAS_PIL:
        raise NotImplementedError(
            "image decode requires PIL; not available in this environment")
    import io
    return Image.open(io.BytesIO(payload))


def resize_image(payload: bytes, width: int, height: int) -> bytes:
    """Resize an image payload. STUB: requires PIL (absent here); the
    Spark-side wiring (binary in -> binary out inside mapInPandas) is
    the real deliverable."""
    if not _HAS_PIL:
        raise NotImplementedError(
            "image resize requires PIL; not available in this environment")
    import io
    img = decode_image(payload)
    buf = io.BytesIO()
    img.resize((width, height)).save(buf, format=img.format or "PNG")
    return buf.getvalue()


def sample_frames(payload: bytes, every_n: int = 30) -> list[bytes]:
    """Sample frames from a video payload. STUB: no video decoder in
    this container. A real implementation yields one binary per
    sampled frame from a mapInPandas stage (one row in, N rows out via
    explode on the returned array column)."""
    raise NotImplementedError(
        "video frame sampling requires a decoder (e.g. av/ffmpeg); "
        "not available in this environment")


def _fake_features(payload: bytes) -> list[float]:
    """DETERMINISTIC FAKE feature vector standing in for a real
    decode->embed stage: simple byte statistics, stable across runs.
    Swap with a real model without touching the Spark plan."""
    n = len(payload)
    if n == 0:
        return [0.0] * FEATURE_DIM
    head = payload[0]
    tail = payload[-1]
    s = sum(payload)
    return [float(n), float(head), float(tail), float(s % 997),
            float(s / n), float(min(payload)), float(max(payload)),
            float(len(set(payload)))]


def extract_features(df: DataFrame) -> DataFrame:
    """Arrow-batched mapInPandas feature extraction over binary
    payloads — the canonical multimodal slow-path stage. One
    Python crossing per Arrow batch, not per row."""
    import pandas as pd

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "n_bytes": pdf["payload"].map(len),
                "features": pdf["payload"].map(_fake_features),
            })

    return df.select("doc_id", "payload").mapInPandas(
        batches, schema=FEATURES_SCHEMA)
