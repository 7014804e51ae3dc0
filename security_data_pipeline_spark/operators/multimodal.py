"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The Spark-side contract is real and tested — schemas, Arrow batch shapes,
partition-preserving ``mapInPandas`` plumbing, JVM-side metadata extraction —
while the actual codec step is stubbed (no image/audio libraries in this
container): ``decoder="fake"`` produces a deterministic pseudo-decode from
the bytes (stable across runs/engines), ``decoder="pillow"``-style real
decoders raise ``NotImplementedError`` with a clear message until the
dependency is present.

At 100 TB: blobs stay in parquet binary columns; metadata probes
(:func:`attach_blob_metadata`) are pure Column expressions over the binary
(no Python), so pruning/filtering on media properties never deserializes
payloads. Only rows surviving the filter reach the Arrow decode stage.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# magic-byte prefixes → media type (JVM-side sniffing via substring/hex)
_MAGIC = {
    "89504e47": "image/png",
    "ffd8ff": "image/jpeg",
    "47494638": "image/gif",
    "52494646": "audio/wav-or-avi",  # RIFF container
    "494433": "audio/mp3",
}


def attach_blob_metadata(df: DataFrame, blob_col: str = "blob") -> DataFrame:
    """Byte length, md5, sniffed media type — all Column expressions, no UDF.

    These are the columns downstream filters/partitioning key on, so they
    must not require Python deserialization of the payload.
    """
    blob = F.col(blob_col)
    hex_prefix = F.lower(F.hex(F.substring(blob, 1, 4)))
    media_type = F.lit("application/octet-stream")
    for magic, mtype in _MAGIC.items():
        media_type = F.when(
            hex_prefix.startswith(magic.lower()), F.lit(mtype)
        ).otherwise(media_type)
    return (
        df.withColumn("blob_bytes", F.length(blob))
        .withColumn("blob_md5", F.md5(blob))
        .withColumn("media_type", media_type)
    )


DECODED_IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("pixels", T.ArrayType(T.FloatType())),
    ]
)


def _fake_decode_batch(pdf: pd.DataFrame, id_col: str, blob_col: str) -> pd.DataFrame:
    """Deterministic pseudo-decode: 8×8 grayscale derived from the bytes.

    Stands in for a real codec so the full Arrow round-trip (binary in,
    array<float> out, batch-wise) is exercised end-to-end.
    """
    import hashlib

    import numpy as np

    out = {"media_id": [], "width": [], "height": [], "channels": [], "pixels": []}
    for media_id, blob in zip(pdf[id_col], pdf[blob_col]):
        digest = hashlib.md5(bytes(blob)).digest() * 4  # 64 bytes
        pixels = (np.frombuffer(digest, dtype=np.uint8) / 255.0).astype(np.float32)
        out["media_id"].append(media_id)
        out["width"].append(8)
        out["height"].append(8)
        out["channels"].append(1)
        out["pixels"].append(pixels)
    return pd.DataFrame(out)


def decode_images(
    df: DataFrame,
    id_col: str = "media_id",
    blob_col: str = "blob",
    decoder: str = "fake",
) -> DataFrame:
    """Binary → decoded pixel arrays via ``mapInPandas`` (Arrow-batched).

    ``decoder="fake"`` is the deterministic stub; real decoders plug in here
    with the same signature once their libraries exist in the runtime.
    """
    if decoder != "fake":
        raise NotImplementedError(
            f"decoder={decoder!r}: real image codecs are not available in "
            "this runtime; use decoder='fake' (deterministic stub) — the "
            "Spark plumbing (schema/batching/partitioning) is identical."
        )

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _fake_decode_batch(pdf, id_col, blob_col)

    return df.mapInPandas(mapper, DECODED_IMAGE_SCHEMA)


def image_mean_brightness(decoded: DataFrame) -> DataFrame:
    """Feature-extract over decoded pixels — back to pure Column math
    (higher-order aggregate over the array), no second Python hop."""
    n = F.size("pixels")
    total = F.aggregate(
        F.col("pixels").cast("array<double>"), F.lit(0.0), lambda a, x: a + x
    )
    return decoded.withColumn(
        "mean_brightness",
        F.round(total / F.nullif(n, F.lit(0)).cast("double"), 6),
    )


def sample_frames(
    df: DataFrame,
    id_col: str = "media_id",
    blob_col: str = "blob",
    every_n: int = 10,
    decoder: str = "fake",
) -> DataFrame:
    """Video frame-sampling stub: emits one pseudo-frame per ``every_n``
    'frames' (derived deterministically from blob length). Demonstrates the
    1→N explode shape a real frame sampler has (mapInPandas can yield more
    rows than it consumes)."""
    if decoder != "fake":
        raise NotImplementedError("real video codecs unavailable; use 'fake'")

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "frame_index": []}
            for media_id, blob in zip(pdf[id_col], pdf[blob_col]):
                n_frames = max(1, len(bytes(blob)) // 16)
                for idx in range(0, n_frames, every_n):
                    rows["media_id"].append(media_id)
                    rows["frame_index"].append(idx)
            yield pd.DataFrame(rows)

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("frame_index", T.IntegerType()),
        ]
    )
    return df.mapInPandas(mapper, schema)


def resize_images(
    decoded: DataFrame,
    target_width: int = 4,
    target_height: int = 4,
) -> DataFrame:
    """Resize decoded images by box-averaging — pure Column math, no second
    Python hop (same design as :func:`image_mean_brightness`: once pixels
    are an ``array<float>``, transforms stay JVM-side).

    Assumes integer downscale factors (the stub decode is 8×8; real
    resamplers with fractional kernels belong in the decode stage where the
    codec library already lives). Output keeps the decoded-image schema so
    resize chains compose.
    """
    # dataframe-qualified refs: the output select aliases lit(target) AS
    # width/height, and Spark's lateral column aliases would capture bare
    # F.col("width") references in later select items — bind the INPUT
    # attributes explicitly
    src_w = decoded["width"]
    src_h = decoded["height"]
    fx = src_w / target_width
    fy = src_h / target_height
    # target pixel (ty, tx) = mean of its fx×fy source box
    idx = F.sequence(F.lit(0), F.lit(target_width * target_height - 1))
    px = decoded["pixels"].cast("array<double>")

    def one_target(i: F.Column) -> F.Column:
        tx = i % target_width
        ty = F.floor(i / target_width)
        sx0 = (tx * fx).cast("int")
        sy0 = (ty * fy).cast("int")
        box = F.flatten(
            F.transform(
                F.sequence(sy0, sy0 + fy.cast("int") - 1),
                lambda sy: F.transform(
                    F.sequence(sx0, sx0 + fx.cast("int") - 1),
                    lambda sx: F.element_at(px, (sy * src_w + sx + 1).cast("int")),
                ),
            )
        )
        total = F.aggregate(box, F.lit(0.0), lambda a, x: a + x)
        return (total / F.size(box)).cast("float")

    return decoded.select(
        "media_id",
        F.lit(target_width).alias("width"),
        F.lit(target_height).alias("height"),
        "channels",
        F.transform(idx, one_target).alias("pixels"),
    )
