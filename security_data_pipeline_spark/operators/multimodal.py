"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The Spark-side contract is real and tested — schemas, Arrow batch shapes,
partition-preserving ``mapInPandas`` plumbing, JVM-side metadata extraction —
while the codec step dispatches on what the runtime provides:
``decoder="auto"`` (the default for callers that want real decodes when
possible) uses Pillow / PyAV when importable and falls back to the
deterministic stub otherwise; ``decoder="fake"`` forces the stub (stable
across runs/engines — what the oracle-checked queries pin); explicit
``decoder="pillow"`` / ``decoder="av"`` raise ``NotImplementedError`` with a
clear message when the dependency is absent.

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


def _pillow_module():
    """PIL.Image if Pillow is importable in this runtime, else None."""
    try:
        from PIL import Image  # noqa: PLC0415

        return Image
    except ImportError:
        return None


def _av_module():
    """PyAV if importable in this runtime, else None."""
    try:
        import av  # noqa: PLC0415

        return av
    except ImportError:
        return None


def _pillow_decode_batch(
    pdf: pd.DataFrame, id_col: str, blob_col: str
) -> pd.DataFrame:
    """Real image decode via Pillow — same output contract as the stub:
    (media_id, width, height, channels, pixels) with pixels the
    channel-interleaved [0, 1] floats. Executor-side only (inside
    ``mapInPandas``); never imported when Pillow is absent.

    Modes are canonicalized before flattening so the [0, 1]
    intensity contract actually holds: palette images ('P') are converted
    to RGB/RGBA (raw palette INDICES are not intensities), bilevel ('1')
    to L, and CMYK/YCbCr/etc. to RGB; 16/32-bit integer modes ('I;16',
    'I') scale by 65535 instead of 255. Without this, a palette image
    would ship index/255 garbage downstream.
    """
    import io

    import numpy as np
    from PIL import Image

    out = {"media_id": [], "width": [], "height": [], "channels": [], "pixels": []}
    for media_id, blob in zip(pdf[id_col], pdf[blob_col]):
        img = Image.open(io.BytesIO(bytes(blob)))
        mode = img.mode
        if mode == "1":
            img = img.convert("L")
        elif mode == "P":
            img = img.convert(
                "RGBA" if "transparency" in img.info else "RGB"
            )
        elif mode not in ("L", "LA", "RGB", "RGBA", "I", "I;16"):
            img = img.convert("RGB")
        arr = np.asarray(img)
        scale = 65535.0 if img.mode in ("I", "I;16") else 255.0
        if arr.ndim == 2:
            channels = 1
        else:
            channels = arr.shape[2]
        out["media_id"].append(media_id)
        out["width"].append(img.width)
        out["height"].append(img.height)
        out["channels"].append(channels)
        out["pixels"].append(
            (arr.reshape(-1) / scale).astype(np.float32)
        )
    return pd.DataFrame(out)


def _is_pnm(blob: bytes) -> bool:
    return blob[:2] in (b"P5", b"P6") and blob[2:3].isspace()


def _decode_pnm_bytes(data: bytes) -> tuple[int, int, int, "object"]:
    """Pure-Python binary PGM (P5, grayscale) / PPM (P6, RGB) decode —
    zero codec dependencies, so the Arrow decode path gets a REAL
    uncompressed-format decode even in containers without Pillow.
    Returns ``(width, height, channels, float32 pixels in [0, 1])``.

    Full netpbm binary grammar for the header: tokens separated by
    whitespace, ``#`` comments to end-of-line allowed between tokens,
    exactly ONE whitespace byte between maxval and the raster. Maxval
    up to 255 (one byte per sample) or 65535 (two big-endian bytes per
    sample, per the spec); intensities scale by maxval, matching the
    Pillow path's [0, 1] contract.
    """
    import numpy as np

    magic = data[:2]
    toks: list[int] = []
    i = 2
    while len(toks) < 3:
        while data[i : i + 1].isspace():
            i += 1
        if data[i : i + 1] == b"#":
            while data[i : i + 1] not in (b"\n", b""):
                i += 1
            continue
        j = i
        while data[j : j + 1] and not data[j : j + 1].isspace():
            j += 1
        toks.append(int(data[i:j]))
        i = j
    i += 1  # the single whitespace byte before the raster
    width, height, maxval = toks
    channels = 3 if magic == b"P6" else 1
    n = width * height * channels
    if maxval > 255:
        raster = np.frombuffer(data, dtype=">u2", count=n, offset=i)
    else:
        raster = np.frombuffer(data, dtype=np.uint8, count=n, offset=i)
    return (
        width,
        height,
        channels,
        (raster / float(maxval)).astype(np.float32),
    )


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _is_png(blob: bytes) -> bool:
    return blob[:8] == _PNG_SIG


def _decode_png_bytes(data: bytes) -> tuple[int, int, int, "object"]:
    """Pure-Python PNG decode (the format is fully public: zlib-inflated
    scanlines, one filter byte per row — PNG spec / RFC 2083), closing
    the round-11 "PNG needs Pillow" guard for the most common web image
    format with zero codec dependencies: stdlib ``zlib`` inflate + numpy
    unfiltering. Returns ``(width, height, channels, float32 pixels in
    [0, 1])`` — the same contract as the PNM and Pillow paths.

    Scope (documented, guarded): bit depth 8, color types 0 (gray),
    2 (RGB), 3 (palette -> RGB), 4 (gray+alpha), 6 (RGBA), no Adam7
    interlacing (raises ``NotImplementedError`` — interlaced and 16-bit
    files are rare outputs of modern encoders; JPEG/video stay behind
    the external-codec guards). Filters 0/2 (None/Up) unfilter
    vectorized; 1 (Sub) via per-lane cumulative sums; 3/4 (Average/
    Paeth) per-pixel within the row — bounded work for the small blobs
    this path is contracted for (``mapInPandas`` batches).
    """
    import struct as _struct
    import zlib

    import numpy as np

    if not _is_png(data):
        raise ValueError("not a PNG payload")
    pos = 8
    idat: list[bytes] = []
    plte = None
    w = h = depth = color = interlace = None
    while pos + 8 <= len(data):
        (length,) = _struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        chunk = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            if len(chunk) < 13:
                raise ValueError("PNG: truncated IHDR")
            w, h, depth, color, _comp, _filt, interlace = _struct.unpack(
                ">IIBBBBB", chunk[:13]
            )
        elif ctype == b"PLTE":
            plte = np.frombuffer(chunk, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(chunk)
        elif ctype == b"IEND":
            break
    if w is None:
        raise ValueError("PNG: missing IHDR")
    if interlace != 0:
        raise NotImplementedError("PNG: Adam7 interlacing not supported")
    if depth != 8:
        raise NotImplementedError(f"PNG: bit depth {depth} not supported")
    n_ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color)
    if n_ch is None:
        raise NotImplementedError(f"PNG: color type {color} not supported")
    if color == 3 and plte is None:
        raise ValueError("PNG: palette image without PLTE")
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as exc:  # normalize: corrupt deflate = bad payload
        raise ValueError(f"PNG: corrupt IDAT stream ({exc})") from exc
    stride = w * n_ch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG: decompressed size mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    bpp = n_ch
    for y in range(h):
        base = y * (stride + 1)
        f = raw[base]
        row = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=base + 1
        ).astype(np.int64)
        prev = out[y - 1].astype(np.int64) if y else np.zeros(stride, np.int64)
        if f == 0:
            pass
        elif f == 1:  # Sub: per-lane running sum mod 256
            row = np.cumsum(row.reshape(w, bpp), axis=0).reshape(stride)
        elif f == 2:  # Up
            row = row + prev
        elif f == 3:  # Average
            acc = row.copy()
            for x in range(stride):
                left = acc[x - bpp] if x >= bpp else 0
                acc[x] = (row[x] + ((int(left) + int(prev[x])) >> 1)) & 0xFF
            row = acc
        elif f == 4:  # Paeth
            acc = row.copy()
            for x in range(stride):
                a = int(acc[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                acc[x] = (row[x] + pr) & 0xFF
            row = acc
        else:
            raise ValueError(f"PNG: unknown filter {f} on row {y}")
        out[y] = (row & 0xFF).astype(np.uint8)
    if color == 3:
        out = plte[out.reshape(-1)]  # palette indices -> RGB triples
        n_ch = 3
    return (
        int(w),
        int(h),
        int(n_ch),
        (out.reshape(-1) / 255.0).astype(np.float32),
    )


def _pure_decode_batch(
    pdf: pd.DataFrame, id_col: str, blob_col: str, strict: str | None
) -> pd.DataFrame:
    """Dependency-free real decode over an Arrow batch. ``strict``
    ('pnm' / 'png') raises on any other payload; ``None`` (the
    no-Pillow 'auto' hybrid) real-decodes PNM and PNG blobs and routes
    everything else — including CORRUPT or out-of-scope payloads (a
    truncated PNG, Adam7, 16-bit) — through the deterministic stub: at
    corpus scale one malformed blob must not kill the whole Arrow
    batch; strict mode raises so a targeted decode job fails loudly.
    Same output contract every way."""
    out = {"media_id": [], "width": [], "height": [], "channels": [], "pixels": []}
    fallback_rows = {"idx": []}
    for idx, (media_id, blob) in enumerate(zip(pdf[id_col], pdf[blob_col])):
        data = bytes(blob)
        try:
            if _is_pnm(data) and strict in (None, "pnm"):
                w, h, c, px = _decode_pnm_bytes(data)
            elif _is_png(data) and strict in (None, "png"):
                w, h, c, px = _decode_png_bytes(data)
            elif strict is not None:
                want = "PGM/PPM (P5/P6)" if strict == "pnm" else "PNG"
                raise ValueError(
                    f"decoder={strict!r}: media_id={media_id} is not a "
                    f"binary {want} payload"
                )
            else:
                fallback_rows["idx"].append(idx)
                continue
        except (ValueError, NotImplementedError, IndexError, OSError):
            if strict is not None:
                raise
            fallback_rows["idx"].append(idx)
            continue
        out["media_id"].append(media_id)
        out["width"].append(w)
        out["height"].append(h)
        out["channels"].append(c)
        out["pixels"].append(px)
    result = pd.DataFrame(out)
    if fallback_rows["idx"]:
        stubbed = _fake_decode_batch(
            pdf.iloc[fallback_rows["idx"]], id_col, blob_col
        )
        result = pd.concat([result, stubbed], ignore_index=True)
    return result


def _pnm_decode_batch(
    pdf: pd.DataFrame, id_col: str, blob_col: str, strict: bool
) -> pd.DataFrame:
    """Back-compat shim over :func:`_pure_decode_batch` (PNM-only strict
    mode, or the hybrid fallback when ``strict=False``)."""
    return _pure_decode_batch(
        pdf, id_col, blob_col, "pnm" if strict else None
    )


def _resolve_decoder(decoder: str, kind: str) -> str:
    """``auto`` → the real codec when importable; without it, images
    fall back to ``hybrid`` (pure-Python PNM *and PNG* decode — real,
    dependency-free decodes for both formats; the deterministic stub
    only for payloads needing an external codec, i.e. JPEG/WebP),
    video to the stub. Explicit real-codec names raise when their
    dependency is absent."""
    real, probe = (
        ("pillow", _pillow_module) if kind == "image" else ("av", _av_module)
    )
    if decoder == "auto":
        if probe() is not None:
            return real
        return "hybrid" if kind == "image" else "fake"
    if decoder == real and probe() is None:
        raise NotImplementedError(
            f"decoder={decoder!r}: the codec library is not available in "
            "this runtime; use decoder='fake' (deterministic stub) or "
            "decoder='auto' (PNM+PNG/stub fallback) — the Spark plumbing "
            "(schema/batching/partitioning) is identical."
        )
    extra = ("pnm", "png") if kind == "image" else ()
    if decoder not in (real, "fake", *extra):
        allowed = ", ".join(repr(d) for d in (real, *extra, "fake", "auto"))
        raise NotImplementedError(
            f"decoder={decoder!r}: unknown; use one of {allowed}"
        )
    return decoder


def decode_images(
    df: DataFrame,
    id_col: str = "media_id",
    blob_col: str = "blob",
    decoder: str = "fake",
) -> DataFrame:
    """Binary → decoded pixel arrays via ``mapInPandas`` (Arrow-batched).

    ``decoder="fake"`` is the deterministic stub (the oracle-checked
    default); ``"pillow"`` decodes real images when Pillow is importable
    and raises otherwise; ``"pnm"`` / ``"png"`` are the dependency-free
    real decodes for binary PGM/PPM and (8-bit, non-interlaced) PNG
    payloads (each raises on anything else); ``"auto"`` picks Pillow
    when present and otherwise the hybrid fallback (real PNM + PNG
    decode, the stub only for external-codec formats like JPEG) — same
    output schema every way, so pipelines are portable between stub and
    real runtimes.

    NULL blobs (a failed fetch upstream) are dropped ENGINE-SIDE before
    the Arrow hop: there is nothing to decode, and a None reaching the
    Python worker would kill the whole batch, not one row.
    """
    df = df.filter(F.col(blob_col).isNotNull())
    resolved = _resolve_decoder(decoder, "image")
    if resolved == "pillow":
        decode = _pillow_decode_batch
    elif resolved in ("pnm", "png"):
        decode = lambda pdf, i, b, s=resolved: _pure_decode_batch(pdf, i, b, s)  # noqa: E731
    elif resolved == "hybrid":
        decode = lambda pdf, i, b: _pure_decode_batch(pdf, i, b, None)  # noqa: E731
    else:
        decode = _fake_decode_batch

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield decode(pdf, id_col, blob_col)

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
    """Video frame sampling: emits one frame index per ``every_n`` frames —
    the 1→N explode shape (mapInPandas can yield more rows than it
    consumes). The stub derives a deterministic pseudo frame count from
    the blob length; ``decoder="av"`` (or ``"auto"`` with PyAV importable)
    counts real container frames instead, same output schema. NULL blobs
    drop engine-side (see :func:`decode_images`)."""
    df = df.filter(F.col(blob_col).isNotNull())
    resolved = _resolve_decoder(decoder, "video")

    def n_frames_of(blob: bytes) -> int:
        if resolved == "av":
            import io

            import av

            with av.open(io.BytesIO(blob)) as container:
                return max(
                    1, sum(1 for _ in container.decode(video=0))
                )
        return max(1, len(blob) // 16)

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "frame_index": []}
            for media_id, blob in zip(pdf[id_col], pdf[blob_col]):
                for idx in range(0, n_frames_of(bytes(blob)), every_n):
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
