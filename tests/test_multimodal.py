"""Multimodal plumbing tests: binary columns through metadata probes and the
Arrow decode stage (deterministic fake codec)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from security_data_pipeline_spark.operators import multimodal

PNG_MAGIC = bytes.fromhex("89504e470d0a1a0a")
JPG_MAGIC = bytes.fromhex("ffd8ffe000104a46")


@pytest.fixture()
def media(spark):
    rows = [
        Row(media_id=1, blob=PNG_MAGIC + b"fakepngdata"),
        Row(media_id=2, blob=JPG_MAGIC + b"fakejpgdata"),
        Row(media_id=3, blob=b"not-an-image-at-all-just-bytes"),
    ]
    return spark.createDataFrame(rows, schema="media_id long, blob binary")


def test_metadata_probe_is_jvm_side(media):
    out = multimodal.attach_blob_metadata(media).orderBy("media_id").collect()
    assert [r.media_type for r in out] == [
        "image/png", "image/jpeg", "application/octet-stream",
    ]
    assert out[0].blob_bytes == len(PNG_MAGIC) + 11
    assert all(len(r.blob_md5) == 32 for r in out)


def test_fake_decode_schema_and_determinism(media):
    decoded = multimodal.decode_images(media)
    assert decoded.schema == multimodal.DECODED_IMAGE_SCHEMA
    rows = {r.media_id: r for r in decoded.collect()}
    assert set(rows) == {1, 2, 3}
    r = rows[1]
    assert (r.width, r.height, r.channels) == (8, 8, 1)
    assert len(r.pixels) == 64
    assert all(0.0 <= p <= 1.0 for p in r.pixels)
    # deterministic: second run bit-identical
    again = {r.media_id: r.pixels for r in multimodal.decode_images(media).collect()}
    assert again[1] == r.pixels


def test_real_decoder_raises_clearly(media):
    # this container ships no codec libraries by design — the explicit
    # real-codec name must fail loudly, not fall back silently
    if multimodal._pillow_module() is None:
        with pytest.raises(NotImplementedError, match="decoder='fake'"):
            multimodal.decode_images(media, decoder="pillow")
    if multimodal._av_module() is None:
        with pytest.raises(NotImplementedError, match="'fake'"):
            multimodal.sample_frames(media, decoder="av")
    with pytest.raises(NotImplementedError, match="unknown"):
        multimodal.decode_images(media, decoder="bogus")


def test_auto_decoder_dispatch(media, monkeypatch):
    # in this container (no Pillow/PyAV) auto must resolve to the stub and
    # produce the stub's deterministic output
    assert multimodal._pillow_module() is None, "container grew Pillow; update test"
    assert multimodal._resolve_decoder("auto", "image") == "fake"
    assert multimodal._resolve_decoder("auto", "video") == "fake"
    auto = {r.media_id: r.pixels for r in
            multimodal.decode_images(media, decoder="auto").collect()}
    fake = {r.media_id: r.pixels for r in
            multimodal.decode_images(media, decoder="fake").collect()}
    assert auto == fake
    # when the probe reports the library, auto dispatches to the real codec
    monkeypatch.setattr(multimodal, "_pillow_module", lambda: object())
    assert multimodal._resolve_decoder("auto", "image") == "pillow"
    monkeypatch.setattr(multimodal, "_av_module", lambda: object())
    assert multimodal._resolve_decoder("auto", "video") == "av"


def test_feature_extract_back_to_jvm(media):
    feats = multimodal.image_mean_brightness(multimodal.decode_images(media))
    out = {r.media_id: r.mean_brightness for r in feats.collect()}
    assert all(0.0 <= v <= 1.0 for v in out.values())


def test_frame_sampling_one_to_many(media):
    frames = multimodal.sample_frames(media, every_n=1)
    counts = (
        frames.groupBy("media_id").count().orderBy("media_id").collect()
    )
    # n_frames = len(blob)//16 (min 1): blobs are 19/19/30 bytes → 1,1,1
    assert [r["count"] for r in counts] == [1, 1, 1]
    assert frames.columns == ["media_id", "frame_index"]


def test_resize_images_box_average(spark):
    import numpy as np

    from security_data_pipeline_spark.operators import multimodal

    docs = spark.createDataFrame(
        [(1, bytearray(b"hello world")), (2, bytearray(b"other bytes"))],
        ["media_id", "blob"],
    )
    decoded = multimodal.decode_images(docs)
    resized = multimodal.resize_images(decoded, 4, 4).collect()
    src = {r["media_id"]: r["pixels"] for r in decoded.collect()}
    assert len(resized) == 2
    for r in resized:
        assert r["width"] == 4 and r["height"] == 4
        assert len(r["pixels"]) == 16
        a = np.array(src[r["media_id"]], dtype=np.float64).reshape(8, 8)
        expect = a.reshape(4, 2, 4, 2).mean(axis=(1, 3)).astype(np.float32)
        got = np.array(r["pixels"], dtype=np.float32).reshape(4, 4)
        np.testing.assert_allclose(got, expect, rtol=1e-6)


def test_pillow_decode_real_png_through_auto(spark):
    """Tests-extra leg: wherever Pillow IS installable, decoder='auto' must
    decode a real PNG with the same output schema as the stub path, with
    palette and 16-bit modes canonicalized to the [0,1] intensity contract.
    Skip-marked in codec-free containers (this repo's default runtime)."""
    import io

    pytest.importorskip("PIL")
    import numpy as np
    from PIL import Image

    def png_bytes(img):
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        return buf.getvalue()

    rgb = Image.fromarray(
        (np.arange(2 * 3 * 3) % 256).reshape(2, 3, 3).astype("uint8"), "RGB"
    )
    pal = rgb.convert("P", palette=Image.ADAPTIVE)
    i16 = Image.fromarray(
        (np.arange(6).reshape(2, 3) * 1000).astype("int32"), "I"
    )
    df = spark.createDataFrame(
        [(1, bytearray(png_bytes(rgb))),
         (2, bytearray(png_bytes(pal))),
         (3, bytearray(png_bytes(i16)))],
        "media_id long, blob binary",
    )
    assert multimodal._resolve_decoder("auto", "image") == "pillow"
    out = {r.media_id: r for r in
           multimodal.decode_images(df, decoder="auto").collect()}
    stub = multimodal.decode_images(df, decoder="fake")
    assert stub.schema == multimodal.decode_images(df, decoder="auto").schema
    # RGB round-trips exactly
    r1 = out[1]
    assert (r1.width, r1.height, r1.channels) == (3, 2, 3)
    assert r1.pixels == pytest.approx(
        [v / 255.0 for v in (np.arange(2 * 3 * 3) % 256)], abs=1e-6
    )
    # palette canonicalized to RGB intensities, never raw indices/255
    r2 = out[2]
    assert r2.channels == 3
    assert r2.pixels == pytest.approx(r1.pixels, abs=2 / 255)
    # 32-bit integer mode scales by 65535, stays in [0, 1]
    r3 = out[3]
    assert r3.channels == 1
    assert max(r3.pixels) <= 1.0
    assert r3.pixels == pytest.approx(
        [v * 1000 / 65535.0 for v in range(6)], abs=1e-6
    )


def test_decode_drops_null_blobs_engine_side(spark):
    """A NULL blob (failed fetch upstream) must drop before the Arrow
    hop: a None reaching the Python decode worker kills the whole batch,
    not one row. Zero-byte blobs still decode (the stub hashes them)."""
    from security_data_pipeline_spark.operators import multimodal

    blobs = spark.createDataFrame(
        [(1, bytearray(b"")), (2, None), (3, bytearray(b"\x89PNGxxxx"))],
        "media_id long, blob binary",
    )
    decoded = multimodal.decode_images(blobs)
    assert sorted(r["media_id"] for r in decoded.collect()) == [1, 3]
    assert multimodal.image_mean_brightness(decoded).count() == 2
    frames = multimodal.sample_frames(blobs, every_n=2)
    assert sorted(set(r["media_id"] for r in frames.collect())) == [1, 3]
