"""Multimodal binary-column plumbing: schemas, batch shapes, error rows.
The MMB1 operators use the deterministic fake codec (plumbing under
test); decode_media_real runs the ENGINE'S OWN jpeg/png/gif decoders
over genuine containers (round 5)."""

from __future__ import annotations

import pytest

from rapidocr_spark.functions import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (0, mm.encode_media_blob("img", 640, 480, 1, seed=1)),
        (1, mm.encode_media_blob("img", 1280, 720, 1, seed=2)),
        (2, mm.encode_media_blob("vid", 320, 240, 10, seed=3)),
        (3, b"not-a-media-blob"),
        (4, None),
    ]
    return spark.createDataFrame(rows, "media_id long, blob binary").repartition(3)


def test_decode_media(media):
    got = {r["media_id"]: r for r in mm.decode_media(media).collect()}
    assert got[0]["width"] == 640 and got[0]["ok"]
    assert got[2]["format"] == "vid" and got[2]["n_frames"] == 10
    assert not got[3]["ok"] and not got[4]["ok"]  # junk degrades, never crashes


def test_media_features_deterministic(media):
    a = {r["media_id"]: r["features"] for r in mm.media_features(media).collect()}
    b = {r["media_id"]: r["features"] for r in mm.media_features(media).collect()}
    assert a == b
    assert len(a[0]) == mm.FEATURE_DIM
    assert abs(sum(a[0]) - 1.0) < 1e-5  # normalised histogram
    assert a[3] is None and a[4] is None


def test_resize_rewrites_header(media, spark):
    out = mm.resize_images(media, 64, 64)
    decoded = {r["media_id"]: r for r in mm.decode_media(out).collect()}
    assert decoded[0]["width"] == 64 and decoded[0]["height"] == 64
    assert decoded[2]["n_frames"] == 10  # frame count survives resize


def test_sample_frames_explode(media):
    rows = mm.sample_frames(media, every_n=3).collect()
    vid = sorted(r["frame_idx"] for r in rows if r["media_id"] == 2)
    assert vid == [0, 3, 6, 9]
    img = [r["frame_idx"] for r in rows if r["media_id"] == 0]
    assert img == [0]


def test_real_codec_decodes_engine_containers():
    """MEDIA_CODECS['image'] is the REAL decode seam: engine-encoded
    PNG/GIF/JPEG round-trip to the original gray plane (JPEG within the
    encoder's ±2 near-lossless envelope); junk raises LoadImageError."""
    import numpy as np

    from rapidocr_spark.kernels.codec import LoadImageError
    from rapidocr_spark.kernels.gif import encode_gif
    from rapidocr_spark.kernels.jpeg import encode_jpeg
    from rapidocr_spark.kernels.png import encode_png

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(24, 31), dtype=np.uint8)
    decode = mm.MEDIA_CODECS["image"]
    assert np.array_equal(decode(encode_png(img)), img)
    assert np.array_equal(decode(encode_gif(img)), img)
    jp = decode(encode_jpeg(img))
    assert jp.shape == img.shape
    assert int(np.abs(jp.astype(int) - img.astype(int)).max()) <= 2
    with pytest.raises(LoadImageError):
        decode(b"not an image container")


def test_decode_media_real_operator(spark):
    """Distributed real decode ≡ the eager mirror (the mm_decode_real
    gate's contract), junk rows ok=false, one row per blob."""
    import pandas as pd

    from rapidocr_spark.sources.media import (
        N_FIXTURE_REAL_MEDIA, expected_real_media_pandas, real_media_df,
    )

    out = (
        mm.decode_media_real(real_media_df(spark, N_FIXTURE_REAL_MEDIA))
        .toPandas()
        .sort_values("media_id")
        .reset_index(drop=True)
    )
    exp = expected_real_media_pandas(N_FIXTURE_REAL_MEDIA)
    got = out.astype({"width": "Int32", "height": "Int32", "px_sum": "Int64"})
    got["format"] = got["format"].astype(object).where(got["format"].notna(), None)
    pd.testing.assert_frame_equal(got, exp)
    assert (~exp["ok"]).sum() >= 3  # junk rows exercised
    assert set(exp.loc[exp["ok"], "format"]) == {"png", "gif", "jpeg"}
