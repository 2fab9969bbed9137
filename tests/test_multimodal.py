"""Multimodal binary-column plumbing: schemas, batch shapes, error rows.
The codec is the deterministic fake (real decoders aren't in this
container); the Spark-side plumbing is what's under test."""

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


def test_real_codec_is_explicit_stub():
    with pytest.raises(NotImplementedError):
        mm.MEDIA_CODECS["image"](b"anything")
