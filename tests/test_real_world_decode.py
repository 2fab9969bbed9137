"""External-encoder validation: the codecs must decode REAL files made by
real encoders — the reference's OWN test-suite JPEGs
(/root/reference/python/tests/test_files/*.jpg, the images its assertions
run on: test_all_ort.py:22-27), its README assets, and CPython's bundled
test images.  This is the in-sandbox proof that kernels/jpeg|png|gif.py
are spec decoders, not merely self-consistent with their twin encoders.

Pinned sums are deterministic decoder outputs recorded at introduction —
any decode-path change that shifts a single pixel fails here.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

from rapidocr_spark.kernels.gif import decode_gif
from rapidocr_spark.kernels.jpeg import decode_jpeg
from rapidocr_spark.kernels.png import decode_png

REF = "/root/reference"
PY313 = "/root/.pyenv/versions/3.13.0/lib/python3.13"

ref_available = pytest.mark.skipif(
    not os.path.isdir(f"{REF}/python/tests/test_files"),
    reason="reference checkout not present",
)


@ref_available
@pytest.mark.parametrize(
    "name, shape, pixel_sum",
    [
        ("ch_en_num", (430, 323), 27018814),
        ("text_cls", (78, 362), 1938594),
        ("text_det", (430, 323), 27018814),
        ("text_rec", (78, 362), 1938594),
    ],
)
def test_reference_jpeg_fixtures_decode(name, shape, pixel_sum):
    data = open(f"{REF}/python/tests/test_files/{name}.jpg", "rb").read()
    img = decode_jpeg(data)
    assert img.shape == shape
    assert img.dtype == np.uint8
    assert int(img.sum()) == pixel_sum


@ref_available
def test_reference_asset_images_decode():
    png = decode_png(open(f"{REF}/assets/RapidOCR_LOGO.png", "rb").read())
    assert png.shape == (210, 684)
    gif = decode_gif(open(f"{REF}/assets/demo.gif", "rb").read())
    assert gif.shape == (625, 1290)
    jpg = decode_jpeg(open(f"{REF}/assets/huggingfacedemo.jpg", "rb").read())
    assert jpg.shape == (556, 951)


@pytest.mark.skipif(not os.path.isdir(PY313), reason="cpython 3.13 tree absent")
def test_cpython_bundled_images_decode():
    png = decode_png(open(f"{PY313}/test/test_email/data/python.png", "rb").read())
    assert png.shape == (16, 16)
    gif = decode_gif(open(f"{PY313}/test/test_email/data/python.gif", "rb").read())
    assert gif.shape == (16, 16)
    jpg = decode_jpeg(open(f"{PY313}/test/test_email/data/python.jpg", "rb").read())
    assert jpg.shape == (16, 16)
