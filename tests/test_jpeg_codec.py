"""kernels/jpeg.py — baseline JPEG decode (the reference's own fixture
format: python/tests/test_files/*.jpg via LoadImage, utils.py:111-125)."""

from __future__ import annotations

import base64

import numpy as np
import pytest

from rapidocr_spark.kernels import codec
from rapidocr_spark.kernels.jpeg import (
    _C, JpegError, decode_jpeg, encode_jpeg,
)


def _rng():
    return np.random.default_rng(13)


def _err(img, data):
    return np.abs(decode_jpeg(data).astype(int) - img.astype(int)).max()


def test_idct_matches_direct_formula():
    """The batched matrix IDCT must equal the O(64²) textbook formula."""
    rng = _rng()
    coef = rng.normal(0, 50, (8, 8))
    direct = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = np.sqrt(1 / 8) if u == 0 else np.sqrt(2 / 8)
                    cv = np.sqrt(1 / 8) if v == 0 else np.sqrt(2 / 8)
                    s += (
                        cu * cv * coef[u, v]
                        * np.cos((2 * x + 1) * u * np.pi / 16)
                        * np.cos((2 * y + 1) * v * np.pi / 16)
                    )
            direct[x, y] = s
    via_matrix = _C @ coef @ _C.T
    assert np.allclose(via_matrix, direct, atol=1e-9)


def test_gray_roundtrip_near_lossless():
    rng = _rng()
    for shape in [(8, 8), (5, 7), (48, 100), (33, 65)]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        assert _err(img, encode_jpeg(img, sampling=((1, 1),))) <= 2, shape


def test_three_component_444_and_420():
    img = _rng().integers(0, 256, (40, 56), dtype=np.uint8)
    assert _err(img, encode_jpeg(img)) <= 2
    assert _err(img, encode_jpeg(img, sampling=((2, 2), (1, 1), (1, 1)))) <= 2
    assert _err(img, encode_jpeg(img, sampling=((2, 1), (1, 1), (1, 1)))) <= 2


def test_restart_intervals():
    img = _rng().integers(0, 256, (40, 72), dtype=np.uint8)
    for ri in (1, 3, 7):
        assert _err(img, encode_jpeg(img, sampling=((1, 1),), restart_interval=ri)) <= 2
    assert (
        _err(img, encode_jpeg(img, sampling=((2, 2), (1, 1), (1, 1)), restart_interval=2))
        <= 2
    )


def test_rendered_text_binarisation_unaffected():
    """±1 reconstruction error must never flip the >127 binarisation the
    det/rec kernels use — extraction through JPEG equals the bitmap route."""
    from rapidocr_spark.kernels.oracle import extract_turn
    from rapidocr_spark.kernels.render import render_lines
    from rapidocr_spark.plans.shell import EXTRACT_CFG

    img = render_lines(["Jpeg route parity", "digits 0123456789"])
    via_bitmap = extract_turn(codec.encode_bitmap(img), EXTRACT_CFG)
    for sampling, ri in [(((1, 1),), 0), (((2, 2), (1, 1), (1, 1)), 4)]:
        b64 = base64.b64encode(encode_jpeg(img, sampling=sampling, restart_interval=ri)).decode()
        assert codec.payload_kind(b64) == "image"
        via_jpeg = extract_turn(b64, EXTRACT_CFG)
        assert via_jpeg["extracted_text"] == via_bitmap["extracted_text"]
        assert via_jpeg["error"] is None


@pytest.mark.parametrize(
    "mutate, msg",
    [
        (lambda d: b"nope" + d[4:], "signature"),
        (lambda d: d[:40], "truncated|no SOS"),
    ],
)
def test_malformed_raises(mutate, msg):
    good = encode_jpeg(np.zeros((32, 32), dtype=np.uint8), sampling=((1, 1),))
    with pytest.raises(JpegError, match=msg):
        decode_jpeg(mutate(good))


def test_truncated_entropy_raises():
    """Cutting the entropy tail must error (1-fill padding eventually hits
    an unassigned Huffman code or overruns a block), never crash or hang."""
    img = _rng().integers(0, 256, (64, 64), dtype=np.uint8)
    good = encode_jpeg(img, sampling=((1, 1),))
    bad = good[: len(good) // 2] + b"\xff\xd9"
    with pytest.raises(JpegError):
        decode_jpeg(bad)


def test_progressive_equals_baseline_decode():
    """SOF2 progressive (libjpeg-style scan script: DC Al=1, spectral AC
    bands at Al=2, two SA refinements, DC refine) must reconstruct the
    EXACT same pixels as the baseline coding of the same coefficients —
    the strongest cross-check two codings of one image allow."""
    from rapidocr_spark.kernels.jpeg import encode_jpeg_progressive

    rng = _rng()
    for shape in [(8, 8), (33, 65), (17, 120)]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        for sampling in [((1, 1),), ((2, 2), (1, 1), (1, 1))]:
            base = decode_jpeg(encode_jpeg(img, sampling=sampling))
            prog = decode_jpeg(encode_jpeg_progressive(img, sampling=sampling))
            assert np.array_equal(prog, base), (shape, sampling)


def test_progressive_adversarial_coefficient_layouts():
    """Sparse-spike and gradient images drive long EOB runs, ZRL-spanning
    zero runs, and history/newly-significant interleavings through the
    SA refinement paths."""
    from rapidocr_spark.kernels.jpeg import encode_jpeg_progressive

    rng = _rng()
    for trial in range(12):
        h, w = int(rng.integers(9, 60)), int(rng.integers(9, 60))
        img = np.full((h, w), 128, np.uint8)
        for _ in range(int(rng.integers(0, 6))):
            img[int(rng.integers(0, h)), int(rng.integers(0, w))] = int(rng.integers(0, 256))
        base = decode_jpeg(encode_jpeg(img, sampling=((1, 1),)))
        prog = decode_jpeg(encode_jpeg_progressive(img, sampling=((1, 1),)))
        assert np.array_equal(prog, base)


def test_mislabelled_sequential_scan_in_progressive_frame_rejected():
    good = bytearray(encode_jpeg(np.zeros((8, 8), dtype=np.uint8), sampling=((1, 1),)))
    i = bytes(good).find(b"\xff\xc0")
    assert i > 0
    good[i + 1] = 0xC2  # claim progressive, keep the full-band scan
    with pytest.raises(JpegError, match="Se=0"):
        decode_jpeg(bytes(good))


def test_golden_jpeg_turn():
    from rapidocr_spark.kernels.oracle import extract_turn
    from rapidocr_spark.plans.shell import EXTRACT_CFG
    from rapidocr_spark.sources.transcripts import GOLDEN_JPEG_LINES, payload_for

    res = extract_turn(payload_for(0, 12), EXTRACT_CFG)
    assert res["extracted_text"] == "\n".join(GOLDEN_JPEG_LINES)
    assert res["error"] is None


def test_unsupported_sof_variants_raise_cleanly():
    """Lossless (SOF3) and arithmetic-coded (SOF9) streams are explicitly
    unsupported — a clear JpegError, not a misdecode or crash."""
    import numpy as np

    from rapidocr_spark.kernels.jpeg import JpegError, decode_jpeg, encode_jpeg

    blob = bytearray(encode_jpeg(np.zeros((8, 8), np.uint8)))
    i = blob.find(b"\xff\xc0")
    assert i > 0
    for marker in (0xC3, 0xC9, 0xCB):  # lossless / arithmetic / arith-lossless
        b2 = bytearray(blob)
        b2[i + 1] = marker
        with pytest.raises(JpegError, match="unsupported"):
            decode_jpeg(bytes(b2))
