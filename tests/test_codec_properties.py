"""Property-based round-trip tests for the real-format codecs
(kernels/png.py, gif.py, jpeg.py): random shapes × random pixels, the
decode(encode(x)) contract — PNG/GIF exact, JPEG within the documented
±2 bound that keeps >127 binarisation invariant."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from rapidocr_spark.kernels.gif import decode_gif, encode_gif
from rapidocr_spark.kernels.jpeg import decode_jpeg, encode_jpeg
from rapidocr_spark.kernels.png import decode_png, encode_png


@st.composite
def _images(draw, max_side=40):
    h = draw(st.integers(1, max_side))
    w = draw(st.integers(1, max_side))
    seed = draw(st.integers(0, 2**31 - 1))
    return np.random.default_rng(seed).integers(0, 256, (h, w), dtype=np.uint8)


@settings(max_examples=40, deadline=None)
@given(_images())
def test_png_roundtrip_exact(img):
    assert np.array_equal(decode_png(encode_png(img)), img)


@settings(max_examples=40, deadline=None)
@given(_images())
def test_gif_roundtrip_exact(img):
    assert np.array_equal(decode_gif(encode_gif(img)), img)


@settings(max_examples=25, deadline=None)
@given(_images(max_side=32), st.sampled_from([((1, 1),), ((1, 1), (1, 1), (1, 1)), ((2, 2), (1, 1), (1, 1))]))
def test_jpeg_roundtrip_bounded(img, sampling):
    got = decode_jpeg(encode_jpeg(img, sampling=sampling))
    assert got.shape == img.shape
    assert np.abs(got.astype(int) - img.astype(int)).max() <= 2
    # the extraction-critical invariant: binarisation never flips for
    # saturated ink/background pixels
    sat = (img == 0) | (img == 255)
    assert np.array_equal((got > 127)[sat], (img > 127)[sat])


@settings(max_examples=30, deadline=None)
@given(_images(max_side=24))
def test_png_color_promotions_funnel_to_same_gray(img):
    rgb = np.repeat(img[:, :, np.newaxis], 3, axis=2)
    rgba = np.concatenate(
        [rgb, np.full((*img.shape, 1), 255, dtype=np.uint8)], axis=2
    )
    assert np.array_equal(decode_png(encode_png(rgb)), img)
    assert np.array_equal(decode_png(encode_png(rgba)), img)


# ---- round-5: adversarial/truncation robustness ---------------------------
# A 100 TB ingest sees corrupt bytes constantly; every decoder must turn
# arbitrary garbage AND truncations of valid streams into its typed error
# (or, for truncation, possibly a partial-but-valid decode) — never a
# hang, crash, or foreign exception.


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=0, max_size=300))
def test_decoders_never_crash_on_garbage(data):
    from rapidocr_spark.kernels.gif import GifError, decode_gif
    from rapidocr_spark.kernels.jpeg import JpegError, decode_jpeg
    from rapidocr_spark.kernels.png import PngError, decode_png

    for decode, err in ((decode_jpeg, JpegError), (decode_png, PngError), (decode_gif, GifError)):
        try:
            decode(data)
        except err:
            pass  # the typed contract


@settings(max_examples=25, deadline=None)
@given(st.integers(min_value=0, max_value=10_000), st.integers(min_value=0, max_value=2**31 - 1))
def test_decoders_handle_truncated_valid_streams(cut, seed):
    """Truncating a VALID stream at any byte must yield the typed error or
    a clean decode (headers may complete early) — never a foreign crash."""
    import numpy as np

    from rapidocr_spark.kernels.gif import GifError, decode_gif, encode_gif
    from rapidocr_spark.kernels.jpeg import JpegError, decode_jpeg, encode_jpeg
    from rapidocr_spark.kernels.png import PngError, decode_png, encode_png

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(17, 23), dtype=np.uint8)
    for encode, decode, err in (
        (encode_jpeg, decode_jpeg, JpegError),
        (encode_png, decode_png, PngError),
        (encode_gif, decode_gif, GifError),
    ):
        blob = encode(img)
        try:
            decode(blob[: min(cut, len(blob) - 1)])
        except err:
            pass


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=0, max_size=200))
def test_onnx_wire_parser_never_hangs_on_garbage(data):
    """parse_fields/parse_model on arbitrary bytes: parse, or raise a
    clean ValueError/IndexError/KeyError — never hang or segfault."""
    from rapidocr_spark.kernels.onnx_mini import parse_fields, parse_model

    for fn in (parse_fields, parse_model):
        try:
            fn(data)
        except (ValueError, IndexError, KeyError):
            pass
