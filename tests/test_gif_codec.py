"""kernels/gif.py — first-frame GIF decode (the check_and_read_gif branch,
/root/reference/ocrweb_multi/rapidocr/main.py:29-40)."""

from __future__ import annotations

import base64

import numpy as np
import pytest

from rapidocr_spark.kernels import codec
from rapidocr_spark.kernels.gif import GifError, decode_gif, encode_gif


def _rng():
    return np.random.default_rng(11)


def test_roundtrip_shapes():
    rng = _rng()
    for shape in [(1, 1), (5, 7), (63, 129), (300, 4)]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        assert np.array_equal(decode_gif(encode_gif(img)), img), shape


def test_interlaced_frame():
    """Re-order the encoder's scanlines into GIF 4-pass interlace order and
    set the interlace flag: decode must de-interlace back exactly."""
    rng = _rng()
    h, w = 16, 9
    img = rng.integers(0, 256, (h, w), dtype=np.uint8)
    pass_rows = (
        list(range(0, h, 8)) + list(range(4, h, 8))
        + list(range(2, h, 4)) + list(range(1, h, 2))
    )
    # encode the row-permuted image, then flip the interlace bit in the
    # image descriptor (offset: 6 header + 7 LSD + 768 GCT + 9th byte of
    # the 10-byte image descriptor block)
    permuted = img[pass_rows]
    data = bytearray(encode_gif(permuted))
    idesc = 6 + 7 + 768
    assert data[idesc] == 0x2C
    data[idesc + 9] |= 0x40
    assert np.array_equal(decode_gif(bytes(data)), img)


def test_transparency_renders_white():
    """GCE transparent index → white, the white-paper compositing rule."""
    img = np.full((4, 6), 200, dtype=np.uint8)
    img[1, 2] = 7  # palette index 7 will be declared transparent
    data = bytearray(encode_gif(img))
    # splice a Graphic Control Extension before the image descriptor
    gce = bytes([0x21, 0xF9, 4, 0x01, 0, 0, 7, 0])
    idesc = 6 + 7 + 768
    data[idesc:idesc] = gce
    out = decode_gif(bytes(data))
    assert out[1, 2] == 255
    out[1, 2] = 200
    assert (out == 200).all()


def test_partial_frame_composes_on_background():
    """A first frame smaller than the logical screen lands at its offset
    over the background color."""
    inner = np.full((2, 3), 50, dtype=np.uint8)
    data = bytearray(encode_gif(inner))
    # enlarge the logical screen to 8x6, set bg index 240, frame at (2,1)
    data[6:10] = bytes([8, 0, 6, 0])  # screen w=8 h=6
    data[11] = 240                     # background color index
    idesc = 6 + 7 + 768
    data[idesc + 1 : idesc + 5] = bytes([2, 0, 1, 0])  # left=2, top=1
    out = decode_gif(bytes(data))
    assert out.shape == (6, 8)
    assert (out[1:3, 2:5] == 50).all()
    assert out[0, 0] == 240 and out[5, 7] == 240


@pytest.mark.parametrize(
    "mutate, msg",
    [
        (lambda d: b"JUNK" + d[4:], "signature"),
        (lambda d: d[:20], "color table"),
        (lambda d: d[: 6 + 7 + 768] + bytes([0x3B]), "no image"),
        (lambda d: d[:-40], "truncated"),
    ],
)
def test_malformed_raises(mutate, msg):
    good = encode_gif(np.zeros((8, 8), dtype=np.uint8))
    with pytest.raises(GifError, match=msg):
        decode_gif(mutate(good))


def test_payload_routing_and_extraction_parity():
    from rapidocr_spark.kernels.oracle import extract_turn
    from rapidocr_spark.kernels.render import render_lines
    from rapidocr_spark.plans.shell import EXTRACT_CFG

    img = render_lines(["Gif route parity", "two lines 7"])
    b64 = base64.b64encode(encode_gif(img)).decode("ascii")
    assert codec.payload_kind(b64) == "image"
    via_gif = extract_turn(b64, EXTRACT_CFG)
    via_bitmap = extract_turn(codec.encode_bitmap(img), EXTRACT_CFG)
    assert via_gif["extracted_text"] == via_bitmap["extracted_text"]
    assert via_gif["n_boxes"] == via_bitmap["n_boxes"]
    assert via_gif["error"] is None


def test_golden_gif_turn():
    from rapidocr_spark.kernels.oracle import extract_turn
    from rapidocr_spark.plans.shell import EXTRACT_CFG
    from rapidocr_spark.sources.transcripts import GOLDEN_GIF_LINES, payload_for

    res = extract_turn(payload_for(0, 11), EXTRACT_CFG)
    assert res["extracted_text"] == "\n".join(GOLDEN_GIF_LINES)
    assert res["error"] is None
