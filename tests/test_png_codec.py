"""kernels/png.py — spec-level PNG decode tests (S1/S2 real-format path).

The reference's LoadImage contract under test: real container bytes in,
canonical plane out, LoadImageError on junk
(/root/reference/python/rapidocr_onnxruntime/utils.py:94-155)."""

from __future__ import annotations

import base64
import struct
import zlib

import numpy as np
import pytest

from rapidocr_spark.kernels import codec
from rapidocr_spark.kernels.png import (
    PNG_MAGIC, PngError, _chunk, decode_png, encode_png,
)


def _rng():
    return np.random.default_rng(7)


# ------------------------------------------------------------- round trips


def test_gray_roundtrip():
    img = _rng().integers(0, 256, (37, 53), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(img)), img)


def test_rgb_equal_channels_exact():
    g = _rng().integers(0, 256, (20, 31), dtype=np.uint8)
    rgb = np.repeat(g[:, :, np.newaxis], 3, axis=2)
    assert np.array_equal(decode_png(encode_png(rgb)), g)


def test_rgba_opaque_exact_and_transparent_white():
    g = _rng().integers(0, 256, (9, 11), dtype=np.uint8)
    rgb = np.repeat(g[:, :, np.newaxis], 3, axis=2)
    a255 = np.concatenate([rgb, np.full((9, 11, 1), 255, np.uint8)], axis=2)
    assert np.array_equal(decode_png(encode_png(a255)), g)
    # the reference's cvt_four_to_three rule: a == 0 → forced white
    a0 = a255.copy()
    a0[..., 3] = 0
    assert (decode_png(encode_png(a0)) == 255).all()


def test_rgb_bt601_integer_weights():
    c = _rng().integers(0, 256, (5, 7, 3), dtype=np.uint8)
    r, g, b = (c[..., i].astype(int) for i in range(3))
    exp = ((299 * r + 587 * g + 114 * b + 500) // 1000).astype(np.uint8)
    assert np.array_equal(decode_png(encode_png(c)), exp)


# ------------------------------------------------- hand-built spec shapes


def _build_png(ihdr_fields, chunks):
    out = PNG_MAGIC + _chunk(b"IHDR", struct.pack(">IIBBBBB", *ihdr_fields))
    for ctype, body in chunks:
        out += _chunk(ctype, body)
    return out + _chunk(b"IEND", b"")


def test_all_five_filter_types_decode_exactly():
    """One scanline per predictor (RFC 2083 §6), filtered by an
    independent eager reference implementation, decoded back bit-exactly."""
    rng = _rng()
    img = rng.integers(0, 256, (5, 8), dtype=np.uint8)
    rows, prior = [], np.zeros(8, dtype=int)
    for y, f in enumerate([0, 1, 2, 3, 4]):
        cur = img[y].astype(int)
        if f == 0:
            flt = cur
        elif f == 1:
            flt = cur.copy()
            flt[1:] = (cur[1:] - cur[:-1]) % 256
        elif f == 2:
            flt = (cur - prior) % 256
        elif f == 3:
            flt = np.empty(8, dtype=int)
            for x in range(8):
                left = cur[x - 1] if x else 0
                flt[x] = (cur[x] - ((left + prior[x]) // 2)) % 256
        else:
            flt = np.empty(8, dtype=int)
            for x in range(8):
                a = cur[x - 1] if x else 0
                b, c = prior[x], (prior[x - 1] if x else 0)
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                flt[x] = (cur[x] - pred) % 256
        rows.append(bytes([f]) + bytes(flt.astype(np.uint8)))
        prior = cur
    data = _build_png(
        (8, 5, 8, 0, 0, 0, 0), [(b"IDAT", zlib.compress(b"".join(rows)))]
    )
    assert np.array_equal(decode_png(data), img)


def test_palette_image():
    rng = _rng()
    pal = bytes(rng.integers(0, 256, 48, dtype=np.uint8))
    idx = rng.integers(0, 16, (4, 6), dtype=np.uint8)
    rows = b"".join(b"\x00" + bytes(idx[y]) for y in range(4))
    data = _build_png(
        (6, 4, 8, 3, 0, 0, 0),
        [(b"PLTE", pal), (b"IDAT", zlib.compress(rows))],
    )
    p = np.frombuffer(pal, dtype=np.uint8).reshape(-1, 3)[idx].astype(int)
    exp = ((299 * p[..., 0] + 587 * p[..., 1] + 114 * p[..., 2] + 500) // 1000)
    assert np.array_equal(decode_png(data), exp.astype(np.uint8))


def test_idat_split_across_chunks():
    img = _rng().integers(0, 256, (6, 6), dtype=np.uint8)
    full = encode_png(img)
    # re-split the single IDAT into two
    comp = zlib.compress(
        np.concatenate(
            [np.zeros((6, 1), np.uint8), img], axis=1
        ).tobytes()
    )
    mid = len(comp) // 2
    data = _build_png(
        (6, 6, 8, 0, 0, 0, 0),
        [(b"IDAT", comp[:mid]), (b"IDAT", comp[mid:])],
    )
    assert np.array_equal(decode_png(data), decode_png(full))


# ------------------------------------------------------------------ errors


@pytest.mark.parametrize(
    "mutate, msg",
    [
        (lambda d: b"junk" + d[4:], "signature"),
        (lambda d: d[:-8], "IEND"),
        # flip a bit inside the IHDR body (byte 19 = width low byte)
        # without re-stamping the chunk CRC
        (lambda d: d[:19] + bytes([d[19] ^ 1]) + d[20:], "CRC"),
    ],
)
def test_malformed_raises(mutate, msg):
    good = encode_png(np.zeros((4, 4), dtype=np.uint8))
    with pytest.raises(PngError, match=msg):
        decode_png(mutate(good))


def test_unsupported_shapes_raise():
    with pytest.raises(PngError, match="interlace"):
        decode_png(_build_png((2, 2, 8, 0, 0, 0, 1), [(b"IDAT", zlib.compress(b"\x00\x00\x00" * 2))]))
    with pytest.raises(PngError, match="bit depth"):
        decode_png(_build_png((2, 2, 16, 0, 0, 0, 0), [(b"IDAT", zlib.compress(b"\x00" * 10))]))
    with pytest.raises(PngError, match="dimensions"):
        decode_png(_build_png((3, 3, 8, 0, 0, 0, 0), [(b"IDAT", zlib.compress(b"\x00\x01"))]))
    with pytest.raises(PngError, match="palette"):
        decode_png(_build_png((2, 1, 8, 3, 0, 0, 0), [(b"IDAT", zlib.compress(b"\x00\x00\x00"))]))


# ------------------------------------------- routing + extraction parity


def test_payload_routing_and_ingest():
    img = _rng().integers(0, 256, (8, 8), dtype=np.uint8)
    b64 = base64.b64encode(encode_png(img)).decode("ascii")
    assert codec.payload_kind(b64) == "image"
    assert np.array_equal(codec.decode_image_payload(b64), img)
    with pytest.raises(codec.LoadImageError):
        codec.decode_image_payload("iVBOR%%%notb64")


def test_png_route_extracts_identically_to_bitmap_route():
    """A PNG-carried render must extract exactly like its bitmap: twin —
    the per-turn text-equality invariant through the real-format path."""
    from rapidocr_spark.kernels.oracle import extract_turn
    from rapidocr_spark.kernels.render import render_lines
    from rapidocr_spark.plans.shell import EXTRACT_CFG

    img = render_lines(["Png route parity", "line two 42"])
    via_bitmap = extract_turn(codec.encode_bitmap(img), EXTRACT_CFG)
    for px in (
        img,
        np.repeat(img[:, :, np.newaxis], 3, axis=2),
        np.concatenate(
            [
                np.repeat(img[:, :, np.newaxis], 3, axis=2),
                np.full((*img.shape, 1), 255, np.uint8),
            ],
            axis=2,
        ),
    ):
        b64 = base64.b64encode(encode_png(px)).decode("ascii")
        via_png = extract_turn(b64, EXTRACT_CFG)
        assert via_png["extracted_text"] == via_bitmap["extracted_text"]
        assert via_png["n_boxes"] == via_bitmap["n_boxes"]
        assert via_png["error"] is None


def test_golden_png_turn():
    from rapidocr_spark.kernels.oracle import extract_turn
    from rapidocr_spark.plans.shell import EXTRACT_CFG
    from rapidocr_spark.sources.transcripts import GOLDEN_PNG_LINES, payload_for

    res = extract_turn(payload_for(0, 10), EXTRACT_CFG)
    assert res["extracted_text"] == "\n".join(GOLDEN_PNG_LINES)
    assert res["error"] is None
