"""Pure-stdlib/numpy GIF decoder — first frame, the reference's GIF branch.

The reference handles GIF inputs by grabbing the FIRST frame and feeding
it to the same pipeline (`check_and_read_gif`,
/root/reference/ocrweb_multi/rapidocr/main.py:29-40: cv2.VideoCapture →
first frame → RGB).  GIF needs nothing beyond byte plumbing + LZW
(GIF89a spec): logical screen descriptor, global/local color tables,
sub-blocked LZW image data with variable code width, optional Adam-style
4-pass interlacing.  This implements exactly that, so
``IMAGE_CODECS['gif']`` is a real decoder like PNG.

Semantics:
- first image descriptor only (animation frames beyond it are ignored,
  matching the reference's first-frame contract);
- the frame is composed onto the logical screen at its (left, top)
  offset over the background color (cells outside the first frame);
- transparency (GCE transparent-color index) renders as WHITE — the
  compositing default a white-paper OCR pipeline assumes (same rule as
  the PNG alpha funnel, kernels/png.py);
- palette RGB funnels to the kernel chain's grayscale plane with the
  same integer BT.601 weights as PNG.

Malformed data raises GifError → LoadImageError at the codec boundary.
"""

from __future__ import annotations

import numpy as np


class GifError(ValueError):
    """Malformed/unsupported GIF — callers map this onto LoadImageError."""


def _lzw_decode(min_code_size: int, data: bytes, max_pixels: int) -> list[int]:
    """GIF-variant LZW: variable code width, CLEAR/END codes."""
    clear = 1 << min_code_size
    end = clear + 1
    code_size = min_code_size + 1
    # dictionary: code → byte sequence (list of palette indices)
    base = {i: (i,) for i in range(clear)}
    table = dict(base)
    next_code = end + 1
    out: list[int] = []
    prev: tuple[int, ...] | None = None

    bitpos = 0
    nbits = len(data) * 8

    def read_code() -> int | None:
        nonlocal bitpos
        if bitpos + code_size > nbits:
            return None
        byte = bitpos >> 3
        shift = bitpos & 7
        # codes are little-endian bit-packed; 3 bytes always cover ≤12 bits
        window = data[byte] | (
            (data[byte + 1] << 8) if byte + 1 < len(data) else 0
        ) | ((data[byte + 2] << 16) if byte + 2 < len(data) else 0)
        bitpos += code_size
        return (window >> shift) & ((1 << code_size) - 1)

    while True:
        code = read_code()
        if code is None:
            break  # ran out of data before END — tolerate like cv2 does
        if code == clear:
            table = dict(base)
            next_code = end + 1
            code_size = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            entry = table.get(code)
            if entry is None:
                raise GifError("first LZW code not in table")
        else:
            entry = table.get(code)
            if entry is None:
                if code != next_code:
                    raise GifError("LZW code out of sequence")
                entry = prev + (prev[0],)
            if next_code < 4096:
                table[next_code] = prev + (entry[0],)
                next_code += 1
                if next_code == (1 << code_size) and code_size < 12:
                    code_size += 1
        out.extend(entry)
        if len(out) >= max_pixels:
            break
        prev = entry
    return out


def encode_gif(img: np.ndarray) -> bytes:
    """uint8 H×W grayscale → GIF89a bytes (fixture generation + tests).

    Uses a 256-entry grayscale palette (r=g=b=v, so decode is exact) and
    the classic 'uncompressed GIF' LZW form: every pixel a literal code
    at fixed 9-bit width, with a CLEAR emitted before the decoder's table
    would force a width increase — spec-valid output any decoder accepts."""
    if img.ndim != 2 or img.dtype != np.uint8:
        raise ValueError("encode_gif needs a 2-D uint8 image")
    h, w = img.shape
    out = bytearray(b"GIF89a")
    out += bytes([w & 0xFF, w >> 8, h & 0xFF, h >> 8, 0x80 | 0x07, 0, 0])
    pal = np.repeat(np.arange(256, dtype=np.uint8), 3)
    out += pal.tobytes()  # grayscale GCT
    out += bytes([0x2C, 0, 0, 0, 0, w & 0xFF, w >> 8, h & 0xFF, h >> 8, 0])
    min_code = 8
    clear, end = 256, 257
    out += bytes([min_code])
    # bit-pack 9-bit codes little-endian; CLEAR every 254 literals
    acc = 0
    nacc = 0
    packed = bytearray()

    def emit(code: int) -> None:
        nonlocal acc, nacc
        acc |= code << nacc
        nacc += 9
        while nacc >= 8:
            packed.append(acc & 0xFF)
            acc >>= 8
            nacc -= 8

    emit(clear)
    for i, v in enumerate(img.reshape(-1).tolist()):
        if i and i % 254 == 0:
            emit(clear)
        emit(v)
    emit(end)
    if nacc:
        packed.append(acc & 0xFF)
    for beg in range(0, len(packed), 255):
        chunk = packed[beg : beg + 255]
        out += bytes([len(chunk)]) + chunk
    out += bytes([0, 0x3B])
    return bytes(out)


def decode_gif(data: bytes) -> np.ndarray:
    """GIF bytes → uint8 H×W grayscale (first frame, normalised)."""
    if not isinstance(data, (bytes, bytearray, memoryview)):
        raise GifError(f"gif decoder needs bytes, got {type(data).__name__}")
    data = bytes(data)
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise GifError("bad GIF signature")
    if len(data) < 13:
        raise GifError("truncated logical screen descriptor")
    sw = data[6] | (data[7] << 8)
    sh = data[8] | (data[9] << 8)
    packed = data[10]
    bg_idx = data[11]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8)
        if gct.size != 3 * n:
            raise GifError("truncated global color table")
        gct = gct.reshape(n, 3)
        pos += 3 * n
    if not (0 < sw <= 0xFFFF and 0 < sh <= 0xFFFF):
        raise GifError("unreasonable dimensions")

    transparent: int | None = None
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer before any image
            raise GifError("no image data")
        if block == 0x21:  # extension
            if pos >= len(data):
                raise GifError("truncated extension")
            label = data[pos]
            pos += 1
            sub_start = pos
            # walk sub-blocks
            parts = []
            while True:
                if pos >= len(data):
                    raise GifError("truncated extension sub-blocks")
                sz = data[pos]
                pos += 1
                if sz == 0:
                    break
                parts.append(data[pos : pos + sz])
                pos += sz
            if label == 0xF9 and parts:  # graphic control extension
                gce = parts[0]
                if len(gce) >= 4 and (gce[0] & 0x01):
                    transparent = gce[3]
            _ = sub_start
            continue
        if block != 0x2C:
            raise GifError(f"unexpected block 0x{block:02x}")
        # ---- image descriptor (first frame) ----
        if pos + 9 > len(data):
            raise GifError("truncated image descriptor")
        left = data[pos] | (data[pos + 1] << 8)
        top = data[pos + 2] | (data[pos + 3] << 8)
        iw = data[pos + 4] | (data[pos + 5] << 8)
        ih = data[pos + 6] | (data[pos + 7] << 8)
        ipacked = data[pos + 8]
        pos += 9
        interlaced = bool(ipacked & 0x40)
        ct = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            lct = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8)
            if lct.size != 3 * n:
                raise GifError("truncated local color table")
            ct = lct.reshape(n, 3)
            pos += 3 * n
        if ct is None:
            raise GifError("no color table for image")
        if iw == 0 or ih == 0 or left + iw > sw or top + ih > sh:
            raise GifError("frame exceeds logical screen")
        if pos >= len(data):
            raise GifError("missing LZW minimum code size")
        min_code = data[pos]
        pos += 1
        if not (2 <= min_code <= 11):
            raise GifError(f"bad LZW minimum code size {min_code}")
        lzw_parts = []
        while True:
            if pos >= len(data):
                raise GifError("truncated image sub-blocks")
            sz = data[pos]
            pos += 1
            if sz == 0:
                break
            lzw_parts.append(data[pos : pos + sz])
            pos += sz
        idx_list = _lzw_decode(min_code, b"".join(lzw_parts), iw * ih)
        if len(idx_list) < iw * ih:
            raise GifError("LZW data shorter than frame")
        idx = np.array(idx_list[: iw * ih], dtype=np.int32).reshape(ih, iw)
        if interlaced:
            deinter = np.empty_like(idx)
            rows = (
                list(range(0, ih, 8))
                + list(range(4, ih, 8))
                + list(range(2, ih, 4))
                + list(range(1, ih, 2))
            )
            deinter[rows] = idx
            idx = deinter
        if int(idx.max(initial=0)) >= ct.shape[0]:
            raise GifError("palette index out of range")
        rgb = ct[idx].astype(np.int64)  # (ih, iw, 3)
        gray = ((299 * rgb[..., 0] + 587 * rgb[..., 1] + 114 * rgb[..., 2] + 500) // 1000).astype(np.uint8)
        if transparent is not None:
            gray = np.where(idx == transparent, np.uint8(255), gray)
        # compose onto the logical screen over the background color
        if (left, top, iw, ih) == (0, 0, sw, sh):
            return gray
        if gct is not None and bg_idx < gct.shape[0]:
            b = gct[bg_idx].astype(np.int64)
            bg = np.uint8((299 * b[0] + 587 * b[1] + 114 * b[2] + 500) // 1000)
        else:
            bg = np.uint8(255)
        canvas = np.full((sh, sw), bg, dtype=np.uint8)
        canvas[top : top + ih, left : left + iw] = gray
        return canvas
    raise GifError("no image data")
