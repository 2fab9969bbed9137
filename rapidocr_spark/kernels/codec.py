"""Payload codec — the engine's LoadImage analog.

The reference accepts Union[str, Path, bytes, ndarray] and normalises to a
BGR uint8 ndarray, raising LoadImageError on junk
(/root/reference/python/rapidocr_onnxruntime/utils.py:94-155;
test_all_ort.py:30-35).  Our transcript turns carry the payload inside the
``text`` column, tagged with a routing prefix so the cheap gate predicate
(SURVEY.md §2.2 F1) can run Catalyst-side without decoding:

    bitmap:{H}x{W}:{base64(SGB1 header + H*W uint8 grayscale)}
    html:{markup}
    plain:{text}

Anything else is a decode error (error column, never a job crash).
"""

from __future__ import annotations

import base64
import struct

import numpy as np

MAGIC = b"SGB1"
BITMAP_PREFIX = "bitmap:"
HTML_PREFIX = "html:"
PLAIN_PREFIX = "plain:"
PDF_PREFIX = "pdf:"


class LoadImageError(ValueError):
    """Mirror of the reference's LoadImageError (utils.py:152-155)."""


def encode_bitmap(img: np.ndarray) -> str:
    """uint8 H×W grayscale → ``bitmap:HxW:<base64>`` payload string."""
    if img.ndim != 2 or img.dtype != np.uint8:
        raise ValueError("bitmap payload must be 2-D uint8")
    h, w = img.shape
    raw = MAGIC + struct.pack(">HH", h, w) + img.tobytes()
    return f"{BITMAP_PREFIX}{h}x{w}:{base64.b64encode(raw).decode('ascii')}"


def decode_bitmap(payload: str) -> np.ndarray:
    """``bitmap:HxW:<base64>`` → uint8 H×W ndarray; LoadImageError on junk."""
    if not payload.startswith(BITMAP_PREFIX):
        raise LoadImageError("not a bitmap payload")
    try:
        _, dims, b64 = payload.split(":", 2)
        raw = base64.b64decode(b64, validate=True)
    except Exception as exc:  # noqa: BLE001 — any malformation is a load error
        raise LoadImageError(f"undecodable bitmap payload: {exc}") from exc
    if len(raw) < 8 or raw[:4] != MAGIC:
        raise LoadImageError("bad magic")
    h, w = struct.unpack(">HH", raw[4:8])
    if f"{h}x{w}" != dims:
        raise LoadImageError("header/prefix dimension mismatch")
    body = raw[8:]
    if len(body) != h * w:
        raise LoadImageError("truncated bitmap body")
    return np.frombuffer(body, dtype=np.uint8).reshape(h, w).copy()


def decode_jpeg_bytes(data: bytes) -> np.ndarray:
    """Real JPEG decode (kernels/jpeg.py, pure numpy: markers → Huffman →
    dequant → batched IDCT → luma funnel) — the format the reference's
    own test fixtures use (python/tests/test_files/*.jpg, LoadImage
    utils.py:111-125); JpegError → LoadImageError.  Baseline SOF0/SOF1
    AND progressive SOF2 (spectral selection, EOB runs, successive
    approximation) are both fully decoded; only the arithmetic-coded and
    lossless variants raise a clear unsupported error."""
    from .jpeg import JpegError, decode_jpeg

    try:
        return decode_jpeg(data)
    except JpegError as exc:
        raise LoadImageError(f"bad jpeg: {exc}") from exc


def decode_gif_bytes(data: bytes) -> np.ndarray:
    """Real GIF first-frame decode (kernels/gif.py, pure LZW+numpy) —
    the reference's check_and_read_gif branch
    (ocrweb_multi/rapidocr/main.py:29-40: first frame → same pipeline);
    GifError → LoadImageError like every malformed payload."""
    from .gif import GifError, decode_gif

    try:
        return decode_gif(data)
    except GifError as exc:
        raise LoadImageError(f"bad gif: {exc}") from exc


def decode_png_bytes(data: bytes) -> np.ndarray:
    """Real PNG decode (kernels/png.py, pure zlib+numpy) normalised to the
    kernel chain's grayscale plane; PngError → LoadImageError, matching the
    reference's UnidentifiedImageError → LoadImageError mapping
    (utils.py:111-119)."""
    from .png import PngError, decode_png

    try:
        return decode_png(data)
    except PngError as exc:
        raise LoadImageError(f"bad png: {exc}") from exc


# format-sniffing registry (S2): magic-prefix → decoder.  The engine's own
# bitmap format plus REAL decoders for every container the reference
# accepts: baseline JPEG (kernels/jpeg.py), PNG (kernels/png.py), GIF
# first-frame (kernels/gif.py) — all pure numpy/stdlib spec
# implementations with the LoadImageError contract on junk.
IMAGE_CODECS: dict[str, object] = {
    "sgb": decode_bitmap,
    "jpeg": decode_jpeg_bytes,
    "png": decode_png_bytes,
    "gif": decode_gif_bytes,
}

# raw byte magics of the real formats (utils.py LoadImage dispatch + the
# GIF branch): used once the base64 body is decoded
_BYTE_MAGIC = ((b"\x89PNG\r\n\x1a\n", "png"), (b"\xff\xd8\xff", "jpeg"), (b"GIF8", "gif"))


def sniff_image_bytes(data: bytes) -> str | None:
    for magic, fmt in _BYTE_MAGIC:
        if data.startswith(magic):
            return fmt
    return None


def decode_image_payload(payload: str) -> np.ndarray:
    """S3 base64 ingest + S2 dispatch: bare-base64 image payload → decoded
    grayscale ndarray via the sniffed codec; LoadImageError on junk."""
    try:
        data = base64.b64decode(payload, validate=True)
    except Exception as exc:  # noqa: BLE001 — any malformation is a load error
        raise LoadImageError(f"undecodable base64 image payload: {exc}") from exc
    fmt = sniff_image_bytes(data)
    if fmt is None:
        raise LoadImageError("unrecognised image format")
    return IMAGE_CODECS[fmt](data)

# base64 magic prefixes of the real formats (first bytes of the payload
# body): JPEG \xff\xd8\xff → '/9j/', PNG \x89PNG → 'iVBOR', GIF87a/89a → 'R0lGOD'
_B64_MAGIC = (("/9j/", "jpeg"), ("iVBOR", "png"), ("R0lGOD", "gif"))


def sniff_image_format(payload: str) -> str | None:
    """S2 format sniff over the payload: engine bitmaps by prefix, real
    formats by their base64 magic (utils.py LoadImage + GIF branch)."""
    if payload.startswith(BITMAP_PREFIX):
        return "sgb"
    body = payload.split(":", 1)[-1]
    for magic, fmt in _B64_MAGIC:
        if body.startswith(magic):
            return fmt
    return None


def payload_kind(payload: str | None) -> str:
    """Routing tag: 'bitmap' | 'html' | 'pdf' | 'plain' | 'image' |
    'invalid'.  'image' = bare base64 of a real container format (the S3
    ingest shape), recognised by its base64 magic WITHOUT decoding —
    mirrored Catalyst-side in operators.extract.payload_kind_col."""
    if payload is None:
        return "invalid"
    if payload.startswith(BITMAP_PREFIX):
        return "bitmap"
    if payload.startswith(HTML_PREFIX):
        return "html"
    if payload.startswith(PDF_PREFIX):
        return "pdf"
    if payload.startswith(PLAIN_PREFIX):
        return "plain"
    for magic, _fmt in _B64_MAGIC:
        if payload.startswith(magic):
            return "image"
    return "invalid"


def bitmap_dims(payload: str) -> tuple[int, int] | None:
    """(h, w) parsed from the prefix WITHOUT decoding the body — this is
    what lets the F1 skip-det gate run as a DataFrame predicate."""
    if not payload.startswith(BITMAP_PREFIX):
        return None
    try:
        dims = payload.split(":", 2)[1]
        h, w = dims.split("x")
        return int(h), int(w)
    except (IndexError, ValueError):
        return None
