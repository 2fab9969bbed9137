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


def _decode_jpeg_png_stub(payload: str) -> np.ndarray:
    """Real image decode — NOT available in this container (no cv2/PIL).

    Deploy note: register a real decoder under IMAGE_CODECS['jpeg'/'png']
    (e.g. ``lambda b: np.asarray(PIL.Image.open(io.BytesIO(b)))``); the
    sniffing, routing and Spark plan are unchanged.  Mirrors LoadImage's
    format dispatch (/root/reference/python/rapidocr_onnxruntime/
    utils.py:94-155) and the multimodal MEDIA_CODECS seam."""
    raise LoadImageError("jpeg/png codec libraries are not in this container")


# format-sniffing registry (S2): magic-prefix → decoder.  The engine's own
# bitmap format is the only decoder that can run in-sandbox; jpeg/png/gif
# are honestly-stubbed seams with real sniffing so junk vs unsupported is
# distinguished exactly like the reference's LoadImageError contract.
IMAGE_CODECS: dict[str, object] = {
    "sgb": decode_bitmap,
    "jpeg": _decode_jpeg_png_stub,
    "png": _decode_jpeg_png_stub,
    "gif": _decode_jpeg_png_stub,
}

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
    """Routing tag: 'bitmap' | 'html' | 'pdf' | 'plain' | 'invalid'."""
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
