"""S10 visual debug sink — the engine's draw_ocr_box_txt / DrawTextBoxes
analog (reference: python/demo.py:16-69 side-by-side canvas — left the
source image with the det polygons burnt in, right a blank canvas with
each span's text re-rendered at its box corner; dotnet
OcrLib/OcrUtils.cs:66 DrawTextBoxes polylines).

Differences forced by the sandbox (no PIL/cv2/fonts): grayscale uint8
canvases, deterministic outline intensity instead of random RGB, and the
right-panel text drawn with the engine's own glyph bank — everything a
pure function of (image, spans), so the fixture oracle pins exact pixel
sums and the PNG sink bytes.
"""

from __future__ import annotations

import numpy as np

OUTLINE = 160  # deterministic mid-gray (demo.py uses random.seed(0) colors)


def draw_segment(canvas: np.ndarray, x0: float, y0: float, x1: float, y1: float,
                 value: int = OUTLINE) -> None:
    """1px Bresenham-style segment, clipped to the canvas."""
    h, w = canvas.shape
    n = int(max(abs(x1 - x0), abs(y1 - y0))) + 1
    xs = np.rint(np.linspace(x0, x1, n)).astype(np.int64)
    ys = np.rint(np.linspace(y0, y1, n)).astype(np.int64)
    keep = (xs >= 0) & (xs < w) & (ys >= 0) & (ys < h)
    canvas[ys[keep], xs[keep]] = value


def draw_quad(canvas: np.ndarray, quad, value: int = OUTLINE) -> None:
    """Quad outline (the DrawTextBoxes polyline, thickness 1)."""
    pts = [(float(x), float(y)) for x, y in quad]
    for i in range(4):
        x0, y0 = pts[i]
        x1, y1 = pts[(i + 1) % 4]
        draw_segment(canvas, x0, y0, x1, y1, value)


def draw_text(canvas: np.ndarray, text: str, x: int, y: int) -> None:
    """Right-panel text via the engine's glyph bank (demo.py draw_right
    analog), clipped to the canvas; spaces advance the cursor."""
    from .font import CELL_W, GLYPH_H, GLYPH_W, glyph, renderable

    h, w = canvas.shape
    cx = x
    for ch in text:
        if ch != " " and renderable(ch):
            g = glyph(ch) * 255
            y1, x1 = min(y + GLYPH_H, h), min(cx + GLYPH_W, w)
            if y < h and cx < w and y1 > max(y, 0) and x1 > max(cx, 0):
                ys, xs = max(y, 0), max(cx, 0)
                canvas[ys:y1, xs:x1] = np.maximum(
                    canvas[ys:y1, xs:x1], g[ys - y : y1 - y, xs - cx : x1 - cx]
                )
        cx += CELL_W
        if cx >= w:
            break


def vis_result(img: np.ndarray, spans: list[dict]) -> np.ndarray:
    """(H, W) source + spans → (H, 2W) side-by-side debug canvas:
    left = source with box outlines burnt in, right = blank canvas with
    each span's text at its box's top-left corner (demo.py:22-69)."""
    h, w = img.shape[:2]
    left = img.copy()
    right = np.zeros((h, w), dtype=np.uint8)
    for span in spans or []:
        quad = span["box"]
        draw_quad(left, quad)
        x0, y0 = quad[0]
        draw_text(right, span["text"], int(round(float(x0))), int(round(float(y0))))
    out = np.zeros((h, 2 * w), dtype=np.uint8)
    out[:, :w] = left
    out[:, w:] = right
    return out


def vis_turn(payload: str, cfg) -> dict | None:
    """One transcript turn → vis-canvas stats + PNG sink bytes length, or
    None when the turn yields no drawable spans (plain/html/error turns).
    The same function is the eager fixture mirror AND the per-row kernel
    of the Spark operator (distribution must be invisible)."""
    from .codec import (
        LoadImageError, decode_bitmap, decode_image_payload, payload_kind,
    )
    from .oracle import extract_turn
    from .png import encode_png

    kind = payload_kind(payload)
    if kind not in ("bitmap", "image"):
        return None
    res = extract_turn(payload, cfg)
    if not res["spans"]:
        return None
    try:
        img = (
            decode_image_payload(payload) if kind == "image" else decode_bitmap(payload)
        )
    except LoadImageError:
        return None
    vis = vis_result(img, res["spans"])
    return {
        "vis_h": int(vis.shape[0]),
        "vis_w": int(vis.shape[1]),
        "n_drawn": len(res["spans"]),
        "px_sum": int(vis.astype(np.int64).sum()),
        "png_len": len(encode_png(vis)),
    }
