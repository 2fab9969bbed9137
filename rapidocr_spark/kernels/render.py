"""Deterministic text-bitmap renderer — fixture generator's drawing half.

Stands in for the reference's JPEG test fixtures
(/root/reference/python/tests/test_files/*.jpg): it draws text lines with
the synthetic glyph font so the det→cls→rec kernel chain has real work to
do, and the expected extraction is known by construction.

Layout contract (relied on by det/cls/rec kernels):
- ink is 255 on a 0 background;
- each line occupies a LINE_H-tall band: GLYPH_H glyph rows then one
  full-width *underline* row (the baseline marker the cls kernel uses for
  orientation and the rec kernel uses to anchor the glyph grid);
- glyph cells are CELL_W apart; the underline spans exactly the glyph
  extent, so ``n_cells = (underline_len + 1) // CELL_W`` is exact;
- LINE_GAP (16px) exceeds the maximum unclip expansion (≈0.8·line_h ≈ 9px
  for wide lines, SURVEY.md K5) plus blur reach, so a detected/unclipped
  box never swallows a neighbouring line's ink.
"""

from __future__ import annotations

import numpy as np

from .font import CELL_W, GLYPH_H, GLYPH_W, LINE_H, glyph, renderable
from .geometry import rotate_image

MARGIN = 8
LINE_GAP = 16
INK = 255

# glyph scale for rotated renders: features must out-size the ±1px
# resampling noise of the det-warp round trip, so rotated text is drawn at
# 3× (the rec kernel's scale search recovers it — kernels/rec.py)
ROTATION_SCALE = 3


def render_lines(
    lines: list[str],
    rotate180: bool = False,
    margin: int = MARGIN,
    min_width: int = 0,
    angle_deg: float = 0.0,
) -> np.ndarray:
    """Render text lines (top to bottom) into a uint8 grayscale image.

    ``angle_deg`` != 0 renders the skewed-text fixture case: the flat
    canvas is drawn at ROTATION_SCALE then rotated about its centre —
    the analog of the reference suite's photographed rotated text."""
    lines = [ln.rstrip() for ln in lines]
    for ln in lines:
        if not renderable(ln):
            raise ValueError(f"unrenderable characters in line: {ln!r}")
        if not ln:
            raise ValueError("empty line")
    widths = [len(ln) * CELL_W - 1 for ln in lines]
    w = max(max(widths) + 2 * margin, min_width)
    h = len(lines) * LINE_H + (len(lines) - 1) * LINE_GAP + 2 * margin
    img = np.zeros((h, w), dtype=np.uint8)
    y = margin
    for ln, lw in zip(lines, widths):
        for k, ch in enumerate(ln):
            if ch == " ":
                continue
            x = margin + k * CELL_W
            img[y : y + GLYPH_H, x : x + GLYPH_W] = glyph(ch) * INK
        img[y + GLYPH_H, margin : margin + lw] = INK  # underline/baseline
        y += LINE_H + LINE_GAP
    if rotate180:
        img = np.rot90(img, 2).copy()
    if angle_deg:
        img = np.kron(img, np.ones((ROTATION_SCALE, ROTATION_SCALE), dtype=np.uint8))
        # pad before rotating: the unclip expansion (d ≲ 0.8·line_h ≈ 30px
        # at scale 3, plus blur halo) must never hit the canvas border, or
        # the F9 clip deforms the quad and shears the warped crop
        pad = 6 * ROTATION_SCALE
        img = np.pad(img, pad, mode="constant")
        img = rotate_image(img, angle_deg)
    return img


def render_line_strip(text: str, margin: int = 1) -> np.ndarray:
    """Single-line strip shaped to take the F1 skip-det path:
    height = LINE_H + 2 ≤ min_height(30), like the reference's
    pre-cropped rec fixture (test_rec.jpg)."""
    return render_lines([text], margin=margin)


def render_noise(h: int, w: int, seed: int, density: float = 0.02) -> np.ndarray:
    """Sparse random ink — the analog of the zeros-image fixture
    (test_all_ort.py:38-41): blurred probability stays below det_thresh,
    so detection finds nothing and extraction yields null spans."""
    rng = np.random.default_rng(seed)
    return ((rng.random((h, w)) < density) * INK).astype(np.uint8)
