"""Rotated-rectangle geometry — pure-numpy re-derivations of the cv2
primitives the reference's det post-processing leans on:

- ``min_area_rect``      cv2.minAreaRect + cv2.boxPoints + get_mini_boxes
                         point ordering (/root/reference/python/
                         rapidocr_onnxruntime/ch_ppocr_v3_det/utils.py:326-347)
- ``unclip_quad``        pyclipper round-join offset → minAreaRect, for
                         rectangular input (utils.py:317-324): a rect offset
                         outward by d re-boxed is the same rect grown by d
                         on every side
- ``warp_quad``          cv2.getPerspectiveTransform + warpPerspective of
                         K7 get_rotate_crop_image (rapid_ocr_api.py:121-150)
- ``rotate_image``       the fixture renderer's arbitrary-angle rotation
                         (test-image generator; the reference's rotated
                         fixtures are photographs)

Everything is derived from the public geometry (rotating calipers over a
convex hull; DLT homography solve), not translated from cv2 sources.
"""

from __future__ import annotations

import numpy as np


def convex_hull(points: np.ndarray) -> np.ndarray:
    """Convex hull (CCW in y-down image coords) via Andrew's monotone
    chain.  points: (N,2) float/int array; returns (M,2) float64."""
    # Python-float tuples: the chain scan is inherently sequential, and
    # per-step ndarray scalar indexing costs ~8× the identical float64
    # arithmetic on native floats (Python floats ARE IEEE float64).
    # sorted(set(...)) IS np.unique(axis=0) here — same lexicographic
    # order, same dedupe — at 1.5-4.6x less cost for these point counts.
    seq: list[tuple[float, float]] = sorted(
        set(map(tuple, points.astype(np.float64).tolist()))
    )
    if len(seq) <= 2:
        return np.array(seq, dtype=np.float64).reshape(-1, 2)

    def half(s: list[tuple[float, float]]) -> list[tuple[float, float]]:
        out: list[tuple[float, float]] = []
        for px, py in s:
            while len(out) >= 2:
                ox, oy = out[-2]
                ax, ay = out[-1]
                # cross <= 0 → clockwise or collinear turn: pop
                if (ax - ox) * (py - oy) - (ay - oy) * (px - ox) <= 0:
                    out.pop()
                else:
                    break
            out.append((px, py))
        return out

    lower = half(seq)
    upper = half(seq[::-1])
    return np.array(lower[:-1] + upper[:-1], dtype=np.float64)


def min_area_rect(points: np.ndarray) -> tuple[np.ndarray, float]:
    """Minimum-area enclosing rotated rectangle of a point set.

    Returns (box, sside): box is (4,2) float32 in the reference's
    get_mini_boxes order (leftmost-top first, clockwise: for an upright
    rect that is [tl, tr, br, bl]), sside is the shorter rect side —
    exactly the tuple the reference's det filters consume
    (ch_ppocr_v3_det/utils.py:326-347).

    Method: the optimal rectangle shares an edge direction with the convex
    hull (rotating-calipers fact), so scan every hull edge, project the
    hull onto (edge, normal), and keep the minimum-area frame.
    """
    hull = convex_hull(points)
    n = hull.shape[0]
    if n == 1:
        p = hull[0]
        box = np.repeat(p[None, :], 4, axis=0).astype(np.float32)
        return box, 0.0
    if n == 2:
        # degenerate: a segment — treat as a zero-height upright-ish rect
        a, b = hull[0], hull[1]
        box = np.array([a, b, b, a], dtype=np.float32)
        return _order_mini_box(box), 0.0

    edges = np.roll(hull, -1, axis=0) - hull
    lens = np.hypot(edges[:, 0], edges[:, 1])
    ok = lens > 0
    ux = edges[ok] / lens[ok, None]            # unit edge directions (E,2)
    uy = np.stack([-ux[:, 1], ux[:, 0]], 1)    # unit normals
    px = hull @ ux.T                           # projections (N,E)
    py = hull @ uy.T
    w = px.max(0) - px.min(0)
    h = py.max(0) - py.min(0)
    best = int(np.argmin(w * h))
    x0, x1 = px[:, best].min(), px[:, best].max()
    y0, y1 = py[:, best].min(), py[:, best].max()
    u, v = ux[best], uy[best]
    corners = np.array(
        [
            x0 * u + y0 * v,
            x1 * u + y0 * v,
            x1 * u + y1 * v,
            x0 * u + y1 * v,
        ],
        dtype=np.float64,
    )
    sside = float(min(x1 - x0, y1 - y0))
    return _order_mini_box(corners.astype(np.float32)), sside


def _order_mini_box(box: np.ndarray) -> np.ndarray:
    """get_mini_boxes ordering: sort the 4 corners by x; among the two
    leftmost pick the upper as index 0 and lower as index 3, among the two
    rightmost the upper as index 1 and lower as index 2 (utils.py:330-345)."""
    idx = np.argsort(box[:, 0], kind="stable")
    left, right = box[idx[:2]], box[idx[2:]]
    l_up, l_dn = (left[0], left[1]) if left[0][1] <= left[1][1] else (left[1], left[0])
    r_up, r_dn = (right[0], right[1]) if right[0][1] <= right[1][1] else (right[1], right[0])
    return np.array([l_up, r_up, r_dn, l_dn], dtype=np.float32)


def unclip_quad(box: np.ndarray, ratio: float) -> np.ndarray:
    """K5 polygon expansion for a rectangular quad: offset distance
    d = area·ratio / perimeter (utils.py:317-324); the round-join offset
    of a rectangle re-boxed by minAreaRect is the rectangle grown by d on
    every side, so push each corner outward along its two edge normals."""
    tl, tr, br, bl = box.astype(np.float64)
    w = np.hypot(*(tr - tl))
    h = np.hypot(*(bl - tl))
    if w * h == 0 or (w + h) == 0:
        return box.astype(np.float32)
    d = (w * h * ratio) / (2.0 * (w + h))
    ex = (tr - tl) / w  # unit x (along the text line)
    ey = (bl - tl) / h  # unit y (down the line height)
    out = np.array(
        [
            tl - d * ex - d * ey,
            tr + d * ex - d * ey,
            br + d * ex + d * ey,
            bl - d * ex + d * ey,
        ]
    )
    return out.astype(np.float32)


def perspective_matrix(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """3×3 homography H with H·[sx,sy,1]ᵀ ∝ [dx,dy,1]ᵀ for the 4 point
    pairs (DLT, h33 pinned to 1) — getPerspectiveTransform's contract."""
    a = np.zeros((8, 8), dtype=np.float64)
    b = np.zeros(8, dtype=np.float64)
    for i in range(4):
        sx, sy = float(src[i][0]), float(src[i][1])
        dx, dy = float(dst[i][0]), float(dst[i][1])
        a[2 * i] = [sx, sy, 1, 0, 0, 0, -dx * sx, -dx * sy]
        a[2 * i + 1] = [0, 0, 0, sx, sy, 1, -dy * sx, -dy * sy]
        b[2 * i] = dx
        b[2 * i + 1] = dy
    h = np.linalg.solve(a, b)
    return np.append(h, 1.0).reshape(3, 3)


def warp_quad(img: np.ndarray, quad: np.ndarray, dst_w: int, dst_h: int) -> np.ndarray:
    """Perspective-warp ``quad`` ([tl,tr,br,bl]) to an upright dst_h×dst_w
    crop — warpPerspective with nearest sampling + border replicate
    (deterministic; preserves the binary glyph structure the synthetic rec
    net matches on)."""
    h_inv = perspective_matrix(
        np.array([[0, 0], [dst_w, 0], [dst_w, dst_h], [0, dst_h]], dtype=np.float64),
        quad.astype(np.float64),
    )
    xs, ys = np.meshgrid(
        np.arange(dst_w, dtype=np.float64) + 0.5,
        np.arange(dst_h, dtype=np.float64) + 0.5,
    )
    denom = h_inv[2, 0] * xs + h_inv[2, 1] * ys + h_inv[2, 2]
    sx = (h_inv[0, 0] * xs + h_inv[0, 1] * ys + h_inv[0, 2]) / denom
    sy = (h_inv[1, 0] * xs + h_inv[1, 1] * ys + h_inv[1, 2]) / denom
    ih, iw = img.shape[:2]
    ix = np.clip(np.floor(sx).astype(np.int64), 0, iw - 1)
    iy = np.clip(np.floor(sy).astype(np.int64), 0, ih - 1)
    return img[iy, ix]


def rotate_image(img: np.ndarray, angle_deg: float) -> np.ndarray:
    """Rotate a grayscale uint8 image by angle_deg (CCW, y-down: visually
    clockwise) about its centre onto an enlarged canvas (background 0),
    nearest sampling.  Fixture-renderer helper for rotated-text cases."""
    th = np.deg2rad(angle_deg)
    c, s = np.cos(th), np.sin(th)
    h, w = img.shape[:2]
    nw = int(np.ceil(abs(w * c) + abs(h * s))) + 2
    nh = int(np.ceil(abs(w * s) + abs(h * c))) + 2
    cx, cy = w / 2.0, h / 2.0
    ncx, ncy = nw / 2.0, nh / 2.0
    xs, ys = np.meshgrid(
        np.arange(nw, dtype=np.float64) + 0.5 - ncx,
        np.arange(nh, dtype=np.float64) + 0.5 - ncy,
    )
    # inverse map (rotate dst coords by -θ back into src frame)
    sx = c * xs + s * ys + cx
    sy = -s * xs + c * ys + cy
    ix = np.floor(sx).astype(np.int64)
    iy = np.floor(sy).astype(np.int64)
    inside = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
    out = np.zeros((nh, nw), dtype=img.dtype)
    out[inside] = img[iy[inside], ix[inside]]
    return out
