"""Rotated-text support (VERDICT r01 item 2): min-area rotated rects from
component point sets, rect-exact polygon unclip, true 4-point perspective
warp, and end-to-end extraction of skewed renders — the engine analogs of
cv2.minAreaRect/boxPoints (/root/reference/python/rapidocr_onnxruntime/
ch_ppocr_v3_det/utils.py:326-347) and get_rotate_crop_image
(rapid_ocr_api.py:121-150).
"""

from __future__ import annotations

import numpy as np
import pytest

from rapidocr_spark.config import DEFAULT_CONFIG
from rapidocr_spark.kernels import det, render
from rapidocr_spark.kernels.geometry import (
    convex_hull, min_area_rect, perspective_matrix, unclip_quad, warp_quad,
)
from rapidocr_spark.kernels.oracle import extract_bitmap, extract_turn
from rapidocr_spark.plans.shell import EXTRACT_CFG

CFG = EXTRACT_CFG


# ------------------------------------------------------------------ geometry


def test_convex_hull_square_with_interior():
    pts = np.array([[0, 0], [4, 0], [4, 4], [0, 4], [2, 2], [1, 3]], float)
    hull = convex_hull(pts)
    assert sorted(map(tuple, hull.tolist())) == [(0, 0), (0, 4), (4, 0), (4, 4)]


def test_min_area_rect_recovers_rotation():
    # a 40×10 rect rotated by 30° — the fitted rect must match its corners
    th = np.deg2rad(30.0)
    c, s = np.cos(th), np.sin(th)
    base = np.array([[0, 0], [40, 0], [40, 10], [0, 10]], float)
    rot = base @ np.array([[c, s], [-s, c]]).T + 100.0
    # densify the edges so the hull is the rect itself
    edge_pts = []
    for i in range(4):
        a, b = rot[i], rot[(i + 1) % 4]
        for t in np.linspace(0, 1, 25):
            edge_pts.append(a * (1 - t) + b * t)
    box, sside = min_area_rect(np.array(edge_pts))
    assert sside == pytest.approx(10.0, abs=1e-6)
    got = sorted(map(tuple, np.round(box, 4).tolist()))
    want = sorted(map(tuple, np.round(rot, 4).tolist()))
    assert np.allclose(got, want, atol=1e-3)


def test_min_area_rect_axis_aligned_matches_bbox():
    pts = np.array([[2, 3], [9, 3], [2, 8], [9, 8], [5, 5]], float)
    box, sside = min_area_rect(pts)
    assert box.tolist() == [[2, 3], [9, 3], [9, 8], [2, 8]]
    assert sside == pytest.approx(5.0)


def test_unclip_quad_distance_formula_rotated():
    th = np.deg2rad(20.0)
    c, s = np.cos(th), np.sin(th)
    base = np.array([[0, 0], [100, 0], [100, 10], [0, 10]], float)
    quad = (base @ np.array([[c, s], [-s, c]]).T).astype(np.float32)
    out = unclip_quad(quad, 1.6)
    d = 100 * 10 * 1.6 / (2 * (100 + 10))
    w_out = np.hypot(*(out[1] - out[0]))
    h_out = np.hypot(*(out[3] - out[0]))
    assert w_out == pytest.approx(100 + 2 * d, abs=1e-4)
    assert h_out == pytest.approx(10 + 2 * d, abs=1e-4)


def test_perspective_matrix_maps_corners():
    src = np.array([[0, 0], [50, 0], [50, 20], [0, 20]], float)
    dst = np.array([[3, 7], [48, 12], [45, 33], [1, 28]], float)
    h = perspective_matrix(src, dst)
    pts = np.hstack([src, np.ones((4, 1))]) @ h.T
    got = pts[:, :2] / pts[:, 2:3]
    assert np.allclose(got, dst, atol=1e-9)


def test_warp_quad_identity_equals_slice():
    rng = np.random.default_rng(7)
    img = (rng.random((40, 60)) * 255).astype(np.uint8)
    quad = np.array([[10, 5], [30, 5], [30, 25], [10, 25]], np.float32)
    out = warp_quad(img, quad, 20, 20)
    assert np.array_equal(out, img[5:25, 10:30])


# ----------------------------------------------------------------------- det


def test_detect_rotated_eighteen_boxes():
    """The 18-box det golden (reference test_det.py:28) rendered at 12°."""
    rng = np.random.default_rng(3)
    chars = "ABCDEFGHJKMNPQRSTUVWXYZ2345678"
    lines = ["".join(rng.choice(list(chars), 3)) for _ in range(18)]
    img = render.render_lines(lines, angle_deg=12.0)
    boxes = det.detect(img, CFG)
    assert boxes.shape == (18, 4, 2)
    # boxes are genuinely rotated: top edge has a consistent slope
    tl, tr = boxes[0][0], boxes[0][1]
    slope = (tr[1] - tl[1]) / (tr[0] - tl[0])
    assert abs(slope - np.tan(np.deg2rad(12.0))) < 0.08


def test_detect_axis_aligned_unchanged():
    img = render.render_lines(["Alpha7", "BravoXY", "Charlie"])
    boxes = det.detect(img, CFG)
    assert boxes.shape == (3, 4, 2)
    for b in boxes:  # flat renders still produce axis-aligned quads
        assert b[0][1] == b[1][1] and b[2][1] == b[3][1]


# ----------------------------------------------------------------- pipeline


@pytest.mark.parametrize("angle", [-25.0, -8.0, 8.0, 15.0, 30.0])
def test_extract_rotated_multiline(angle):
    lines = ["Hello-World42", "second LINE 9", "third"]
    img = render.render_lines(lines, angle_deg=angle)
    res = extract_bitmap(img, CFG)
    assert res["extracted_text"] == "\n".join(lines)
    assert res["n_boxes"] == 3


def test_extract_rotated_plus_180():
    img = render.render_lines(["UPSIDE down1"], rotate180=True, angle_deg=15.0)
    res = extract_bitmap(img, CFG)
    assert res["extracted_text"] == "UPSIDE down1"


def test_golden_rotated_turn():
    from rapidocr_spark.sources.transcripts import (
        GOLDEN_ROTATED_LINES, payload_for,
    )

    res = extract_turn(payload_for(0, 9), CFG)
    assert res["extracted_text"] == "\n".join(GOLDEN_ROTATED_LINES)
    assert res["n_boxes"] == 2
    assert res["error"] is None


def test_default_config_rotated():
    """Rotated extraction also works under the reference default det size
    (736/min: det internally upsamples, crops come from the source)."""
    lines = ["DefaultCfg 9"]
    img = render.render_lines(lines, angle_deg=20.0)
    res = extract_bitmap(img, DEFAULT_CONFIG)
    assert res["extracted_text"] == "DefaultCfg 9"
