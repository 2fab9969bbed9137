"""Property-based tests (hypothesis) for the round-2 kernels whose
correctness is geometric/combinatorial rather than golden-value-shaped:
min-area rect, perspective warp, the ntile closed form, and the KMV
two-level k-smallest reduction."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from rapidocr_spark.kernels.geometry import (
    convex_hull, min_area_rect, perspective_matrix, warp_quad,
)

pts_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=200),
        st.integers(min_value=0, max_value=200),
    ),
    min_size=3,
    max_size=40,
).filter(lambda ps: len({p for p in ps}) >= 3)


@settings(max_examples=60, deadline=None)
@given(pts_strategy)
def test_min_area_rect_contains_all_points(ps):
    pts = np.array(ps, dtype=np.float64)
    box, sside = min_area_rect(pts)
    q = box.astype(np.float64)
    # every input point is inside the rect (clockwise quad in y-down coords
    # → interior cross products >= 0), with float tolerance
    for p in pts:
        for i in range(4):
            a, b = q[i], q[(i + 1) % 4]
            cross = (b[0] - a[0]) * (p[1] - a[1]) - (b[1] - a[1]) * (p[0] - a[0])
            # box corners are float32 → cross products at 200px scale carry
            # ~1e-2 absolute noise; still ≪ the 1px quantum that matters
            assert cross >= -0.05
    assert sside >= -1e-9


@settings(max_examples=60, deadline=None)
@given(pts_strategy)
def test_min_area_rect_no_larger_than_bbox(ps):
    pts = np.array(ps, dtype=np.float64)
    box, _ = min_area_rect(pts)
    w = np.hypot(*(box[1] - box[0]))
    h = np.hypot(*(box[3] - box[0]))
    bw = pts[:, 0].max() - pts[:, 0].min()
    bh = pts[:, 1].max() - pts[:, 1].min()
    assert w * h <= bw * bh * (1 + 1e-5) + 1e-6 or (bw * bh == 0)


@settings(max_examples=60, deadline=None)
@given(pts_strategy)
def test_hull_subset_and_convex(ps):
    pts = np.array(ps, dtype=np.float64)
    hull = convex_hull(pts)
    as_set = {tuple(p) for p in pts.tolist()}
    assert all(tuple(h) in as_set for h in hull.tolist())


@settings(max_examples=40, deadline=None)
@given(
    st.integers(min_value=1, max_value=60),
    st.integers(min_value=1, max_value=60),
    st.integers(min_value=0, max_value=80),
    st.integers(min_value=0, max_value=80),
)
def test_warp_identity_on_any_axis_aligned_rect(w, h, x0, y0):
    rng = np.random.default_rng(w * 1000 + h * 10 + x0 + y0)
    img = (rng.random((160, 160)) * 255).astype(np.uint8)
    quad = np.array(
        [[x0, y0], [x0 + w, y0], [x0 + w, y0 + h], [x0, y0 + h]], np.float64
    )
    out = warp_quad(img, quad, w, h)
    want = img[y0 : y0 + h, x0 : x0 + w]
    assert np.array_equal(out, want)


@settings(max_examples=40, deadline=None)
@given(st.integers(min_value=1, max_value=2000))
def test_ntile_closed_form_matches_spec(n):
    """The expression used in ev_user_value_quartiles must equal SQL ntile
    semantics (first n%k tiles get n div k + 1 rows) for every n."""
    k = 4
    q, rem = divmod(n, k)
    want = []
    for t in range(1, k + 1):
        want += [t] * (q + 1 if t <= rem else q)
    got = []
    for r in range(1, n + 1):
        cut = rem * (q + 1)
        if r <= cut:
            got.append((r - 1) // (q + 1) + 1)
        else:
            got.append(rem + (r - cut - 1) // max(q, 1) + 1)
    assert got == want


@settings(max_examples=40, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=10**9), min_size=1, max_size=400))
def test_kmv_two_level_equals_direct_k_smallest(hs):
    """The salted two-level min-k reduction (plans/events.py:_kmv_topk)
    must equal the direct k smallest distinct values."""
    k, salt = 32, 64
    distinct = sorted(set(hs))
    want = distinct[:k]
    buckets: dict[int, list[int]] = {}
    for h in set(hs):
        buckets.setdefault(h % salt, []).append(h)
    l1 = [sorted(v)[:k] for v in buckets.values()]
    got = sorted(x for part in l1 for x in part)[:k]
    assert got == want
