"""Staleness guard for the committed expected-extraction fixtures: a kernel
or generator change must never silently invalidate the driver oracle for
x_extract_turns / x_assemble_conversations.  Recomputes the whole expected
corpus eagerly and compares against the committed parquet byte-for-value.
"""

from __future__ import annotations

import os

import pandas as pd
import pytest

from rapidocr_spark.plans.shell import EXTRACT_CFG, _FIXTURES_DIR
from rapidocr_spark.sources.fixtures import (
    CONVS_FIXTURE, N_FIXTURE_CONVS, TURNS_FIXTURE,
    expected_convs_pandas, expected_turns_pandas,
)


@pytest.fixture(scope="module")
def fresh_turns() -> pd.DataFrame:
    return expected_turns_pandas(N_FIXTURE_CONVS, EXTRACT_CFG)


def test_turns_fixture_current(fresh_turns):
    committed = pd.read_parquet(os.path.join(_FIXTURES_DIR, TURNS_FIXTURE))
    pd.testing.assert_frame_equal(
        committed.reset_index(drop=True), fresh_turns.reset_index(drop=True)
    )


def test_convs_fixture_current(fresh_turns):
    committed = pd.read_parquet(os.path.join(_FIXTURES_DIR, CONVS_FIXTURE))
    fresh = expected_convs_pandas(fresh_turns)
    pd.testing.assert_frame_equal(
        committed.reset_index(drop=True), fresh.reset_index(drop=True)
    )


def test_multilang_fixture_current():
    from rapidocr_spark.sources.fixtures import (
        MULTILANG_FIXTURE, expected_multilang_pandas,
    )

    committed = pd.read_parquet(os.path.join(_FIXTURES_DIR, MULTILANG_FIXTURE))
    fresh = expected_multilang_pandas(N_FIXTURE_CONVS, EXTRACT_CFG)
    pd.testing.assert_frame_equal(
        committed.reset_index(drop=True), fresh.reset_index(drop=True)
    )


def test_mostangle_fixture_current():
    from rapidocr_spark.sources.fixtures import (
        MOSTANGLE_FIXTURE, N_FIXTURE_MOSTANGLE, expected_mostangle_pandas,
    )

    committed = pd.read_parquet(os.path.join(_FIXTURES_DIR, MOSTANGLE_FIXTURE))
    fresh = expected_mostangle_pandas(N_FIXTURE_MOSTANGLE, EXTRACT_CFG)
    pd.testing.assert_frame_equal(
        committed.reset_index(drop=True), fresh.reset_index(drop=True)
    )


def test_padded_fixture_current():
    from rapidocr_spark.sources.fixtures import (
        N_FIXTURE_PADDED, PADDED_FIXTURE, expected_padded_pandas,
    )

    committed = pd.read_parquet(os.path.join(_FIXTURES_DIR, PADDED_FIXTURE))
    fresh = expected_padded_pandas(N_FIXTURE_PADDED, EXTRACT_CFG)
    pd.testing.assert_frame_equal(
        committed.reset_index(drop=True), fresh.reset_index(drop=True)
    )


def test_vis_fixture_current():
    from rapidocr_spark.sources.fixtures import VIS_FIXTURE, expected_vis_pandas

    committed = pd.read_parquet(os.path.join(_FIXTURES_DIR, VIS_FIXTURE))
    fresh = expected_vis_pandas(N_FIXTURE_CONVS, EXTRACT_CFG)
    pd.testing.assert_frame_equal(
        committed.reset_index(drop=True), fresh.reset_index(drop=True)
    )


def test_vis_canvas_semantics():
    """S10 contract: the canvas is (H, 2W); the left half carries the
    source plus outline pixels, the right half the re-rendered texts; the
    encoded PNG decodes back to the exact canvas."""
    import numpy as np

    from rapidocr_spark.kernels.codec import decode_bitmap
    from rapidocr_spark.kernels.oracle import extract_turn
    from rapidocr_spark.kernels.png import decode_png, encode_png
    from rapidocr_spark.kernels.render import render_lines
    from rapidocr_spark.kernels.vis import OUTLINE, vis_result
    from rapidocr_spark.kernels.codec import encode_bitmap

    payload = encode_bitmap(render_lines(["Vis sink line", "second one"]))
    res = extract_turn(payload, EXTRACT_CFG)
    img = decode_bitmap(payload)
    vis = vis_result(img, res["spans"])
    h, w = img.shape
    assert vis.shape == (h, 2 * w)
    left, right = vis[:, :w], vis[:, w:]
    assert (left == OUTLINE).sum() > 0          # outlines burnt in
    assert right.sum() > 0                       # texts re-rendered
    assert np.array_equal(decode_png(encode_png(vis)), vis)  # sink round-trip


def test_padding_translates_back_without_clipping():
    """K13 unit contract: a near-edge line's reported corner goes negative
    under det_padding (free unclip + −padding translation), stays clipped
    at the canvas edge without it; extracted text survives both ways."""
    from rapidocr_spark.kernels.oracle import extract_turn
    from rapidocr_spark.sources.fixtures import PADDING_GATE, padded_payload

    payload = padded_payload(0)
    base = extract_turn(payload, EXTRACT_CFG)
    padded = extract_turn(payload, EXTRACT_CFG.replace(det_padding=PADDING_GATE))
    assert base["spans"] and padded["spans"]
    base_min = min(min(x, y) for s in base["spans"] for x, y in s["box"])
    pad_min = min(min(x, y) for s in padded["spans"] for x, y in s["box"])
    assert base_min >= 0.0  # F9 clip pins unpadded boxes to the canvas
    assert pad_min < 0.0    # padded boxes translate back past the origin
    assert padded["extracted_text"] == base["extracted_text"]


def test_mostangle_majority_override_semantics():
    """A4 unit contract (dotnet OcrLib/AngleNet.cs:74-97): a mixed batch
    with a flipped MINORITY rotates nothing under the override (the
    flipped crop's text degrades); a flipped MAJORITY rotates everything;
    ties (sum == n/2) go to index 1 like the .NET `sum < half` branch."""
    import numpy as np

    from rapidocr_spark.kernels import cls as cls_kernel
    from rapidocr_spark.kernels.render import render_lines

    cfg = EXTRACT_CFG.replace(cls_most_angle=True)
    up = render_lines(["Upright line"])
    down = np.rot90(render_lines(["Upright line"]), 2).copy()
    # minority flipped: 1 of 3 → rotate none; the flipped crop unchanged
    crops, labels = cls_kernel.classify_and_rotate([up, up, down], cfg)
    assert [l for l, _ in labels] == ["0", "0", "0"]
    assert np.array_equal(crops[2], down)
    # majority flipped: 2 of 3 → rotate ALL (upright one becomes flipped)
    crops2, labels2 = cls_kernel.classify_and_rotate([down, down, up], cfg)
    assert [l for l, _ in labels2] == ["180", "180", "180"]
    assert np.array_equal(crops2[2], np.rot90(up, 2))
    # tie: 1 of 2 → sum == n/2 → index 1 (rotate all)
    _, labels3 = cls_kernel.classify_and_rotate([up, down], cfg)
    assert [l for l, _ in labels3] == ["180", "180"]
    # knob off: per-crop F8 path corrects only the flipped crop
    crops4, _ = cls_kernel.classify_and_rotate([up, down], EXTRACT_CFG)
    assert np.array_equal(crops4[0], up)
    assert np.array_equal(crops4[1], up)


def test_multilang_zh_branch_diverges():
    """The J4 binding must be observable: the zh (use_cls=False) branch has
    to produce different text than the default config on rotated turns —
    otherwise the routing gate proves nothing."""
    from rapidocr_spark.sources.fixtures import MULTILANG_FIXTURE

    m = pd.read_parquet(os.path.join(_FIXTURES_DIR, MULTILANG_FIXTURE))
    t = pd.read_parquet(os.path.join(_FIXTURES_DIR, TURNS_FIXTURE))
    j = m.merge(t, on=["conv_id", "turn_idx"], suffixes=("_m", "_t"))
    zh_diff = j[
        (j.lang == "zh")
        & (j.extracted_text_m.fillna("") != j.extracted_text_t.fillna(""))
    ]
    assert len(zh_diff) > 0


def test_media_fixtures_current():
    from rapidocr_spark.sources.media import (
        FRAMES_FIXTURE, MEDIA_FIXTURE, N_FIXTURE_MEDIA,
        expected_frames_pandas, expected_media_pandas,
    )

    committed_m = pd.read_parquet(os.path.join(_FIXTURES_DIR, MEDIA_FIXTURE))
    committed_f = pd.read_parquet(os.path.join(_FIXTURES_DIR, FRAMES_FIXTURE))
    pd.testing.assert_frame_equal(committed_m, expected_media_pandas(N_FIXTURE_MEDIA))
    pd.testing.assert_frame_equal(committed_f, expected_frames_pandas(N_FIXTURE_MEDIA))


def test_real_media_fixture_current():
    from rapidocr_spark.sources.media import (
        N_FIXTURE_REAL_MEDIA, REAL_MEDIA_FIXTURE, expected_real_media_pandas,
    )

    committed = pd.read_parquet(os.path.join(_FIXTURES_DIR, REAL_MEDIA_FIXTURE))
    pd.testing.assert_frame_equal(
        committed, expected_real_media_pandas(N_FIXTURE_REAL_MEDIA)
    )


def test_golden_anchors_present(fresh_turns):
    """conv000000 turns 0-8 are the reference-derived goldens (FIXTURES.md)."""
    conv0 = fresh_turns[fresh_turns.conv_id == "conv000000"].set_index("turn_idx")
    assert conv0.loc[0, "extracted_text"].startswith("正品促销")
    assert conv0.loc[1, "n_boxes"] == 18
    assert conv0.loc[2, "extracted_text"] == "韩国小馆"
    assert conv0.loc[2, "skip_det"] == "skip"
    assert conv0.loc[4, "extracted_text"] is None or pd.isna(conv0.loc[4, "extracted_text"])
    assert str(conv0.loc[5, "error"]).startswith("LoadImageError")


def test_char_scores_fixture_current():
    from rapidocr_spark.sources.fixtures import (
        CHAR_SCORES_FIXTURE, expected_char_scores_pandas,
    )

    committed = pd.read_parquet(os.path.join(_FIXTURES_DIR, CHAR_SCORES_FIXTURE))
    fresh = expected_char_scores_pandas(N_FIXTURE_CONVS, EXTRACT_CFG)
    pd.testing.assert_frame_equal(
        committed.reset_index(drop=True), fresh.reset_index(drop=True)
    )
