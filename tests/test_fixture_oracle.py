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
