"""Hand-built semantics tests for the custom join operators Spark lacks
natively (as-of join, bucketed range join) and the Gopher-style repetition
filter — exact edge-case contracts the sf-scale parity gate can't pin:
timestamp ties, the inclusive +W boundary, the bucket seam, and known
repetition fractions.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest

from rapidocr_spark.functions.text import doc_repetition_stats
from rapidocr_spark.plans.events import (
    RANGE_JOIN_WINDOW_US,
    ev_asof_click_attribution,
    ev_range_join_follows,
)

T0 = datetime(2026, 1, 1)


def _ts(sec: float) -> datetime:
    return T0 + timedelta(seconds=sec)


@pytest.fixture(scope="module")
def joins_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("custom_joins")
    rows = [
        # user 1 — as-of: tie at t=200 (ids 2 and 5; max event_id wins)
        (1, _ts(100), 1, "click", 1.0),
        (2, _ts(200), 1, "click", 2.0),
        (5, _ts(200), 1, "click", 5.0),
        (10, _ts(150), 1, "purchase", 0.0),
        (11, _ts(200), 1, "purchase", 0.0),
        (12, _ts(50), 1, "purchase", 0.0),  # before any click
        # user 2 — purchase with no click at all
        (20, _ts(100), 2, "purchase", 0.0),
        # user 3 — click with no purchase (no as-of output row)
        (30, _ts(100), 3, "click", 3.0),
        # user 4 — range-join boundary cases (W = 300 s)
        (41, _ts(0), 4, "click", 0.0),
        (42, _ts(1), 4, "view", 0.0),
        (43, _ts(300), 4, "view", 0.0),  # exactly +W: included
        (44, _ts(301), 4, "view", 0.0),  # just past +W for click 41
        (45, _ts(299), 4, "click", 0.0),  # crosses the bucket seam
        (46, _ts(599), 4, "purchase", 0.0),  # exactly 45+W
        (47, _ts(600), 4, "view", 0.0),  # past both windows
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string, value double"
    )
    df.write.parquet(str(d / "events.parquet"))
    docs = spark.createDataFrame(
        [(1, "a b a b a c"), (2, "x y")], "doc_id bigint, text string"
    )
    docs.write.parquet(str(d / "documents.parquet"))
    return str(d)


def test_asof_attribution_semantics(joins_dir, spark):
    out = {
        r["purchase_id"]: r
        for r in ev_asof_click_attribution(spark, joins_dir).collect()
    }
    assert set(out) == {10, 11, 12, 20, 46}
    # latest click <= purchase ts
    assert out[10]["click_id"] == 1
    assert out[10]["gap_us"] == 50 * 1_000_000
    assert out[10]["click_value"] == 1.0
    # equal-ts tie: click at the same instant counts (<=), max event_id wins
    assert out[11]["click_id"] == 5
    assert out[11]["gap_us"] == 0
    assert out[11]["click_value"] == 5.0
    # no preceding click -> null attribution, row still present (left asof)
    for pid in (12, 20):
        assert out[pid]["click_id"] is None
        assert out[pid]["gap_us"] is None
        assert out[pid]["click_value"] is None
    # user 4: purchase 46 attributes to click 45 (t=299), not click 41
    assert out[46]["click_id"] == 45
    assert out[46]["gap_us"] == 300 * 1_000_000


def test_range_join_window_boundaries(joins_dir, spark):
    assert RANGE_JOIN_WINDOW_US == 300_000_000
    out = {
        r["event_type"]: (r["n_pairs"], r["n_clicks"], r["n_followers"])
        for r in ev_range_join_follows(spark, joins_dir).collect()
    }
    # user 4: click 41 (t=0) -> 42 (t=1), 43 (t=300 == +W inclusive), 45;
    #         click 45 (t=299) -> 43 (t=300, across the bucket seam),
    #         44 (t=301), 46 (t=599 == +W inclusive)
    # user 1: click 1 (t=100) -> purchases 10/11, clicks 2/5 (t=200)
    # excluded: each click itself (strict >), 44 for click 41 (301 > 300),
    #           47 (600 > 599), anything after t=200 for clicks 2/5
    assert out["view"] == (4, 2, 3)  # 41->{42,43}, 45->{43,44}
    assert out["click"] == (3, 2, 3)  # 1->{2,5}, 41->{45}
    assert out["purchase"] == (3, 2, 3)  # 1->{10,11}, 45->{46}


def test_repetition_stats_known_fractions(joins_dir, spark):
    out = {r["doc_id"]: r for r in doc_repetition_stats(spark, joins_dir).collect()}
    # "a b a b a c": 6 words, top 'a' x3; 3-grams [aba, bab, aba, bac]
    # -> 2 of 4 occurrences belong to a duplicated gram
    assert out[1]["n_words"] == 6
    assert out[1]["top_word"] == "a"
    assert out[1]["top_word_frac"] == 0.5
    assert out[1]["dup_gram_frac"] == 0.5
    # "x y": too short for 3-grams -> 0.0; count tie broken by word asc
    assert out[2]["n_words"] == 2
    assert out[2]["top_word"] == "x"
    assert out[2]["dup_gram_frac"] == 0.0
