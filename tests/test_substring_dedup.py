"""dedup_substring_spans semantics: a planted boilerplate run shared by
otherwise-distinct documents must be found with correct extents in BOTH
documents; unrelated documents must produce no spans."""

from __future__ import annotations

import os

import pandas as pd
import pytest

from rapidocr_spark.functions.dedup import (
    SS_K,
    SS_MIN_SPAN,
    SS_W,
    dedup_substring_spans,
)


@pytest.fixture()
def planted_dir(tmp_path):
    import numpy as np

    rng = np.random.RandomState(99)

    def rand_text(n):
        return "".join(rng.choice(list("abcdefghijklmnopqrstuvwxyz "), n))

    boiler = "SUBSCRIBE TO OUR NEWSLETTER FOR DAILY UPDATES AND EXCLUSIVE OFFERS TODAY"
    rows = [
        {"doc_id": 1, "text": rand_text(80) + boiler + rand_text(60)},
        {"doc_id": 2, "text": rand_text(140) + boiler + rand_text(30)},
        {"doc_id": 3, "text": rand_text(200)},
        {"doc_id": 4, "text": rand_text(180)},
    ]
    pdf = pd.DataFrame(rows)
    pdf["lang"] = "en"
    pdf.to_parquet(os.path.join(tmp_path, "documents.parquet"))
    return str(tmp_path), boiler, rows


def test_planted_boilerplate_found(spark, planted_dir):
    sf_dir, boiler, rows = planted_dir
    out = dedup_substring_spans(spark, sf_dir).toPandas()
    hit = out[(out.doc_a == 1) & (out.doc_b == 2)]
    assert len(hit) >= 1, out
    best = hit.sort_values("span_len", ascending=False).iloc[0]
    # the reported span must lie inside the planted run (1-based, winnowing
    # can shave up to w+k-2 chars at each edge) and cover most of it
    a_lo = rows[0]["text"].index(boiler) + 1
    b_lo = rows[1]["text"].index(boiler) + 1
    assert best.a_start >= a_lo and best.a_end <= a_lo + len(boiler) - 1
    assert best.b_start >= b_lo and best.b_end <= b_lo + len(boiler) - 1
    assert best.span_len >= len(boiler) - 2 * (SS_W + SS_K - 2)
    assert best.span_len >= SS_MIN_SPAN
    # the same offset difference holds on both sides (one diagonal)
    assert best.b_start - best.a_start == b_lo - a_lo
    # unrelated docs share nothing
    others = out[(out.doc_a != 1) | (out.doc_b != 2)]
    assert len(others) == 0, others


def test_coverage_on_planted_corpus(spark, planted_dir):
    """dedup_substring_coverage over the planted corpus: the two docs
    sharing the boilerplate show a covered region inside the planted
    run's extent; the unrelated docs show exactly zero.  Plus the
    structural invariants: covered ≤ len, covered ≥ the single longest
    span (a union can only grow), merged regions ≤ raw spans."""
    from rapidocr_spark.functions.dedup import (
        dedup_substring_coverage,
    )

    sf_dir, boiler, rows = planted_dir
    spans = dedup_substring_spans(spark, sf_dir).toPandas()
    cov = dedup_substring_coverage(spark, sf_dir).toPandas().set_index("doc_id")
    assert cov.loc[3].covered_chars == 0 and cov.loc[4].covered_chars == 0
    assert cov.loc[3].n_spans == 0 and not cov.loc[3].dup_frac
    for doc, scol, ecol in ((1, "a_start", "a_end"), (2, "b_start", "b_end")):
        row = cov.loc[doc]
        longest = int((spans[ecol] - spans[scol] + 1).max())
        assert 0 < row.covered_chars <= row.len_chars
        assert row.covered_chars >= longest
        assert row.n_regions <= row.n_spans
        assert abs(row.dup_frac - row.covered_chars / row.len_chars) < 1e-12
