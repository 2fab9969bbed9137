"""Connector surface: the same transcript corpus read back through
parquet, JSON-lines and CSV must be row-identical — and the extraction
operator must produce identical results over each (the plan is
format-agnostic past the scan)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rapidocr_spark.operators.extract import extract_transcripts
from rapidocr_spark.plans.shell import EXTRACT_CFG
from rapidocr_spark.sources.reader import read_transcripts, write_transcripts
from rapidocr_spark.sources.transcripts import transcripts_df

N_CONVS = 6


@pytest.fixture(scope="module")
def corpus_paths(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("reader")
    df = transcripts_df(spark, N_CONVS)
    paths = {}
    for fmt in ("parquet", "orc", "json", "csv"):
        p = str(base / fmt)
        write_transcripts(df, p, fmt=fmt)
        paths[fmt] = p
    return paths


def _canon(df):
    return sorted(
        (
            r["conv_id"],
            r["turn_idx"],
            r["role"],
            r["text"],
            r["tool"],
            r["ts"].isoformat(),
        )
        for r in df.collect()
    )


def test_formats_round_trip_identically(spark, corpus_paths):
    ref = _canon(read_transcripts(spark, corpus_paths["parquet"], "parquet"))
    assert len(ref) > 0
    for fmt in ("orc", "json", "csv"):
        got = _canon(read_transcripts(spark, corpus_paths[fmt], fmt))
        assert got == ref, fmt


def test_extraction_is_format_agnostic(spark, corpus_paths):
    outs = {}
    for fmt in ("parquet", "json", "csv"):
        df = read_transcripts(spark, corpus_paths[fmt], fmt)
        res = extract_transcripts(df, EXTRACT_CFG).select(
            "conv_id", "turn_idx", "extracted_text", "n_boxes", "n_chars", "error"
        )
        outs[fmt] = sorted(tuple(r) for r in res.collect())
    assert outs["parquet"] == outs["json"] == outs["csv"]
    assert len(outs["parquet"]) > 0


def test_unknown_format_rejected(spark, corpus_paths):
    with pytest.raises(ValueError, match="format"):
        read_transcripts(spark, corpus_paths["parquet"], "avro-ish")


def test_schema_is_enforced_not_inferred(spark, corpus_paths):
    df = read_transcripts(spark, corpus_paths["json"], "json")
    assert [f.name for f in df.schema.fields] == [
        "conv_id", "turn_idx", "role", "text", "tool", "ts",
    ]
    assert df.schema["turn_idx"].dataType.simpleString() == "int"
    assert df.schema["ts"].dataType.simpleString() == "timestamp"
