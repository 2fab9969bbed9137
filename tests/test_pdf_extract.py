"""PDF-style layout parse kernel (north rule: "PDF/layout parse")."""

from __future__ import annotations

from rapidocr_spark.kernels.oracle import extract_turn
from rapidocr_spark.kernels.pdf_extract import (
    assemble_reading_order, extract_pdf_layout, parse_runs,
)
from rapidocr_spark.plans.shell import EXTRACT_CFG
from rapidocr_spark.sources.transcripts import GOLDEN_PDF, GOLDEN_PDF_MAIN, payload_for


def test_parse_runs_and_escapes():
    runs = parse_runs(r"BT 10 20 Td (a \(b\) \\c) Tj ET")
    assert runs == [(10.0, 20.0, "a (b) \\c")]


def test_reading_order_same_line_tolerance():
    # two runs 3 units apart in y = one visual line, ordered by x;
    # third run far below = next line (mirrors W1's Δy discipline)
    runs = [(300.0, 698.0, "right"), (72.0, 700.0, "left"), (72.0, 600.0, "below")]
    assert assemble_reading_order(runs) == "left right\nbelow"


def test_golden_pdf_turn():
    assert extract_pdf_layout(GOLDEN_PDF) == GOLDEN_PDF_MAIN
    r = extract_turn(payload_for(0, 8), EXTRACT_CFG)
    assert r["extracted_text"] == GOLDEN_PDF_MAIN and r["error"] is None


def test_malformed_pdf_degrades():
    assert extract_pdf_layout("BT 1 2 Td (unclosed") == ""
    r = extract_turn("pdf:garbage with no operators", EXTRACT_CFG)
    assert r["extracted_text"] == "" and r["error"] is None
