"""End-to-end single-node goldens — the engine analog of the reference's
test_all_ort.py assertions (SURVEY.md §5)."""

from __future__ import annotations

import pytest

from rapidocr_spark.config import DEFAULT_CONFIG
from rapidocr_spark.kernels.oracle import extract_bitmap, extract_turn
from rapidocr_spark.kernels.render import render_lines
from rapidocr_spark.kernels.codec import encode_bitmap
from rapidocr_spark.sources.transcripts import (
    GOLDEN_CH_EN_NUM_FIRST,
    GOLDEN_DET_NBOXES,
    GOLDEN_HTML_MAIN,
    GOLDEN_REC_TEXT,
    payload_for,
)

CFG = DEFAULT_CONFIG.replace(det_limit_side_len=32)


def test_golden_ch_en_num_17_results_first_line():
    """test_all_ort.py:22-27 → 17 results, first text '正品促销'."""
    r = extract_turn(payload_for(0, 0), CFG)
    assert r["n_boxes"] == 17
    assert r["spans"][0]["text"] == GOLDEN_CH_EN_NUM_FIRST
    assert r["extracted_text"].split("\n")[0] == GOLDEN_CH_EN_NUM_FIRST


def test_golden_det_18_boxes():
    """test_det.py:28 → dt_boxes.shape == (18, 4, 2)."""
    r = extract_turn(payload_for(0, 1), CFG)
    assert r["n_boxes"] == GOLDEN_DET_NBOXES
    assert all(len(s["box"]) == 4 and len(s["box"][0]) == 2 for s in r["spans"])


def test_golden_rec_line_via_skip_det():
    """test_rec.py:29 → '韩国小馆'; strip height ≤ min_height takes F1."""
    r = extract_turn(payload_for(0, 2), CFG)
    assert r["extracted_text"] == GOLDEN_REC_TEXT
    assert r["n_boxes"] == 1


def test_golden_cls_rotated_turn_decodes():
    """test_cls.py:30 → 180° content still decodes after the cls gate."""
    upright = extract_turn(encode_bitmap(render_lines(["RotMe42", "Line2x"])), CFG)
    rotated = extract_turn(
        encode_bitmap(render_lines(["RotMe42", "Line2x"], rotate180=True)), CFG
    )
    assert rotated["extracted_text"] is not None
    # same lines, reading order reversed (the image is upside down, so the
    # last rendered line is detected first) — text content must match per line
    assert sorted(rotated["extracted_text"].split("\n")) == sorted(
        upright["extracted_text"].split("\n")
    )


def test_golden_noise_returns_none():
    """zeros-image analog (test_all_ort.py:38-41) → (None, None)."""
    r = extract_turn(payload_for(0, 4), CFG)
    assert r["spans"] is None and r["extracted_text"] is None and r["error"] is None


def test_golden_junk_payload_errors():
    """LoadImageError analog (test_all_ort.py:30-35) → error column."""
    r = extract_turn(payload_for(0, 5), CFG)
    assert r["error"] and "LoadImageError" in r["error"]


def test_golden_single_char_quirk():
    """single-char line: conf 0.98 → score 0.49 < text_score → dropped."""
    r = extract_turn(payload_for(0, 6), CFG)
    assert r["spans"] is None and r["extracted_text"] is None


def test_golden_html_main_content():
    r = extract_turn(payload_for(0, 7), CFG)
    assert r["extracted_text"] == GOLDEN_HTML_MAIN


def test_text_score_one_filters_everything():
    """test_all_ort.py:66-71 → text_score=1 ⇒ (None, None)."""
    cfg = CFG.replace(text_score=1.0)
    r = extract_turn(payload_for(0, 0), cfg)
    assert r["spans"] is None and r["extracted_text"] is None


def test_use_det_false_whole_image_box():
    """use_text_det=False takes the whole-image route (rapid_ocr_api.py:74)."""
    import numpy as np

    from rapidocr_spark.kernels.codec import decode_bitmap

    cfg = CFG.replace(use_det=False)
    payload = payload_for(0, 2)
    img = decode_bitmap(payload)
    r = extract_bitmap(img, cfg)
    h, w = img.shape
    assert r["spans"][0]["box"] == [[0.0, 0.0], [float(w), 0.0], [float(w), float(h)], [0.0, float(h)]]


def test_invalid_prefix_is_error_not_crash():
    r = extract_turn("garbage-payload-1", CFG)
    assert r["error"] is not None
    r2 = extract_turn(None, CFG)
    assert r2["error"] is not None


@pytest.mark.parametrize("conv", [1, 2, 3, 5, 8])
def test_bulk_payloads_never_crash(conv):
    for t in range(6):
        r = extract_turn(payload_for(conv, t), CFG)
        assert set(r) == {"spans", "extracted_text", "n_boxes", "n_chars", "error"}
