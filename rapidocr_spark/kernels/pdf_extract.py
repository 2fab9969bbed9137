"""PDF-style layout parse — the north rule's "PDF/layout parse" half.

Payloads tagged ``pdf:`` carry a minimal PDF-content-stream-like text
(the subset of text-showing operators that position and emit strings):

    BT <x> <y> Td (escaped text) Tj ET

Extraction = positioned text runs assembled in reading order, with the
same same-line tolerance discipline as the bitmap path's sorted_boxes
(W1, rapid_ocr_api.py:152-174): runs whose baselines differ by less than
LINE_TOL units belong to one visual line (PDF y grows upward, so reading
order is descending y, then ascending x); same-line runs join with a
space, lines join with '\n'.

Escapes handled per PDF string syntax: \\( \\) \\\\ \\n \\t.
Malformed payloads degrade to the empty extraction, never a crash.
"""

from __future__ import annotations

import re

LINE_TOL = 5.0

_RUN = re.compile(
    r"BT\s+(-?\d+(?:\.\d+)?)\s+(-?\d+(?:\.\d+)?)\s+Td\s*"
    r"\(((?:\\.|[^\\()])*)\)\s*Tj\s*ET"
)
_ESC = {"n": "\n", "t": "\t", "r": "\r", "(": "(", ")": ")", "\\": "\\"}


def _unescape(s: str) -> str:
    out: list[str] = []
    i = 0
    while i < len(s):
        c = s[i]
        if c == "\\" and i + 1 < len(s):
            out.append(_ESC.get(s[i + 1], s[i + 1]))
            i += 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


def parse_runs(body: str) -> list[tuple[float, float, str]]:
    """content stream → [(x, y, text)] in stream order."""
    return [
        (float(m.group(1)), float(m.group(2)), _unescape(m.group(3)))
        for m in _RUN.finditer(body)
    ]


def assemble_reading_order(runs: list[tuple[float, float, str]]) -> str:
    """Descending-y line grouping with LINE_TOL, ascending-x within a line
    (the PDF-coordinates mirror of W1's Δy<10 bubble discipline)."""
    if not runs:
        return ""
    ordered = sorted(runs, key=lambda r: (-r[1], r[0]))
    lines: list[list[tuple[float, float, str]]] = [[ordered[0]]]
    for run in ordered[1:]:
        if abs(run[1] - lines[-1][-1][1]) < LINE_TOL:
            lines[-1].append(run)
        else:
            lines.append([run])
    out_lines = []
    for line in lines:
        line.sort(key=lambda r: r[0])
        text = " ".join(r[2].strip() for r in line if r[2].strip())
        if text:
            out_lines.append(text)
    return "\n".join(out_lines)


def extract_pdf_layout(body: str) -> str:
    try:
        return assemble_reading_order(parse_runs(body))
    except Exception:  # noqa: BLE001 — malformed streams degrade
        return ""
