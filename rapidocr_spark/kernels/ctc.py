"""CTC greedy decode — K10, vectorised numpy.

Semantics match CTCLabelDecode.decode with is_remove_duplicate=True
(/root/reference/python/rapidocr_onnxruntime/ch_ppocr_v3_rec/utils.py:50-75):

- argmax class per time step (A6),
- keep a position iff its class is not blank (index 0) AND it differs from
  the class at the immediately preceding raw position (repeat collapse),
- text = kept chars joined; score = np.mean(conf_list + [1e-50]) — the
  1e-50 is APPENDED, i.e. score = sum(conf)/(n+1).  This faithful quirk
  means a single-character line at conf<1.0 scores <0.5 and is dropped by
  the text_score filter (F7) — covered by tests.
"""

from __future__ import annotations

import numpy as np

from .font import CHARSET


def ctc_greedy_decode(
    probs: np.ndarray, charset: list[str] | None = None, with_chars: bool = False
) -> tuple:
    """(T, n_classes) probability matrix → (text, score).

    ``with_chars=True`` appends the per-kept-character confidences as a
    third element (list[float], one per character of ``text``) — the .NET
    port's per-char score surface (dotnet OcrResult.cs:41-68 text block
    char scores filled by CrnnNet.cs:114-146 from the same argmax-max
    confidences this keeps in ``kept_conf``)."""
    charset = charset if charset is not None else CHARSET
    if probs.shape[0] == 0:
        empty_score = float(np.mean([1e-50]))
        return ("", empty_score, []) if with_chars else ("", empty_score)
    idx = probs.argmax(axis=1)
    conf = probs.max(axis=1)
    keep = idx != 0
    keep[1:] &= idx[1:] != idx[:-1]
    kept_idx = idx[keep]
    kept_conf = conf[keep]
    text = "".join(charset[int(i)] for i in kept_idx)
    score = float((kept_conf.sum() + 1e-50) / (kept_conf.size + 1))
    if with_chars:
        return text, score, [float(c) for c in kept_conf]
    return text, score
