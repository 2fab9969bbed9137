"""S5/S6 session seam: synthetic ⇔ onnx dispatch, broadcast-bytes loading,
availability-guarded import (VERDICT r01 item 9)."""

from __future__ import annotations

import sys
import types

import pandas as pd
import pytest

from rapidocr_spark.config import DEFAULT_CONFIG
from rapidocr_spark.kernels.session import OnnxSession, SyntheticSession, make_session
from rapidocr_spark.operators import extract as extract_mod


def test_default_backend_is_synthetic():
    sess = make_session(DEFAULT_CONFIG)
    assert isinstance(sess, SyntheticSession)
    assert sess.cfg is DEFAULT_CONFIG


def test_onnx_backend_without_package_raises_clearly():
    cfg = DEFAULT_CONFIG.replace(backend="onnx")
    assert "onnxruntime" not in sys.modules  # the container ships none
    with pytest.raises(RuntimeError, match="onnxruntime"):
        make_session(cfg, model_bytes=b"model")


def test_unknown_backend_rejected():
    with pytest.raises(ValueError, match="backend"):
        make_session(DEFAULT_CONFIG.replace(backend="tensor-what"))


@pytest.fixture
def fake_onnxruntime(monkeypatch):
    """A stub onnxruntime module recording what the session loads."""
    created = {}

    class FakeInferenceSession:
        def __init__(self, model_bytes, sess_options=None, providers=None):
            created["model_bytes"] = model_bytes
            created["providers"] = providers

        def run(self, outs, inputs):
            return [inputs]

    mod = types.ModuleType("onnxruntime")
    mod.InferenceSession = FakeInferenceSession
    mod.SessionOptions = lambda: None
    monkeypatch.setitem(sys.modules, "onnxruntime", mod)
    return created


def test_onnx_session_loads_broadcast_bytes(fake_onnxruntime):
    cfg = DEFAULT_CONFIG.replace(backend="onnx")
    sess = make_session(cfg, model_bytes=b"\x08onnx-model-bytes")
    assert isinstance(sess, OnnxSession)
    assert fake_onnxruntime["model_bytes"] == b"\x08onnx-model-bytes"
    assert fake_onnxruntime["providers"] == ["CPUExecutionProvider"]
    assert sess.run({"x": 1}) == [{"x": 1}]


def test_onnx_session_requires_bytes(fake_onnxruntime):
    cfg = DEFAULT_CONFIG.replace(backend="onnx")
    with pytest.raises(ValueError, match="model_bytes"):
        make_session(cfg, model_bytes=None)


class _Bc:
    """Broadcast stand-in (the heavy stage only reads .value)."""

    def __init__(self, v):
        self.value = v


def test_heavy_stage_dispatches_onnx_session(fake_onnxruntime, monkeypatch):
    """The fused stage builds the session from (config, broadcast bytes):
    run the mapInPandas generator directly — it is a plain function."""
    monkeypatch.setattr(extract_mod, "_SESSIONS", {})
    cfg = DEFAULT_CONFIG.replace(backend="onnx")
    run = extract_mod._heavy_stage(cfg, _Bc(b"weights!"))
    batch = pd.DataFrame(
        {
            "conv_id": ["c0"], "turn_idx": [0], "role": ["user"], "tool": [""],
            "kind": ["plain"], "skip_det": [""], "text": ["plain:hi"],
        }
    )
    out = list(run(iter([batch])))
    assert fake_onnxruntime["model_bytes"] == b"weights!"
    assert len(out) == 1 and out[0]["extracted_text"].tolist() == ["hi"]
    sess = next(iter(extract_mod._SESSIONS.values()))
    assert isinstance(sess, OnnxSession)


def test_heavy_stage_default_synthetic(monkeypatch):
    monkeypatch.setattr(extract_mod, "_SESSIONS", {})
    run = extract_mod._heavy_stage(DEFAULT_CONFIG, None)
    batch = pd.DataFrame(
        {
            "conv_id": ["c0"], "turn_idx": [0], "role": ["user"], "tool": [""],
            "kind": ["plain"], "skip_det": [""], "text": ["plain:hi"],
        }
    )
    list(run(iter([batch])))
    sess = next(iter(extract_mod._SESSIONS.values()))
    assert isinstance(sess, SyntheticSession)
