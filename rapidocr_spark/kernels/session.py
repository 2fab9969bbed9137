"""Per-executor inference sessions — the S5/S6 seam made real.

The reference builds one ONNX InferenceSession per model and caches it
(/root/reference/python/rapidocr_onnxruntime/utils.py:21-88;
ocrweb_multi/rapidocr/main.py:15-19 lru_cache registry).  The engine's
analog is a session object created once per executor process from the
frozen config plus (for the real backend) model bytes shipped via a Spark
broadcast variable — executors never touch a filesystem path:

- ``SyntheticSession``: the in-sandbox deterministic kernels (glyph bank
  warmed once per process); normative for tests/benchmarks because this
  environment ships no model weights.
- ``OnnxSession``: loads ``onnxruntime`` behind an availability-guarded
  import and builds a real InferenceSession from the broadcast bytes —
  the deploy path; swapping backends never touches the Spark plan.

Dispatch lives in ``make_session``; the per-executor cache keyed by config
is in operators/extract.py (_SESSIONS).
"""

from __future__ import annotations

from typing import Any

from ..config import PipelineConfig


class SyntheticSession:
    """Deterministic kernel-chain session: config + warmed glyph bank."""

    backend = "synthetic"

    def __init__(self, cfg: PipelineConfig):
        from .font import glyph_bank, packed_glyph_bank

        glyph_bank()         # warm the template bank once per executor
        packed_glyph_bank()  # and its packed popcount twin
        self.cfg = cfg


class OnnxSession:
    """Real onnxruntime session over broadcast model bytes.

    The import is availability-guarded so the engine carries no hard
    dependency: executors raise a clear error at session-build time (not a
    job-submit-time crash) if the package is absent."""

    backend = "onnx"

    def __init__(self, cfg: PipelineConfig, model_bytes: bytes | None):
        try:
            import onnxruntime  # type: ignore[import-not-found]
        except ImportError as exc:  # pragma: no cover - env-dependent
            raise RuntimeError(
                "backend='onnx' requires the onnxruntime package on every "
                "executor (pip install onnxruntime); this environment does "
                "not ship it — use backend='synthetic'"
            ) from exc
        if not model_bytes:
            raise ValueError("backend='onnx' needs model_bytes (broadcast)")
        so = onnxruntime.SessionOptions()
        self.session = onnxruntime.InferenceSession(
            model_bytes, sess_options=so, providers=["CPUExecutionProvider"]
        )
        self.cfg = cfg

    def run(self, inputs: dict[str, Any]):
        """Raw inference head — get_onnx_session(...).run analog."""
        return self.session.run(None, inputs)


def make_session(cfg: PipelineConfig, model_bytes: bytes | None = None):
    """Backend dispatch (one session per executor per config)."""
    if cfg.backend == "synthetic":
        return SyntheticSession(cfg)
    if cfg.backend == "onnx":
        return OnnxSession(cfg, model_bytes)
    raise ValueError(f"unknown backend {cfg.backend!r}")
