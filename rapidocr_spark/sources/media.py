"""Deterministic multimodal fixture corpus (media blobs).

Same construction discipline as the transcript corpus: every blob is a
pure function of (MEDIA_SEED, media_id), generation fans out over
``spark.range`` → ``mapInPandas`` (no driver materialisation), and the
driver oracle reads a committed expected-result parquet produced by the
same codec functions run eagerly (fixtures/, scripts/make_fixtures.py).

Mix: single-frame images, multi-frame videos, audio blobs (header reuse:
width=sample_rate/100, height=channels), and junk blobs that must decode
to ok=false without crashing the job.
"""

from __future__ import annotations

import hashlib
from decimal import ROUND_HALF_UP, Decimal

import numpy as np
import pandas as pd

from ..functions.multimodal import encode_media_blob


def _r6(x: float) -> float:
    """Spark-compatible round(x, 6): Spark rounds doubles HALF_UP over the
    shortest decimal repr (BigDecimal.valueOf), python round() is
    HALF_EVEN — they differ exactly on ties like 0.0703125."""
    return float(Decimal(repr(float(x))).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP))

MEDIA_SEED = 4242
N_FIXTURE_MEDIA = 60

MEDIA_FIXTURE = "expected_media_c60.parquet"
FRAMES_FIXTURE = "expected_frames_c60.parquet"

MEDIA_SCHEMA = "media_id long, kind string, blob binary"


def _rng(media_id: int) -> np.random.Generator:
    h = hashlib.sha256(f"media|{MEDIA_SEED}|{media_id}".encode()).digest()
    return np.random.default_rng(int.from_bytes(h[:8], "big"))


def media_row(media_id: int) -> tuple[int, str, bytes]:
    rng = _rng(media_id)
    sel = media_id % 10
    if sel < 4:  # image
        w = int(rng.integers(16, 257))
        h = int(rng.integers(16, 257))
        return media_id, "image", encode_media_blob("img", w, h, 1, int(rng.integers(1 << 30)))
    if sel < 7:  # video
        w = int(rng.integers(32, 129))
        h = int(rng.integers(32, 129))
        n = int(rng.integers(2, 13))
        return media_id, "video", encode_media_blob("vid", w, h, n, int(rng.integers(1 << 30)))
    if sel < 9:  # audio: width=sample_rate/100, height=channels
        sr = int(rng.choice([80, 160, 441, 480]))
        ch = int(rng.integers(1, 3))
        return media_id, "audio", encode_media_blob("aud", sr, ch, 1, int(rng.integers(1 << 30)))
    # junk: random bytes, wrong magic → ok=false path
    return media_id, "junk", bytes(rng.integers(0, 256, size=int(rng.integers(4, 64)), dtype=np.uint8))


def media_pandas(n: int) -> pd.DataFrame:
    rows = [media_row(i) for i in range(n)]
    return pd.DataFrame(rows, columns=["media_id", "kind", "blob"])


def expected_media_pandas(n: int) -> pd.DataFrame:
    """Eager mirror of decode_media/media_features/resize_images over the
    fixture corpus — the committed driver-oracle columns."""
    from ..functions.multimodal import FEATURE_DIM, HEADER_SIZE, _decode_header

    rows = []
    for media_id, kind, blob in (media_row(i) for i in range(n)):
        hdr = _decode_header(blob)
        if hdr is None:
            rows.append((media_id, None, None, None, None, False, None, None, None))
            continue
        fmt, w, h, nf = hdr
        body = np.frombuffer(blob[HEADER_SIZE:], dtype=np.uint8)
        hist = np.bincount(body % FEATURE_DIM, minlength=FEATURE_DIM).astype(np.float32)
        total = float(hist.sum()) or 1.0
        feats = (hist / total).tolist()
        f0 = _r6(feats[0])
        f_max = _r6(max(feats))
        payload_len = len(blob) - HEADER_SIZE
        rows.append((media_id, fmt, w, h, nf, True, f0, f_max, payload_len))
    out = pd.DataFrame(
        rows,
        columns=[
            "media_id", "format", "width", "height", "n_frames", "ok",
            "f0", "f_max", "payload_len",
        ],
    )
    for c in ("width", "height", "n_frames", "payload_len"):
        out[c] = out[c].astype("Int32")
    return out


def expected_frames_pandas(n: int, every_n: int = 2) -> pd.DataFrame:
    """Eager mirror of sample_frames(every_n) over the fixture corpus."""
    from ..functions.multimodal import _decode_header

    rows = []
    for media_id, _kind, blob in (media_row(i) for i in range(n)):
        hdr = _decode_header(blob)
        if hdr is None:
            continue
        _fmt, w, h, nf = hdr
        if nf <= 0:
            continue
        for fi in range(0, nf, every_n):
            rows.append((media_id, fi, w, h))
    out = pd.DataFrame(rows, columns=["media_id", "frame_idx", "width", "height"])
    for c in ("frame_idx", "width", "height"):
        out[c] = out[c].astype("int32")
    return out


def media_df(spark, n: int):
    """Distributed generation — one task per id-range partition."""

    def gen(batches):
        for pdf in batches:
            yield pd.DataFrame(
                [media_row(int(i)) for i in pdf["id"].tolist()],
                columns=["media_id", "kind", "blob"],
            )

    n_parts = max(1, min(n, int(spark.sparkContext.defaultParallelism)))
    return spark.range(0, n, numPartitions=n_parts).mapInPandas(gen, schema=MEDIA_SCHEMA)
