"""Bounded cache lifecycle for multi-query sessions (ADVICE r02 item 3).

Query functions persist multi-consumer intermediates (signature frames,
cell assignments, generated corpora) so one query never recomputes them —
but the driver's correctness gate and bench.py run DOZENS of queries in
one SparkSession, and untracked caches would accumulate across queries,
evicting each other or pressuring executor storage memory.

The contract: every query-lifetime ``.persist()`` goes through
``track_persist`` (or ``track`` for frames persisted elsewhere), and the
registry wrapper (plans.shell._utc) calls ``release_tracked()`` BEFORE
building the next query — so at any moment only the current query's
caches are live.  Releasing is correctness-neutral: an unpersisted frame
recomputes from lineage if some holder consumes it later.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def track_persist(df: DataFrame) -> DataFrame:
    """persist() + register for release when the next query starts."""
    return track(df.persist())


def track(df: DataFrame) -> DataFrame:
    """Register an already-persisted frame for deferred release."""
    _TRACKED.append(df)
    return df


def release_tracked() -> int:
    """Unpersist every tracked frame (blocking=False); returns the count."""
    n = len(_TRACKED)
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist()
        except Exception:  # noqa: BLE001 — session may already be gone
            pass
    return n
