"""Bounded cache discipline for lazy query plans.

Several operators persist an intermediate that their returned plan consumes
more than once (LSH band tables, shingle frames, iteration labels). The
consuming action happens OUTSIDE the builder — the driver collects the
returned DataFrame later — so the builder cannot unpersist in a
try/finally without forfeiting the reuse it persisted for.

Instead every such persist is registered here, and the registry's query
wrapper calls :func:`release_tracked` before building the NEXT query: by
then the previous query's action has completed, so its caches are dead
weight. This bounds cached-block accumulation across a long driver
session running the full 100+-query suite (the round-1 bench log showed
BlockManager re-add warnings from exactly this accumulation).

Correctness never depends on a cache — an early release at worst
recomputes a deterministic plan — so releasing is always safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def tracked_persist(df: DataFrame) -> DataFrame:
    """``df.persist()`` plus registration for end-of-query release."""
    df = df.persist()
    _TRACKED.append(df)
    return df


def release_tracked() -> None:
    """Unpersist every tracked frame (no-op for already-released ones);
    swallow errors from frames whose session has been stopped."""
    while _TRACKED:
        try:
            _TRACKED.pop().unpersist()
        except Exception:
            pass
