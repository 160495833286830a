"""Query-scoped tracked persists.

Several operators persist an intermediate frame because a later LITERAL in
the returned plan was computed from that exact materialization — the
distributed-rank family embeds (partition → prefix offset) maps derived
from one range-partitioned layout (operators/ranking.py), BM25/perplexity
/DSIR persist the tokenized corpus consumed by two passes, etc.  Those
persists must stay alive until the LAST action that consumes the returned
plan: re-executing the sub-plan resamples the range bounds (a fresh RDD id
seeds the range sampler differently), and the embedded offset map would
then describe a partitioning that no longer exists.  So the primitives can
NEVER unpersist eagerly; instead each persist is registered here and
released at a safe boundary — after a query's results are fully collected
(bench / verify / sweep loops call :func:`release_tracked` between
queries).

Without release, a long-lived session sweeping the registry accumulates
one cached corpus-scale frame per ranking-family query (the "Asked to
cache already cached data" warnings in earlier bench logs).  The executor
cache is LRU with disk spill, so this degrades rather than breaks — but a
sweep should not rely on eviction for hygiene.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def persist_tracked(df: DataFrame) -> DataFrame:
    """Persist ``df`` (skipping the no-op double-persist that logs a
    CacheManager warning) and register it for a later release."""
    if not df.is_cached:
        df.persist()
    _TRACKED.append(df)
    return df


def release_tracked(blocking: bool = False) -> int:
    """Unpersist every tracked frame; returns how many were released.

    Call ONLY at a boundary where all results derived from tracked frames
    have been fully materialized (collected/written) — after unpersist the
    embedded offset literals no longer match a re-executed sub-plan.
    """
    n = 0
    while _TRACKED:
        _TRACKED.pop().unpersist(blocking)
        n += 1
    return n
