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
(bench / verify / sweep loops call :func:`release_tracked` or wrap each
query in :func:`tracked_scope`).

Scoping model: registrations go to the INNERMOST active scope.  A flat
loop that builds → collects → releases one query at a time needs no scope
(the module-level default scope plus ``release_tracked()`` between queries
is exactly per-query scoping).  A caller that interleaves two tracked
queries — builds both, then collects the first — must wrap each build +
collect in ``with tracked_scope():`` so releasing one query cannot
unpersist the other's still-unmaterialized offset-bearing frame.

Only frames persisted BY this module are tracked: if the caller already
persisted a frame intentionally, ``persist_tracked`` leaves both the
storage level and the ownership with the caller, so a release here never
drops a cache it did not create.

Without release, a long-lived session sweeping the registry accumulates
one cached corpus-scale frame per ranking-family query (the "Asked to
cache already cached data" warnings in earlier bench logs).  The executor
cache is LRU with disk spill, so this degrades rather than breaks — but a
sweep should not rely on eviction for hygiene.
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Iterator

from pyspark.sql import DataFrame

# Stack of scopes; the bottom entry is the module-default scope used when
# no tracked_scope() is active. Single-threaded by design (one driver).
_SCOPES: list[list[DataFrame]] = [[]]


def persist_tracked(df: DataFrame) -> DataFrame:
    """Persist ``df`` and register it with the innermost scope for a later
    release.  Frames that are ALREADY cached (a caller's intentional
    persist, or an identical-plan frame tracked earlier in this scope) are
    returned untouched and not registered — this module only releases what
    it persisted, never a cache it does not own."""
    if df.is_cached:
        return df
    df.persist()
    _SCOPES[-1].append(df)
    return df


@contextmanager
def tracked_scope(blocking: bool = False) -> Iterator[list[DataFrame]]:
    """Scope tracked persists to one query: frames registered inside the
    ``with`` block are unpersisted on exit, and an inner
    ``release_tracked()`` can only see this scope — never an outer query's
    frames."""
    frames: list[DataFrame] = []
    _SCOPES.append(frames)
    try:
        yield frames
    finally:
        _SCOPES.pop()
        while frames:
            frames.pop().unpersist(blocking)


def release_tracked(blocking: bool = False) -> int:
    """Unpersist every frame of the INNERMOST scope; returns how many were
    released.

    Call ONLY at a boundary where all results derived from tracked frames
    have been fully materialized (collected/written) — after unpersist the
    embedded offset literals no longer match a re-executed sub-plan.
    """
    frames = _SCOPES[-1]
    n = 0
    while frames:
        frames.pop().unpersist(blocking)
        n += 1
    return n
