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
# Each registration is (frame, plan_key).
_SCOPES: list[list[tuple[DataFrame, int]]] = [[]]

# plan_key → number of live tracked registrations across ALL scopes.
# Spark's cache manager matches cache entries by CANONICALIZED plan, not
# by DataFrame identity: two independently-built identical-plan frames
# share ONE cache entry, and ``df.is_cached`` answers for the plan, not
# the object.  Without this refcount, an identical-plan offset-bearing
# frame built in a second tracked scope would see is_cached=True, skip
# registration, and silently depend on a cache owned by the FIRST scope —
# when that scope releases, the second query's repartitionByRange
# re-samples range bounds on materialization and its embedded offsets go
# stale (the interleaved-query hazard tracked_scope exists to prevent).
# With it, every tracked registration holds a reference and the cache
# entries under a key are only unpersisted when the LAST referencing
# scope releases.
#
# The key is the analyzed plan's semanticHash — a structural hash, NOT
# the cache manager's sameResult equivalence: plans containing
# nondeterministic expressions (monotonically_increasing_id in the
# ranking primitives) hash equal but are never sameResult, so each
# persist of such a plan creates its OWN cache entry under a shared key.
# _KEY_FRAMES therefore keeps every registered frame per key and a
# zero-refcount release unpersists them ALL: distinct entries grouped by
# a shared key are released at the LAST referencing scope's exit —
# conservatively late, never early (the direction that preserves the
# embedded-offset invariant).
_PLAN_REFS: dict[int, int] = {}
_KEY_FRAMES: dict[int, list[DataFrame]] = {}


def _plan_key(df: DataFrame) -> int:
    """Key grouping a frame with the cache entry (or entries — see module
    note on nondeterministic plans) its plan may share: the semantic hash
    of the canonicalized analyzed plan."""
    return df._jdf.queryExecution().analyzed().semanticHash()


def persist_tracked(df: DataFrame) -> DataFrame:
    """Persist ``df`` and register it with the innermost scope for a later
    release.

    A frame whose plan is already cached is registered (refcounted)
    ONLY when this module created a cache entry under the same plan key —
    a caller's own intentional persist stays untracked, so a release here
    never drops a cache it did not create."""
    # Tracked persists are released per query, so any plan built around
    # one must never be memoized (see planmemo module note).
    from .planmemo import taint

    taint()
    key = _plan_key(df)
    if df.is_cached:
        if key not in _PLAN_REFS:
            return df  # caller-owned cache; ownership stays with caller
    else:
        df.persist()
    _PLAN_REFS[key] = _PLAN_REFS.get(key, 0) + 1
    _KEY_FRAMES.setdefault(key, []).append(df)
    _SCOPES[-1].append((df, key))
    return df


def _release_one(key: int, blocking: bool) -> None:
    left = _PLAN_REFS.get(key, 1) - 1
    if left <= 0:
        _PLAN_REFS.pop(key, None)
        for df in _KEY_FRAMES.pop(key, []):
            df.unpersist(blocking)
    else:
        _PLAN_REFS[key] = left


@contextmanager
def tracked_scope(blocking: bool = False) -> Iterator[list[tuple[DataFrame, int]]]:
    """Scope tracked persists to one query: frames registered inside the
    ``with`` block are released on exit (unpersisted only when no other
    scope still references the same plan), and an inner
    ``release_tracked()`` can only see this scope — never an outer query's
    frames."""
    frames: list[tuple[DataFrame, int]] = []
    _SCOPES.append(frames)
    try:
        yield frames
    finally:
        _SCOPES.pop()
        while frames:
            _df, key = frames.pop()
            _release_one(key, blocking)


def release_tracked(blocking: bool = False) -> int:
    """Release every registration of the INNERMOST scope (unpersisting
    each plan's cache entry only when no other scope still references
    it); returns how many registrations were released.

    Call ONLY at a boundary where all results derived from tracked frames
    have been fully materialized (collected/written) — after unpersist the
    embedded offset literals no longer match a re-executed sub-plan.
    """
    frames = _SCOPES[-1]
    n = 0
    while frames:
        _df, key = frames.pop()
        _release_one(key, blocking)
        n += 1
    return n
