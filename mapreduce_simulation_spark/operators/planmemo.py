"""Per-session memo of constructed DataFrame PLANS (never results).

Plan construction is pure driver-side py4j traffic — each higher-order
function builds an unresolved lambda AST over several JVM round-trips, and
the ANN serve/audit plans were measured at 0.2-2 s of socket chatter per
call at sf0.1 (r17 cProfile: 5.6k py4j commands for one ann_recall_audit
build). A production service builds a query plan once and re-executes it;
these helpers give the repeated-call paths (micro-batch serves, the bench's
repeat runs, the audit's per-variant sub-plans) the same shape.

DataFrames are immutable logical plans, so reuse is safe — the
``tables._DF_CACHE`` / ``staging.read_staged`` precedent (r14), one level
up. Staleness is guarded by OBJECT IDENTITY of the signature-guarded
upstream caches: ``deps`` must list every ``load_table`` /``read_staged``
DataFrame the plan was built from; a fixture overwrite or staged-artifact
rebuild moves the dataset signature, those caches return NEW DataFrame
objects, the identity check fails, and the plan is rebuilt (pinned by
test_streaming_lsh_serve_survives_index_restaging for the serve path).

Plans only, never results: every execution still scans the parquet inputs
— nothing here persists rows, so the bench's no-result-caching contract is
untouched.
"""

from __future__ import annotations

import weakref
from typing import Callable, Iterable

from pyspark.sql import DataFrame, SparkSession

_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict]" = (
    weakref.WeakKeyDictionary()
)


def plan_memo(
    spark: SparkSession,
    key: tuple,
    deps: Iterable[DataFrame],
    build: Callable[[], DataFrame],
) -> DataFrame:
    """Return the memoized plan for ``key`` when every dep is the SAME
    object as at build time; otherwise run ``build`` and re-memoize.

    ``deps`` must enumerate every signature-guarded upstream DataFrame
    (``load_table`` fixtures, ``read_staged`` artifacts) the built plan
    reads — identity of those objects is the staleness signal."""
    from ..tables import _evict_stopped_sessions

    _evict_stopped_sessions(_CACHE)
    per_session = _CACHE.setdefault(spark, {})
    deps = tuple(deps)
    hit = per_session.get(key)
    if (
        hit is not None
        and len(hit[0]) == len(deps)
        and all(a is b for a, b in zip(hit[0], deps))
    ):
        return hit[1]
    df = build()
    per_session[key] = (deps, df)
    return df
