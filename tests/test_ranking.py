"""operators/ranking.py — the distributed total-order primitives must be
value-identical to the partition-less window forms they replace, on inputs
that exercise ties, skewed range partitions, empty partitions, and the
n < buckets edge of ntile."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from mapreduce_simulation_spark.operators.ranking import (
    with_distributed_cumsum,
    with_distributed_ntile,
    with_distributed_rank,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, v long")


@pytest.fixture(scope="module")
def tied(spark):
    # duplicate v values across the range so tie-breaks matter, plus a
    # heavy head so range partitions are skewed
    rows = [(i, (i * 7) % 13) for i in range(200)] + [
        (200 + i, 0) for i in range(50)
    ]
    return _df(spark, rows)


def test_rank_matches_global_window(spark, tied):
    order = [F.asc("v"), F.asc("k")]
    got = {
        r["k"]: r["rnk"]
        for r in with_distributed_rank(tied, order, "rnk", 8).collect()
    }
    want = {
        r["k"]: r["rnk"]
        for r in tied.withColumn(
            "rnk", F.row_number().over(Window.orderBy(*order))
        ).collect()
    }
    assert got == want


def test_rank_desc_order(spark, tied):
    order = [F.desc("v"), F.asc("k")]
    got = {
        r["k"]: r["rnk"]
        for r in with_distributed_rank(tied, order, "rnk", 8).collect()
    }
    want = {
        r["k"]: r["rnk"]
        for r in tied.withColumn(
            "rnk", F.row_number().over(Window.orderBy(*order))
        ).collect()
    }
    assert got == want


@pytest.mark.parametrize("buckets", [1, 3, 5, 7])
def test_ntile_matches_builtin(spark, tied, buckets):
    order = [F.asc("v"), F.asc("k")]
    got = {
        r["k"]: r["b"]
        for r in with_distributed_ntile(
            tied, order, buckets, "b", 8
        ).collect()
    }
    want = {
        r["k"]: r["b"]
        for r in tied.withColumn(
            "b", F.ntile(buckets).over(Window.orderBy(*order))
        ).collect()
    }
    assert got == want


def test_ntile_fewer_rows_than_buckets(spark):
    df = _df(spark, [(1, 10), (2, 5), (3, 7)])
    order = [F.asc("v"), F.asc("k")]
    got = {
        r["k"]: r["b"]
        for r in with_distributed_ntile(df, order, 5, "b", 4).collect()
    }
    want = {
        r["k"]: r["b"]
        for r in df.withColumn(
            "b", F.ntile(5).over(Window.orderBy(*order))
        ).collect()
    }
    assert got == want


@pytest.mark.parametrize("include_current", [True, False])
def test_cumsum_matches_global_window(spark, tied, include_current):
    order = [F.asc("v"), F.asc("k")]
    upper = 0 if include_current else -1
    w = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, upper)
    got = {
        r["k"]: r["c"]
        for r in with_distributed_cumsum(
            tied, order, "v", "c", include_current, 8
        ).collect()
    }
    want = {
        r["k"]: r["c"]
        for r in tied.withColumn(
            "c", F.coalesce(F.sum("v").over(w), F.lit(0))
        ).collect()
    }
    assert got == want


def test_empty_input(spark):
    df = _df(spark, []).where(F.lit(False))
    assert with_distributed_rank(df, [F.asc("k")], "r", 4).count() == 0
    assert with_distributed_ntile(df, [F.asc("k")], 3, "b", 4).count() == 0
    assert (
        with_distributed_cumsum(df, [F.asc("k")], "v", "c", True, 4).count()
        == 0
    )


def test_output_keeps_input_columns(spark, tied):
    out = with_distributed_ntile(tied, [F.asc("v"), F.asc("k")], 4, "b", 8)
    assert out.columns == ["k", "v", "b"]


def test_grouped_ntile_matches_partitioned_window(spark):
    from mapreduce_simulation_spark.operators.ranking import (
        with_distributed_grouped_ntile,
    )

    # skewed groups: one hot group with 200 rows, two small ones, plus a
    # group smaller than the bucket count (the q == 0 edge per group)
    rows = (
        [("hot", (i * 7) % 13, i) for i in range(200)]
        + [("mid", i % 5, 1000 + i) for i in range(23)]
        + [("tiny", i, 2000 + i) for i in range(2)]
    )
    df = spark.createDataFrame(rows, "grp string, v long, id long")
    order = [F.asc("v"), F.asc("id")]
    got = {
        r["id"]: r["b"]
        for r in with_distributed_grouped_ntile(
            df, ["grp"], order, 4, "b", 8
        ).collect()
    }
    w = Window.partitionBy("grp").orderBy(*order)
    want = {
        r["id"]: r["b"]
        for r in df.withColumn("b", F.ntile(4).over(w)).collect()
    }
    assert got == want


def test_grouped_ntile_partition_count_invariant(spark):
    from mapreduce_simulation_spark.operators.ranking import (
        with_distributed_grouped_ntile,
    )

    rows = [(f"g{i % 3}", (i * 11) % 17, i) for i in range(120)]
    df = spark.createDataFrame(rows, "grp string, v long, id long")
    order = [F.asc("v"), F.asc("id")]
    base = None
    for p in (1, 4, 16):
        got = {
            r["id"]: r["b"]
            for r in with_distributed_grouped_ntile(
                df, ["grp"], order, 5, "b", p
            ).collect()
        }
        if base is None:
            base = got
        assert got == base, f"bucket assignment changed at P={p}"


def test_release_tracked_clears_persisted_frames(spark, tied):
    """Each primitive registers its persisted frame with the caching
    tracker; release_tracked() after the consuming action unpersists them
    all, so a registry sweep does not accumulate corpus-sized cache
    entries. Values must be fully materialized BEFORE release (the
    embedded offset maps describe the persisted partitioning)."""
    from mapreduce_simulation_spark.operators.caching import (
        _SCOPES,
        release_tracked,
    )

    release_tracked()  # clean slate from earlier tests
    order = [F.asc("v"), F.asc("k")]
    ranked = with_distributed_rank(tied, order, "rk")
    tiled = with_distributed_ntile(tied, order, 4, "tile")
    rows = ranked.count() + tiled.count()
    assert rows == 2 * tied.count()
    # 4 registrations: the shared input is registered by BOTH primitives
    # (refcounted — the second sees it cached but still takes a
    # reference) plus each primitive's own partitioned frame.
    assert len(_SCOPES[-1]) == 4
    assert all(df.is_cached for df, _ in _SCOPES[-1])
    handles = [df for df, _ in _SCOPES[-1]]
    assert release_tracked() == 4
    assert _SCOPES[-1] == []
    assert all(not df.is_cached for df in handles)
    # double-release is a no-op
    assert release_tracked() == 0


def test_tracked_scope_isolates_queries(spark, tied):
    """Two interleaved tracked queries: releasing the first query's scope
    must not unpersist the second's still-unmaterialized offset-bearing
    frame (the ADVICE r6 failure mode — a global release would resample
    its range bounds and silently return wrong ranks)."""
    from mapreduce_simulation_spark.operators.caching import (
        _SCOPES,
        release_tracked,
        tracked_scope,
    )

    release_tracked()
    order = [F.asc("v"), F.asc("k")]
    with tracked_scope() as outer:
        outer_ranked = with_distributed_rank(tied, order, "rk")
        # input + partitioned frame
        assert len(outer) == 2
        with tracked_scope() as inner:
            inner_tiled = with_distributed_ntile(tied, order, 4, "tile")
            # tied is already cached by the outer scope; the inner
            # primitive still takes a refcounted reference on it plus
            # registers its own partitioned frame
            assert len(inner) == 2
            outer_ids = {id(df) for df, _ in outer}
            inner_parted = next(
                df for df, _ in inner if id(df) not in outer_ids
            )
            assert inner_tiled.count() == tied.count()
            # inner release sees only the inner scope.  The inner parted
            # frame shares a plan KEY with the outer's (both contain
            # monotonically_increasing_id, which hashes structurally),
            # so with group refcounting NOTHING is unpersisted yet — the
            # outer scope still references both keys; release is
            # conservatively late, never early
            assert release_tracked() == 2
            assert inner_parted.is_cached
            # outer frames untouched and still materializable correctly
            assert len(outer) == 2
            assert all(df.is_cached for df, _ in outer)
        handles = [df for df, _ in outer] + [inner_parted]
        ranks = {
            (r["k"], r["v"]): r["rk"] for r in outer_ranked.collect()
        }
        assert len(ranks) == tied.count()
    # scope exit released the outer frames
    assert all(not df.is_cached for df in handles)
    assert _SCOPES[-1] == []


def test_persist_tracked_skips_caller_cache(spark):
    """A frame the caller persisted intentionally is neither re-persisted
    nor registered — release never drops a cache this module didn't
    create."""
    from mapreduce_simulation_spark.operators.caching import (
        persist_tracked,
        release_tracked,
    )

    release_tracked()
    df = spark.range(10).persist()
    try:
        df.count()
        assert persist_tracked(df) is df
        assert release_tracked() == 0
        assert df.is_cached
    finally:
        df.unpersist()


def test_identical_plan_across_scopes_is_refcounted(spark):
    """The ADVICE r7 hazard: Spark's cache manager matches entries by
    canonicalized plan, so an identical-plan frame built independently in
    a SECOND tracked scope shares the first scope's cache entry.  The
    shared entry must survive until the LAST referencing scope releases —
    otherwise the second query's offset-bearing frame re-materializes
    with resampled range bounds after the first scope exits."""
    from mapreduce_simulation_spark.operators.caching import (
        _PLAN_REFS,
        persist_tracked,
        release_tracked,
        tracked_scope,
    )

    release_tracked()
    base = spark.range(100).selectExpr("id", "id % 7 AS k")
    with tracked_scope():
        a = persist_tracked(base.groupBy("k").count())
        a.count()
        with tracked_scope():
            # independently-built identical plan → same cache entry
            b = persist_tracked(base.groupBy("k").count())
            assert b.is_cached
            assert release_tracked() == 1
            # inner release must NOT drop the shared entry: the outer
            # scope still references the plan
            assert a.is_cached and b.is_cached
    # last reference released on outer scope exit
    assert not a.is_cached
    assert _PLAN_REFS == {}
