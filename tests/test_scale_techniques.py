"""Scale techniques the 100 TB deployment leans on, demonstrated and
asserted on plans: bucketed co-located joins (no exchange), hive-style
partitioned writes with partition pruning, and AQE behavior."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreduce_simulation_spark.tables import load_table


def test_bucketed_join_eliminates_exchange(spark, sf_dir):
    """Pre-bucketing both join sides on the key removes the per-query
    shuffle: the sort-merge join reads co-located buckets directly. This is
    the deployment lever for the recurring lineitem⋈orders join.
    (Uses the session's default warehouse dir — the conf is static.)"""
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").mode(
        "overwrite"
    ).saveAsTable("li_bucketed")
    orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").mode(
        "overwrite"
    ).saveAsTable("ord_bucketed")

    # disable auto-broadcast so the join would otherwise need an exchange
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("li_bucketed").join(
            spark.table("ord_bucketed"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "bucketed join must not shuffle"
        # sanity: result matches the plain join
        plain = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        assert joined.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS li_bucketed")
        spark.sql("DROP TABLE IF EXISTS ord_bucketed")


def test_partitioned_write_prunes_partitions(spark, sf_dir, tmp_path):
    """Hive-style partitioned layout (partitionBy event day) lets a
    day-filtered query read only matching directories — PartitionFilters in
    the scan, a fraction of the files touched."""
    out = str(tmp_path / "events_by_day")
    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.to_date("ts")
    )
    ev.write.partitionBy("day").mode("overwrite").parquet(out)

    back = spark.read.parquet(out)
    one_day = back.where(F.col("day") == "2024-01-03")
    plan = one_day._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(day" in plan
    want = ev.where(F.to_date("ts") == "2024-01-03").count()
    assert one_day.count() == want


def test_aqe_coalesces_small_shuffle_partitions(spark, sf_dir):
    """With AQE on, a 32-partition shuffle of tiny data coalesces at
    runtime — small-file behavior stays sane without manual tuning."""
    docs = load_table(spark, sf_dir, "documents")
    agg = docs.groupBy("lang").count()
    agg.collect()
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "AQEShuffleRead coalesced" in plan or "coalesced" in plan


def test_runtime_bloom_filter_prunes_probe_side(spark, sf_dir):
    """Runtime bloom-filter join pruning: when the build side of a shuffle
    join carries a selective predicate, Spark injects a bloom-filter
    aggregate on it and pushes `bloom_filter_might_contain` into the probe
    side's scan — at 100 TB this drops most of the fact table before the
    exchange instead of after the join. Demonstrated by forcing the shuffle
    join (no broadcast) and lowering the probe-size threshold the injection
    gates on; asserted on the optimized plan and on result equality with
    the filter disabled."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold",
        "0",
    )
    try:
        orders = (
            load_table(spark, sf_dir, "orders")
            .where(F.col("o_orderpriority") == "1-URGENT")
            .select("o_orderkey")
        )
        li = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_extendedprice"
        )
        joined = li.join(
            orders, F.col("l_orderkey") == F.col("o_orderkey")
        ).agg(F.count(F.lit(1)).alias("n"))
        plan = joined._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter_agg" in plan, "bloom filter not injected"
        assert "might_contain" in plan, "probe side not bloom-pruned"
        with_bloom = joined.collect()[0]["n"]

        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.enabled", "false"
        )
        plain = li.join(
            orders, F.col("l_orderkey") == F.col("o_orderkey")
        ).agg(F.count(F.lit(1)).alias("n"))
        assert "bloom_filter_agg" not in (
            plain._jdf.queryExecution().optimizedPlan().toString()
        )
        assert with_bloom == plain.collect()[0]["n"]
    finally:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.enabled", "true"
        )
        spark.conf.unset(
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold"
        )
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )


def test_observe_inflight_quality_metrics(spark, sf_dir):
    """`observe()` attaches data-quality metrics to a plan and reports
    them from the SAME pass that computes the query — at 100 TB the
    row-count/null-count audit would otherwise be a second full scan."""
    from pyspark.sql import Observation

    obs = Observation("quality")
    orders = load_table(spark, sf_dir, "orders").observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("o_totalprice").isNull().cast("int")).alias("null_price"),
        F.min("o_orderkey").alias("min_key"),
    )
    result = orders.groupBy("o_orderstatus").count().collect()
    metrics = obs.get
    assert metrics["n_rows"] == sum(r["count"] for r in result)
    assert metrics["null_price"] == 0
    assert metrics["min_key"] >= 0


def test_cbo_stats_reorder_join(spark, sf_dir):
    """Cost-based join reordering: with catalog statistics and CBO on,
    the syntactic order lineitem⋈orders⋈customer is rewritten to join
    the two SMALL tables first, so the fact table meets an already-
    reduced build side — the stats-driven lever big clusters rely on
    when the user's SQL join order is wrong."""
    for t in ("li_cbo", "ord_cbo", "cust_cbo"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    load_table(spark, sf_dir, "lineitem").write.mode("overwrite").saveAsTable(
        "li_cbo"
    )
    load_table(spark, sf_dir, "orders").write.mode("overwrite").saveAsTable(
        "ord_cbo"
    )
    load_table(spark, sf_dir, "customer").write.mode("overwrite").saveAsTable(
        "cust_cbo"
    )
    q = """
        SELECT c_mktsegment, count(*) AS n
        FROM li_cbo
        JOIN ord_cbo ON l_orderkey = o_orderkey
        JOIN cust_cbo ON o_custkey = c_custkey
        GROUP BY 1
    """

    def top_join_key() -> str:
        plan = spark.sql(q)._jdf.queryExecution().optimizedPlan().toString()
        joins = [
            line for line in plan.splitlines() if "Join Inner" in line
        ]
        return joins[0]  # first line = outermost join

    try:
        spark.conf.set("spark.sql.cbo.enabled", "false")
        assert "c_custkey" in top_join_key(), "syntactic order expected"

        for t in ("li_cbo", "ord_cbo", "cust_cbo"):
            spark.sql(f"ANALYZE TABLE {t} COMPUTE STATISTICS")
        spark.conf.set("spark.sql.cbo.enabled", "true")
        spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
        assert "l_orderkey" in top_join_key(), (
            "CBO should hoist the fact join above the dim⋈dim join"
        )
    finally:
        spark.conf.set("spark.sql.cbo.enabled", "false")
        spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
        for t in ("li_cbo", "ord_cbo", "cust_cbo"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_small_files_write_control_and_compaction(spark, sf_dir, tmp_path):
    """Output-file sizing: maxRecordsPerFile caps rows per file at write
    (the knob that prevents one fat task from emitting a single huge
    file), and a coalesced rewrite compacts a small-files directory —
    the maintenance job every long-lived table needs, since file count,
    not byte count, drives scan task setup and listing cost."""
    import os

    orders = load_table(spark, sf_dir, "orders")
    n = orders.count()
    frag = str(tmp_path / "fragmented")
    orders.repartition(4).write.option("maxRecordsPerFile", 200).mode(
        "overwrite"
    ).parquet(frag)
    frag_files = [f for f in os.listdir(frag) if f.endswith(".parquet")]
    assert len(frag_files) >= n // 200, "maxRecordsPerFile did not split"

    compact = str(tmp_path / "compacted")
    spark.read.parquet(frag).coalesce(1).write.mode("overwrite").parquet(
        compact
    )
    compact_files = [f for f in os.listdir(compact) if f.endswith(".parquet")]
    assert len(compact_files) == 1
    # lossless: same multiset of keys
    a = spark.read.parquet(frag).agg(
        F.count(F.lit(1)), F.sum("o_orderkey")
    ).collect()[0]
    b = spark.read.parquet(compact).agg(
        F.count(F.lit(1)), F.sum("o_orderkey")
    ).collect()[0]
    assert tuple(a) == tuple(b)


def test_zorder_buckets_are_tight_in_both_dimensions(spark, sf_dir):
    """The pruning guarantee zorder_layout claims: each Z-bucket's spread
    in EACH dimension is a small fraction of the global range (top 8 z
    bits = 4 bits per dimension → ~1/16 of the domain each, plus
    quantization slack). A naive single-column sort would leave the
    OTHER dimension spanning the whole range — that's the difference
    min/max file stats can prune on."""
    from mapreduce_simulation_spark.plans import registry

    rows = registry.queries()["zorder_layout"](spark, sf_dir).collect()
    assert len(rows) > 1
    ck_range = max(r["ck_hi"] for r in rows) - min(r["ck_lo"] for r in rows)
    dy_range = max(r["dy_hi"] for r in rows) - min(r["dy_lo"] for r in rows)
    for r in rows:
        assert (r["ck_hi"] - r["ck_lo"]) <= ck_range / 8 + 2, r
        assert (r["dy_hi"] - r["dy_lo"]) <= dy_range / 8 + 2, r


def test_join_strategy_hints_select_physical_operators(spark, sf_dir):
    """Join strategy hints are the per-query override when the planner's
    size estimates are wrong at scale: each hint must map to its
    physical operator — MERGE → SortMergeJoin, SHUFFLE_HASH →
    ShuffledHashJoin, BROADCAST → BroadcastHashJoin — on the SAME
    logical join (orders ⋈ customer, where customer would otherwise
    auto-broadcast at this SF)."""
    from mapreduce_simulation_spark.tables import load_table

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")

    def plan_with(hint: str) -> str:
        j = orders.join(
            cust.hint(hint), orders.o_custkey == cust.c_custkey
        )
        return j._jdf.queryExecution().executedPlan().toString()

    assert "SortMergeJoin" in plan_with("MERGE")
    assert "ShuffledHashJoin" in plan_with("SHUFFLE_HASH")
    assert "BroadcastHashJoin" in plan_with("BROADCAST")


def test_max_partition_bytes_controls_scan_splits(spark, sf_dir, tmp_path):
    """spark.sql.files.maxPartitionBytes is the num_mappers knob for
    columnar scans (SURVEY S2: the reference packs whole files into
    --nmappers tasks; Spark packs by bytes): shrinking it must raise the
    scan's partition count on the same file, and the result must not
    change."""
    from mapreduce_simulation_spark.tables import load_table

    stage = str(tmp_path / "one_file")
    load_table(spark, sf_dir, "lineitem").coalesce(1).write.mode(
        "overwrite"
    ).parquet(stage)

    before = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        wide = spark.read.parquet(stage)
        n_wide = wide.rdd.getNumPartitions()
        total = wide.count()

        spark.conf.set("spark.sql.files.maxPartitionBytes", str(64 * 1024))
        narrow = spark.read.parquet(stage)
        n_narrow = narrow.rdd.getNumPartitions()
        assert n_narrow > n_wide, (
            f"smaller maxPartitionBytes did not add splits "
            f"({n_wide} -> {n_narrow})"
        )
        assert narrow.count() == total  # split boundaries lose nothing
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", before)
