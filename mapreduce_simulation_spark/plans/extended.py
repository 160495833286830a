"""Extended coverage queries: JSON functions, remaining set ops, grouping
sets, moving windows, exact quantiles, correlation — rounding out the
SURVEY.md §2e category checklist (all ABSENT in the reference's engine;
first-class here via Spark built-ins).

Determinism notes:
  - percentile (exact, interpolated) matches DuckDB quantile_cont
    bit-for-bit (verified on this data);
  - corr/stddev differ in the last ulp across engines → rounded to 6;
  - moving averages use decimal sums / counts like every money aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..tables import load_table


def json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar functions on the events.props payload column:
    get_json_object → typed aggregation. At scale the JSON parse is
    JVM-side codegen (no Python); a frequently-read key would justify
    promoting props to a typed column at ingest."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.select(k.alias("k"), "value")
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .orderBy("k")
    )


def intersect_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: customers who are in the BUILDING segment AND placed an
    urgent order (completes the set-op family with set_ops_segments)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    urgent = (
        orders.where(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("custkey"))
        .distinct()
    )
    building = cust.where(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("custkey")
    )
    return urgent.intersect(building)


def cube_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets: revenue by all subsets of (year, orderstatus) —
    rollup's complete twin."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube(F.year("o_orderdate").alias("yr"), F.col("o_orderstatus"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue")
        )
    )


def moving_avg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving-frame window aggregate: 3-order trailing average of order
    value per customer (ROWS 2 PRECEDING..CURRENT)."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(-2, Window.currentRow)
    )
    dec_sum = F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(w)
    cnt = F.count(F.lit(1)).over(w)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        (dec_sum.cast("double") / cnt).alias("moving_avg"),
    )


def quantiles_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles of line price per return flag —
    Spark `percentile` ≡ DuckDB `quantile_cont` (verified bit-equal)."""
    li = load_table(spark, sf_dir, "lineitem")
    qs = F.percentile(
        "l_extendedprice", F.array(F.lit(0.25), F.lit(0.5), F.lit(0.9), F.lit(0.99))
    )
    return (
        li.groupBy("l_returnflag")
        .agg(
            qs.alias("price_quantiles"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("l_returnflag")
    )


def stats_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates: correlation and sample stddev per event type
    (rounded — engines differ in the last float ulp)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.round(F.corr("value", "user_id"), 6).alias("corr_value_user"),
            F.round(F.stddev_samp("value"), 6).alias("stddev_value"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("event_type")
    )
