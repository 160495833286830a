"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``mapreduce_simulation_spark`` package;
this module is the thin registry surface.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mapreduce_simulation_spark.plans import registry as _registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: word count over documents at sf0.001 — the
    reference's canonical end-to-end pipeline (scan → explode → group →
    count; reference wc_map.sh + wc_reduce.sh) as one DataFrame plan."""
    from mapreduce_simulation_spark.plans.reference import word_count

    return word_count(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted for non-SQL-expressible)."""
    return _registry.oracle_sql()
