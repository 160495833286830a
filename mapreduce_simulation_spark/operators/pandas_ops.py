"""Grouped custom aggregation via applyInPandas — the native-speed face of
the reference's reducer contract.

The reference's reducer surface is "an executable receives one key's sorted
group and emits rows" (reference worker/__main__.py:241-249 + contiguous-key
grouping inside the executable). `pipe_reduce` reproduces that contract
bit-for-bit for existing binaries; THIS module is what new code should use
instead: `applyInPandas` gives the same group-at-a-time programming model
with Arrow batching (~10-100× the throughput of row-at-a-time Python), and
whole groups arrive as pandas DataFrames — no manual contiguity bookkeeping.

Scale notes: one shuffle on the group key (same as any reducer); each group
must fit in one worker's memory — same constraint the reference's reducer
has, since a group is one executable's stdin.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

from ..tables import load_table


def group_rank_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event type, rank events by value (desc, event_id tiebreak) and
    keep the top 10 — a custom grouped computation written as pandas code.
    Integer output keeps the DuckDB oracle comparison exact."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")

    def rank_group(pdf: pd.DataFrame) -> pd.DataFrame:
        ordered = pdf.sort_values(
            ["value", "event_id"], ascending=[False, True]
        ).head(10)
        ordered = ordered.assign(rk=range(1, len(ordered) + 1))
        return ordered[["event_type", "event_id", "value", "rk"]]

    return ev.groupBy("event_type").applyInPandas(
        rank_group, schema="event_type string, event_id bigint, value double, rk int"
    )
