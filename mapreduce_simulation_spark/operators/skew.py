"""Skew-handling join strategies for the 100 TB design point.

Spark's AQE skew-join (spark.sql.adaptive.skewJoin.enabled, on in our
session defaults) splits oversized partitions at runtime — the first line
of defense, zero code. This module is the second line: explicit key salting
for the cases AQE can't fix (skew in the *build* side of an aggregation, or
a single key too hot for any split of the other side — think a null-heavy
foreign key or one viral document ID in a join against per-token data).

salted_join replicates the small side SALT_FACTOR× and scatters the big
side's hot keys uniformly; correctness is unchanged (verified in tests
against the plain join), the hot key's rows spread over SALT_FACTOR tasks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALT = 16


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    how: str = "inner",
    salt_factor: int = DEFAULT_SALT,
) -> DataFrame:
    """Equi-join robust to hot keys in ``big``: big rows get a random-ish
    (hash-derived, deterministic) salt in [0, salt_factor); small rows are
    replicated across every salt value. The shuffle key becomes
    (key, salt) — a hot key spreads over salt_factor partitions instead of
    melting one task.

    Use when one side is small enough to replicate but too big (or growing
    too fast) to broadcast outright, and AQE's split of the big side isn't
    enough. Cost: small side shuffles salt_factor× its size.

    Only inner/left/left_semi are supported: with right/full outer joins
    the replicated small side would emit one row per salt value for every
    unmatched key (salt_factor× duplicates).
    """
    if how not in {"inner", "left", "left_outer", "left_semi", "semi"}:
        raise ValueError(
            f"salted_join supports inner/left/left_semi, not {how!r}: "
            "outer variants would duplicate unmatched small-side rows "
            "once per salt value"
        )
    salt_col: Column = F.pmod(F.xxhash64(F.col(key), F.monotonically_increasing_id()), F.lit(salt_factor))
    big_salted = big.withColumn("__salt", salt_col)
    salts = F.explode(F.sequence(F.lit(0), F.lit(salt_factor - 1))).alias("__salt")
    small_salted = small.select("*", salts)
    joined = big_salted.join(small_salted, [key, "__salt"], how)
    return joined.drop("__salt")


def two_phase_distinct(
    df: DataFrame, group_key: str, distinct_key: str
) -> DataFrame:
    """Exact COUNT(DISTINCT x) GROUP BY k, skew-proof: phase 1 de-dups on
    (k, x) — the shuffle key includes the high-cardinality x, so one hot
    group key still spreads over the whole cluster — phase 2 counts the
    de-duped rows per k (tiny). Spark's native count_distinct instead
    expands and shuffles on k alone, so one viral k melts a single reducer
    at 100 TB; this rewrite is the standard fix (and what you also reach
    for when combining distinct with other aggs forces the expand plan).
    Result is identical to count_distinct — asserted in tests and by the
    SQL oracle."""
    return (
        df.select(group_key, distinct_key)
        .distinct()
        .groupBy(group_key)
        .agg(F.count(F.lit(1)).alias(f"n_distinct_{distinct_key}"))
    )
