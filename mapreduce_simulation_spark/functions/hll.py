"""Cross-engine deterministic HyperLogLog.

Spark's builtin sketches (``approx_count_distinct`` HLL++,
``hll_sketch_agg`` Datasketches) are engine-specific: DuckDB cannot replay
their hashing or register layout, so queries built on them can only ever
get a rows-only driver check. This module defines an HLL whose EVERY step
is reproducible bit-for-bit in both engines, giving the approximate-
distinct operators an exact value-hash oracle:

  hash      two rounds of (A*x + B) mod P over the shared constants in
            functions/hashing.py — pure int64 arithmetic, identical in
            Spark and DuckDB (no overflow: operands < P < 2^30, products
            < 2^60).
  register  h % M; the remaining bits w = h // M feed the rank.
  rank      rho = (#trailing zeros of w) + 1, via a generated integer
            CASE chain (shared SQL text on both engines). w < 2^18, so
            rho ≤ 18 with w ≡ 0 mod 2^17 mapping to 18.
  state     per-group max(rho) per occupied register — integer, order-
            insensitive, partial-aggregable (the sketch property).
  estimate  the harmonic denominator is kept INTEGER-scaled:
            D = Σ_occupied 2^(18-rho) + (M-V)·2^18  (< 2^30, exact in
            double), so the raw estimate is ONE IEEE division
            RAW_NUM / D of bit-identical operands — deterministic on any
            engine. The small-range branch (linear counting,
            M·ln(M/(M-V))) depends only on the integer V, and ln()
            differs between DuckDB and the JVM in the last ulp (measured
            12/200 arguments) — so its 0..M-1 values are precomputed in
            PYTHON and shipped to both engines as a literal table
            (broadcast-joined in Spark, a VALUES CTE in DuckDB). No
            transcendental function ever runs inside either engine.

Scale design: the register state is one small int row per OCCUPIED
(group, register) — ≤ min(group cardinality, M) rows per group after the
map-side combine — and the estimate step aggregates M rows per group at
most. Sketches merge by max(rho): the monthly rollup consumes the daily
register states without re-reading raw data, the property that makes
sketch tables a 100 TB staple.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .hashing import MINHASH_PERMS, P

HLL_M = 4096  # registers; LC error ~1.2% at n=1500, HLL rsd 1.04/√M ≈ 1.6%
_HLL_W_BITS = 18  # h < P < 2^30, h // M < 2^18
_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)
# RAW estimate = ALPHA·M² / (D / 2^18) = RAW_NUM / D with D integer-scaled.
HLL_RAW_NUM = _ALPHA * HLL_M * HLL_M * float(1 << _HLL_W_BITS)
HLL_LC_THRESHOLD = 2.5 * HLL_M

(_A1, _B1), (_A2, _B2) = MINHASH_PERMS[0], MINHASH_PERMS[1]


def hll_hash_sql(col: str) -> str:
    """Two-round affine hash mod P — identical SQL text on both engines.
    The input is cast to BIGINT first: with an INT32 column DuckDB would
    otherwise multiply in 32-bit and overflow (caught by test_hll.py)."""
    return (
        f"(({_A2} * (({_A1} * (CAST({col} AS BIGINT) % {P}) + {_B1})"
        f" % {P}) + {_B2}) % {P})"
    )


def hll_rho_sql(w: str) -> str:
    """(#trailing zeros + 1) of w < 2^18 as a generated integer CASE chain
    (no bit intrinsics → byte-identical semantics on both engines)."""
    branches = " ".join(
        f"WHEN ({w}) % {1 << (k + 1)} = {1 << k} THEN {k + 1}"
        for k in range(_HLL_W_BITS - 1)
    )
    return f"(CASE {branches} ELSE {_HLL_W_BITS} END)"


def hll_term_sql(rho: str) -> str:
    """2^(18 - rho) as integer — the scaled harmonic-sum term."""
    branches = " ".join(
        f"WHEN ({rho}) = {k} THEN {1 << (_HLL_W_BITS - k)}"
        for k in range(1, _HLL_W_BITS + 1)
    )
    return f"(CASE {branches} END)"


def _lc_values() -> list[float]:
    """Linear-counting estimates M·ln(M/(M-V)) for V = 0..M-1, computed
    once in Python — the shared source of truth for both engines."""
    return [
        HLL_M * math.log(HLL_M / (HLL_M - v)) for v in range(HLL_M)
    ]


def hll_estimate_case_sql(v: str, d: str, lc: str) -> str:
    """The estimate: raw HLL division, or the table's linear-counting value
    in the small-range regime. All operands bit-identical cross-engine."""
    raw = f"(CAST('{HLL_RAW_NUM!r}' AS DOUBLE) / {d})"
    return (
        f"(CASE WHEN {raw} <= {HLL_LC_THRESHOLD!r} AND {v} < {HLL_M} "
        f"THEN {lc} ELSE {raw} END)"
    )


def lc_table_df(spark: SparkSession) -> DataFrame:
    """(v, lc_est) lookup for the Spark side — broadcast-joined (M rows)."""
    return spark.createDataFrame(
        list(enumerate(_lc_values())), "v int, lc_est double"
    )


def lc_table_cte() -> str:
    """The same lookup as a DuckDB VALUES CTE. Values ride as shortest-
    roundtrip strings cast to DOUBLE — correctly-rounded parse on both
    engines reproduces the Python doubles exactly."""
    rows = ", ".join(
        f"({v}, CAST('{est!r}' AS DOUBLE))"
        for v, est in enumerate(_lc_values())
    )
    return f"(SELECT * FROM (VALUES {rows}) t(v, lc_est))"


def hll_register_cols(uid_col: str) -> tuple[Column, Column]:
    """(register, rho) columns for the Spark plan — generated from the
    SAME hash/rank SQL text the oracle embeds, so the semantics cannot
    drift. The only dialect difference is the integer-division token
    (Spark ``div`` vs DuckDB ``//``) — identical semantics on the
    non-negative operands used here."""
    h = hll_hash_sql(uid_col)
    reg = F.expr(f"CAST({h} % {HLL_M} AS INT)")
    rho = F.expr(f"CAST({hll_rho_sql(f'({h} div {HLL_M})')} AS INT)")
    return reg, rho


def hll_group_estimate(
    grouped_regs: DataFrame,
    group_cols: list[str],
    spark: SparkSession,
    extra_sums: dict[str, str] | None = None,
) -> DataFrame:
    """From a (group_cols..., reg, maxrho, ...) register-state frame,
    produce (group_cols..., extra sums..., approx) where approx is the
    deterministic estimate. One M-bounded aggregation per group + a
    broadcast lookup join. ``extra_sums`` maps output name → state column
    to sum alongside (e.g. per-register row counts → group event count)."""
    term = F.expr(f"CAST({hll_term_sql('maxrho')} AS BIGINT)")
    sums = [
        F.sum(src).alias(name) for name, src in (extra_sums or {}).items()
    ]
    agg = grouped_regs.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("int").alias("v"),
        F.sum(term).alias("s_occ"),
        *sums,
    )
    d = (
        F.col("s_occ")
        + (F.lit(HLL_M) - F.col("v")) * F.lit(1 << _HLL_W_BITS)
    ).cast("double")
    est = F.expr(hll_estimate_case_sql("v", "d", "lc_est"))
    return (
        agg.withColumn("d", d)
        .join(F.broadcast(lc_table_df(spark)), "v", "left")
        .withColumn("approx", est)
        .drop("v", "s_occ", "d", "lc_est")
    )


def hll_state_sql(src: str, uid: str, group_cols: str) -> str:
    """DuckDB register-state subquery: per (group_cols, reg) max rho plus
    the per-register row count (summed downstream for exact totals)."""
    h = hll_hash_sql(uid)
    return f"""
  SELECT {group_cols}, CAST({h} % {HLL_M} AS INT) AS reg,
         max({hll_rho_sql(f'({h} // {HLL_M})')}) AS maxrho,
         count(*) AS n_rows
  FROM {src}
  GROUP BY ALL
"""


def hll_estimate_sql(
    group_cols: str, extra_sums: dict[str, str] | None = None
) -> str:
    """DuckDB estimate-from-state subquery: consumes a CTE named ``state``
    (group_cols, reg, maxrho, n_rows) plus the ``lc`` CTE, emits
    (group_cols, extra sums..., approx). ``extra_sums`` maps output name →
    aggregate expression for the inner aggregate (the same {name: expr}
    contract as hll_group_estimate — a dict rather than a SQL snippet so
    an expression containing commas, e.g. round(sum(x), 2), can never be
    mis-split into malformed SQL; r11 advice), re-selected by name in the
    outer query."""
    term = hll_term_sql("maxrho")
    extra_inner = (
        ", ".join(f"{x} AS {n}" for n, x in extra_sums.items()) + ","
        if extra_sums
        else ""
    )
    extra_names = (
        ", ".join(extra_sums) + "," if extra_sums else ""
    )
    return f"""
  SELECT {group_cols}, {extra_names}
         {hll_estimate_case_sql('g.v', 'g.d', 'lc.lc_est')} AS approx
  FROM (
    SELECT {group_cols}, {extra_inner} CAST(count(*) AS INT) AS v,
           CAST(sum({term})
                + ({HLL_M} - count(*)) * {1 << _HLL_W_BITS} AS DOUBLE) AS d
    FROM state GROUP BY {group_cols}
  ) g LEFT JOIN lc ON lc.v = g.v
"""
