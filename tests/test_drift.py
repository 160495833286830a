"""feature_drift_stats: the transcendental-free drift report
(operators/drift.py) — exactness of the integer-scaled TVD/KS
construction against an independent Python recomputation, plus the
metric contracts (bounds, argmax localization)."""

from __future__ import annotations

import duckdb

from conftest import SF_DIR
from mapreduce_simulation_spark.operators import drift as D


def _python_recompute(sf_dir):
    """Independent recomputation: exact integer arithmetic in Python
    (unbounded ints), the same single final IEEE divisions."""
    duck = duckdb.connect()
    duck.execute(
        f"CREATE VIEW orders AS SELECT * FROM '{sf_dir}/orders.parquet'"
    )
    rows = duck.execute(
        f"""
        SELECT CAST(FLOOR(o_totalprice) AS BIGINT) // {D.DRIFT_BUCKET} AS b,
               sum(CASE WHEN o_orderdate < TIMESTAMP '{D.DRIFT_SPLIT}'
                        THEN 1 ELSE 0 END) AS a,
               sum(CASE WHEN o_orderdate >= TIMESTAMP '{D.DRIFT_SPLIT}'
                        THEN 1 ELSE 0 END) AS c
        FROM orders GROUP BY 1 ORDER BY 1
        """
    ).fetchall()
    n1 = sum(a for _, a, _ in rows)
    n2 = sum(c for _, _, c in rows)
    tvd_scaled = sum(abs(a * n2 - c * n1) for _, a, c in rows)
    cum_a = cum_c = 0
    ks_scaled, ks_bucket = -1, None
    for b, a, c in rows:
        cum_a += a
        cum_c += c
        cd = abs(cum_a * n2 - cum_c * n1)
        if cd > ks_scaled:
            ks_scaled, ks_bucket = cd, b
    return {
        "n_ref": n1,
        "n_cur": n2,
        "n_buckets": len(rows),
        "tvd": tvd_scaled / (2 * n1 * n2),
        "ks_stat": ks_scaled / (n1 * n2),
        "ks_bucket": ks_bucket,
    }


def test_drift_stats_match_python_recompute_exactly(spark):
    """Every output value equals the unbounded-int Python recomputation —
    including the doubles, because the only float ops are single IEEE
    divisions of exact integer operands (== comparison, no tolerance)."""
    row = D.feature_drift_stats(spark, SF_DIR).collect()
    assert len(row) == 1
    row = row[0]
    want = _python_recompute(SF_DIR)
    assert row.n_ref == want["n_ref"]
    assert row.n_cur == want["n_cur"]
    assert row.n_buckets == want["n_buckets"]
    assert row.tvd == want["tvd"]
    assert row.ks_stat == want["ks_stat"]
    assert row.ks_bucket == want["ks_bucket"]


def test_drift_metric_contracts(spark):
    """TVD and KS are probabilities (0 ≤ x ≤ 1), KS ≤ 2·TVD (the CDF
    max is bounded by the mass moved), both eras non-empty, and the
    bucket table is domain-bounded (the metadata-scale claim)."""
    row = D.feature_drift_stats(spark, SF_DIR).collect()[0]
    assert 0.0 <= row.tvd <= 1.0
    assert 0.0 <= row.ks_stat <= 1.0
    assert row.ks_stat <= 2 * row.tvd + 1e-15
    assert row.n_ref > 0 and row.n_cur > 0
    assert row.n_buckets <= 600_000 // D.DRIFT_BUCKET + 2


def test_heavy_change_terms_matches_recompute_and_plan(spark):
    """Top-k vocabulary shift: values equal an unbounded-int Python
    recompute (same single IEEE division), the k rows are the true top-k
    under the (shift desc, word asc) total order, and the plan uses
    TakeOrderedAndProject — per-partition k, no global sort."""
    from mapreduce_simulation_spark.operators.drift import (
        HEAVY_CHANGE_TOPK,
        heavy_change_terms,
    )

    df = heavy_change_terms(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan[:1200]
    got = [(r.word, r.n_ref, r.n_cur, r.shift) for r in df.collect()]
    assert len(got) == HEAVY_CHANGE_TOPK

    duck = duckdb.connect()
    duck.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    rows = duck.execute(
        """
        SELECT word,
               sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS a,
               sum(CASE WHEN NOT is_ref THEN 1 ELSE 0 END) AS c
        FROM (
          SELECT doc_id % 2 = 0 AS is_ref,
                 unnest(string_split_regex(lower(text), '\\s+')) AS word
          FROM documents
        ) WHERE word <> '' GROUP BY word
        """
    ).fetchall()
    n1 = sum(a for _, a, _ in rows)
    n2 = sum(c for _, _, c in rows)
    scored = sorted(
        (
            (w, a, c, abs(a * n2 - c * n1) / (n1 * n2))
            for w, a, c in rows
        ),
        key=lambda t: (-t[3], t[0]),
    )[:HEAVY_CHANGE_TOPK]
    assert got == scored
