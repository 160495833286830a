"""Frozen schema contract for the driver-generated testdata tables.

Round 3 post-mortem: the driver changed ``events.ts`` from TIMESTAMP(NANOS)
to plain timestamp[us] between rounds, and the loader's nanos workaround
then failed analysis on every events consumer — 38 red tests, two red
CORRECTNESS rows, and a crashed bench, all tracing to one silent format
drift.  This test turns the next drift into ONE named failure: every
table's loaded dtypes are asserted against the expectation frozen below.

``events.ts`` is intentionally ``timestamp`` (LTZ) whatever the file
stores: load_table normalizes nanos-as-long AND timestamp_ntz variants to
the session-UTC TIMESTAMP downstream operators (unix_micros, watermarks)
require — that normalization is part of the contract, so it is asserted
here too, not just the raw file types.
"""

from __future__ import annotations

import pytest

from mapreduce_simulation_spark.tables import TABLE_NAMES, load_table

EXPECTED_DTYPES: dict[str, dict[str, str]] = {
    "region": {"r_regionkey": "int", "r_name": "string"},
    "nation": {"n_nationkey": "int", "n_name": "string", "n_regionkey": "int"},
    "customer": {
        "c_custkey": "bigint",
        "c_name": "string",
        "c_nationkey": "int",
        "c_acctbal": "double",
        "c_mktsegment": "string",
    },
    "supplier": {
        "s_suppkey": "bigint",
        "s_name": "string",
        "s_nationkey": "int",
        "s_acctbal": "double",
    },
    "part": {
        "p_partkey": "bigint",
        "p_name": "string",
        "p_brand": "string",
        "p_type": "string",
        "p_size": "int",
        "p_retailprice": "double",
    },
    "orders": {
        "o_orderkey": "bigint",
        "o_custkey": "bigint",
        "o_orderstatus": "string",
        "o_totalprice": "double",
        "o_orderdate": "timestamp_ntz",
        "o_orderpriority": "string",
    },
    "lineitem": {
        "l_orderkey": "bigint",
        "l_partkey": "bigint",
        "l_suppkey": "bigint",
        "l_linenumber": "int",
        "l_quantity": "double",
        "l_extendedprice": "double",
        "l_discount": "double",
        "l_tax": "double",
        "l_returnflag": "string",
        "l_linestatus": "string",
        "l_shipdate": "timestamp_ntz",
    },
    "events": {
        "event_id": "bigint",
        "ts": "timestamp",  # normalized by load_table; see module docstring
        "user_id": "bigint",
        "event_type": "string",
        "value": "double",
        "props": "string",
    },
    "documents": {
        "doc_id": "bigint",
        "text": "string",
        "lang": "string",
        "source": "string",
        "n_chars": "bigint",
    },
    "embeddings": {
        "vec_id": "bigint",
        "embedding": "array<float>",
        "label": "int",
    },
}


def test_contract_covers_every_table():
    assert set(EXPECTED_DTYPES) == set(TABLE_NAMES)


@pytest.mark.parametrize("table", TABLE_NAMES)
def test_loaded_schema_matches_contract(spark, sf_dir, table):
    got = dict(load_table(spark, sf_dir, table).dtypes)
    assert got == EXPECTED_DTYPES[table], (
        f"testdata drift: {table} loaded dtypes changed — update load_table "
        f"normalization (and this contract) deliberately.\n"
        f"got:  {got}\nwant: {EXPECTED_DTYPES[table]}"
    )


# ---------------------------------------------------------------------------
# Frozen driver hash window.
#
# The driver's correctness gate hashes only the FIRST 50 entries of
# ``queries()`` (dict insertion order).  A refactor, an import reorder, or an
# environment-dependent registration could silently swap which queries get
# driver-checked; this literal pins the exact window so any unintended shift
# is ONE named failure.  Changing the window (promotions/demotions in
# registry._PROMOTE/_DEMOTE) must update this list deliberately.
# ---------------------------------------------------------------------------

DRIVER_WINDOW_R14 = [
    "kmv_month_overlap",
    "streaming_kmv_sketch_ingest",
    "feature_drift_stats",
    "stateful_user_type_rollup_tws",
    "stateful_user_delta_log_tws",
    "heavy_change_terms",
    "stateful_user_rollup_tws",
    "percentile_trim",
    "pii_scrub",
    "pivot_revenue_by_status",
    "pps_sample",
    "pseudonymize_customers",
    "range_join_promos",
    "scd2_point_in_time",
    "scd2_priority_history",
    "snapshot_diff",
    "streaming_attribution_outer",
    "streaming_dedup_within_watermark",
    "streaming_events_hourly_append",
    "streaming_events_sliding",
    "streaming_sessions",
    "streaming_static_enrichment",
    "temperature_sample",
    "triangle_count_nations",
    "unpivot_revenue",
    "variant_props_extract",
    "vocab_encode",
    "above_avg_orders",
    "association_rules",
    "balance_distribution",
    "cms_word_freq",
    "customer_balance_ntiles",
    "distributed_kmeans_train",
    "distributed_logreg_train",
    "dynamic_partition_pruning",
    "embedding_label_stats",
    "event_peak_concurrency",
    "exact_ols_train",
    "exists_returned_orders",
    "fuzzy_name_pairs",
    "idle_high_balance_customers",
    "important_parts",
    "intersect_segments",
    "json_props_extract",
    "key_skew_profile",
    "large_quantity_orders",
    "market_share",
    "max_revenue_supplier",
    "media_frame_sample",
    "media_metadata",
]


def test_driver_hash_window_is_frozen():
    from mapreduce_simulation_spark.plans import registry

    got = list(registry.queries())[:50]
    assert got == DRIVER_WINDOW_R14, (
        "the driver's first-50 hash window shifted — if this is an intended "
        "promotion/demotion, update DRIVER_WINDOW_R14; otherwise find the "
        "import/registration reorder that moved it.\n"
        f"got:  {got}\nwant: {DRIVER_WINDOW_R14}"
    )


def test_driver_window_queries_all_have_oracles():
    from mapreduce_simulation_spark.plans import registry

    oracles = registry.oracle_sql()
    missing = [n for n in DRIVER_WINDOW_R14 if n not in oracles]
    assert missing == [], (
        f"driver-window queries without an exact oracle: {missing} — the "
        "gate would fall back to the weaker rows-only check"
    )


def test_registry_contents_do_not_depend_on_environment():
    # stateful_user_rollup_tws must be registered whether or not protobuf
    # is importable. Since round 14 it sits INSIDE the hash window (slot 7
    # of the never-driver-checked leads) to earn its first driver row.
    from mapreduce_simulation_spark.plans import registry

    names = list(registry.queries())
    assert "stateful_user_rollup_tws" in names
    assert names.index("stateful_user_rollup_tws") == 6
