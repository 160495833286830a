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
