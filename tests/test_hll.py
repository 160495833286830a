"""Unit contracts for the cross-engine deterministic HLL
(functions/hll.py) — independent Python replays of each piece, so a
refactor that changes semantics fails HERE with a pointed message
instead of as an opaque driver hash mismatch. The Spark ≡ DuckDB
end-to-end equality is covered by the registry sweep (events_daily_approx
/ hll_monthly_users are exact-oracle queries); these tests pin WHAT both
engines are supposed to compute.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from mapreduce_simulation_spark.functions import hll as H
from mapreduce_simulation_spark.functions.hashing import MINHASH_PERMS, P

(_A1, _B1), (_A2, _B2) = MINHASH_PERMS[0], MINHASH_PERMS[1]


def _py_hash(uid: int) -> int:
    return (_A2 * ((_A1 * (uid % P) + _B1) % P) + _B2) % P


def _py_rho(w: int) -> int:
    # trailing zeros + 1, capped at 18 (w < 2^18; w == 0 -> 18)
    if w == 0:
        return 18
    tz = (w & -w).bit_length() - 1
    return min(tz + 1, 18)


def _py_estimate(rhos_by_reg: dict[int, int]) -> float:
    v = len(rhos_by_reg)
    s = sum(1 << (18 - r) for r in rhos_by_reg.values())
    d = float(s + (H.HLL_M - v) * (1 << 18))
    raw = H.HLL_RAW_NUM / d
    if raw <= H.HLL_LC_THRESHOLD and v < H.HLL_M:
        return H.HLL_M * math.log(H.HLL_M / (H.HLL_M - v))
    return raw


def _duck_state_and_estimate(uids: list[int]):
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE src AS SELECT unnest(?) AS user_id, 1 AS g",
        [uids],
    )
    sql = f"""
WITH lc AS {H.lc_table_cte()},
state AS ({H.hll_state_sql('src', 'user_id', 'g')})
SELECT approx FROM ({H.hll_estimate_sql('g')})
"""
    return con.execute(sql).fetchone()[0]


def test_rho_case_chain_is_trailing_zeros_plus_one():
    con = duckdb.connect()
    expr = H.hll_rho_sql("w")
    ws = list(range(0, 300)) + [2**k for k in range(18)] + [244140]
    got = dict(
        con.execute(
            f"SELECT w, {expr} FROM (SELECT unnest(?) AS w)", [ws]
        ).fetchall()
    )
    for w in ws:
        assert got[w] == _py_rho(w), (w, got[w], _py_rho(w))


def test_lc_table_matches_math_log_exactly():
    vals = H._lc_values()
    assert len(vals) == H.HLL_M
    assert vals[0] == 0.0
    for v in (1, 2, 100, 1500, H.HLL_M - 1):
        assert vals[v] == H.HLL_M * math.log(H.HLL_M / (H.HLL_M - v))


@pytest.mark.parametrize("n", [1, 7, 50, 400, 1500])
def test_duckdb_pipeline_matches_python_reference(n):
    """The full DuckDB replay (hash -> register -> rho -> estimate) must
    equal an independent pure-Python implementation bit-for-bit, and the
    estimate must sit within the sketch's accuracy envelope."""
    uids = [3 * i + 1 for i in range(n)]  # arbitrary distinct ids
    regs: dict[int, int] = {}
    for u in uids:
        h = _py_hash(u)
        reg, w = h % H.HLL_M, h // H.HLL_M
        regs[reg] = max(regs.get(reg, 0), _py_rho(w))
    want = _py_estimate(regs)
    got = _duck_state_and_estimate(uids)
    assert got == want, (n, got, want)
    assert abs(got - n) / n < 0.12, (n, got)  # ~3 sigma at M=4096


def test_estimate_uses_raw_branch_when_saturated():
    """With v too large for linear counting the raw HLL division must be
    selected — guard the CASE's branch condition."""
    # all registers occupied at rho=1: v == M -> raw branch by v < M test
    regs = {r: 1 for r in range(H.HLL_M)}
    est = _py_estimate(regs)
    d = float(H.HLL_M * (1 << 17))
    assert est == H.HLL_RAW_NUM / d
