"""Bench output contract: the driver records only the last ~2000 chars of
stdout, so bench.py's FINAL printed line must be a self-contained JSON
summary comfortably inside that budget (round 9 regression: the single
full-detail line outgrew the tail and BENCH_r09 recorded parsed: null).
"""

import json

import bench


def _worst_case_result() -> dict:
    # Pessimistic field widths: every headline query present with a
    # 4-digit-seconds timing, errors populated, large totals.
    queries = {name: 9999.999 for name in bench.HEADLINE}
    return {
        "metric": "headline_queries_total",
        "value": 99999.999,
        "unit": "sec",
        "queries": queries,
        "sf": 0.1,
        "n_ok": len(queries),
        "n_expected": len(queries),
        "extended": {f"extended_query_{i}": 9999.999 for i in range(200)},
        "extended_total": 99999.999,
        "training": {name: 9999.999 for name in bench.TRAINING},
        "training_total": 99999.999,
        "pipeline": {name: 9999.999 for name in bench.PIPELINE},
        "pipeline_total": 99999.999,
        "sketch": {name: 9999.999 for name in bench.SKETCH},
        "sketch_total": 99999.999,
        "sketch_r12": {name: 9999.999 for name in bench.SKETCH_R12},
        "sketch_r12_total": 99999.999,
        "sketch_r13": {name: 9999.999 for name in bench.SKETCH_R13},
        "sketch_r13_total": 99999.999,
        "curation_r14": {name: 9999.999 for name in bench.CURATION_R14},
        "curation_r14_total": 99999.999,
        "cpu_calib_sec": 99.999,
        "spark_calib_sec": 99.999,
        "spark_calib_med5_sec": 99.999,
        "calib_normalized_total": 9999.99,
        "calib_normalized_total_med5": 9999.99,
        "calib_normalized_extended": 9999.99,
        "calib_normalized_total_xproc": 9999.99,
        "calib_normalized_extended_xproc": 9999.99,
        "primary_comparison_metric": "calib_normalized_total_xproc",
        "per_query_stat": "median_of_3_processes_warm",
        "staging_group_stat": "median_of_3_processes",
        "value_spread_pct": 999.9,
        "extended_spread_pct": 999.9,
        **{
            f"{g}_runs": [9999.999, 9999.999, 9999.999]
            for g in bench.XPROC_GROUPS
        },
        **{
            f"{g}_calib_runs": [99.999, 99.999, 99.999]
            for g in bench.XPROC_GROUPS
        },
        "cold_first_run": {f"q{i}": 9999.999 for i in range(200)},
        "errors": {f"q{i}": "x" * 200 for i in range(50)},
    }


def test_summary_line_fits_driver_tail():
    line = json.dumps(bench.summarize(_worst_case_result()))
    assert len(line) < 1800, len(line)


def test_summary_is_self_contained_json_with_required_fields():
    summary = bench.summarize(_worst_case_result())
    round_trip = json.loads(json.dumps(summary))
    for key in ("metric", "value", "unit", "queries", "sf"):
        assert key in round_trip
    # Big maps must NOT leak into the tail line.
    for key in ("extended", "training", "cold_first_run", "errors"):
        assert key not in round_trip
    assert round_trip["n_errors"] == 50


def test_summary_omits_missing_optional_fields():
    summary = bench.summarize({"metric": "m", "value": 1, "unit": "sec"})
    assert "n_errors" not in summary
    assert summary["metric"] == "m"


def test_summary_carries_staging_group_protocol():
    """BENCH_r13+ must record which protocol produced the pipeline/sketch
    numbers (median across processes vs in-process) — the r12 verdict's
    cross-round-comparability fix."""
    summary = bench.summarize(_worst_case_result())
    assert summary["staging_group_stat"] == "median_of_3_processes"
    # per-child totals stay on the detail line, not the tail summary
    assert "pipeline_runs" not in summary


def test_xproc_groups_cover_staging_io_and_primary_groups():
    # r13: the two staging-I/O groups; r14: the three groups whose totals
    # drive round-over-round judgments (the ±11% cross-process spread fix).
    assert bench.XPROC_GROUPS == (
        "pipeline",
        "sketch",
        "headline",
        "extended",
        "training",
    )


def test_bench_group_membership_is_frozen():
    """Cross-round comparability rests on each bench group timing the
    IDENTICAL query set every round (new queries get their own group —
    the r11 rule that kept headline/extended set-identical). Freeze each
    group's membership hash so a silent add/remove/reorder is one named
    failure; a deliberate change updates the literal in the same commit
    and gets called out in PLANS.md."""
    import hashlib

    def h(names: list[str]) -> str:
        return hashlib.sha256("\n".join(sorted(names)).encode()).hexdigest()[
            :16
        ]

    assert h(bench.HEADLINE) == "3bd0072884997c6f", sorted(bench.HEADLINE)
    assert h(bench.EXTENDED) == "fcf82ef47a3fb247", sorted(bench.EXTENDED)
    assert h(bench.TRAINING) == "3780ec07443a5955", sorted(bench.TRAINING)
    assert h(bench.PIPELINE) == "e7775bef372af7de", sorted(bench.PIPELINE)
    assert h(bench.SKETCH) == "cb6525270c3823fe", sorted(bench.SKETCH)
    assert h(bench.SKETCH_R12) == "95d2b628a228577c", sorted(
        bench.SKETCH_R12
    )
    assert h(bench.SKETCH_R13) == "3b2e783237d7c756", sorted(
        bench.SKETCH_R13
    )
    assert h(bench.CURATION_R14) == "cd0b07a403ac7467", sorted(
        bench.CURATION_R14
    )
