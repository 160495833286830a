"""The preflight staleness rule (r13 verdict item 5): once every registry
name has a hash-green driver row, the window rotation must stay mechanical
— no name's newest driver evidence may fall more than MAX_STALE_ROUNDS
behind unless the current window refreshes it. These tests pin both the
rule's logic (on synthetic CORRECTNESS files) and that the REAL repo state
satisfies it (the committed window is a valid rotation)."""

from __future__ import annotations

import importlib.util
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_preflight():
    spec = importlib.util.spec_from_file_location(
        "preflight_under_test", os.path.join(REPO, "tools", "preflight.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _write_rounds(tmp_path, rounds: dict[int, dict[str, bool]]) -> None:
    for rnum, names in rounds.items():
        path = tmp_path / f"CORRECTNESS_r{rnum:02d}.json"
        path.write_text(
            json.dumps(
                {n: {"hash_match": ok} for n, ok in names.items()}
            )
        )


def _check_in(pf, tmp_path, window, names):
    """Run _staleness_check against a synthetic repo root."""
    real = os.path.dirname
    orig_abspath = os.path.abspath

    # the helper derives the repo root from its own __file__; point it at
    # tmp_path by faking a tools/ layout there
    tools = tmp_path / "tools"
    tools.mkdir(exist_ok=True)
    pf_path = tools / "preflight.py"
    pf_path.write_text(open(os.path.join(REPO, "tools", "preflight.py")).read())
    spec = importlib.util.spec_from_file_location("pf_tmp", str(pf_path))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert real and orig_abspath  # silence linters
    return mod._staleness_check(set(window), set(names))


def test_incomplete_coverage_reports_but_never_fails(tmp_path):
    pf = _load_preflight()
    _write_rounds(tmp_path, {1: {"a": True}})
    fail, note = _check_in(pf, tmp_path, window={"b"}, names={"a", "b", "c"})
    assert fail == []
    assert "coverage 1/3" in note
    assert "never driver-green" in note


def test_stale_out_of_window_name_fails_once_coverage_complete(tmp_path):
    pf = _load_preflight()
    # a green in r1, b green in r8; upcoming round is 9 → a is 8 rounds
    # stale and not refreshed by the window → violation.
    _write_rounds(tmp_path, {1: {"a": True}, 8: {"b": True}})
    fail, note = _check_in(pf, tmp_path, window={"b"}, names={"a", "b"})
    assert fail == ["a"], note


def test_window_membership_excuses_staleness(tmp_path):
    pf = _load_preflight()
    _write_rounds(tmp_path, {1: {"a": True}, 8: {"b": True}})
    fail, _ = _check_in(pf, tmp_path, window={"a"}, names={"a", "b"})
    assert fail == []


def test_red_rows_do_not_count_as_evidence(tmp_path):
    pf = _load_preflight()
    _write_rounds(
        tmp_path, {1: {"a": True}, 8: {"a": False, "b": True}}
    )
    fail, _ = _check_in(pf, tmp_path, window={"b"}, names={"a", "b"})
    assert fail == ["a"]


def test_within_budget_staleness_passes(tmp_path):
    pf = _load_preflight()
    # upcoming = 9, a last green r4 → 5 rounds == budget → OK
    _write_rounds(tmp_path, {4: {"a": True}, 8: {"b": True}})
    fail, _ = _check_in(pf, tmp_path, window={"b"}, names={"a", "b"})
    assert fail == []


def test_real_repo_state_satisfies_the_rotation_budget():
    """The committed registry window must be a valid rotation against the
    committed CORRECTNESS history — the mechanical guarantee the r13
    verdict asked preflight to enforce."""
    import sys

    sys.path.insert(0, REPO)
    pf = _load_preflight()
    import __spark_entry__ as e

    names = set(e.queries())
    window = set(list(e.queries())[:50])
    fail, note = pf._staleness_check(window, names)
    assert fail == [], note

def test_committed_draft_covers_never_green_names(tmp_path):
    """r16 verdict item 5: a never-driver-green name queued in the
    committed next-round window DRAFT (PLANS.md) must not be reported as
    unqueued — 'NOT in the upcoming window' only fires on rotation drift."""
    pf = _load_preflight()
    _write_rounds(tmp_path, {1: {"a": True}})
    # without a draft: c is unqueued
    fail, note = _check_in(pf, tmp_path, window={"b"}, names={"a", "b", "c"})
    assert fail == []
    assert "1 of them NOT in" in note and "c" in note
    # with a committed draft naming c: 0 unqueued, note cites the draft
    (tmp_path / "PLANS.md").write_text(
        "## Round-9 window DRAFT (blah)\n\nprose\n\n```\n    c\n    b\n```\n"
    )
    fail, note = _check_in(pf, tmp_path, window={"b"}, names={"a", "b", "c"})
    assert fail == []
    assert "0 of them NOT in the upcoming window or the committed r9 draft" in note


def test_newest_draft_wins_when_plans_has_history(tmp_path):
    """PLANS.md keeps old drafts as history; only the highest-numbered one
    is the committed queue."""
    pf = _load_preflight()
    _write_rounds(tmp_path, {1: {"a": True}})
    (tmp_path / "PLANS.md").write_text(
        "## Round-8 window DRAFT\n```\n    c\n```\n"
        "## Round-9 window DRAFT\n```\n    d\n```\n"
    )
    fail, note = _check_in(pf, tmp_path, window={"b"}, names={"a", "b", "c"})
    assert fail == []
    # c is in the r8 draft only — the r9 draft is authoritative → unqueued
    assert "1 of them NOT in the upcoming window or the committed r9 draft" in note


def test_all_names_in_window_is_a_pass_not_a_crash(tmp_path):
    """Degenerate registry-fits-in-window case (ADVICE r14): with every
    name inside the window the oldest-out-of-window min() runs on an empty
    generator — must report, not raise ValueError."""
    pf = _load_preflight()
    _write_rounds(tmp_path, {8: {"a": True, "b": True}})
    fail, note = _check_in(pf, tmp_path, window={"a", "b"}, names={"a", "b"})
    assert fail == []
    assert "r9" in note  # oldest defaults to the upcoming round
