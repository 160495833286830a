"""Property-based tests (hypothesis) for the reference-contract pure
functions — the line/KV parsing and placement-hash semantics that every
pipe operator rests on. The reference pins these behaviors in code
(worker/__main__.py:62-65 hash, :182-184 key split); here they are pinned
as properties over arbitrary inputs instead of a handful of examples."""

from __future__ import annotations

import hashlib

from hypothesis import given, settings
from hypothesis import strategies as st

from mapreduce_simulation_spark.operators.pipe import _md5_mod, _split_kv

# Text without newlines (a "line" by construction); tabs allowed. Lone
# surrogates are excluded (category Cs): reference keys come from decoded
# UTF-8 file bytes, where unpaired surrogates cannot occur — hypothesis
# correctly flagged them as outside the encodable domain.
line_text = st.text(
    alphabet=st.characters(
        exclude_characters="\n\r", exclude_categories=["Cs"]
    ),
    max_size=200,
)


@given(line_text)
@settings(max_examples=300, deadline=None)
def test_split_kv_matches_reference_partition_semantics(line):
    """key must equal line.partition('\\t')[0] and value the remainder —
    the reference's exact rule, including the no-tab ('' value) and
    leading-tab ('' key) edges."""
    key, value = _split_kv(line)
    head, sep, tail = line.partition("\t")
    assert key == head
    assert value == tail
    # reconstruction: splitting is lossless when a tab was present
    if sep:
        assert f"{key}\t{value}" == line


@given(line_text, st.integers(min_value=1, max_value=1000))
@settings(max_examples=300, deadline=None)
def test_md5_mod_range_and_stability(key, n):
    """Placement hash lands in [0, n) and is a pure function of the key
    bytes (the property task reassignment relies on: replaying a task
    re-creates identical partition files)."""
    p = _md5_mod(key, n)
    assert 0 <= p < n
    assert p == _md5_mod(key, n)
    assert p == int(hashlib.md5(key.encode("utf-8")).hexdigest(), 16) % n


@given(st.lists(line_text, max_size=50), st.integers(min_value=1, max_value=8))
@settings(max_examples=100, deadline=None)
def test_md5_mod_partitions_form_a_partition(keys, n):
    """Routing a set of keys never loses or duplicates a key across
    partition buckets (total function, disjoint by construction)."""
    buckets: dict[int, list[str]] = {}
    for k in keys:
        buckets.setdefault(_md5_mod(k, n), []).append(k)
    flat = [k for b in buckets.values() for k in b]
    assert sorted(flat) == sorted(keys)
