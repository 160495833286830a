"""Byte-parity replay of the reference's literal integration goldens.

The reference ships a fixed corpus (tests/testdata/input/file01-08) and the
exact expected outputs of its two flagship jobs
(tests/testdata/correct/word_count_correct.txt, 266 keys;
grep_correct.txt, 6 lines) — see reference test_integration_00.py:33-38 and
test_integration_01.py:33-40.  Those text fixtures are re-hosted verbatim
under tests/testdata/reference_goldens/ and replayed here through our
pipe_map/pipe_reduce operators with executables that reproduce the
reference's wc_map.sh / wc_reduce.sh / grep_map.py / grep_reduce.py
semantics (written independently — awk, not copies).

Reference executable semantics being reproduced:
  wc_map.sh     `tr '[ \\t]' '\\n' | tr upper lower | awk '{print $1"\\t1"}'`
                — NOTE: tr's SET1 is the four literal bytes ``[``, space,
                tab, ``]``, so brackets are token separators too, and every
                empty segment (leading/trailing/double separators, blank
                lines) emits an EMPTY key.  The golden's first line is the
                empty key with count 9.
  wc_reduce.sh  `cut -f1 | uniq -c | awk '{print $2"\\t"$1}'` — group-count
                over sorted lines, empty key prints as ``\\t<n>``.
  grep_map.py   strip line; skip empty; emit ``1\\t<line>`` when the argv
                query occurs in the lowercased line (default "product").
  grep_reduce.py  pass through the value.

Byte parity holds because with num_partitions=1 our pipe_reduce feeds the
reducer the byte-sorted lines the reference's coreutils-sort + k-way merge
produces, so group order — and therefore output order — is identical.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from mapreduce_simulation_spark.operators.pipe import pipe_map, pipe_reduce
from mapreduce_simulation_spark.sources.text_dir import read_text_dir

GOLDENS = os.path.join(os.path.dirname(__file__), "testdata", "reference_goldens")

# Reference wc_map.sh equivalent: lowercase, split on the literal separator
# set {space, tab, '[', ']'} KEEPING empty segments (single-char split
# regex, not +), one `token\t1` line per segment; a fully-empty line is one
# empty segment.
WC_MAPPER = (
    "awk '{ n = split(tolower($0), w, /[ \\t\\[\\]]/); "
    'if (n == 0) print "\\t1"; '
    'else for (i = 1; i <= n; i++) print w[i] "\\t1" }\''
)

# Reference wc_reduce.sh equivalent: sum contiguous groups (values are all
# "1"), emit `key\tcount` — identical output to `cut|uniq -c|awk` reshaping.
WC_REDUCER = (
    "awk -F'\\t' '{ if (NR > 1 && $1 != prev) { print prev \"\\t\" cnt; cnt = 0 } "
    "prev = $1; cnt += $2 } END { if (NR > 0) print prev \"\\t\" cnt }'"
)

# Reference grep_map.py equivalent: strip, skip empty, substring match on
# the lowercased line, emit `1\t<original stripped line>`.
GREP_MAPPER = (
    "awk -v q=product '{ s = $0; gsub(/^[ \\t]+|[ \\t]+$/, \"\", s); "
    'if (s == "") next; '
    'if (index(tolower(s), q) > 0) print "1\\t" s }\''
)


def _golden(name: str) -> list[str]:
    with open(os.path.join(GOLDENS, "correct", name), encoding="utf-8") as f:
        return f.read().splitlines()


def test_word_count_golden_byte_parity(spark):
    lines = read_text_dir(spark, os.path.join(GOLDENS, "input"))
    mapped = pipe_map(lines, WC_MAPPER)
    reduced = pipe_reduce(mapped, WC_REDUCER, num_partitions=1)
    got = [f"{r.key}\t{r.value}" for r in reduced.collect()]
    want = _golden("word_count_correct.txt")
    assert got == want  # 266 keys incl. the empty-key "\t9" first line
    assert got[0] == "\t9"


def test_grep_golden_byte_parity(spark):
    lines = read_text_dir(spark, os.path.join(GOLDENS, "input"))
    mapped = pipe_map(lines, GREP_MAPPER)
    # Constant key "1" collapses onto one reducer; pass-through reduce is
    # `cat` + value projection, mirroring grep_reduce.py printing the value.
    reduced = pipe_reduce(mapped, "cat", num_partitions=1)
    got = [r.value for r in reduced.collect()]
    assert got == _golden("grep_correct.txt")


def test_word_count_golden_partition_invariant(spark):
    """Same job at 4 partitions: content identical, order = sorted merge of
    per-partition sorted runs — the golden is recovered after a global sort
    (the reference's final output is also a k-way merge of sorted runs)."""
    lines = read_text_dir(spark, os.path.join(GOLDENS, "input"))
    reduced = pipe_reduce(pipe_map(lines, WC_MAPPER), WC_REDUCER, num_partitions=4)
    got = sorted(f"{r.key}\t{r.value}" for r in reduced.collect())
    assert got == sorted(_golden("word_count_correct.txt"))


def test_whitespace_only_line_parity(spark):
    """Pin the empty-token semantics (reference golden's bare-tab key,
    test_worker_05.py:123-124): a whitespace-only line maps to empty-key
    pairs — one per separator-delimited empty segment — and the reducer
    groups them under the empty key; they are NOT silently dropped on the
    pipe path (the engine-native word_count drops '' by declared design,
    SURVEY.md §7 risk note — this test documents the difference)."""
    df = spark.createDataFrame([("  ",), ("a b",)], "value string")
    mapped = pipe_map(df, WC_MAPPER)
    pairs = [(r.key, r.value) for r in mapped.collect()]
    # "  " → three empty segments; "a b" → tokens a, b.
    assert sorted(pairs) == [("", "1")] * 3 + [("a", "1"), ("b", "1")]
    reduced = pipe_reduce(mapped, WC_REDUCER, num_partitions=1)
    out = {r.key: r.value for r in reduced.collect()}
    assert out == {"": "3", "a": "1", "b": "1"}


def test_submit_job_cli_contract_golden_parity(spark, tmp_path):
    """The full submit contract (input dir + mapper/reducer executables +
    nmappers/nreducers → part files) reproduces the reference's golden
    wordcount byte-for-byte — the drop-in path a migrating user's
    `mapreduce-submit` scripts take through tools/mr_submit.py.

    Deliberately UNSORTED comparison: the file must hold the single
    reducer's byte-sorted output in the reducer's print order, exactly as
    the reference writes part-00000."""
    from mapreduce_simulation_spark.operators.pipe import submit_job

    out = str(tmp_path / "out")
    submit_job(
        spark,
        os.path.join(GOLDENS, "input"),
        out,
        WC_MAPPER,
        WC_REDUCER,
        num_mappers=2,
        num_reducers=1,
    )
    parts = sorted(f for f in os.listdir(out) if f.startswith("part-"))
    assert parts == ["part-00000"]
    # Directory-level parity too: the reference job dir holds ONLY part
    # files — no _SUCCESS marker, no .crc checksum siblings.
    assert sorted(os.listdir(out)) == parts
    with open(os.path.join(out, parts[0]), encoding="utf-8") as fh:
        got = fh.read().splitlines()
    assert got == _golden("word_count_correct.txt")
    # The _SUCCESS suppression is scoped to THIS job, not the session:
    # the Hadoop conf is session-global, so submit_job must restore the
    # prior committer setting — a later ordinary write still gets its
    # _SUCCESS marker (ADVICE r7).
    later = str(tmp_path / "later")
    spark.createDataFrame([("x",)], "v string").write.text(later)
    assert os.path.exists(os.path.join(later, "_SUCCESS"))


def test_submit_job_key_to_file_placement(spark, tmp_path):
    """With num_reducers=2 each part file must hold exactly the keys whose
    md5-mod hash maps to its reducer (worker/__main__.py:62-65), each file
    byte-sorted — the documented placement a user diffing against reference
    output relies on."""
    from mapreduce_simulation_spark.operators.pipe import _md5_mod, submit_job

    out = str(tmp_path / "out2")
    submit_job(
        spark,
        os.path.join(GOLDENS, "input"),
        out,
        WC_MAPPER,
        WC_REDUCER,
        num_mappers=2,
        num_reducers=2,
    )
    parts = sorted(f for f in os.listdir(out) if f.startswith("part-"))
    assert parts == ["part-00000", "part-00001"]
    seen: list[str] = []
    for i, name in enumerate(parts):
        with open(os.path.join(out, name), encoding="utf-8") as fh:
            lines = fh.read().splitlines()
        assert lines == sorted(lines), f"{name} not byte-sorted"
        for line in lines:
            key = line.partition("\t")[0]
            assert _md5_mod(key, 2) == i, f"key {key!r} misplaced in {name}"
        seen.extend(lines)
    assert sorted(seen) == sorted(_golden("word_count_correct.txt"))
