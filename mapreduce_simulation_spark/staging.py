"""Process-lifetime staging directories for queries that re-materialize a
table in another format (text dir, CSV, file streams).

The staged files must outlive the *builder* call — the returned DataFrame
or drained memory-sink table may be executed (or re-executed) by the
caller at any point afterwards — so the directories are removed at
interpreter exit rather than on return. Long-lived services embedding the
engine get bounded /tmp usage instead of a leak per query build.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

_DIRS: list[str] = []


def staging_dir(prefix: str) -> str:
    """A mkdtemp directory that is removed when the process exits."""
    path = tempfile.mkdtemp(prefix=prefix)
    _DIRS.append(path)
    return path


_KEYED: dict[tuple[str, str], str] = {}


def keyed_staging_dir(prefix: str, key: str) -> tuple[str, bool]:
    """A staging directory REUSED for the lifetime of the process when the
    same (prefix, key) is requested again — for deterministic layout
    steps (e.g. the month-partitioned DPP fact copy of one sf_dir) whose
    re-write per repeated build would otherwise dominate the query being
    measured. Returns (path, already_staged): the caller skips its write
    when already_staged is True. Cleanup at exit as usual.

    No invalidation: the cache assumes the source data behind ``key`` is
    immutable for the process lifetime (true for the bench/verify
    lifecycle, where testdata directories are only regenerated between
    driver rounds, i.e. between processes). If in-process regeneration of
    a source path ever becomes possible, callers should fold a cheap
    content fingerprint (e.g. source-parquet mtime) into ``key``.

    Single-threaded driver assumed (like invalidation above): callers
    follow an isdir-then-build-then-os.rename pattern inside the returned
    directory, so two concurrent builders of the same key would race on
    the shared _tmp_* dir and the rename. That matches Spark's driver
    model — one query plan is built at a time on the driver thread; a
    multi-threaded embedding would need a per-key lock around the build
    or a unique tmp suffix plus rename-if-absent (first rename wins,
    losers discard)."""
    import os

    k = (prefix, key)
    if k in _KEYED and os.path.isdir(_KEYED[k]):
        return _KEYED[k], True
    path = tempfile.mkdtemp(prefix=prefix)
    _DIRS.append(path)
    _KEYED[k] = path
    return path, False


_READ_CACHE = None  # lazily-built WeakKeyDictionary[SparkSession, dict]


def read_staged(spark, path: str):
    """``spark.read.parquet`` with a per-session, signature-guarded
    DataFrame cache — the staged-artifact twin of ``tables.load_table``'s
    fixture cache (r14), applied registry-wide per the r14 verdict.

    Every ``spark.read.parquet`` call costs ~0.12-0.25 s of driver-side
    py4j + file-listing + footer-schema work. Operators that serve staged
    integer artifacts (the shingle store, minhash signatures, tf index,
    IVF/PQ codebooks) pay that on EVERY query construction — a fixed
    plan-BUILD floor measured at ~0.5 s of dedup_minhash_lsh's 1.35 s
    total (r15 stage bisection, two staged reads + fixtures). DataFrames
    are immutable logical plans, so reuse is safe; the cache value is
    guarded by the dataset signature (dir mtime_ns/size + each entry's
    name/mtime_ns/size) so a staging rebuild or scale-probe overwrite
    re-reads, and ``useV1SourceList`` is in the key because V1-vs-V2
    relation resolution happens at read time (same two gotchas as the
    load_table cache — see tables.py).
    """
    global _READ_CACHE
    if _READ_CACHE is None:
        import weakref

        _READ_CACHE = weakref.WeakKeyDictionary()
    from .tables import _evict_stopped_sessions, _file_sig

    from .operators.planmemo import note_dep

    _evict_stopped_sessions(_READ_CACHE)
    sig = _file_sig(path)
    v1list = spark.conf.get("spark.sql.sources.useV1SourceList", "")
    per_session = _READ_CACHE.setdefault(spark, {})
    cached = per_session.get((path, v1list))
    if cached is not None and sig is not None and cached[0] == sig:
        note_dep(("staged", path), cached[1])
        return cached[1]
    df = spark.read.parquet(path)
    per_session[(path, v1list)] = (sig, df)
    note_dep(("staged", path), df)
    return df


@atexit.register
def _cleanup() -> None:
    _KEYED.clear()
    while _DIRS:
        shutil.rmtree(_DIRS.pop(), ignore_errors=True)
