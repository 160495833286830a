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


@atexit.register
def _cleanup() -> None:
    _KEYED.clear()
    while _DIRS:
        shutil.rmtree(_DIRS.pop(), ignore_errors=True)
