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


@atexit.register
def _cleanup() -> None:
    while _DIRS:
        shutil.rmtree(_DIRS.pop(), ignore_errors=True)
