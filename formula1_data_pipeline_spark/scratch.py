"""Process-lifetime scratch directories.

Several catalog queries and streaming drivers land intermediate state
(txn tables, stream sources, checkpoints) in ``tempfile.mkdtemp``
working dirs. The DataFrame each returns is LAZY — it re-reads the
landed files on every downstream action — so the dir cannot be
removed when the function returns; but never removing it leaks a
corpus-sized tree per invocation into /tmp across repeated bench/gate
runs (round-6 ADVICE). ``scratch_dir`` threads the needle: the dir
lives as long as the process (any still-held DataFrame stays
readable) and is removed at interpreter exit.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

_SCRATCH_DIRS: list[str] = []


def _cleanup() -> None:
    while _SCRATCH_DIRS:
        shutil.rmtree(_SCRATCH_DIRS.pop(), ignore_errors=True)


atexit.register(_cleanup)


def scratch_dir(prefix: str) -> str:
    """A ``tempfile.mkdtemp`` dir registered for removal at process
    exit — use for any query-lifetime landing/checkpoint tree."""
    path = tempfile.mkdtemp(prefix=prefix)
    _SCRATCH_DIRS.append(path)
    return path
