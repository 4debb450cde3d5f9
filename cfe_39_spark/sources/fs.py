"""Tiny filesystem abstraction for the table format's atomic metadata ops.

SURVEY.md §7 step 2 hard part #1: the commit protocol needs exactly three
primitives — write-then-atomic-rename, read, list.  On local FS (sandbox)
``os.replace`` gives POSIX atomic rename; on HDFS/S3 the same interface maps
to ``rename()`` / conditional PUT.  Keeping the surface this small is what
makes the engine portable to a real cluster without touching commit logic.
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Any


def write_atomic(path: str, data: str) -> None:
    """Write ``data`` to ``path`` atomically (tmp file + fsync + rename)."""
    d = os.path.dirname(path)
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, prefix=".tmp-", suffix=".inprogress")
    try:
        with os.fdopen(fd, "w") as f:
            f.write(data)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)  # atomic on POSIX; HDFS rename on a cluster
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def write_json_atomic(path: str, obj: Any) -> None:
    write_atomic(path, json.dumps(obj, sort_keys=True))


def read_json(path: str) -> Any:
    with open(path) as f:
        return json.load(f)


def read_text(path: str) -> str:
    with open(path) as f:
        return f.read()


def append_line(path: str, line: str) -> None:
    """Append one line (single-writer log; maps to HDFS append / an object-
    store per-commit marker object on a cluster)."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "a") as f:
        f.write(line + "\n")
        f.flush()
        os.fsync(f.fileno())


def exists(path: str) -> bool:
    return os.path.exists(path)


def listdir(path: str) -> list[str]:
    return sorted(os.listdir(path)) if os.path.isdir(path) else []


def remove_tree(path: str) -> None:
    import shutil

    shutil.rmtree(path, ignore_errors=True)


class mutex:
    """O_EXCL advisory lock (context manager) for the commit critical
    section: on a POSIX FS, ``open(O_CREAT|O_EXCL)`` is atomic, which
    linearizes concurrent local writers; on an object store the same role
    is played by the catalog's compare-and-swap (documented trade-off —
    the lock guards only the metadata swap, never data writes, so the
    held-time is milliseconds regardless of batch size)."""

    def __init__(self, path: str, timeout_s: float = 30.0, stale_s: float = 60.0):
        self.path = path
        self.timeout_s = timeout_s
        self.stale_s = stale_s  # break locks left by a crashed holder

    def __enter__(self):
        import time

        os.makedirs(os.path.dirname(self.path), exist_ok=True)
        deadline = time.monotonic() + self.timeout_s
        while True:
            try:
                fd = os.open(self.path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.write(fd, str(os.getpid()).encode())
                os.close(fd)
                return self
            except FileExistsError:
                try:
                    import time as _t

                    if _t.time() - os.path.getmtime(self.path) > self.stale_s:
                        os.unlink(self.path)  # crashed holder; break the lock
                        continue
                except FileNotFoundError:
                    continue
                if time.monotonic() > deadline:
                    raise TimeoutError(f"commit lock held too long: {self.path}")
                time.sleep(0.01)

    def __exit__(self, *exc):
        try:
            os.unlink(self.path)
        except FileNotFoundError:
            pass
        return False
