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
