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


class LockLostError(RuntimeError):
    """A mutex holder's token vanished mid-critical-section (it overran the
    stale budget and a waiter broke the lock, or lost the restore race).
    Semantics match a commit conflict: another writer may have entered —
    re-plan and retry."""


def _rename_file(src: str, dst: str) -> None:
    """The ONE pointer-swap rename primitive.  POSIX ``os.replace``
    overwrites atomically; tests inject non-POSIX backend contracts by
    patching this name (HDFS-style rename refuses to overwrite and raises
    ``FileExistsError`` — ``write_atomic`` handles that with a
    delete+rename fallback; an object store maps ``write_atomic`` to one
    atomic whole-object PUT, making this a plain move)."""
    os.replace(src, dst)


def write_atomic(path: str, data: str) -> None:
    """Write ``data`` to ``path`` atomically (tmp file + fsync + rename).

    Backend contracts (exercised by tests/test_fs_semantics.py):
    * POSIX: overwrite-rename, fully atomic — readers see old or new.
    * HDFS-style rename-no-overwrite: the fallback below deletes the old
      file first, opening a short NO-POINTER window — readers of the
      ``_LATEST`` pointer recover via ``SequenceTable.latest_snapshot_id``'s
      batches-log fallback (the log trails the pointer swap by
      construction, so its newest entry is the last full commit).
    * S3-style object store: one whole-object PUT is atomic, so this maps
      to a single conditional-free PUT; no rename and no fallback needed.
    """
    d = os.path.dirname(path)
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, prefix=".tmp-", suffix=".inprogress")
    try:
        with os.fdopen(fd, "w") as f:
            f.write(data)
            f.flush()
            os.fsync(f.fileno())
        try:
            _rename_file(tmp, path)
        except FileExistsError:
            # HDFS contract: rename never overwrites
            try:
                os.unlink(path)
            except FileNotFoundError:
                pass
            _rename_file(tmp, path)
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


def unlink(path: str, missing_ok: bool = True) -> None:
    """Delete one metadata object (object-store DELETE role)."""
    try:
        os.unlink(path)
    except FileNotFoundError:
        if not missing_ok:
            raise


def getmtime(path: str) -> float:
    """Last-modified time (object-store HEAD role; used only for
    orphan-age grace decisions, never for ordering)."""
    return os.path.getmtime(path)


def touch(path: str) -> None:
    """Refresh a path's mtime (object-store marker-PUT role).  Writers
    stamp a staged commit directory when its data write COMPLETES so the
    orphan-grace clock starts at write end, not job start — a long Spark
    write otherwise leaves the top-level dir's mtime hours stale and a
    concurrent ``expire_snapshots`` would reap the in-flight stage."""
    try:
        os.utime(path, None)
    except OSError:
        pass


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
    held-time is milliseconds regardless of batch size).

    Crash-safety protocol (each piece closes a race a naive stale-break
    has):

    * the lock file holds a unique ``pid:uuid`` token; ``__exit__``
      unlinks only while the file still carries OUR token, so a holder
      that overran ``stale_s`` and was broken can never unlink the next
      holder's lock;
    * a heartbeat thread touches the lock's mtime every ``stale_s / 4``
      while held, so a slow-but-live holder is never judged stale;
    * stale-breaking claims the lock by ATOMIC RENAME to a private trash
      name (only one waiter can win the rename of a given inode), then
      re-stats the claimed file: only if its (st_ino, st_mtime) still
      match the stale observation is it unlinked.  If the claim turns
      out fresh (the mtime advanced between observation and rename), the
      breaker restores it with ``os.link`` — atomic-exclusive, so it
      never clobbers a lock some third writer created in the window;
    * the restore is BEST-EFFORT: if a third waiter acquired in the
      rename->link window, the live holder's lock inode is gone and two
      processes would be inside the critical section.  ``verify()``
      closes that hole — holders call it immediately before their
      irreversible step (the metadata pointer swap); a holder whose
      token no longer sits at ``path`` lost the lock and must abort.
      The heartbeat likewise retries a transiently-missing path (the
      same rename->link window) instead of dying, so a restored holder
      keeps its stale protection."""

    def __init__(self, path: str, timeout_s: float = 30.0, stale_s: float = 60.0):
        self.path = path
        self.timeout_s = timeout_s
        self.stale_s = stale_s  # break locks left by a crashed holder
        self._token = b""
        self._hb_stop = None
        self._hb_thread = None

    def _try_break(self, observed: os.stat_result) -> None:
        """Break the lock at ``path`` iff it is still the exact stale file
        we observed (same inode, same mtime)."""
        import uuid

        trash = f"{self.path}.stale-{uuid.uuid4().hex}"
        try:
            os.rename(self.path, trash)  # atomic claim; losers get ENOENT
        except FileNotFoundError:
            return
        try:
            st = os.stat(trash)
        except FileNotFoundError:
            return
        if (st.st_ino, st.st_mtime_ns) == (observed.st_ino, observed.st_mtime_ns):
            os.unlink(trash)  # confirmed dead holder
            return
        # We claimed a LIVE lock (heartbeat or fresh acquisition raced the
        # rename).  Restore it without clobbering any newer lock: link is
        # atomic-exclusive (EEXIST if a new lock appeared meanwhile).
        try:
            os.link(trash, self.path)
        except FileExistsError:
            pass
        os.unlink(trash)

    def __enter__(self):
        import threading
        import time
        import uuid

        os.makedirs(os.path.dirname(self.path), exist_ok=True)
        deadline = time.monotonic() + self.timeout_s
        token = f"{os.getpid()}:{uuid.uuid4().hex}".encode()
        while True:
            try:
                fd = os.open(self.path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.write(fd, token)
                os.close(fd)
                self._token = token
                break
            except FileExistsError:
                try:
                    st = os.stat(self.path)
                    if time.time() - st.st_mtime > self.stale_s:
                        self._try_break(st)
                        continue
                except FileNotFoundError:
                    continue
                if time.monotonic() > deadline:
                    raise TimeoutError(f"commit lock held too long: {self.path}")
                time.sleep(0.01)
        # heartbeat: a live holder keeps its mtime fresh so waiters never
        # judge it stale, however slow the critical section runs
        self._hb_stop = threading.Event()

        def _beat(stop=self._hb_stop, path=self.path, period=self.stale_s / 4):
            while not stop.wait(period):
                try:
                    os.utime(path)
                except OSError:
                    # transient: a stale-breaker may hold our inode at its
                    # trash name for the rename->restore window — keep
                    # beating so a restored lock regains stale protection
                    # (a genuinely lost lock is caught by verify())
                    continue

        self._hb_thread = threading.Thread(target=_beat, daemon=True)
        self._hb_thread.start()
        return self

    def still_held(self) -> bool:
        """True iff the lock file still carries OUR token."""
        try:
            with open(self.path, "rb") as f:
                return f.read() == self._token
        except OSError:
            return False

    def verify(self) -> None:
        """Raise ``LockLostError`` unless we still hold the lock.  Call
        immediately before the critical section's irreversible step: a
        holder that overran ``stale_s`` (or lost its inode to the
        stale-break restore race) must abort rather than race the waiter
        that legitimately broke in."""
        if not self.still_held():
            raise LockLostError(
                f"commit lock lost (stale-broken) before the metadata swap: "
                f"{self.path}"
            )

    def __exit__(self, *exc):
        if self._hb_stop is not None:
            self._hb_stop.set()
        if self.still_held():
            # unlink only our own lock; if we overran stale_s and were
            # broken, the file now carries the next holder's token
            try:
                os.unlink(self.path)
            except FileNotFoundError:
                pass
        return False
