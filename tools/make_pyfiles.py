#!/usr/bin/env python
"""Build the --py-files archive for spark-submit.

Zips the `cfe_39_spark` package (source only, deterministic order, no
bytecode) so executors can import it:

    python tools/make_pyfiles.py dist/cfe39_spark.zip
    spark-submit --py-files dist/cfe39_spark.zip tools/submit_ingest.py ...

Deterministic output (sorted entries, zeroed timestamps) so the archive
hash is reproducible from the source tree — a cluster deploy can verify
the artifact matches the reviewed revision.
"""

from __future__ import annotations

import os
import sys
import zipfile

PKG = "cfe_39_spark"


def build(out_path: str, repo_root: str | None = None) -> list[str]:
    root = repo_root or os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    os.makedirs(os.path.dirname(os.path.abspath(out_path)) or ".", exist_ok=True)
    entries = []
    for dirpath, dirnames, filenames in os.walk(os.path.join(root, PKG)):
        dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
        for fn in sorted(filenames):
            if fn.endswith(".py"):
                full = os.path.join(dirpath, fn)
                entries.append((os.path.relpath(full, root), full))
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for arcname, full in entries:
            with open(full, "rb") as f:
                data = f.read()
            info = zipfile.ZipInfo(arcname, date_time=(1980, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            z.writestr(info, data)
    return [a for a, _ in entries]


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "dist/cfe39_spark.zip"
    names = build(out)
    print(f"{out}: {len(names)} files")
