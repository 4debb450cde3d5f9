"""Regenerate the committed golden expected-state parquet for
``cdc10_engine_replay`` (tests/golden/cdc10_expected.parquet).

The flagship replay is deterministic (fixed fixture shape, seed 7,
fixed batch slicing), so its final table state is a constant; committing
it lets the driver's rows+schema+hash oracle cover the engine's own
MERGE pipeline instead of only the query packs.  Run this ONLY after an
intentional semantic change to the engine, then review the diff —
tests/test_golden.py fails on any drift.
"""

from __future__ import annotations

import glob
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cfe_39_spark.queries import REGISTRY  # noqa: E402
from cfe_39_spark.queries.cdcq import _GOLDEN_CDC10  # noqa: E402
from cfe_39_spark.session import get_spark  # noqa: E402


def main() -> None:
    spark = get_spark(master="local[8]", shuffle_partitions=8,
                      app_name="make-golden")
    spark.sparkContext.setLogLevel("ERROR")
    df = REGISTRY["cdc10_engine_replay"].fn(spark, "/root/testdata/sf0.001")
    d = tempfile.mkdtemp(prefix="cfe39-golden-")
    # repartition(1) AFTER any upstream shape: exactly one part file, so
    # the copy below cannot silently truncate the golden (row order is
    # irrelevant — the driver's compare and test_golden both sort)
    df.repartition(1).write.mode("overwrite").parquet(f"{d}/g")
    parts = glob.glob(f"{d}/g/part-*.parquet")
    assert len(parts) == 1, f"expected exactly one part file, got {parts}"
    part = parts[0]
    os.makedirs(os.path.dirname(_GOLDEN_CDC10), exist_ok=True)
    shutil.copy(part, _GOLDEN_CDC10)
    shutil.rmtree(d, ignore_errors=True)
    print(f"wrote {_GOLDEN_CDC10}: {df.count()} rows")
    spark.stop()


if __name__ == "__main__":
    main()
