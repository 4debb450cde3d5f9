"""Lineage / metrics sink (SURVEY.md §2.1 S5, FIXTURES.md F5).

Per micro-batch x source-partition: offsets covered, rows applied, snapshot
id, wall time.  Records are tiny (P rows per batch) so they are appended
driver-side via pyarrow — no Spark job for bookkeeping.  ``read_lineage``
exposes them back as a DataFrame for the metrics queries.
"""

from __future__ import annotations

import os
import uuid

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession

LINEAGE_SCHEMA = pa.schema(
    [
        ("batch_id", pa.string()),
        ("snapshot_id", pa.int64()),
        ("src_partition", pa.int32()),
        ("min_offset", pa.int64()),
        ("max_offset", pa.int64()),
        ("events_in", pa.int64()),
        ("rows_applied", pa.int64()),
        ("wall_ms", pa.int64()),
    ]
)


def lineage_dir(table_root: str) -> str:
    return os.path.join(table_root, "lineage")


def write_lineage(table_root: str, result) -> None:
    """Append one batch's per-partition lineage records (ApplyResult)."""
    if result.noop or not result.per_partition:
        return
    d = lineage_dir(table_root)
    os.makedirs(d, exist_ok=True)
    rows = result.per_partition
    tbl = pa.Table.from_pydict(
        {
            "batch_id": [result.batch_id] * len(rows),
            "snapshot_id": [result.snapshot_id] * len(rows),
            "src_partition": [r["src_partition"] for r in rows],
            "min_offset": [r["min_offset"] for r in rows],
            "max_offset": [r["max_offset"] for r in rows],
            "events_in": [r["events_in"] for r in rows],
            "rows_applied": [r["rows_applied"] for r in rows],
            "wall_ms": [result.wall_ms] * len(rows),
        },
        schema=LINEAGE_SCHEMA,
    )
    pq.write_table(tbl, os.path.join(d, f"lineage-{result.batch_id}-{uuid.uuid4().hex[:8]}.parquet"))


def read_lineage(spark: SparkSession, table_root: str) -> DataFrame:
    return spark.read.parquet(lineage_dir(table_root))


def throughput_summary(spark: SparkSession, table_root: str) -> DataFrame:
    """Events/sec per batch from lineage records (T2-style metric rollup)."""
    from pyspark.sql import functions as F

    ln = read_lineage(spark, table_root)
    return (
        ln.groupBy("batch_id", "snapshot_id", "wall_ms")
        .agg(
            F.sum("events_in").alias("events_in"),
            F.sum("rows_applied").alias("rows_applied"),
        )
        .withColumn(
            "events_per_sec",
            F.col("events_in") / (F.col("wall_ms") / F.lit(1000.0)),
        )
    )
