"""Lineage / metrics sink (SURVEY.md §2.1 S5, FIXTURES.md F5).

Two metric surfaces, matching the reference daemon's operational split:

  * **Lineage** (data-plane): per micro-batch x source-partition — offsets
    covered, rows applied, snapshot id, wall time.  Written by the apply
    pipeline itself, so it exists in batch-replay mode too.
  * **Engine metrics** (control-plane): per-trigger StreamingQueryProgress
    from a ``StreamingQueryListener`` — input rows, processing rate,
    trigger duration breakdown.  This is what an operator dashboards;
    it observes the stream from outside the apply pipeline.

Records are tiny (P rows per batch) so they are appended driver-side via
pyarrow — no Spark job for bookkeeping.  ``read_lineage`` /
``read_stream_metrics`` expose them back as DataFrames.
"""

from __future__ import annotations

import json
import os
import uuid

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQueryListener

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


# ------------------------------------------------------------------ #
# S5 control-plane: StreamingQueryListener -> per-trigger progress
# ------------------------------------------------------------------ #
METRICS_SCHEMA = pa.schema(
    [
        ("query_name", pa.string()),
        ("run_id", pa.string()),
        ("batch_id", pa.int64()),
        ("timestamp", pa.string()),
        ("num_input_rows", pa.int64()),
        ("input_rows_per_sec", pa.float64()),
        ("processed_rows_per_sec", pa.float64()),
        ("trigger_ms", pa.int64()),
        ("addbatch_ms", pa.int64()),
    ]
)


def metrics_dir(table_root: str) -> str:
    return os.path.join(table_root, "stream_metrics")


class EngineMetricsListener(StreamingQueryListener):
    """Persist every StreamingQueryProgress beside the table (engine-level
    throughput/progress metrics — the reference daemon's operational
    surface).  Listener callbacks run on a driver-side event thread AFTER
    the trigger commits, so writing here never blocks the hot path; one
    tiny parquet file per trigger is the same cost class as the lineage
    sink and is queryable with the same reader."""

    def __init__(self, table_root: str):
        self._dir = metrics_dir(table_root)

    def onQueryStarted(self, event):  # noqa: N802, D102
        pass

    def onQueryProgress(self, event):  # noqa: N802
        p = event.progress
        dur = p.durationMs or {}
        os.makedirs(self._dir, exist_ok=True)
        tbl = pa.Table.from_pydict(
            {
                "query_name": [p.name],
                "run_id": [str(p.runId)],
                "batch_id": [int(p.batchId)],
                "timestamp": [p.timestamp],
                "num_input_rows": [int(p.numInputRows)],
                "input_rows_per_sec": [float(p.inputRowsPerSecond or 0.0)],
                "processed_rows_per_sec": [float(p.processedRowsPerSecond or 0.0)],
                "trigger_ms": [int(dur.get("triggerExecution", 0))],
                "addbatch_ms": [int(dur.get("addBatch", 0))],
            },
            schema=METRICS_SCHEMA,
        )
        pq.write_table(
            tbl,
            os.path.join(
                self._dir, f"progress-{int(p.batchId)}-{uuid.uuid4().hex[:8]}.parquet"
            ),
        )

    def onQueryIdle(self, event):  # noqa: N802, D102
        pass

    def onQueryTerminated(self, event):  # noqa: N802
        # terminal marker: lets an operator distinguish "stream ended" from
        # "stream stopped reporting" without scraping driver logs
        os.makedirs(self._dir, exist_ok=True)
        marker = {
            "run_id": str(event.runId),
            "exception": str(event.exception) if event.exception else None,
        }
        with open(
            os.path.join(self._dir, f"terminated-{uuid.uuid4().hex[:8]}.json"), "w"
        ) as f:
            json.dump(marker, f)


def read_stream_metrics(spark: SparkSession, table_root: str) -> DataFrame:
    return spark.read.parquet(os.path.join(metrics_dir(table_root), "progress-*.parquet"))


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
