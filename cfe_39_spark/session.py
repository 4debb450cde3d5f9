"""SparkSession factory with the engine's required configuration.

Design notes (SURVEY.md §4.1): everything tunable at the session level is set
here once — Arrow-vectorized Python transfer (mandatory per BASELINE.json:15,
"no per-row Python"), AQE with skew-join backstop, and a shuffle-partition
count sized for the local[32] sandbox.  On a real cluster these are
spark-submit --conf values; nothing in the engine depends on local mode.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))


def engine_conf(builder: SparkSession.Builder, shuffle_partitions: int | None = None):
    """Apply the engine's standard configuration to a builder."""
    sp = shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS
    return (
        builder.config("spark.sql.shuffle.partitions", str(sp))
        # Arrow-batched Python <-> JVM transfer: required so pandas UDFs /
        # mapInArrow move token arrays columnar, never per-row pickled rows.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # AQE: runtime shuffle coalescing + skew-join splitting as a backstop
        # behind the engine's explicit salting (SURVEY.md §4.2 O1).
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Deterministic timestamps between Spark, pyarrow and the DuckDB oracle.
        .config("spark.sql.session.timeZone", "UTC")
        # The target table stores tokens as array<int32>; never let parquet
        # writes rebase or widen timestamps/ints silently.
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.sql.shuffle.spill.compress", "true")
        .config("spark.ui.enabled", "false")
    )


def get_spark(
    master: str | None = None,
    app_name: str = "cfe39-spark-engine",
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) the engine SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` in the sandbox; on a
    real cluster the session arrives from spark-submit and ``master`` is None.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    builder = builder.master(master)
    return engine_conf(builder, shuffle_partitions).getOrCreate()
