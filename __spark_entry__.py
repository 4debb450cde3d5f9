"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship CDC replay end-to-end (fixture → MERGE
pipeline → snapshot read) on sf0.001-scale data; ``queries`` /
``oracle_sql`` expose every implemented operator from SURVEY.md §2 plus
the training-data-pipeline packs (text, dedup, similarity, multimodal) —
one DuckDB-checkable entry each, registered in ``cfe_39_spark.queries``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cfe_39_spark.queries import REGISTRY  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the CDC engine's full replay path (SURVEY.md §3.3) —
    deterministic change-event fixture applied batch-by-batch through the
    dedup → LWW → idempotency-filter → MERGE → snapshot-commit pipeline,
    returning the final table state with JVM-side token checksums."""
    return REGISTRY["cdc10_engine_replay"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ the
    training-data packs).  Each callable takes (spark, sf_dir)."""
    return {name: q.fn for name, q in sorted(REGISTRY.items())}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query — since round 5 EVERY registered
    query carries one (the engine replay hash-checks against a committed
    golden parquet; the pandas kernels against exact SQL reproductions of
    their byte math; the IVF ANN against its embedded recall report)."""
    return {name: q.sql for name, q in sorted(REGISTRY.items()) if q.sql is not None}
