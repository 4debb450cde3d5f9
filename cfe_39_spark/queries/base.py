"""Query-contract registry (SURVEY.md §2.3/§5.2 item 1).

Each registered query is a pair: a PySpark callable ``(spark, sf_dir) ->
DataFrame`` and (when SQL-expressible) a DuckDB-runnable ANSI-SQL oracle
string over the same parquet tables.  The driver compares the two at
sf=0.01 (row count + schema + order-insensitive value hash), so both sides
must agree on column NAMES and value REPRESENTATION exactly:

  * every computed column is aliased identically on both sides;
  * doubles that pass through aggregation are rounded (summation order
    differs between engines by ULPs — rounding removes the noise);
  * integer sums are cast to BIGINT on the DuckDB side (DuckDB widens
    SUM(INTEGER) to HUGEINT, Spark keeps LongType);
  * no raw array/map-typed output columns in oracled queries (engines
    stringify them differently) — arrays are reduced to scalars first.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    sql: str | None  # DuckDB oracle; None => driver does rows-only check
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def register(name: str, sql: str | None):
    """Decorator: add a (spark_fn, oracle_sql) pair to the contract."""

    def deco(fn):
        REGISTRY[name] = Query(name, fn, sql, doc=(fn.__doc__ or "").strip())
        return fn

    return deco


def table(
    spark: SparkSession, sf_dir: str, name: str, spread: bool = False
) -> DataFrame:
    """Load one driver testdata table (TESTDATA.md:13-15).

    ``spread=True``: repartition up to the cluster's core count when the
    scan yields fewer partitions — the testdata files are single-row-group
    parquet (unsplittable), which pins expression-heavy per-row work (e.g.
    shingling) to one task.  At production scale inputs are many-file and
    the condition is false, so no shuffle is added there.
    """
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if spread:
        target = spark.sparkContext.defaultParallelism
        # file count proxies scan partitions for single-row-group files and
        # avoids instantiating the RDD lineage just to count partitions
        if len(df.inputFiles()) < target:
            df = df.repartition(target)
    return df
