"""Python-surface demo queries (SURVEY.md §2.5 U2/U4/U5): grouped-map
``applyInPandas``, grouped-agg pandas UDAF, and a Spark-4 UDTF.

The engine's hot path deliberately never uses these shapes (JVM built-ins
win everywhere the semantics allow — SURVEY.md §2.5); each query here
demonstrates the surface on a cold-path analytics task, Arrow-batched, and
keeps its output exact-integer so the DuckDB oracle matches bit-for-bit.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf

from .base import register, table


@register(
    "ud01_grouped_map_stats",
    """SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
              CAST(sum(n_chars) AS BIGINT) AS chars_sum,
              CAST(max(doc_id) AS BIGINT) AS max_doc_id
       FROM documents GROUP BY source""",
)
def ud01(spark, sf):
    """U2 grouped-map ``applyInPandas``: one pandas frame per source group,
    reduced to exact-integer stats.  The group key partitions the shuffle;
    each group's frame arrives as one Arrow batch — the right surface when
    per-group logic genuinely needs pandas (here it doesn't; the point is
    demonstrating the contract: schema-declared output, no per-row Python).
    Skew note: a hot group lands on one task — at scale, pre-aggregate or
    salt before applyInPandas; never feed it a power-law key raw."""

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "source": [pdf["source"].iloc[0]],
                "n_docs": [len(pdf)],
                "chars_sum": [int(pdf["n_chars"].sum())],
                "max_doc_id": [int(pdf["doc_id"].max())],
            }
        )

    return (
        table(spark, sf, "documents")
        .groupBy("source")
        .applyInPandas(
            stats, "source string, n_docs long, chars_sum long, max_doc_id long"
        )
    )


def _chars_sq_sum_udaf():
    # built lazily: pandas_udf parses its DDL type against the active
    # session, so module import must stay session-free
    @pandas_udf("long")
    def chars_sq_sum(v: pd.Series) -> int:
        # exact int64 arithmetic: order-insensitive, so Spark/DuckDB agree
        return int((v.astype("int64") ** 2).sum())

    return chars_sq_sum


@register(
    "ud02_grouped_agg_udaf",
    """SELECT source, CAST(sum(n_chars * n_chars) AS BIGINT) AS chars_sq_sum
       FROM documents GROUP BY source""",
)
def ud02(spark, sf):
    """U4 grouped-agg pandas UDAF: Σ n_chars² per source (the second moment
    a variance/quality monitor needs), as a vectorized Arrow aggregate
    inside a normal ``groupBy().agg()``.  Unlike applyInPandas, a grouped
    aggregate gets no map-side partial combine — every row crosses the
    shuffle — which is why the engine keeps UDAFs off the hot path and the
    hot aggregations on ``max_by``/``sum`` built-ins."""
    return (
        table(spark, sf, "documents")
        .groupBy("source")
        .agg(_chars_sq_sum_udaf()("n_chars").alias("chars_sq_sum"))
    )


class _ChunkExpander:
    """U5 UDTF: expand one document into fixed-128-char training chunks —
    the change-event-expander shape (1 input row -> N output rows) that a
    generator-side pipeline uses to split oversize payloads."""

    def eval(self, n_chars: int):  # noqa: D102
        if n_chars is None:
            return
        for i in range((int(n_chars) + 127) // 128):
            yield i, min(128, int(n_chars) - i * 128)


@register(
    "ud03_udtf_chunks",
    """SELECT doc_id, chunk_idx,
              CAST(least(128, n_chars - chunk_idx * 128) AS BIGINT) AS chunk_len
       FROM (SELECT doc_id, n_chars,
                    unnest(range(0, CAST(ceil(n_chars / 128.0) AS BIGINT))) AS chunk_idx
             FROM documents)""",
)
def ud03(spark, sf):
    """U5 UDTF via LATERAL join: every document row fans out to its chunk
    rows.  Row-at-a-time Python by nature (each eval yields a generator),
    so strictly a cold-path/demo surface — the hot-path equivalent is the
    pure-JVM explode(sequence(...)) used by the dedup shingler."""
    table(spark, sf, "documents").createOrReplaceTempView("ud03_docs")
    spark.udtf.register(
        "ud03_chunker", udtf(_ChunkExpander, returnType="chunk_idx: bigint, chunk_len: bigint")
    )
    return spark.sql(
        """SELECT d.doc_id, c.chunk_idx, c.chunk_len
           FROM ud03_docs d, LATERAL ud03_chunker(d.n_chars) c"""
    )
