"""Incrementally-maintained aggregate views — the materialized-view
role over a SequenceTable's changelog (SURVEY.md §2.1 S10 consumer side).

A training-data pipeline keeps running aggregates of its sequence table
(tokens per source for mixture weighting, rows per shard for packing
plans, corpus totals for dashboards).  Recomputing `GROUP BY` over 10^10
rows per refresh is absurd when a trigger changes a few thousand keys;
this module maintains any LINEAR aggregate (count, sums — means derive
as sum/count) at **O(changed rows) per refresh**, driven by
``read_changelog``'s net diff with before-images:

* ``insert`` / ``update_after`` rows contribute with weight **+1**,
  ``delete`` / ``update_before`` rows with weight **-1** — the before
  image retracts exactly what the stale state once contributed, so
  updates that move a row BETWEEN groups (a source retag) debit one
  group and credit the other in the same refresh;
* keys a span touched only with stale redeliveries emit nothing from
  ``read_changelog``, so the maintainer never double-counts — the same
  property that makes the mirror exactly-once;
* ``from_snapshot_id=0`` emits the full live state as inserts, so the
  FIRST refresh and an after-retention re-bootstrap are the same code
  path as a steady-state refresh.

Exactly-once refresh on plain storage: the merged aggregate lands in a
snapshot-derived directory (``data-<to_sid>`` — overwrite-idempotent),
and ``_VIEW.json`` (cursor + current data dir) is swapped atomically
AFTER the write; a crash between the two re-runs the same span against
the same old state and overwrites the same directory.  Scale: the delta
agg shuffles O(changed rows), the merge shuffles O(|aggregate|) — the
aggregate is group-cardinality-sized, orders below the table; for a
group space that itself needs a cluster, bucket the view by group hash
(same layout discipline as the table — documented, not needed here).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import fs
from ..sources.table import SequenceTable


class AggregateView:
    """``agg_exprs``: ``{out_col: SQL expr over the table's user
    columns}``, each maintained as ``SUM(expr)``; a ``n_rows`` count
    column is always maintained and groups retract away when it reaches
    zero.  ``group_cols``: the GROUP BY key columns."""

    def __init__(
        self,
        src: SequenceTable,
        view_dir: str,
        group_cols: "list[str]",
        agg_exprs: "dict[str, str]",
    ):
        if not group_cols:
            raise ValueError("AggregateView: group_cols must be non-empty")
        reserved = set(group_cols) | {"n_rows", "_w"}
        bad = sorted(set(agg_exprs) & reserved)
        if bad:
            raise ValueError(f"AggregateView: reserved output names {bad}")
        self.src = src
        self.view_dir = view_dir
        self.group_cols = list(group_cols)
        self.agg_exprs = dict(agg_exprs)

    # -- state ----------------------------------------------------------- #
    def _meta_path(self) -> str:
        return os.path.join(self.view_dir, "_VIEW.json")

    def _load_meta(self) -> dict:
        try:
            return fs.read_json(self._meta_path())
        except FileNotFoundError:
            return {"cursor": 0, "data": None}

    def cursor(self) -> int:
        return int(self._load_meta()["cursor"])

    def read(self, spark: SparkSession) -> DataFrame:
        """The view's current contents (empty-typed before any refresh)."""
        meta = self._load_meta()
        if meta["data"] is None:
            fields = ", ".join(
                [f"`{c}` string" for c in self.group_cols]
                + ["n_rows long"]
                + [f"`{c}` double" for c in self.agg_exprs]
            )
            return spark.createDataFrame([], fields)
        return spark.read.parquet(os.path.join(self.view_dir, meta["data"]))

    # -- refresh --------------------------------------------------------- #
    def refresh(self, spark: SparkSession, auto_rebootstrap: bool = True) -> "int | None":
        """Advance the view to the table head.  Returns the new cursor, or
        None when already current.  ``auto_rebootstrap``: when the cursor
        has fallen behind snapshot retention, rebuild from the full live
        state (changelog-shaped, same code path) instead of raising."""
        meta = self._load_meta()
        cursor = int(meta["cursor"])
        head = self.src.latest_snapshot_id()
        if head == cursor:
            return None
        try:
            diff = self.src.read_changelog(spark, cursor, head)
        except ValueError as e:
            if not (auto_rebootstrap and cursor != 0 and "expired" in str(e)):
                raise
            # cursor expired: rebuild from scratch — from=0 emits the
            # live state as inserts, and the old aggregate is discarded
            meta = {"cursor": 0, "data": None}
            cursor = 0
            diff = self.src.read_changelog(spark, cursor, head)

        w = F.when(
            F.col("_change_type").isin("insert", "update_after"), F.lit(1)
        ).otherwise(F.lit(-1))
        delta = diff.withColumn("_w", w).groupBy(*self.group_cols).agg(
            F.sum("_w").cast("long").alias("n_rows"),
            *[
                F.sum(F.col("_w") * F.expr(e)).alias(c)
                for c, e in self.agg_exprs.items()
            ],
        )
        old = None if meta["data"] is None else spark.read.parquet(
            os.path.join(self.view_dir, meta["data"])
        )
        merged = delta if old is None else old.unionByName(delta)
        out = (
            merged.groupBy(*self.group_cols)
            .agg(
                F.sum("n_rows").cast("long").alias("n_rows"),
                *[F.sum(c).alias(c) for c in self.agg_exprs],
            )
            .filter(F.col("n_rows") != 0)
        )
        data_name = f"data-{head}"
        out.write.mode("overwrite").parquet(os.path.join(self.view_dir, data_name))
        fs.write_json_atomic(
            self._meta_path(), {"cursor": head, "data": data_name}
        )
        # sweep superseded generations AND crash/rebootstrap orphans: any
        # data-* dir the swapped meta does not reference is dead
        for name in fs.listdir(self.view_dir):
            if name.startswith("data-") and name != data_name:
                fs.remove_tree(os.path.join(self.view_dir, name))
        return head
