"""Predicate DML — ``delete_where`` / ``update_where`` (the Iceberg
``DELETE FROM`` / ``UPDATE`` role, BASELINE.json north_star's "lake
upsert" surface completed for OUT-OF-BAND corrections).

A CDC table's state is normally written only by the change stream, but a
real lake deployment also needs direct row-level DML that bypasses the
log: GDPR erasure, bad-upstream-data correction, backfill fixes.  Both
operators here are copy-on-write group rewrites that slot into the same
snapshot/commit/changelog machinery the stream uses, so every downstream
surface keeps working:

* **O(matching groups), never O(table)** — one shuffle-free column-pruned
  scan finds the bucket groups holding ANY raw row matching the
  predicate (a superset is fine: the rewrite re-evaluates on resolved
  winners; a false-positive group just gets an incidental compaction),
  then only those groups are rewritten.  At 10^10 rows a delete of one
  key rewrites ~1/B of the table's files.
* **Mirror-convergent** — DML emits change rows (``kind="changelog"``)
  like any COW apply, and stamps the affected rows with an ordering
  triple STRICTLY ABOVE their previous version (event_time bumped to the
  DML wall clock, or offset+1 when the row's event time is already at or
  past it).  A mirror tailing ``read_changes`` therefore applies the DML
  through the normal LWW rule and converges to the primary's state —
  the invariant the whole engine sells.  Consequences, documented as
  semantics: a redelivery of the pre-DML winning event no-ops (strictly
  below the bump), and a genuinely NEW source event newer than the DML
  timestamp overwrites the manual edit — "the fix holds until the source
  speaks again".
* **Exactly-once** — commits carry ``expected_parent_id``, so a DML
  racing a stream trigger fails loudly and is retried against the new
  snapshot instead of silently dropping the trigger's files.

Zero matching rows ⇒ no commit (returns None); staged files from the
aborted attempt are orphans the existing expiry GC reclaims.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.tokens import n_tok_expr
from ..sources.table import SequenceTable, bucket_expr, lww_resolve

BOOKKEEPING = (
    "_last_offset",
    "_last_event_time",
    "_last_epoch",
    "_last_src_partition",
    "_deleted",
)


@dataclass
class DmlResult:
    snapshot_id: int
    rows_affected: int
    groups_rewritten: int
    wall_ms: int


def _affected_groups(
    spark: SparkSession, table: SequenceTable, snap: dict, predicate: str
) -> list[int]:
    """Bucket groups (ids under the smallest live spec) holding any RAW
    row matching the predicate — one column-pruned, shuffle-free scan
    (only doc_id + the predicate's columns leave the parquet footers).
    Raw rows (not LWW winners) keep this job aggregation-free; the
    superset only costs an incidental compaction of a stale-match group."""
    s_min = table._min_live_spec(snap)
    rows = (
        table._read_files(spark, snap, snap["files"])
        .filter(F.expr(predicate))
        .select(bucket_expr("doc_id", s_min).alias("_g"))
        .distinct()
        .collect()
    )
    return sorted(r["_g"] for r in rows)


def _bump(ts: float):
    """Ordering-triple bump: strictly above the row's current
    (_last_event_time, _last_offset) however the DML wall clock relates
    to source event time (clock skew included), so mirrors applying the
    change rows under plain LWW always accept them."""
    lit_ts = F.lit(ts).cast("timestamp")
    new_et = F.greatest(F.col("_last_event_time"), lit_ts)
    new_off = F.when(
        F.col("_last_event_time") >= lit_ts, F.col("_last_offset") + F.lit(1)
    ).otherwise(F.col("_last_offset"))
    return new_et, new_off


def _run_dml(
    spark: SparkSession,
    table: SequenceTable,
    predicate: str,
    transform,
    op_name: str,
    lineage_extra: dict,
) -> DmlResult | None:
    t0 = time.monotonic()
    snap = table.snapshot()
    groups = _affected_groups(spark, table, snap, predicate)
    if not groups:
        return None
    s_min = table._min_live_spec(snap)
    gset = set(groups)
    target = [e for e in snap["files"] if e["bucket"] % s_min in gset]
    rest = [e for e in snap["files"] if e["bucket"] % s_min not in gset]
    resolved = lww_resolve(table._read_files(spark, snap, target)).persist()
    try:
        # three-valued logic guard: a NULL-evaluating predicate (e.g. a
        # payload column compared on a row with nulls) must read as
        # "not hit", or filter(~hit) would silently DROP the row from
        # the rewrite instead of carrying it
        hit = F.coalesce(F.expr(predicate), F.lit(False)) & ~F.col("_deleted")
        ts = time.time()
        sv = snap["schema_version"]
        bid = f"__{op_name}__-{snap['snapshot_id']}"
        # change set first: zero affected winners ⇒ abort commit-free
        # (the raw-row group scan matched only stale versions)
        change_files = table._write_data_files(
            transform(resolved.filter(hit), ts),
            snap["n_buckets"],
            sv,
            batch_tag=f"{bid}chg",
            kind="changelog",
        )
        rows = sum(e["rows"] for e in change_files)
        if rows == 0:
            return None
        rewritten = transform(resolved.filter(hit), ts).unionByName(
            resolved.filter(~hit)
        )
        new_files = table._write_data_files(
            rewritten,
            snap["n_buckets"],
            sv,
            batch_tag=bid,
            sort_cols=snap.get("sort_order"),
            bloom=snap.get("bloom_filter"),
        )
        wall_ms = int((time.monotonic() - t0) * 1000)
        sid = table.commit(
            bid,
            new_files,
            rest,
            lineage={
                "dml": op_name,
                "predicate": predicate,
                "rows_affected": rows,
                "groups_rewritten": groups,
                "wall_ms": wall_ms,
                **lineage_extra,
            },
            change_files=change_files,
            expected_parent_id=snap["snapshot_id"],
        )
        return DmlResult(sid, rows, len(groups), wall_ms)
    finally:
        resolved.unpersist()


def delete_where(
    spark: SparkSession, table: SequenceTable, predicate: str
) -> DmlResult | None:
    """Row-level DELETE by SQL predicate over the user columns (Iceberg
    ``DELETE FROM t WHERE ...``).  Matching live rows become tombstones
    (payload nulled, ``_deleted`` true) with a bumped ordering triple —
    see the module docstring for cost, mirror-convergence and
    redelivery/resurrection semantics."""
    snap = table.snapshot()
    user_fields = table.user_schema(snap).fields

    def to_tombstones(df: DataFrame, ts: float) -> DataFrame:
        new_et, new_off = _bump(ts)
        cols = [
            F.col("doc_id")
            if f.name == "doc_id"
            else F.lit(None).cast(f.dataType).alias(f.name)
            for f in user_fields
        ]
        return df.select(
            *cols,
            new_off.alias("_last_offset"),
            new_et.alias("_last_event_time"),
            F.col("_last_epoch"),
            F.col("_last_src_partition"),
            F.lit(True).alias("_deleted"),
        )

    return _run_dml(spark, table, predicate, to_tombstones, "delete_where", {})


def update_where(
    spark: SparkSession,
    table: SequenceTable,
    set_exprs: dict[str, str],
    predicate: str,
) -> DmlResult | None:
    """Row-level UPDATE by SQL predicate (Iceberg ``UPDATE t SET ...
    WHERE ...``).  ``set_exprs`` maps user columns to SQL expressions
    evaluated against the row's PRE-update values (standard UPDATE
    semantics — all right-hand sides see the old row) and cast to the
    column's current type.  ``doc_id`` is the merge key and immutable.
    The ``n_tok`` invariant column is recomputed automatically when
    ``tokens`` is set without an explicit ``n_tok``."""
    snap = table.snapshot()
    user_fields = table.user_schema(snap).fields
    known = {f.name for f in user_fields}
    bad = sorted(set(set_exprs) - known)
    if bad:
        raise ValueError(f"update_where: unknown columns {bad}")
    if "doc_id" in set_exprs:
        raise ValueError("update_where: doc_id is the merge key (immutable)")
    if not set_exprs:
        raise ValueError("update_where: empty SET")
    dtypes = {f.name: f.dataType for f in user_fields}

    def apply_set(df: DataFrame, ts: float) -> DataFrame:
        new_et, new_off = _bump(ts)
        cols = []
        for f in user_fields:
            if f.name in set_exprs:
                c = F.expr(set_exprs[f.name]).cast(f.dataType)
            elif f.name == "n_tok" and "tokens" in set_exprs:
                c = n_tok_expr(F.expr(set_exprs["tokens"]).cast(dtypes["tokens"]))
            else:
                c = F.col(f.name)
            cols.append(c.alias(f.name))
        return df.select(
            *cols,
            new_off.alias("_last_offset"),
            new_et.alias("_last_event_time"),
            F.col("_last_epoch"),
            F.col("_last_src_partition"),
            F.lit(False).alias("_deleted"),
        )

    return _run_dml(
        spark, table, predicate, apply_set, "update_where",
        {"set": dict(set_exprs)},
    )
