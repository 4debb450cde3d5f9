"""The CDC hot path: one micro-batch of change events -> one table snapshot.

Implements SURVEY.md §2.2 C1-C8 as a single declarative Spark plan per
micro-batch, executed by ``apply_batch`` (called from foreachBatch in
streaming mode and from the batch replayer — one pipeline, two drivers,
SURVEY.md §3.3).

Determinism rule (SURVEY.md §4.3): an event wins over stored state iff its
``(event_time, offset)`` pair is lexicographically greater than the row's
``(_last_event_time, _last_offset)``.  Within a batch, LWW keeps the max
pair per key.  One ordering rule everywhere => the final table state is
invariant under batch re-slicing, duplicate delivery, intra-batch shuffling
and parallelism level — the properties the replay tests assert.

Scale notes:
  * Dedup (C1) and LWW (C2) are hash aggregations with map-side partial
    combine — a hot doc_id collapses to ~1 row per map task *before* the
    shuffle.  The default LWW strategy additionally salts the row_number
    window (C3) because a window's partitionBy cannot be split by AQE.
  * The MERGE join (C5) is key-unique on both sides by construction
    (post-LWW batch x one-row-per-key table slice), so no join skew exists
    to defuse; AQE broadcasts the batch side when it is small.
  * Manifest pruning (O3) bounds the slice to files whose bucket AND
    doc_id range can intersect the batch — per-trigger cost is O(batch
    neighborhood), never O(table).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window, functions as F, types as T

from ..functions.tokens import n_tok_expr
from ..schema import ALLOWED_WIDENINGS, BOOKKEEPING_COLS, CDC_META_COLS
from ..sources.table import SequenceTable, bucket_expr


@dataclass
class ApplyResult:
    batch_id: str
    snapshot_id: int
    rows_applied: int
    events_in: int
    noop: bool = False
    wall_ms: int = 0
    per_partition: list[dict] = field(default_factory=list)


def _lex_gt(b_et, b_off, t_et, t_off):
    """(b_et, b_off) > (t_et, t_off), null target => True (new key)."""
    return t_et.isNull() | (b_et > t_et) | ((b_et == t_et) & (b_off > t_off))


# ------------------------------------------------------------------ #
# C1 + C2 + C3: dedup -> last-writer-wins, skew-defused
# ------------------------------------------------------------------ #
def lww_winners(
    events: DataFrame, strategy: str = "salted_window", n_salts: int = 8
) -> DataFrame:
    """Reduce a raw event batch to exactly one winning event per doc_id.

    strategy='salted_window' (default, the spec's mechanism): two-phase
    row_number — phase 1 partitions by (doc_id, salt) so a hot key's events
    spread across ``n_salts`` tasks; phase 2 ranks the <=n_salts survivors
    per key, a provably skew-free window.  strategy='max_by': single hash
    aggregation with map-side combine (benchmarked alternative).
    """
    deduped = events.dropDuplicates(["doc_id", "offset"])  # C1
    cols = deduped.columns
    if strategy == "max_by":
        packed = F.max_by(F.struct(*cols), F.struct("event_time", "offset"))
        return (
            deduped.groupBy("doc_id")
            .agg(packed.alias("_w"))
            .select([F.col(f"_w.{c}").alias(c) for c in cols])
        )
    # salted two-phase window (C3): salt on (doc_id, offset) hash
    salted = deduped.withColumn(
        "_salt", F.pmod(F.xxhash64("doc_id", "offset"), F.lit(n_salts)).cast("int")
    )
    w1 = Window.partitionBy("doc_id", "_salt").orderBy(
        F.col("event_time").desc(), F.col("offset").desc()
    )
    phase1 = (
        salted.withColumn("_rn", F.row_number().over(w1))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_salt")
    )
    w2 = Window.partitionBy("doc_id").orderBy(
        F.col("event_time").desc(), F.col("offset").desc()
    )
    return (
        phase1.withColumn("_rn", F.row_number().over(w2))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


# ------------------------------------------------------------------ #
# C7 write side: schema evolution from the batch's shape
# ------------------------------------------------------------------ #
def evolve_schema(
    table_schema: T.StructType, batch_schema: T.StructType
) -> tuple[T.StructType, list[str]]:
    """Reconcile the table's user schema with an evolved batch schema.

    Returns (new_schema, change_log).  Allowed: add nullable column, widen
    per ALLOWED_WIDENINGS.  ``tokens`` must stay array<int32> — the
    bit-for-bit token invariant (BASELINE.json:15) forbids widening it.
    """
    batch_user = {
        f.name: f for f in batch_schema.fields if f.name not in CDC_META_COLS
    }
    changes: list[str] = []
    out_fields = []
    for f in table_schema.fields:
        bf = batch_user.get(f.name)
        if bf is not None and bf.dataType != f.dataType:
            pair = (f.dataType.simpleString(), bf.dataType.simpleString())
            if f.name == "tokens":
                raise ValueError("tokens is pinned to array<int32>; cannot widen")
            if pair not in ALLOWED_WIDENINGS:
                raise ValueError(f"illegal type change for {f.name}: {pair}")
            out_fields.append(T.StructField(f.name, bf.dataType, True))
            changes.append(f"widen:{f.name}:{pair[0]}->{pair[1]}")
        else:
            out_fields.append(f)
    known = {f.name for f in table_schema.fields}
    for name, bf in batch_user.items():
        if name not in known:
            out_fields.append(T.StructField(name, bf.dataType, True))
            changes.append(f"add:{name}:{bf.dataType.simpleString()}")
    return T.StructType(out_fields), changes


# ------------------------------------------------------------------ #
# C4 + C5 + C6: idempotency filter, MERGE, lineage — one batch apply
# ------------------------------------------------------------------ #
def apply_batch(
    spark: SparkSession,
    table: SequenceTable,
    events: DataFrame,
    batch_id: str | int,
    lww_strategy: str = "salted_window",
    n_salts: int = 8,
) -> ApplyResult:
    """Apply one micro-batch of change events to the table, exactly once.

    Idempotent on batch_id (S6): a replayed batch returns the existing
    snapshot without touching data.  Row-level idempotency (C4) comes from
    the (event_time, offset) monotonicity test against stored bookkeeping —
    table state IS the dedup state, so no Spark state store grows with the
    key space (SURVEY.md §4.3 layer 2).
    """
    t0 = time.monotonic()
    bid = str(batch_id)
    existing = table.find_batch(bid)
    if existing is not None:
        return ApplyResult(bid, existing, 0, 0, noop=True)

    snap = table.snapshot()
    n_buckets = snap["n_buckets"]
    table_schema = table.user_schema(snap)

    # ---- C7: reconcile schemas (metadata-only; no data rewrite) ----
    new_schema, changes = evolve_schema(table_schema, events.schema)
    batch_sv = events.agg(F.max("schema_version")).first()[0]
    sv = max(int(batch_sv or 0), snap["schema_version"])
    register = new_schema if (changes or sv > snap["schema_version"]) else None
    user_cols = [f.name for f in new_schema.fields]

    # ---- C1+C2+C3: one winner per key ----
    winners = lww_winners(events, lww_strategy, n_salts)

    # ---- O3: plan the touched slice ----
    tb = (
        winners.withColumn("_bucket", bucket_expr("doc_id", n_buckets))
        .groupBy("_bucket")
        .agg(F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi"))
        .collect()
    )
    touched = {r["_bucket"] for r in tb}
    bounds = {r["_bucket"]: (r["lo"], r["hi"]) for r in tb}
    rewrite_files, carry_files = table.plan_merge_files(snap, touched, bounds)
    target_slice = table._read_files(spark, snap, rewrite_files, user_schema=new_schema)

    # ---- C4: applies-flag via column-pruned bookkeeping join ----
    bk = target_slice.select("doc_id", "_last_event_time", "_last_offset")
    b = winners.select(
        F.col("doc_id").alias("_b_doc_id"),
        "op",
        "offset",
        "src_partition",
        "epoch",
        "event_time",
        *[
            (F.col(c) if c in winners.columns else F.lit(None)).cast(
                dict(zip(user_cols, [f.dataType for f in new_schema.fields]))[c]
            ).alias(f"_b_{c}")
            for c in user_cols
            if c != "doc_id"
        ],
    )
    w = b.join(bk, b["_b_doc_id"] == bk["doc_id"], "left").withColumn(
        "_applies",
        _lex_gt(
            F.col("event_time"),
            F.col("offset"),
            F.col("_last_event_time"),
            F.col("_last_offset"),
        ),
    ).drop("doc_id", "_last_event_time", "_last_offset")
    w = w.persist()

    # ---- C6: per-partition lineage (source progress + applied counts) ----
    prog = (
        events.groupBy("src_partition")
        .agg(
            F.min("offset").alias("min_offset"),
            F.max("offset").alias("max_offset"),
            F.count(F.lit(1)).alias("events_in"),
        )
        .collect()
    )
    applied_rows = (
        w.filter("_applies").groupBy("src_partition").count().collect()
    )
    applied_by_part = {r["src_partition"]: r["count"] for r in applied_rows}
    per_partition = [
        {
            "src_partition": r["src_partition"],
            "min_offset": r["min_offset"],
            "max_offset": r["max_offset"],
            "events_in": r["events_in"],
            "rows_applied": applied_by_part.get(r["src_partition"], 0),
        }
        for r in sorted(prog, key=lambda x: x["src_partition"])
    ]
    events_in = sum(p["events_in"] for p in per_partition)
    rows_applied = sum(p["rows_applied"] for p in per_partition)

    # ---- C5: MERGE (copy-on-write over the pruned slice) ----
    applies = F.col("_applies") & F.col("_b_doc_id").isNotNull()
    j = target_slice.join(
        w, target_slice["doc_id"] == w["_b_doc_id"], "full_outer"
    )
    is_delete = applies & (F.col("op") == "D")
    merged_cols = [F.coalesce(target_slice["doc_id"], w["_b_doc_id"]).alias("doc_id")]
    for c in user_cols:
        if c == "doc_id":
            continue
        src = F.when(is_delete, F.lit(None)).when(applies, F.col(f"_b_{c}")).otherwise(
            target_slice[c]
        )
        if c == "n_tok":
            # maintain the invariant column if the producer omitted it (C8
            # JVM-side kernel; stays inside whole-stage codegen)
            tok = F.when(is_delete, F.lit(None)).when(applies, F.col("_b_tokens")).otherwise(target_slice["tokens"])
            src = F.coalesce(src, n_tok_expr(tok))
        merged_cols.append(src.alias(c))
    merged_cols += [
        F.when(applies, F.col("offset")).otherwise(target_slice["_last_offset"]).alias("_last_offset"),
        F.when(applies, F.col("event_time")).otherwise(target_slice["_last_event_time"]).alias("_last_event_time"),
        F.when(applies, F.col("epoch")).otherwise(target_slice["_last_epoch"]).alias("_last_epoch"),
        F.when(is_delete, F.lit(True))
        .when(applies, F.lit(False))
        .otherwise(F.coalesce(target_slice["_deleted"], F.lit(False)))
        .alias("_deleted"),
    ]
    merged = j.select(merged_cols)

    new_files = table._write_data_files(merged, n_buckets, sv, batch_tag=bid)
    w.unpersist()

    wall_ms = int((time.monotonic() - t0) * 1000)
    lineage = {
        "batch_id": bid,
        "events_in": events_in,
        "rows_applied": rows_applied,
        "schema_changes": changes,
        "per_partition": per_partition,
        "wall_ms": wall_ms,
    }
    sid = table.commit(
        bid,
        new_files,
        carry_files,
        schema_version=sv,
        new_schema=register,
        lineage=lineage,
    )
    return ApplyResult(bid, sid, rows_applied, events_in, wall_ms=wall_ms, per_partition=per_partition)
