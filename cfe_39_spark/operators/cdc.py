"""The CDC hot path: one micro-batch of change events -> one table snapshot.

Implements SURVEY.md §2.2 C1-C8 as a single declarative Spark plan per
micro-batch, executed by ``apply_batch`` (called from foreachBatch in
streaming mode and from the batch replayer — one pipeline, two drivers,
SURVEY.md §3.3).

Determinism rule (SURVEY.md §4.3): an event wins over stored state iff its
``(event_time, offset, src_partition)`` triple is lexicographically greater
than the row's ``(_last_event_time, _last_offset, _last_src_partition)``.
The tertiary key exists because offsets are only monotone per source
partition, so two DIFFERENT events on different partitions can tie on
(event_time, offset) — without the tiebreak, which copy survives would be
engine-scheduling-dependent.  The winner's src_partition is PERSISTED as
``_last_src_partition`` bookkeeping, so the same tertiary rule applies
across batch boundaries, at merge-on-read resolution (``lww_resolve``) and
in the COW monotonicity filter — a tie split across two micro-batches
resolves exactly as it would inside one batch.  (A tie on the FULL triple
is the same event redelivered: the stored row is kept, idempotently.)  One
ordering rule everywhere => the final table state is invariant under batch
re-slicing, duplicate delivery, intra-batch shuffling and parallelism
level — the properties the replay tests assert.

Scale notes:
  * Dedup (C1) and LWW (C2) reduce to a NARROW-COLUMN hash aggregation
    (doc_id, event_time, offset only) + a broadcast join that fetches the
    winning payloads without ever shuffling token arrays through the agg
    (default 'bcast_join' strategy; 'max_by' single-agg and the spec's
    'salted_window' C3 form stay selectable and property-equal).  The
    narrow agg's map-side partial combine is the skew defusal: a hot
    doc_id collapses to ~1 row per map task *before* the shuffle.
  * The MERGE join (C5) is key-unique on both sides by construction
    (post-LWW batch x one-row-per-key table slice), so no join skew exists
    to defuse; AQE broadcasts the batch side when it is small.
  * Manifest pruning (O3) bounds the slice to files whose bucket AND
    doc_id range can intersect the batch — per-trigger cost is O(batch
    neighborhood), never O(table).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field

import sys

from pyspark.sql import DataFrame, Observation, SparkSession, Window, functions as F, types as T

from ..functions.tokens import n_tok_expr, validate_tokens_arrow
from ..schema import ALLOWED_WIDENINGS, BOOKKEEPING_COLS, CDC_META_COLS
from ..sources.table import (
    PARENT_FILES,
    CommitConflictError,
    SequenceTable,
    _schema_to_json,
    bucket_expr,
    changes_as_events,
    has_deltas,
    lww_resolve,
)


def _register_version(
    snap: dict, batch_sv: int, new_schema: T.StructType, changes
) -> "tuple[int, T.StructType | None]":
    """Pick the schema version this batch's rows are stamped with, and the
    schema to register (None when the table shape is unchanged).  Normally
    the source's stamp governs, but when that version number is already
    registered with a DIFFERENT shape — a column-DDL commit or a rollback
    outran the source's stamps — allocate the next free table version
    instead of tripping the same-version-different-schema commit guard."""
    sv = max(int(batch_sv), snap["schema_version"])
    register = new_schema if (changes or sv > snap["schema_version"]) else None
    if register is not None:
        taken = snap["schemas"].get(str(sv))
        if taken is not None and taken != _schema_to_json(register):
            sv = max(int(k) for k in snap["schemas"]) + 1
    return sv, register


def _per_partition(prog: list, applied_rows: list) -> list[dict]:
    applied_by_part = {r["src_partition"]: r["count"] for r in applied_rows}
    return [
        {
            "src_partition": r["src_partition"],
            "min_offset": r["min_offset"],
            "max_offset": r["max_offset"],
            "events_in": r["events_in"],
            "rows_applied": applied_by_part.get(r["src_partition"], 0),
        }
        for r in sorted(prog, key=lambda x: x["src_partition"])
    ]


@dataclass
class ApplyResult:
    batch_id: str
    snapshot_id: int
    rows_applied: int
    events_in: int
    noop: bool = False
    wall_ms: int = 0
    per_partition: list[dict] = field(default_factory=list)
    lww_strategy_used: str = ""
    events_quarantined: int = 0


# Broadcast budget for the 'auto' LWW strategy: above this many distinct
# keys per trigger, the (key -> winning pair) map is too big to broadcast
# and 'auto' falls back to the single-agg max_by plan.  ~100 B/key JVM-side
# => the default caps the broadcast near 200 MB.  Env-overridable so a
# deployment can align it with spark.sql.autoBroadcastJoinThreshold.
BCAST_KEY_BUDGET = int(os.environ.get("CFE39_BCAST_KEY_BUDGET", "2000000"))

# 'auto' feedback for the fused one-job path: last observed distinct-key
# count per table root (the fused path has no pre-plan stats job to measure
# with, so trigger N+1 plans from trigger N's observation — trigger sizing
# is stable under a maxOffsetsPerTrigger-style source, which is what makes
# feedback control the right shape there).
_LAST_DISTINCT_KEYS: dict[str, int] = {}

# bounded parent-walk depth when seeding the feedback map from committed
# lineage at process start (maintenance commits — compaction, DDL,
# rollback — sit between apply commits and carry no distinct_keys)
_SEED_WALK_DEPTH = 8


def _seed_last_distinct_keys(table: SequenceTable) -> "int | None":
    """Process-start seed for the fused path's 'auto' guard: the last
    committed apply lineage's ``distinct_keys`` (a bounded walk from the
    tip — maintenance commits in between carry none).  Before this seed
    existed, a restarted stream's FIRST fused trigger defaulted to
    bcast_join with zero information, so one mis-sized trigger could blow
    the very broadcast the budget guard exists to prevent; with no
    committed observation either (fresh table), the caller must fall back
    to max_by — correct at any key count, never OOM."""
    try:
        sid: "int | None" = table.latest_snapshot_id()
        for _ in range(_SEED_WALK_DEPTH):
            if sid is None:
                return None
            s = table.snapshot(sid)
            dk = (s.get("lineage") or {}).get("distinct_keys")
            if dk is not None:
                return int(dk)
            sid = s["parent_id"]
    except Exception:  # noqa: BLE001 — a seed probe must never fail an apply
        return None
    return None


def _lex_gt(b_et, b_off, b_sp, t_et, t_off, t_sp):
    """(b_et, b_off, b_sp) > (t_et, t_off, t_sp); null target => True (new
    key).  ``t_sp`` null (legacy rows without the persisted tiebreak)
    sorts lowest, matching ``lww_resolve``."""
    t_sp = F.coalesce(t_sp, F.lit(-1))
    return (
        t_et.isNull()
        | (b_et > t_et)
        | (
            (b_et == t_et)
            & ((b_off > t_off) | ((b_off == t_off) & (b_sp > t_sp)))
        )
    )


# ------------------------------------------------------------------ #
# C1 + C2 + C3: dedup -> last-writer-wins, skew-defused
# ------------------------------------------------------------------ #
def lww_winners(
    events: DataFrame,
    strategy: str = "bcast_join",
    n_salts: int = 8,
    keys_source: DataFrame | None = None,
) -> DataFrame:
    """Reduce a raw event batch to exactly one winning event per doc_id.

    strategy='bcast_join' (default for wide payloads — the engine's hot
    path): two-phase winner selection that never shuffles the token
    payload through the aggregation.  Phase 1 computes each key's winning
    ordering pair from a COLUMN-PRUNED scan (`doc_id`, `event_time`,
    `offset` only — the token arrays never leave the parquet footer for
    this job); phase 2 broadcast-joins the (key → winning pair) map back
    against the full batch, so winner payloads flow scan → bucket write
    with zero agg shuffle.  Measured: the max_by form moves the whole
    batch payload (~1 KB/row) through one shuffle; this form moves 3
    narrow columns plus one ~O(distinct keys) broadcast — on the 4M-event
    bench log that is ~4 GB less memory-bus traffic per trigger, which is
    exactly the non-scaling term on a bandwidth-shared host.  Broadcast
    size is O(distinct keys in the batch) — bounded by trigger sizing
    (maxOffsetsPerTrigger), NOT by table size; for narrow-payload/huge-
    key-cardinality batches prefer 'max_by'.

    strategy='max_by': single hash aggregation, max_by(struct(*),
    (event_time, offset)).  Its map-side partial combine IS the skew
    defusal: every map task reduces its slice of a hot key to one row
    before the shuffle — the same mechanism as explicit salting with
    salt = map-partition id, minus one extra shuffle.  Benchmarked 2.5x
    faster than the window form on both uniform and hot-key logs.

    strategy='salted_window' (the spec's explicit form, kept selectable
    and property-tested): two-phase row_number — phase 1 partitions by
    (doc_id, salt) so a hot key's events spread across ``n_salts`` tasks;
    phase 2 ranks the <=n_salts survivors per key, a provably skew-free
    window.

    ``keys_source``: alternative relation to derive phase-1 keys from in
    'bcast_join' mode (the fused apply path hangs its ``observe()`` here
    so lineage metrics ride the narrow scan exactly once — attaching it
    to ``events`` would double-count through the self-join).
    """
    # C1 (dedup by (doc_id, offset)) is subsumed: redelivered copies are
    # identical rows and tie on the full (event_time, offset,
    # src_partition) ordering key, so whichever copy the reduction keeps,
    # the output row is the same — an explicit dropDuplicates would only
    # add a full extra shuffle.  DIFFERENT events tying on (event_time,
    # offset) across source partitions break by src_partition, so every
    # strategy picks the same winner on every run.
    cols = events.columns
    if strategy == "bcast_join":
        ks = keys_source if keys_source is not None else events
        keys = (
            ks.groupBy("doc_id")
            .agg(F.max(F.struct("event_time", "offset", "src_partition")).alias("_k"))
            .select(F.col("doc_id").alias("_kdoc"), "_k")
        )
        joined = events.join(
            F.broadcast(keys),
            (F.col("doc_id") == F.col("_kdoc"))
            & (F.struct("event_time", "offset", "src_partition") == F.col("_k")),
        ).select(cols)
        # redelivered copies of the winning event tie exactly and both
        # survive the join: collapse them (identical rows, so the kept
        # copy is deterministic by value) — an O(winners) shuffle
        return joined.dropDuplicates(["doc_id"])
    if strategy == "max_by":
        packed = F.max_by(F.struct(*cols), F.struct("event_time", "offset", "src_partition"))
        return (
            events.groupBy("doc_id")
            .agg(packed.alias("_w"))
            .select([F.col(f"_w.{c}").alias(c) for c in cols])
        )
    # salted two-phase window (C3): salt on (doc_id, offset) hash
    salted = events.withColumn(
        "_salt", F.pmod(F.xxhash64("doc_id", "offset"), F.lit(n_salts)).cast("int")
    )
    w1 = Window.partitionBy("doc_id", "_salt").orderBy(
        F.col("event_time").desc(), F.col("offset").desc(), F.col("src_partition").desc()
    )
    phase1 = (
        salted.withColumn("_rn", F.row_number().over(w1))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_salt")
    )
    w2 = Window.partitionBy("doc_id").orderBy(
        F.col("event_time").desc(), F.col("offset").desc(), F.col("src_partition").desc()
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
            if pair in ALLOWED_WIDENINGS:
                out_fields.append(T.StructField(f.name, bf.dataType, True))
                changes.append(f"widen:{f.name}:{pair[0]}->{pair[1]}")
            elif (pair[1], pair[0]) in ALLOWED_WIDENINGS:
                # batch is NARROWER than the table (a widen_column DDL
                # outran the source's stamps): keep the table's type — the
                # batch's values cast up losslessly at union/read time
                out_fields.append(f)
            else:
                raise ValueError(f"illegal type change for {f.name}: {pair}")
        else:
            out_fields.append(f)
    known = {f.name for f in table_schema.fields}
    for name, bf in batch_user.items():
        if name not in known:
            out_fields.append(T.StructField(name, bf.dataType, True))
            changes.append(f"add:{name}:{bf.dataType.simpleString()}")
    return T.StructType(out_fields), changes


def quarantine_bad_events(
    events: DataFrame, quarantine_dir: str, batch_id: str
) -> tuple[DataFrame, int]:
    """Split malformed change events out of the batch (opt-in DLQ — the
    engine-level counterpart of the Kafka decoder's dead-letter stream).

    A CDC event is malformed when it cannot participate in the engine's
    ordering/merge contract: null ``doc_id`` (no merge key), null
    ``event_time``/``offset`` (no LWW position), or an op outside
    {I, U, D}.  Without a quarantine such rows flow into the LWW aggregation
    (null keys group together, null ordering fields sort below every real
    event) and materialize garbage table rows that only a rollback can
    remove.  Bad rows land in ``<quarantine_dir>/batch-<id>/`` with a
    ``_quarantine_reason`` column — OVERWRITE per batch id, so a crashed
    trigger's checkpoint replay rewrites identical content instead of
    appending duplicates — and are counted by an ``Observation`` riding
    the quarantine write job itself.

    Cost when enabled: one extra scan of the batch per trigger (the
    quarantine write); the kept-rows filter fuses into the downstream
    plan.  Zero cost when disabled (the default) — the hot path is
    untouched.
    """
    # NULL-safe: isin() is NULL for a NULL op, and a NULL predicate would
    # drop the row from BOTH the quarantine and the kept set — coalesce
    # pins it to "malformed" so every input row lands on exactly one side
    op_ok = F.coalesce(F.col("op").isin("I", "U", "D"), F.lit(False))
    bad = (
        F.col("doc_id").isNull()
        | F.col("event_time").isNull()
        | F.col("offset").isNull()
        | ~op_ok
    )
    reason = (
        F.when(F.col("doc_id").isNull(), F.lit("null_doc_id"))
        .when(
            F.col("event_time").isNull() | F.col("offset").isNull(),
            F.lit("null_ordering_field"),
        )
        .otherwise(F.lit("unknown_op"))
    )
    obs = Observation()
    (
        events.filter(bad)
        .withColumn("_quarantine_reason", reason)
        .observe(obs, F.count(F.lit(1)).alias("n"))
        .write.mode("overwrite")
        .parquet(os.path.join(quarantine_dir, f"batch-{batch_id}"))
    )
    n_bad = int(obs.get["n"] or 0)
    return (events.filter(~bad) if n_bad else events), n_bad


# ------------------------------------------------------------------ #
# C4 + C5 + C6: idempotency filter, MERGE, lineage — one batch apply
# ------------------------------------------------------------------ #
def apply_batch(
    spark: SparkSession,
    table: SequenceTable,
    events: DataFrame,
    batch_id: str | int,
    lww_strategy: str = "auto",
    n_salts: int = 8,
    mode: str = "mor",
    compact_threshold: int | None = 16,
    known_partitions: list[int] | None = None,
    bcast_key_budget: int | None = None,
    quarantine_dir: str | None = None,
) -> ApplyResult:
    """Apply one micro-batch of change events to the table, exactly once.

    ``lww_strategy='auto'`` (default) guards the bcast_join hot path's one
    foot-gun — its broadcast is O(distinct keys in the batch), fine under
    trigger sizing but fatal if a mis-sized trigger ships a huge unique-key
    batch.  auto picks bcast_join while the measured distinct-key count is
    within ``bcast_key_budget`` (default ``BCAST_KEY_BUDGET``) and falls
    back to the single-agg max_by plan above it (property-equal — the
    strategies are tested equivalent).  The measurement is free: the
    unfused path piggybacks ``approx_count_distinct`` on the stats job it
    already runs (per-partition sum = a safe upper bound); the fused
    one-job path has no pre-plan job, so it plans trigger N+1 from trigger
    N's observed count (first trigger: optimistic bcast_join).  The chosen
    plan is reported as ``ApplyResult.lww_strategy_used``.

    ``known_partitions``: the source's partition ids when the caller knows
    them (a Kafka consumer always does — topic partition count).  With the
    hint, the per-partition lineage stats ride the delta-write job itself
    via a second ``Observation`` on the events relation, dropping the MOR
    hot path from two Spark jobs per trigger to ONE — the job-scheduling
    floor is exactly what caps streaming scaling efficiency (BENCH.md §1).
    Events outside the hinted set are detected from the observed totals
    and fall back to the grouped stats job (correct, just not fused).

    Idempotent on batch_id (S6): a replayed batch returns the existing
    snapshot without touching data.  Row-level idempotency (C4) comes from
    the (event_time, offset) monotonicity test against stored bookkeeping —
    table state IS the dedup state, so no Spark state store grows with the
    key space (SURVEY.md §4.3 layer 2).

    mode='mor' (default, the 10^10-scale path): merge-on-read — write the
    batch's LWW winners as bucketed DELTA files and commit; nothing of the
    existing table is read or rewritten, so per-trigger cost is O(batch).
    Readers resolve base+delta by the same (event_time, offset) rule
    (``lww_resolve``), and ``compact_threshold`` bounds read amplification
    by folding deltas back into base files once any bucket accumulates
    that many delta files (Iceberg v2 equality-delete + RewriteDataFiles,
    rebuilt from scratch).

    mode='cow' (copy-on-write): the read-optimized path — full-outer MERGE
    into the pruned slice of touched files, leaving one key-unique base
    row set.  Identical final state (tests assert both modes against the
    same oracle); per-trigger cost O(touched files).
    """
    t0 = time.monotonic()
    bid = str(batch_id)
    existing = table.find_batch(bid)
    if existing is not None:
        return ApplyResult(bid, existing, 0, 0, noop=True)

    # opt-in DLQ: malformed events (null key / null ordering / unknown op)
    # leave the batch BEFORE any stats or winner selection, so lineage
    # counts describe exactly what the merge consumed
    quarantined = 0
    if quarantine_dir is not None:
        events, quarantined = quarantine_bad_events(events, quarantine_dir, bid)

    snap = table.snapshot()
    n_buckets = snap["n_buckets"]
    table_schema = table.user_schema(snap)

    # ---- C7: reconcile schemas (metadata-only; no data rewrite) ----
    new_schema, changes = evolve_schema(table_schema, events.schema)

    budget = BCAST_KEY_BUDGET if bcast_key_budget is None else bcast_key_budget

    if mode == "mor" and known_partitions is not None:
        # fused-stats fast path: lineage stats + batch schema_version are
        # observed DURING the delta-write scan — no separate stats job
        strategy = lww_strategy
        if strategy == "auto":
            last = _LAST_DISTINCT_KEYS.get(table.root)
            if last is None:
                # process start / first trigger: seed from committed
                # lineage; still nothing known (fresh table) -> max_by,
                # the plan that is correct at ANY key count (the unfused
                # path measures before deciding; the fused path must not
                # gamble a broadcast on zero information)
                last = _seed_last_distinct_keys(table)
                if last is not None:
                    _LAST_DISTINCT_KEYS[table.root] = last
            strategy = "max_by" if last is None or last > budget else "bcast_join"
        parts_hint = sorted(set(known_partitions))
        obs_ev = Observation()
        events_obs = events.observe(
            obs_ev,
            F.max("schema_version").alias("sv"),
            F.count(F.lit(1)).alias("n_total"),
            # feeds next trigger's 'auto' decision (observed, zero-job)
            F.approx_count_distinct("doc_id").alias("dk"),
            *[
                a
                for p in parts_hint
                for a in (
                    F.min(
                        F.when(F.col("src_partition") == p, F.col("offset"))
                    ).alias(f"mn{p}"),
                    F.max(
                        F.when(F.col("src_partition") == p, F.col("offset"))
                    ).alias(f"mx{p}"),
                    F.count_if(F.col("src_partition") == p).alias(f"n{p}"),
                )
            ],
        )
        if strategy == "bcast_join":
            # metrics ride the NARROW keys scan (executed exactly once as
            # the broadcast build side); the payload side stays metrics-free
            winners = lww_winners(events, strategy, n_salts,
                                  keys_source=events_obs)
        else:
            winners = lww_winners(events_obs, strategy, n_salts)
        return _apply_mor(
            spark, table, winners, bid, snap, new_schema, None, None,
            None, t0, compact_threshold,
            changes=changes, obs_ev=obs_ev, parts_hint=parts_hint, events=events,
            strategy_used=strategy, quarantined=quarantined,
        )

    # ---- C6: ONE column-pruned job for lineage stats + the batch's max
    # schema_version (offset/src_partition/schema_version only — the token
    # column never leaves the parquet footer for this scan) ----
    t_prog = time.monotonic()
    prog = (
        events.groupBy("src_partition")
        .agg(
            F.min("offset").alias("min_offset"),
            F.max("offset").alias("max_offset"),
            F.count(F.lit(1)).alias("events_in"),
            F.max("schema_version").alias("sv"),
            # rides the same column-pruned scan: per-partition distinct
            # keys, summed below into an upper bound for the 'auto' guard
            F.approx_count_distinct("doc_id").alias("dk"),
        )
        .collect()
    )
    if os.environ.get("CFE39_TIMING"):
        print(f"TIMING {bid} prog={time.monotonic() - t_prog:.2f}", file=sys.stderr)
    batch_sv = max((r["sv"] or 0) for r in prog) if prog else 0
    sv, register = _register_version(snap, batch_sv, new_schema, changes)
    user_cols = [f.name for f in new_schema.fields]

    strategy = lww_strategy
    if strategy == "auto":
        # per-partition sum over-counts keys seen on several partitions —
        # a safe (conservative-toward-max_by) bound for a broadcast guard
        dk_bound = int(sum(r["dk"] for r in prog))
        _LAST_DISTINCT_KEYS[table.root] = dk_bound
        strategy = "bcast_join" if dk_bound <= budget else "max_by"

    # ---- C1+C2+C3: one winner per key ----
    winners = lww_winners(events, strategy, n_salts)

    if mode == "mor":
        # no persist: MOR consumes winners exactly once (the delta-write
        # job); lineage counts ride the same job via observe(), so caching
        # a full token-payload copy would only add memory traffic
        return _apply_mor(
            spark, table, winners, bid, snap, new_schema, sv,
            register, prog, t0, compact_threshold, strategy_used=strategy,
            quarantined=quarantined,
        )

    # persisted: reused by the merge-planner collect, the C4 join and the
    # merge itself — without this the LWW aggregation would run 3x
    winners = winners.persist()

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
    if has_deltas(rewrite_files):
        # slice holds unresolved merge-on-read rows: collapse to one row
        # per key first (the C4/C5 joins assume a key-unique target side)
        target_slice = lww_resolve(target_slice)

    # ---- C4: applies-flag via column-pruned bookkeeping join ----
    bk = target_slice.select(
        "doc_id", "_last_event_time", "_last_offset", "_last_src_partition"
    )
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
            F.col("src_partition"),
            F.col("_last_event_time"),
            F.col("_last_offset"),
            F.col("_last_src_partition"),
        ),
    ).drop("doc_id", "_last_event_time", "_last_offset", "_last_src_partition")
    w = w.persist()

    # ---- C6: applied counts per source partition (lineage) ----
    applied_rows = (
        w.filter("_applies").groupBy("src_partition").count().collect()
    )
    per_partition = _per_partition(prog, applied_rows)
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
        F.when(applies, F.col("src_partition"))
        .otherwise(target_slice["_last_src_partition"])
        .alias("_last_src_partition"),
        F.when(is_delete, F.lit(True))
        .when(applies, F.lit(False))
        .otherwise(F.coalesce(target_slice["_deleted"], F.lit(False)))
        .alias("_deleted"),
    ]
    merged = j.select(merged_cols)

    new_files = table._write_data_files(
        merged, n_buckets, sv, batch_tag=bid, sort_cols=snap.get("sort_order"), bloom=snap.get("bloom_filter"), zorder=snap.get("zorder")
    )

    # ---- S10: explicit change set (Delta-CDF role).  COW base files mix
    # rewritten-but-unchanged rows with real changes, so the feed must be
    # written separately — O(applied rows), from the already-persisted w
    # (a cache read, but still one extra write job per COW trigger; the
    # accepted cost of the read-optimized mode — MOR's change feed is its
    # delta files, zero extra IO).
    ch_is_del = F.col("op") == "D"
    ch_cols = [F.col("_b_doc_id").alias("doc_id")]
    for f2 in new_schema.fields:
        if f2.name == "doc_id":
            continue
        src2 = F.when(ch_is_del, F.lit(None).cast(f2.dataType)).otherwise(
            F.col(f"_b_{f2.name}").cast(f2.dataType)
        )
        if f2.name == "n_tok":
            src2 = F.coalesce(src2, n_tok_expr(F.when(~ch_is_del, F.col("_b_tokens"))))
        ch_cols.append(src2.alias(f2.name))
    ch_cols += [
        F.col("offset").alias("_last_offset"),
        F.col("event_time").alias("_last_event_time"),
        F.col("epoch").alias("_last_epoch"),
        F.col("src_partition").cast("int").alias("_last_src_partition"),
        ch_is_del.alias("_deleted"),
    ]
    change_files = table._write_data_files(
        w.filter("_applies").select(ch_cols), n_buckets, sv,
        batch_tag=f"{bid}chg", kind="changelog",
    )
    w.unpersist()
    winners.unpersist()

    wall_ms = int((time.monotonic() - t0) * 1000)
    lineage = {
        "batch_id": bid,
        "events_in": events_in,
        "rows_applied": rows_applied,
        "schema_changes": changes,
        "per_partition": per_partition,
        "wall_ms": wall_ms,
        # last observed distinct-key count: seeds the fused path's 'auto'
        # broadcast guard across process restarts (None when the strategy
        # was forced, so no observation happened this batch)
        "distinct_keys": _LAST_DISTINCT_KEYS.get(table.root),
    }
    # COW planned its rewrite against `snap`; a concurrent commit means the
    # merge itself is stale — fail loudly, caller redoes the batch
    sid = table.commit(
        bid,
        new_files,
        carry_files,
        schema_version=sv,
        new_schema=register,
        lineage=lineage,
        change_files=change_files,
        expected_parent_id=snap["snapshot_id"],
    )
    return ApplyResult(bid, sid, rows_applied, events_in, wall_ms=wall_ms,
                       per_partition=per_partition, lww_strategy_used=strategy)


def _apply_mor(
    spark: SparkSession,
    table: SequenceTable,
    winners: DataFrame,
    bid: str,
    snap: dict,
    new_schema: T.StructType,
    sv: int | None,
    register: T.StructType | None,
    prog: list | None,
    t0: float,
    compact_threshold: int | None,
    changes: list[str] | None = None,
    obs_ev: Observation | None = None,
    parts_hint: list[int] | None = None,
    events: DataFrame | None = None,
    strategy_used: str = "",
    quarantined: int = 0,
) -> ApplyResult:
    """Merge-on-read apply: stamp the winners with bookkeeping columns and
    commit them as delta files — no table read, no rewrite, O(batch) per
    trigger.  Redelivered/out-of-order rows are written too and simply
    lose at read-time resolution (same ordering rule, same final state).

    Lineage semantics: in this mode ``rows_applied`` means "winners
    written" — a stale winner that later loses at read-time resolution is
    still counted, whereas COW counts only rows passing the C4
    monotonicity filter.  Counting true applies here would require the
    stored-bookkeeping join MOR exists to avoid, so the difference is
    recorded in the lineage row (``rows_applied_semantics``) instead of
    being papered over."""
    n_buckets = snap["n_buckets"]
    typed = {f.name: f.dataType for f in new_schema.fields}
    is_del = F.col("op") == "D"
    cols = [F.col("doc_id")]
    for f in new_schema.fields:
        if f.name == "doc_id":
            continue
        src = (
            F.col(f.name) if f.name in winners.columns else F.lit(None)
        ).cast(f.dataType)
        src = F.when(is_del, F.lit(None).cast(f.dataType)).otherwise(src)
        if f.name == "n_tok":
            tok = F.when(~is_del, F.col("tokens").cast(typed["tokens"]))
            src = F.coalesce(src, n_tok_expr(tok))
        cols.append(src.alias(f.name))
    cols += [
        F.col("offset").alias("_last_offset"),
        F.col("event_time").alias("_last_event_time"),
        F.col("epoch").alias("_last_epoch"),
        F.col("src_partition").cast("int").alias("_last_src_partition"),
        is_del.alias("_deleted"),
    ]
    # C6 lineage counts ride the delta-write job itself (observe = JVM-side
    # aggregates collected during the action) — no persist, no second scan;
    # this is per-trigger serial floor, and the floor is what caps
    # streaming scaling efficiency (BENCH.md §1)
    parts = (
        list(parts_hint)
        if obs_ev is not None
        else sorted({r["src_partition"] for r in prog})
    )
    obs = Observation()
    if parts:
        winners = winners.observe(
            obs,
            *[
                F.count_if(F.col("src_partition") == p).alias(f"p{p}")
                for p in parts
            ],
        )
    delta = winners.select(cols)
    if os.environ.get("CFE39_VALIDATE_TOKENS"):
        # C8 opt-in: Arrow-side vocab validation (functions.tokens).  Off
        # by default: the hot path's token handling is all JVM built-ins,
        # and a JVM->Python->JVM Arrow round trip of every token array
        # costs more than the check is worth unless the source is
        # untrusted (UDFs are the slow path; prefer built-ins).
        delta = validate_tokens_arrow(delta)
    t_w = time.monotonic()
    new_files = table._write_data_files(
        delta, n_buckets, sv if sv is not None else 0, batch_tag=bid, kind="delta",
        sort_cols=snap.get("sort_order"), bloom=snap.get("bloom_filter"), zorder=snap.get("zorder"),
    )
    got = obs.get if parts else {}
    applied_rows = [
        {"src_partition": p, "count": int(got.get(f"p{p}", 0))} for p in parts
    ]
    if obs_ev is not None:
        # fused-stats path: lineage stats and the batch's max
        # schema_version were observed during the write scan above
        got_ev = obs_ev.get
        # feedback for the NEXT trigger's 'auto' broadcast guard
        _LAST_DISTINCT_KEYS[table.root] = int(got_ev["dk"] or 0)
        sv, register = _register_version(
            snap, int(got_ev["sv"] or 0), new_schema, changes
        )
        for e in new_files:
            e["schema_version"] = sv
        prog = [
            {
                "src_partition": p,
                "min_offset": got_ev[f"mn{p}"],
                "max_offset": got_ev[f"mx{p}"],
                "events_in": int(got_ev[f"n{p}"]),
            }
            for p in parts
            if int(got_ev[f"n{p}"]) > 0
        ]
        if int(got_ev["n_total"]) != sum(r["events_in"] for r in prog):
            # events outside the hinted partition set: recompute stats +
            # winner counts the exact way (two extra jobs — the rare
            # correction path; the data write above is already correct)
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
                lww_winners(events)
                .groupBy("src_partition")
                .count()
                .collect()
            )
    t_c = time.monotonic()
    per_partition = _per_partition(prog, applied_rows)
    events_in = sum(p["events_in"] for p in per_partition)
    rows_applied = sum(p["rows_applied"] for p in per_partition)
    wall_ms = int((time.monotonic() - t0) * 1000)
    lineage = {
        "batch_id": bid,
        "mode": "mor",
        "events_in": events_in,
        "rows_applied": rows_applied,
        "rows_applied_semantics": "winners_written",
        "events_quarantined": quarantined,
        "schema_changes": [],
        "per_partition": per_partition,
        "wall_ms": wall_ms,
        # see the COW lineage note: restart seed for the 'auto' guard
        "distinct_keys": _LAST_DISTINCT_KEYS.get(table.root),
    }
    # Optimistic-concurrency commit loop: a MOR apply's delta files are
    # parent-independent, so a conflicting concurrent commit only requires
    # re-planning the carried manifest against the new parent.  A bucket-
    # count change mid-apply is fine when the new count is a MULTIPLE of
    # the planned one (a lazy evolve_bucket_spec, or a rebucket to a finer
    # multiple): the deltas are stamped spec_nb=planned, which is then
    # simply one more live spec the group-based read resolution handles —
    # the online-resize race costs nothing.  Only an incompatible count
    # (shrink / non-multiple full rebucket) invalidates the stamped
    # layout and forces a whole-batch retry.
    sid: int | None = None
    for _ in range(5):
        cur = snap if table.latest_snapshot_id() == snap["snapshot_id"] else table.snapshot()
        if cur["n_buckets"] % n_buckets != 0:
            raise CommitConflictError(
                f"table rebucketed {n_buckets}->{cur['n_buckets']} mid-apply "
                "(not a multiple); delta bucket layout is stale — retry "
                "the whole batch"
            )
        if cur is not snap and register is not None:
            # a concurrent commit (e.g. column DDL) may have claimed this
            # batch's version number with a DIFFERENT shape; re-derive
            # against the new parent and restamp the entries — the same
            # _register_version rule the plan applies when a DDL outran
            # the source's stamps, now also on the retry path.  Without
            # it every retry replays the identical stale (sv, register)
            # pair into the same-version-different-schema guard
            new_sv, _ = _register_version(cur, sv, register, True)
            if new_sv != sv:
                sv = new_sv
                for e in new_files:
                    e["schema_version"] = sv
        try:
            sid = table.commit(
                bid,
                new_files,
                # by-reference carry: the commit reuses the parent's
                # manifest segments verbatim — per-trigger metadata stays
                # O(batch) no matter how many files the table has
                PARENT_FILES,
                schema_version=max(sv, cur["schema_version"]),
                new_schema=register,
                lineage=lineage,
                # S10: the delta files ARE this commit's change feed — zero extra IO
                change_files=new_files,
                expected_parent_id=cur["snapshot_id"],
            )
            break
        except CommitConflictError:
            continue
    else:
        raise CommitConflictError(f"batch {bid}: commit lost the race 5 times")
    if os.environ.get("CFE39_TIMING"):
        print(
            f"TIMING {bid} write={t_c - t_w:.2f} "
            f"commit={time.monotonic() - t_c:.2f} "
            f"total={time.monotonic() - t0:.2f}",
            file=sys.stderr,
        )
    if compact_threshold:
        # compact ONLY the buckets at/over the threshold: each trigger's
        # compaction pause is O(offending buckets), not a whole-table
        # rewrite the moment one bucket crosses — at 1024 buckets the
        # difference between a bounded hiccup and a stream stall.  Buckets
        # below threshold keep their deltas (read amp stays bounded by the
        # threshold either way) and get their turn when they cross.
        offenders = [
            b
            for b, n in table.delta_file_counts().items()
            if n >= compact_threshold
        ]
        if offenders:
            table.compact(spark, buckets=offenders)
    return ApplyResult(
        bid, sid, rows_applied, events_in, wall_ms=wall_ms,
        per_partition=per_partition, lww_strategy_used=strategy_used,
        events_quarantined=quarantined,
    )


def cherry_pick(
    spark: SparkSession,
    table: SequenceTable,
    snapshot_id: "int | str",
    from_snapshot_id: "int | str | None" = None,
    **apply_kwargs,
) -> ApplyResult:
    """Apply a reachable commit's change rows onto the CURRENT head as a
    new commit — git's cherry-pick / Iceberg's ``cherrypick_snapshot``,
    and the escape hatch the WAP flow needs when main moved after the
    branch was cut (``fast_forward`` correctly refuses divergence; this
    re-lands the audited span on the new main).

    Semantics are pure LWW redelivery: the picked span's change feed is
    converted back to raw events (``changes_as_events`` — the ORIGINAL
    ordering triple survives the round trip) and applied through the
    ordinary ``apply_batch``.  Conflicts therefore resolve by event time
    exactly like racing sources do: a row main has since overwritten
    with a NEWER event keeps main's value (the pick no-ops row-wise),
    older main state is overwritten, deletes carry as tombstones.
    Picking an already-published snapshot is a row-wise no-op, and the
    derived batch id makes re-picking the same span commit-level
    idempotent.

    ``snapshot_id``: the commit (or tag/branch name) to pick — any
    snapshot whose metadata is retained, on main or any branch.
    ``from_snapshot_id``: pick the whole ``(from, to]`` span instead of
    the single commit (pass the branch's fork point to re-land an entire
    staged line in one atomic batch; within-span ties collapse by LWW,
    which equals sequential application of the span).

    Cost: O(changed rows in the picked span) — one changelog read plus
    one ordinary MOR apply; main's state is never scanned.  Targeting a
    BranchHandle picks ONTO that branch instead of main.
    """
    sid = (
        table.resolve_ref(snapshot_id)
        if isinstance(snapshot_id, str) else int(snapshot_id)
    )
    src = table.snapshot(sid)
    frm = from_snapshot_id if from_snapshot_id is not None else src["parent_id"]
    if frm is None:
        raise ValueError(
            f"cherry_pick: snapshot {sid} is the create commit — its base "
            "load is not part of the change feed (re-bootstrap from a "
            "full table read instead)"
        )
    if isinstance(frm, str):
        frm = table.resolve_ref(frm)
    feed = table.read_changes(spark, from_snapshot_id=frm, to_snapshot_id=sid)
    return apply_batch(
        spark, table, changes_as_events(feed),
        batch_id=f"__cherrypick__-{frm}-{sid}", **apply_kwargs,
    )
