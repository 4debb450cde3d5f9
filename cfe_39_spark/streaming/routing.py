"""Routed multi-table ingest — ONE change stream fanning out into N
SequenceTables inside a single ``foreachBatch`` (SURVEY.md §2.1 S1/S4,
BASELINE.json:6 "Structured Streaming tail").

Real CDC feeds multiplex: a Debezium/binlog topic carries every table of
the upstream database, each event stamped with its table discriminator.
The engine's ``apply_batch`` targets one table, so the multiplexed shape
needs a fan-out stage — and the right fan-out is N *filters* over one
persisted micro-batch, not N streams (N streams = N checkpoints, N source
tails, N times the broker read at 10^10-event scale).

Exactly-once WITHOUT a coordinator: each route derives a stable per-table
batch id (``{batchId}@{route.name}``), so a crash mid-fan-out rolls
forward for free — Spark replays the micro-batch under the SAME batchId,
routes that already landed no-op at their table's commit log, and the
remaining routes land.  This is the same all-or-nothing-at-the-decision
relaxation ``operators/txn.py`` documents, with Spark's checkpoint
playing the decision record (the micro-batch is durable the moment the
source offsets are), so no extra decision file is needed.

Scale shape per trigger: one persisted scan of the batch + per route one
ordinary MOR apply (O(route's rows)).  Routes are independent filters —
an event may match several (fan-out duplication is legal and sometimes
wanted: an audit table shadowing a primary), and events matching none are
counted and optionally quarantined instead of silently dropped (the same
no-silent-loss rule as the kafka DLQ).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.cdc import ApplyResult, apply_batch
from ..sources.table import SequenceTable
from .lineage import write_lineage


@dataclass
class Route:
    """One fan-out target: rows matching ``predicate`` (SQL over the
    event columns; NULL reads as no-match) are applied to ``table``.

    ``transform`` (optional): DataFrame -> DataFrame applied to the
    route's slice AFTER the filter, BEFORE the apply — the per-route
    reshaping stage (Kafka Connect's single-message-transform role):
    retag sources, redact a column for an audit copy, derive fields.
    Must keep the event contract (ordering triple, op, doc_id) intact;
    it runs inside the same Spark plan, so a pure-expression transform
    adds no extra job or scan."""

    name: str
    table: SequenceTable
    predicate: str
    apply_kwargs: dict = field(default_factory=dict)
    transform: "object | None" = None  # Callable[[DataFrame], DataFrame]


@dataclass
class RouteBatchResult:
    batch_id: str
    results: "dict[str, ApplyResult]"
    events_in: int
    events_unrouted: int


def route_batch(
    spark: SparkSession,
    routes: "list[Route]",
    df: DataFrame,
    batch_id,
    unrouted_dir: "str | None" = None,
    max_concurrency: int = 1,
    **common_kwargs,
) -> RouteBatchResult:
    """Fan one micro-batch out to every route's table.

    Idempotent at two levels like any apply: re-running the same
    ``batch_id`` no-ops per table (commit-log dedup on the derived
    ``{batch_id}@{name}`` id — the roll-forward property), and row
    redelivery under new ids no-ops by the (event_time, offset) rule.

    ``unrouted_dir``: where events matching NO route are parqueted
    (per-batch file, replayable); None keeps only the count.  Unrouted
    events are a wiring bug or an upstream surprise — never silent.

    ``max_concurrency`` > 1 applies routes on a thread pool: the targets
    are DISTINCT tables (disjoint commit locks, independent Spark jobs —
    concurrent job submission from threads is a supported Spark pattern),
    so with many routes the trigger wall drops from the SUM of route
    applies to roughly the MAX; the persisted batch is scanned by all of
    them without recomputation.  Correctness is unchanged: a crash still
    rolls forward per table on replay, whatever subset of routes landed.
    """
    names = [r.name for r in routes]
    if len(set(names)) != len(names):
        raise ValueError(f"route_batch: duplicate route names in {names}")
    if not routes:
        raise ValueError("route_batch: no routes")
    df = df.persist()
    try:
        events_in = df.count()  # also materializes the persist ONCE

        def _one(r: Route) -> ApplyResult:
            sub = df.filter(F.coalesce(F.expr(r.predicate), F.lit(False)))
            if r.transform is not None:
                sub = r.transform(sub)
            return apply_batch(
                spark, r.table, sub, batch_id=f"{batch_id}@{r.name}",
                **{**common_kwargs, **r.apply_kwargs},
            )

        results: dict[str, ApplyResult] = {}
        if max_concurrency > 1 and len(routes) > 1:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(
                max_workers=min(max_concurrency, len(routes))
            ) as pool:
                for r, res in zip(routes, pool.map(_one, routes)):
                    results[r.name] = res
        else:
            for r in routes:
                results[r.name] = _one(r)
        matched_any = None
        for r in routes:
            p = F.coalesce(F.expr(r.predicate), F.lit(False))
            matched_any = p if matched_any is None else (matched_any | p)
        unrouted = df.filter(~matched_any)
        n_un = unrouted.count()
        if unrouted_dir is not None and n_un:
            unrouted.write.mode("overwrite").parquet(
                f"{unrouted_dir}/batch={batch_id}"
            )
        return RouteBatchResult(str(batch_id), results, events_in, n_un)
    finally:
        df.unpersist()


def run_routed_stream(
    spark: SparkSession,
    log_dir: str,
    routes: "list[Route]",
    checkpoint: str,
    max_files_per_trigger: int = 4,
    available_now: bool = True,
    processing_time: "str | None" = None,
    unrouted_dir: "str | None" = None,
    stop_after_batches: "int | None" = None,
    **common_kwargs,
) -> "list[RouteBatchResult]":
    """The streaming driver for the multiplexed feed: ``run_stream``'s
    shape with ``route_batch`` as the sink.  One checkpoint, one source
    tail, N tables.  ``stop_after_batches`` simulates a crash mid-stream
    for the kill-and-resume tests (same contract as ``run_stream``)."""
    from .ingest import infer_log_schema

    schema = infer_log_schema(spark, log_dir)
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(log_dir)
    )
    out: list[RouteBatchResult] = []

    def _apply(df, batch_id: int) -> None:
        res = route_batch(
            spark, routes, df, batch_id, unrouted_dir=unrouted_dir,
            **common_kwargs,
        )
        for r in routes:
            write_lineage(r.table.root, res.results[r.name])
        out.append(res)
        if stop_after_batches is not None and len(out) >= stop_after_batches:
            raise RuntimeError("simulated crash (stop_after_batches)")

    writer = (
        src.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
        .queryName("cfe39-routed-ingest")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif processing_time is not None:
        writer = writer.trigger(processingTime=processing_time)
    q = writer.start()
    try:
        q.awaitTermination()
    except Exception:
        if stop_after_batches is None:
            raise
    finally:
        if q.isActive:
            q.stop()
    return out
