"""Spark Python DataSource over the table's change feed — the engine's
changelog as a FIRST-CLASS Structured Streaming source.

``read_changes`` (sources/table.py) is the batch incremental scan; this
module wires the same span/manifest machinery into Spark 4's Python
DataSource API (pyspark.sql.datasource) so a downstream pipeline can tail
a SequenceTable the way it would tail Kafka — offsets checkpointed by
Spark, exactly-once replay, executor-parallel Arrow reads:

    from cfe_39_spark.sources.datasource import register
    register(spark)
    feed = (spark.readStream.format("cfe39-changes")
            .option("path", table_root)
            .option("startingSnapshotId", "earliest")   # |"latest"|id|tag
            .option("maxSnapshotsPerTrigger", "10")      # rate limit
            .load())
    feed.writeStream.foreachBatch(apply_to_downstream).start()

Design (SURVEY.md §2 S10/T8, BASELINE.json:6 "Structured Streaming tail"):

* **Offsets are snapshot ids** (``{"snapshot_id": N}`` = everything
  through commit N emitted).  Spark checkpoints them; a restarted stream
  resumes at the committed offset.  Exactly-once follows from manifest
  immutability: ``partitions(start, end)`` is a pure function of the two
  snapshot ids, and each partition re-reads the same immutable change
  files on replay.
* **One input partition per change file** — a microbatch spanning K
  commits with F files fans out F executor tasks; no driver-side row
  handling.  Executors read parquet via pyarrow and yield Arrow record
  batches (never per-row Python), reconciled to the stream's schema by
  the SAME field-id column plan the batch reader uses
  (``SequenceTable._column_plan``).
* **Schema is pinned at stream start** (standard Structured Streaming
  rule — a source cannot change schema mid-query).  Files written under
  versions registered AFTER start still map correctly: the plan is built
  against the span head's registry (append-only) with the pinned
  version's field ids, so later renames follow the id and later-added
  columns stay invisible until the stream restarts.
* **Retention interacts exactly like the batch scan**: a cursor that
  falls behind ``expire_snapshots`` raises the same "changes … have
  expired; re-bootstrap" error, via the shared ``change_span`` walk.

The schema matches ``read_changes`` column-for-column (user columns +
LWW ordering triple + ``_deleted`` + commit provenance + ``_change_type``),
so ``changes_as_events`` → ``apply_batch`` closes the loop: a mirror
driven by this stream reaches the primary's exact state.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Iterator, Sequence

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.pandas.types import to_arrow_schema

from ..schema import storage_schema
from .table import SequenceTable

META_FIELDS = [
    T.StructField("_commit_snapshot_id", T.LongType()),
    T.StructField("_commit_batch_id", T.StringType()),
    T.StructField("_schema_version", T.IntegerType()),
    T.StructField("_change_type", T.StringType()),
]


def feed_schema(table: SequenceTable, snap: dict | None = None) -> T.StructType:
    """The change-feed schema at a snapshot: identical to what
    ``read_changes`` returns (so both surfaces are drop-in for each other)."""
    snap = snap or table.snapshot()
    return T.StructType(
        list(storage_schema(table.user_schema(snap)).fields) + list(META_FIELDS)
    )


@dataclass
class ChangeFilePartition(InputPartition):
    """One change file of one commit: everything an executor needs to
    produce its slice of the feed without any table metadata access."""

    path: str                      # absolute parquet path
    columns: list                  # [(target_name, stored_name_or_None)]
    snapshot_id: int
    batch_id: str
    schema_version: int            # the version rows are reconciled to
    arrow_schema: pa.Schema        # full output schema (storage + meta)


def _span_partitions(
    table: SequenceTable,
    from_sid: int,
    to_sid: int,
    pin_fields: T.StructType,
    pin_version: int,
    arrow_schema: pa.Schema,
) -> "list[ChangeFilePartition]":
    """Driver-side planning: walk the (from, to] span and emit one
    partition per change file, with the field-id column plan resolved
    against the span head's (append-only) registry at the PINNED version."""
    target, span = table.change_span(from_sid, to_sid)
    parts: list[ChangeFilePartition] = []
    for s in reversed(span):  # oldest commit first (stable task order)
        for e in s.get("change_files") or []:
            parts.append(
                ChangeFilePartition(
                    path=os.path.join(table.root, e["path"]),
                    columns=table._column_plan(
                        target, pin_fields, e["schema_version"],
                        target_version=pin_version,
                    ),
                    snapshot_id=s["snapshot_id"],
                    batch_id=s["batch_id"],
                    schema_version=pin_version,
                    arrow_schema=arrow_schema,
                )
            )
    return parts


def _read_partition(p: ChangeFilePartition) -> Iterator[pa.RecordBatch]:
    """Executor-side: one immutable change file → Arrow record batches in
    the declared feed schema.  Pure pyarrow — no SparkSession, no per-row
    Python; columns are cast/null-filled columnar."""
    tbl = pq.read_table(p.path)
    n = len(tbl)
    if n == 0:
        return
    phys = set(tbl.column_names)
    out: list[pa.ChunkedArray | pa.Array] = []
    deleted = None
    n_storage = len(p.columns)
    for (name, stored), field in zip(p.columns, p.arrow_schema):
        col = (
            tbl.column(stored).cast(field.type)
            if stored is not None and stored in phys
            else pa.nulls(n, field.type)
        )
        if name == "_deleted":
            deleted = col
        out.append(col)
    meta = [p.arrow_schema.field(n_storage + i).type for i in range(4)]
    out.append(pa.repeat(pa.scalar(p.snapshot_id, meta[0]), n))
    out.append(pa.repeat(pa.scalar(p.batch_id, meta[1]), n))
    out.append(pa.repeat(pa.scalar(p.schema_version, meta[2]), n))
    dead = pc.fill_null(
        deleted if deleted is not None else pa.nulls(n, pa.bool_()), False
    )
    out.append(
        pc.if_else(dead, pa.scalar("delete"), pa.scalar("upsert")).cast(meta[3])
    )
    yield from pa.table(
        dict(zip(p.arrow_schema.names, out)), schema=p.arrow_schema
    ).to_batches()


class ChangeFeedStreamReader(DataSourceStreamReader):
    """The streaming tail.  All methods here run in the driver-side
    DataSource runner; only ``read`` executes on executors."""

    def __init__(self, options: dict, schema: T.StructType):
        self.root = options.get("path")
        if not self.root:
            raise ValueError(
                "cfe39-changes: .option('path', <table root>) is required"
            )
        self.table = SequenceTable(self.root)
        pin = self.table.snapshot()
        self.pin_version = int(pin["schema_version"])
        # the pinned reconciliation target: the stream's declared schema
        # minus the four meta columns (they are synthesized, not mapped)
        self.pin_fields = T.StructType(schema.fields[: -len(META_FIELDS)])
        self.arrow_schema = to_arrow_schema(schema)
        raw = str(options.get(
            "startingsnapshotid", options.get("startingSnapshotId", "latest")
        ))
        self.start_sid = self._resolve_start(raw, pin)
        cap = options.get("maxsnapshotspertrigger", options.get("maxSnapshotsPerTrigger"))
        self.max_per = int(cap) if cap else None
        # Rate-limit base.  The Python source API's latestOffset() takes
        # no start offset, so the cap must track its own base — and the
        # offset we return must NEVER regress behind Spark's checkpointed
        # cursor (a regressed offset log re-emits and breaks exactly-once).
        # With startingSnapshotId=latest, start_sid is >= any offset a
        # previous incarnation can have committed (snapshot ids are
        # monotonic), so the cap is safe from the very first batch; for
        # earliest/pinned starts the first batch after a (re)start is
        # uncapped — the steady-state batches are capped once partitions()
        # has shown us the real cursor.
        self._known_end: int | None = self.start_sid if raw == "latest" else None

    def _resolve_start(self, raw: str, pin: dict) -> int:
        if raw == "latest":
            return int(pin["snapshot_id"])
        if raw == "earliest":
            # 0 = before every retained snapshot: the walk stops at the
            # oldest retained commit's (reparented) None parent, so the
            # whole retained changelog is emitted
            return 0
        try:
            return int(raw)
        except ValueError:
            return self.table.resolve_ref(raw)  # tag/branch name

    # -- offset protocol ------------------------------------------------ #
    def initialOffset(self) -> dict:
        self._known_end = max(self._known_end or 0, self.start_sid)
        return {"snapshot_id": self.start_sid}

    def latestOffset(self) -> dict:
        head = self.table.latest_snapshot_id()
        base = self._known_end
        if self.max_per and base is not None and head > base:
            # cap by walking the real chain (snapshot ids are shared with
            # branch commits, so main-chain ids are NOT dense — arithmetic
            # on ids would name snapshots outside the chain)
            _, span = self.table.change_span(base, head)
            if len(span) > self.max_per:
                head = int(span[-self.max_per]["snapshot_id"])
        self._known_end = max(head, base or 0)
        return {"snapshot_id": self._known_end}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        frm, to = int(start["snapshot_id"]), int(end["snapshot_id"])
        self._known_end = max(frm, to, self._known_end or 0)
        if to <= frm:
            return []
        return _span_partitions(
            self.table, frm, to, self.pin_fields, self.pin_version,
            self.arrow_schema,
        )

    def read(self, partition: InputPartition) -> Iterator[pa.RecordBatch]:
        return _read_partition(partition)

    def commit(self, end: dict) -> None:
        # nothing to clean: change files belong to the table's retention
        pass


class ChangeFeedBatchReader(DataSourceReader):
    """Batch flavor of the same source (``spark.read.format(...)``): the
    Iceberg incremental-scan role through the DataSource API.  Options:
    ``fromSnapshotId`` (required; id or tag), ``toSnapshotId`` (default
    head).  ``SequenceTable.read_changes`` remains the native (and
    equally parallel) library surface; this exists so SQL-only consumers
    never import the library."""

    def __init__(self, options: dict, schema: T.StructType):
        root = options.get("path")
        if not root:
            raise ValueError(
                "cfe39-changes: .option('path', <table root>) is required"
            )
        self.table = SequenceTable(root)
        frm = options.get("fromsnapshotid", options.get("fromSnapshotId"))
        if frm is None:
            raise ValueError(
                "cfe39-changes batch read: .option('fromSnapshotId', ...) "
                "is required (use 0 for the full retained changelog)"
            )
        to = options.get("tosnapshotid", options.get("toSnapshotId"))
        snap = self.table.snapshot(
            self.table.resolve_ref(to) if to and not str(to).lstrip("-").isdigit()
            else (int(to) if to is not None else None)
        )
        self.frm = (
            self.table.resolve_ref(frm)
            if not str(frm).lstrip("-").isdigit() else int(frm)
        )
        self.to = int(snap["snapshot_id"])
        self.pin_fields = T.StructType(schema.fields[: -len(META_FIELDS)])
        self.pin_version = int(snap["schema_version"])
        self.arrow_schema = to_arrow_schema(schema)

    def partitions(self) -> Sequence[InputPartition]:
        return _span_partitions(
            self.table, self.frm, self.to, self.pin_fields, self.pin_version,
            self.arrow_schema,
        )

    def read(self, partition: InputPartition) -> Iterator[pa.RecordBatch]:
        return _read_partition(partition)


class Cfe39ChangeFeedSource(DataSource):
    """``format("cfe39-changes")`` — the table's changelog as a Spark
    DataSource: streaming (tail) and batch (incremental scan)."""

    @classmethod
    def name(cls) -> str:
        return "cfe39-changes"

    def schema(self) -> T.StructType:
        root = self.options.get("path")
        if not root:
            raise ValueError(
                "cfe39-changes: .option('path', <table root>) is required"
            )
        return feed_schema(SequenceTable(root))

    def streamReader(self, schema: T.StructType) -> DataSourceStreamReader:
        return ChangeFeedStreamReader(dict(self.options), schema)

    def reader(self, schema: T.StructType) -> DataSourceReader:
        return ChangeFeedBatchReader(dict(self.options), schema)


def register(spark) -> None:
    """Register the engine's DataSources on a session (idempotent)."""
    spark.dataSource.register(Cfe39ChangeFeedSource)
