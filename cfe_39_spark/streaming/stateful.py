"""Arbitrary stateful streaming operator (SURVEY.md §2.4 T6).

The engine's own hot path deliberately avoids Spark-managed per-key state
(the C4 idempotency filter reads its high-watermarks from table state, so
the state store never grows — SURVEY.md §4.3).  This module demonstrates
the escape hatch for when per-key logic genuinely needs cross-batch memory
Spark must manage: ``applyInPandasWithState`` with a GroupState per key.

The demo operator is a per-key CDC progress tracker — the same bookkeeping
the idempotency filter keeps in the table (per-doc max applied offset),
plus running event counts and event-time bounds.  Every value is a
commutative-monoid fold (max / count / min / max), so the final emission
per key is independent of how the log is sliced into micro-batches — which
is exactly what makes it oracle-checkable against a plain GROUP BY.

Spark 4.x also ships ``transformWithStateInPandas`` (timers, TTL,
composite state); it requires the RocksDB state-store provider, so the
portable GroupState form is the default surface here.
``running_key_stats_tws`` below is the SAME operator on that successor
API (StatefulProcessor + ValueState, RocksDB-backed) — the migration
target once a deployment wants state larger than executor heap, TTL'd
state, or timers; tests assert the two forms emit identical final
snapshots.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)

# state = (max_offset, n_events, min_ts_us, max_ts_us); timestamps are kept
# as int64 epoch-micros in state (primitive, Arrow-stable) and surfaced as
# TimestampType only in the emitted rows
STATE_SCHEMA = StructType(
    [
        StructField("max_offset", LongType()),
        StructField("n_events", LongType()),
        StructField("min_ts_us", LongType()),
        StructField("max_ts_us", LongType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("max_offset", LongType()),
        StructField("n_events", LongType()),
        StructField("first_ts", TimestampType()),
        StructField("last_ts", TimestampType()),
    ]
)


def _track(
    key: Tuple[Any, ...],
    pdfs: Iterable["pd.DataFrame"],  # noqa: F821
    state: GroupState,
) -> Iterator["pd.DataFrame"]:  # noqa: F821
    """Fold this batch's rows for one key into the running state and emit
    the updated snapshot.  Runs inside the Python worker; pandas is
    imported there, not on the driver."""
    import pandas as pd

    if state.exists:
        max_off, n, mn_us, mx_us = state.get
    else:
        max_off, n, mn_us, mx_us = None, 0, None, None

    for pdf in pdfs:
        if pdf.empty:
            continue
        n += len(pdf)
        off = int(pdf["event_id"].max())
        max_off = off if max_off is None else max(max_off, off)
        ts_us = pdf["ts"].astype("datetime64[us]").astype("int64")
        lo, hi = int(ts_us.min()), int(ts_us.max())
        mn_us = lo if mn_us is None else min(mn_us, lo)
        mx_us = hi if mx_us is None else max(mx_us, hi)

    state.update((max_off, n, mn_us, mx_us))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "max_offset": [max_off],
            "n_events": [n],
            "first_ts": [pd.Timestamp(mn_us, unit="us")],
            "last_ts": [pd.Timestamp(mx_us, unit="us")],
        }
    )


def running_key_stats(src: DataFrame) -> DataFrame:
    """T6: per-key running (max offset, event count, event-time bounds)
    with Spark-managed state across micro-batches.  ``src`` is a streaming
    DataFrame with columns (user_id, event_id, ts, ...); emits one updated
    snapshot row per key per batch in which the key appears (update mode).
    """
    return src.groupBy("user_id").applyInPandasWithState(
        _track,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def running_key_stats_tws(src: DataFrame) -> DataFrame:
    """T6 on the Spark 4 successor API: ``transformWithStateInPandas`` with
    a ``StatefulProcessor`` holding one ValueState per key — semantically
    identical to ``running_key_stats`` (same fold, same emissions), tested
    equal.  Why it exists: the GroupState form keeps all state in executor
    memory with HDFS-backed snapshots; this form runs on the RocksDB state
    store (state >> heap, incremental checkpointing) and adds the
    composite-state/TTL/timer surface a long-running production tracker
    eventually needs.

    Caller must enable the provider BEFORE starting the query::

        spark.conf.set("spark.sql.streaming.stateStore.providerClass",
                       ROCKSDB_PROVIDER)

    (transformWithStateInPandas refuses the default HDFS provider; the
    rocksdbjni jar ships with stock Spark.)

    Sandbox note: the TWS worker protocol needs the ``google.protobuf``
    python package at RUNTIME (its state-server wire format); this
    environment ships pyspark without it, so the equivalence test skips
    here and runs on any normal installation — same documented gap class
    as the absent spark-sql-kafka jar (SURVEY.md §0.4)."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _TrackProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("track", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timer_values):  # noqa: ANN001
            import pandas as pd

            got = self._state.get() if self._state.exists() else None
            max_off, n, mn_us, mx_us = got if got is not None else (None, 0, None, None)
            for pdf in rows:
                if pdf.empty:
                    continue
                n += len(pdf)
                off = int(pdf["event_id"].max())
                max_off = off if max_off is None else max(max_off, off)
                ts_us = pdf["ts"].astype("datetime64[us]").astype("int64")
                lo, hi = int(ts_us.min()), int(ts_us.max())
                mn_us = lo if mn_us is None else min(mn_us, lo)
                mx_us = hi if mx_us is None else max(mx_us, hi)
            self._state.update((max_off, n, mn_us, mx_us))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "max_offset": [max_off],
                    "n_events": [n],
                    "first_ts": [pd.Timestamp(mn_us, unit="us")],
                    "last_ts": [pd.Timestamp(mx_us, unit="us")],
                }
            )

        def close(self) -> None:
            pass

    return src.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_TrackProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
