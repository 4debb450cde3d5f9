"""The changelog Python DataSource (sources/datasource.py) — the table's
change feed as a first-class Structured Streaming source.  Pins: batch
and stream flavors are row-for-row identical to ``read_changes``,
checkpoint resume tails only new commits (exactly-once offsets),
maxSnapshotsPerTrigger rate-limits microbatches, a stream-driven mirror
converges to the primary's state, schema evolution reconciles through
the field-id plan, and an expired cursor fails with the shared
re-bootstrap error."""

import glob

import pandas as pd
import pytest
from pyspark.sql import functions as F

from cfe_39_spark.fixtures import GenConfig, write_fixture
from cfe_39_spark.operators.cdc import apply_batch
from cfe_39_spark.operators.dml import delete_where
from cfe_39_spark.sources.datasource import register
from cfe_39_spark.sources.table import SequenceTable, changes_as_events
from tests.util import assert_state_equal

ORDER = ["doc_id", "_commit_snapshot_id", "_last_offset"]


def _setup(spark, tmp_path, n_segments=3):
    fx = write_fixture(
        str(tmp_path / "fx"),
        GenConfig(n_docs_initial=50, n_events=200, n_segments=n_segments,
                  dup_rate=0.1, seed=7),
    )
    init = spark.read.parquet(str(tmp_path / "fx" / "initial.parquet"))
    t = SequenceTable.create(spark, str(tmp_path / "t"), init, n_buckets=2)
    segs = sorted(glob.glob(str(tmp_path / "fx" / "segments" / "*.parquet")))
    for i, s in enumerate(segs):
        apply_batch(spark, t, spark.read.parquet(s), batch_id=i,
                    compact_threshold=None)
    register(spark)
    return fx, t, segs


def _feed_pd(spark, t, frm=0):
    return (t.read_changes(spark, from_snapshot_id=frm)
            .orderBy(*ORDER).toPandas())


def test_batch_and_stream_flavors_equal_read_changes(spark, tmp_path):
    _, t, _ = _setup(spark, tmp_path)
    ref = _feed_pd(spark, t)
    assert len(ref) > 0

    got = (spark.read.format("cfe39-changes").option("path", t.root)
           .option("fromSnapshotId", "0").load()
           .orderBy(*ORDER).toPandas())
    pd.testing.assert_frame_equal(got, ref)

    q = (spark.readStream.format("cfe39-changes").option("path", t.root)
         .option("startingSnapshotId", "earliest").load()
         .writeStream.format("memory").queryName("ds_feed")
         .option("checkpointLocation", str(tmp_path / "chk"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got2 = spark.sql("select * from ds_feed").orderBy(*ORDER).toPandas()
    pd.testing.assert_frame_equal(got2, ref)

    # a from-cursor (batch) scopes the span exactly like read_changes
    mid = int(ref["_commit_snapshot_id"].median())
    got3 = (spark.read.format("cfe39-changes").option("path", t.root)
            .option("fromSnapshotId", str(mid)).load()
            .orderBy(*ORDER).toPandas())
    pd.testing.assert_frame_equal(got3, _feed_pd(spark, t, frm=mid))


def test_checkpoint_resume_tails_only_new_commits(spark, tmp_path):
    """Exactly-once via Spark-checkpointed snapshot-id offsets: a second
    availableNow run of the SAME query sees exactly the commits that
    landed in between — including a DML delete — and nothing twice."""
    fx, t, segs = _setup(spark, tmp_path)
    out = str(tmp_path / "sink")
    chk = str(tmp_path / "chk")

    def run():
        q = (spark.readStream.format("cfe39-changes").option("path", t.root)
             .option("startingSnapshotId", "earliest").load()
             .writeStream.format("parquet").option("path", out)
             .option("checkpointLocation", chk)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    run()
    first = spark.read.parquet(out).count()
    assert first == len(_feed_pd(spark, t))

    # new commits while the stream is down: one redelivered segment
    # (full batch re-apply → change rows for its winners) + one DML delete
    apply_batch(spark, t, spark.read.parquet(segs[0]), batch_id="re0",
                compact_threshold=None)
    victim = sorted(fx["expected"]["doc_id"])[0]
    assert delete_where(spark, t, f"doc_id = '{victim}'") is not None

    run()
    got = spark.read.parquet(out).orderBy(*ORDER).toPandas()
    pd.testing.assert_frame_equal(got, _feed_pd(spark, t))
    assert (got["_change_type"] == "delete").sum() >= 1


def test_rate_limit_bounds_snapshots_per_microbatch(spark, tmp_path):
    """maxSnapshotsPerTrigger caps the steady-state microbatch under a
    processingTime trigger.  With startingSnapshotId=latest the cap is
    restart-safe from the first batch (snapshot ids are monotonic, so the
    start can never sit behind a checkpointed cursor); commits that land
    while the stream runs must drain one snapshot per microbatch."""
    import time

    _, t, segs = _setup(spark, tmp_path, n_segments=4)
    seen, batches = set(), []

    def sink(df, epoch_id):
        ids = {r[0] for r in df.select("_commit_snapshot_id").distinct().collect()}
        batches.append(len(ids))
        seen.update(ids)

    q = (spark.readStream.format("cfe39-changes").option("path", t.root)
         .option("startingSnapshotId", "latest")
         .option("maxSnapshotsPerTrigger", "1").load()
         .writeStream.foreachBatch(sink)
         .option("checkpointLocation", str(tmp_path / "chk"))
         .trigger(processingTime="50 milliseconds").start())
    try:
        # wait for the reader to pin its "latest" start before committing
        # more (commits landing pre-init are legitimately skipped)
        deadline = time.monotonic() + 60
        while q.lastProgress is None and time.monotonic() < deadline:
            if q.exception() is not None:
                raise q.exception()
            time.sleep(0.2)
        assert q.lastProgress is not None, "stream never started"
        # a backlog of 3 redelivered segments lands while the stream runs
        for i, s in enumerate(segs[:3]):
            apply_batch(spark, t, spark.read.parquet(s), batch_id=f"re{i}",
                        compact_threshold=None)
        total = {r[0] for r in
                 t.read_changes(spark, t.latest_snapshot_id() - 3)
                 .select("_commit_snapshot_id").distinct().collect()}
        assert len(total) == 3
        deadline = time.monotonic() + 150
        while not total <= seen and time.monotonic() < deadline:
            if q.exception() is not None:
                raise q.exception()
            time.sleep(0.5)
    finally:
        q.stop()
    assert total <= seen, f"stream never caught up: {seen} vs {total}"
    assert all(b <= 1 for b in batches)
    assert len([b for b in batches if b]) >= 3


def test_stream_driven_mirror_converges(spark, tmp_path):
    """The flagship loop: tail the primary's changelog AS A STREAM, apply
    each microbatch to a downstream table via changes_as_events →
    apply_batch — the downstream converges to the primary's exact state."""
    _, t, _ = _setup(spark, tmp_path)
    init = spark.read.parquet(str(tmp_path / "fx" / "initial.parquet"))
    dst = SequenceTable.create(spark, str(tmp_path / "dst"), init, n_buckets=2)

    def apply_feed(df, epoch_id):
        apply_batch(df.sparkSession, dst, changes_as_events(df),
                    batch_id=f"feed-{epoch_id}", compact_threshold=None)

    q = (spark.readStream.format("cfe39-changes").option("path", t.root)
         .option("startingSnapshotId", "earliest")
         .option("maxSnapshotsPerTrigger", "2").load()
         .writeStream.foreachBatch(apply_feed)
         .option("checkpointLocation", str(tmp_path / "chk"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    assert_state_equal(dst.read(spark), t.read(spark).toPandas())


def test_schema_evolution_reconciles_old_change_files(spark, tmp_path):
    """Change files written before an added column null-fill through the
    same field-id plan as the batch reader: the stream's output equals
    read_changes after evolution."""
    _, t, _ = _setup(spark, tmp_path, n_segments=2)
    ev = (spark.createDataFrame(
        [("evo-doc", "U", 10 ** 6, 1, [1, 2], 2, "evo", 2, "hi")],
        "doc_id string, op string, offset long, epoch long, "
        "tokens array<int>, n_tok int, source string, schema_version int, "
        "note string")
        .select("doc_id", "op", "offset",
                F.current_timestamp().alias("event_time"), "epoch",
                F.lit(0).alias("src_partition"), "schema_version",
                "tokens", "n_tok", "source", "note"))
    apply_batch(spark, t, ev, batch_id="evolve", compact_threshold=None)
    ref = _feed_pd(spark, t)
    assert "note" in ref.columns and ref["note"].notna().sum() == 1

    q = (spark.readStream.format("cfe39-changes").option("path", t.root)
         .option("startingSnapshotId", "earliest").load()
         .writeStream.format("memory").queryName("ds_evo")
         .option("checkpointLocation", str(tmp_path / "chk"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql("select * from ds_evo").orderBy(*ORDER).toPandas()
    pd.testing.assert_frame_equal(got, ref)


def test_expired_cursor_fails_with_rebootstrap_error(spark, tmp_path):
    _, t, _ = _setup(spark, tmp_path)
    t.expire_snapshots(keep_last=1)
    q = (spark.readStream.format("cfe39-changes").option("path", t.root)
         .option("startingSnapshotId", "2").load()
         .writeStream.format("memory").queryName("ds_expired")
         .option("checkpointLocation", str(tmp_path / "chk"))
         .trigger(availableNow=True).start())
    with pytest.raises(Exception, match="expired|re-bootstrap"):
        q.awaitTermination(120)
