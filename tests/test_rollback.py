"""Snapshot rollback (bad-batch recovery): append-only history rewind,
batch-log forgetting, and the roll-back-then-replay repair flow."""

import glob

import pytest
from pyspark.sql import functions as F

from cfe_39_spark.fixtures import GenConfig, write_fixture
from cfe_39_spark.operators.cdc import apply_batch
from cfe_39_spark.sources.table import SequenceTable

from .util import assert_state_equal


def _setup(spark, tmp_path):
    fx = write_fixture(
        str(tmp_path / "fx"),
        GenConfig(n_docs_initial=20, n_events=120, n_segments=3,
                  dup_rate=0.1, seed=137),
    )
    init = spark.read.parquet(str(tmp_path / "fx" / "initial.parquet"))
    t = SequenceTable.create(spark, str(tmp_path / "t"), init, n_buckets=4)
    segs = sorted(glob.glob(str(tmp_path / "fx" / "segments" / "*.parquet")))
    return fx, t, segs


def test_rollback_restores_state_and_preserves_history(spark, tmp_path):
    fx, t, segs = _setup(spark, tmp_path)
    states = {}
    for i, seg in enumerate(segs):
        apply_batch(spark, t, spark.read.parquet(seg), batch_id=i,
                    compact_threshold=None)
        states[t.latest_snapshot_id()] = t.read(spark).toPandas()
    tip = t.latest_snapshot_id()
    target = sorted(states)[0]  # after batch 0
    new_sid = t.rollback(target)
    assert new_sid > tip  # append-only: the pointer moved FORWARD
    assert_state_equal(t.read(spark), states[target])
    # time travel across the rolled-back span still works
    assert_state_equal(t.read(spark, snapshot_id=tip), states[tip])
    # no-op when already at the (logical) target state
    assert t.rollback(new_sid) == new_sid


def test_rollback_forgets_batch_ids_so_replay_applies(spark, tmp_path):
    fx, t, segs = _setup(spark, tmp_path)
    for i, seg in enumerate(segs):
        apply_batch(spark, t, spark.read.parquet(seg), batch_id=i,
                    compact_threshold=None)
    target = t.find_batch("0")
    t.rollback(target)
    # rolled-back batch ids must re-apply (NOT no-op)...
    for i, seg in enumerate(segs[1:], start=1):
        r = apply_batch(spark, t, spark.read.parquet(seg), batch_id=i,
                        compact_threshold=None)
        assert not r.noop, f"batch {i} wrongly deduped after rollback"
    assert_state_equal(t.read(spark), fx["expected"])
    # ...while surviving batch ids still dedupe
    assert apply_batch(spark, t, spark.read.parquet(segs[0]), batch_id=0).noop


def test_rollback_repairs_a_bad_batch(spark, tmp_path):
    """The operational flow the feature exists for: a corrupted batch
    lands, gets rolled back, and the corrected batch replays under the
    SAME batch_id."""
    fx, t, segs = _setup(spark, tmp_path)
    apply_batch(spark, t, spark.read.parquet(segs[0]), batch_id=0,
                compact_threshold=None)
    good_sid = t.latest_snapshot_id()
    bad = spark.read.parquet(segs[1]).withColumn(
        "tokens",
        F.transform("tokens", lambda x: F.lit(0).cast("int")).cast("array<int>"),
    )
    apply_batch(spark, t, bad, batch_id=1, compact_threshold=None)
    t.rollback(good_sid)
    for i, seg in enumerate(segs[1:], start=1):
        apply_batch(spark, t, spark.read.parquet(seg), batch_id=i,
                    compact_threshold=None)
    assert_state_equal(t.read(spark), fx["expected"])


def test_rollback_rejects_non_ancestor(spark, tmp_path):
    fx, t, segs = _setup(spark, tmp_path)
    apply_batch(spark, t, spark.read.parquet(segs[0]), batch_id=0,
                compact_threshold=None)
    with pytest.raises(FileNotFoundError):
        t.rollback(99)  # never existed
    tip = t.latest_snapshot_id()
    t.rollback(1)
    # the old tip is now a side branch ancestor-wise reachable; rolling
    # back TO it must still work (it is in the parent chain)
    assert t.rollback(tip) > tip
    assert_state_equal(
        t.read(spark),
        t.read(spark, snapshot_id=tip).toPandas(),
    )


def test_rollback_preserves_layout_properties(spark, tmp_path):
    """Layout props (sort_order/bloom/zorder) travel with the restored
    state: before this fix the rollback snapshot carried none, and since
    commits inherit layout from their PARENT, every commit after a
    rollback silently lost them — invisible to fsck (nothing dangles)."""
    from pyspark.sql import types as T

    from cfe_39_spark.schema import SEQUENCE_FIELDS_V1

    schema = T.StructType(
        SEQUENCE_FIELDS_V1
        + [T.StructField("x", T.DoubleType(), True),
           T.StructField("y", T.DoubleType(), True)]
    )
    df = (
        spark.range(64)
        .withColumn("doc_id", F.format_string("d%05d", F.col("id")))
        .withColumn("x", (F.col("id") % 8) / F.lit(8.0))
        .withColumn("y", F.floor(F.col("id") / 8) / F.lit(8.0))
        .withColumn("tokens", F.array((F.col("id") % 7).cast("int")))
        .withColumn("n_tok", F.lit(1).cast("int"))
        .withColumn("source", F.lit("g"))
        .select("doc_id", "tokens", "n_tok", "source", "x", "y")
    )
    t = SequenceTable.create(
        spark, str(tmp_path / "t"), df, n_buckets=2, user_schema=schema,
        zorder_cols=["x", "y"], zorder_domains={"x": (0, 1), "y": (0, 1)},
        bloom_filter_cols=["doc_id"],
    )
    target = t.latest_snapshot_id()
    t.rebucket(spark, 4)
    t.rollback(target)
    snap = t.snapshot()
    assert snap["zorder"]["cols"] == ["x", "y"], "rollback dropped zorder"
    assert snap["bloom_filter"]["cols"] == ["doc_id"], "rollback dropped bloom"
    # and the NEXT commit still carries them (inheritance chain intact)
    t.rebucket(spark, 4)
    snap = t.snapshot()
    assert snap["zorder"]["cols"] == ["x", "y"]
    assert snap["bloom_filter"]["cols"] == ["doc_id"]
