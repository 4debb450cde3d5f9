"""Incrementally-maintained aggregate views (streaming/aggview.py): the
view after each refresh must equal a full GROUP BY recompute over the
table's live state (inserts, updates — including group-moving retags —
and deletes all retracted correctly), refreshes must be crash-safe
(re-run after a failed meta swap converges, no double-count), and an
expired cursor must rebuild through the bootstrap-as-inserts path."""

import glob

import pytest
from pyspark.sql import functions as F

from cfe_39_spark.fixtures import GenConfig, write_fixture
from cfe_39_spark.operators.cdc import apply_batch
from cfe_39_spark.operators.dml import update_where
from cfe_39_spark.sources import fs
from cfe_39_spark.sources.table import SequenceTable
from cfe_39_spark.streaming.aggview import AggregateView


def _setup(spark, tmp_path, seed=81, n_events=300, n_segments=3):
    fx = write_fixture(
        str(tmp_path / "fx"),
        GenConfig(n_docs_initial=40, n_events=n_events,
                  n_segments=n_segments, dup_rate=0.15, seed=seed),
    )
    init = spark.read.parquet(str(tmp_path / "fx" / "initial.parquet"))
    t = SequenceTable.create(spark, str(tmp_path / "t"), init, n_buckets=4)
    segs = sorted(glob.glob(str(tmp_path / "fx" / "segments" / "*.parquet")))
    view = AggregateView(
        t, str(tmp_path / "view"), ["source"],
        {"total_tok": "n_tok", "total_chars": "n_tok * 2"},
    )
    return t, segs, view, fx


def _recompute(spark, t):
    return {
        r["source"]: (r["n_rows"], r["total_tok"], r["total_chars"])
        for r in t.read(spark).groupBy("source").agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("n_tok").alias("total_tok"),
            F.sum(F.expr("n_tok * 2")).alias("total_chars"),
        ).collect()
    }


def _view_dict(spark, view):
    return {
        r["source"]: (r["n_rows"], r["total_tok"], r["total_chars"])
        for r in view.read(spark).collect()
    }


def test_view_tracks_full_recompute_across_batches(spark, tmp_path):
    t, segs, view, _ = _setup(spark, tmp_path)
    assert view.read(spark).count() == 0  # typed-empty before refresh
    for i, s in enumerate(segs):
        apply_batch(spark, t, spark.read.parquet(s), batch_id=i,
                    compact_threshold=None)
        assert view.refresh(spark) == t.latest_snapshot_id()
        assert _view_dict(spark, view) == _recompute(spark, t), f"batch {i}"
    assert view.refresh(spark) is None  # already current


def test_view_retracts_group_moving_update(spark, tmp_path):
    """A source retag moves rows BETWEEN groups: the before image must
    debit the old group and the after image credit the new one."""
    t, segs, view, _ = _setup(spark, tmp_path, seed=82, n_segments=1)
    apply_batch(spark, t, spark.read.parquet(segs[0]), batch_id=0,
                compact_threshold=None)
    view.refresh(spark)
    srcs = sorted(_view_dict(spark, view))
    update_where(spark, t, {"source": "'retagged'"},
                 f"source = '{srcs[0]}'")
    view.refresh(spark)
    got = _view_dict(spark, view)
    assert srcs[0] not in got, "old group fully retracted"
    assert got == _recompute(spark, t)


def test_view_refresh_is_crash_safe(spark, tmp_path):
    """Crash between the data write and the meta swap: the re-run repeats
    the SAME span against the same old state (overwrite-idempotent dir),
    so nothing double-counts."""
    t, segs, view, _ = _setup(spark, tmp_path, seed=83, n_segments=2)
    apply_batch(spark, t, spark.read.parquet(segs[0]), batch_id=0,
                compact_threshold=None)
    view.refresh(spark)
    apply_batch(spark, t, spark.read.parquet(segs[1]), batch_id=1,
                compact_threshold=None)

    real = fs.write_json_atomic
    calls = {"n": 0}

    def crashing(path, obj):
        if path.endswith("_VIEW.json") and calls["n"] == 0:
            calls["n"] += 1
            raise RuntimeError("simulated crash before meta swap")
        return real(path, obj)

    fs.write_json_atomic = crashing
    try:
        with pytest.raises(RuntimeError, match="simulated crash"):
            view.refresh(spark)
    finally:
        fs.write_json_atomic = real
    # cursor unmoved; the re-run converges exactly once
    assert view.cursor() != t.latest_snapshot_id()
    view.refresh(spark)
    assert _view_dict(spark, view) == _recompute(spark, t)
    assert view.refresh(spark) is None


def test_view_rebootstraps_after_retention(spark, tmp_path):
    """Expire the view's cursor out of retention: refresh(auto) rebuilds
    from the full live state and matches the recompute."""
    t, segs, view, _ = _setup(spark, tmp_path, seed=84)
    apply_batch(spark, t, spark.read.parquet(segs[0]), batch_id=0,
                compact_threshold=None)
    view.refresh(spark)
    for i, s in enumerate(segs[1:], start=1):
        apply_batch(spark, t, spark.read.parquet(s), batch_id=i,
                    compact_threshold=None)
    t.expire_snapshots(keep_last=1)
    with pytest.raises(ValueError, match="expired"):
        view.refresh(spark, auto_rebootstrap=False)
    view.refresh(spark)
    assert _view_dict(spark, view) == _recompute(spark, t)
    # exactly one live data generation after the rebuild sweep
    gens = [n for n in fs.listdir(view.view_dir) if n.startswith("data-")]
    assert len(gens) == 1


def test_view_validations(spark, tmp_path):
    t, _, _, _ = _setup(spark, tmp_path, seed=85, n_segments=1)
    with pytest.raises(ValueError, match="group_cols"):
        AggregateView(t, str(tmp_path / "v2"), [], {"x": "n_tok"})
    with pytest.raises(ValueError, match="reserved"):
        AggregateView(t, str(tmp_path / "v3"), ["source"],
                      {"n_rows": "n_tok"})
