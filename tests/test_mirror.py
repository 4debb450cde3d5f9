"""Continuous CDC mirror (streaming/mirror.py): a downstream table kept
in sync from an upstream table's change feed, exactly-once under crash at
any point in the trigger."""

import glob

import pytest

from cfe_39_spark.fixtures import GenConfig, write_fixture
from cfe_39_spark.operators.cdc import apply_batch
from cfe_39_spark.sources import fs
from cfe_39_spark.sources.table import SequenceTable
from cfe_39_spark.streaming import mirror

from .util import assert_state_equal


@pytest.fixture()
def pair(spark, tmp_path):
    fx = write_fixture(
        str(tmp_path / "fx"),
        GenConfig(n_docs_initial=20, n_events=120, n_segments=4,
                  dup_rate=0.15, seed=103),
    )
    init = spark.read.parquet(str(tmp_path / "fx" / "initial.parquet"))
    src = SequenceTable.create(spark, str(tmp_path / "src"), init, n_buckets=4)
    dst = SequenceTable.create(spark, str(tmp_path / "dst"), init, n_buckets=4)
    segs = sorted(glob.glob(str(tmp_path / "fx" / "segments" / "*.parquet")))
    return fx, src, dst, segs, str(tmp_path / "chk")


def test_mirror_tracks_source_incrementally(spark, pair):
    """Interleave src commits with mirror triggers: after each drain the
    dst table equals the src table; at the end both equal the oracle."""
    fx, src, dst, segs, chk = pair
    for i, seg in enumerate(segs):
        apply_batch(spark, src, spark.read.parquet(seg), batch_id=i,
                    compact_threshold=None)
        ticks = mirror.run_mirror(spark, src, dst, chk)
        assert len(ticks) == 1 and ticks[0].applied
        assert_state_equal(dst.read(spark), src.read(spark).toPandas())
    assert_state_equal(dst.read(spark), fx["expected"])
    # drained: another trigger is a no-op
    assert mirror.run_mirror(spark, src, dst, chk) == []


def test_mirror_catches_up_multi_span(spark, pair):
    """A mirror that fell behind applies the whole backlog as ONE span
    (one trigger, one dst commit) and converges."""
    fx, src, dst, segs, chk = pair
    for i, seg in enumerate(segs):
        apply_batch(spark, src, spark.read.parquet(seg), batch_id=i,
                    compact_threshold=None)
    ticks = mirror.run_mirror(spark, src, dst, chk)
    assert len(ticks) == 1
    assert ticks[0].from_snapshot_id == 1
    assert ticks[0].to_snapshot_id == src.latest_snapshot_id()
    assert_state_equal(dst.read(spark), fx["expected"])


def test_mirror_crash_between_commit_and_cursor_is_exactly_once(spark, pair, monkeypatch):
    """Kill the mirror AFTER the dst commit but BEFORE the cursor write:
    the restart re-runs the same span with the same batch_id and the dst
    batches log makes the re-apply a no-op — no duplicate commit, state
    converges."""
    fx, src, dst, segs, chk = pair
    for i, seg in enumerate(segs[:2]):
        apply_batch(spark, src, spark.read.parquet(seg), batch_id=i,
                    compact_threshold=None)

    real_write = fs.write_json_atomic
    def crash_on_cursor(path, obj):
        if path.endswith("mirror-cursor.json"):
            raise RuntimeError("simulated crash before cursor write")
        return real_write(path, obj)

    monkeypatch.setattr(mirror.fs, "write_json_atomic", crash_on_cursor)
    with pytest.raises(RuntimeError, match="simulated crash"):
        mirror.mirror_once(spark, src, dst, chk)
    monkeypatch.undo()

    chain_after_crash = len(dst.committed_chain())
    ticks = mirror.run_mirror(spark, src, dst, chk)  # restart
    assert len(ticks) == 1 and ticks[0].from_snapshot_id == 1
    # idempotent re-apply: no second dst commit for the same span
    assert len(dst.committed_chain()) == chain_after_crash
    assert_state_equal(dst.read(spark), src.read(spark).toPandas())


def test_mirror_continuous_mode_picks_up_late_commits(spark, pair):
    """available_now=False polls: a src commit landing AFTER the mirror
    starts must still be applied (the daemon shape), then max_triggers
    bounds the loop for the test."""
    import threading
    import time

    fx, src, dst, segs, chk = pair

    def late_writer():
        time.sleep(1.5)
        apply_batch(spark, src, spark.read.parquet(segs[0]), batch_id=0,
                    compact_threshold=None)

    th = threading.Thread(target=late_writer)
    th.start()
    ticks = mirror.run_mirror(spark, src, dst, chk, available_now=False,
                              poll_interval_s=0.2, max_triggers=1)
    th.join(10)
    assert len(ticks) == 1 and ticks[0].applied
    assert_state_equal(dst.read(spark), src.read(spark).toPandas())


def test_mirror_skips_maintenance_commits(spark, pair):
    """A src compaction commit produces no change rows; the mirror must
    advance its cursor past it without committing to dst."""
    fx, src, dst, segs, chk = pair
    apply_batch(spark, src, spark.read.parquet(segs[0]), batch_id=0,
                compact_threshold=None)
    assert len(mirror.run_mirror(spark, src, dst, chk)) == 1
    dst_chain = len(dst.committed_chain())
    assert src.compact(spark) is not None
    ticks = mirror.run_mirror(spark, src, dst, chk)
    assert len(ticks) == 1 and not ticks[0].applied and ticks[0].rows == 0
    assert len(dst.committed_chain()) == dst_chain  # no empty dst commit
    assert mirror.load_cursor(chk) == src.latest_snapshot_id()
    # subsequent real commits still flow
    apply_batch(spark, src, spark.read.parquet(segs[1]), batch_id=1,
                compact_threshold=None)
    mirror.run_mirror(spark, src, dst, chk)
    assert_state_equal(dst.read(spark), src.read(spark).toPandas())


def test_mirror_derives_fused_hint_from_span_lineage(spark, pair, monkeypatch):
    """With no explicit known_partitions, the mirror derives the hint from
    the span snapshots' lineage (span_src_partitions) so the dst apply
    takes the fused one-job stats path — ADVICE r3 flagged that the old
    snapshot-id-based stamping made the fused path unreachable.  The hint
    must match the feed's actual src_partition set (the ORIGINAL source
    partitions, re-emitted by changes_as_events), and the mirrored state
    must stay bit-for-bit equal."""
    fx, src, dst, segs, chk = pair
    import cfe_39_spark.streaming.mirror as m
    from cfe_39_spark.operators import cdc

    seen_hints = []
    real_apply = cdc.apply_batch

    def spy(spark_, table_, events_, **kw):
        seen_hints.append(kw.get("known_partitions"))
        return real_apply(spark_, table_, events_, **kw)

    monkeypatch.setattr(m, "apply_batch", spy)
    for i, seg in enumerate(segs):
        apply_batch(spark, src, spark.read.parquet(seg), batch_id=i)
        m.mirror_once(spark, src, dst, chk)
    assert seen_hints and all(h is not None for h in seen_hints)
    # hint == the true partition set of the span's events
    import pyspark.sql.functions as F

    all_parts = set()
    for seg in segs:
        all_parts |= {
            r["src_partition"]
            for r in spark.read.parquet(seg).select("src_partition").distinct().collect()
        }
    assert set().union(*[set(h) for h in seen_hints]) <= all_parts
    assert_state_equal(dst.read(spark), fx["expected"])
    assert_state_equal(dst.read(spark), src.read(spark).orderBy("doc_id").toPandas())


def test_mirror_consumes_a_published_wap_span(spark, pair):
    """Publish is just a pointer move: a downstream mirror that drained
    main before the WAP cycle picks up the whole staged span after
    fast_forward — the change feed crosses publishes transparently."""
    fx, src, dst, segs, chk = pair
    # normal main commit, mirrored
    apply_batch(spark, src, spark.read.parquet(segs[0]), batch_id=0,
                compact_threshold=None)
    mirror.run_mirror(spark, src, dst, chk)
    assert_state_equal(dst.read(spark), src.read(spark).toPandas())
    # WAP: stage the rest on a branch — the mirror must see NOTHING yet
    src.create_branch("audit")
    b = src.branch("audit")
    for i, seg in enumerate(segs[1:], start=1):
        apply_batch(spark, b, spark.read.parquet(seg), batch_id=i,
                    compact_threshold=None)
    assert mirror.run_mirror(spark, src, dst, chk) == []
    # publish: one trigger drains the whole staged span downstream
    src.fast_forward("audit")
    ticks = mirror.run_mirror(spark, src, dst, chk)
    assert ticks and ticks[-1].applied
    assert_state_equal(dst.read(spark), src.read(spark).toPandas())
    assert_state_equal(dst.read(spark), fx["expected"])
