"""End-to-end batch MERGE pipeline vs the pandas oracle (SURVEY.md §7 step 3:
the minimum slice — load fixture table, apply change batches, read snapshot,
assert bit-for-bit state equality)."""

import numpy as np
import pytest

from cfe_39_spark.fixtures import GenConfig, expected_state, gen_events, gen_initial, segment_events, write_fixture
from cfe_39_spark.operators.cdc import apply_batch
from cfe_39_spark.sources.table import SequenceTable

from .util import assert_state_equal


def _replay(spark, tmp_path, cfg, boundaries=None, n_buckets=8):
    fx = write_fixture(str(tmp_path / "fx"), cfg, boundaries)
    init = spark.read.parquet(str(tmp_path / "fx" / "initial.parquet"))
    table = SequenceTable.create(spark, str(tmp_path / "table"), init, n_buckets=n_buckets)
    import glob

    for i, seg in enumerate(sorted(glob.glob(str(tmp_path / "fx" / "segments" / "*.parquet")))):
        apply_batch(spark, table, spark.read.parquet(seg), batch_id=i)
    return table, fx


def test_single_batch_insert_update_delete(spark, tmp_path):
    cfg = GenConfig(n_docs_initial=20, n_events=60, n_segments=1, seed=7)
    table, fx = _replay(spark, tmp_path, cfg)
    assert_state_equal(table.read(spark), fx["expected"])


def test_multi_batch_replay_matches_oracle(spark, tmp_path):
    cfg = GenConfig(n_docs_initial=30, n_events=200, n_segments=5, seed=11)
    table, fx = _replay(spark, tmp_path, cfg)
    assert_state_equal(table.read(spark), fx["expected"])


def test_duplicate_delivery_is_noop(spark, tmp_path):
    cfg = GenConfig(n_docs_initial=25, n_events=150, n_segments=4, dup_rate=0.3, seed=13)
    table, fx = _replay(spark, tmp_path, cfg)
    assert_state_equal(table.read(spark), fx["expected"])


def test_reslicing_invariance(spark, tmp_path):
    """Same events, different segment boundaries => identical final state."""
    cfg = GenConfig(n_docs_initial=20, n_events=120, n_segments=4, seed=17)
    t1, fx1 = _replay(spark, tmp_path / "a", cfg)
    t2, fx2 = _replay(spark, tmp_path / "b", cfg, boundaries=[10, 30, 35, 90, 100])
    assert_state_equal(t1.read(spark), fx1["expected"])
    assert_state_equal(t2.read(spark), fx1["expected"])


def test_out_of_order_and_shuffled(spark, tmp_path):
    cfg = GenConfig(
        n_docs_initial=20, n_events=150, n_segments=3,
        shuffle_within_segments=True, seed=19,
    )
    table, fx = _replay(spark, tmp_path, cfg)
    assert_state_equal(table.read(spark), fx["expected"])


def test_hot_key_skew(spark, tmp_path):
    cfg = GenConfig(n_docs_initial=100, n_events=300, n_segments=3, key_dist="hot", seed=23)
    table, fx = _replay(spark, tmp_path, cfg)
    assert_state_equal(table.read(spark), fx["expected"])


@pytest.mark.parametrize("strategy", ["salted_window", "max_by", "bcast_join"])
def test_lww_strategies_agree(spark, tmp_path, strategy):
    cfg = GenConfig(n_docs_initial=15, n_events=100, n_segments=2,
                    dup_rate=0.2, shuffle_within_segments=True, seed=29)
    fx = write_fixture(str(tmp_path / "fx"), cfg)
    init = spark.read.parquet(str(tmp_path / "fx" / "initial.parquet"))
    table = SequenceTable.create(spark, str(tmp_path / f"t-{strategy}"), init, n_buckets=4)
    import glob

    for i, seg in enumerate(sorted(glob.glob(str(tmp_path / "fx" / "segments" / "*.parquet")))):
        apply_batch(spark, table, spark.read.parquet(seg), batch_id=i, lww_strategy=strategy)
    assert_state_equal(table.read(spark), fx["expected"])


def test_cross_partition_tie_breaks_deterministically(spark, tmp_path):
    """Two DIFFERENT events for one doc tying on (event_time, offset)
    across source partitions (offsets are only per-partition monotone)
    must resolve identically on every run and under every strategy:
    src_partition is the tertiary tiebreak, so the partition-3 payload
    wins over partition-1's."""
    import datetime

    from cfe_39_spark.operators.cdc import lww_winners

    ts = datetime.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        ("d1", [1, 2], 2, "a", "U", 7, 1, 0, 1, ts),
        ("d1", [9, 9], 2, "b", "U", 7, 3, 0, 1, ts),  # same (ts, offset), higher partition
        ("d1", [5, 5], 2, "c", "U", 5, 2, 0, 1, ts),  # lower offset: never wins
    ]
    schema = ("doc_id string, tokens array<int>, n_tok int, source string, "
              "op string, offset long, src_partition int, epoch long, "
              "schema_version int, event_time timestamp")
    ev = spark.createDataFrame(rows, schema)
    outcomes = set()
    for strategy in ("bcast_join", "max_by", "salted_window"):
        for _ in range(2):  # identical across runs, not just strategies
            w = lww_winners(ev, strategy).collect()
            assert len(w) == 1
            outcomes.add((w[0]["source"], tuple(w[0]["tokens"])))
    assert outcomes == {("b", (9, 9))}


@pytest.mark.parametrize("mode", ["mor", "cow"])
def test_cross_batch_tie_persists_tiebreak(spark, tmp_path, mode):
    """The tertiary src_partition tiebreak must survive BATCH BOUNDARIES:
    two different events tying on (event_time, offset) must resolve to the
    same winner whether they arrive in one batch or split across two, in
    either arrival order, under MOR read-time resolution and COW merge
    alike.  Requires the winner's src_partition to be persisted
    (_last_src_partition) — with only the pair stored, the split case is
    nondeterministic (ADVICE r3)."""
    import datetime

    ts = datetime.datetime(2024, 1, 1, 12, 0, 0)
    schema = ("doc_id string, tokens array<int>, n_tok int, source string, "
              "op string, offset long, src_partition int, epoch long, "
              "schema_version int, event_time timestamp")
    lo = ("d1", [1, 2], 2, "a", "U", 7, 1, 0, 1, ts)  # partition 1
    hi = ("d1", [9, 9], 2, "b", "U", 7, 3, 0, 1, ts)  # partition 3: must win
    slicings = {
        "one_batch": [[lo, hi]],
        "lo_then_hi": [[lo], [hi]],
        "hi_then_lo": [[hi], [lo]],
    }
    for tag, batches in slicings.items():
        t = SequenceTable.create(
            spark, str(tmp_path / f"t-{mode}-{tag}"), n_buckets=2
        )
        for i, rows in enumerate(batches):
            apply_batch(spark, t, spark.createDataFrame(rows, schema),
                        batch_id=i, mode=mode, compact_threshold=None)
        got = t.read(spark).collect()
        assert len(got) == 1, (mode, tag, got)
        assert got[0]["source"] == "b", (mode, tag, got)
        assert list(got[0]["tokens"]) == [9, 9], (mode, tag)
        # and the persisted bookkeeping carries the winning partition
        st = t.read_state(spark).collect()[0]
        assert st["_last_src_partition"] == 3, (mode, tag, st)


def test_batch_idempotency_on_reapply(spark, tmp_path):
    """Re-applying an already-committed batch_id is a no-op (exactly-once layer 1)."""
    cfg = GenConfig(n_docs_initial=10, n_events=40, n_segments=2, seed=31)
    fx = write_fixture(str(tmp_path / "fx"), cfg)
    init = spark.read.parquet(str(tmp_path / "fx" / "initial.parquet"))
    table = SequenceTable.create(spark, str(tmp_path / "table"), init, n_buckets=4)
    import glob

    segs = sorted(glob.glob(str(tmp_path / "fx" / "segments" / "*.parquet")))
    for i, seg in enumerate(segs):
        apply_batch(spark, table, spark.read.parquet(seg), batch_id=i)
    sid = table.latest_snapshot_id()
    r = apply_batch(spark, table, spark.read.parquet(segs[0]), batch_id=0)
    assert r.noop and table.latest_snapshot_id() == sid
    assert_state_equal(table.read(spark), fx["expected"])


def test_tokens_stay_int32(spark, tmp_path):
    cfg = GenConfig(n_docs_initial=10, n_events=30, n_segments=1, seed=37)
    table, fx = _replay(spark, tmp_path, cfg)
    field = dict((f.name, f.dataType.simpleString()) for f in table.read(spark).schema.fields)
    assert field["tokens"] == "array<int>"
    row = table.read(spark).filter("tokens is not null").first()
    assert np.asarray(row["tokens"]).dtype in (np.int32, np.dtype("int32")) or all(
        isinstance(t, int) for t in row["tokens"]
    )


def test_fused_stats_path_equivalent(spark, tmp_path):
    """apply_batch with known_partitions (lineage stats observed during the
    delta-write job — one Spark job per trigger) must produce identical
    state AND identical lineage to the eager two-job path; a wrong hint
    must self-correct via the fallback, never mis-report."""
    import glob

    cfg = GenConfig(n_docs_initial=25, n_events=120, n_segments=3, dup_rate=0.2, seed=41)
    fx = write_fixture(str(tmp_path / "fx"), cfg)
    init = spark.read.parquet(str(tmp_path / "fx" / "initial.parquet"))
    segs = sorted(glob.glob(str(tmp_path / "fx" / "segments" / "*.parquet")))

    results = {}
    for tag, hint in (
        ("eager", None),
        ("fused", list(range(cfg.n_partitions))),
        ("bad_hint", [0]),  # most partitions missing -> fallback path
    ):
        t = SequenceTable.create(spark, str(tmp_path / f"t-{tag}"), init, n_buckets=4)
        rs = []
        for i, seg in enumerate(segs):
            rs.append(
                apply_batch(
                    spark, t, spark.read.parquet(seg), batch_id=i,
                    known_partitions=hint,
                )
            )
        assert_state_equal(t.read(spark), fx["expected"])
        results[tag] = [
            (r.rows_applied, r.events_in, r.per_partition) for r in rs
        ]
    assert results["eager"] == results["fused"]
    # the bad hint's per-partition rows_applied degrade to the grouped
    # recomputation; totals must still agree exactly
    for (ra, ei, pp), (ra2, ei2, pp2) in zip(results["eager"], results["bad_hint"]):
        assert (ra, ei) == (ra2, ei2)
        assert [
            (p["src_partition"], p["min_offset"], p["max_offset"], p["events_in"])
            for p in pp
        ] == [
            (p["src_partition"], p["min_offset"], p["max_offset"], p["events_in"])
            for p in pp2
        ]


def test_auto_lww_strategy_guards_broadcast(spark, tmp_path):
    """'auto' must fall back to max_by when a batch's distinct-key count
    exceeds the broadcast budget (VERDICT r3 #3: the one config foot-gun on
    the hot path), stay on bcast_join under it, and be property-equal
    either way.  Fused path: the guard is feedback-controlled — trigger
    N+1 plans from trigger N's observed key count."""
    import glob

    cfg = GenConfig(n_docs_initial=50, n_events=400, n_segments=2, seed=43)
    fx = write_fixture(str(tmp_path / "fx"), cfg)
    init = spark.read.parquet(str(tmp_path / "fx" / "initial.parquet"))
    segs = sorted(glob.glob(str(tmp_path / "fx" / "segments" / "*.parquet")))

    # unfused path (no hint): measured on the stats job, same-batch switch
    t1 = SequenceTable.create(spark, str(tmp_path / "t1"), init, n_buckets=4)
    used = [
        apply_batch(spark, t1, spark.read.parquet(s), batch_id=i,
                    bcast_key_budget=5).lww_strategy_used
        for i, s in enumerate(segs)
    ]
    assert used == ["max_by", "max_by"], used  # every batch has >5 keys
    assert_state_equal(t1.read(spark), fx["expected"])

    t2 = SequenceTable.create(spark, str(tmp_path / "t2"), init, n_buckets=4)
    used = [
        apply_batch(spark, t2, spark.read.parquet(s), batch_id=i,
                    bcast_key_budget=10**6).lww_strategy_used
        for i, s in enumerate(segs)
    ]
    assert used == ["bcast_join", "bcast_join"], used
    assert_state_equal(t2.read(spark), fx["expected"])

    # fused path (hint): trigger 0 has no observation and no committed
    # lineage -> conservative max_by (round-4 finding: the old optimistic
    # bcast_join default could blow the broadcast the guard exists to
    # prevent); trigger 1 sees trigger 0's observed count, stays max_by
    t3 = SequenceTable.create(spark, str(tmp_path / "t3"), init, n_buckets=4)
    hint = list(range(cfg.n_partitions))
    used = [
        apply_batch(spark, t3, spark.read.parquet(s), batch_id=i,
                    known_partitions=hint,
                    bcast_key_budget=5).lww_strategy_used
        for i, s in enumerate(segs)
    ]
    assert used == ["max_by", "max_by"], used
    assert_state_equal(t3.read(spark), fx["expected"])

    # fused path, roomy budget: trigger 0 still conservative (fresh table,
    # nothing committed), trigger 1 upgrades to bcast_join from feedback
    t4 = SequenceTable.create(spark, str(tmp_path / "t4"), init, n_buckets=4)
    used = [
        apply_batch(spark, t4, spark.read.parquet(s), batch_id=i,
                    known_partitions=hint,
                    bcast_key_budget=10**6).lww_strategy_used
        for i, s in enumerate(segs)
    ]
    assert used == ["max_by", "bcast_join"], used
    assert_state_equal(t4.read(spark), fx["expected"])


def test_auto_lww_first_trigger_seeds_from_lineage(spark, tmp_path):
    """Process-restart half of the fused 'auto' guard (VERDICT r4 #3): the
    first trigger of a NEW process seeds its broadcast decision from the
    last committed lineage's distinct_keys instead of defaulting to
    bcast_join on zero information — and a fresh table with an all-new-key
    first batch picks max_by."""
    import glob

    from cfe_39_spark.operators.cdc import _LAST_DISTINCT_KEYS

    cfg = GenConfig(n_docs_initial=50, n_events=400, n_segments=3, seed=47)
    fx = write_fixture(str(tmp_path / "fx"), cfg)
    init = spark.read.parquet(str(tmp_path / "fx" / "initial.parquet"))
    segs = sorted(glob.glob(str(tmp_path / "fx" / "segments" / "*.parquet")))
    hint = list(range(cfg.n_partitions))

    t = SequenceTable.create(spark, str(tmp_path / "t"), init, n_buckets=4)
    _LAST_DISTINCT_KEYS.pop(t.root, None)  # fresh process, fresh table
    r0 = apply_batch(spark, t, spark.read.parquet(segs[0]), batch_id=0,
                     known_partitions=hint, bcast_key_budget=10**6)
    assert r0.lww_strategy_used == "max_by"  # nothing known anywhere
    # the observation is now COMMITTED in lineage
    assert t.snapshot()["lineage"]["distinct_keys"] > 0

    # simulate a process restart: in-memory feedback gone, lineage present
    _LAST_DISTINCT_KEYS.pop(t.root, None)
    r1 = apply_batch(spark, t, spark.read.parquet(segs[1]), batch_id=1,
                     known_partitions=hint, bcast_key_budget=10**6)
    assert r1.lww_strategy_used == "bcast_join"  # seeded from lineage

    # restart again with a TIGHT budget: the committed count exceeds it,
    # so the seed must push the first trigger to max_by
    _LAST_DISTINCT_KEYS.pop(t.root, None)
    r2 = apply_batch(spark, t, spark.read.parquet(segs[2]), batch_id=2,
                     known_partitions=hint, bcast_key_budget=5)
    assert r2.lww_strategy_used == "max_by"
    assert_state_equal(t.read(spark), fx["expected"])

    # the seed walk crosses maintenance commits (no distinct_keys in their
    # lineage): rebucket, restart, apply -> still seeded, still bcast_join
    t.rebucket(spark, 8)
    _LAST_DISTINCT_KEYS.pop(t.root, None)
    segs_again = segs[0]
    r3 = apply_batch(spark, t, spark.read.parquet(segs_again), batch_id="redo-0",
                     known_partitions=hint, bcast_key_budget=10**6)
    assert r3.lww_strategy_used == "bcast_join"
    assert_state_equal(t.read(spark), fx["expected"])
