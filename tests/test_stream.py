"""Streaming ingest + kill-and-resume recovery (SURVEY.md §3.1/§3.2,
BASELINE.json:6 'kill-and-resume replay reproduces the final table state
bit-for-bit')."""

import pytest

from cfe_39_spark.fixtures import GenConfig, write_fixture
from cfe_39_spark.operators.cdc import apply_batch
from cfe_39_spark.sources.table import SequenceTable
from cfe_39_spark.streaming.ingest import replay, run_stream
from cfe_39_spark.streaming.lineage import read_lineage, throughput_summary

from .util import assert_state_equal


@pytest.fixture()
def fixture_dirs(spark, tmp_path):
    cfg = GenConfig(n_docs_initial=25, n_events=160, n_segments=4, dup_rate=0.2, seed=41)
    fx = write_fixture(str(tmp_path / "fx"), cfg)
    init = spark.read.parquet(str(tmp_path / "fx" / "initial.parquet"))
    table = SequenceTable.create(spark, str(tmp_path / "table"), init, n_buckets=4)
    return tmp_path, table, fx


def test_streaming_ingest_matches_oracle(spark, fixture_dirs):
    tmp_path, table, fx = fixture_dirs
    n = run_stream(
        spark, str(tmp_path / "fx" / "segments"), table,
        checkpoint=str(tmp_path / "cp"), max_files_per_trigger=1,
    )
    assert n >= 1
    assert_state_equal(table.read(spark), fx["expected"])


def test_kill_and_resume_bit_for_bit(spark, fixture_dirs):
    """Crash after 2 micro-batches (post-commit, pre-checkpoint-completion),
    then resume from the same checkpoint: final state must equal the oracle
    and the replayed batch must be a metadata no-op."""
    tmp_path, table, fx = fixture_dirs
    log = str(tmp_path / "fx" / "segments")
    cp = str(tmp_path / "cp")
    n1 = run_stream(
        spark, log, table, checkpoint=cp, max_files_per_trigger=1, stop_after_batches=2
    )
    assert n1 == 2
    snap_count_before = table.latest_snapshot_id()
    n2 = run_stream(spark, log, table, checkpoint=cp, max_files_per_trigger=1)
    assert n2 >= 1
    assert_state_equal(table.read(spark), fx["expected"])
    # batch 1 was committed before the crash; its replay must not create
    # a second snapshot for the same batchId
    chain = table.committed_chain()
    batch_ids = [s["batch_id"] for s in chain]
    assert len(batch_ids) == len(set(batch_ids)), batch_ids
    assert table.latest_snapshot_id() > snap_count_before


def test_batch_replay_driver_matches_streaming(spark, fixture_dirs):
    """replay() (S2) and run_stream() produce identical state — one
    pipeline, two drivers."""
    tmp_path, table, fx = fixture_dirs
    results = replay(spark, str(tmp_path / "fx" / "segments"), table)
    assert sum(r.events_in for r in results) > 0
    assert_state_equal(table.read(spark), fx["expected"])


def test_lineage_records(spark, fixture_dirs):
    tmp_path, table, fx = fixture_dirs
    replay(spark, str(tmp_path / "fx" / "segments"), table)
    ln = read_lineage(spark, str(tmp_path / "table"))
    assert ln.count() > 0
    cols = set(ln.columns)
    assert {"batch_id", "snapshot_id", "src_partition", "min_offset",
            "max_offset", "rows_applied", "wall_ms"} <= cols
    # offsets within a (batch, partition) are sane
    bad = ln.filter("min_offset > max_offset").count()
    assert bad == 0
    ts = throughput_summary(spark, str(tmp_path / "table"))
    assert ts.filter("events_per_sec > 0").count() == ts.count()


def test_crash_before_commit_then_retry(spark, tmp_path, monkeypatch):
    """Simulated crash AFTER data-file write but BEFORE snapshot commit:
    the retry re-applies the batch and converges to the oracle state;
    orphan files from the failed attempt are swept by expiry."""
    cfg = GenConfig(n_docs_initial=15, n_events=80, n_segments=2, seed=43)
    fx = write_fixture(str(tmp_path / "fx"), cfg)
    init = spark.read.parquet(str(tmp_path / "fx" / "initial.parquet"))
    table = SequenceTable.create(spark, str(tmp_path / "table"), init, n_buckets=4)
    import glob as g

    segs = sorted(g.glob(str(tmp_path / "fx" / "segments" / "*.parquet")))
    apply_batch(spark, table, spark.read.parquet(segs[0]), batch_id=0)

    real_commit = SequenceTable.commit

    def exploding_commit(self, *a, **kw):
        raise RuntimeError("simulated crash before commit")

    monkeypatch.setattr(SequenceTable, "commit", exploding_commit)
    with pytest.raises(RuntimeError):
        apply_batch(spark, table, spark.read.parquet(segs[1]), batch_id=1)
    monkeypatch.setattr(SequenceTable, "commit", real_commit)

    # retry of the same batch (Spark would replay it with the same batchId)
    apply_batch(spark, table, spark.read.parquet(segs[1]), batch_id=1)
    assert_state_equal(table.read(spark), fx["expected"])

    # the crashed attempt's data dir is unreachable; expiry removes it
    stats = table.expire_snapshots(keep_last=1)
    assert stats["removed_files"] >= 0
    assert_state_equal(table.read(spark), fx["expected"])


def test_stream_metrics_listener_records(spark, fixture_dirs):
    """S5 control-plane: a bounded stream leaves per-trigger
    StreamingQueryListener progress records beside the table."""
    from cfe_39_spark.streaming.lineage import read_stream_metrics

    tmp_path, table, fx = fixture_dirs
    n = run_stream(
        spark, str(tmp_path / "fx" / "segments"), table,
        checkpoint=str(tmp_path / "cp"), max_files_per_trigger=2,
    )
    m = read_stream_metrics(spark, str(tmp_path / "table"))
    rows = m.collect()
    assert len(rows) >= n, f"expected >= {n} progress records, got {len(rows)}"
    assert all(r["query_name"] == "cfe39-cdc-ingest" for r in rows)
    assert sum(r["num_input_rows"] for r in rows) > 0
    assert all(r["trigger_ms"] >= 0 for r in rows)


def test_processing_time_trigger_soak(spark, tmp_path):
    """Continuous-mode soak (VERDICT r3 #6): a processingTime-paced stream
    over segments ARRIVING WHILE IT RUNS — not availableNow catch-up.
    Asserts per-trigger lineage continuity (per-partition offset ranges
    advance monotonically across triggers with no overlap — dup_rate=0 so
    ranges are genuinely disjoint; redelivery overlap is covered by the
    kill-and-resume tests), listener metrics for every trigger, and
    final-state equality."""
    import glob
    import os
    import shutil
    import threading
    import time

    cfg = GenConfig(n_docs_initial=25, n_events=160, n_segments=4, seed=47)
    fx = write_fixture(str(tmp_path / "fx"), cfg)
    init = spark.read.parquet(str(tmp_path / "fx" / "initial.parquet"))
    table = SequenceTable.create(spark, str(tmp_path / "table"), init, n_buckets=4)
    segs = sorted(glob.glob(str(tmp_path / "fx" / "segments" / "*.parquet")))
    live = tmp_path / "live-log"
    os.makedirs(live)
    # first segment present at start (schema inference needs >=1 file)
    shutil.copy(segs[0], live / os.path.basename(segs[0]))

    def feeder():
        for s in segs[1:]:
            time.sleep(1.2)
            # dot-prefixed staging name: Spark's file source ignores hidden
            # files, so the segment appears ATOMICALLY at rename.  A visible
            # ".tmp" suffix races the trigger loop — under host load the
            # copy->rename window spans a trigger, and the source would
            # ingest the same segment under both paths (observed flake:
            # overlapping per-partition offset ranges in lineage).
            shutil.copy(s, live / ("." + os.path.basename(s) + ".tmp"))
            os.rename(live / ("." + os.path.basename(s) + ".tmp"),
                      live / os.path.basename(s))

    th = threading.Thread(target=feeder, daemon=True)
    th.start()
    n = run_stream(
        spark, str(live), table, checkpoint=str(tmp_path / "cp-soak"),
        max_files_per_trigger=1, available_now=False,
        processing_time="500 milliseconds", max_batches=len(segs),
    )
    th.join()
    assert n == len(segs)
    assert_state_equal(table.read(spark), fx["expected"])

    # lineage continuity: walk commits oldest-first; per partition, each
    # trigger's offset range must start strictly after the previous ends
    chain = [s for s in reversed(table.committed_chain())
             if s.get("lineage", {}).get("per_partition")]
    assert len(chain) == len(segs)
    last_max: dict[int, int] = {}
    for s in chain:
        for p in s["lineage"]["per_partition"]:
            pid = p["src_partition"]
            if pid in last_max:
                assert p["min_offset"] > last_max[pid], (
                    pid, p, last_max[pid])
            last_max[pid] = p["max_offset"]

    # listener metrics: one progress record per trigger that moved data
    from cfe_39_spark.streaming.lineage import metrics_dir

    d = metrics_dir(table.root)
    # generous deadline: the listener flushes from its own event thread,
    # which lags under full-suite host load
    deadline = time.monotonic() + 30
    while time.monotonic() < deadline:
        got = [f for f in os.listdir(d)] if os.path.isdir(d) else []
        if len([f for f in got if f.startswith("progress-")]) >= n:
            break
        time.sleep(0.2)
    assert len([f for f in os.listdir(d) if f.startswith("progress-")]) >= n
