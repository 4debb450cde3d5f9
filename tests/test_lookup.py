"""Point-lookup serving path (SequenceTable.lookup): bucket + footer
min/max file skipping, answers identical to a full read."""

import glob

from cfe_39_spark.fixtures import GenConfig, write_fixture
from cfe_39_spark.operators.cdc import apply_batch
from cfe_39_spark.sources.table import SequenceTable


def _setup(spark, tmp_path, n_buckets=8):
    fx = write_fixture(
        str(tmp_path / "fx"),
        GenConfig(n_docs_initial=40, n_events=200, n_segments=4,
                  dup_rate=0.1, seed=109),
    )
    init = spark.read.parquet(str(tmp_path / "fx" / "initial.parquet"))
    t = SequenceTable.create(spark, str(tmp_path / "t"), init, n_buckets=n_buckets)
    for i, seg in enumerate(sorted(glob.glob(str(tmp_path / "fx" / "segments" / "*.parquet")))):
        apply_batch(spark, t, spark.read.parquet(seg), batch_id=i,
                    compact_threshold=None)  # keep MOR deltas: the hard case
    return fx, t


def test_lookup_matches_full_read(spark, tmp_path):
    fx, t = _setup(spark, tmp_path)
    full = {r["doc_id"]: r.asDict() for r in t.read(spark).collect()}
    live = sorted(full)
    keys = [live[0], live[len(live) // 2], live[-1]]
    got = {r["doc_id"]: r.asDict() for r in t.lookup(spark, keys).collect()}
    assert set(got) == set(keys)
    for k in keys:
        g, e = got[k], full[k]
        assert list(g["tokens"]) == list(e["tokens"])
        assert g == e


def test_lookup_deleted_and_missing_keys_absent(spark, tmp_path):
    fx, t = _setup(spark, tmp_path)
    live = {r["doc_id"] for r in t.read(spark).select("doc_id").collect()}
    # a tombstoned key: in state but deleted
    state_keys = {
        r["doc_id"]
        for r in t.read_state(spark).select("doc_id").collect()
    }
    deleted = sorted(state_keys - live)
    probe = (deleted[:1]) + ["doc-does-not-exist"] + sorted(live)[:1]
    got = {r["doc_id"] for r in t.lookup(spark, probe).collect()}
    assert got == {sorted(live)[0]}


def test_lookup_skips_files(spark, tmp_path):
    """The lookup plan must scan strictly fewer parquet files than a full
    read (bucket pruning alone guarantees this at n_buckets=8)."""
    fx, t = _setup(spark, tmp_path)
    live = sorted(r["doc_id"] for r in t.read(spark).select("doc_id").collect())
    key = [live[0]]
    full_files = set(t.read(spark).inputFiles())
    look_files = set(t.lookup(spark, key).inputFiles())
    assert look_files  # reads something
    assert look_files < full_files  # strict subset: files were skipped
    assert len(look_files) <= len(full_files) / 2


def test_lookup_empty_keys(spark, tmp_path):
    fx, t = _setup(spark, tmp_path)
    assert t.lookup(spark, []).count() == 0
