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


def test_lookup_prunes_manifest_segments(spark, tmp_path, monkeypatch):
    """The serving path must not materialize the whole manifest: segment
    references carry bucket-set + key-range aggregates, so a point lookup
    loads only segments that can hold the key's bucket — O(matching
    segments), not O(live files) driver work (Iceberg manifest-list
    pruning role)."""
    from cfe_39_spark.sources import table as table_mod

    fx, t = _setup(spark, tmp_path, n_buckets=8)
    live = sorted(r["doc_id"] for r in t.read(spark).select("doc_id").collect())
    key = live[0]
    # count segment loads through a cold cache
    table_mod._MANIFEST_CACHE.clear()
    loads = []
    real = SequenceTable._load_manifest

    def counting(self, ref):
        loads.append(ref["path"])
        return real(self, ref)

    monkeypatch.setattr(SequenceTable, "_load_manifest", counting)
    got = t.lookup(spark, [key]).collect()
    assert len(got) == 1 and got[0]["doc_id"] == key
    n_total = len(t.snapshot()["manifests"])
    # each per-trigger segment spans ~1 bucket's delta files out of 8
    # buckets, so a 1-key lookup must skip most of them
    assert len(set(loads) - {None}) < n_total, (loads, n_total)
    assert len(loads) <= max(n_total // 2, 1), (len(loads), n_total)


def test_scan_range_matches_filtered_full_read(spark, tmp_path):
    fx, t = _setup(spark, tmp_path)
    live = sorted(r["doc_id"] for r in t.read(spark).select("doc_id").collect())
    lo, hi = live[len(live) // 4], live[3 * len(live) // 4]
    exp = {
        r["doc_id"]: r.asDict()
        for r in t.read(spark).filter(f"doc_id >= '{lo}' AND doc_id <= '{hi}'").collect()
    }
    got = {r["doc_id"]: r.asDict() for r in t.scan_range(spark, lo, hi).collect()}
    assert got == exp
    import pytest

    with pytest.raises(ValueError):
        t.scan_range(spark, "z", "a")


def test_scan_range_skips_files_on_sorted_table(spark, tmp_path):
    """With a write sort_order the footer key ranges are tight, so a
    narrow range scan must plan strictly fewer files than a full read."""
    import glob as _glob

    from cfe_39_spark.fixtures import GenConfig, write_fixture

    fx = write_fixture(
        str(tmp_path / "fx2"),
        GenConfig(n_docs_initial=60, n_events=240, n_segments=4,
                  dup_rate=0.1, seed=211),
    )
    init = spark.read.parquet(str(tmp_path / "fx2" / "initial.parquet"))
    t = SequenceTable.create(spark, str(tmp_path / "t2"), init, n_buckets=8,
                             sort_order=["doc_id"])
    segs = sorted(_glob.glob(str(tmp_path / "fx2" / "segments" / "*.parquet")))
    for i, seg in enumerate(segs):
        apply_batch(spark, t, spark.read.parquet(seg), batch_id=i)
    t.compact(spark)
    live = sorted(r["doc_id"] for r in t.read(spark).select("doc_id").collect())
    lo = hi = live[0]  # the narrowest range
    full_files = set(t.read(spark).inputFiles())
    got = t.scan_range(spark, lo, hi)
    assert [r["doc_id"] for r in got.collect()] == [lo]
    scan_files = set(got.inputFiles())
    assert scan_files and scan_files < full_files


def test_scan_range_mixed_specs(spark, tmp_path):
    fx, t = _setup(spark, tmp_path, n_buckets=4)
    t.evolve_bucket_spec(8)
    # extra updates after the evolve: range scan must see their winners
    import glob as _glob

    segs = sorted(_glob.glob(str(tmp_path / "fx" / "segments" / "*.parquet")))
    apply_batch(spark, t, spark.read.parquet(segs[0]), batch_id="re-deliver",
                compact_threshold=None)
    live = sorted(r["doc_id"] for r in t.read(spark).select("doc_id").collect())
    lo, hi = live[0], live[len(live) // 2]
    exp = {
        r["doc_id"]: r.asDict()
        for r in t.read(spark).filter(f"doc_id >= '{lo}' AND doc_id <= '{hi}'").collect()
    }
    got = {r["doc_id"]: r.asDict() for r in t.scan_range(spark, lo, hi).collect()}
    assert got == exp
