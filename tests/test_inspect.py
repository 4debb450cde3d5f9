"""Metadata inspection tables (sources/inspect.py) — Iceberg's
snapshots / history / refs / manifests / files metadata-table role.

The views must agree with the metadata layer they render: snapshots with
the descriptor set on disk, history with committed_chain, refs with
tags()/branches() + TTL envelopes, manifests with the snapshot's segment
references, and files (the DISTRIBUTED view) with the materialized
manifest entries."""

import glob
import json
import os
import subprocess
import sys

from cfe_39_spark.fixtures import GenConfig, write_fixture
from cfe_39_spark.operators.cdc import apply_batch
from cfe_39_spark.sources import fs
from cfe_39_spark.sources.table import SequenceTable

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _replayed(spark, tmp_path, n_segments=3, seed=131):
    cfg = GenConfig(
        n_docs_initial=20, n_events=120, n_segments=n_segments,
        dup_rate=0.2, seed=seed,
    )
    write_fixture(str(tmp_path / "fx"), cfg)
    init = spark.read.parquet(str(tmp_path / "fx" / "initial.parquet"))
    table = SequenceTable.create(spark, str(tmp_path / "table"), init, n_buckets=4)
    segs = sorted(glob.glob(str(tmp_path / "fx" / "segments" / "*.parquet")))
    return table, segs


def test_snapshots_and_history_views(spark, tmp_path):
    table, segs = _replayed(spark, tmp_path)
    for i, s in enumerate(segs):
        apply_batch(spark, table, spark.read.parquet(s), batch_id=i)

    chain = table.committed_chain()
    hist = table.inspect(spark, "history").collect()
    assert [r.snapshot_id for r in hist] == [s["snapshot_id"] for s in chain]
    assert [r.is_current for r in hist] == [True] + [False] * (len(chain) - 1)
    assert hist[0].batch_id == str(len(segs) - 1)

    snaps = {r.snapshot_id: r for r in table.inspect(spark, "snapshots").collect()}
    assert set(snaps) == {s["snapshot_id"] for s in chain}
    tip = chain[0]
    row = snaps[tip["snapshot_id"]]
    assert row.on_main_chain and row.batch_id == tip["batch_id"]
    # aggregates come from manifest references, and must equal the
    # materialized entry list
    entries = table._manifest_files(tip)
    assert row.n_data_files == len(entries)
    assert row.n_rows == sum(e["rows"] for e in entries)
    assert row.n_manifests == len(tip["manifests"])


def test_snapshots_view_shows_detached_tagged_survivor(spark, tmp_path):
    """A tagged snapshot that retention has passed stays visible in the
    snapshots view, flagged off-chain — exactly the state an operator
    needs to see to understand why storage is still held."""
    table, segs = _replayed(spark, tmp_path)
    apply_batch(spark, table, spark.read.parquet(segs[0]), batch_id=0)
    pinned = table.tag("pin")
    for i, s in enumerate(segs[1:], start=1):
        apply_batch(spark, table, spark.read.parquet(s), batch_id=i)
    table.expire_snapshots(keep_last=1, orphan_grace_s=0.0)

    snaps = {r.snapshot_id: r for r in table.inspect(spark, "snapshots").collect()}
    assert pinned in snaps and not snaps[pinned].on_main_chain
    assert snaps[table.latest_snapshot_id()].on_main_chain


def test_refs_view(spark, tmp_path):
    table, segs = _replayed(spark, tmp_path)
    apply_batch(spark, table, spark.read.parquet(segs[0]), batch_id=0)
    table.tag("v1")
    table.tag("nightly", max_age_s=3600.0)
    table.create_branch("audit")
    b = table.branch("audit")
    apply_batch(spark, b, spark.read.parquet(segs[1]), batch_id="staged")

    refs = {(r.type, r.name): r for r in table.inspect(spark, "refs").collect()}
    assert refs[("tag", "v1")].snapshot_id == table.tags()["v1"]
    assert refs[("tag", "v1")].max_age_s is None
    assert refs[("tag", "nightly")].max_age_s == 3600.0
    assert refs[("tag", "nightly")].created_at is not None
    br = refs[("branch", "audit")]
    assert br.snapshot_id == table.branches()["audit"]
    assert br.fork_snapshot_id is not None
    assert br.fork_snapshot_id < br.snapshot_id  # staged work above the fork


def test_manifests_and_files_views_match_metadata(spark, tmp_path):
    table, segs = _replayed(spark, tmp_path)
    for i, s in enumerate(segs):
        apply_batch(spark, table, spark.read.parquet(s), batch_id=i)
    snap = table.snapshot()

    man = table.inspect(spark, "manifests").collect()
    assert {r.path for r in man} == {m["path"] for m in snap["manifests"]}
    assert sum(r.n_files for r in man) == sum(m["n_files"] for m in snap["manifests"])

    # the distributed files view must materialize the same entry set the
    # metadata layer resolves
    got = {
        (r.path, r.bucket, r.rows, r.kind)
        for r in table.inspect(spark, "files").collect()
    }
    want = {
        (e["path"], e["bucket"], e["rows"], e.get("kind", "base"))
        for e in table._manifest_files(snap)
    }
    assert got == want and got

    # every listed file exists and the per-entry row counts are real
    for r in table.inspect(spark, "files").collect():
        assert fs.exists(os.path.join(table.root, r.path)), r.path
        assert r.rows > 0


def test_files_view_time_travel_by_ref(spark, tmp_path):
    table, segs = _replayed(spark, tmp_path)
    apply_batch(spark, table, spark.read.parquet(segs[0]), batch_id=0)
    table.tag("t0")
    old = {r.path for r in table.inspect(spark, "files", at="t0").collect()}
    for i, s in enumerate(segs[1:], start=1):
        apply_batch(spark, table, spark.read.parquet(s), batch_id=i)
    # the pinned view is stable while the live view grew past it
    assert {r.path for r in table.inspect(spark, "files", at="t0").collect()} == old
    assert len({r.path for r in table.inspect(spark, "files").collect()}) > len(old)


def test_lineage_and_metrics_views(spark, tmp_path):
    """The operational trails as metadata tables: lineage rows appear per
    applied batch × source partition with the trail's typed schema; a
    table that never streamed yields a typed EMPTY frame for both views
    (no existence special-case for dashboards)."""
    from cfe_39_spark.streaming.lineage import write_lineage

    table, segs = _replayed(spark, tmp_path, seed=137)
    fresh = SequenceTable.create(spark, str(tmp_path / "fresh"), None,
                                 n_buckets=2)
    # empty-trail shape before any streaming
    for view in ("lineage", "metrics"):
        df = fresh.inspect(spark, view)
        assert df.count() == 0 and len(df.schema.fields) > 0

    for i, s in enumerate(segs):
        res = apply_batch(spark, table, spark.read.parquet(s), batch_id=i)
        write_lineage(table.root, res)
    lin = table.inspect(spark, "lineage")
    rows = lin.collect()
    assert {r.batch_id for r in rows} == {str(i) for i in range(len(segs))}
    assert all(r.rows_applied >= 0 and r.max_offset >= r.min_offset
               for r in rows)
    # per-batch totals agree with the committed lineage footers
    got = {r["batch_id"]: r["events"] for r in (
        lin.groupBy("batch_id")
        .agg({"events_in": "sum"})
        .withColumnRenamed("sum(events_in)", "events").collect())}
    for i in range(len(segs)):
        snap = table.snapshot(table.find_batch(str(i)))
        assert got[str(i)] == snap["lineage"]["events_in"]


def test_inspect_unknown_view_raises(spark, tmp_path):
    table, _ = _replayed(spark, tmp_path)
    import pytest

    with pytest.raises(ValueError, match="unknown metadata view"):
        table.inspect(spark, "nope")


def test_cli_inspect(spark, tmp_path):
    table, segs = _replayed(spark, tmp_path)
    apply_batch(spark, table, spark.read.parquet(segs[0]), batch_id=0)
    table.tag("v1")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "submit_ingest.py"),
         "--local", "2", "inspect", "--table", table.root,
         "--view", "refs"],
        capture_output=True, text=True, timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    doc = json.loads(out.stdout.strip().splitlines()[-1])
    assert doc["view"] == "refs" and not doc["truncated"]
    assert [r["name"] for r in doc["rows"]] == ["v1"]


def test_schemas_view_tracks_field_ids_across_ddl(spark, tmp_path):
    from pyspark.sql import types as T

    table, segs = _replayed(spark, tmp_path)
    apply_batch(spark, table, spark.read.parquet(segs[0]), batch_id=0)
    table.rename_column("source", "origin")
    table.drop_column("origin")
    table.add_column("origin", T.StringType())
    df = table.inspect(spark, "schemas")
    rows = [r.asDict() for r in df.collect()]
    # rename preserved the id; drop+re-add minted a fresh one
    by_ver = {}
    for r in rows:
        by_ver.setdefault(r["schema_version"], {})[r["column"]] = r["field_id"]
    first = min(by_ver)
    renamed_ver = next(
        v for v in sorted(by_ver) if "origin" in by_ver[v] and "source" not in by_ver[v]
    )
    assert by_ver[renamed_ver]["origin"] == by_ver[first]["source"]
    last = max(by_ver)
    assert by_ver[last]["origin"] != by_ver[first]["source"]
    # exactly one current version, matching the snapshot pointer
    cur = {r["schema_version"] for r in rows if r["is_current"]}
    assert cur == {table.snapshot()["schema_version"]}
    # doc_id identity is stable across every version
    assert len({m["doc_id"] for m in by_ver.values()}) == 1


def test_changelog_span_across_rename_emits_target_names(spark, tmp_path):
    table, segs = _replayed(spark, tmp_path)
    start = table.latest_snapshot_id()
    apply_batch(spark, table, spark.read.parquet(segs[0]), batch_id=0)
    table.rename_column("source", "origin")
    seg1 = spark.read.parquet(segs[1]).withColumnRenamed("source", "origin")
    apply_batch(spark, table, seg1, batch_id=1)
    feed = table.read_changes(spark, from_snapshot_id=start)
    assert "origin" in feed.columns and "source" not in feed.columns
    # pre-rename change rows reconcile by field id: their values survive
    # (delete tombstones carry null payload by design — exclude them)
    pre = feed.filter(
        (feed._commit_batch_id == "0") & (feed._change_type == "upsert")
    )
    assert pre.count() > 0
    assert pre.filter(pre.origin.isNull()).count() == 0
