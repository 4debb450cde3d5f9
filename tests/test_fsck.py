"""Table integrity checker (sources/fsck.py): a healthy table is clean;
each seeded corruption class is detected as the right typed finding; the
checker reports instead of raising."""

import json
import os

from pyspark.sql import functions as F

from cfe_39_spark.sources.fsck import check_table
from cfe_39_spark.sources.table import SequenceTable


def _tiny(spark, n=50):
    return (
        spark.range(n)
        .withColumn("doc_id", F.format_string("d%03d", F.col("id")))
        .withColumn("tokens", F.array(F.col("id").cast("int")))
        .withColumn("n_tok", F.lit(1).cast("int"))
        .withColumn("source", F.lit("s"))
        .drop("id")
    )


def _mk(spark, tmp_path, **kw):
    return SequenceTable.create(spark, str(tmp_path / "t"), _tiny(spark),
                                n_buckets=4, **kw)


def _codes(rep):
    return sorted({f.code for f in rep.findings if f.level == "error"})


def test_healthy_table_clean_shallow_and_deep(spark, tmp_path):
    t = _mk(spark, tmp_path, sort_order=["doc_id"])
    t.tag("v1")
    rep = check_table(t, deep=True)
    assert rep.ok, [vars(f) for f in rep.findings]
    assert rep.files_checked > 0
    assert rep.snapshot_id == t.latest_snapshot_id()


def test_missing_data_file_detected(spark, tmp_path):
    t = _mk(spark, tmp_path)
    victim = t.snapshot()["files"][0]["path"]
    os.unlink(os.path.join(t.root, victim))
    rep = check_table(t)
    assert not rep.ok
    assert "file_missing" in _codes(rep)


def test_dangling_ref_detected(spark, tmp_path):
    t = _mk(spark, tmp_path)
    refs = t._read_refs()
    refs.setdefault("tags", {})["ghost"] = 999
    t._write_refs(refs)
    rep = check_table(t)
    assert "ref_dangling" in _codes(rep)


def test_dangling_layout_property_detected(spark, tmp_path):
    """The pre-round-4 bug class: a layout property naming a column the
    schema no longer has.  Seeded by editing the descriptor directly
    (today's DDL keeps them in sync, so only legacy tables carry this)."""
    t = _mk(spark, tmp_path, sort_order=["n_tok"])
    sid = t.latest_snapshot_id()
    p = os.path.join(t.meta_dir, f"snap-{sid:012d}.json")
    d = json.load(open(p))
    d["sort_order"] = ["gone_column"]
    json.dump(d, open(p, "w"))
    rep = check_table(t)
    assert "layout_dangling" in _codes(rep)


def test_deep_rows_mismatch_detected(spark, tmp_path):
    t = _mk(spark, tmp_path)
    sid = t.latest_snapshot_id()
    snap = t.snapshot()
    # doctor the manifest's rows stamp for one file (out-of-band
    # corruption, so also drop the in-process manifest cache)
    from cfe_39_spark.sources.table import _MANIFEST_CACHE

    mpath = os.path.join(t.meta_dir, snap["manifests"][0]["path"])
    m = json.load(open(mpath))
    m["entries"][0]["rows"] += 7
    json.dump(m, open(mpath, "w"))
    _MANIFEST_CACHE.clear()
    assert check_table(t, deep=False).ok  # shallow cannot see it
    rep = check_table(t, deep=True)
    assert "rows_mismatch" in _codes(rep)


def test_chain_break_reported_not_raised(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.rebucket(spark, 8)
    parent = t.snapshot()["parent_id"]
    os.unlink(os.path.join(t.meta_dir, f"snap-{parent:012d}.json"))
    rep = check_table(t)
    assert "chain_break" in _codes(rep)


def test_orphan_data_dir_reported_info_only(spark, tmp_path):
    """An unreferenced commit dir is an INFO finding (the expiry GC owns
    deletion) and does not fail the check."""
    t = _mk(spark, tmp_path)
    orphan = os.path.join(t.data_dir, "commit-crashed-deadbeef")
    os.makedirs(os.path.join(orphan, "_bucket=0"))
    with open(os.path.join(orphan, "_bucket=0", "x.parquet"), "wb") as f:
        f.write(b"junk")
    rep = check_table(t)
    assert rep.ok  # info never fails the check
    infos = [f for f in rep.findings if f.code == "orphan_data_dirs"]
    assert infos and "1 commit dir" in infos[0].message


# -- pure property test: DDL layout sync invariant (no Spark needed) ---- #
from hypothesis import given, settings, strategies as st  # noqa: E402

_COLS = ["a", "b", "c", "d", "e"]


@st.composite
def _layout_snaps(draw):
    cols = draw(st.lists(st.sampled_from(_COLS), min_size=0, max_size=4,
                         unique=True))
    snap = {}
    if cols:
        snap["sort_order"] = cols
    bcols = draw(st.lists(st.sampled_from(_COLS), min_size=0, max_size=3,
                          unique=True))
    if bcols:
        snap["bloom_filter"] = {"cols": bcols, "ndv": 100}
    zcols = draw(st.lists(st.sampled_from(_COLS), min_size=2, max_size=3,
                          unique=True)) if draw(st.booleans()) else []
    if zcols:
        snap["zorder"] = {"cols": zcols, "bits": 8,
                          "domains": {c: [0.0, 1.0] for c in zcols}}
    return snap


@settings(max_examples=200, deadline=None)
@given(
    snap=_layout_snaps(),
    ops=st.lists(
        st.tuples(st.sampled_from(["rename", "drop"]),
                  st.sampled_from(_COLS), st.sampled_from(["x", "y", "z"])),
        min_size=1, max_size=5,
    ),
)
def test_layout_after_ddl_invariants(snap, ops):
    """After ANY sequence of renames/drops: every column a layout
    property names is a column the schema still has; zorder keeps its
    cols/domains keys aligned and >=2 columns or disappears; properties
    never resurrect columns."""
    schema = set(_COLS)
    cur = dict(snap)
    for op, col, new in ops:
        if op == "rename":
            if col not in schema or new in schema:
                continue
            cur = SequenceTable._layout_after_ddl(cur, {col: new}, None)
            schema = (schema - {col}) | {new}
        else:
            if col not in schema:
                continue
            cur = SequenceTable._layout_after_ddl(cur, {}, col)
            schema = schema - {col}
        for c in cur.get("sort_order", []):
            assert c in schema
        for c in cur.get("bloom_filter", {}).get("cols", ["_ok"]) or []:
            assert c == "_ok" or c in schema
        z = cur.get("zorder")
        if z:
            assert len(z["cols"]) >= 2
            assert set(z["cols"]) == set(z["domains"])
            assert all(c in schema for c in z["cols"])
        assert "sort_order" not in cur or cur["sort_order"]
        assert "bloom_filter" not in cur or cur["bloom_filter"]["cols"]
