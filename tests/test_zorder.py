"""Z-order clustering (SequenceTable.create(zorder_cols=...)) — the
multi-dimensional layout layer of the skipping stack (functions/zorder.py).

Three claims under test:
1. the JVM expression key equals the pure-Python Morton reference;
2. a z-ordered layout's row groups are tight on EVERY z column (measured
   via parquet footer stats), where a linear sort is tight on its first
   column only — the feature's whole point;
3. logical state is unchanged, the property inherits across commits and
   tracks column DDL (rename follows, drop retires), and writes never
   break on a stale layout property — the dangling-column bug class.
"""

import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cfe_39_spark.functions.zorder import validate_zorder, zorder_key, zorder_key_py
from cfe_39_spark.schema import SEQUENCE_FIELDS_V1
from cfe_39_spark.sources.table import SequenceTable

XY_SCHEMA = T.StructType(
    SEQUENCE_FIELDS_V1
    + [T.StructField("x", T.DoubleType(), True), T.StructField("y", T.DoubleType(), True)]
)

ZSPEC = {"cols": ["x", "y"], "domains": {"x": [0.0, 1.0], "y": [0.0, 1.0]}, "bits": 8}


def _grid_df(spark, n_side=64):
    """Deterministic n_side x n_side unit-square grid, shuffled row order
    (monotone input would make ANY layout look clustered)."""
    return (
        spark.range(n_side * n_side)
        .withColumn("doc_id", F.format_string("d%05d", F.col("id")))
        .withColumn("x", (F.col("id") % n_side) / F.lit(float(n_side)))
        .withColumn("y", F.floor(F.col("id") / n_side) / F.lit(float(n_side)))
        .withColumn("tokens", F.array((F.col("id") % 7).cast("int")))
        .withColumn("n_tok", F.lit(1).cast("int"))
        .withColumn("source", F.lit("grid"))
        .orderBy(F.md5(F.col("doc_id")))  # scatter the insert order
        .select("doc_id", "tokens", "n_tok", "source", "x", "y")
    )


def _rowgroup_coverage(t, col):
    """Mean per-row-group (max-min) stats width of `col` across all data
    files, in domain units ([0,1] here)."""
    snap = t.snapshot()
    widths, groups = [], 0
    for e in snap["files"]:
        f = pq.ParquetFile(os.path.join(t.root, e["path"]))
        idx = f.schema_arrow.get_field_index(col)
        for g in range(f.metadata.num_row_groups):
            st = f.metadata.row_group(g).column(idx).statistics
            widths.append(st.max - st.min)
            groups += 1
    assert groups >= 4, f"need >=4 row groups for a meaningful test, got {groups}"
    return sum(widths) / len(widths)


@pytest.fixture()
def small_rowgroups(spark):
    """Force many small parquet row groups so footer-stat tests see the
    intra-file layout at toy scale."""
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    old = hconf.get("parquet.block.size")
    hconf.set("parquet.block.size", "16384")
    yield
    if old is None:
        hconf.unset("parquet.block.size")
    else:
        hconf.set("parquet.block.size", old)


def test_key_matches_python_reference(spark):
    rows = [
        (0.0, 0.0), (1.0, 1.0), (0.5, 0.25), (0.123, 0.987),
        (None, 0.5), (-3.0, 7.0),  # null and out-of-domain clamp
    ]
    df = spark.createDataFrame(rows, "x double, y double")
    got = [r["k"] for r in df.select(zorder_key(ZSPEC).alias("k")).collect()]
    want = [zorder_key_py([x, y], ZSPEC) for x, y in rows]
    assert got == want


def test_key_orders_like_morton_curve(spark):
    """Sorting the grid by the key must equal sorting by the Python
    Morton reference — i.e. the expression tree implements THE curve,
    not merely some stable order."""
    pdf = _grid_df(spark, 16).select("doc_id", "x", "y").toPandas()
    pdf["k"] = [zorder_key_py([x, y], ZSPEC) for x, y in zip(pdf.x, pdf.y)]
    want = list(pdf.sort_values(["k", "doc_id"]).doc_id)
    df = _grid_df(spark, 16)
    got = [
        r["doc_id"]
        for r in df.withColumn("k", zorder_key(ZSPEC))
        .orderBy("k", "doc_id")
        .select("doc_id")
        .collect()
    ]
    assert got == want


def test_validation():
    with pytest.raises(ValueError, match=">= 2"):
        validate_zorder(["x"], {"x": (0, 1)}, 8)
    with pytest.raises(ValueError, match="domain"):
        validate_zorder(["x", "y"], {"x": (0, 1)}, 8)
    with pytest.raises(ValueError, match="hi > lo"):
        validate_zorder(["x", "y"], {"x": (0, 1), "y": (1, 1)}, 8)
    with pytest.raises(ValueError, match="bits"):
        validate_zorder(["x", "y"], {"x": (0, 1), "y": (0, 1)}, 32)


def test_create_validates(spark, tmp_path):
    with pytest.raises(ValueError, match="mutually exclusive"):
        SequenceTable.create(
            spark, str(tmp_path / "a"), None, user_schema=XY_SCHEMA,
            sort_order=["x"], zorder_cols=["x", "y"],
            zorder_domains={"x": (0, 1), "y": (0, 1)},
        )
    with pytest.raises(ValueError, match="numeric"):
        SequenceTable.create(
            spark, str(tmp_path / "b"), None, user_schema=XY_SCHEMA,
            zorder_cols=["doc_id", "x"],
            zorder_domains={"doc_id": (0, 1), "x": (0, 1)},
        )
    with pytest.raises(ValueError, match="not in schema"):
        SequenceTable.create(
            spark, str(tmp_path / "c"), None, user_schema=XY_SCHEMA,
            zorder_cols=["x", "nope"], zorder_domains={"x": (0, 1), "nope": (0, 1)},
        )


def test_zorder_rowgroups_tight_on_both_columns(spark, tmp_path, small_rowgroups):
    """The measurable claim: z-order bounds row-group stat widths on BOTH
    x and y, while a linear sort on x leaves y row groups spanning the
    whole domain; state is identical either way."""
    grid = _grid_df(spark)
    tz = SequenceTable.create(
        spark, str(tmp_path / "z"), grid, n_buckets=1, user_schema=XY_SCHEMA,
        zorder_cols=["x", "y"], zorder_domains={"x": (0, 1), "y": (0, 1)},
        zorder_bits=8,
    )
    tl = SequenceTable.create(
        spark, str(tmp_path / "lin"), grid, n_buckets=1, user_schema=XY_SCHEMA,
        sort_order=["x"],
    )
    zx, zy = _rowgroup_coverage(tz, "x"), _rowgroup_coverage(tz, "y")
    lx, ly = _rowgroup_coverage(tl, "x"), _rowgroup_coverage(tl, "y")
    assert zx < 0.5 and zy < 0.5, f"z-order not tight on both dims: x={zx:.2f} y={zy:.2f}"
    assert lx < 0.2, f"linear sort should be tight on its own key: {lx:.2f}"
    assert ly > 0.9, f"linear sort should be a full-width slab on y: {ly:.2f}"
    # logical state identical across layouts
    a = tz.read(spark).orderBy("doc_id").toPandas()
    b = tl.read(spark).orderBy("doc_id").toPandas()
    assert a.equals(b) and len(a) == 64 * 64


def test_zorder_inherits_and_box_query_exact(spark, tmp_path):
    """The property rides every later commit (compaction here) and a box
    filter returns exactly the brute-force answer."""
    grid = _grid_df(spark, 32)
    t = SequenceTable.create(
        spark, str(tmp_path / "t"), grid, n_buckets=2, user_schema=XY_SCHEMA,
        zorder_cols=["x", "y"], zorder_domains={"x": (0, 1), "y": (0, 1)},
    )
    t.rebucket(spark, 4)
    snap = t.snapshot()
    assert snap["zorder"]["cols"] == ["x", "y"]
    box = (F.col("x").between(0.25, 0.5)) & (F.col("y").between(0.5, 0.75))
    got = t.read(spark).filter(box).count()
    want = grid.filter(box).count()
    assert got == want > 0


def test_ddl_keeps_layout_props_in_sync(spark, tmp_path):
    """Rename follows the column, drop retires it — and the next write
    SUCCEEDS instead of dying on a dangling sortWithinPartitions column
    (the bug this sync fixes).  Covers sort_order, bloom_filter, zorder."""
    grid = _grid_df(spark, 8)
    t = SequenceTable.create(
        spark, str(tmp_path / "t"), grid, n_buckets=2, user_schema=XY_SCHEMA,
        zorder_cols=["x", "y"], zorder_domains={"x": (0, 1), "y": (0, 1)},
    )
    t.rename_column("x", "lon")
    snap = t.snapshot()
    assert snap["zorder"]["cols"] == ["lon", "y"]
    assert snap["zorder"]["domains"]["lon"] == [0.0, 1.0]
    t.rebucket(spark, 4)  # full rewrite works against the renamed z column
    t.drop_column("lon")
    snap = t.snapshot()
    assert "zorder" not in snap  # <2 z columns left: property retires whole
    t.rebucket(spark, 8)

    t2 = SequenceTable.create(
        spark, str(tmp_path / "t2"),
        _grid_df(spark, 8).drop("x", "y"), n_buckets=2,
        sort_order=["n_tok"], bloom_filter_cols=["source", "n_tok"],
    )
    t2.rename_column("n_tok", "length")
    snap = t2.snapshot()
    assert snap["sort_order"] == ["length"]
    assert snap["bloom_filter"]["cols"] == ["source", "length"]
    t2.rebucket(spark, 4)
    t2.drop_column("length")
    snap = t2.snapshot()
    assert "sort_order" not in snap
    assert snap["bloom_filter"]["cols"] == ["source"]
    t2.rebucket(spark, 8)


def test_box_filter_pushed_to_scan_after_compaction(spark, tmp_path):
    """The read-path half of the story: on a compacted (all-base)
    z-ordered table, a box filter reaches the parquet scan as
    PushedFilters on BOTH z columns — the row-group pruning the tight
    stats exist to serve.  (Dirty MOR groups legitimately filter above
    their LWW resolution; compaction is what restores full pushdown.)"""
    from cfe_39_spark.plans.audit import pushed_filters

    grid = _grid_df(spark, 16)
    t = SequenceTable.create(
        spark, str(tmp_path / "t"), grid, n_buckets=2, user_schema=XY_SCHEMA,
        zorder_cols=["x", "y"], zorder_domains={"x": (0, 1), "y": (0, 1)},
    )
    df = t.read(spark).filter(
        (F.col("x") >= 0.25) & (F.col("x") <= 0.5)
        & (F.col("y") >= 0.5) & (F.col("y") <= 0.75)
    )
    old = spark.conf.get("spark.sql.maxMetadataStringLength")
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    try:
        pf = pushed_filters(df)
    finally:
        spark.conf.set("spark.sql.maxMetadataStringLength", old)
    for frag in ("GreaterThanOrEqual(x", "LessThanOrEqual(x",
                 "GreaterThanOrEqual(y", "LessThanOrEqual(y"):
        assert frag in pf, f"{frag} not pushed: {pf!r}"


def test_date_zorder_column(spark, tmp_path):
    """DATE z columns: Spark 4 rejects cast(date as double), so dates
    bridge through unix_date (day-unit domains).  Covers create-with-data,
    a subsequent write, key parity with the Python reference, and a date
    box filter."""
    import datetime as dt

    schema = T.StructType(
        SEQUENCE_FIELDS_V1
        + [T.StructField("day", T.DateType(), True),
           T.StructField("x", T.DoubleType(), True)]
    )
    base = dt.date(2024, 1, 1)
    epoch_day0 = (base - dt.date(1970, 1, 1)).days
    df = (
        spark.range(256)
        .withColumn("doc_id", F.format_string("d%05d", F.col("id")))
        .withColumn("day", F.date_add(F.lit(base), (F.col("id") % 64).cast("int")))
        .withColumn("x", (F.col("id") % 16) / F.lit(16.0))
        .withColumn("tokens", F.array((F.col("id") % 7).cast("int")))
        .withColumn("n_tok", F.lit(1).cast("int"))
        .withColumn("source", F.lit("g"))
        .orderBy(F.md5(F.col("doc_id")))
        .select("doc_id", "tokens", "n_tok", "source", "day", "x")
    )
    t = SequenceTable.create(
        spark, str(tmp_path / "t"), df, n_buckets=2, user_schema=schema,
        zorder_cols=["day", "x"],
        zorder_domains={"day": (epoch_day0, epoch_day0 + 64), "x": (0, 1)},
        zorder_bits=6,
    )
    snap = t.snapshot()
    assert snap["zorder"]["types"] == {"day": "date", "x": "double"}
    # a later write must also succeed (the bug: create() validated, every
    # write died on the cast)
    t.rebucket(spark, 4)
    # JVM key == Python reference on date inputs
    zspec = t.snapshot()["zorder"]
    got = (
        t.read(spark)
        .select("doc_id", "day", "x", zorder_key(zspec).alias("k"))
        .orderBy("doc_id")
        .collect()
    )
    for r in got[:64]:
        assert r["k"] == zorder_key_py([r["day"], r["x"]], zspec), r
    # box filter on the date dimension stays exact
    lo, hi = base + dt.timedelta(days=10), base + dt.timedelta(days=20)
    want = df.filter(F.col("day").between(F.lit(lo), F.lit(hi))).count()
    assert t.read(spark).filter(F.col("day").between(F.lit(lo), F.lit(hi))).count() == want > 0


def test_date_zorder_rename_keeps_types(spark, tmp_path):
    """Column DDL keeps the per-column types map in sync (a stale key
    would silently fall back to the double cast and break writes)."""
    import datetime as dt

    schema = T.StructType(
        SEQUENCE_FIELDS_V1
        + [T.StructField("day", T.DateType(), True),
           T.StructField("x", T.DoubleType(), True)]
    )
    base = dt.date(2024, 1, 1)
    d0 = (base - dt.date(1970, 1, 1)).days
    df = (
        spark.range(32)
        .withColumn("doc_id", F.format_string("d%05d", F.col("id")))
        .withColumn("day", F.date_add(F.lit(base), (F.col("id") % 8).cast("int")))
        .withColumn("x", (F.col("id") % 4) / F.lit(4.0))
        .withColumn("tokens", F.array((F.col("id") % 7).cast("int")))
        .withColumn("n_tok", F.lit(1).cast("int"))
        .withColumn("source", F.lit("g"))
        .select("doc_id", "tokens", "n_tok", "source", "day", "x")
    )
    t = SequenceTable.create(
        spark, str(tmp_path / "t"), df, n_buckets=2, user_schema=schema,
        zorder_cols=["day", "x"],
        zorder_domains={"day": (d0, d0 + 8), "x": (0, 1)}, zorder_bits=4,
    )
    t.rename_column("day", "event_day")
    z = t.snapshot()["zorder"]
    assert z["cols"] == ["event_day", "x"]
    assert z["types"] == {"event_day": "date", "x": "double"}
    t.rebucket(spark, 4)  # write still succeeds against the renamed date z col
