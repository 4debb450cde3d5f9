"""Routed multi-table ingest (streaming/routing.py): one multiplexed
change stream fans out to N tables inside one foreachBatch — per-route
final state must equal the pandas oracle folded over that route's slice,
replays must no-op per table (roll-forward exactly-once without a
coordinator), and unrouted events must be counted + quarantined, never
silently dropped."""

import glob

import pyarrow as pa
import pytest
from pyspark.sql import functions as F

from cfe_39_spark.fixtures import GenConfig, expected_state, write_fixture
from cfe_39_spark.sources.table import SequenceTable
from cfe_39_spark.streaming.routing import Route, route_batch, run_routed_stream

# both engines evaluate this identically: parity of doc_id's last digit
EVEN_SQL = "cast(substring(doc_id, -1, 1) as int) % 2 = 0"
ODD_SQL = "cast(substring(doc_id, -1, 1) as int) % 2 = 1"


def _even(doc_id: str) -> bool:
    return int(doc_id[-1]) % 2 == 0


def _fixture(tmp_path, seed=71, n_events=600):
    return write_fixture(
        str(tmp_path / "fx"),
        GenConfig(n_docs_initial=100, n_events=n_events, n_segments=3,
                  dup_rate=0.1, shuffle_within_segments=True, seed=seed),
    )


def _route_tables(spark, tmp_path, fx):
    """Two tables, each bootstrapped from its slice of the initial load."""
    init = spark.read.parquet(str(tmp_path / "fx" / "initial.parquet"))
    ta = SequenceTable.create(
        spark, str(tmp_path / "ta"), init.filter(F.expr(EVEN_SQL)), n_buckets=4)
    tb = SequenceTable.create(
        spark, str(tmp_path / "tb"), init.filter(F.expr(ODD_SQL)), n_buckets=4)
    return ta, tb


def _oracle(fx, keep) -> "pd.DataFrame":  # noqa: F821
    init = pa.Table.from_pylist(
        [r for r in fx["initial"].to_pylist() if keep(r["doc_id"])],
        schema=fx["initial"].schema,
    )
    return expected_state(init, [e for e in fx["events"] if keep(e["doc_id"])])


def _assert_state(spark, table, exp):
    got = table.read(spark).orderBy("doc_id").toPandas()
    got = got[list(exp.columns)].reset_index(drop=True)
    assert got["doc_id"].tolist() == exp["doc_id"].tolist()
    for a, b in zip(got["tokens"], exp["tokens"]):
        assert list(a) == list(b)
    assert got["source"].tolist() == exp["source"].tolist()


def test_routed_stream_fanout_matches_per_route_oracles(spark, tmp_path):
    fx = _fixture(tmp_path)
    ta, tb = _route_tables(spark, tmp_path, fx)
    routes = [Route("even", ta, EVEN_SQL), Route("odd", tb, ODD_SQL)]
    out = run_routed_stream(
        spark, str(tmp_path / "fx" / "segments"), routes,
        str(tmp_path / "cp"), max_files_per_trigger=2,
        compact_threshold=None,
    )
    for r in out:  # the two routes partition each batch exactly
        assert r.events_in == (r.results["even"].events_in
                               + r.results["odd"].events_in)
    assert all(r.events_unrouted == 0 for r in out)
    _assert_state(spark, ta, _oracle(fx, _even))
    _assert_state(spark, tb, _oracle(fx, lambda d: not _even(d)))
    # per-table lineage trail exists for both routes
    assert ta.snapshot()["lineage"]["rows_applied"] >= 0
    assert tb.snapshot()["lineage"]["rows_applied"] >= 0


def test_route_batch_replay_noops_per_table(spark, tmp_path):
    """Roll-forward exactly-once: re-running the same micro-batch id
    no-ops at every route's commit log — the property that makes a crash
    mid-fan-out safe (already-landed tables skip, the rest land)."""
    fx = _fixture(tmp_path, seed=72, n_events=300)
    ta, tb = _route_tables(spark, tmp_path, fx)
    seg = sorted(glob.glob(str(tmp_path / "fx" / "segments" / "*.parquet")))[0]
    df = spark.read.parquet(seg)
    routes = [Route("even", ta, EVEN_SQL), Route("odd", tb, ODD_SQL)]

    r1 = route_batch(spark, routes, df, 0, compact_threshold=None)
    assert not r1.results["even"].noop and not r1.results["odd"].noop
    heads = (ta.latest_snapshot_id(), tb.latest_snapshot_id())

    # crash-window replay: route "even" already landed batch 0; the rerun
    # must no-op there and leave states byte-identical
    r2 = route_batch(spark, routes, df, 0, compact_threshold=None)
    assert r2.results["even"].noop and r2.results["odd"].noop
    assert (ta.latest_snapshot_id(), tb.latest_snapshot_id()) == heads


def test_route_batch_unrouted_quarantined_not_dropped(spark, tmp_path):
    fx = _fixture(tmp_path, seed=73, n_events=300)
    ta, _ = _route_tables(spark, tmp_path, fx)
    seg = sorted(glob.glob(str(tmp_path / "fx" / "segments" / "*.parquet")))[0]
    df = spark.read.parquet(seg)
    qdir = str(tmp_path / "unrouted")
    res = route_batch(
        spark, [Route("even", ta, EVEN_SQL)], df, 7,
        unrouted_dir=qdir, compact_threshold=None,
    )
    n_odd = df.filter(F.expr(ODD_SQL)).count()
    assert res.events_unrouted == n_odd > 0
    q = spark.read.parquet(f"{qdir}/batch=7")
    assert q.count() == n_odd
    assert q.filter(F.expr(EVEN_SQL)).count() == 0
    # replayable: the quarantined rows carry the full event schema
    assert set(df.columns) == set(q.columns)


def test_route_batch_concurrent_equals_sequential(spark, tmp_path):
    """max_concurrency > 1 fans the per-route applies onto a thread pool
    (distinct tables, disjoint commit locks); final states must be
    byte-identical to the sequential path — same derived batch ids, same
    LWW outcome."""
    fx = _fixture(tmp_path, seed=75, n_events=400)
    segs = sorted(glob.glob(str(tmp_path / "fx" / "segments" / "*.parquet")))

    def build(prefix):
        init = spark.read.parquet(str(tmp_path / "fx" / "initial.parquet"))
        routes = []
        for m in range(4):
            pred = f"cast(substring(doc_id, -1, 1) as int) % 4 = {m}"
            t = SequenceTable.create(
                spark, str(tmp_path / f"{prefix}{m}"),
                init.filter(F.expr(pred)), n_buckets=2)
            routes.append(Route(f"m{m}", t, pred))
        return routes

    seq, par = build("s"), build("p")
    for i, s in enumerate(segs):
        df = spark.read.parquet(s)
        route_batch(spark, seq, df, i, compact_threshold=None)
        route_batch(spark, par, df, i, max_concurrency=4,
                    compact_threshold=None)
    for rs, rp in zip(seq, par):
        a = rs.table.read(spark).orderBy("doc_id").toPandas()
        b = rp.table.read(spark).orderBy("doc_id").toPandas()
        assert a["doc_id"].tolist() == b["doc_id"].tolist()
        for x, y in zip(a["tokens"], b["tokens"]):
            assert list(x) == list(y)


def test_routed_stream_schema_evolution_mid_stream(spark, tmp_path):
    """A schema-version bump inside the multiplexed feed must evolve
    EVERY route's table independently (each apply_batch sees the bump in
    its slice) and still match the per-route oracles, evolved column
    included."""
    fx = write_fixture(
        str(tmp_path / "fx"),
        GenConfig(n_docs_initial=60, n_events=360, n_segments=3, seed=76,
                  evolution=[(1, {"action": "add_column", "name": "quality"})]),
    )
    ta, tb = _route_tables(spark, tmp_path, fx)
    routes = [Route("even", ta, EVEN_SQL), Route("odd", tb, ODD_SQL)]
    run_routed_stream(
        spark, str(tmp_path / "fx" / "segments"), routes,
        str(tmp_path / "cp"), max_files_per_trigger=1,
        compact_threshold=None,
    )
    for t, keep in ((ta, _even), (tb, lambda d: not _even(d))):
        assert t.snapshot()["schema_version"] == 2
        assert "quality" in [f.name for f in t.user_schema().fields]
        exp = _oracle(fx, keep)
        got = (t.read(spark).orderBy("doc_id").toPandas()
               [list(exp.columns)].reset_index(drop=True))
        assert got["doc_id"].tolist() == exp["doc_id"].tolist()
        for a, b in zip(got["quality"], exp["quality"]):
            assert (a is None or a != a) if (b is None or b != b) else a == b


def test_route_transform_reshapes_slice(spark, tmp_path):
    """A per-route transform (the single-message-transform role) reshapes
    that route's slice only: the audit copy retags every event's source,
    the primary route lands untouched events.  Oracle: the same retag
    applied to the oracle's event slice before the pandas fold."""
    fx = _fixture(tmp_path, seed=78, n_events=300)
    ta, tb = _route_tables(spark, tmp_path, fx)

    def retag(df):
        return df.withColumn(
            "source",
            F.when(F.col("source").isNotNull(), F.lit("audited")),
        )

    routes = [Route("even", ta, EVEN_SQL),
              Route("odd", tb, ODD_SQL, transform=retag)]
    segs = sorted(glob.glob(str(tmp_path / "fx" / "segments" / "*.parquet")))
    for i, s in enumerate(segs):
        route_batch(spark, routes, spark.read.parquet(s), i,
                    compact_threshold=None)
    _assert_state(spark, ta, _oracle(fx, _even))  # untouched route

    odd = lambda d: not _even(d)  # noqa: E731
    init = pa.Table.from_pylist(
        [r for r in fx["initial"].to_pylist() if odd(r["doc_id"])],
        schema=fx["initial"].schema,
    )
    evs = [
        dict(e, source="audited") if e["source"] is not None else e
        for e in fx["events"] if odd(e["doc_id"])
    ]
    _assert_state(spark, tb, expected_state(init, evs))


def test_routed_wap_stages_then_publishes(spark, tmp_path):
    """Routing composes with write-audit-publish: routes targeting
    BranchHandles stage the whole multiplexed ingest invisibly; mains
    stay at their bootstrap state until each table fast-forwards, after
    which both match their per-route oracles."""
    fx = _fixture(tmp_path, seed=77, n_events=300)
    ta, tb = _route_tables(spark, tmp_path, fx)
    ta.create_branch("audit")
    tb.create_branch("audit")
    heads = (ta.latest_snapshot_id(), tb.latest_snapshot_id())
    routes = [Route("even", ta.branch("audit"), EVEN_SQL),
              Route("odd", tb.branch("audit"), ODD_SQL)]
    run_routed_stream(
        spark, str(tmp_path / "fx" / "segments"), routes,
        str(tmp_path / "cp"), compact_threshold=None,
    )
    # staged: mains unmoved
    assert (ta.latest_snapshot_id(), tb.latest_snapshot_id()) == heads
    ta.fast_forward("audit")
    tb.fast_forward("audit")
    _assert_state(spark, ta, _oracle(fx, _even))
    _assert_state(spark, tb, _oracle(fx, lambda d: not _even(d)))


def test_route_batch_validations(spark, tmp_path):
    fx = _fixture(tmp_path, seed=74, n_events=100)
    ta, tb = _route_tables(spark, tmp_path, fx)
    seg = sorted(glob.glob(str(tmp_path / "fx" / "segments" / "*.parquet")))[0]
    df = spark.read.parquet(seg)
    with pytest.raises(ValueError, match="no routes"):
        route_batch(spark, [], df, 0)
    with pytest.raises(ValueError, match="duplicate route names"):
        route_batch(
            spark,
            [Route("r", ta, EVEN_SQL), Route("r", tb, ODD_SQL)], df, 0,
        )
