"""End-to-end test of the spark-submit entry point (tools/submit_ingest.py)
and the --py-files packaging tool: the north rule's deployment surface.

Runs the CLI's main() in-process (getOrCreate reuses the test session, the
same way a spark-submit-provided session would be picked up on a cluster)
through the full operational cycle: bootstrap -> replay -> show -> changes
-> compact -> expire, asserting the final table state matches the pandas
oracle bit-for-bit."""

import json
import os
import sys
import zipfile

import pandas as pd
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

import make_pyfiles  # noqa: E402
import submit_ingest  # noqa: E402

from cfe_39_spark.fixtures import GenConfig, write_fixture  # noqa: E402
from cfe_39_spark.sources.table import SequenceTable  # noqa: E402

from .util import assert_state_equal  # noqa: E402


def run_cli(capsys, *argv):
    rc = submit_ingest.main(list(argv))
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    return json.loads(out)


def test_submit_cli_full_cycle(spark, tmp_path, capsys):
    fx = write_fixture(
        str(tmp_path / "fx"),
        GenConfig(n_docs_initial=20, n_events=100, n_segments=4, seed=97),
    )
    table = str(tmp_path / "t")
    log = str(tmp_path / "fx" / "segments")

    r = run_cli(capsys, "bootstrap", "--table", table,
                "--initial", str(tmp_path / "fx" / "initial.parquet"),
                "--buckets", "4")
    assert r == {"table": table, "snapshot_id": 1, "n_buckets": 4,
                 "sort_order": None, "bloom_filter": None, "zorder": None}

    r = run_cli(capsys, "replay", "--log", log, "--table", table)
    assert r["batches"] == 4
    assert r["snapshot_id"] == 5  # create + one commit per segment

    r = run_cli(capsys, "show", "--table", table)
    assert r["snapshot_id"] == 5
    assert_state_equal(SequenceTable(table).read(spark), fx["expected"])

    # TIMESTAMP AS OF on the operational surface: "now" resolves to the
    # latest snapshot; a pre-history instant is the re-bootstrap error
    import time as _time

    r = run_cli(capsys, "show", "--table", table,
                "--as-of-ts", str(_time.time()))
    assert r["snapshot_id"] == 5
    with pytest.raises(KeyError, match="re-bootstrap"):
        submit_ingest.main(["show", "--table", table, "--as-of-ts", "1.0"])

    # time-skipping recent-state surface: a bound below all events keeps
    # everything; one above them plans ZERO files and reports zero rows
    r = run_cli(capsys, "show", "--table", table, "--min-event-time", "0.0")
    assert r["recent_rows"] == r["rows"]
    assert r["recent_files_planned"] == r["n_files"]
    far = str(_time.time() + 10 * 365 * 86400)
    r = run_cli(capsys, "show", "--table", table, "--min-event-time", far)
    assert r["recent_rows"] == 0 and r["recent_files_planned"] == 0

    out = str(tmp_path / "changes")
    r = run_cli(capsys, "changes", "--table", table, "--from-snapshot", "1",
                "--net", "--out", out)
    assert r["rows"] > 0

    out_diff = str(tmp_path / "changes-diff")
    r = run_cli(capsys, "changes", "--table", table, "--from-snapshot", "1",
                "--diff", "--out", out_diff)
    assert r["rows"] > 0
    kinds = {row["_change_type"]
             for row in spark.read.parquet(out_diff).collect()}
    assert kinds <= {"insert", "update_before", "update_after", "delete"}
    assert "insert" in kinds or "update_after" in kinds

    r = run_cli(capsys, "compact", "--table", table)
    assert r["compacted"] in (True, False)

    r = run_cli(capsys, "expire", "--table", table, "--keep-last", "2")
    assert isinstance(r, dict)
    # table still reads correctly after maintenance
    assert_state_equal(SequenceTable(table).read(spark), fx["expected"])

    # column DDL surface: rename keeps old files' values (field-id
    # identity), add reads null, drop disappears — then rename back so the
    # oracle comparison stays shape-exact
    r = run_cli(capsys, "ddl", "--table", table, "--rename", "source", "origin")
    assert r["ddl"] == {"op": "rename", "from": "source", "to": "origin"}
    assert "origin" in r["schema"] and "source" not in r["schema"]
    r = run_cli(capsys, "ddl", "--table", table, "--add", "quality", "double")
    assert "quality" in r["schema"]
    r = run_cli(capsys, "ddl", "--table", table, "--drop", "quality")
    assert "quality" not in r["schema"]
    run_cli(capsys, "ddl", "--table", table, "--rename", "origin", "source")
    assert_state_equal(SequenceTable(table).read(spark), fx["expected"])


def test_submit_dml_cmds(spark, tmp_path, capsys):
    """delete-where / update-where on the operational surface: rows go,
    values change (n_tok recomputed), no-match commits nothing."""
    fx = write_fixture(
        str(tmp_path / "fx"),
        GenConfig(n_docs_initial=20, n_events=80, n_segments=2, seed=131),
    )
    table = str(tmp_path / "t")
    run_cli(capsys, "bootstrap", "--table", table,
            "--initial", str(tmp_path / "fx" / "initial.parquet"),
            "--buckets", "4")
    run_cli(capsys, "replay", "--log", str(tmp_path / "fx" / "segments"),
            "--table", table)
    exp = fx["expected"].copy()
    victim = sorted(exp["doc_id"])[0]

    r = run_cli(capsys, "delete-where", "--table", table,
                "--predicate", f"doc_id = '{victim}'")
    assert r["deleted"] and r["rows_affected"] == 1
    exp = exp[exp["doc_id"] != victim].reset_index(drop=True)

    r = run_cli(capsys, "update-where", "--table", table,
                "--predicate", "n_tok >= 1",
                "--set", "source='cli-fixed'",
                "--set", "tokens=slice(tokens, 1, 1)")
    assert r["updated"] and r["rows_affected"] == int((exp["n_tok"] >= 1).sum())
    m = exp["n_tok"] >= 1
    exp.loc[m, "source"] = "cli-fixed"
    exp.loc[m, "tokens"] = exp.loc[m, "tokens"].map(lambda a: a[:1])
    exp.loc[m, "n_tok"] = 1
    assert_state_equal(SequenceTable(table).read(spark), exp)

    r = run_cli(capsys, "delete-where", "--table", table,
                "--predicate", "doc_id = 'no-such'")
    assert r == {"deleted": False, "rows_affected": 0,
                 "snapshot_id": SequenceTable(table).latest_snapshot_id()}

    # MERGE INTO from a parquet source: one matched upsert + one insert
    hit = sorted(exp["doc_id"])[0]
    src = str(tmp_path / "merge-src.parquet")
    spark.createDataFrame(
        [(hit, [6, 6], 2, "cli-merged"), ("cli-new", [1], 1, "cli-merged")],
        "doc_id string, tokens array<int>, n_tok int, source string",
    ).write.parquet(src)
    r = run_cli(capsys, "merge", "--table", table, "--source", src)
    assert r["merged"] and (r["rows_updated"], r["rows_inserted"]) == (1, 1)
    m = exp["doc_id"] == hit
    exp.loc[m, "tokens"] = exp.loc[m, "tokens"].map(lambda _: [6, 6])
    exp.loc[m, "n_tok"] = 2
    exp.loc[m, "source"] = "cli-merged"
    exp = pd.concat([exp, pd.DataFrame([{
        "doc_id": "cli-new", "tokens": [1], "n_tok": 1,
        "source": "cli-merged"}])], ignore_index=True)
    assert_state_equal(SequenceTable(table).read(spark), exp)


def test_submit_stream_cmd(spark, tmp_path, capsys):
    fx = write_fixture(
        str(tmp_path / "fx"),
        GenConfig(n_docs_initial=15, n_events=60, n_segments=3, seed=101),
    )
    table = str(tmp_path / "t")
    run_cli(capsys, "bootstrap", "--table", table,
            "--initial", str(tmp_path / "fx" / "initial.parquet"),
            "--buckets", "4")
    r = run_cli(capsys, "stream", "--log", str(tmp_path / "fx" / "segments"),
                "--table", table, "--checkpoint", str(tmp_path / "chk"),
                "--max-files-per-trigger", "1", "--known-partitions", "8")
    assert r["batches"] == 3
    assert_state_equal(SequenceTable(table).read(spark), fx["expected"])


def test_submit_route_cmd(spark, tmp_path, capsys):
    """One multiplexed log fanned out to two tables by SQL predicate;
    CLI reports per-route snapshots and a zero unrouted count when the
    routes partition the feed."""
    fx = write_fixture(
        str(tmp_path / "fx"),
        GenConfig(n_docs_initial=15, n_events=60, n_segments=2, seed=103),
    )
    ta, tb = str(tmp_path / "ta"), str(tmp_path / "tb")
    even = "cast(substring(doc_id, -1, 1) as int) % 2 = 0"
    odd = "cast(substring(doc_id, -1, 1) as int) % 2 = 1"
    for t in (ta, tb):
        run_cli(capsys, "bootstrap", "--table", t, "--buckets", "4")
    r = run_cli(capsys, "route",
                "--log", str(tmp_path / "fx" / "segments"),
                "--checkpoint", str(tmp_path / "chk"),
                "--route", f"even={ta}={even}",
                "--route", f"odd={tb}={odd}")
    assert r["events_unrouted"] == 0 and r["events_in"] > 0
    assert set(r["snapshots"]) == {"even", "odd"}
    got = SequenceTable(ta).read(spark).toPandas()
    assert len(got) > 0
    assert all(int(d[-1]) % 2 == 0 for d in got["doc_id"])


def test_submit_view_refresh_cmd(spark, tmp_path, capsys):
    fx = write_fixture(
        str(tmp_path / "fx"),
        GenConfig(n_docs_initial=15, n_events=60, n_segments=2, seed=109),
    )
    table = str(tmp_path / "t")
    run_cli(capsys, "bootstrap", "--table", table,
            "--initial", str(tmp_path / "fx" / "initial.parquet"),
            "--buckets", "4")
    run_cli(capsys, "replay", "--log", str(tmp_path / "fx" / "segments"),
            "--table", table)
    r = run_cli(capsys, "view-refresh", "--table", table,
                "--view-dir", str(tmp_path / "view"),
                "--group", "source", "--agg", "total_tok=n_tok")
    assert r["refreshed"] and r["groups"] > 0
    exp = len(fx["expected"].groupby("source"))
    assert r["groups"] == exp
    r2 = run_cli(capsys, "view-refresh", "--table", table,
                 "--view-dir", str(tmp_path / "view"),
                 "--group", "source", "--agg", "total_tok=n_tok")
    assert not r2["refreshed"] and r2["cursor"] == r["cursor"]


def test_submit_mirror_cmd(spark, tmp_path, capsys):
    fx = write_fixture(
        str(tmp_path / "fx"),
        GenConfig(n_docs_initial=15, n_events=60, n_segments=2, seed=107),
    )
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    for t in (src, dst):
        run_cli(capsys, "bootstrap", "--table", t,
                "--initial", str(tmp_path / "fx" / "initial.parquet"),
                "--buckets", "4")
    run_cli(capsys, "replay", "--log", str(tmp_path / "fx" / "segments"),
            "--table", src)
    r = run_cli(capsys, "mirror", "--src", src, "--dst", dst,
                "--checkpoint", str(tmp_path / "chk"))
    assert r["triggers"] == 1 and r["rows"] > 0
    assert_state_equal(SequenceTable(dst).read(spark), fx["expected"])


def test_pyfiles_zip_importable(tmp_path):
    """The --py-files archive must contain the whole package and be
    importable from the zip alone (what executors do)."""
    out = str(tmp_path / "cfe39_spark.zip")
    names = make_pyfiles.build(out)
    assert "cfe_39_spark/__init__.py" in names
    assert "cfe_39_spark/operators/cdc.py" in names
    with zipfile.ZipFile(out) as z:
        assert sorted(z.namelist()) == sorted(names)
    import subprocess

    code = (
        "import sys; sys.path.insert(0, sys.argv[1]); "
        "import cfe_39_spark.operators.cdc as m; "
        "import cfe_39_spark.sources.table as t; "
        "print('ok')"
    )
    res = subprocess.run([sys.executable, "-c", code, out],
                         capture_output=True, text=True, timeout=60)
    assert res.returncode == 0 and res.stdout.strip() == "ok", res.stderr


def test_pyfiles_zip_deterministic(tmp_path):
    a, b = str(tmp_path / "a.zip"), str(tmp_path / "b.zip")
    make_pyfiles.build(a)
    make_pyfiles.build(b)
    with open(a, "rb") as fa, open(b, "rb") as fb:
        assert fa.read() == fb.read()


def test_submit_wap_cycle(spark, tmp_path, capsys):
    """The operational WAP cycle end-to-end through the CLI: bootstrap ->
    branch --create -> replay --branch -> branch --publish -> show."""
    fx = write_fixture(
        str(tmp_path / "fx"),
        GenConfig(n_docs_initial=20, n_events=100, n_segments=3, seed=107),
    )
    table = str(tmp_path / "t")
    log = str(tmp_path / "fx" / "segments")

    run_cli(capsys, "bootstrap", "--table", table,
            "--initial", str(tmp_path / "fx" / "initial.parquet"),
            "--buckets", "4")
    r = run_cli(capsys, "branch", "--table", table, "--create", "audit")
    assert r == {"branch": "audit", "snapshot_id": 1}

    r = run_cli(capsys, "replay", "--log", log, "--table", table,
                "--branch", "audit")
    assert r["batches"] == 3
    # main untouched; the branch holds the staged state
    assert SequenceTable(table).latest_snapshot_id() == 1
    r = run_cli(capsys, "branch", "--table", table, "--list")
    head = r["branches"]["audit"]
    assert head > 1

    r = run_cli(capsys, "branch", "--table", table, "--publish", "audit")
    assert r == {"published": "audit", "snapshot_id": head}
    assert_state_equal(SequenceTable(table).read(spark), fx["expected"])
    r = run_cli(capsys, "show", "--table", table)
    assert r["branches"] == {"audit": head}

    # the CLI rejects ambiguous branch invocations outright
    with pytest.raises(SystemExit):
        submit_ingest.parse_args(
            ["branch", "--table", table, "--drop", "audit", "--publish", "audit"]
        )


def test_submit_cherry_pick_and_txn_recover(spark, tmp_path, capsys):
    """The refs escape hatch + txn recovery on the spark-submit surface."""
    from pyspark.sql import functions as F

    from cfe_39_spark.operators.cdc import apply_batch
    from cfe_39_spark.operators.txn import MultiTableTransaction

    fx = write_fixture(
        str(tmp_path / "fx"),
        GenConfig(n_docs_initial=10, n_events=30, n_segments=1, seed=73),
    )
    table = str(tmp_path / "t")
    run_cli(capsys, "bootstrap", "--table", table,
            "--initial", str(tmp_path / "fx" / "initial.parquet"),
            "--buckets", "2")
    t = SequenceTable(table)
    doc = sorted(fx["expected"]["doc_id"])[0]

    def ev(toks, src):
        return spark.createDataFrame(
            [(doc, "U", 10 ** 7, 1, toks, len(toks), src, 1)],
            "doc_id string, op string, offset long, epoch long, "
            "tokens array<int>, n_tok int, source string, schema_version int",
        ).select(
            "doc_id", "op", "offset",
            F.current_timestamp().alias("event_time"), "epoch",
            F.lit(0).alias("src_partition"), "schema_version",
            "tokens", "n_tok", "source",
        )

    fork = t.latest_snapshot_id()
    t.create_branch("fix")
    apply_batch(spark, t.branch("fix"), ev([7], "branch"), batch_id="s1",
                compact_threshold=None)
    other = sorted(fx["expected"]["doc_id"])[1]
    apply_batch(spark, t, ev([1], "main").withColumn("doc_id", F.lit(other)),
                batch_id="m1", compact_threshold=None)

    head = t.branches()["fix"]
    r = run_cli(capsys, "cherry-pick", "--table", table,
                "--snapshot", str(head), "--from-snapshot", str(fork))
    assert not r["noop"] and r["rows_applied"] == 1
    got = t.read(spark).toPandas().set_index("doc_id")
    assert list(got.loc[doc, "tokens"]) == [7]

    # txn-recover: a decision record with the work already landed (the
    # degenerate-but-real recovery case) clears cleanly via the CLI
    txn = MultiTableTransaction([t], txn_id="clirec")
    txn.begin()
    apply_batch(spark, txn.handle(t), ev([8, 8], "txn"), batch_id="tx1",
                compact_threshold=None)
    real = MultiTableTransaction._roll_forward
    MultiTableTransaction._roll_forward = staticmethod(
        lambda *_: (_ for _ in ()).throw(RuntimeError("crash")))
    try:
        with pytest.raises(RuntimeError):
            txn.commit(spark)
    finally:
        MultiTableTransaction._roll_forward = staticmethod(real)
    r = run_cli(capsys, "txn-recover", "--coordinator", txn.coordinator_dir)
    assert r == {"recovered": ["clirec"]}
    got = t.read(spark).toPandas().set_index("doc_id")
    assert list(got.loc[doc, "tokens"]) == [8, 8]
