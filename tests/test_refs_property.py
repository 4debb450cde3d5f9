"""Property test for the metadata/refs layer (Spark-free): random
interleavings of main commits, branch commits, publish, drop, rollback and
expiry run against an independent model of the ref semantics.

The commit API is pure driver metadata (empty file lists, parent carried by
reference), so hundreds of op sequences execute in seconds — hypothesis
shrinks any divergence between SequenceTable and the model to a minimal
counterexample.  Branches are always cut at the current main tip here
(`create_branch(at=staged-sid)` fan-out is exercised by test_branches.py).
"""

import os

import pyspark.sql.types as T
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from cfe_39_spark.sources import fs
from cfe_39_spark.sources.table import PARENT_FILES, SequenceTable

SCHEMA = T.StructType([T.StructField("doc_id", T.StringType())])


def _fresh_table(tmpdir: str) -> SequenceTable:
    # metadata-only create: no SparkSession needed when initial is None
    t = SequenceTable(os.path.join(tmpdir, "t"))
    snap = {
        "snapshot_id": 1,
        "parent_id": None,
        "batch_id": "__create__",
        "committed_at": 0.0,
        "n_buckets": 4,
        "schema_version": 1,
        "schemas": {"1": '{"fields":[],"type":"struct"}'},
        "manifests": [],
    }
    fs.write_json_atomic(t._snap_path(1), snap)
    fs.write_atomic(os.path.join(t.meta_dir, "_LATEST"), "1")
    t._write_marker("__create__", 1)
    return t


# op vocabulary: small id pools force replays, conflicts and re-commits
OPS = st.lists(
    st.one_of(
        st.tuples(st.just("main"), st.integers(0, 5)),
        st.tuples(st.just("bcreate"), st.sampled_from(["a", "b"])),
        st.tuples(st.just("bcommit"), st.sampled_from(["a", "b"]), st.integers(0, 5)),
        st.tuples(st.just("publish"), st.sampled_from(["a", "b"])),
        st.tuples(st.just("drop"), st.sampled_from(["a", "b"])),
        st.tuples(st.just("rollback"), st.integers(0, 3)),
        st.tuples(st.just("expire"), st.booleans()),
        st.tuples(st.just("recover"), st.just(0)),
    ),
    min_size=1,
    max_size=25,
)


@settings(
    max_examples=150,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=OPS)
def test_refs_layer_matches_model(tmp_path_factory, ops):
    tmpdir = str(tmp_path_factory.mktemp("refs_prop"))
    t = _fresh_table(tmpdir)

    # --- the model ---------------------------------------------------- #
    tip = 1
    chain = [("__create__", 1)]          # retained main chain, oldest first
    applied: dict[str, int] = {"__create__": 1}   # find_batch view
    branches: dict[str, dict] = {}       # name -> {fork: sid, staged: [(bid, sid)]}

    def heads():
        return {
            n: (b["staged"][-1][1] if b["staged"] else b["fork"])
            for n, b in branches.items()
        }

    for op in ops:
        kind = op[0]
        if kind == "main":
            bid = f"m{op[1]}"
            sid = t.commit(bid, [], PARENT_FILES)
            if bid in applied:
                assert sid == applied[bid]  # replay no-ops
            else:
                applied[bid] = sid
                chain.append((bid, sid))
                tip = sid
        elif kind == "bcreate":
            name = op[1]
            if name in branches:
                with pytest.raises(ValueError, match="already exists"):
                    t.create_branch(name)
            else:
                assert t.create_branch(name) == tip
                branches[name] = {"fork": tip, "staged": []}
        elif kind == "bcommit":
            name, k = op[1], op[2]
            if name not in branches:
                continue
            bid = f"c{k}"
            sid = t.branch(name).commit(bid, [], PARENT_FILES)
            if bid in applied:
                assert sid == applied[bid]
            else:
                applied[bid] = sid
                branches[name]["staged"].append((bid, sid))
        elif kind == "publish":
            name = op[1]
            if name not in branches:
                with pytest.raises(KeyError):
                    t.fast_forward(name)
                continue
            b = branches[name]
            if b["fork"] == tip:
                new_tip = t.fast_forward(name)
                if b["staged"]:
                    chain.extend(b["staged"])
                    tip = b["staged"][-1][1]
                assert new_tip == tip
                b["fork"], b["staged"] = tip, []
            else:
                # main moved (commit or rollback) since the fork
                with pytest.raises(ValueError, match="fast-forward"):
                    t.fast_forward(name)
        elif kind == "drop":
            name = op[1]
            if name not in branches:
                with pytest.raises(KeyError):
                    t.drop_branch(name)
                continue
            t.drop_branch(name)
            for bid, _ in branches[name]["staged"]:
                applied.pop(bid, None)
            del branches[name]
        elif kind == "rollback":
            idx = min(op[1], len(chain) - 1)
            target_bid, target_sid = chain[idx]
            new_sid = t.rollback(target_sid)
            if target_sid == tip:
                assert new_sid == tip
            else:
                for bid, _ in chain[idx + 1:]:
                    applied.pop(bid, None)
                rb_bid = f"__rollback_to_{target_sid}__"
                applied[rb_bid] = new_sid
                # rollback is APPEND-ONLY: the rolled-back snapshots stay
                # on the parent chain (their batch ids are forgotten), a
                # new snapshot with the target's content goes on top
                chain.append((rb_bid, new_sid))
                tip = new_sid
        elif kind == "expire":
            forget = op[1]
            t.expire_snapshots(keep_last=1, orphan_grace_s=0.0,
                               forget_batches=forget)
            chain = chain[-1:]
            if forget:
                retained = {tip}
                for b in branches.values():
                    retained |= {sid for _, sid in b["staged"]}
                    if not b["staged"]:
                        retained.add(b["fork"])  # pinned on-chain head
                applied = {k: v for k, v in applied.items() if v in retained}
        elif kind == "recover":
            # pointer-loss recovery must land on the model's main tip
            # whenever the log can answer (a crashed publish's journaled
            # span is excluded by the intent marker)
            p = os.path.join(t.meta_dir, "_LATEST")
            saved = fs.read_text(p)
            fs.unlink(p)
            try:
                logged = t._batches_log()
                if any(v == tip for v in logged.values()):
                    assert t.latest_snapshot_id() == tip
            finally:
                fs.write_atomic(p, saved)

        # --- invariants after EVERY op ------------------------------- #
        assert t.latest_snapshot_id() == tip
        assert t.branches() == heads()
        assert [s["batch_id"] for s in t.committed_chain()] == [
            bid for bid, _ in reversed(chain)
        ]
        for bid in list(applied)[:4] + ["m0", "c0", "never"]:
            assert t.find_batch(bid) == applied.get(bid), bid
