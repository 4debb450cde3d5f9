"""Connected-components kernel (dd06's large-star/small-star): hub safety,
log-round convergence on chains, and correctness on multi-component edge
lists — the properties that make near-dup clustering web-crawl-safe."""

from cfe_39_spark.queries.dedup import connected_components


def _labels(df):
    return {r["doc"]: r["label"] for r in df.collect()}


def test_cc_hub_bounded_rounds(spark):
    """A 1k-degree hub (the web-crawl shape that detonates naive
    propagation) must resolve in a handful of rounds, with the hub's
    fan-in collapsing onto the component min — not O(diameter) re-joins."""
    hub = 500
    edges = spark.createDataFrame(
        [(hub, i) for i in range(1001) if i != hub], "src long, dst long"
    )
    labels, rounds = connected_components(edges, driver_max=0)
    got = _labels(labels)
    assert rounds <= 4, f"hub took {rounds} rounds"
    assert len(got) == 1001
    assert set(got.values()) == {0}  # component min labels everyone


def test_cc_chain_log_rounds(spark):
    """A 64-node path has diameter 63: plain min-label propagation needs
    ~63 rounds; the alternating star algorithm must finish in O(log n)."""
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(63)], "src long, dst long"
    )
    labels, rounds = connected_components(edges, driver_max=0)
    got = _labels(labels)
    assert rounds <= 10, f"chain took {rounds} rounds (diameter-bound, not log)"
    assert len(got) == 64 and set(got.values()) == {0}


def test_cc_multiple_components(spark):
    """Disjoint components keep disjoint labels; keeper = component min."""
    edges = spark.createDataFrame(
        # comp A: 1-2-3 triangle, comp B: 10-11, comp C: 20-21-22 chain
        [(1, 2), (2, 3), (1, 3), (10, 11), (20, 21), (21, 22)],
        "src long, dst long",
    )
    labels, _ = connected_components(edges, driver_max=0)
    got = _labels(labels)
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_cc_duplicate_and_reversed_edges(spark):
    """The kernel canonicalizes input: duplicates, self-loops and reversed
    duplicates must not change the result."""
    edges = spark.createDataFrame(
        [(2, 1), (1, 2), (2, 2), (1, 2), (3, 2)], "src long, dst long"
    )
    labels, _ = connected_components(edges, driver_max=0)
    assert _labels(labels) == {1: 1, 2: 1, 3: 1}

def test_cc_driver_fast_path_matches_distributed(spark):
    """The small-graph union-find fast path must produce exactly the
    distributed kernel's labels (hub + chain + disjoint components +
    duplicates in one graph) and signal itself via rounds=0."""
    raw = (
        [(500, i) for i in range(200) if i != 500]  # hub
        + [(1000 + i, 1001 + i) for i in range(20)]  # chain
        + [(2000, 2001), (2001, 2000), (2002, 2002)]  # dup/reversed/self
    )
    edges = spark.createDataFrame(raw, "src long, dst long")
    fast, r_fast = connected_components(edges)
    dist, r_dist = connected_components(edges, driver_max=0)
    assert r_fast == 0 and r_dist > 0
    assert _labels(fast) == _labels(dist)


def test_cc_empty_edges_both_paths(spark):
    """Zero verified near-dup pairs is a legal corpus state: both the
    driver fast path and the distributed kernel must return an empty,
    correctly-typed label set (ADVICE r3: the fast path used to crash on
    schema inference from an empty list)."""
    edges = spark.createDataFrame([], "src long, dst long")
    for dmax in (100000, 0):  # fast path, distributed path
        labels, _ = connected_components(edges, driver_max=dmax)
        assert labels.count() == 0
        assert [f.name for f in labels.schema.fields] == ["doc", "label"]
        assert labels.schema["doc"].dataType.simpleString() == "bigint"


def test_cc_self_loops_only(spark):
    """Edges that all collapse to self-loops dedupe to an empty edge set —
    same empty-result contract as no edges at all."""
    edges = spark.createDataFrame([(1, 1), (2, 2)], "src long, dst long")
    labels, _ = connected_components(edges)
    assert labels.count() == 0
