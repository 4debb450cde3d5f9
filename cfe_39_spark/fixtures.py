"""Deterministic CDC fixture generator + independent pandas oracle
(SURVEY.md §5.2, FIXTURES.md F1-F4).

Everything is seeded (default 42, matching the driver's testdata); no wall
clock, no external data.  Two generators:

  * ``gen_fixture`` — small, feature-complete (duplicate deliveries,
    out-of-order event times, hot keys, schema evolution, re-slicing),
    dict-based; drives unit/property tests.
  * ``gen_bench_log`` — numpy-vectorized bulk generator for the throughput
    bench (10^6+ events locally; the 10^10 spec scale is the same code with
    bigger numbers on a real cluster).

The oracle (``expected_state``) is a pure-pandas fold, independent of every
Spark code path: an event is applied iff its (event_time, offset) pair is
lexicographically greater than the key's stored pair — the same single
ordering rule the engine uses (SURVEY.md §4.3), so engine-vs-oracle
equality is a real two-implementation check.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field as dc_field

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

BASE_TS = np.datetime64("2024-01-01T00:00:00", "us")
SOURCES = ["web", "code", "books", "wiki"]
SOURCE_P = [0.70, 0.15, 0.10, 0.05]
VOCAB = 50257


@dataclass
class GenConfig:
    n_docs_initial: int = 50
    n_events: int = 400
    n_segments: int = 8
    n_partitions: int = 4
    key_dist: str = "uniform"  # or "hot": 80% of events on 1% of keys
    dup_rate: float = 0.0  # fraction of re-delivered (doc_id, offset) copies
    shuffle_within_segments: bool = False
    seed: int = 42
    mean_len: int = 24
    max_len: int = 2048
    # list of (segment_idx, action-dict) applied from that segment on (F4)
    evolution: list = dc_field(default_factory=list)


def _tokens(rng: np.random.Generator, mean_len: int, max_len: int) -> np.ndarray:
    ln = int(np.clip(rng.lognormal(np.log(mean_len), 0.6), 1, max_len))
    return rng.integers(0, VOCAB, size=ln, dtype=np.int32)


def gen_initial(cfg: GenConfig) -> pa.Table:
    """Initial table load (F1): n_docs_initial rows, pinned arrow types."""
    rng = np.random.default_rng(cfg.seed)
    rows = []
    for i in range(cfg.n_docs_initial):
        toks = _tokens(rng, cfg.mean_len, cfg.max_len)
        rows.append(
            {
                "doc_id": f"doc-{i:08d}",
                "tokens": toks,
                "n_tok": np.int32(len(toks)),
                "source": rng.choice(SOURCES, p=SOURCE_P),
            }
        )
    return pa.Table.from_pydict(
        {
            "doc_id": [r["doc_id"] for r in rows],
            "tokens": [r["tokens"] for r in rows],
            "n_tok": [r["n_tok"] for r in rows],
            "source": [r["source"] for r in rows],
        },
        schema=pa.schema(
            [
                ("doc_id", pa.string()),
                ("tokens", pa.list_(pa.int32())),
                ("n_tok", pa.int32()),
                ("source", pa.string()),
            ]
        ),
    )


def gen_events(cfg: GenConfig) -> list[dict]:
    """The base event list (before segmentation).  Deterministic for a
    fixed config; re-slicing variants reuse this list verbatim."""
    rng = np.random.default_rng(cfg.seed + 1)
    seen = [f"doc-{i:08d}" for i in range(cfg.n_docs_initial)]
    hot_n = max(1, len(seen) // 100)
    events: list[dict] = []
    next_new = 0
    seg_of = lambda i: min(i * cfg.n_segments // cfg.n_events, cfg.n_segments - 1)  # noqa: E731
    # evolution state
    evo_sorted = sorted(cfg.evolution, key=lambda e: e[0])
    for i in range(cfg.n_events):
        seg = seg_of(i)
        active = [a for s, a in evo_sorted if s <= seg]
        schema_version = 1 + len(active)
        added_cols = [a for a in active if a["action"] == "add_column"]
        widened = {a["name"]: a["to"] for a in active if a["action"] == "widen"}
        retags = {a["from"]: a["to"] for a in active if a["action"] == "retag_source"}

        op = rng.choice(["I", "U", "D"], p=[0.60, 0.30, 0.10])
        if op == "I":
            doc_id = f"doc-{10_000_000 + next_new:08d}"
            next_new += 1
            seen.append(doc_id)
        else:
            if cfg.key_dist == "hot" and rng.random() < 0.80:
                doc_id = seen[int(rng.integers(0, hot_n))]
            else:
                doc_id = seen[int(rng.integers(0, len(seen)))]
        jitter_us = int(rng.integers(0, 1000) * 1000)
        if rng.random() < 0.05:  # ~5% event-time/offset order inversions
            jitter_us -= 2_500_000
        ev: dict = {
            "op": op,
            "doc_id": doc_id,
            "offset": np.int64(i),
            "src_partition": np.int32(rng.integers(0, cfg.n_partitions)),
            "epoch": np.int64(seg),
            "schema_version": np.int32(schema_version),
            "event_time": BASE_TS + np.timedelta64(i * 1_000_000 + jitter_us, "us"),
            "_seg": seg,
        }
        if op == "D":
            ev.update(tokens=None, n_tok=None, source=None)
        else:
            toks = _tokens(rng, cfg.mean_len, cfg.max_len)
            src = str(rng.choice(SOURCES, p=SOURCE_P))
            ev.update(
                tokens=toks,
                n_tok=np.int64(len(toks)) if widened.get("n_tok") == "int64" else np.int32(len(toks)),
                source=retags.get(src, src),
            )
        for a in added_cols:
            ev[a["name"]] = float(rng.random()) if op != "D" else None
        events.append(ev)

    # duplicate deliveries: re-emit earlier events at later positions
    if cfg.dup_rate > 0 and events:
        n_dups = int(len(events) * cfg.dup_rate)
        idxs = rng.integers(0, len(events), size=n_dups)
        for j in idxs:
            dup = dict(events[int(j)])
            pos = int(rng.integers(int(j), len(events)))
            dup["_seg"] = events[pos]["_seg"]  # delivered later, maybe cross-segment
            events.append(dup)
    return events


def _segment_table(evs: list[dict], widen_n_tok: bool, extra_cols: list[str]) -> pa.Table:
    n_tok_t = pa.int64() if widen_n_tok else pa.int32()
    fields = [
        ("doc_id", pa.string()),
        ("tokens", pa.list_(pa.int32())),
        ("n_tok", n_tok_t),
        ("source", pa.string()),
    ]
    fields += [(c, pa.float64()) for c in extra_cols]
    fields += [
        ("op", pa.string()),
        ("offset", pa.int64()),
        ("src_partition", pa.int32()),
        ("epoch", pa.int64()),
        ("schema_version", pa.int32()),
        ("event_time", pa.timestamp("us")),
    ]
    cols = {name: [e.get(name) for e in evs] for name, _ in fields}
    return pa.Table.from_pydict(cols, schema=pa.schema(fields))


def segment_events(
    cfg: GenConfig, events: list[dict], boundaries: list[int] | None = None
) -> list[pa.Table]:
    """Slice the base list into segment tables.  ``boundaries`` overrides
    the default per-event ``_seg`` assignment — the re-slicing variant."""
    if boundaries is None:
        groups: dict[int, list[dict]] = {}
        for e in events:
            groups.setdefault(e["_seg"], []).append(e)
        chunks = [groups.get(s, []) for s in range(cfg.n_segments)]
    else:
        chunks, prev = [], 0
        for b in boundaries + [len(events)]:
            chunks.append(events[prev:b])
            prev = b
    rng = np.random.default_rng(cfg.seed + 2)
    out = []
    evo_sorted = sorted(cfg.evolution, key=lambda e: e[0])
    for si, chunk in enumerate(chunks):
        if cfg.shuffle_within_segments and len(chunk) > 1:
            chunk = [chunk[k] for k in rng.permutation(len(chunk))]
        if not chunk:
            continue
        # a segment's file schema = the widest schema of events it holds
        max_seg = max(e["_seg"] for e in chunk)
        active = [a for s, a in evo_sorted if s <= max_seg]
        widen = any(
            a["action"] == "widen" and a["name"] == "n_tok" for a in active
        )
        extra = [a["name"] for a in active if a["action"] == "add_column"]
        out.append(_segment_table(chunk, widen, extra))
    return out


def expected_state(
    initial: pa.Table, events: list[dict], keep_meta: bool = False
) -> pd.DataFrame:
    """The oracle: pure-pandas/python fold, no Spark.

    Returns the user-facing final state (live rows only), sorted by doc_id,
    tokens as numpy int32 arrays.  Columns = initial schema + any
    evolution-added columns observed in the events.

    ``keep_meta=True`` keeps tombstoned keys AND the internal fold state
    (``_et``/``_off``/``_sp``/``_deleted``) — the winner's LWW triple —
    so a test can diff two fold points by the exact ordering rule the
    engine's changelog classifier uses (``read_changelog``), not by value
    equality.
    """
    extra_cols: list[str] = []
    base_cols = {"op", "doc_id", "tokens", "n_tok", "source", "offset",
                 "src_partition", "epoch", "schema_version", "event_time", "_seg"}
    for e in events:
        for k in e:
            if k not in base_cols and k not in extra_cols:
                extra_cols.append(k)

    state: dict[str, dict] = {}
    init = initial.to_pylist()
    for r in init:
        state[r["doc_id"]] = {
            "doc_id": r["doc_id"],
            "tokens": np.asarray(r["tokens"], dtype=np.int32),
            "n_tok": r["n_tok"],
            "source": r["source"],
            **{c: None for c in extra_cols},
            # initial-load rows lose to ANY event: same sentinel triple the
            # engine stamps at table.create (EPOCH0, -1, -1) — keeping the
            # two implementations' ordering rules bit-identical even for
            # events whose event_time predates the fixture base
            "_et": np.datetime64("1970-01-01T00:00:00", "us"),
            "_off": np.int64(-1),
            "_sp": np.int64(-1),
            "_deleted": False,
        }
    # the engine's full ordering rule is the TRIPLE (event_time, offset,
    # src_partition): offsets are only monotone per source partition, so
    # two different events can tie on the pair — the persisted tertiary
    # key breaks the tie identically on both sides (cdc.py determinism rule)
    for e in sorted(
        events, key=lambda x: (x["event_time"], x["offset"], x["src_partition"])
    ):
        cur = state.get(e["doc_id"])
        triple = (e["event_time"], e["offset"], e["src_partition"])
        if cur is not None and triple <= (cur["_et"], cur["_off"], cur["_sp"]):
            continue  # idempotency / LWW: not lexicographically newer
        if e["op"] == "D":
            row = {
                "doc_id": e["doc_id"],
                "tokens": None,
                "n_tok": None,
                "source": None,
                **{c: None for c in extra_cols},
                "_et": e["event_time"],
                "_off": e["offset"],
                "_sp": e["src_partition"],
                "_deleted": True,
            }
        else:
            row = {
                "doc_id": e["doc_id"],
                "tokens": np.asarray(e["tokens"], dtype=np.int32),
                "n_tok": int(e["n_tok"]),
                "source": e["source"],
                **{c: e.get(c) for c in extra_cols},
                "_et": e["event_time"],
                "_off": e["offset"],
                "_sp": e["src_partition"],
                "_deleted": False,
            }
        state[e["doc_id"]] = row
    rows = [
        {k: v for k, v in r.items() if k not in ("_et", "_off", "_sp", "_deleted")}
        for r in state.values()
        if not r["_deleted"]
    ]
    if keep_meta:
        df = pd.DataFrame(
            list(state.values()),
            columns=["doc_id", "tokens", "n_tok", "source", *extra_cols,
                     "_et", "_off", "_sp", "_deleted"],
        )
        return df.sort_values("doc_id").reset_index(drop=True)
    df = pd.DataFrame(rows, columns=["doc_id", "tokens", "n_tok", "source", *extra_cols])
    return df.sort_values("doc_id").reset_index(drop=True)


def write_fixture(
    out_dir: str, cfg: GenConfig, boundaries: list[int] | None = None
) -> dict:
    """Materialize initial/, segments/, expected.parquet under out_dir."""
    os.makedirs(os.path.join(out_dir, "segments"), exist_ok=True)
    initial = gen_initial(cfg)
    events = gen_events(cfg)
    pq.write_table(initial, os.path.join(out_dir, "initial.parquet"))
    segs = segment_events(cfg, events, boundaries)
    for i, seg in enumerate(segs):
        pq.write_table(seg, os.path.join(out_dir, "segments", f"seg-{i:05d}.parquet"))
    exp = expected_state(initial, events)
    return {"initial": initial, "events": events, "segments": segs, "expected": exp}


# ------------------------------------------------------------------ #
# vectorized bulk generator for the throughput bench
# ------------------------------------------------------------------ #
def gen_bench_log(
    out_dir: str,
    n_events: int,
    n_docs: int,
    n_segments: int = 16,
    n_partitions: int = 8,
    key_dist: str = "uniform",
    mean_len: int = 64,
    seed: int = 42,
) -> None:
    """Numpy-vectorized event-log writer: builds each segment's token
    column as one flat int32 buffer + offsets -> arrow ListArray (zero
    per-row python).  Deterministic for fixed args."""
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    per_seg = n_events // n_segments
    # doc-id pool indexed by key: orders of magnitude faster than per-row
    # numpy unicode formatting at 10^7-event scale
    id_pool = np.array([f"doc-{k}" for k in range(n_docs)])
    for s in range(n_segments):
        n = per_seg if s < n_segments - 1 else n_events - per_seg * (n_segments - 1)
        gidx = np.arange(s * per_seg, s * per_seg + n, dtype=np.int64)
        if key_dist == "hot":
            hot = rng.random(n) < 0.80
            keys = np.where(
                hot,
                rng.integers(0, max(1, n_docs // 100), size=n),
                rng.integers(0, n_docs, size=n),
            )
        else:
            keys = rng.integers(0, n_docs, size=n)
        ops = rng.choice(np.array(["I", "U", "D"]), size=n, p=[0.6, 0.3, 0.1])
        lens = np.clip(
            rng.lognormal(np.log(mean_len), 0.5, size=n).astype(np.int64), 1, 2048
        )
        lens[ops == "D"] = 0
        flat = rng.integers(0, VOCAB, size=int(lens.sum()), dtype=np.int32)
        offsets = np.zeros(n + 1, dtype=np.int32)
        np.cumsum(lens, out=offsets[1:])
        toks = pa.ListArray.from_arrays(pa.array(offsets), pa.array(flat))
        is_del = ops == "D"
        n_tok = lens.astype(np.int32)
        jitter = rng.integers(0, 1_000_000, size=n)
        jitter -= (rng.random(n) < 0.05).astype(np.int64) * 2_500_000
        et = BASE_TS + (gidx * 1_000_000 + jitter).astype("timedelta64[us]")
        tbl = pa.table(
            {
                "doc_id": pa.array(id_pool[keys]),
                "tokens": toks,
                "n_tok": pa.array(np.where(is_del, None, n_tok), type=pa.int32(), from_pandas=True),
                "source": pa.array(
                    np.asarray(SOURCES)[rng.integers(0, 4, size=n)]
                ),
                "op": pa.array(ops),
                "offset": pa.array(gidx),
                "src_partition": pa.array((gidx % n_partitions).astype(np.int32)),
                "epoch": pa.array(np.full(n, s, dtype=np.int64)),
                "schema_version": pa.array(np.full(n, 1, dtype=np.int32)),
                "event_time": pa.array(et),
            }
        )
        # row-group-sized for splittable scans: one giant row group would
        # serialize the whole segment's decode into a single Spark task no
        # matter how many cores exist (the unsplittable-input trap)
        pq.write_table(
            tbl, os.path.join(out_dir, f"seg-{s:05d}.parquet"), row_group_size=16384
        )


def gen_bench_log_spark(
    spark,
    out_dir: str,
    n_events: int,
    n_docs: int,
    n_segments: int = 2,
    n_partitions: int = 8,
    key_dist: str = "uniform",
    mean_len: int = 256,
    seed: int = 42,
) -> None:
    """Generate the throughput-bench event log WITH Spark (one segment =
    one directory of parquet parts).

    Rationale: the sandbox VM throttles per-core memory bandwidth to
    ~0.1 GB/s while aggregate bandwidth scales with cores, so a numpy
    (single-core) generator needs minutes for GB-scale logs that 32 Spark
    tasks emit in seconds — and at the spec's 10^10-event scale a
    driver-side generator is impossible anyway.  All columns are
    deterministic JVM-side functions of (seed, event index): xxhash64 for
    keys/ops, hash-derived token ids, uniform [mean/4, 7·mean/4] lengths
    (mean = mean_len).
    """
    from pyspark.sql import functions as F

    per_seg = n_events // n_segments
    base = F.col("id")
    h = lambda k: F.xxhash64(base, F.lit(seed), F.lit(k))  # noqa: E731
    if key_dist == "hot":
        key = F.when(
            F.pmod(h(1), F.lit(100)) < 80,
            F.pmod(h(2), F.lit(max(n_docs // 100, 1))),
        ).otherwise(F.pmod(h(3), F.lit(n_docs)))
    else:
        key = F.pmod(h(3), F.lit(n_docs))
    r = F.pmod(h(4), F.lit(10))
    op = F.when(r < 6, F.lit("I")).when(r < 9, F.lit("U")).otherwise(F.lit("D"))
    lo, hi = mean_len // 4, mean_len * 7 // 4
    ln = (F.lit(lo) + F.pmod(h(5), F.lit(hi - lo + 1))).cast("int")
    tokens = F.transform(
        F.sequence(F.lit(1), ln),
        lambda i: F.pmod(F.xxhash64(base, i), F.lit(VOCAB)).cast("int"),
    )
    srcs = F.array(*[F.lit(s) for s in SOURCES])
    df = spark.range(n_events).select(
        F.concat(F.lit("doc-"), key).alias("doc_id"),
        F.when(op != "D", tokens).alias("tokens"),
        F.when(op != "D", ln).alias("n_tok"),
        F.when(op != "D", F.element_at(srcs, F.pmod(h(6), F.lit(4)).cast("int") + 1)).alias(
            "source"
        ),
        op.alias("op"),
        base.alias("offset"),
        F.pmod(base, F.lit(n_partitions)).cast("int").alias("src_partition"),
        (base * F.lit(n_segments) / F.lit(n_events)).cast("long").alias("epoch"),
        F.lit(1).alias("schema_version"),
        (
            F.lit("2024-01-01 00:00:00").cast("timestamp")
            + F.make_interval(secs=base + F.pmod(h(7), F.lit(1000)) / 1000.0)
        ).alias("event_time"),
    )
    def _write_seg(s: int) -> None:
        lo_i = s * per_seg
        hi_i = (s + 1) * per_seg if s < n_segments - 1 else n_events
        df.filter((F.col("offset") >= lo_i) & (F.col("offset") < hi_i)).write.parquet(
            os.path.join(out_dir, f"seg-{s:05d}"), mode="overwrite"
        )

    # concurrent segment jobs (CFE39_GEN_PAR) overlap one job's write/IO
    # tail with the next one's compute — segments are independent output
    # dirs, so this is pure scheduler pipelining; content is unchanged
    # (every column is a pure function of the event index)
    par = int(os.environ.get("CFE39_GEN_PAR", "1"))
    if par > 1 and n_segments > 1:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=min(par, n_segments)) as pool:
            list(pool.map(_write_seg, range(n_segments)))
    else:
        for s in range(n_segments):
            _write_seg(s)
