"""Deduplication operators for the training-data pipeline (task brief:
exact, MinHash+LSH, SimHash, n-gram Jaccard), oracle-checked over the
``documents`` table.

Scale design: every variant is a shuffle-bounded composition —
shingle-explode → hash-agg → equi-join on shingle/band/bucket keys — with
no pairwise O(n²) stage.  Hash functions are md5-based so the DuckDB
oracle computes bit-identical values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, types as T

from .base import register, table

N_SEEDS = 8  # minhash signature length
N_BANDS = 4  # LSH bands (r = 2 rows/band): P(candidate) = 1-(1-j^2)^4
DF_CUT = 50  # dd02: drop shingles shared by more than this many docs


def _shingle_array() -> F.Column:
    """Per-row distinct word-3-gram shingle list (JVM higher-order
    functions, no shuffle).

    Shifted-slice zip_with, not index-lambda element_at: Catalyst inlines
    the ``split`` under every ``element_at`` inside a lambda (no
    common-subexpression hoisting across a higher-order function), so the
    index form re-splits the text ~3x-per-position — measured 2.6x slower
    than zipping three shifted slices, which evaluates the split three
    times per ROW."""
    ws = F.split(F.trim(F.col("text")), r"\s+")
    m = F.greatest(F.size(ws) - 2, F.lit(0))
    s1, s2, s3 = F.slice(ws, 1, m), F.slice(ws, 2, m), F.slice(ws, 3, m)
    sh = F.zip_with(
        F.zip_with(s1, s2, lambda a, b: F.concat_ws(" ", a, b)),
        s3,
        lambda ab, c: F.concat_ws(" ", ab, c),
    )
    return F.array_distinct(sh)


def _shingles(d: DataFrame) -> DataFrame:
    """Distinct word-3-gram shingles per doc, exploded to (doc_id, s)."""
    return d.select("doc_id", F.explode(_shingle_array()).alias("s"))


_SHINGLE_SQL = """
  sh AS (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s
         FROM (SELECT doc_id, ws, unnest(range(1, len(ws)-1)) AS i
               FROM (SELECT doc_id, string_split(trim(text), ' ') AS ws FROM documents)))
"""


@register(
    "dd01_exact_dup_groups",
    """SELECT fp, CAST(count(*) AS BIGINT) AS n_docs,
              CAST(min(doc_id) AS BIGINT) AS keep_doc_id
       FROM (SELECT doc_id, md5(substr(text, 1, 40)) AS fp FROM documents)
       GROUP BY fp HAVING count(*) > 1""",
)
def dd01(spark, sf):
    """Exact dedup by content hash: hash-groupBy on the md5 of the document
    prefix (the corpus's duplicates are prefix-seeded), keep the min id.
    One shuffle on the 128-bit key; no pairwise comparison."""
    d = table(spark, sf, "documents")
    return (
        d.select("doc_id", F.md5(F.substring("text", 1, 40)).alias("fp"))
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("keep_doc_id"))
        .filter("n_docs > 1")
    )


_DD02_SQL = f"""WITH {_SHINGLE_SQL},
       sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       keep AS (SELECT s FROM sh GROUP BY s HAVING count(*) <= {DF_CUT}),
       inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
                 FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
                 WHERE a.s IN (SELECT s FROM keep)
                 GROUP BY 1, 2)
       SELECT doc_a, doc_b,
              ROUND(c / (x.n + y.n - c), 4) AS jaccard
       FROM inter JOIN sz x ON x.doc_id = doc_a JOIN sz y ON y.doc_id = doc_b
       WHERE c / (x.n + y.n - c) >= 0.5"""


@register("dd02_ngram_jaccard", _DD02_SQL)
def dd02(spark, sf):
    """n-gram Jaccard near-dup, group-and-expand form: explode shingles
    ONCE, group by shingle collecting the (sorted) doc list, drop groups
    with df > DF_CUT (the document-frequency cut — a stop-shingle shared
    by k docs alone yields k² candidate pairs, which detonates at corpus
    scale; here the cut falls out of the same aggregation for free), then
    expand each surviving group's pairs JVM-side (bounded: <= C(K,2) per
    shingle) and count shared shingles per pair.  Doc shingle-set sizes
    are a pure per-row expression — no shuffle at all.  Total: two
    shuffles (group-by-shingle, group-by-pair), one pass over the text,
    pair work <= DF_CUT · |shingle rows|, linear in corpus size.  Cut
    shingles leave the intersection but stay in the union (standard
    stop-shingle semantics; the oracle mirrors exactly).  The MinHash
    variant below is still the true 100 TB path."""
    d = table(spark, sf, "documents", spread=True)
    sz = d.select("doc_id", F.size(_shingle_array()).alias("n"))
    sh = _shingles(d)
    groups = (
        sh.groupBy("s")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("ds"))
        .filter(F.size("ds") <= DF_CUT)
    )
    pairs = groups.select(
        F.explode(
            F.expr(
                "flatten(transform(ds, (x, i) -> "
                "transform(slice(ds, i + 2, size(ds)), y -> struct(x AS a, y AS b))))"
            )
        ).alias("p")
    )
    inter = (
        pairs.select(F.col("p.a").alias("doc_a"), F.col("p.b").alias("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    x, y = sz.alias("x"), sz.alias("y")
    j = F.col("c") / (F.col("x.n") + F.col("y.n") - F.col("c"))
    return (
        inter.join(x, F.col("x.doc_id") == F.col("doc_a"))
        .join(y, F.col("y.doc_id") == F.col("doc_b"))
        .filter(j >= 0.5)
        .select("doc_a", "doc_b", F.round(j, 4).alias("jaccard"))
    )


def _minhash_sql() -> str:
    band_val = (
        "min(CASE WHEN seed % 2 = 0 THEN mh END) || '|' || "
        "min(CASE WHEN seed % 2 = 1 THEN mh END)"
    )
    return f"""WITH {_SHINGLE_SQL},
       mh AS (SELECT doc_id, seed, min(md5(seed || '|' || s)) AS mh
              FROM sh, (SELECT unnest(range(0, {N_SEEDS})) AS seed)
              GROUP BY doc_id, seed),
       bands AS (SELECT doc_id, seed // 2 AS band, {band_val} AS sig
                 FROM mh GROUP BY doc_id, seed // 2)
       SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       FROM bands a JOIN bands b
         ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id"""


@register("dd03_minhash_lsh", _minhash_sql())
def dd03(spark, sf):
    """MinHash + LSH near-dup candidates (the 100 TB dedup path): 8-hash
    min-lexicographic md5 signature, banded 4×2, candidates = pairs sharing
    a band.  Cost is linear in corpus size + Σ bucket² — never all-pairs."""
    sh = _shingles(table(spark, sf, "documents", spread=True))
    seeds = F.explode(F.sequence(F.lit(0), F.lit(N_SEEDS - 1))).alias("seed")
    mh = (
        sh.select("doc_id", "s", seeds)
        .select(
            "doc_id",
            "seed",
            F.md5(F.concat_ws("|", F.col("seed"), F.col("s"))).alias("h"),
        )
        .groupBy("doc_id", "seed")
        .agg(F.min("h").alias("mh"))
    )
    bands = mh.groupBy(
        "doc_id", (F.col("seed") / 2).cast("long").alias("band")
    ).agg(
        F.concat_ws(
            "|",
            F.min(F.when(F.col("seed") % 2 == 0, F.col("mh"))),
            F.min(F.when(F.col("seed") % 2 == 1, F.col("mh"))),
        ).alias("sig")
    )
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def _simhash_sig_sql(nbits: int) -> str:
    """CTE chain ending in sig(doc_id, simhash) for an ``nbits``-bit
    signature (md5 hex nibble votes; nbits <= 32)."""
    return f"""w AS (SELECT doc_id, unnest(string_split(trim(text), ' ')) AS wd
                FROM documents),
       bits AS (SELECT doc_id, i,
                       sum(CASE WHEN substr(md5(wd), i + 1, 1) >= '8'
                                THEN 1 ELSE -1 END) AS bal
                FROM w, (SELECT unnest(range(0, {nbits})) AS i)
                GROUP BY doc_id, i),
       sig AS (SELECT doc_id,
                      CAST(sum(CASE WHEN bal > 0 THEN 1 << i ELSE 0 END) AS BIGINT)
                        AS simhash
               FROM bits GROUP BY doc_id)"""


def _simhash_sig(spark, sf, nbits: int = 16) -> DataFrame:
    """(doc_id, simhash): ``nbits``-bit md5-nibble hyperplane vote over the
    word multiset — the SimHash signature op (round 2's dd04 exposed the
    16-bit signature histogram standalone; it is subsumed into dd05's
    pair search, 32-bit: collision rate halves per added bit, and the
    banded search needs a sparse signature space to stay sub-quadratic)."""
    d = table(spark, sf, "documents", spread=True)
    w = d.select("doc_id", F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("wd"))
    bits = (
        w.select("doc_id", "wd", F.explode(F.sequence(F.lit(0), F.lit(nbits - 1))).alias("i"))
        .groupBy("doc_id", "i")
        .agg(
            F.sum(
                F.when(F.substring(F.md5("wd"), F.col("i") + 1, 1) >= "8", 1).otherwise(-1)
            ).alias("bal")
        )
    )
    return bits.groupBy("doc_id").agg(
        F.sum(
            # BIGINT shift: int 1 << 31 would overflow negative and flip
            # the top bit of every 32-bit signature
            F.when(F.col("bal") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), i)")).otherwise(
                F.lit(0).cast("long")
            )
        )
        .cast("long")
        .alias("simhash")
    )


HAMMING_MAX = 2  # dd05: near-dup iff hamming(sig_a, sig_b) <= 2 of 32 bits
N_BLOCKS = 4  # 8-bit blocks; pigeonhole: hamming <= N_BLOCKS-1 => >=1 block equal
CC_DRIVER_MAX = 100_000  # connected_components: union-find driver-side below this edge count


@register(
    "dd05_simhash_hamming_pairs",
    f"""WITH {_simhash_sig_sql(32)},
       blocks AS (SELECT doc_id, simhash, b, (simhash >> (b * 8)) & 255 AS blk
                  FROM sig, (SELECT unnest(range(0, {N_BLOCKS})) AS b)),
       cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                       a.simhash AS sa, b.simhash AS sb
                FROM blocks a JOIN blocks b
                  ON a.b = b.b AND a.blk = b.blk AND a.doc_id < b.doc_id)
       SELECT doc_a, doc_b, CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
       FROM cand WHERE bit_count(xor(sa, sb)) <= {HAMMING_MAX}""",
)
def dd05(spark, sf):
    """SimHash near-dup: signature + hamming pair search via banded
    pigeonhole: split the 32-bit signature into 4 byte blocks —
    any pair within hamming 3 agrees on at least one whole block — so
    candidates come from 4 equi-joins on (block_idx, block_value), never
    an all-pairs scan, and the exact popcount check (<= HAMMING_MAX) runs
    only on candidates.  Cost is Σ_block Σ_value df² like every LSH-style
    search; at web scale the signature widens (64-bit sig, 4 16-bit
    blocks: sparser blocks, fewer collisions) and hot blocks get the same
    df-cut treatment as dd02."""
    sig = _simhash_sig(spark, sf, nbits=32)
    blocks = sig.select(
        "doc_id",
        "simhash",
        F.explode(F.sequence(F.lit(0), F.lit(N_BLOCKS - 1))).alias("b"),
    ).withColumn(
        "blk",
        F.expr("(simhash >> (b * 8)) & 255"),
    )
    a, b = blocks.alias("a"), blocks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.b") == F.col("b.b"))
            & (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sa"),
            F.col("b.simhash").alias("sb"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.expr("sa ^ sb"))
    return cand.filter(hamming <= HAMMING_MAX).select(
        "doc_a", "doc_b", hamming.cast("long").alias("hamming")
    )


def connected_components(
    edges: DataFrame, max_rounds: int = 50, driver_max: int | None = None
) -> tuple[DataFrame, int]:
    """Connected components via alternating LARGE-STAR / SMALL-STAR rounds
    (Kiveris et al., "Connected Components in MapReduce and Beyond") —
    the hub-safe web-scale kernel.  Versus plain min-label propagation
    (round 2's implementation), this converges in O(log²) rounds
    independent of component DIAMETER, and every round rewrites the edge
    set toward stars, so a hub node's fan-in collapses onto its component
    minimum instead of being re-joined for O(diameter) rounds.

    Each half-round is one hash agg (per-node min neighbor — map-side
    partial combine absorbs hub skew before the shuffle) + one equi-join
    back to the edges; edge count never grows above the input.  The
    convergence probe is a bounded symmetric-difference LIMIT-1 job, not
    a collect.  Input: (src, dst) pair list; output: ((doc, label) rows,
    rounds-used).

    Small-graph fast path: near-dup candidate pair lists are usually a
    tiny fraction of the corpus (LSH banding bounds them); when the
    DEDUPED edge list fits driver metadata scale (``CC_DRIVER_MAX``
    edges, probed with limit(max+1) — never an unbounded count), a
    driver-side union-find computes the identical min-label components
    in one pass and the iterative rounds never launch.  Label semantics
    are identical by construction (component minimum), which the shared
    DuckDB oracle pins.  rounds=0 signals the fast path."""
    e = (
        edges.toDF("u", "v")
        .filter("u != v")
        .select(F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # labels schema is fixed by the edges' node type: createDataFrame
    # cannot infer it from an empty (or Row-typed) list, and a zero-edge
    # corpus (no verified near-dup pairs) is a legal input, not an error
    node_t = e.schema["u"].dataType
    label_schema = T.StructType(
        [T.StructField("doc", node_t), T.StructField("label", node_t)]
    )
    dmax = CC_DRIVER_MAX if driver_max is None else driver_max
    probe = e.limit(dmax + 1).collect() if dmax > 0 else []
    if dmax > 0 and len(probe) <= dmax:
        if not probe:
            return edges.sparkSession.createDataFrame([], label_schema), 0
        parent: dict = {}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]  # path halving
                x = parent[x]
            return x

        for r in probe:
            u, v = r["u"], r["v"]
            parent.setdefault(u, u)
            parent.setdefault(v, v)
            ru, rv = find(u), find(v)
            if ru != rv:
                # union by MIN root so the final label is the component min
                lo, hi = (ru, rv) if ru < rv else (rv, ru)
                parent[hi] = lo
        rows = [(n, find(n)) for n in parent]
        return (
            edges.sparkSession.createDataFrame(rows, label_schema),
            0,
        )
    rounds = 0
    while rounds < max_rounds:
        rounds += 1
        bidir = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = bidir.groupBy("u").agg(F.min("v").alias("mn"))
        m = F.least(F.col("u"), F.col("mn"))
        # large-star: every neighbor larger than u links to u's min
        ls = (
            bidir.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("a"), m.alias("b"))
            .filter("a != b")
            .distinct()
        )
        # small-star: every neighbor <= u (plus u itself) links to u's min
        bidir2 = ls.select(F.col("a").alias("u"), F.col("b").alias("v")).union(
            ls.select(F.col("b").alias("u"), F.col("a").alias("v"))
        )
        mins2 = bidir2.groupBy("u").agg(F.min("v").alias("mn"))
        m2 = F.least(F.col("u"), F.col("mn"))
        small = (
            bidir2.join(mins2, "u")
            .filter(F.col("v") <= F.col("u"))
            .select(F.col("v").alias("a"), m2.alias("b"))
            .union(mins2.select(F.col("u").alias("a"), F.least("u", "mn").alias("b")))
        )
        new = (
            small.filter("a != b")
            .select(F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v"))
            .distinct()
            .localCheckpoint(eager=True)  # truncate per-round lineage growth
        )
        changed = (
            new.exceptAll(e).union(e.exceptAll(new)).limit(1).count() > 0
        )
        e = new
        if not changed:
            break
    # converged state is a star per component: (component_min, member)
    labels = (
        e.select(F.col("v").alias("doc"), F.col("u").alias("label"))
        .union(e.select(F.col("u").alias("doc"), F.col("u").alias("label")))
        .groupBy("doc")
        .agg(F.min("label").alias("label"))
    )
    return labels, rounds


@register(
    "dd06_neardup_clusters",
    f"""WITH RECURSIVE pairs AS ({_DD02_SQL}),
       edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
                 UNION ALL
                 SELECT doc_b, doc_a FROM pairs),
       nodes AS (SELECT DISTINCT src AS doc FROM edges),
       r AS (SELECT doc, doc AS reach FROM nodes
             UNION
             SELECT r.doc, e.dst FROM r JOIN edges e ON e.src = r.reach)
       SELECT doc AS doc_id,
              CAST(min(reach) AS BIGINT) AS cluster_id,
              (doc = min(reach)) AS is_keeper
       FROM r GROUP BY doc""",
)
def dd06(spark, sf):
    """Near-dup CLUSTERING — the step that turns pair lists into keep/drop
    decisions: connected components over the dd02 Jaccard-verified edges
    via the alternating large-star/small-star kernel (see
    ``connected_components``; round 2's min-label propagation is replaced
    — hub fan-in is now bounded by construction, closing round 2's
    documented web-crawl caveat).  Keeper = the component's min doc_id.
    The DuckDB oracle computes the same components by recursive
    reachability closure."""
    p = dd02(spark, sf).select("doc_a", "doc_b")
    labels, _ = connected_components(p)
    return labels.select(
        F.col("doc").alias("doc_id"),
        F.col("label").alias("cluster_id"),
        (F.col("doc") == F.col("label")).alias("is_keeper"),
    )
