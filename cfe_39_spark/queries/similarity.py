"""Similarity search over the ``embeddings`` table (task brief: ANN over an
embedding column — brute-force cosine top-k baseline, LSH/IVF scale paths).

Vector math stays JVM-side: dot products and norms are higher-order
``zip_with``/``aggregate`` folds over ``array<float>`` cast to double (no
Python in the hot path).  Cosines are rounded to 6 decimals before any
ranking/threshold so ordering is reproducible across engines (summation
order differs by ULPs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from .base import register, table

N_PLANES = 8  # hyperplane-LSH signature bits (sim03 bucket histogram)
N_CELLS = 8  # IVF coarse cells (centroids = first N_CELLS vectors)
N_TABLES = 4  # sim05: LSH hash tables (recall booster: cand = union over tables)
PLANES_PER_TABLE = 4  # sim05: signature bits per table -> 16 buckets/table


def dot(a: Column, b: Column) -> Column:
    """<a, b> as an index-ordered JVM fold (deterministic summation)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return F.round(dot(a, b) / (norm(a) * norm(b)), 6)


# DuckDB mirror: positional unnest zips (vec_id, i, v) rows; dot = Σ v·v
# grouped by pair.  Same math, same rounding.
_EX_SQL = """
  ex AS (SELECT vec_id, unnest(range(1, 65)) AS i, unnest(embedding)::DOUBLE AS v
         FROM embeddings),
  nrm AS (SELECT vec_id, sqrt(sum(v * v)) AS n FROM ex GROUP BY vec_id)
"""


@register(
    "sim01_cosine_topk",
    f"""WITH {_EX_SQL},
       dots AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                       sum(a.v * b.v) AS d
                FROM ex a JOIN ex b ON a.i = b.i AND a.vec_id <> b.vec_id
                WHERE a.vec_id % 50 = 0
                GROUP BY 1, 2)
       SELECT query_id, neighbor_id, sim FROM (
         SELECT query_id, neighbor_id,
                ROUND(d / (x.n * y.n), 6) AS sim,
                row_number() OVER (
                  PARTITION BY query_id
                  ORDER BY ROUND(d / (x.n * y.n), 6) DESC, neighbor_id) AS rn
         FROM dots JOIN nrm x ON x.vec_id = query_id
                   JOIN nrm y ON y.vec_id = neighbor_id
       ) WHERE rn <= 3""",
)
def sim01(spark, sf):
    """Brute-force cosine top-k (the exactness baseline): query rows
    broadcast against the corpus, JVM fold per pair, per-query top-3 via
    window rank.  At 100 TB this is the verifier for the LSH/IVF paths."""
    e = table(spark, sf, "embeddings")
    q = e.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    j = F.broadcast(q).join(e, F.col("vec_id") != F.col("query_id"))
    sims = j.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        cosine(F.col("qv"), F.col("embedding")).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        sims.withColumn("rn", F.row_number().over(w))
        .filter("rn <= 3")
        .select("query_id", "neighbor_id", "sim")
    )


@register(
    "sim02_cosine_neardup",
    f"""WITH {_EX_SQL},
       dots AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, sum(a.v * b.v) AS d
                FROM ex a JOIN ex b ON a.i = b.i AND a.vec_id < b.vec_id
                GROUP BY 1, 2)
       SELECT vec_a, vec_b, ROUND(d / (x.n * y.n), 6) AS sim
       FROM dots JOIN nrm x ON x.vec_id = vec_a JOIN nrm y ON y.vec_id = vec_b
       WHERE ROUND(d / (x.n * y.n), 6) >= 0.4""",
)
def sim02(spark, sf):
    """Embedding-cosine near-dup pairs (brief: 'embedding-cosine near-dup').

    DEMO-ONLY / oracle-exact variant: the `vec_a < vec_b` join is a
    BroadcastNestedLoopJoin over n²/2 pairs — never run this at corpus
    scale.  The production path is sim05 (LSH-bucketed candidates, exact
    cosine verify), which prunes the pair space before any vector math."""
    e = table(spark, sf, "embeddings")
    a = e.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"))
    b = e.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"))
    j = a.join(b, F.col("vec_a") < F.col("vec_b"))
    sim = cosine(F.col("ea"), F.col("eb"))
    return j.select("vec_a", "vec_b", sim.alias("sim")).filter(F.col("sim") >= 0.4)


def _plane_weight_sql() -> str:
    # ±1 hyperplane weights from md5(plane '-' dim): public-derivable, both
    # engines compute identical planes
    return (
        "(SELECT p.b AS b, d.i AS i, "
        " CASE WHEN substr(md5(p.b || '-' || d.i), 1, 1) >= '8' THEN 1 ELSE -1 END AS w"
        f" FROM (SELECT unnest(range(0, {N_PLANES})) AS b) p,"
        "      (SELECT unnest(range(1, 65)) AS i) d)"
    )


@register(
    "sim03_lsh_buckets",
    f"""WITH {_EX_SQL},
       planes AS (SELECT * FROM {_plane_weight_sql()}),
       bits AS (SELECT e.vec_id, p.b,
                       (sum(p.w * e.v) > 0) AS bit
                FROM ex e JOIN planes p ON p.i = e.i
                GROUP BY 1, 2),
       buckets AS (SELECT vec_id,
                          CAST(sum(CASE WHEN bit THEN 1 << b ELSE 0 END) AS BIGINT)
                            AS bucket
                   FROM bits GROUP BY vec_id)
       SELECT bucket, CAST(count(*) AS BIGINT) AS n_vectors
       FROM buckets GROUP BY bucket""",
)
def sim03(spark, sf):
    """Random-hyperplane LSH bucketing (the ANN scale path): 8 md5-derived
    ±1 planes → 8-bit signature → bucket.  Search joins query buckets to
    candidate buckets; cost Σ bucket², never all-pairs."""
    e = table(spark, sf, "embeddings")
    ex = e.select(
        "vec_id", F.posexplode(F.col("embedding")).alias("i0", "vf")
    ).select("vec_id", (F.col("i0") + 1).alias("i"), F.col("vf").cast("double").alias("v"))
    planes = (
        spark.range(N_PLANES)
        .select(F.col("id").cast("int").alias("b"))
        .crossJoin(spark.range(1, 65).select(F.col("id").cast("int").alias("i")))
        .select(
            "b",
            "i",
            F.when(
                F.substring(F.md5(F.concat_ws("-", F.col("b"), F.col("i"))), 1, 1) >= "8", 1
            )
            .otherwise(-1)
            .alias("w"),
        )
    )
    bits = (
        ex.join(F.broadcast(planes), "i")
        .groupBy("vec_id", "b")
        .agg((F.sum(F.col("w") * F.col("v")) > 0).alias("bit"))
    )
    buckets = bits.groupBy("vec_id").agg(
        F.sum(F.when(F.col("bit"), F.expr("CAST(shiftleft(1, b) AS BIGINT)")).otherwise(0))
        .cast("long")
        .alias("bucket")
    )
    return buckets.groupBy("bucket").agg(F.count(F.lit(1)).alias("n_vectors"))


def _multi_table_planes_sql() -> str:
    # 16 ±1 planes p=0..15; table l = p // PLANES_PER_TABLE, bit = p % PPT.
    # Same public md5 derivation as sim03 so both engines agree bit-for-bit.
    n = N_TABLES * PLANES_PER_TABLE
    return (
        "(SELECT p.p AS p, d.i AS i, "
        " CASE WHEN substr(md5(p.p || '-' || d.i), 1, 1) >= '8' THEN 1 ELSE -1 END AS w"
        f" FROM (SELECT unnest(range(0, {n})) AS p) p,"
        "      (SELECT unnest(range(1, 65)) AS i) d)"
    )


@register(
    "sim05_lsh_ann",
    f"""WITH {_EX_SQL},
       planes AS (SELECT * FROM {_multi_table_planes_sql()}),
       bits AS (SELECT e.vec_id, pl.p, (sum(pl.w * e.v) > 0) AS bit
                FROM ex e JOIN planes pl ON pl.i = e.i GROUP BY 1, 2),
       buckets AS (SELECT vec_id, p // {PLANES_PER_TABLE} AS l,
                          CAST(sum(CASE WHEN bit
                                        THEN 1 << (p % {PLANES_PER_TABLE})
                                        ELSE 0 END) AS BIGINT) AS bucket
                   FROM bits GROUP BY vec_id, p // {PLANES_PER_TABLE}),
       pairs AS (SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
                 FROM buckets q JOIN buckets c
                   ON q.l = c.l AND q.bucket = c.bucket AND q.vec_id <> c.vec_id
                 WHERE q.vec_id % 50 = 0),
       dots AS (SELECT query_id, neighbor_id, sum(a.v * b.v) AS d
                FROM pairs JOIN ex a ON a.vec_id = query_id
                           JOIN ex b ON b.vec_id = neighbor_id AND b.i = a.i
                GROUP BY 1, 2)
       SELECT query_id, neighbor_id, sim FROM (
         SELECT query_id, neighbor_id,
                ROUND(d / (x.n * y.n), 6) AS sim,
                row_number() OVER (
                  PARTITION BY query_id
                  ORDER BY ROUND(d / (x.n * y.n), 6) DESC, neighbor_id) AS rn
         FROM dots JOIN nrm x ON x.vec_id = query_id
                   JOIN nrm y ON y.vec_id = neighbor_id
       ) WHERE rn <= 3""",
)
def sim05(spark, sf):
    """LSH ANN search end-to-end (the production near-neighbor path):
    multi-table hyperplane LSH → bucket equi-join → candidate pairs →
    exact-cosine verify → per-query top-k.

    N_TABLES independent 4-bit hash tables; a pair is a candidate if it
    collides in ANY table (the standard recall booster: miss probability
    (1-p^r)^L).  Join cost is Σ_l Σ_bucket |bucket|² — never all-pairs —
    and the exact cosine runs only on candidates, so at 10^10 vectors the
    vector math is ~(corpus × L × avg-bucket) pair evaluations instead of
    n².  Recall vs the sim01 brute-force baseline is asserted in
    tests/test_similarity.py."""
    e = table(spark, sf, "embeddings")
    n_planes = N_TABLES * PLANES_PER_TABLE
    ex = e.select(
        "vec_id", F.posexplode(F.col("embedding")).alias("i0", "vf")
    ).select(
        "vec_id", (F.col("i0") + 1).alias("i"), F.col("vf").cast("double").alias("v")
    )
    planes = (
        spark.range(n_planes)
        .select(F.col("id").cast("int").alias("p"))
        .crossJoin(spark.range(1, 65).select(F.col("id").cast("int").alias("i")))
        .select(
            "p",
            "i",
            F.when(
                F.substring(F.md5(F.concat_ws("-", F.col("p"), F.col("i"))), 1, 1) >= "8",
                1,
            )
            .otherwise(-1)
            .alias("w"),
        )
    )
    bits = (
        ex.join(F.broadcast(planes), "i")
        .groupBy("vec_id", "p")
        .agg((F.sum(F.col("w") * F.col("v")) > 0).alias("bit"))
    )
    buckets = bits.groupBy(
        "vec_id", (F.col("p") / PLANES_PER_TABLE).cast("long").alias("l")
    ).agg(
        F.sum(
            F.when(
                F.col("bit"),
                F.expr(f"CAST(shiftleft(1, p % {PLANES_PER_TABLE}) AS BIGINT)"),
            ).otherwise(0)
        )
        .cast("long")
        .alias("bucket")
    )
    qb = buckets.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), "l", "bucket"
    )
    pairs = (
        qb.join(buckets, ["l", "bucket"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
        .distinct()
    )
    qv = e.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"))
    nv = e.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("nv"))
    sims = (
        pairs.join(qv, "query_id")
        .join(nv, "neighbor_id")
        .select("query_id", "neighbor_id", cosine(F.col("qv"), F.col("nv")).alias("sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        sims.withColumn("rn", F.row_number().over(w))
        .filter("rn <= 3")
        .select("query_id", "neighbor_id", "sim")
    )


N_KMEANS_ITERS = 3  # Lloyd rounds for the IVF coarse quantizer
NPROBE = 2  # sim04: cells searched per query (recall/cost dial)


def _train_centroids(spark, e: DataFrame) -> DataFrame:
    """Spherical k-means coarse quantizer, trained distributedly.

    Each Lloyd round is two DataFrame jobs: (1) assign every vector to its
    max-cosine centroid (broadcast join + one window argmin), (2) new
    centroid = element-wise mean of its members (posexplode → per-(cell,
    dim) avg → re-assemble).  Only the N_CELLS×64 centroid matrix ever
    touches the driver (bounded metadata, not data) — the same protocol a
    1000-executor run would use, where training typically also samples the
    corpus first.  Means are rounded to 6 decimals so the quantizer is
    reproducible despite float summation order varying across partitions.
    """
    cents = e.orderBy("vec_id").limit(N_CELLS).select(
        F.col("vec_id").alias("cell"),
        F.transform(F.col("embedding"), lambda x: F.round(x.cast("double"), 6)).alias("cv"),
    )
    # seed cells 0..N_CELLS-1 regardless of which vec_ids seeded them
    cents = cents.select(
        (F.row_number().over(Window.orderBy("cell")) - 1).alias("cell"), "cv"
    )
    for _ in range(N_KMEANS_ITERS):
        assigned = _assign_cells(e, cents, nprobe=1)
        new = (
            assigned.select("cell", F.posexplode(F.col("embedding")).alias("pos", "val"))
            .groupBy("cell", "pos")
            .agg(F.round(F.avg(F.col("val").cast("double")), 6).alias("m"))
            .groupBy("cell")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s["m"],
                ).alias("cv")
            )
        )
        # an emptied cell keeps its previous centroid (standard Lloyd fix)
        cents = new.unionByName(
            cents.join(new.select("cell"), "cell", "left_anti")
        ).localCheckpoint(eager=True)
    return cents


def _assign_cells(df: DataFrame, cents: DataFrame, nprobe: int) -> DataFrame:
    """Top-``nprobe`` max-cosine cells per vector (broadcast centroids)."""
    j = df.crossJoin(F.broadcast(cents))
    w = Window.partitionBy("vec_id").orderBy(F.col("csim").desc(), F.col("cell"))
    return (
        j.select(df["*"], "cell", cosine(F.col("embedding"), F.col("cv")).alias("csim"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= nprobe)
        .drop("rn", "csim")
    )


@register("sim04_ivf_topk", None)
def sim04(spark, sf):
    """IVF ANN top-k (rows-only): k-means coarse quantizer → inverted
    file → per-query search restricted to the query's ``NPROBE`` nearest
    cells — the pruning that makes ANN linear-ish at 10^10 vectors
    (corpus scan cost ≈ NPROBE/N_CELLS of brute force, plus an O(N_CELLS)
    broadcast argmin per vector).

    Centroids come from ``_train_centroids`` (3 distributed Lloyd rounds,
    spherical k-means matching the cosine search metric); queries probe
    their top-2 cells while corpus vectors index under exactly one, the
    standard IVF recall/cost dial.  Remaining scale caveat: a pathological
    corpus can still overfill one cell — production splits cells over a
    size threshold (recursive k-means), same maintenance shape as the
    table's rebucket op.  Recall vs the sim01 brute-force baseline is
    asserted in tests/test_similarity.py."""
    e = table(spark, sf, "embeddings")
    cents = _train_centroids(spark, e)
    cand = _assign_cells(e, cents, nprobe=1).select("vec_id", "embedding", "cell")
    q = _assign_cells(e.filter(F.col("vec_id") % 50 == 0), cents, nprobe=NPROBE).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"), "cell"
    )
    j = q.join(cand, "cell").filter(F.col("vec_id") != F.col("query_id"))
    sims = j.select(
        "query_id", F.col("vec_id").alias("neighbor_id"), cosine(F.col("qv"), F.col("embedding")).alias("sim")
    ).dropDuplicates(["query_id", "neighbor_id"])
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        sims.withColumn("rn", F.row_number().over(w))
        .filter("rn <= 3")
        .select("query_id", "neighbor_id", "sim")
    )
