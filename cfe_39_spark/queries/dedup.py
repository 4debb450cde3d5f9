"""Deduplication operators for the training-data pipeline (task brief:
exact, MinHash+LSH, SimHash, n-gram Jaccard), oracle-checked over the
``documents`` table.

Scale design: every variant is a shuffle-bounded composition —
shingle-explode → hash-agg → equi-join on shingle/band/bucket keys — with
no pairwise O(n²) stage.  Hash functions are md5-based so the DuckDB
oracle computes bit-identical values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .base import register, table

N_SEEDS = 8  # minhash signature length
N_BANDS = 4  # LSH bands (r = 2 rows/band): P(candidate) = 1-(1-j^2)^4
DF_CUT = 50  # dd02: drop shingles shared by more than this many docs


def _shingles(d: DataFrame) -> DataFrame:
    """Distinct word-3-gram shingles per doc (JVM higher-order functions)."""
    ws = F.split(F.trim(F.col("text")), r"\s+")
    idx = F.when(F.size(ws) >= 3, F.sequence(F.lit(1), F.size(ws) - 2)).otherwise(
        F.array().cast("array<int>")
    )
    sh = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", F.element_at(ws, i), F.element_at(ws, i + 1), F.element_at(ws, i + 2)
        ),
    )
    return d.select("doc_id", F.explode(F.array_distinct(sh)).alias("s"))


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


@register(
    "dd02_ngram_jaccard",
    f"""WITH {_SHINGLE_SQL},
       shf AS (SELECT sh.doc_id, sh.s FROM sh
               JOIN (SELECT s FROM sh GROUP BY s
                     HAVING count(*) <= {DF_CUT}) keep USING (s)),
       sz AS (SELECT doc_id, count(*) AS n FROM shf GROUP BY doc_id),
       inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
                 FROM shf a JOIN shf b ON a.s = b.s AND a.doc_id < b.doc_id
                 GROUP BY 1, 2)
       SELECT doc_a, doc_b,
              ROUND(c / (x.n + y.n - c), 4) AS jaccard
       FROM inter JOIN sz x ON x.doc_id = doc_a JOIN sz y ON y.doc_id = doc_b
       WHERE c / (x.n + y.n - c) >= 0.5""",
)
def dd02(spark, sf):
    """n-gram Jaccard near-dup: distinct word-3-gram shingles, candidate
    pairs via shingle equi-join, J = |∩|/|∪| >= 0.5 over the kept-shingle
    universe.  The join shuffles on the shingle key, so cost is Σ df(s)²
    over shared shingles — a stop-shingle shared by k docs alone yields
    k² join rows, which detonates at corpus scale.  The document-frequency
    cut drops shingles with df > DF_CUT *before* the join (both numerator
    and denominator use the filtered universe, so Jaccard stays a
    well-defined estimator and the oracle mirrors it exactly); cost becomes
    Σ_{{df(s)<=K}} df(s)² <= K · |shingles|, linear in corpus size.  The
    MinHash variant below is still the true 100 TB path."""
    sh = _shingles(table(spark, sf, "documents"))
    keep = sh.groupBy("s").agg(F.count(F.lit(1)).alias("_df")).filter(
        F.col("_df") <= DF_CUT
    ).select("s")
    sh = sh.join(keep, "s")
    sz = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
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
    sh = _shingles(table(spark, sf, "documents"))
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


def _simhash_sql() -> str:
    return """WITH w AS (SELECT doc_id, unnest(string_split(trim(text), ' ')) AS wd
                FROM documents),
       bits AS (SELECT doc_id, i,
                       sum(CASE WHEN substr(md5(wd), i + 1, 1) >= '8'
                                THEN 1 ELSE -1 END) AS bal
                FROM w, (SELECT unnest(range(0, 16)) AS i)
                GROUP BY doc_id, i),
       sig AS (SELECT doc_id,
                      CAST(sum(CASE WHEN bal > 0 THEN 1 << i ELSE 0 END) AS BIGINT)
                        AS simhash
               FROM bits GROUP BY doc_id)
       SELECT doc_id, simhash,
              CAST(count(*) OVER (PARTITION BY simhash) AS BIGINT) AS bucket_size
       FROM sig"""


@register("dd04_simhash", _simhash_sql())
def dd04(spark, sf):
    """SimHash near-dup signature: 16-bit md5-nibble hyperplane vote over
    the word multiset; identical-signature bucket size surfaces dup
    clusters.  Banded hamming-distance search joins on signature bytes
    (pigeonhole) instead of all pairs — see tests for the pair search."""
    from pyspark.sql import Window

    d = table(spark, sf, "documents")
    w = d.select("doc_id", F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("wd"))
    bits = (
        w.select("doc_id", "wd", F.explode(F.sequence(F.lit(0), F.lit(15))).alias("i"))
        .groupBy("doc_id", "i")
        .agg(
            F.sum(
                F.when(F.substring(F.md5("wd"), F.col("i") + 1, 1) >= "8", 1).otherwise(-1)
            ).alias("bal")
        )
    )
    sig = bits.groupBy("doc_id").agg(
        F.sum(
            F.when(F.col("bal") > 0, F.expr("shiftleft(1, i)")).otherwise(0)
        )
        .cast("long")
        .alias("simhash")
    )
    return sig.select(
        "doc_id",
        "simhash",
        F.count(F.lit(1)).over(Window.partitionBy("simhash")).alias("bucket_size"),
    )
