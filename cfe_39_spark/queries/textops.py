"""Text-analysis operators for the training-data pipeline (task brief:
language-ID, quality scoring, token counting, document fingerprinting),
each oracle-checked over the ``documents`` table.

All hot-path expressions are JVM built-ins (split/regexp/md5/windows);
the one pandas-UDF variant (rolling-hash fingerprint) demonstrates the
Arrow path and — since round 5 — is fully oracled too, via mm02's exact
UHUGEINT reproduction of the uint64 polynomial hash in DuckDB.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Window, functions as F, types as T
from pyspark.sql.functions import pandas_udf

from .base import register, table

# marker words per language for the n-gram/keyword heuristic classifier —
# deterministic on the synthetic corpus (the operator shape is what matters;
# swap real stopword lists in production)
LANG_MARKERS = {"de": "row", "en": "table", "es": "scan", "fr": "join", "zh": "hash"}


# BPE-style pre-tokenizer pieces: a letter run, a digit run, or a
# punctuation run, each optionally absorbing one leading space (the GPT-2
# pretokenizer shape, minus contraction special-cases and Unicode classes
# so Java regex and RE2 count identically)
_BPE_PAT = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"


@register(
    "tx01_token_count",
    f"""SELECT doc_id,
              CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS INT) AS n_words,
              CAST(n_chars AS BIGINT) AS n_chars,
              ROUND(length(replace(text, ' ', '')) /
                    len(regexp_split_to_array(trim(text), '\\s+')), 4) AS avg_word_len,
              CAST(len(regexp_extract_all(text, '{_BPE_PAT}')) AS INT) AS n_bpe,
              ROUND(len(regexp_extract_all(text, '{_BPE_PAT}'))
                    / len(regexp_split_to_array(trim(text), '\\s+')), 4) AS fertility
       FROM documents""",
)
def tx01(spark, sf):
    """Token counting, both halves of the brief ('whitespace + a BPE-ish
    regex'): the cheap whitespace pass every corpus pipeline runs first,
    plus pre-tokenizer pieces under a GPT-2-shaped regex with fertility
    (pieces per whitespace word) — the number a pipeline uses to budget
    training tokens before running the real tokenizer.  One JVM
    ``regexp_count`` per row, no UDF, trivially data-parallel at 100 TB."""
    d = table(spark, sf, "documents")
    words = F.split(F.trim(F.col("text")), r"\s+")
    nw = F.size(words)
    nb = F.regexp_count(F.col("text"), F.lit(_BPE_PAT))
    return d.select(
        "doc_id",
        nw.alias("n_words"),
        F.col("n_chars").cast("long").alias("n_chars"),
        F.round(F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))) / nw, 4).alias(
            "avg_word_len"
        ),
        nb.alias("n_bpe"),
        F.round(nb / nw, 4).alias("fertility"),
    )


def _langid_sql() -> str:
    counts = ",\n".join(
        f"len(regexp_extract_all(text, '\\b{w}\\b')) AS c_{lg}"
        for lg, w in sorted(LANG_MARKERS.items())
    )
    unions = "\n UNION ALL ".join(
        f"SELECT doc_id, lang, '{lg}' AS cand, c_{lg} AS cnt FROM c"
        for lg in sorted(LANG_MARKERS)
    )
    return f"""WITH c AS (SELECT doc_id, lang, {counts} FROM documents),
       u AS ({unions})
       SELECT doc_id, cand AS pred_lang, (cand = lang) AS is_match FROM u
       QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, cand) = 1"""


_TX02_SQL = f"""WITH q AS (
         SELECT doc_id,
                len(regexp_split_to_array(trim(text), '\\s+')) AS n_words,
                len(regexp_extract_all(text, '[.!?,;]')) AS n_punct,
                len(regexp_extract_all(text, '\\ba\\b')) AS n_stop,
                n_chars,
                md5(lower(trim(text))) AS fp,
                md5(substr(text, 1, 40)) AS prefix_fp
         FROM documents),
       l AS ({_langid_sql()})
       SELECT q.doc_id,
              CAST(n_words AS INT) AS n_words,
              ROUND(n_punct / n_chars, 6) AS punct_ratio,
              ROUND(n_stop / n_words, 6) AS stopword_ratio,
              ROUND(least(n_words / 100.0, 1.0) * 0.6
                    + least(n_stop / n_words * 5, 1.0) * 0.4, 6) AS quality,
              l.pred_lang, l.is_match,
              q.fp, q.prefix_fp,
              CAST(count(*) OVER (PARTITION BY q.prefix_fp) AS BIGINT)
                AS n_same_prefix
       FROM q JOIN l ON l.doc_id = q.doc_id"""


@register("tx02_text_analysis", _TX02_SQL)
def tx02(spark, sf):
    """The brief's per-document text-analysis battery in one pass (round
    2's tx02/tx03/tx04):

    * quality scoring — length, punctuation density, stopword ratio
      folded into one [0,1] score;
    * language-ID by keyword-profile argmax with deterministic tiebreak,
      computed as a JVM ``array_min`` over (−count, lang) structs — a
      pure per-row expression, which drops round 2's explode + window
      shuffle entirely;
    * document fingerprinting — full-text and prefix (canopy) md5
      digests; the prefix window count surfaces duplicate clusters.

    One window (count over prefix_fp) is the only shuffle in the plan."""
    d = table(spark, sf, "documents")
    words = F.split(F.trim(F.col("text")), r"\s+")
    nw = F.size(words)
    np_ = F.regexp_count(F.col("text"), F.lit(r"[.!?,;]"))
    ns = F.regexp_count(F.col("text"), F.lit(r"\ba\b"))
    # argmax via array_min on (negated count, lang): field-by-field struct
    # compare == the oracle's ORDER BY cnt DESC, cand ASC
    cands = F.array(
        *[
            F.struct(
                (-F.regexp_count(F.col("text"), F.lit(rf"\b{w}\b"))).alias("negcnt"),
                F.lit(lg).alias("cand"),
            )
            for lg, w in sorted(LANG_MARKERS.items())
        ]
    )
    pred = F.array_min(cands).getField("cand")
    pfp = F.md5(F.substring("text", 1, 40))
    return d.select(
        "doc_id",
        nw.alias("n_words"),
        F.round(np_ / F.col("n_chars"), 6).alias("punct_ratio"),
        F.round(ns / nw, 6).alias("stopword_ratio"),
        F.round(
            F.least(nw / F.lit(100.0), F.lit(1.0)) * 0.6
            + F.least(ns / nw * 5, F.lit(1.0)) * 0.4,
            6,
        ).alias("quality"),
        pred.alias("pred_lang"),
        (pred == F.col("lang")).alias("is_match"),
        F.md5(F.lower(F.trim(F.col("text")))).alias("fp"),
        pfp.alias("prefix_fp"),
        F.count(F.lit(1)).over(Window.partitionBy(pfp)).alias("n_same_prefix"),
    )


@pandas_udf(T.LongType())
def _rolling_fp(text: pd.Series) -> pd.Series:
    """Vectorized polynomial rolling hash over UTF-8 bytes (Arrow-batched;
    numpy per batch, no per-row Python arithmetic)."""
    P = np.uint64(1099511628211)

    def _h(s):
        if s is None:
            return None
        b = np.frombuffer(s.encode(), dtype=np.uint8).astype(np.uint64)
        n = len(b)
        if n == 0:
            return 0
        with np.errstate(over="ignore"):
            pw = np.ones(n, dtype=np.uint64)
            pw[1:] = P
            pw = np.cumprod(pw)  # uint64 wrap-around is the hash ring
            return int((b * pw).sum(dtype=np.uint64).view(np.int64))

    return text.map(_h).astype("Int64")


# ``_rolling_fp`` is registered through mm02_decode_features (U1 scalar
# pandas UDF surface; round 2 exposed it standalone as tx05) and unit-tested
# in tests/test_tokens.py.


@register(
    "tx06_sequence_packing",
    """WITH t AS (
         SELECT doc_id, source, doc_id % 8 AS shard,
                len(regexp_split_to_array(trim(text), '\\s+')) AS n_tok
         FROM documents),
       o AS (
         SELECT doc_id, source, shard, n_tok,
                SUM(n_tok) OVER (PARTITION BY source, shard ORDER BY doc_id
                  ROWS UNBOUNDED PRECEDING) - n_tok AS start_off
         FROM t)
       SELECT source, shard,
              CAST(FLOOR(start_off / 512.0) AS BIGINT) AS seq_id,
              CAST(count(*) AS BIGINT) AS n_docs,
              CAST(sum(n_tok) AS BIGINT) AS sum_tok,
              min(doc_id) AS first_doc,
              max(doc_id) AS last_doc
       FROM o GROUP BY 1, 2, 3""",
)
def tx06(spark, sf):
    """Training-sequence packing (GPT-style stream chunking): concatenate
    each (source, shard) document stream in doc_id order and cut it into
    L=512-token sequences; a doc belongs to the chunk its first token
    lands in.  Expressed as one running-sum window + one hash aggregation
    — no UDF, no iteration.

    Scale shape: the running sum is inherently sequential PER STREAM, so
    the streams must outnumber the cluster — sharding by ``doc_id % 8``
    here stands in for the production layout (hash-sharded streams, one
    window partition each, hundreds per executor at 100 TB).  Packing
    quality is the same as any next-fit scheme; pipelines that need
    tighter fill switch to offline first-fit-decreasing per shard, which
    is the applyInPandas escape hatch (U2), not a different plan shape."""
    L = 512
    d = table(spark, sf, "documents")
    nw = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    t = d.select(
        "doc_id",
        "source",
        (F.col("doc_id") % 8).alias("shard"),
        nw.alias("n_tok"),
    )
    w = Window.partitionBy("source", "shard").orderBy("doc_id")
    o = t.withColumn("start_off", F.sum("n_tok").over(w) - F.col("n_tok"))
    return (
        o.withColumn("seq_id", F.floor(F.col("start_off") / L))
        .groupBy("source", "shard", "seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("sum_tok"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


@register(
    "tx08_vocabulary",
    """WITH w AS (
         SELECT lower(unnest(regexp_split_to_array(trim(text), '\\s+'))) AS word,
                doc_id
         FROM documents)
       SELECT word,
              CAST(count(*) AS BIGINT) AS tf,
              CAST(count(DISTINCT doc_id) AS BIGINT) AS df
       FROM w GROUP BY word
       ORDER BY tf DESC, word LIMIT 100""",
)
def tx08(spark, sf):
    """Vocabulary builder: corpus-wide term and document frequency, top-100
    by tf — the tokenizer-training / stopword-mining pass.  Word counts are
    Zipf-skewed by nature, and the plan absorbs that structurally: explode
    → partial HashAggregate collapses each hot word to one row per map
    task before the shuffle, so the reducer holding 'the' receives
    n_tasks rows, not n_occurrences; the top-100 is TakeOrderedAndProject
    (no global sort).  The exact doc-frequency forces Catalyst's two-level
    distinct rewrite (dedup on (word, doc_id) first, partial-combined the
    same way); pipelines that can tolerate ±2% swap it for
    approx_count_distinct and save that level."""
    d = table(spark, sf, "documents")
    w = d.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("word"),
    )
    return (
        w.groupBy("word")
        .agg(
            F.count(F.lit(1)).alias("tf"),
            F.countDistinct("doc_id").alias("df"),
        )
        .orderBy(F.col("tf").desc(), "word")
        .limit(100)
    )


# tx09 per-source sampling rates cycle 25/50/75/100% by source index; the
# accept test is a STRING compare of the first 4 md5 hex chars against the
# rate's 16-bit threshold ('g' > 'f' accepts everything for rate 1.0) —
# exact, engine-agnostic, no RNG
_MIX_THRESHOLDS = {0: "'4000'", 1: "'8000'", 2: "'c000'", 3: "'g'"}
_MIX_RATE = {0: 0.25, 1: 0.5, 2: 0.75, 3: 1.0}


def _mix_threshold_case(idx_expr: str) -> str:
    arms = " ".join(
        f"WHEN {k} THEN {v}" for k, v in _MIX_THRESHOLDS.items()
    )
    return f"CASE ({idx_expr}) % 4 {arms} END"


@register(
    "tx09_corpus_mix",
    f"""WITH t AS (
         SELECT source,
                CAST(substr(source, 4) AS INT) AS idx,
                substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS h,
                n_chars
         FROM documents)
       SELECT source,
              ROUND((idx % 4 + 1) / 4.0, 2) AS rate,
              CAST(count(*) AS BIGINT) AS n_docs,
              CAST(sum(CASE WHEN h < {_mix_threshold_case("idx")}
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
              CAST(sum(CASE WHEN h < {_mix_threshold_case("idx")}
                            THEN n_chars ELSE 0 END) AS BIGINT) AS chars_sampled
       FROM t GROUP BY source, idx""",
)
def tx09(spark, sf):
    """Deterministic corpus-mix sampling: each source gets a mixture rate
    (cycling 25/50/75/100 % off its index — stand-in for the per-source
    weights a data-mixing recipe assigns) and a document is kept iff the
    first 16 bits of md5(doc_id) fall under the rate threshold.  Hash
    gating, not rand(): the sample is reproducible across runs, engines
    and cluster sizes, composes with incremental ingest (a re-fed doc
    makes the same decision), and needs no per-row state.  Pure map +
    one aggregation; at 100 TB the filter rides the scan."""
    d = table(spark, sf, "documents")
    idx = F.substring(F.col("source"), 4, 10).cast("int")
    h = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4)
    thr = (
        F.when(idx % 4 == 0, "4000")
        .when(idx % 4 == 1, "8000")
        .when(idx % 4 == 2, "c000")
        .otherwise("g")
    )
    keep = h < thr
    return (
        d.select("source", idx.alias("idx"), F.col("n_chars"), keep.alias("keep"))
        .groupBy("source", "idx")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("keep"), 1).otherwise(0)).alias("n_sampled"),
            F.sum(F.when(F.col("keep"), F.col("n_chars")).otherwise(0)).alias(
                "chars_sampled"
            ),
        )
        .select(
            "source",
            F.round((F.col("idx") % 4 + 1) / 4.0, 2).alias("rate"),
            "n_docs",
            "n_sampled",
            "chars_sampled",
        )
    )
