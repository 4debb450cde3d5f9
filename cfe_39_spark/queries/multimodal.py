"""Multimodal-column plumbing (task brief: image/audio/video as opaque
binary + typed metadata; decode/feature steps stubbed, Spark-side
plumbing real).

The sandbox ships no image/audio libraries, so the decode kernel is a
deterministic stub behind the real interface: binary column in, typed
feature struct out, Arrow-batched via ``mapInPandas``.  Schema,
partitioning, UDF signature and batch shape are production-real; only the
pixel math is fake (documented NotImplementedError escape hatch).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import functions as F, types as T

from .base import register, table


@register(
    "mm01_binary_meta",
    """SELECT doc_id,
              CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
              substr(hex(encode(text)), 1, 8) AS header_hex,
              md5(text) AS content_md5,
              CAST(n_chars % 50 + 8 AS INT) AS n_frames,
              CAST(len(range(0, n_chars % 50 + 8, 5)) AS INT) AS n_sampled,
              CAST(list_max(range(0, n_chars % 50 + 8, 5)) AS INT) AS last_frame
       FROM documents""",
)
def mm01(spark, sf):
    """Opaque-binary metadata pass (byte length, magic-header hex, content
    digest — the checks a media-ingest pipeline runs before decode) plus
    the video frame-sampling plan (round 2's mm03): an every-5th-frame
    index set computed as a JVM sequence; the decode of each sampled
    frame would go through mm02's stub."""
    d = table(spark, sf, "documents")
    payload = F.encode(F.col("text"), "UTF-8")
    nf = (F.col("n_chars") % 50 + 8).cast("int")
    frames = F.sequence(F.lit(0), nf - 1, F.lit(5))
    return d.select(
        "doc_id",
        F.length(payload).cast("long").alias("n_bytes"),
        F.substring(F.hex(payload), 1, 8).alias("header_hex"),
        F.md5(F.col("text")).alias("content_md5"),
        nf.alias("n_frames"),
        F.size(frames).alias("n_sampled"),
        F.array_max(frames).alias("last_frame"),
    )


MM_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("mean_luma", T.DoubleType()),
        T.StructField("rolling_fp", T.LongType()),
    ]
)


def _decode_stub(payload: bytes) -> tuple[int, int, int, float]:
    """STUB decoder: real pipelines call PIL/ffmpeg here.

    Deterministic fake derived from the payload digest so tests are stable.
    Raise NotImplementedError for codecs the stub can't fake.
    """
    if payload is None:
        raise NotImplementedError("null payload: no codec")
    h = hashlib.md5(payload).digest()
    w = 64 + h[0] % 192
    ht = 64 + h[1] % 192
    return w, ht, 3, round(h[2] / 255.0, 6)


def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: one Arrow batch in, one feature frame out.
    Column-at-a-time pandas ops; the per-element decode call is the
    unavoidable per-item codec boundary (as with any real image decoder)."""
    for pdf in batches:
        feats = pdf["payload"].map(_decode_stub)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "n_bytes": pdf["payload"].map(len).astype("int64"),
                "width": feats.map(lambda f: f[0]).astype("int32"),
                "height": feats.map(lambda f: f[1]).astype("int32"),
                "channels": feats.map(lambda f: f[2]).astype("int32"),
                "mean_luma": feats.map(lambda f: f[3]).astype("float64"),
                # passthrough column (computed upstream by the U1 scalar
                # pandas UDF); absent in the unit-test fixtures
                "rolling_fp": (
                    pdf["rolling_fp"]
                    if "rolling_fp" in pdf.columns
                    else pd.Series([0] * len(pdf))
                ).astype("int64"),
            }
        )


# Every mm02 output column is deterministic byte math over the document
# text, so the pandas kernels ARE oracle-checkable in pure SQL (round-4
# verdict item 4):
# * the decode stub's fake features derive from md5(payload) digest bytes
#   — hex-digit arithmetic recovers them (strpos-based nibble parse);
# * the U1 rolling fingerprint is a polynomial hash over UTF-8 bytes in
#   uint64 wrap-around arithmetic — reproduced exactly with UHUGEINT
#   (uint128) intermediates and explicit mod-2^64 reductions in a
#   list_reduce fold whose accumulator packs (power, hash) as
#   power*2^64 + hash (power = P^i mod 2^64 is never 0: P is odd).
_U64 = "'18446744073709551616'::UHUGEINT"  # 2^64
_FP_P = "'1099511628211'::UHUGEINT"  # the hash base (FNV prime)
_NIBBLES = "0123456789abcdef"


def _hexbyte(src: str, i: int = None, pos: "tuple[str, str]" = None) -> str:
    """SQL for one byte of a lowercase hex string column: a fixed 0-based
    byte index ``i``, or explicit 1-based char-position SQL expressions
    ``pos=(hi_char, lo_char)`` for use inside a lambda."""
    hi, lo = (str(2 * i + 1), str(2 * i + 2)) if pos is None else pos
    return (
        f"((strpos('{_NIBBLES}', substr({src}, {hi}, 1)) - 1) * 16"
        f" + strpos('{_NIBBLES}', substr({src}, {lo}, 1)) - 1)"
    )


_MM02_SQL = f"""WITH b AS (
         SELECT doc_id, text, md5(text) AS mh,
                lower(hex(encode(text))) AS hx,
                octet_length(encode(text)) AS n
         FROM documents)
       SELECT CAST(doc_id AS BIGINT) AS doc_id,
              CAST(n AS BIGINT) AS n_bytes,
              CAST(64 + {_hexbyte('mh', 0)} % 192 AS INT) AS width,
              CAST(64 + {_hexbyte('mh', 1)} % 192 AS INT) AS height,
              CAST(3 AS INT) AS channels,
              ROUND({_hexbyte('mh', 2)} / 255.0, 6) AS mean_luma,
              CASE WHEN text IS NULL THEN NULL ELSE CAST((
                SELECT CASE WHEN h >= '9223372036854775808'::UHUGEINT
                            THEN h::HUGEINT - {_U64}::HUGEINT
                            ELSE h::HUGEINT END
                FROM (SELECT list_reduce(
                        list_prepend({_U64},
                          list_transform(range(1, n + 1), i ->
                            CAST({_hexbyte('hx', pos=('2*i-1', '2*i'))} AS UHUGEINT))),
                        (acc, x) ->
                          ((acc // {_U64}) * {_FP_P} % {_U64}) * {_U64}
                          + ((acc % {_U64}) + x * (acc // {_U64})) % {_U64}
                      ) % {_U64} AS h)
              ) AS BIGINT) END AS rolling_fp
       FROM b"""


@register("mm02_decode_features", _MM02_SQL)
def mm02(spark, sf):
    """The registry's two pandas-kernel surfaces in one query:

    * U3 ``mapInPandas``: binary → feature extraction through the
      production plumbing (Arrow batches, repartitioned so decode
      parallelism is independent of file layout); decode itself is the
      documented stub.
    * U1 scalar ``pandas_udf``: the rolling-hash document fingerprint
      (round 2's tx05 — ``textops._rolling_fp``, vectorized numpy over
      UTF-8 bytes), computed on the text before it is encoded and carried
      through the decode batch untouched.

    Both kernels are deterministic byte math, so since round 5 the
    driver's rows+schema+hash oracle covers them too: the stub features
    are recomputed from md5 digest bytes and the fingerprint from an
    exact uint64 polynomial-hash reproduction in SQL (see _MM02_SQL)."""
    from .textops import _rolling_fp

    d = table(spark, sf, "documents")
    payloads = d.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        _rolling_fp(F.col("text")).alias("rolling_fp"),
    )
    return payloads.repartition(8, "doc_id").mapInPandas(
        decode_batches, MM_FEATURE_SCHEMA
    )
