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


@register("mm02_decode_features", None)
def mm02(spark, sf):
    """The registry's two pandas-kernel surfaces in one rows-only query:

    * U3 ``mapInPandas``: binary → feature extraction through the
      production plumbing (Arrow batches, repartitioned so decode
      parallelism is independent of file layout); decode itself is the
      documented stub.
    * U1 scalar ``pandas_udf``: the rolling-hash document fingerprint
      (round 2's tx05 — ``textops._rolling_fp``, vectorized numpy over
      UTF-8 bytes), computed on the text before it is encoded and carried
      through the decode batch untouched.

    Both kernels are engine-private hash/stub math, hence no SQL oracle;
    determinism is covered by unit tests."""
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
