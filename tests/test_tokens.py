"""C8 token kernels: JVM expressions and Arrow-side validation, int32
pinned end-to-end (SURVEY.md §7 hard part #4)."""

import numpy as np
from pyspark.sql import functions as F, types as T

from cfe_39_spark.functions.tokens import (
    n_tok_expr,
    token_fingerprint,
    token_sum_expr,
    tokens_valid_expr,
    validate_tokens_arrow,
)

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("tokens", T.ArrayType(T.IntegerType(), True), True),
    ]
)


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_jvm_kernels(spark):
    df = _df(spark, [("a", [1, 2, 3]), ("b", None), ("c", [])])
    out = df.select(
        n_tok_expr().alias("n"),
        tokens_valid_expr().alias("v"),
        token_sum_expr().alias("s"),
    ).collect()
    assert [(r["n"], r["v"], r["s"]) for r in out] == [
        (3, True, 6),
        (None, True, None),
        (0, True, 0),
    ]


def test_tokens_valid_flags_out_of_vocab(spark):
    df = _df(spark, [("a", [1, 99999999]), ("b", [-1])])
    vals = [r[0] for r in df.select(tokens_valid_expr(vocab_size=50257)).collect()]
    assert vals == [False, False]


def test_validate_tokens_arrow_clamps_and_pins_int32(spark):
    df = _df(spark, [("a", [1, 2, 3]), ("b", [60000, -7]), ("c", None)])
    out = validate_tokens_arrow(df, vocab_size=50257)
    assert out.schema["tokens"].dataType.simpleString() == "array<int>"
    rows = {r["doc_id"]: r["tokens"] for r in out.collect()}
    assert rows["a"] == [1, 2, 3]  # valid batch passes through untouched
    assert all(0 <= t < 50257 for t in rows["b"])  # clamped via modulo
    assert rows["b"][0] == 60000 % 50257
    assert rows["c"] is None  # null arrays preserved


def test_token_fingerprint_is_order_sensitive(spark):
    df = _df(spark, [("a", [1, 2, 3]), ("b", [3, 2, 1]), ("c", [1, 2, 3])])
    fps = [r[0] for r in df.select(token_fingerprint(F.col("tokens"))).collect()]
    assert fps[0] == fps[2]
    assert fps[0] != fps[1]


def test_rolling_fp_deterministic_and_vectorized(spark):
    """U1 scalar pandas UDF (mm02's rolling-hash fingerprint): identical
    text → identical hash, different text → different hash, None → None;
    and re-running the plan yields bit-identical values (no RNG, no
    per-run state)."""
    from pyspark.sql import types as TT

    from cfe_39_spark.queries.textops import _rolling_fp

    df = spark.createDataFrame(
        [("a", "hello world"), ("b", "hello world"), ("c", "other"), ("d", None)],
        TT.StructType(
            [
                TT.StructField("doc_id", TT.StringType()),
                TT.StructField("text", TT.StringType()),
            ]
        ),
    )
    out = df.select("doc_id", _rolling_fp(F.col("text")).alias("fp"))
    got1 = {r["doc_id"]: r["fp"] for r in out.collect()}
    got2 = {r["doc_id"]: r["fp"] for r in out.collect()}
    assert got1 == got2
    assert got1["a"] == got1["b"]
    assert got1["a"] != got1["c"]
    assert got1["d"] is None


def test_int32_round_trip_through_arrow(spark):
    vals = [0, 1, 50256]  # in-vocab: fast path, bit-for-bit passthrough
    df = _df(spark, [("a", vals)])
    out = validate_tokens_arrow(df).toPandas()
    arr = np.asarray(out["tokens"][0])
    assert arr.dtype == np.int32
    assert arr.tolist() == vals
