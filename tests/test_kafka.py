"""Kafka source adapter: wire-format decode is bit-for-bit equivalent to
the file-source path, and corrupt payloads go to the DLQ instead of
vanishing.  (The broker connection itself needs the connector jar —
SURVEY §0.4 — but every line of transform logic is exercised here.)"""

import glob

from pyspark.sql import functions as F

from cfe_39_spark.fixtures import GenConfig, write_fixture
from cfe_39_spark.operators.cdc import apply_batch
from cfe_39_spark.sources.kafka import parse_kafka_records, split_poison
from cfe_39_spark.sources.table import SequenceTable

from .util import assert_state_equal


def to_wire(events_df):
    """Encode canonical events as Kafka wire rows (what a producer does)."""
    env = F.to_json(
        F.struct(
            "tokens",
            "n_tok",
            "source",
            "op",
            "epoch",
            "schema_version",
            F.unix_micros(F.col("event_time")).alias("event_time_us"),
        )
    )
    return events_df.select(
        F.col("doc_id").cast("binary").alias("key"),
        env.cast("binary").alias("value"),
        F.lit("changes").alias("topic"),
        F.col("src_partition").cast("int").alias("partition"),
        F.col("offset").cast("long").alias("offset"),
        F.current_timestamp().alias("timestamp"),
    )


def test_kafka_decode_matches_file_source(spark, tmp_path):
    fx = write_fixture(
        str(tmp_path / "fx"),
        GenConfig(n_docs_initial=20, n_events=120, n_segments=3,
                  dup_rate=0.1, seed=113),
    )
    init = spark.read.parquet(str(tmp_path / "fx" / "initial.parquet"))
    t = SequenceTable.create(spark, str(tmp_path / "t"), init, n_buckets=4)
    for i, seg in enumerate(sorted(glob.glob(str(tmp_path / "fx" / "segments" / "*.parquet")))):
        wire = to_wire(spark.read.parquet(seg))
        events = parse_kafka_records(wire)
        clean, poison = split_poison(events)
        assert poison.count() == 0
        apply_batch(spark, t, clean, batch_id=i, compact_threshold=None)
    assert_state_equal(t.read(spark), fx["expected"])


def test_kafka_decode_roundtrip_columns(spark, tmp_path):
    """Decoded events carry exactly the canonical columns with the right
    types — incl. tokens as array<int32> (the bit-for-bit invariant)."""
    fx = write_fixture(
        str(tmp_path / "fx"),
        GenConfig(n_docs_initial=5, n_events=20, n_segments=1, seed=127),
    )
    seg = sorted(glob.glob(str(tmp_path / "fx" / "segments" / "*.parquet")))[0]
    src = spark.read.parquet(seg)
    clean, _ = split_poison(parse_kafka_records(to_wire(src)))
    got = {f.name: f.dataType.simpleString() for f in clean.schema.fields}
    assert got["tokens"] == "array<int>"
    assert got["offset"] == "bigint" and got["event_time"] == "timestamp"
    a = src.select("doc_id", "offset", "tokens", "event_time").orderBy("doc_id", "offset").collect()
    b = clean.select("doc_id", "offset", "tokens", "event_time").orderBy("doc_id", "offset").collect()
    assert a == b


def test_kafka_poison_rows_quarantined_not_dropped(spark, tmp_path):
    fx = write_fixture(
        str(tmp_path / "fx"),
        GenConfig(n_docs_initial=10, n_events=40, n_segments=1, seed=131),
    )
    seg = sorted(glob.glob(str(tmp_path / "fx" / "segments" / "*.parquet")))[0]
    wire = to_wire(spark.read.parquet(seg))
    bad = spark.createDataFrame(
        [("doc-bad", b"{not json", "changes", 0, 10**6, None)],
        "key string, value binary, topic string, partition int, offset long, timestamp timestamp",
    ).select(
        F.col("key").cast("binary").alias("key"), "value", "topic",
        "partition", "offset", F.current_timestamp().alias("timestamp"),
    )
    events = parse_kafka_records(wire.unionByName(bad))
    clean, poison = split_poison(events)
    assert clean.count() == wire.count()
    p = poison.collect()
    assert len(p) == 1
    assert p[0]["doc_id"] == "doc-bad" and p[0]["offset"] == 10**6
    assert bytes(p[0]["_poison_payload"]) == b"{not json"
