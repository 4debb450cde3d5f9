"""Streaming-only operator surface (SURVEY.md §2.4 T1/T2/T5): watermarked
event-time window aggregation and stateful streaming dedup over the file
source, bounded with availableNow."""

import glob

from pyspark.sql import functions as F

from cfe_39_spark.fixtures import GenConfig, write_fixture
from cfe_39_spark.streaming.ingest import infer_log_schema


def _stream(spark, tmp_path, seed, dup_rate=0.0):
    cfg = GenConfig(n_docs_initial=10, n_events=80, n_segments=2, seed=seed,
                    dup_rate=dup_rate)
    write_fixture(str(tmp_path / "fx"), cfg)
    seg_dir = str(tmp_path / "fx" / "segments")
    schema = infer_log_schema(spark, seg_dir)
    return spark.readStream.schema(schema).parquet(seg_dir), seg_dir


def test_watermarked_window_agg(spark, tmp_path):
    """T1+T2: tumbling window counts under a watermark; append mode emits
    only windows the watermark has closed, and every emitted window must
    agree with the batch computation."""
    src, seg_dir = _stream(spark, tmp_path, seed=91)
    # group by the window() column itself — projecting .start before the
    # agg would strip the event-time attribute and lose the watermark
    agg = (
        src.withWatermark("event_time", "30 seconds")
        .groupBy(F.window("event_time", "1 minute"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("window.start").alias("w"), "n")
    )
    q = (
        agg.writeStream.format("memory").queryName("wm_windows")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = {r["w"]: r["n"] for r in spark.sql("SELECT * FROM wm_windows").collect()}
    assert got, "watermark should have closed at least one window"
    batch = {
        r["w"]: r["n"]
        for r in spark.read.parquet(seg_dir)
        .groupBy(F.window("event_time", "1 minute").getField("start").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for w, n in got.items():
        assert batch[w] == n, f"window {w}: stream {n} != batch {batch[w]}"


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """T5: dropDuplicatesWithinWatermark on (doc_id, offset) collapses
    duplicate deliveries across micro-batches (the Spark-state alternative
    to the engine's table-state idempotency filter)."""
    src, seg_dir = _stream(spark, tmp_path, seed=93, dup_rate=0.4)
    dedup = src.withWatermark("event_time", "10 minutes").dropDuplicatesWithinWatermark(
        ["doc_id", "offset"]
    )
    q = (
        dedup.writeStream.format("memory").queryName("wm_dedup")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    n_stream = spark.sql("SELECT count(*) c FROM wm_dedup").first()["c"]
    n_distinct = (
        spark.read.parquet(seg_dir).select("doc_id", "offset").distinct().count()
    )
    n_raw = spark.read.parquet(seg_dir).count()
    assert n_raw > n_distinct  # fixture really contains duplicates
    assert n_stream == n_distinct


def test_stateful_tracker_state_crosses_batches(spark, tmp_path):
    """T6: applyInPandasWithState folds per-key state across micro-batches.
    Slice the events log into 4 single-file triggers; keys seen in several
    batches must emit several snapshots (proof the GroupState persisted),
    and the final snapshot per key must equal the batch GROUP BY."""
    from pyspark.sql import Window

    from cfe_39_spark.streaming.stateful import running_key_stats

    e = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    log_dir = str(tmp_path / "log")
    e.repartitionByRange(4, "event_id").write.parquet(log_dir)
    src = (
        spark.readStream.schema(e.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(log_dir)
    )
    q = (
        running_key_stats(src)
        .writeStream.format("memory").queryName("t6_unit")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()

    emitted = spark.table("t6_unit")
    n_keys = e.select("user_id").distinct().count()
    assert emitted.count() > n_keys, "no key emitted twice => state never crossed a batch"

    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    final = (
        emitted.withColumn("rn", F.row_number().over(w)).filter("rn = 1")
        .select("user_id", "max_offset", "n_events", "first_ts", "last_ts")
    )
    batch = e.groupBy("user_id").agg(
        F.max("event_id").alias("max_offset"),
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
    )
    assert final.exceptAll(batch).count() == 0
    assert batch.exceptAll(final).count() == 0


def test_tws_tracker_matches_groupstate_form(spark, tmp_path):
    """T6 successor API: the transformWithStateInPandas form of the
    per-key tracker (RocksDB state store) emits final snapshots identical
    to the applyInPandasWithState form and to a plain batch GROUP BY —
    same fold, two state backends.

    Skipped where the transformWithState worker protocol's python-side
    dependency (google.protobuf) is missing — this sandbox ships pyspark
    without it (no pip allowed), same class of gap as the absent Kafka
    jar (SURVEY.md §0.4); the operator code itself is import-clean."""
    import pytest

    pytest.importorskip(
        "google.protobuf.descriptor",
        reason="transformWithStateInPandas state protocol needs protobuf",
    )
    from pyspark.sql import Window

    from cfe_39_spark.streaming.stateful import (
        ROCKSDB_PROVIDER,
        running_key_stats_tws,
    )

    key = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(key, None)
    spark.conf.set(key, ROCKSDB_PROVIDER)
    try:
        e = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        log_dir = str(tmp_path / "log")
        e.repartitionByRange(4, "event_id").write.parquet(log_dir)
        src = (
            spark.readStream.schema(e.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(log_dir)
        )
        q = (
            running_key_stats_tws(src)
            .writeStream.format("memory").queryName("t6_tws")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt-tws"))
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()
        emitted = spark.table("t6_tws")
        n_keys = e.select("user_id").distinct().count()
        assert emitted.count() > n_keys, "state never crossed a batch"
        w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
        final = (
            emitted.withColumn("rn", F.row_number().over(w)).filter("rn = 1")
            .select("user_id", "max_offset", "n_events", "first_ts", "last_ts")
        )
        batch = e.groupBy("user_id").agg(
            F.max("event_id").alias("max_offset"),
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
        assert final.exceptAll(batch).count() == 0
        assert batch.exceptAll(final).count() == 0
    finally:
        if old is not None:
            spark.conf.set(key, old)
        else:
            spark.conf.unset(key)
