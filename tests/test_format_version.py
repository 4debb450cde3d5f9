"""Snapshot format_version stamp + reader guard (the Iceberg
format-version role): every descriptor this engine writes carries
format_version=1; a descriptor stamped by a NEWER engine is refused
with an upgrade message instead of misread; pre-stamp descriptors
(no key) read as version 1."""

import json
import os

import pytest
from pyspark.sql import functions as F

from cfe_39_spark.sources.table import FORMAT_VERSION, SequenceTable


def _tiny(spark):
    return (
        spark.range(10)
        .withColumn("doc_id", F.format_string("d%03d", F.col("id")))
        .withColumn("tokens", F.array(F.col("id").cast("int")))
        .withColumn("n_tok", F.lit(1).cast("int"))
        .withColumn("source", F.lit("s"))
        .drop("id")
    )


def test_every_written_snapshot_is_stamped(spark, tmp_path):
    t = SequenceTable.create(spark, str(tmp_path / "t"), _tiny(spark), n_buckets=2)
    t.rebucket(spark, 4)  # a data commit
    t.add_column("extra", __import__("pyspark").sql.types.StringType())  # a DDL commit
    t.rollback(t.find_batch("__create__"))  # a rollback commit
    for f in os.listdir(t.meta_dir):
        if f.startswith("snap-"):
            d = json.load(open(os.path.join(t.meta_dir, f)))
            assert d["format_version"] == FORMAT_VERSION, f


def test_newer_format_refused_with_upgrade_message(spark, tmp_path):
    t = SequenceTable.create(spark, str(tmp_path / "t"), _tiny(spark), n_buckets=2)
    sid = t.latest_snapshot_id()
    p = os.path.join(t.meta_dir, f"snap-{sid:012d}.json")
    d = json.load(open(p))
    d["format_version"] = FORMAT_VERSION + 1
    json.dump(d, open(p, "w"))
    with pytest.raises(ValueError, match="format_version.*upgrade"):
        t.snapshot()


def test_pre_stamp_descriptor_reads_as_v1(spark, tmp_path):
    t = SequenceTable.create(spark, str(tmp_path / "t"), _tiny(spark), n_buckets=2)
    sid = t.latest_snapshot_id()
    p = os.path.join(t.meta_dir, f"snap-{sid:012d}.json")
    d = json.load(open(p))
    del d["format_version"]
    json.dump(d, open(p, "w"))
    assert t.read(spark).count() == 10
