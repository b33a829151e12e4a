"""§2.9 incremental/streaming sinks: NOT-EXISTS batch increments
(assorted_queries.py:241-252) and the Trigger.AvailableNow twin, plus the
mutable-sink write path (upsert) round-tripping through parquet."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from neotree_data_pipeline_kedro_spark.streaming.incremental import (
    incremental_sink,
    run_available_now,
)


def test_incremental_sink_appends_only_new_keys(spark, tmp_path):
    sink = str(tmp_path / "sink")
    b1 = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"])
    assert incremental_sink(spark, b1, sink, ["id"]) == 2
    # second batch: one dup key, one fresh
    b2 = spark.createDataFrame([(2, "B"), (3, "c")], ["id", "v"])
    assert incremental_sink(spark, b2, sink, ["id"]) == 1
    rows = {r.id: r.v for r in spark.read.parquet(sink).collect()}
    assert rows == {1: "a", 2: "b", 3: "c"}  # first write wins (NOT EXISTS)
    # idempotent re-run: nothing appended
    assert incremental_sink(spark, b2, sink, ["id"]) == 0


def test_run_available_now_checkpointed(spark, tmp_path):
    src = str(tmp_path / "src")
    sink = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("v", T.StringType())]
    )
    spark.createDataFrame([(1, "a"), (2, "b")], schema).write.parquet(src)

    run_available_now(
        spark, src, schema,
        lambda df: df.withColumn("v", F.upper("v")),
        sink, ckpt,
    )
    assert {r.v for r in spark.read.parquet(sink).collect()} == {"A", "B"}

    # new file arrives; re-run processes ONLY it (checkpoint offsets)
    spark.createDataFrame([(3, "c")], schema).write.mode("append").parquet(src)
    run_available_now(
        spark, src, schema,
        lambda df: df.withColumn("v", F.upper("v")),
        sink, ckpt,
    )
    out = {r.id: r.v for r in spark.read.parquet(sink).collect()}
    assert out == {1: "A", 2: "B", 3: "C"}
