"""Stream-static enrichment join (streaming/joins.enrich_stream_with_dim):
micro-batches join the current static dimension; dim updates between
batches are visible to later batches (the slowly-changing-lookup form)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

import pytest

from neotree_data_pipeline_kedro_spark.streaming.joins import (
    enrich_stream_with_dim,
)

# r13 (VERDICT r12 #2): heavyweight integration tail — excluded from the
# default driver-window run; executed by the builder via `-m slow`.
pytestmark = pytest.mark.slow


def test_stream_static_enrich(spark, tmp_path):
    schema = T.StructType(
        [T.StructField("k", T.LongType()), T.StructField("v", T.StringType())]
    )
    src = tmp_path / "src"
    dimp = str(tmp_path / "dim")
    spark.createDataFrame(
        [(1, "one"), (2, "two"), (3, "three")], "k long, name string"
    ).write.parquet(dimp)
    spark.createDataFrame([(1, "a"), (2, "b"), (9, "x")], schema).coalesce(
        1
    ).write.parquet(str(src / "b0.parquet"))

    out: list = []

    def sink(batch, _):
        out.extend(
            (r.k, r.v, r.name)
            for r in batch.select("k", "v", "name").collect()
        )

    stream = spark.readStream.schema(schema).parquet(str(src) + "/*")
    enriched = enrich_stream_with_dim(
        stream, spark.read.parquet(dimp), ["k"], broadcast=True
    )
    q = (
        enriched.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(out)
    # left join: key 9 has no dim row -> null name survives
    assert got == [(1, "a", "one"), (2, "b", "two"), (9, "x", None)]
