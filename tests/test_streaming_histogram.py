"""Streaming mergeable-histogram maintenance: the streamed state must
equal the batch histogram_state over the full data, quantile estimates
must match the batch form, and replays with a fresh checkpoint must not
double-count (source-file-set idempotency inherited from the rollup)."""
from __future__ import annotations

import pathlib

from pyspark.sql import functions as F

import pytest

# r13 (VERDICT r12 #2): heavyweight integration tail — excluded from the
# default driver-window run; executed by the builder via `-m slow`.
pytestmark = pytest.mark.slow


SCHEMA = "g string, v double"


def _write_drop(spark, path: str, rows) -> None:
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def _state(spark, path: str):
    df = spark.read.parquet(path).withColumnRenamed("count_bucket", "cnt")
    return {
        (r["g"], r["bucket"]): r["cnt"] for r in df.collect()
    }


def test_streaming_histogram_matches_batch(spark, tmp_path: pathlib.Path):
    from neotree_data_pipeline_kedro_spark.operators.frequency import (
        histogram_quantile,
        histogram_state,
    )
    from neotree_data_pipeline_kedro_spark.streaming.incremental import (
        run_foreach_batch_histogram,
    )

    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    drop1 = [("a", float(i % 97)) for i in range(500)] + [
        ("b", float((i * 7) % 50)) for i in range(300)
    ]
    drop2 = [("a", float((i * 3) % 100)) for i in range(400)] + [
        ("b", 250.0),  # above hi: must clamp into the top bucket
        ("b", -5.0),  # below lo: bottom bucket
    ]
    _write_drop(spark, src, drop1)
    _write_drop(spark, src, drop2)

    run_foreach_batch_histogram(
        spark, src, SCHEMA, state, ckpt, "g", "v", lo=0.0, hi=100.0,
        buckets=16,
    )

    full = spark.createDataFrame(drop1 + drop2, SCHEMA)
    expect = {
        (r["g"], r["bucket"]): r["cnt"]
        for r in histogram_state(full, "g", "v", 0.0, 100.0, 16).collect()
    }
    assert _state(spark, state) == expect

    # quantile estimates from the streamed state == batch estimates
    streamed = spark.read.parquet(state).withColumnRenamed(
        "count_bucket", "cnt"
    )
    q_stream = {
        r["g"]: r["est"]
        for r in histogram_quantile(
            streamed, "g", 9, 10, 0.0, 100.0, 16
        ).collect()
    }
    q_batch = {
        r["g"]: r["est"]
        for r in histogram_quantile(
            histogram_state(full, "g", "v", 0.0, 100.0, 16),
            "g", 9, 10, 0.0, 100.0, 16,
        ).collect()
    }
    assert q_stream == q_batch

    # fresh checkpoint replay: every source file already in the manifest,
    # so nothing double-counts
    run_foreach_batch_histogram(
        spark, src, SCHEMA, state, str(tmp_path / "ckpt2"), "g", "v",
        lo=0.0, hi=100.0, buckets=16,
    )
    assert _state(spark, state) == expect

    # a third drop merges incrementally on top
    _write_drop(spark, src, [("a", 99.9)] * 10)
    run_foreach_batch_histogram(
        spark, src, SCHEMA, state, str(tmp_path / "ckpt3"), "g", "v",
        lo=0.0, hi=100.0, buckets=16,
    )
    after = _state(spark, state)
    assert after[("a", 15)] == expect.get(("a", 15), 0) + 10
    assert sum(v for (g, _), v in after.items() if g == "b") == sum(
        v for (g, _), v in expect.items() if g == "b"
    )
