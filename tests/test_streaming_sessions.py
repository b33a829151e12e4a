"""Streaming sessionization: state carries across micro-batches and the
result matches the batch W3 operator on the same (unioned) input."""

from __future__ import annotations

import datetime as dt
import os
import time

import pandas as pd
import pytest

from pyspark.sql import types as T

from neotree_data_pipeline_kedro_spark.operators.windows import episode_sessionize
from neotree_data_pipeline_kedro_spark.streaming.sessions import sessionize_stream

SCHEMA = T.StructType(
    [
        T.StructField("uid", T.LongType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def _rows(day_hours: list[tuple[int, int, int]]) -> list[tuple[int, dt.datetime]]:
    # (uid, day, hour) → (uid, timestamp in 2024-03)
    return [
        (uid, dt.datetime(2024, 3, day, hour, 0, 0)) for uid, day, hour in day_hours
    ]


BATCH1 = _rows(
    [
        (1, 1, 8),
        (1, 1, 12),  # same day → same episode
        (1, 2, 9),  # day change → new episode
        (2, 1, 10),
    ]
)
BATCH2 = _rows(
    [
        (1, 2, 15),  # SAME day as batch1's last for uid 1 → episode continues
        (1, 3, 7),  # day change → new episode
        (2, 5, 11),  # day change → new episode
        (3, 4, 6),  # brand-new key starts at episode 1
    ]
)


@pytest.fixture(scope="module")
def streamed(spark, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("stream_src"))
    ckpt = str(tmp_path_factory.mktemp("stream_ckpt"))
    for i, batch in enumerate([BATCH1, BATCH2]):
        pdf = pd.DataFrame(batch, columns=["uid", "ts"])
        path = os.path.join(src, f"batch{i}.parquet")
        spark.createDataFrame(pdf, SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(path)
        # file-source batch order follows modification time: force batch0 older
        mtime = time.time() - 100 + i * 50
        for root, _, files in os.walk(path):
            for f in files:
                os.utime(os.path.join(root, f), (mtime, mtime))

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    out = sessionize_stream(stream, "uid", "ts")
    q = (
        out.writeStream.format("memory")
        .queryName("sess_out")
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return {
        (r["uid"], r["ts"]): r["episode"]
        for r in spark.table("sess_out").collect()
    }


def test_multiple_batches_processed(streamed):
    assert len(streamed) == len(BATCH1) + len(BATCH2)


def test_matches_batch_operator(spark, streamed):
    union = spark.createDataFrame(
        pd.DataFrame(BATCH1 + BATCH2, columns=["uid", "ts"]), SCHEMA
    )
    batch = {
        (r["uid"], r["ts"]): r["episode"]
        for r in episode_sessionize(union, ["uid"], "ts").collect()
    }
    assert streamed == batch


def test_state_continuity_explicit(streamed):
    # uid 1: day1, day1, day2 | day2 (continues!), day3 → episodes 1,1,2,2,3
    uid1 = sorted(
        ((ts, ep) for (u, ts), ep in streamed.items() if u == 1), key=lambda x: x[0]
    )
    assert [ep for _, ep in uid1] == [1, 1, 2, 2, 3]
    # uid 3 only appears in batch 2 and starts fresh
    assert [ep for (u, _), ep in streamed.items() if u == 3] == [1]
