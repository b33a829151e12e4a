"""Native session_window streaming rollup: cross-batch session merging
(two fragments bridged by a later event) and append-mode finalization."""

from __future__ import annotations

import datetime as dt
import os
import time

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from neotree_data_pipeline_kedro_spark.streaming.windows import (
    session_window_rollup,
)

SCHEMA = T.StructType(
    [
        T.StructField("user", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("kind", T.StringType()),
    ]
)

D = dt.datetime

BATCH1 = [
    ("u1", D(2024, 3, 1, 0, 0), "view"),
    ("u1", D(2024, 3, 1, 0, 20), "view"),   # separate session (gap 10m)
]
BATCH2 = [
    # lands BETWEEN the two fragments, within gap of both -> Spark must
    # MERGE them into one 00:00-00:20(+gap) session
    ("u1", D(2024, 3, 1, 0, 10), "buy"),
    ("u2", D(2024, 3, 1, 0, 0), "view"),
]
BATCH3 = [
    # pushes event time far ahead so every earlier session finalizes
    ("u1", D(2024, 3, 1, 6, 0), "view"),
]
BATCH4 = [
    ("u1", D(2024, 3, 1, 6, 1), "view"),  # extra batch to flush append mode
]


@pytest.fixture(scope="module")
def sessions(spark, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("sw_src"))
    ckpt = str(tmp_path_factory.mktemp("sw_ckpt"))
    for i, batch in enumerate([BATCH1, BATCH2, BATCH3, BATCH4]):
        pdf = pd.DataFrame(batch, columns=["user", "ts", "kind"])
        path = os.path.join(src, f"b{i}.parquet")
        spark.createDataFrame(pdf, SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(path)
        mtime = time.time() - 200 + i * 50
        for root, _, files in os.walk(path):
            for f in files:
                os.utime(os.path.join(root, f), (mtime, mtime))

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    out = session_window_rollup(
        stream, "ts", "10 minutes", "30 minutes", keys=["user"],
        indicators={"n_buys": F.col("kind") == "buy"},
    )
    q = (
        out.writeStream.format("memory")
        .queryName("sw_out")
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return {
        (r["user"], r["session_start"]): r
        for r in spark.table("sw_out").collect()
    }


def test_bridging_event_merges_cross_batch_fragments(sessions):
    # u1's two batch-1 fragments + the batch-2 bridge = ONE session of 3
    # rows starting 00:00; no separate session at 00:20 survives
    r = sessions[("u1", D(2024, 3, 1, 0, 0))]
    assert r["n_rows"] == 3
    assert r["n_buys"] == 1
    assert ("u1", D(2024, 3, 1, 0, 20)) not in sessions


def test_session_end_is_last_event_plus_gap(sessions):
    r = sessions[("u1", D(2024, 3, 1, 0, 0))]
    assert r["session_end"] == D(2024, 3, 1, 0, 30)  # 00:20 + 10m gap


def test_single_event_session_finalizes(sessions):
    r = sessions[("u2", D(2024, 3, 1, 0, 0))]
    assert r["n_rows"] == 1 and r["n_buys"] == 0
