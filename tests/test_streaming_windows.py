"""Watermarked windowed rollup: append-mode finalization across
micro-batches, late-row dropping, and batch/stream parity."""

from __future__ import annotations

import datetime as dt
import os
import time

import pandas as pd
import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from neotree_data_pipeline_kedro_spark.streaming.windows import (
    windowed_indicator_rollup,
)

SCHEMA = T.StructType(
    [
        T.StructField("facility", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("outcome", T.StringType()),
    ]
)

D = dt.datetime  # brevity

BATCH1 = [
    ("A", D(2024, 3, 1, 0, 10), "death"),
    ("A", D(2024, 3, 1, 0, 20), "discharge"),
    ("B", D(2024, 3, 1, 0, 40), "discharge"),
    ("A", D(2024, 3, 1, 1, 5), "death"),  # hour-1 window opens
]
BATCH2 = [
    # advances event time far past hour 0+threshold: the NEXT batch runs
    # with watermark = 03:00 − 30 min = 02:30
    ("A", D(2024, 3, 1, 3, 0), "discharge"),
]
BATCH3 = [
    # processed under watermark 02:30 → the hour-0/1 windows are finalized,
    # emitted, and their state evicted during THIS batch
    ("A", D(2024, 3, 1, 3, 5), "discharge"),
]
BATCH4 = [
    # late row arriving after eviction — the watermark contract only
    # guarantees a drop once the window's state is gone (a late row merging
    # into still-live state is allowed), which is why the eviction batch
    # sits between the advance and this row
    ("B", D(2024, 3, 1, 0, 50), "death"),
]


def _indicators():
    return {
        "death_count": F.col("outcome") == "death",
        "discharge_count": F.col("outcome") == "discharge",
    }


@pytest.fixture(scope="module")
def result(spark, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("win_src"))
    ckpt = str(tmp_path_factory.mktemp("win_ckpt"))
    for i, batch in enumerate([BATCH1, BATCH2, BATCH3, BATCH4]):
        pdf = pd.DataFrame(batch, columns=["facility", "ts", "outcome"])
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
    out = windowed_indicator_rollup(
        stream, "ts", "1 hour", "30 minutes", keys=["facility"],
        indicators=_indicators(),
    )
    q = (
        out.writeStream.format("memory")
        .queryName("win_out")
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    dropped = sum(
        p["stateOperators"][0].get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        if p["stateOperators"]
    )
    rows = {
        (r["facility"], r["window_start"]): (r["n_rows"], r["death_count"], r["discharge_count"])
        for r in spark.table("win_out").collect()
    }
    return rows, dropped


def test_finalized_windows_emitted(result):
    rows, _ = result
    # hour-0 and hour-1 windows finalize during batch3 (watermark 02:30)
    h0 = D(2024, 3, 1, 0, 0)
    h1 = D(2024, 3, 1, 1, 0)
    assert rows[("A", h0)] == (2, 1, 1)
    assert rows[("A", h1)] == (1, 1, 0)


def test_late_row_dropped(result):
    rows, dropped = result
    # batch4's 00:50 death for B arrives after the hour-0 state was evicted
    # → dropped by the watermark; B's finalized window holds only the
    # on-time discharge
    h0 = D(2024, 3, 1, 0, 0)
    assert rows[("B", h0)] == (1, 0, 1)
    assert dropped >= 1


def test_batch_parity_without_late_row(spark):
    # the same definition on a batch frame (watermark = no-op) equals the
    # stream's finalized windows for the on-time rows
    on_time = BATCH1 + BATCH2 + BATCH3
    batch = spark.createDataFrame(
        pd.DataFrame(on_time, columns=["facility", "ts", "outcome"]), SCHEMA
    )
    rolled = windowed_indicator_rollup(
        batch, "ts", "1 hour", "30 minutes", keys=["facility"],
        indicators=_indicators(),
    )
    got = {
        (r["facility"], r["window_start"]): (r["n_rows"], r["death_count"], r["discharge_count"])
        for r in rolled.collect()
    }
    h0 = D(2024, 3, 1, 0, 0)
    h1 = D(2024, 3, 1, 1, 0)
    assert got[("A", h0)] == (2, 1, 1)
    assert got[("A", h1)] == (1, 1, 0)
    assert got[("B", h0)] == (1, 0, 1)
    h3 = D(2024, 3, 1, 3, 0)
    assert got[("A", h3)] == (2, 0, 2)
