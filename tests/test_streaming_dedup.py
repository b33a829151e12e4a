"""Streaming first-arrival dedup: cross-batch duplicate suppression within
the watermark horizon (streaming/dedup.py)."""

from __future__ import annotations

import datetime as dt
import os
import time

import pandas as pd
import pytest

# r13 (VERDICT r12 #2): heavyweight integration tail — excluded from the
# default driver-window run; executed by the builder via `-m slow`.
pytestmark = pytest.mark.slow

from pyspark.sql import types as T

from neotree_data_pipeline_kedro_spark.streaming.dedup import dedup_stream

SCHEMA = T.StructType(
    [
        T.StructField("uid", T.StringType()),
        T.StructField("scriptid", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("payload", T.StringType()),
    ]
)

D = dt.datetime

BATCH1 = [
    ("A", "s1", D(2024, 3, 1, 0, 0), "first-A"),
    ("A", "s1", D(2024, 3, 1, 0, 1), "dup-A-same-batch"),
    ("B", "s1", D(2024, 3, 1, 0, 2), "first-B"),
]
BATCH2 = [
    ("A", "s1", D(2024, 3, 1, 0, 3), "dup-A-next-batch"),
    ("A", "s2", D(2024, 3, 1, 0, 4), "other-script-A"),
    ("C", "s1", D(2024, 3, 1, 0, 5), "first-C"),
]


@pytest.fixture(scope="module")
def result(spark, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("dedup_src"))
    ckpt = str(tmp_path_factory.mktemp("dedup_ckpt"))
    for i, batch in enumerate([BATCH1, BATCH2]):
        pdf = pd.DataFrame(batch, columns=["uid", "scriptid", "ts", "payload"])
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
    deduped = dedup_stream(stream, ["uid", "scriptid"], "ts", "30 minutes")
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql("select * from dedup_out").collect()


def test_first_arrival_wins_across_batches(result):
    payloads = {r.payload for r in result}
    # duplicates inside a batch AND across micro-batches are suppressed
    assert "dup-A-same-batch" not in payloads
    assert "dup-A-next-batch" not in payloads
    assert {"first-A", "first-B", "first-C", "other-script-A"} <= payloads


def test_key_is_composite(result):
    # (uid, scriptid) is the key: same uid under another script survives
    a_rows = [r for r in result if r.uid == "A"]
    assert {r.scriptid for r in a_rows} == {"s1", "s2"}
    assert len(a_rows) == 2


def test_one_row_per_key(result):
    keys = [(r.uid, r.scriptid) for r in result]
    assert len(keys) == len(set(keys)) == 4
