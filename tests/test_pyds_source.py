"""Custom Python DataSource connector (sources/pyds.py): schema, parallel
partition planning, source-side filter pushdown, atomic JSON-lines writer."""

from __future__ import annotations

import json
import os

import pytest

from neotree_data_pipeline_kedro_spark.sources.pyds import (
    SessionFeedDataSource,
    _row,
)


@pytest.fixture(scope="module", autouse=True)
def registered(spark):
    spark.dataSource.register(SessionFeedDataSource)
    prev = spark.conf.get("spark.sql.python.filterPushdown.enabled", "false")
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    yield
    spark.conf.set("spark.sql.python.filterPushdown.enabled", prev)


def _read(spark, **opts):
    r = spark.read.format("session_feed")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_read_deterministic_and_parallel(spark):
    df = _read(spark, n=1000, partitions=8)
    assert df.rdd.getNumPartitions() == 8
    rows = sorted(df.collect(), key=lambda r: r["seq"])
    assert len(rows) == 1000
    assert [tuple(r) for r in rows[:2]] == [_row(0), _row(1)]
    # second read identical (stateless deterministic source)
    again = sorted(_read(spark, n=1000, partitions=3).collect(),
                   key=lambda r: r["seq"])
    assert [tuple(r) for r in rows] == [tuple(r) for r in again]


def test_filter_pushdown_prunes_source_side(spark):
    df = _read(spark, n=1000, partitions=4).filter("scriptid = 'vit'")
    rows = df.collect()
    assert len(rows) == 250
    assert all(r["scriptid"] == "vit" for r in rows)
    assert all(r["seq"] % 4 == 2 for r in rows)
    # the equality was absorbed by the source: the post-scan Filter may
    # keep only the residual isnotnull, never the pushed `scriptid = vit`
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchScan session_feed" in plan, plan[:800]
    assert "= vit" not in plan, plan[:800]
    # unknown scriptid -> zero partitions planned, zero rows
    assert _read(spark, n=1000).filter("scriptid = 'nope'").count() == 0


def test_writer_atomic_commit(spark, tmp_path):
    out = str(tmp_path / "feed_out")
    os.makedirs(out)
    df = _read(spark, n=97, partitions=5)
    df.write.format("session_feed").mode("append").option("path", out).save()
    assert os.path.exists(os.path.join(out, "_SUCCESS"))
    assert not os.path.exists(os.path.join(out, "_temporary"))
    lines = []
    for f in os.listdir(out):
        if f.endswith(".jsonl"):
            with open(os.path.join(out, f)) as fh:
                lines += [json.loads(x) for x in fh]
    assert len(lines) == 97
    assert sorted(x["seq"] for x in lines) == list(range(97))
    # round-trip through spark.read.json agrees with the source
    back = spark.read.json(os.path.join(out, "*.jsonl"))
    assert back.count() == 97


def test_stream_reader_micro_batches(spark, tmp_path):
    from neotree_data_pipeline_kedro_spark.sources.pyds import (
        SessionFeedStreamDataSource,
    )

    spark.dataSource.register(SessionFeedStreamDataSource)
    ckpt = str(tmp_path / "ckpt")
    stream = (
        spark.readStream.format("session_feed_stream")
        .option("n", 250)
        .option("rows_per_batch", 100)
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("feed_stream_out")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql("select * from feed_stream_out").collect()
    assert len(rows) == 250
    assert sorted(r["seq"] for r in rows) == list(range(250))
    # batch twin equality: the stream drains to exactly the batch read
    batch = spark.read.format("session_feed").option("n", 250).load()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, batch.collect()))
