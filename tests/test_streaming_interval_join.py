"""Stream-stream interval join: watermarked two-stream join with a
time-range predicate (streaming/joins.py)."""

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

from neotree_data_pipeline_kedro_spark.streaming.joins import interval_join_streams

ADM_SCHEMA = T.StructType(
    [
        T.StructField("uid", T.StringType()),
        T.StructField("adm_ts", T.TimestampType()),
        T.StructField("ward", T.StringType()),
    ]
)
VIT_SCHEMA = T.StructType(
    [
        T.StructField("uid", T.StringType()),
        T.StructField("vit_ts", T.TimestampType()),
        T.StructField("hr", T.IntegerType()),
    ]
)

D = dt.datetime

ADMISSIONS = [
    ("A", D(2024, 3, 1, 10, 0), "w1"),
    ("B", D(2024, 3, 1, 11, 0), "w2"),
]
VITALS = [
    ("A", D(2024, 3, 1, 10, 20), 120),  # inside [adm, adm+1h]
    ("A", D(2024, 3, 1, 12, 30), 130),  # outside the interval
    ("B", D(2024, 3, 1, 11, 59), 95),  # inside
    ("C", D(2024, 3, 1, 10, 5), 80),  # no matching admission
]


def _write(spark, rows, schema, d):
    pdf = pd.DataFrame(rows, columns=[f.name for f in schema.fields])
    spark.createDataFrame(pdf, schema).coalesce(1).write.mode("overwrite").parquet(d)
    mtime = time.time() - 100
    for root, _, files in os.walk(d):
        for f in files:
            os.utime(os.path.join(root, f), (mtime, mtime))


@pytest.fixture(scope="module")
def joined(spark, tmp_path_factory):
    adm_dir = str(tmp_path_factory.mktemp("adm_src"))
    vit_dir = str(tmp_path_factory.mktemp("vit_src"))
    ckpt = str(tmp_path_factory.mktemp("ij_ckpt"))
    _write(spark, ADMISSIONS, ADM_SCHEMA, os.path.join(adm_dir, "b0.parquet"))
    _write(spark, VITALS, VIT_SCHEMA, os.path.join(vit_dir, "b0.parquet"))

    adm = spark.readStream.schema(ADM_SCHEMA).parquet(adm_dir + "/*")
    vit = spark.readStream.schema(VIT_SCHEMA).parquet(vit_dir + "/*")
    out = interval_join_streams(
        adm,
        vit,
        "uid",
        "adm_ts",
        "vit_ts",
        lower="0 seconds",
        upper="1 hour",
        watermark="30 minutes",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("ij_out")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql("select * from ij_out").collect()


def test_matches_inside_interval_only(joined):
    got = sorted((r["uid"], r["hr"]) for r in joined)
    assert got == [("A", 120), ("B", 95)]


def test_no_partner_no_row(joined):
    assert all(r["uid"] != "C" for r in joined)


def test_columns_from_both_sides(joined):
    r = next(x for x in joined if x["uid"] == "A")
    assert r["ward"] == "w1" and r["adm_ts"] < r["vit_ts"]


def test_left_outer_emits_unmatched_after_horizon(spark, tmp_path):
    """leftOuter: an admission with no vitals inside its horizon emits
    null-padded — but only after the watermark passes its eviction time,
    which takes a later batch to advance the watermark."""
    adm_dir, vit_dir = str(tmp_path / "adm"), str(tmp_path / "vit")
    ckpt = str(tmp_path / "ckpt")
    # X at 08:00 never gets vitals; A at 10:00 matches
    _write(
        spark,
        [("X", D(2024, 3, 1, 8, 0), "w0")] + ADMISSIONS,
        ADM_SCHEMA,
        os.path.join(adm_dir, "b0.parquet"),
    )
    _write(spark, VITALS, VIT_SCHEMA, os.path.join(vit_dir, "b0.parquet"))

    adm = spark.readStream.schema(ADM_SCHEMA).parquet(adm_dir + "/*")
    vit = spark.readStream.schema(VIT_SCHEMA).parquet(vit_dir + "/*")
    out = interval_join_streams(
        adm, vit, "uid", "adm_ts", "vit_ts",
        lower="0 seconds", upper="1 hour",
        watermark="30 minutes", how="leftOuter",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("ij_lo")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r["uid"], r["hr"])
            for r in spark.sql("select uid, hr from ij_lo").collect()
        }
        assert ("A", 120) in got and ("B", 95) in got  # inner matches emit
        # advance the watermark far past every horizon with a later batch
        _write(
            spark,
            [("Z", D(2024, 3, 2, 9, 0), 70)],
            VIT_SCHEMA,
            os.path.join(vit_dir, "b1.parquet"),
        )
        q.processAllAvailable()
        got = {
            (r["uid"], r["hr"])
            for r in spark.sql("select uid, hr from ij_lo").collect()
        }
    finally:
        q.stop()
    assert ("X", None) in got  # unmatched left row surfaced null-padded
    assert all(uid != "C" for uid, _ in got)  # right orphans still drop


def test_interval_join_rejects_unknown_how(spark):
    import pytest as _pytest

    with _pytest.raises(ValueError):
        interval_join_streams(
            spark.readStream.schema(ADM_SCHEMA).parquet("/tmp/nope/*"),
            spark.readStream.schema(VIT_SCHEMA).parquet("/tmp/nope2/*"),
            "uid", "adm_ts", "vit_ts", how="full",
        )
