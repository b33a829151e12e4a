"""Salted skew join: exact plain-join semantics, hot-key spread, guards."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from neotree_data_pipeline_kedro_spark.operators.joins import salted_join


def _skewed(spark):
    # 90% of left rows share one hot key
    rows = [("hot" if i % 10 else f"k{i}", i) for i in range(1000)]
    left = spark.createDataFrame(rows, "k string, lv long")
    right = spark.createDataFrame(
        [("hot", 1), ("k10", 2), ("k20", 3), ("absent", 4)], "k string, rv long"
    )
    return left, right


def _as_set(df):
    return {(r.k, r.lv, r.rv) for r in df.collect()}


def test_salted_inner_matches_plain(spark):
    left, right = _skewed(spark)
    got = _as_set(salted_join(left, right, ["k"], salts=8))
    want = _as_set(left.join(right, "k"))
    assert got == want and len(want) > 0


def test_salted_left_matches_plain(spark):
    left, right = _skewed(spark)
    got = _as_set(salted_join(left, right, ["k"], salts=8, how="left"))
    want = _as_set(left.join(right, "k", "left"))
    assert got == want
    assert any(rv is None for (_, _, rv) in got)  # unmatched keys survive


def test_salted_join_null_keys_never_match(spark):
    left = spark.createDataFrame([(None, 1), ("a", 2)], "k string, lv long")
    right = spark.createDataFrame([(None, 9), ("a", 8)], "k string, rv long")
    got = _as_set(salted_join(left, right, ["k"], salts=4, how="left"))
    assert got == {(None, 1, None), ("a", 2, 8)}


def test_salt_spreads_hot_key(spark):
    left, right = _skewed(spark)
    lb = left.withColumn("__salt", F.pmod(F.xxhash64(*left.columns), F.lit(8)))
    per_salt = (
        lb.filter(F.col("k") == "hot").groupBy("__salt").count().collect()
    )
    # the hot key's 900 rows must land in every salt bucket, none dominant
    assert len(per_salt) == 8
    assert max(r["count"] for r in per_salt) < 900 * 0.3


def test_salted_join_guards(spark):
    left, right = _skewed(spark)
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(left, right, ["k"], how="full")
    clash = right.withColumnRenamed("rv", "lv")
    with pytest.raises(ValueError, match="overlapping non-key"):
        salted_join(left, clash, ["k"])
