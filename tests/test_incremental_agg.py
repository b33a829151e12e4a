"""Incremental aggregate maintenance: any batch split folds to the full
recompute; guards reject non-mergeable aggregates."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from neotree_data_pipeline_kedro_spark.operators.incremental_agg import (
    merge_rollup,
    partial_rollup,
)

MEASURES = {"v": "sum", "v2": "count", "v3": "min", "v4": "max"}


def _rows(spark, lo, hi):
    return spark.range(lo, hi).select(
        (F.col("id") % 5).cast("string").alias("k"),
        F.col("id").cast("decimal(18,2)").alias("v"),
        F.when(F.col("id") % 3 == 0, F.col("id")).alias("v2"),  # nulls for count
        F.col("id").alias("v3"),
        F.col("id").alias("v4"),
    )


def _canon(df):
    return {
        r.k: (r.sum_v, r.count_v2, r.min_v3, r.max_v4) for r in df.collect()
    }


@pytest.mark.parametrize("splits", [[(0, 100), (100, 300)], [(0, 1), (1, 2), (2, 300)]])
def test_fold_equals_full_recompute(spark, splits):
    full = _canon(partial_rollup(_rows(spark, 0, 300), ["k"], MEASURES))
    stored = None
    for lo, hi in splits:
        stored = merge_rollup(
            stored, partial_rollup(_rows(spark, lo, hi), ["k"], MEASURES),
            ["k"], MEASURES,
        )
    assert _canon(stored) == full


def test_new_group_appears_and_old_passes_through(spark):
    a = spark.createDataFrame([("x", 1)], "k string, v long")
    b = spark.createDataFrame([("y", 5)], "k string, v long")
    m = {"v": "sum"}
    out = {
        r.k: r.sum_v
        for r in merge_rollup(
            partial_rollup(a, ["k"], m), partial_rollup(b, ["k"], m), ["k"], m
        ).collect()
    }
    assert out == {"x": 1, "y": 5}


def test_rejects_non_mergeable(spark):
    df = spark.createDataFrame([("x", 1)], "k string, v long")
    with pytest.raises(ValueError, match="not mergeable"):
        partial_rollup(df, ["k"], {"v": "avg"})


def test_delta_join_fold_equals_full_recompute(spark):
    from neotree_data_pipeline_kedro_spark.operators.incremental_agg import (
        delta_join,
    )

    a = spark.createDataFrame([(i, f"a{i}") for i in range(20)], "k int, av string")
    b = spark.createDataFrame(
        [(i % 10, j, f"b{i}_{j}") for i in range(30) for j in (0, 1)],
        "k int, j int, bv string",
    )
    a_old, a_delta = a.filter("k % 3 != 0"), a.filter("k % 3 = 0")
    b_old, b_delta = b.filter("j = 0"), b.filter("j = 1")
    stored = a_old.join(b_old, ["k"])
    delta = delta_join(a_old, a_delta, b_old, b_delta, on=["k"])
    folded = stored.unionByName(delta)
    full = a.join(b, ["k"])
    assert folded.count() == full.count()
    assert folded.exceptAll(full).count() == 0
    assert full.exceptAll(folded).count() == 0


def test_delta_join_rejects_outer(spark):
    import pytest as _pytest

    from neotree_data_pipeline_kedro_spark.operators.incremental_agg import (
        delta_join,
    )

    df = spark.range(1)
    with _pytest.raises(ValueError):
        delta_join(df, df, df, df, on=["id"], how="left")
