"""Unit tests for the deterministic sampling primitives
(operators/sampling.py): rate-gate uniformity, budget-prefix semantics,
greedy packing edge cases (oversized rows, accumulator reset)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from neotree_data_pipeline_kedro_spark.operators.sampling import (
    budget_prefix,
    greedy_pack,
    hash_gate,
    rate_map,
)


def test_hash_gate_matches_python_md5(spark):
    df = spark.range(0, 1000).select(F.col("id"))
    kept = {r.id for r in df.filter(hash_gate(F.col("id"), "80")).collect()}
    expect = {
        i for i in range(1000) if hashlib.md5(str(i).encode()).hexdigest() < "80"
    }
    assert kept == expect
    # ~50% rate on a uniform digest
    assert 0.4 < len(kept) / 1000 < 0.6


def test_rate_map_lookup(spark):
    df = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b") for i in range(400)], "id long, grp string"
    )
    thr = rate_map({"a": "ff", "b": "00"})[F.col("grp")]
    kept = df.filter(hash_gate(F.col("id"), thr)).groupBy("grp").count().collect()
    by = {r.grp: r["count"] for r in kept}
    assert by.get("b") is None  # '00' keeps nothing
    assert by["a"] > 150  # 'ff' keeps ~all of group a


def test_budget_prefix_inclusive_and_ordered(spark):
    df = spark.createDataFrame(
        [(g, i, 10) for g in ("x", "y") for i in range(20)],
        "grp string, id long, w long",
    )
    out = budget_prefix(
        df, ["grp"], F.col("w"), budget=35, key_col="id", cum_col="cum"
    ).collect()
    # 10+10+10 = 30 <= 35, fourth row would reach 40 > 35 → 3 rows per group
    by_grp = {}
    for r in out:
        by_grp.setdefault(r.grp, []).append(r)
    for g, rows in by_grp.items():
        assert len(rows) == 3
        assert max(r.cum for r in rows) == 30
        # kept ids are the 3 lowest by md5 order
        order = sorted(range(20), key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
        assert {r.id for r in rows} == set(order[:3])


def test_budget_prefix_requires_order(spark):
    df = spark.createDataFrame([("x", 1, 1)], "grp string, id long, w long")
    with pytest.raises(ValueError, match="order_cols or key_col"):
        budget_prefix(df, ["grp"], F.col("w"), budget=5)


def test_greedy_pack_resets_and_isolates_oversized(spark):
    # md5-ordered ids for a deterministic walk
    ids = sorted(range(8), key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
    weights = {ids[0]: 50, ids[1]: 60, ids[2]: 500, ids[3]: 10,
               ids[4]: 10, ids[5]: 95, ids[6]: 95, ids[7]: 95}
    df = spark.createDataFrame(
        [("g", i, weights[i]) for i in range(8)], "grp string, id long, w long"
    )
    out = {r.id: r.pack_id for r in greedy_pack(
        df, ["grp"], "w", budget=100, key_col="id"
    ).collect()}
    walk = [out[i] for i in ids]
    # 50+60>100 → reset; 500 oversized → own pack; 10+10 share; 95s alone
    assert walk == [0, 1, 2, 3, 3, 4, 5, 6]


def test_greedy_pack_weights_within_budget_unless_oversized(spark):
    import random

    rnd = random.Random(7)
    rows = [("g", i, rnd.randint(1, 60)) for i in range(200)]
    df = spark.createDataFrame(rows, "grp string, id long, w long")
    out = greedy_pack(df, ["grp"], "w", budget=100, key_col="id").collect()
    fills = {}
    for r in out:
        fills[r.pack_id] = fills.get(r.pack_id, 0) + r.w
    assert all(v <= 100 for v in fills.values())
    # packs are contiguous 0..max
    assert sorted(fills) == list(range(len(fills)))


@pytest.mark.parametrize("parts", [1, 7])
def test_greedy_pack_invariant_to_partitioning(spark, parts):
    """Pack assignments are a pure function of (group, key, weight) — any
    physical partitioning of the input produces identical packs."""
    import random

    rnd = random.Random(11)
    rows = [(f"g{i % 3}", i, rnd.randint(1, 60)) for i in range(300)]
    df = spark.createDataFrame(rows, "grp string, id long, w long").repartition(parts)
    out = {(r.grp, r.id): r.pack_id for r in greedy_pack(
        df, ["grp"], "w", budget=100, key_col="id"
    ).collect()}
    base_df = spark.createDataFrame(rows, "grp string, id long, w long").coalesce(1)
    base = {(r.grp, r.id): r.pack_id for r in greedy_pack(
        base_df, ["grp"], "w", budget=100, key_col="id"
    ).collect()}
    assert out == base


def test_budget_prefix_invariant_to_partitioning(spark):
    rows = [(f"g{i % 5}", i, (i * 7) % 40 + 1) for i in range(500)]
    outs = []
    for parts in (1, 13):
        df = spark.createDataFrame(rows, "grp string, id long, w long").repartition(parts)
        got = budget_prefix(df, ["grp"], F.col("w"), budget=150, key_col="id")
        outs.append({(r.grp, r.id, r.cum_weight) for r in got.collect()})
    assert outs[0] == outs[1]


def test_stratified_sample_exact_counts_and_override(spark):
    from neotree_data_pipeline_kedro_spark.operators.sampling import stratified_sample

    rows = [("en", i) for i in range(50)] + [("fr", i + 100) for i in range(8)] + [
        ("de", i + 200) for i in range(20)
    ]
    df = spark.createDataFrame(rows, "lang string, id long")
    out = stratified_sample(df, ["lang"], "id", 10, counts={"en": 30}).collect()
    by = {}
    for r in out:
        by.setdefault(r.lang, set()).add(r.id)
    assert len(by["en"]) == 30
    assert len(by["de"]) == 10
    assert by["fr"] == {i + 100 for i in range(8)}  # undersized stratum kept whole


def test_stratified_sample_deterministic_across_partitioning(spark):
    from neotree_data_pipeline_kedro_spark.operators.sampling import stratified_sample

    rows = [(f"l{i % 4}", i) for i in range(400)]
    picks = []
    for parts in (1, 17):
        df = spark.createDataFrame(rows, "lang string, id long").repartition(parts)
        picks.append({(r.lang, r.id) for r in stratified_sample(df, ["lang"], "id", 25).collect()})
    assert picks[0] == picks[1]


def test_stratified_sample_rejects_float_key(spark):
    from neotree_data_pipeline_kedro_spark.operators.sampling import stratified_sample

    df = spark.createDataFrame([("en", 1.5)], "lang string, k double")
    with pytest.raises(ValueError, match="integer or string"):
        stratified_sample(df, ["lang"], "k", 5)


def test_ecdf_normalize_formula(spark):
    from neotree_data_pipeline_kedro_spark.operators.windows import ecdf_normalize

    rows = [("a", 1, 10), ("a", 2, 20), ("a", 3, 20), ("a", 4, 40), ("b", 5, 7)]
    df = spark.createDataFrame(rows, "g string, id long, v long")
    out = {r.id: r for r in ecdf_normalize(df, "v", ["g"], tiebreak_col="id").collect()}
    assert out[1].pct_rank == 0.0 and out[4].pct_rank == 1.0
    assert out[2].pct_rank == pytest.approx(1 / 3, abs=0)
    assert out[4].cume_dist == 1.0
    assert out[5].pct_rank == 0.0 and out[5].cume_dist == 1.0
    tiles = [out[i].tile for i in (1, 2, 3, 4)]
    assert tiles == [1, 2, 3, 4]
