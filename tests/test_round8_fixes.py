"""Round-8 fixes: hub-cap exclusion observability (r7 verdict #6) and the
r7 ADVICE items (hyperball id overflow, histogram bucket clamp, markov
unknown-state validation, paragraph_dedup blank-line round-trip,
foreachBatch rollup URI-keyed manifest)."""
from __future__ import annotations

import logging

import pytest
from pyspark.sql import functions as F


# ----------------------------------------------- hub-cap observability
def test_hub_exclusions_logged_and_countable(spark, caplog):
    """g5/g6 drop cap_hub_degree's hub report (fixed output schema); the
    r6/r7 advice wants the exclusion visible anyway. log_hub_exclusions
    returns the count AND emits a log record naming the call site."""
    from neotree_data_pipeline_kedro_spark.operators.components import (
        cap_hub_degree,
        log_hub_exclusions,
    )

    edges = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    edges += [(100, 200 + i) for i in range(60)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    _, hubs = cap_hub_degree(df, max_degree=10, src="src", dst="dst")
    with caplog.at_level(logging.INFO, logger="neotree_data_pipeline_kedro_spark.operators.components"):
        n = log_hub_exclusions(hubs, 10, "unit_test_site")
    assert n == 1
    rec = [r for r in caplog.records if "unit_test_site" in r.getMessage()]
    assert rec and "excluded 1 hub" in rec[0].getMessage()

    # zero-exclusion case is logged too (visibility is unconditional)
    _, hubs0 = cap_hub_degree(df, max_degree=100, src="src", dst="dst")
    with caplog.at_level(logging.INFO, logger="neotree_data_pipeline_kedro_spark.operators.components"):
        n0 = log_hub_exclusions(hubs0, 100, "unit_test_site_zero")
    assert n0 == 0
    assert any("unit_test_site_zero" in r.getMessage() for r in caplog.records)


# ------------------------------------------------ hyperball id overflow
def test_hyperball_large_and_negative_node_ids(spark):
    """HB_A·node overflows int64 for ids above ~5.7e9 and non-ANSI Spark
    wraps silently: pre-fix the register index went negative, register
    groups multiplied, and the HLL denominator went negative. The hash
    now reduces the id into [0, P) first, so huge and negative ids get
    exactly m=16 well-formed registers and a positive estimate — and
    ids already in [0, P) hash identically to the old form (oracle
    parity unchanged)."""
    from neotree_data_pipeline_kedro_spark.operators.components import (
        hyperball_reach,
    )

    big = 7_000_000_000_000  # far beyond the old ~5.7e9 overflow point
    edges = [(big + i, big + i + 1) for i in range(8)]
    edges += [(-5, big), (-7, -5)]  # negative ids must not wrap either
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = {r.node: r for r in hyperball_reach(df, hops=2).collect()}
    assert set(got) == {big + i for i in range(9)} | {-5, -7}
    for node, r in got.items():
        assert 1 <= r.filled <= 16, (node, r.filled)
        assert r.est_reach > 0, (node, r.est_reach)
    # a path node sees its 2-hop ball; estimates stay in a sane band
    # (m=16 → ~26% rse; exact ball of the chain interior is 5)
    interior = got[big + 4]
    assert 1.0 < interior.est_reach < 25.0


# ------------------------------------------- histogram bucket/rank clamp
def test_histogram_state_clamps_out_of_range_and_p100(spark):
    """Values below lo landed in negative buckets and flowed through the
    quantile walk; p100 (q_num == q_den) targeted rank n, matching no
    bucket and silently dropping the group. Both clamped now."""
    from neotree_data_pipeline_kedro_spark.operators.frequency import (
        histogram_quantile,
        histogram_state,
    )

    rows = [("g", -50.0), ("g", -1.0)] + [("g", float(v)) for v in range(0, 100, 5)] + [("g", 250.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    st = histogram_state(df, "g", "v", lo=0.0, hi=100.0, buckets=10)
    buckets = {r.bucket: r.cnt for r in st.collect()}
    assert min(buckets) == 0 and max(buckets) == 9
    assert buckets[0] >= 3  # the two below-lo rows clamp into bucket 0
    assert sum(buckets.values()) == len(rows)  # nothing lost

    # p100 resolves to the top bucket instead of dropping the group
    p100 = histogram_quantile(st, "g", 1, 1, lo=0.0, hi=100.0, buckets=10).collect()
    assert len(p100) == 1
    assert p100[0].est <= 100.0 and p100[0].est >= 90.0
    # p0 stays in the bottom bucket
    p0 = histogram_quantile(st, "g", 0, 1, lo=0.0, hi=100.0, buckets=10).collect()
    assert len(p0) == 1 and 0.0 <= p0[0].est < 10.0


# --------------------------------------------- markov unknown-state guard
def test_markov_removal_effects_names_unknown_states(spark):
    from neotree_data_pipeline_kedro_spark.operators.attribution import (
        markov_removal_effects,
    )

    edges = spark.createDataFrame(
        [
            ("__start__", "email", 10),
            ("email", "sms_typo", 4),  # not in channels
            ("email", "__conv__", 6),
        ],
        "from_state string, to_state string, cnt bigint",
    )
    with pytest.raises(ValueError, match="sms_typo"):
        markov_removal_effects(edges, ["email", "search"])


# ------------------------------------------ paragraph_dedup round-trip
def test_paragraph_dedup_roundtrips_blank_lines(spark):
    """A document with no duplicated paragraphs must come back
    byte-for-byte — blank lines included (pre-fix every doc was
    rewritten with blank lines stripped). Blanks never cross-match as
    duplicates and don't count toward n_kept."""
    from neotree_data_pipeline_kedro_spark.operators.neardup import (
        paragraph_dedup,
    )

    d1 = "intro\n\nbody paragraph one\n\nconclusion"
    d2 = "totally different\n\nshared footer"
    d3 = "another doc\n\nshared footer"
    df = spark.createDataFrame(
        [(1, d1), (2, d2), (3, d3)], "id bigint, text string"
    )
    got = {r.id: r for r in paragraph_dedup(df, "id", "text").collect()}
    # doc 1 has no hot paragraph: exact round-trip, blanks preserved
    assert got[1].cleaned_text == d1
    assert got[1].n_kept == 3 and got[1].n_dropped == 0
    # the shared footer is dropped from both carriers; their blank
    # placeholder survives
    assert got[2].cleaned_text == "totally different\n"
    assert got[3].cleaned_text == "another doc\n"
    assert got[2].n_kept == 1 and got[2].n_dropped == 1
    # blank-only / empty docs round-trip too
    df2 = spark.createDataFrame([(9, ""), (10, "\n\n")], "id bigint, text string")
    got2 = {r.id: r for r in paragraph_dedup(df2, "id", "text").collect()}
    assert got2[9].cleaned_text == "" and got2[9].n_kept == 0
    assert got2[10].cleaned_text == "\n\n" and got2[10].n_kept == 0


# ----------------------------------- rollup manifest keys stay full URIs
def test_rollup_norm_keeps_remote_uris_and_rejects_remote_paths(tmp_path, spark):
    """_norm must canonicalize only file:-scheme variants; s3a://a/p and
    hdfs://a/p must stay distinct manifest keys, and non-local
    source/rollup paths are rejected up front (the swap uses os.rename)."""
    import pytest as _pytest

    from neotree_data_pipeline_kedro_spark.streaming.incremental import (
        run_foreach_batch_rollup,
    )

    with _pytest.raises(ValueError, match="local-filesystem"):
        run_foreach_batch_rollup(
            spark,
            "s3a://bucket/in",
            "id INT",
            str(tmp_path / "roll"),
            str(tmp_path / "ck"),
            ["id"],
            {"n": ("count", "id")},
        )
    with _pytest.raises(ValueError, match="local-filesystem"):
        run_foreach_batch_rollup(
            spark,
            str(tmp_path / "in"),
            "id INT",
            "hdfs://nn/out",
            str(tmp_path / "ck"),
            ["id"],
            {"n": ("count", "id")},
        )


# ------------------------------------------------- interval coalescing
def test_interval_coalesce_islands(spark):
    """Overlapping, touching, nested, and disjoint intervals per key:
    closed-merge semantics (touching joins), nested absorbs, disjoint
    splits, other keys never interact."""
    from neotree_data_pipeline_kedro_spark.operators.windows import (
        interval_coalesce,
    )

    rows = [
        # key 1: [0,10] overlaps [5,12], [12,15] touches -> one span
        (1, 0, 10), (1, 5, 12), (1, 12, 15),
        # key 1: [20,25] disjoint; [21,22] nested inside it
        (1, 20, 25), (1, 21, 22),
        # key 2: single interval
        (2, 3, 4),
    ]
    df = spark.createDataFrame(rows, "k int, s bigint, e bigint")
    got = {
        (r.k, r.s, r.e): r.n_merged
        for r in interval_coalesce(df, ["k"], "s", "e").collect()
    }
    assert got == {(1, 0, 15): 3, (1, 20, 25): 2, (2, 3, 4): 1}


# --------------------------------------------- grid diversity sampling
def test_grid_diversity_sample_quota_and_determinism(spark):
    """Every cell contributes at most the quota; a dense cell is capped
    while sparse cells survive whole; the draw is a pure function of the
    ids (re-running yields the identical pick set)."""
    from neotree_data_pipeline_kedro_spark.operators.sampling import (
        grid_diversity_sample,
    )

    rows = [(i, [1.0, 1.0]) for i in range(50)]          # dense cell 3
    rows += [(100 + i, [-1.0, 1.0]) for i in range(3)]   # sparse cell 2
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    out1 = grid_diversity_sample(df, "vec_id", "embedding", sign_dims=2, quota=5)
    picks1 = {(r.cell, r.vec_id) for r in out1.collect()}
    cells = {}
    for c, v in picks1:
        cells.setdefault(c, set()).add(v)
    assert len(cells[3]) == 5          # dense cell capped at quota
    assert cells[2] == {100, 101, 102}  # sparse cell intact
    out2 = grid_diversity_sample(df, "vec_id", "embedding", sign_dims=2, quota=5)
    assert picks1 == {(r.cell, r.vec_id) for r in out2.collect()}
    ranks = {r.pick_rank for r in out1.collect() if r.cell == 3}
    assert ranks == {1, 2, 3, 4, 5}
