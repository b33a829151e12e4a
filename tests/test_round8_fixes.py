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
