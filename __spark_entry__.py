"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``neotree_data_pipeline_kedro_spark`` — this module
only adapts the registry (plans/queries.py) to the driver's interface.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from neotree_data_pipeline_kedro_spark.plans.queries import (  # noqa: E402
    ORACLE_SQL,
    QUERIES,
    flagship,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H-Q1-shaped pricing rollup) on sf0.001."""
    return flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ LLM
    extensions). Each callable takes (spark, sf_dir) → DataFrame."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI-SQL twins, column-name aligned with queries().
    Keys absent here (dd_minhash_lsh, dd_simhash,
    j3_tiered_greedy_assignment, ann_topk_lsh, ann_topk_ivf,
    ann_topk_ivf_kmeans, ann_topk_pq, ann_topk_ivfpq, ann_join_ivf,
    dd_semantic_dedup, g1_pagerank, v_column_profile) are genuinely
    non-SQL-expressible (LSH banding / IVF / PQ probe internals, the
    iterative Lloyd's and PageRank loops, greedy stateful assignment,
    engine-specific sketches) and take the driver's rows-only check; each is verified in
    tests/test_no_oracle_parity.py against an independent pandas/numpy twin
    (exact-Jaccard soundness+completeness, brute-force hamming equality,
    quantized-cosine recomputation + recall@10 floors, and an independent
    greedy re-implementation, respectively)."""
    return dict(ORACLE_SQL)
