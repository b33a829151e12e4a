"""Full-text search operators: postings/TF-IDF vs a driver-side counter,
BM25 ranking sanity, and the top-k plan contract."""

from __future__ import annotations

import contextlib
import io
import math
from collections import Counter

from neotree_data_pipeline_kedro_spark.operators.search import (
    bm25_topk,
    doc_lengths,
    postings,
    tfidf_vectors,
)

DOCS = [
    (1, "join join join hash"),
    (2, "scan merge window"),
    (3, "the quick brown fox"),
    (4, ""),
    (5, "hash hash join window scan scan scan"),
    (6, None),
]


def _df(spark):
    return spark.createDataFrame(DOCS, "doc_id bigint, text string")


def test_postings_match_counter(spark):
    got = {
        (r["term"], r["id"]): r["tf"]
        for r in postings(_df(spark), "doc_id", "text").collect()
    }
    want = {}
    for i, t in DOCS:
        for term, n in Counter((t or "").split()).items():
            want[(term, i)] = n
    assert got == want


def test_doc_lengths(spark):
    got = {r["id"]: r["dl"] for r in doc_lengths(_df(spark), "doc_id", "text").collect()}
    assert got == {1: 4, 2: 3, 3: 4, 4: 0, 5: 7, 6: 0}


def test_tfidf_formula(spark):
    rows = tfidf_vectors(_df(spark), "doc_id", "text").collect()
    by = {(r["term"], r["id"]): r for r in rows}
    r = by[("join", 1)]
    assert r["tf"] == 3 and r["df"] == 2
    assert math.isclose(r["tfidf"], 3 * math.log(6 / 2), rel_tol=1e-12)


def test_bm25_ranks_matching_docs_first(spark):
    out = bm25_topk(
        _df(spark), "doc_id", "text", ["hash", "join", "scan"], k=10
    ).collect()
    ids = [r["id"] for r in out]
    # only docs containing a query term appear, best match first
    assert set(ids) == {1, 2, 5}
    assert ids[0] == 5  # most query-term mass
    assert all(out[i]["score_micro"] >= out[i + 1]["score_micro"] for i in range(len(out) - 1))
    # score is exactly micro / 1e6
    for r in out:
        assert math.isclose(r["score"], r["score_micro"] / 1e6, rel_tol=0)


def test_bm25_topk_plan_contract(spark):
    from neotree_data_pipeline_kedro_spark.plans.queries import QUERIES

    from conftest import SF_SMOKE

    df = QUERIES["ta_bm25_topk"](spark, SF_SMOKE)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    # df_t and corpus stats ride broadcasts; top-k is TakeOrdered, never a
    # global Sort; partial aggregation absorbs the Zipf term key map-side
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    assert "HashAggregate" in plan


def test_contamination_broadcasts_benchmark_index(spark):
    from neotree_data_pipeline_kedro_spark.plans.queries import QUERIES

    from conftest import SF_SMOKE

    df = QUERIES["dd_contamination_check"](spark, SF_SMOKE)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    # the benchmark's inverted shingle index must ride a broadcast — the
    # corpus side never shuffles its shingles
    assert "BroadcastHashJoin" in plan
