"""Round-11 compositions (VERDICT r10 #7): the streaming corpus build
(cb1's funnel as a continuous foreachBatch ingest with the conservation
identity held ACROSS batches) and the ANN maintenance loop (skew-report
driven quantizer re-train whose result matches a from-scratch build)."""

from __future__ import annotations

import os

import pytest

# r13 (VERDICT r12 #2): heavyweight integration tail — excluded from the
# default driver-window run; executed by the builder via `-m slow`.
pytestmark = pytest.mark.slow

from pyspark.sql import functions as F

SCHEMA = "doc_id bigint, text string, source string, lang string"


def _write(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(path)


# ------------------------------------------- streaming corpus build
def test_streaming_corpus_build_conservation_across_batches(spark, tmp_path):
    from neotree_data_pipeline_kedro_spark.streaming.incremental import (
        corpus_build_conservation,
        run_foreach_batch_corpus_build,
    )

    src = str(tmp_path / "landing")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    good = "the quick brown fox jumps over the lazy dog tonight"
    _write(
        spark,
        src + "/f1.parquet",
        [
            (1, good, "web", "en"),          # kept
            (2, None, "web", "en"),          # quarantined (NULL)
            (3, " \t\n ", "web", "en"),      # quarantined (whitespace-only)
            (4, "too short", "web", "en"),   # gated (2 tokens < 5)
            (5, good + " x", "web", "xx"),   # gated (language)
            (6, good, "crawl", "en"),        # dup_in_batch (fp of 1, id 6 > 1)
        ],
    )
    _write(
        spark,
        src + "/f2.parquet",
        [
            (7, "seven brand new tokens arrive in this doc", "web", "en"),
            (8, good, "crawl", "en"),        # dup_cross_batch (kept in f1)
            (9, None, "crawl", "en"),        # quarantined
        ],
    )
    run_foreach_batch_corpus_build(spark, src + "/*", SCHEMA, out, ck)

    census = {
        (r["source"], r["disposition"]): r["n"]
        for r in spark.read.parquet(out + "/census").collect()
    }
    assert census == {
        ("web", "kept"): 2,           # docs 1, 7
        ("web", "quarantined"): 2,    # docs 2, 3
        ("web", "gated"): 2,          # docs 4, 5
        ("crawl", "dup_in_batch"): 1,  # doc 6 (same batch as doc 1)
        ("crawl", "dup_cross_batch"): 1,  # doc 8 (batch 2 vs kept doc 1)
        ("crawl", "quarantined"): 1,  # doc 9
    }
    kept = spark.read.parquet(out + "/corpus")
    assert {r["id"] for r in kept.collect()} == {1, 7}
    assert "text" not in kept.columns  # bodies never enter state

    audit = corpus_build_conservation(spark, out)
    assert audit["holds"], audit
    assert audit["landing_rows"] == 9
    assert audit["census_total"] == 9
    assert audit["corpus_rows"] == 2

    # checkpoint RELOCATION replay: a fresh checkpoint re-delivers every
    # file; the manifest (not the epoch id) must keep effects
    # exactly-once per source file
    run_foreach_batch_corpus_build(
        spark, src + "/*", SCHEMA, out, str(tmp_path / "ck2")
    )
    audit2 = corpus_build_conservation(spark, out)
    assert audit2 == audit

    # a third file arrives: only IT is processed, census increments
    _write(
        spark,
        src + "/f3.parquet",
        [
            (10, "ten more fresh tokens land in the third file", "web", "en"),
            (11, good, "web", "en"),  # still a cross-batch dup of doc 1
        ],
    )
    run_foreach_batch_corpus_build(
        spark, src + "/*", SCHEMA, out, str(tmp_path / "ck3")
    )
    audit3 = corpus_build_conservation(spark, out)
    assert audit3["holds"], audit3
    assert audit3["landing_rows"] == 11
    assert audit3["corpus_rows"] == 3
    census3 = {
        (r["source"], r["disposition"]): r["n"]
        for r in spark.read.parquet(out + "/census").collect()
    }
    assert census3[("web", "kept")] == 3
    assert census3[("web", "dup_cross_batch")] == 1


def test_streaming_corpus_build_rejects_remote_paths(spark, tmp_path):
    from neotree_data_pipeline_kedro_spark.streaming.incremental import (
        run_foreach_batch_corpus_build,
    )

    with pytest.raises(ValueError, match="local-filesystem"):
        run_foreach_batch_corpus_build(
            spark, "s3a://bucket/in", SCHEMA, str(tmp_path), str(tmp_path / "ck")
        )


# ------------------------------------------- ANN maintenance loop
def test_ann_maintenance_skew_trigger_and_retrain_matches_scratch(
    spark, tmp_path
):
    import numpy as np

    from neotree_data_pipeline_kedro_spark.operators.similarity import (
        build_ivfpq_index,
        ivfpq_topk,
        load_ann_index,
        maintain_ann_index,
        pq_train,
        retrain_ann_index,
        save_ann_index,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    base = emb.filter(F.col("vec_id") % 5 != 0)
    delta = emb.filter(F.col("vec_id") % 5 == 0)
    cents = (
        emb.orderBy(F.xxhash64("vec_id"))
        .limit(8)
        .select(
            F.col("vec_id").alias("centroid_id"),
            F.col("embedding").alias("centroid_vec"),
        )
    )
    books = pq_train(emb, "vec_id", "embedding", m=8, nbits=4)
    index = build_ivfpq_index(base, cents, books, "vec_id", "embedding")
    path = str(tmp_path / "ann")
    save_ann_index(
        index, books, cents, path, vectors=base.select("vec_id", "embedding")
    )
    n_base = base.count()
    n_delta = delta.count()

    report = maintain_ann_index(
        delta, path, "vec_id", "embedding", batch_id="m1", skew_ratio=1e9
    )
    assert report["appended"] == n_delta
    assert report["skew"] >= 1.0
    assert report["retrain"] is False  # astronomic threshold: no trigger
    assert spark.read.parquet(path + "/codes").count() == n_base + n_delta
    assert spark.read.parquet(path + "/vectors").count() == n_base + n_delta

    # idempotent re-run: same batch retried changes nothing
    report2 = maintain_ann_index(
        delta, path, "vec_id", "embedding", batch_id="m1", skew_ratio=1e9
    )
    assert report2["appended"] == report["appended"]
    assert spark.read.parquet(path + "/codes").count() == n_base + n_delta

    # any real occupancy skew exceeds ratio 1.0: the trigger fires
    report3 = maintain_ann_index(
        delta, path, "vec_id", "embedding", batch_id="m1", skew_ratio=1.0
    )
    assert report3["retrain"] is True

    retrain_ann_index(spark, path, "vec_id", "embedding", m=8, nbits=4)
    idx_r, books_r, cents_r = load_ann_index(spark, path)
    assert idx_r.count() == n_base + n_delta
    # appends collapsed into the retrained base partition
    batches = {
        r["batch"] for r in idx_r.select("batch").distinct().collect()
    }
    assert batches == {"base"}

    # the retrained index answers EXACTLY like a from-scratch build over
    # the same current vector set (read from the same sidecar so float
    # summation order is identical)
    vecs = spark.read.parquet(path + "/vectors").select("vec_id", "embedding")
    from neotree_data_pipeline_kedro_spark.operators.similarity import (
        kmeans_fit,
    )

    cents_pdf = kmeans_fit(vecs, "vec_id", "embedding", k=8)
    cents_s = spark.createDataFrame(
        [
            (int(r.centroid_id), [float(x) for x in r.centroid_vec])
            for r in cents_pdf.itertuples()
        ],
        "centroid_id bigint, centroid_vec array<double>",
    )
    books_s = pq_train(vecs, "vec_id", "embedding", m=8, nbits=4)
    assert np.allclose(books_r, books_s)
    idx_s = build_ivfpq_index(vecs, cents_s, books_s, "vec_id", "embedding")

    q = delta.limit(3)
    got = (
        ivfpq_topk(
            idx_r, cents_r, books_r, vecs, q, "vec_id", "embedding",
            k=3, nprobe=4,
        )
        .toPandas()
        .sort_values(["query_id", "neighbor_id"])
        .reset_index(drop=True)
    )
    want = (
        ivfpq_topk(
            idx_s, cents_s, books_s, vecs, q, "vec_id", "embedding",
            k=3, nprobe=4,
        )
        .toPandas()
        .sort_values(["query_id", "neighbor_id"])
        .reset_index(drop=True)
    )
    assert got.equals(want), (got, want)

    # a crashed retrain leaves a stage dir: the next retrain rebuilds it
    os.makedirs(path + "/_stage_retrain/garbage", exist_ok=True)
    retrain_ann_index(spark, path, "vec_id", "embedding", m=8, nbits=4)
    assert not os.path.isdir(path + "/_stage_retrain")
    assert spark.read.parquet(path + "/codes").count() == n_base + n_delta
