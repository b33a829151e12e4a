"""N-gram-profile language identification (TextCat-style, trained).

Reference parity: the reference pipeline tags language per document with
a profile-based n-gram heuristic (the classic Cavnar & Trenkle 1994
"N-Gram-Based Text Categorization" scheme: build a per-language n-gram
frequency profile from labeled seed documents, score unlabeled documents
against every profile, predict the argmax). This module is the trained
complement of ``functions.text.language_id`` (the zero-training stopword
vote): profiles are LEARNED from a labeled split, so the operator also
doubles as the generic "profile classifier" building block (topic
routing, source attribution, boilerplate-family detection).

Scale shape: the profile table is (languages x n-gram vocabulary) —
bounded by vocabulary, independent of corpus size — so it broadcasts;
scoring is one map-side broadcast-hash join from the exploded document
n-grams plus a partially-aggregated (doc, lang) sum. Nothing here
shuffles the corpus more than once.

All scoring arithmetic is integer (ppm document-frequency weights via
truncating division), so the result is bit-identical cross-engine.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .neardup import shingle_sets


def ngram_language_profiles(
    train_docs: DataFrame,
    id_col: str,
    text_col: str,
    label_col: str,
    n: int = 3,
) -> tuple[DataFrame, DataFrame]:
    """Build per-language n-gram profiles from labeled documents.

    Returns ``(profiles, totals)``:

    - ``profiles``: (label, gram, weight_ppm) where ``weight_ppm`` is the
      n-gram's document frequency within the label's training docs,
      scaled to parts-per-million of the label's training-doc count
      (truncating integer division — portable across engines).
    - ``totals``: (label, n_train) training-document counts.

    Shingles are DISTINCT per document (document frequency, not term
    frequency) via the vectorized pandas shingle kernel.
    """
    sh = shingle_sets(
        train_docs, id_col, text_col, n=n, keep=(label_col,), hashed=False
    )
    ex = sh.select(
        F.col(label_col).alias("label"), F.explode("sh").alias("gram")
    )
    totals = train_docs.groupBy(F.col(label_col).alias("label")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_train")
    )
    profiles = (
        ex.groupBy("label", "gram")
        .agg(F.count(F.lit(1)).cast("bigint").alias("df"))
        .join(F.broadcast(totals), "label")
        .select(
            "label",
            "gram",
            F.expr("df * CAST(1000000 AS BIGINT) DIV n_train").alias(
                "weight_ppm"
            ),
        )
    )
    return profiles, totals


def classify_language_ngram(
    docs: DataFrame,
    profiles: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    default_label: str = "und",
) -> DataFrame:
    """Score every document against every profile; return
    (id, pred_label, score_ppm).

    score(doc, L) = sum of L's ppm weights over the doc's DISTINCT
    n-grams; argmax with label-ascending tiebreak; documents whose
    n-grams match no profile at all get ``default_label`` with score 0.
    The profile join is an explicit broadcast — the profile table is
    vocabulary-sized, never corpus-sized.
    """
    from pyspark.sql import Window

    sh = shingle_sets(docs, id_col, text_col, n=n, hashed=False)
    ex = sh.select(F.col("id"), F.explode("sh").alias("gram"))
    scored = (
        ex.join(F.broadcast(profiles), "gram")
        .groupBy("id", "label")
        .agg(F.sum("weight_ppm").cast("bigint").alias("score_ppm"))
    )
    w = Window.partitionBy("id").orderBy(
        F.col("score_ppm").desc(), F.col("label").asc()
    )
    best = (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            "id",
            F.col("label").alias("pred_label"),
            "score_ppm",
        )
    )
    ids = docs.select(F.col(id_col).alias("id"))
    return ids.join(best, "id", "left").select(
        F.col("id").alias(id_col),
        F.coalesce("pred_label", F.lit(default_label)).alias("pred_label"),
        F.coalesce("score_ppm", F.lit(0).cast("bigint")).alias("score_ppm"),
    )
