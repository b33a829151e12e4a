"""Text model prep: trained language identification + tokenizer training.

Two trained text-model components live here: the TextCat n-gram-profile
language classifier (below) and distributed BPE merge-rule learning
(``bpe_train``) — both follow the same shape: a corpus-sized statistics
pass, a bounded model artifact, and a cheap application pass.

N-gram-profile language identification (TextCat-style, trained).

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


def bpe_train(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    num_merges: int = 10,
    min_pair_count: int = 2,
    local_threshold: int = 100_000,
) -> DataFrame:
    """Distributed BPE tokenizer TRAINING (Sennrich et al. 2016): learn
    the merge table, not just apply one (ta_bpe_token_count applies a
    fixed GPT-2-style pre-tokenizer; this produces the merges).

    Classic word-frequency formulation: the corpus collapses to a
    (word, count) vocabulary table — the scale pivot, because a 100 TB
    corpus has millions of DISTINCT words, not trillions, so every
    merge round runs on the vocabulary, weighted by counts, never on
    raw text. Per round: explode adjacent symbol pairs (weighted
    groupBy-sum — partial aggregation absorbs Zipf skew), take the
    argmax pair under a total (count DESC, pair ASC) order (a 1-row
    driver collect), then apply the merge to the symbol arrays with a
    vectorized Arrow kernel (greedy left-to-right, the reference BPE
    semantics — sequential within a word, embarrassingly parallel
    across words). Stops early when no pair reaches
    ``min_pair_count``.

    Returns the merge table (rank, left, right, pair_count) — the
    artifact a tokenizer ships. Not SQL-expressible (per-word greedy
    sequential fold); parity is pinned by an independent pure-Python
    twin in pytest, the repo's standard for such ops.

    Small-vocab fast path (the SCC/CC local_threshold precedent): when
    the distinct vocabulary is ≤ ``local_threshold`` entries, the merge
    LOOP runs driver-side on the collected word-count table — this is
    how production tokenizer trainers work too (the corpus-sized pass
    is the word count; the merge loop is memory-sized). The distributed
    rounds remain for vocabularies that don't fit (set
    ``local_threshold=0`` to force them; pinned in pytest against an
    independent twin).
    """
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    from ..functions.text import tokens
    from .components import flat_checkpoint

    vocab = (
        docs.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .select(
            F.concat(
                F.split(F.col("w"), ""),
                F.array(F.lit("</w>")),
            ).alias("sym"),
            "cnt",
        )
        .transform(flat_checkpoint)
    )
    merges: list[tuple[int, str, str, int]] = []
    spark = docs.sparkSession
    out_schema = "rank int, left string, right string, pair_count bigint"
    if vocab.count() <= local_threshold:
        wc = {tuple(r["sym"]): r["cnt"] for r in vocab.collect()}
        for rank in range(num_merges):
            pairs: dict[tuple[str, str], int] = {}
            for sym, c in wc.items():
                for i in range(len(sym) - 1):
                    key = (sym[i], sym[i + 1])
                    pairs[key] = pairs.get(key, 0) + c
            if not pairs:
                break
            (a, b), pc = min(
                pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
            )
            if pc < min_pair_count:
                break
            merges.append((rank, a, b, int(pc)))
            nwc: dict[tuple, int] = {}
            for sym, c in wc.items():
                res: list[str] = []
                i, n = 0, len(sym)
                while i < n:
                    if i + 1 < n and sym[i] == a and sym[i + 1] == b:
                        res.append(a + b)
                        i += 2
                    else:
                        res.append(sym[i])
                        i += 1
                key2 = tuple(res)
                nwc[key2] = nwc.get(key2, 0) + c
            wc = nwc
        return spark.createDataFrame(merges, out_schema)
    sym_schema = T.StructType(
        [
            T.StructField("sym", T.ArrayType(T.StringType())),
            T.StructField("cnt", T.LongType()),
        ]
    )
    for rank in range(num_merges):
        pairs = (
            vocab.select(
                F.posexplode(F.slice("sym", 1, F.size("sym") - 1)).alias(
                    "i", "left"
                ),
                F.col("sym"),
                F.col("cnt"),
            )
            .select(
                "left",
                F.expr("sym[i + 1]").alias("right"),
                "cnt",
            )
            .groupBy("left", "right")
            .agg(F.sum("cnt").alias("pc"))
        )
        top = (
            pairs.orderBy(
                F.col("pc").desc(), F.col("left").asc(), F.col("right").asc()
            )
            .limit(1)
            .collect()
        )
        if not top or top[0]["pc"] < min_pair_count:
            break
        left, right, pc = top[0]["left"], top[0]["right"], int(top[0]["pc"])
        merges.append((rank, left, right, pc))

        def apply_merge(
            it: Iterator[pd.DataFrame], a: str = left, b: str = right
        ) -> Iterator[pd.DataFrame]:
            ab = a + b
            for pdf in it:
                out = []
                for sym in pdf["sym"]:
                    res: list[str] = []
                    i, n = 0, len(sym)
                    while i < n:
                        if i + 1 < n and sym[i] == a and sym[i + 1] == b:
                            res.append(ab)
                            i += 2
                        else:
                            res.append(sym[i])
                            i += 1
                    out.append(res)
                yield pd.DataFrame({"sym": out, "cnt": pdf["cnt"]})

        vocab = vocab.mapInPandas(apply_merge, schema=sym_schema).transform(
            flat_checkpoint
        )
    return spark.createDataFrame(merges, out_schema)
