"""Exact frequent-items at scale: Misra-Gries candidate generation plus an
exact verification pass.

One groupBy over a 100 TB token stream is already skew-safe (map-side
partial aggregation), but its shuffle carries EVERY distinct item — for
frequent-ITEM queries (support >= s) that is wasted work on the long tail.
The classic two-pass shape used here:

1. per-partition Misra-Gries summaries with k = ceil(factor/s) counters —
   bounded state, one streaming pass over Arrow batches, vectorized per
   batch (merge a batch's value_counts, then apply the mergeable-summary
   reduction of Agarwal et al., "Mergeable Summaries": subtract the
   (k+1)-th largest count from all and drop non-positives). Pigeonhole
   guarantees the union of per-partition candidate KEYS is a superset of
   every item with global frequency >= 1/k: such an item has local
   frequency >= n_p/k > n_p/(k+1) in at least one partition, and MG
   retains everything above n_p/(k+1).
2. exact counts for candidates only (broadcast semi-join on the bounded
   candidate list), filtered to count >= ceil(s * N).

The result is EXACT — the sketch only prunes the tail before the shuffle —
so a plain GROUP BY ... HAVING oracle states the same answer.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def mg_candidates(df: DataFrame, col: str, k: int) -> DataFrame:
    """Per-partition Misra-Gries candidate keys, ``k`` counters each.
    Output: one row per surviving (partition-local) candidate value."""

    def partial(batches):
        import pandas as pd  # noqa: PLC0415 — worker-side import

        counters: dict = {}
        for pdf in batches:
            vc = pdf[col].dropna().value_counts()
            for v, c in vc.items():
                counters[v] = counters.get(v, 0) + int(c)
            if len(counters) > k:
                cut = sorted(counters.values(), reverse=True)[k]
                counters = {
                    v: c - cut for v, c in counters.items() if c - cut > 0
                }
        yield pd.DataFrame({col: list(counters.keys())})

    return df.select(col).mapInPandas(
        partial, schema=T.StructType([df.schema[col]])
    )


def frequent_items(
    df: DataFrame, col: str, support: float, *, candidate_factor: float = 1.0
) -> DataFrame:
    """All values of ``col`` with frequency >= ``support`` (exact), with
    their exact counts. ``candidate_factor`` > 1 widens the per-partition
    sketch for safety margin; 1.0 is already sufficient by the pigeonhole
    argument in the module docstring.

    Output: (col, cnt) — every item with cnt >= ceil(support * N).
    """
    k = math.ceil(candidate_factor / support)
    cands = mg_candidates(df, col, k).distinct()
    total = df.groupBy().agg(F.count(col).alias("__n"))
    return (
        df.join(F.broadcast(cands), [col], "left_semi")
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("cnt") >= F.ceil(F.lit(support) * F.col("__n")))
        .drop("__n")
    )


def unigram_logprob(
    tokens_df: DataFrame,
    doc_col: str,
    token_col: str,
    *,
    scale: int = 1_000_000,
) -> DataFrame:
    """Unigram language-model scoring: each document's corpus
    log-likelihood sum(ln(count(token)/N)) — the cheap fluency/quality
    signal (gibberish and boilerplate-free text score very differently
    against the corpus's own unigram model; pair with perplexity
    thresholds for filtering).

    Cross-engine exactness: each token's ln(p) is quantized to integer
    micro-units BEFORE the per-document sum, so only the single ln call
    can differ between engines and the round absorbs last-ulp drift
    (the BM25 idf discipline, functions/text.py). Vocabulary counts
    broadcast back onto the token stream — one count shuffle, one
    per-doc sum shuffle, both map-side-combined.

    Input: one row per (doc, token). Output: (doc, n_tokens,
    logprob_micro) with logprob_micro = sum of round(ln(c/N)*scale).
    """
    vocab = tokens_df.groupBy(token_col).agg(F.count(F.lit(1)).alias("__c"))
    total = tokens_df.groupBy().agg(F.count(F.lit(1)).alias("__n"))
    contrib = (
        tokens_df.join(F.broadcast(vocab), [token_col])
        .crossJoin(F.broadcast(total))
        .withColumn(
            "__lp",
            F.round(
                F.log(F.col("__c").cast("double") / F.col("__n")) * scale, 0
            ).cast("long"),
        )
    )
    return contrib.groupBy(doc_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.sum("__lp").alias("logprob_micro"),
    )
