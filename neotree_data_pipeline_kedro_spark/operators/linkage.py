"""Probabilistic record linkage: Fellegi-Sunter scoring.

The reference resolves admission↔discharge candidates with a hand-tuned
fuzzy score (create_joined_table_and_derived_columns.py:268-394 — exact
uid + date proximity); this module adds the principled generalization a
dedup/linkage pipeline needs at corpus scale: each comparison field
carries match/non-match weights log2(m/u) and log2((1-m)/(1-u)) from its
estimated m- (P(agree | same entity)) and u- (P(agree | different
entity)) probabilities, and a pair's evidence is the sum over fields
(Fellegi & Sunter 1969, "A Theory for Record Linkage").

Cross-engine exactness: weights are computed ONCE in Python and embedded
as integer micro-bit literals, so the per-pair score is pure bigint
arithmetic — no log() at query time (the same constants-not-
transcendentals discipline as the DP ladder in operators/privacy.py).

Scale shape: candidate pairs must come from BLOCKING (the caller joins on
a block key — never all-pairs); scoring is then per-row expressions, and
the classify thresholds are plain filters. One equi-shuffle on the block
key, nothing else.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

SCALE = 1_000_000  # micro-bits


def field_weights(m: float, u: float, scale: int = SCALE) -> tuple[int, int]:
    """(agreement, disagreement) weights in integer micro-bits for a field
    with match probability ``m`` and chance-agreement probability ``u``."""
    if not (0 < u < m < 1):
        raise ValueError(f"need 0 < u < m < 1, got m={m} u={u}")
    wa = round(math.log2(m / u) * scale)
    wd = round(math.log2((1 - m) / (1 - u)) * scale)
    return wa, wd


def fs_score(fields: Sequence[tuple[Column, float, float]]) -> Column:
    """Summed Fellegi-Sunter evidence (integer micro-bits) for one
    candidate pair. ``fields``: (agreement boolean column, m, u)."""
    total: Column | None = None
    for agree, m, u in fields:
        wa, wd = field_weights(m, u)
        term = F.when(agree, F.lit(wa)).otherwise(F.lit(wd)).cast("long")
        total = term if total is None else total + term
    if total is None:
        raise ValueError("at least one comparison field required")
    return total


def fs_classify(
    score: Column,
    upper: int = 2 * SCALE,
    lower: int = 0,
) -> Column:
    """Three-way decision on the summed evidence: >= upper micro-bits →
    'match', >= lower → 'possible' (clerical review band), else
    'non_match'. Defaults: 2 bits of evidence for match, nonnegative for
    the review band."""
    return (
        F.when(score >= F.lit(upper), F.lit("match"))
        .when(score >= F.lit(lower), F.lit("possible"))
        .otherwise(F.lit("non_match"))
    )


def multipass_block_pairs(df, id_col, block_exprs):
    """Multi-pass blocking for record linkage: one equi-self-join per
    blocking key, unioned and deduplicated to (id_a < id_b) candidate
    pairs — the standard recall insurance of entity resolution (any
    single dirty field breaks any single blocking key; a true pair only
    needs ONE pass where both records agree). ``block_exprs`` is a list
    of Column expressions, each deriving one blocking key from the
    record.

    Scale shape: each pass is an ordinary equi-join on its key
    (shuffle = data + one key per row); pair rows carry IDS ONLY — the
    caller re-joins payloads by id afterwards (the neardup candidate
    discipline, so wide payloads never ride the low-cardinality block
    join). Hot blocks are the caller's contract: pick keys whose
    fan-out is bounded, or pre-cap with a block-size filter the way
    the n-gram family does.

    Output: (id_a, id_b) distinct.
    """
    if not block_exprs:
        raise ValueError("multipass_block_pairs: no blocking keys given")
    if len(block_exprs) == 1:
        # single pass: a plain equi-join, no explode and no string cast
        keyed = df.select(
            F.col(id_col).alias("__id"), block_exprs[0].alias("__blk")
        ).filter(F.col("__blk").isNotNull())
        return (
            keyed.select(F.col("__id").alias("id_a"), "__blk")
            .join(keyed.select(F.col("__id").alias("id_b"), "__blk"), "__blk")
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
        )
    # ONE self-join for all passes (r12, guide §2.4): every record emits
    # one (pass_idx, key) row per blocking key via posexplode and the
    # passes meet in a single equi-join on (pass, key) — the former
    # one-join-per-pass form paid a full shuffle pair + union branch per
    # key for identical output (keys from different passes can never
    # match because the pass index rides the join key). Keys are cast to
    # string so heterogeneous key expressions share one array type;
    # cast-to-string is injective for every atomic type Spark has, so
    # key equality is unchanged.
    keyed = df.select(
        F.col(id_col).alias("__id"),
        F.posexplode(
            F.array(*[e.cast("string") for e in block_exprs])
        ).alias("__p", "__blk"),
    ).filter(F.col("__blk").isNotNull())
    a = keyed.select(F.col("__id").alias("id_a"), "__p", "__blk")
    b = keyed.select(F.col("__id").alias("id_b"), "__p", "__blk")
    return (
        a.join(b, ["__p", "__blk"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
