"""Privacy-preserving release operators.

The reference's privacy surface is redaction (confidential.py) and the
k-anonymity publishing guard; this module adds the release-side
counterpart a data-sharing pipeline needs: differentially-private noisy
counts. The twist that makes it testable cross-engine: the noise is a
DETERMINISTIC function of (group key, salt) via the same md5-hex-ladder
trick as ``hash_gate`` (operators/sampling.py) — a uniform draw is "the
md5 hex digest compared against precomputed hex thresholds", and the
discrete-Laplace inverse CDF becomes a CASE ladder whose constants are
plain hex string literals any engine compares identically. No ln(), no
float CDF evaluation at query time, no cross-engine transcendental
drift (the ladder thresholds are computed ONCE in Python and embedded
as literals on both sides).

Determinism caveat, stated loudly: seeding noise from the group key
means re-running the query re-releases the SAME noise — correct for
reproducible pipelines and for privacy accounting of a single release,
but a production deployment must rotate ``salt`` per release (the noise
draw must be unpredictable to the adversary, and fresh randomness per
release is what the epsilon budget accounts).
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def laplace_hex_ladder(
    eps: float = 1.0, kmax: int = 10, digits: int = 6
) -> list[tuple[str, int]]:
    """Inverse-CDF thresholds for the two-sided geometric (discrete
    Laplace) distribution truncated to [-kmax, kmax]: P(k) ∝ exp(-eps*|k|).

    Returns [(hex_threshold, k), ...] in ascending-k order; a uniform
    hex draw u maps to the first k with u < hex_threshold (the final
    entry's threshold is 'g…', lexicographically above every hex digest,
    so the ladder is total). Thresholds are ``digits``-hex-digit string
    literals — both Spark and any SQL oracle compare them against
    md5-hex identically, so the draw is bit-reproducible cross-engine.
    """
    a = math.exp(-eps)
    weights = [a ** abs(k) for k in range(-kmax, kmax + 1)]
    total = sum(weights)
    ladder: list[tuple[str, int]] = []
    cum = 0.0
    scale = 16**digits
    for k, w in zip(range(-kmax, kmax + 1), weights):
        cum += w / total
        if k == kmax:
            ladder.append(("g" * digits, k))  # catch-all above any hex
        else:
            ladder.append((format(min(int(cum * scale), scale - 1), f"0{digits}x"), k))
    return ladder


def dp_noisy_counts(
    df: DataFrame,
    group_cols: Sequence[str],
    *,
    eps: float = 1.0,
    kmax: int = 10,
    salt: str = "dp1",
) -> DataFrame:
    """Differentially-private group counts: exact count per group plus
    discrete-Laplace noise drawn deterministically from
    md5(group key || salt) through ``laplace_hex_ladder``.

    Scale shape: ONE partial-aggregated count shuffle (the same plan as
    a plain groupBy-count) plus per-group scalar expressions — noise
    costs nothing at 100 TB. Negative releases are kept (clamping biases
    the estimator; consumers post-process).
    """
    group_cols = list(group_cols)
    counts = df.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("n_true"))
    key = F.concat_ws("|", *[F.col(c).cast("string") for c in group_cols])
    h = F.md5(F.concat(key, F.lit("|" + salt)))
    noise: Column | None = None
    expr = None
    for thr, k in laplace_hex_ladder(eps, kmax):
        cond = h < F.lit(thr)
        if expr is None:
            expr = F.when(cond, F.lit(k))
        else:
            expr = expr.when(cond, F.lit(k))
    noise = expr.otherwise(F.lit(kmax))
    return counts.select(
        *group_cols,
        (F.col("n_true") + noise).cast("bigint").alias("n_noisy"),
    )
