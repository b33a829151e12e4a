"""Linear quality-probe training — the fastText-style classifier gate.

Modern pretraining pipelines train a SMALL classifier (quality filter,
domain router, language verifier) on document features and then score
the whole corpus with it (GPT-3's quality filter, CCNet, DCLM). The
scale shape is always the same and is what this module pins:

1. the corpus-sized pass is ONE aggregate — the normal-equation sums
   X^T X and X^T y, accumulated as EXACT integers (features are integer
   counts), so the result is bit-identical on any partitioning;
2. the solve is a driver-side O(d^3) step on a d x d matrix;
3. scoring the corpus is a pure per-row expression with the learned
   weights embedded as literals — no shuffle, no Python.

Ridge (L2) regression on a 0/1 label = a linear-probability probe; it
is deliberately sigmoid-free so step 1 stays in exact integer algebra.
Parity is pinned by an independent numpy twin in pytest (rows-only op:
the solve is not SQL-expressible).
"""
from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, functions as F


def normal_equation_sums(
    df: DataFrame, feature_cols: list[str], label_col: str
) -> tuple[np.ndarray, np.ndarray, int]:
    """One distributed aggregate: exact-integer X^T X (with implicit bias
    column) and X^T y. Features and label must be integer-valued columns
    (counts); returns (A, b, n) as numpy arrays ready to solve."""
    cols = [F.lit(1).cast("long").alias("__x0")] + [
        F.col(c).cast("long").alias(f"__x{i + 1}")
        for i, c in enumerate(feature_cols)
    ]
    d = len(feature_cols) + 1
    base = df.select(*cols, F.col(label_col).cast("long").alias("__y"))
    aggs = []
    for i in range(d):
        for j in range(i, d):
            aggs.append(
                F.sum(F.col(f"__x{i}") * F.col(f"__x{j}"))
                .cast("long")
                .alias(f"a_{i}_{j}")
            )
    for i in range(d):
        aggs.append(
            F.sum(F.col(f"__x{i}") * F.col("__y"))
            .cast("long")
            .alias(f"b_{i}")
        )
    aggs.append(F.count(F.lit(1)).cast("long").alias("n"))
    row = base.agg(*aggs).first()
    A = np.zeros((d, d), dtype=np.float64)
    b = np.zeros(d, dtype=np.float64)
    for i in range(d):
        for j in range(i, d):
            A[i, j] = A[j, i] = float(row[f"a_{i}_{j}"])
        b[i] = float(row[f"b_{i}"])
    return A, b, int(row["n"])


def ridge_probe_train(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    l2: float = 1.0,
) -> list[float]:
    """Solve (X^T X + l2·I) w = X^T y on the driver; returns the weight
    vector [bias, w_1..w_d]. The bias row/col is not regularized."""
    A, b, _ = normal_equation_sums(df, feature_cols, label_col)
    reg = np.eye(A.shape[0]) * float(l2)
    reg[0, 0] = 0.0
    w = np.linalg.solve(A + reg, b)
    return [float(x) for x in w]


def linear_score(feature_cols: list[str], weights: list[float]) -> Column:
    """Per-row score x·w with the learned weights as literals — pure
    JVM-side expression, broadcast-free, shuffle-free."""
    expr = F.lit(weights[0])
    for c, w in zip(feature_cols, weights[1:]):
        expr = expr + F.col(c).cast("double") * F.lit(w)
    return expr
