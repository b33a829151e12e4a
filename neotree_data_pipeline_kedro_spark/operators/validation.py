"""Data-quality validation (SURVEY.md §2.11; A6).

The reference runs a great_expectations suite per pipeline execution
(data_validation/validate.py:141-888) and emails a PDF. Here: the same
checks computed as aggregation DataFrames → a metrics table. No email/PDF.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def null_rates(df: DataFrame, columns: Sequence[str] | None = None) -> DataFrame:
    """Per-column null rate (validate.py:660-674), single pass."""
    cols = list(columns or df.columns)
    aggs = [F.count("*").alias("__n")] + [
        F.sum(F.col(c).isNull().cast("long")).alias(f"__null_{i}")
        for i, c in enumerate(cols)
    ]
    row = df.agg(*aggs)
    stacked = row.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column_name"),
                        F.col(f"__null_{i}").alias("null_count"),
                        F.col("__n").alias("row_count"),
                    )
                    for i, c in enumerate(cols)
                ]
            )
        ).alias("m")
    ).select("m.*")
    return stacked.withColumn(
        "null_rate",
        F.col("null_count") / F.greatest(F.col("row_count"), F.lit(1)),
    )


def duplicate_keys(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Duplicate-uid detection (validate.py:319-323): keys with count > 1."""
    return (
        df.groupBy(*keys)
        .agg(F.count("*").alias("n_rows"))
        .filter(F.col("n_rows") > 1)
    )


def iqr_outliers(
    df: DataFrame, column: str, factor: float = 3.0, rel_err: float = 0.001
) -> DataFrame:
    """IQR outlier rows: outside Q1/Q3 ± factor·IQR (validate.py:713-745).
    Quantiles via approxQuantile (distributed sketch, no sort)."""
    q1, q3 = df.approxQuantile(column, [0.25, 0.75], rel_err)
    iqr = q3 - q1
    lo, hi = q1 - factor * iqr, q3 + factor * iqr
    return df.filter((F.col(column) < lo) | (F.col(column) > hi))


def range_violations(
    df: DataFrame, column: str, min_value: float | None, max_value: float | None
) -> DataFrame:
    """Metadata min/max range check (validate.py:100-138,427-451)."""
    c = F.col(column).cast("double")
    cond = F.lit(False)
    if min_value is not None:
        cond = cond | (c < min_value)
    if max_value is not None:
        cond = cond | (c > max_value)
    return df.filter(cond)


def type_conformance(df: DataFrame, column: str, expected: str) -> DataFrame:
    """Regex type-conformance rates (validate.py:469-564): fraction of
    non-null values NOT parseable as the expected logical type."""
    c = F.col(column).cast("string")
    rx = {
        "numeric": r"^-?\d+(\.\d+)?$",
        "boolean": r"(?i)^(y|yes|true|t|1|1\.0|n|no|false|f|0|0\.0)$",
        "datetime": r"^\d{4}[-/.]\d{1,2}[-/.]\d{1,2}([T ].*)?$",
    }[expected]
    return df.agg(
        F.lit(column).alias("column_name"),
        F.lit(expected).alias("expected_type"),
        F.sum(F.when(c.isNotNull() & ~c.rlike(rx), 1).otherwise(0)).alias(
            "nonconforming"
        ),
        F.sum(c.isNotNull().cast("long")).alias("non_null"),
    )
