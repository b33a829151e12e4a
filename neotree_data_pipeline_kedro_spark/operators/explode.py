"""Unnest/explode operator family (SURVEY.md §2.7).

Reference: MCL pandas ``DataFrame.explode`` per multi-choice column
(explode_mcl_columns.py:8-43), Postgres
``unnest(string_to_array(col, ','))``
(create_summary_discharge_diagnosis_sql.py:3-12).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def explode_mcl(
    df: DataFrame,
    id_cols: Sequence[str],
    mcl_col: str,
    drop_values: Sequence[str] = ("Other",),
) -> DataFrame:
    """One row per (ids, selected option) for an array-typed MCL column;
    ``Other``/null rows dropped (explode_mcl_columns.py:33-35)."""
    out = df.select(*id_cols, F.explode(F.col(mcl_col)).alias(mcl_col))
    out = out.filter(F.col(mcl_col).isNotNull())
    if drop_values:
        out = out.filter(~F.col(mcl_col).isin(*drop_values))
    return out


def explode_delimited(
    df: DataFrame,
    id_cols: Sequence[str],
    col: str,
    delimiter: str = ",",
    out_col: str | None = None,
    trim: bool = True,
) -> DataFrame:
    """``unnest(string_to_array(col, ','))`` — one row per delimited token,
    null/empty tokens dropped (create_summary_discharge_diagnosis_sql.py:3-12)."""
    out_col = out_col or col
    tok = F.explode(F.split(F.col(col), delimiter)).alias(out_col)
    out = df.filter(F.col(col).isNotNull()).select(*id_cols, tok)
    if trim:
        out = out.withColumn(out_col, F.trim(F.col(out_col)))
    return out.filter(F.col(out_col) != "")
