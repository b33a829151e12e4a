"""Confidential-column removal (SURVEY.md §2.2 P6).

One shared redact() covering the reference's four mechanisms:
(a) JSONB key deletion (assorted_queries.py:870-908), (b) keyword-matched
DataFrame column drop (sql_functions.py:1592-1610), (c) ILIKE column drop
(queries/data_fix.py:77-103), (d) metadata ``confidential: true``
(sql_functions.py:1140-1145).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# union of the reference's keyword lists (sql_functions.py:1592-1610 +
# data_fix.py:77-103 ILIKE patterns)
CONFIDENTIAL_KEYWORDS = (
    "dobtob",
    "firstname",
    "lastname",
    "kincell",
    "motherfirstname",
    "mothersurname",
    "nameprefix",
    "phone",
    "address",
)


def confidential_columns(
    columns: Sequence[str],
    extra: Sequence[str] = (),
    keywords: Sequence[str] = CONFIDENTIAL_KEYWORDS,
) -> list[str]:
    """``extra`` (metadata-flagged field keys) matches a column exactly OR
    as the base of a ``Key.value``/``Key.label`` pair — the reference drops
    both columns of a confidential field (sql_functions.py:1140-1145)."""
    kws = tuple(k.lower() for k in keywords)
    extra_l = {e.lower() for e in extra}
    return [
        c
        for c in columns
        if c.lower() in extra_l
        or c.lower().rsplit(".", 1)[0] in extra_l
        or any(k in c.lower() for k in kws)
    ]


def redact(
    df: DataFrame,
    metadata_confidential: Sequence[str] = (),
    keywords: Sequence[str] = CONFIDENTIAL_KEYWORDS,
    map_cols: Sequence[str] = (),
) -> DataFrame:
    """Drop confidential columns by keyword + metadata list; for map-typed
    columns (the parsed session ``entries``), remove confidential keys with
    ``map_filter`` instead of dropping the column."""
    drop = confidential_columns(df.columns, metadata_confidential, keywords)
    out = df.drop(*drop)
    kws = tuple(k.lower() for k in keywords)
    meta_l = [m.lower() for m in metadata_confidential]

    def _confidential(k):
        cond = F.lit(False)
        if meta_l:
            cond = cond | F.lower(k).isin(*meta_l)
        if kws:
            cond = cond | F.lower(k).rlike("|".join(kws))
        return cond

    for mc in map_cols:
        if mc in out.columns:
            out = out.withColumn(
                mc, F.map_filter(F.col(mc), lambda k, _v: ~_confidential(k))
            )
    return out


def k_anonymity_groups(
    df: DataFrame,
    quasi_cols: Sequence[str],
    k: int,
    measures: Sequence[tuple[str, str]] = (),
) -> DataFrame:
    """k-anonymity publishing guard: aggregate by the quasi-identifier
    columns and FLAG every group smaller than ``k`` — the release rule
    for person-derived aggregates (a county×week×age-bucket cell of 2
    patients re-identifies them; the reference redacts confidential
    COLUMNS (P6), this guards confidential GROUP SIZES, the other half
    of safe publishing).

    Suppressed groups are flagged, not dropped, so the publisher can
    both filter them out AND report how much data the suppression cost
    (sum of n_rows where suppressed). ``measures`` adds
    (column, 'sum'|'min'|'max') aggregates to the released cells; they
    are computed for suppressed cells too but must be dropped with them.

    One partial-agg shuffle on the quasi key; the flag is a free
    post-aggregation expression.
    """
    aggs = [F.count(F.lit(1)).alias("n_rows")] + [
        getattr(F, how)(F.col(c)).alias(f"{how}_{c}") for c, how in measures
    ]
    return (
        df.groupBy(*quasi_cols)
        .agg(*aggs)
        .withColumn("suppressed", F.col("n_rows") < F.lit(k))
    )

