"""Incremental aggregate maintenance — the batch counterpart of
streaming/windows.py. The reference rebuilds its summary/indicator rollups
from the full history every cron run
(queries/create_summary_counts_sql.py:4-37); at 100 TB that rescan IS the
pipeline cost. Decomposable aggregates (sum/count/min/max — and avg as
sum+count) merge instead: aggregate only the NEW batch, then combine with
the stored rollup on the group keys. Each cron cycle touches delta-sized
data plus the (small) rollup table.

Caveats by construction: min/max cannot be maintained under DELETES
(a retracted row may have been the extreme) — this operator is for
append-only feeds (the engine's ingest is, via the J4 anti-join contract);
non-decomposable aggregates (exact distinct, exact percentiles) need their
sketch forms (HLL/KLL, see operators/validation.column_profile) to merge.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MERGEABLE = ("sum", "count", "min", "max")


def partial_rollup(
    delta: DataFrame, keys: Sequence[str], measures: Mapping[str, str]
) -> DataFrame:
    """Aggregate one raw batch into rollup form. ``measures`` maps an input
    column to 'sum' | 'count' | 'min' | 'max'; output columns are named
    ``{agg}_{col}`` (``count_*`` counts non-null values of the column,
    matching SQL COUNT(col))."""
    aggs = []
    for col, how in measures.items():
        if how not in _MERGEABLE:
            raise ValueError(
                f"measure {col!r}: {how!r} is not mergeable; use "
                f"one of {_MERGEABLE} (avg = sum+count; distinct/percentile "
                "need sketch forms)"
            )
        fn = getattr(F, how)
        aggs.append(fn(F.col(col)).alias(f"{how}_{col}"))
    return delta.groupBy(*keys).agg(*aggs)


def merge_rollup(
    stored: DataFrame | None,
    delta_rollup: DataFrame,
    keys: Sequence[str],
    measures: Mapping[str, str],
) -> DataFrame:
    """Combine a stored rollup with a new batch's partial rollup:
    full-outer join on ``keys``, sums/counts add, mins/maxes combine —
    groups only in one side pass through unchanged. ``stored=None`` (first
    cycle) returns the delta rollup as-is. Associative and commutative, so
    any batch arrival order folds to the same table as a full recompute
    (pinned by test + oracle)."""
    if stored is None:
        return delta_rollup
    s = stored.alias("s")
    d = delta_rollup.alias("d")
    joined = s.join(d, list(keys), "full_outer")
    out_cols = [F.col(k) for k in keys]
    for col, how in measures.items():
        name = f"{how}_{col}"
        sc, dc = F.col(f"s.{name}"), F.col(f"d.{name}")
        if how in ("sum", "count"):
            zero = F.lit(0)
            combined = F.when(
                sc.isNull() & dc.isNull(), F.lit(None)
            ).otherwise(F.coalesce(sc, zero) + F.coalesce(dc, zero))
        elif how == "min":
            combined = F.least(sc, dc)  # least/greatest ignore nulls
        else:
            combined = F.greatest(sc, dc)
        out_cols.append(combined.alias(name))
    return joined.select(*out_cols)


def delta_join(
    a_old: DataFrame,
    a_delta: DataFrame,
    b_old: DataFrame,
    b_delta: DataFrame,
    on: Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """Incremental INNER-join maintenance for append-only inputs:
    Δ(A ⋈ B) = ΔA ⋈ B_old  ∪  A_old ⋈ ΔB  ∪  ΔA ⋈ ΔB.

    Append the result to the stored join and it equals a full recompute
    of (A_old ∪ ΔA) ⋈ (B_old ∪ ΔB) — the algebraic identity the oracle
    and tests pin. The per-cron cost is each DELTA side against the other
    STORED side (never stored × stored, which is the rescan this operator
    exists to delete); with the stored tables bucketed on the join key
    (sources/warehouse.py), only the delta sides shuffle.

    Inner joins only: outer joins need retraction handling (a formerly
    unmatched row becomes matched), which an append-only delta cannot
    express — maintain those as two anti-join-guarded sides instead.
    """
    if how != "inner":
        raise ValueError(
            "delta_join maintains INNER joins; outer joins need retractions"
        )
    keys = list(on)
    return (
        a_delta.join(b_old, keys)
        .unionByName(a_old.join(b_delta, keys))
        .unionByName(a_delta.join(b_delta, keys))
    )


def bitmap_distinct_state(
    df: DataFrame, key: str, id_col: str
) -> DataFrame:
    """(key, __word, __bits) EXACT distinct-count bitmap state — the
    roaring-bitmap idea as plain DataFrame algebra: dense integer ids
    are bucketed into 64-bit words (``id DIV 64``) and OR-folded into a
    bigint per (key, word). The state is tiny (⌈id-space/64⌉ words per
    key), MERGEABLE (word-wise bit_or — associative + commutative, so
    partial aggregation absorbs skew), and exact, unlike HLL. This is
    the production shape for COUNT(DISTINCT) rollup tables: store the
    bitmap state per fine grain, re-aggregate it to any coarser grain
    without touching raw events again.
    """
    return df.groupBy(
        F.col(key),
        F.expr(f"CAST({id_col} DIV 64 AS INT)").alias("__word"),
    ).agg(
        F.expr(
            f"bit_or(shiftleft(CAST(1 AS BIGINT), CAST({id_col} % 64 AS INT)))"
        ).alias("__bits")
    )


def bitmap_merge_to(
    state: DataFrame, key: str, new_key
) -> DataFrame:
    """Re-aggregate bitmap state to a coarser grain: group the fine keys
    under ``new_key`` (a Column over the fine key) and bit_or word-wise.
    No raw data touched — sketch-merge only."""
    return state.groupBy(
        new_key.alias(key), F.col("__word")
    ).agg(F.expr("bit_or(__bits)").alias("__bits"))


def bitmap_count(state: DataFrame, key: str, out: str) -> DataFrame:
    """Finalize bitmap state to exact distinct counts: popcount each
    word, sum per key."""
    return state.groupBy(key).agg(
        F.expr("CAST(SUM(bit_count(__bits)) AS BIGINT)").alias(out)
    )
