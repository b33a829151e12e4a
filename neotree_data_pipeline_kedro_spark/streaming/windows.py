"""Watermarked windowed aggregation (SURVEY.md §2.9 — streaming form of A2).

The reference recomputes its monthly indicator rollup from scratch every
cron run (queries/create_summary_counts_sql.py:4-37); late-arriving
sessions are picked up because the whole table is rebuilt. The streaming
form keeps the rollup continuously current instead: event-time windows
grouped per key, a watermark bounding how late data may arrive, append-mode
emission once a window is final. State per open window is one partial
aggregate row — the full-history rebuild disappears.

Late data semantics (verified against Spark's actual behavior, pinned by
test): the watermark is a LOWER bound on state retention, not an exact
cutoff. A row later than ``late_threshold`` still merges into its window if
that window's state has not been evicted yet (eviction happens during the
first batch whose start-of-batch watermark passes the window end); only
rows arriving after eviction are dropped (numRowsDroppedByWatermark). The
reference's NOT-EXISTS rebuild accepts arbitrarily late rows at the cost
of full recomputation; pick the threshold to match the ingestion SLA.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def windowed_indicator_rollup(
    df: DataFrame,
    ts_col: str,
    window_duration: str,
    late_threshold: str,
    keys: Sequence[str] = (),
    indicators: dict[str, Column] | None = None,
) -> DataFrame:
    """Event-time windowed conditional-count rollup over a streaming frame.

    ``indicators`` maps output column name → boolean/0-1 Column (the A2
    CASE-WHEN-1 family, e.g. death/discharge/premature flags); each is
    summed within (window, *keys). Works identically on batch frames (the
    watermark is a no-op there), so one definition serves both the cron-
    style rebuild and the continuous query.
    """
    indicators = indicators or {}
    aggs = [F.count("*").alias("n_rows")] + [
        F.sum(expr.cast("long")).alias(name) for name, expr in indicators.items()
    ]
    return (
        df.withWatermark(ts_col, late_threshold)
        .groupBy(F.window(ts_col, window_duration).alias("w"), *keys)
        .agg(*aggs)
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *keys,
            "n_rows",
            *indicators.keys(),
        )
    )


def session_window_rollup(
    df: DataFrame,
    ts_col: str,
    gap: str,
    late_threshold: str,
    keys: Sequence[str],
    indicators: dict[str, Column] | None = None,
) -> DataFrame:
    """Gap-based session aggregation on a stream via the NATIVE
    ``session_window`` operator — the declarative sibling of
    streaming/sessions.py's ``applyInPandasWithState`` sessionizer. Spark
    maintains one state row per open session per key, MERGES sessions
    when a new event lands within ``gap`` of either side (including
    bridging two previously-separate sessions), and emits a finalized row
    once the watermark passes session end + gap.

    Use this form when the output is an aggregate per session (counts /
    sums / bounds); use the applyInPandasWithState form when rows must be
    LABELED with their episode id as they flow through (the native
    operator only emits per-session rollups, not per-row tags).

    Output: keys..., session_start, session_end, n_rows, one column per
    indicator (conditional count).
    """
    aggs = [F.count(F.lit(1)).alias("n_rows")] + [
        F.sum(F.when(cond, 1).otherwise(0)).alias(name)
        for name, cond in (indicators or {}).items()
    ]
    return (
        df.withWatermark(ts_col, late_threshold)
        .groupBy(*keys, F.session_window(F.col(ts_col), gap).alias("sw"))
        .agg(*aggs)
        .select(
            *keys,
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_rows",
            *[F.col(n) for n in (indicators or {})],
        )
    )
