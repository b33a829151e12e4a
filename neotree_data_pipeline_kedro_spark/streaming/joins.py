"""Stream-stream interval join (SURVEY.md §2.9 streaming surface).

The reference's admission↔discharge and vitals↔episode joins run as batch
NOT-EXISTS/as-of passes per cron cycle; on a live feed the same pairing is
a watermarked stream-stream join with a time-range predicate — Spark keeps
both sides' unmatched rows in state ONLY for the interval bound plus the
watermark delay, then evicts. That bounded-state property is what makes a
join of two unbounded 100 TB/day feeds feasible: state is
rate × (interval + watermark), independent of stream length.

Semantics note: inner results arrive as matches are found; a row whose
partner never arrives inside the horizon is silently dropped. With
``how="leftOuter"`` Spark instead emits the unmatched left row null-padded
— but only once the watermark has passed the row's join horizon (state
eviction time), i.e. unmatched rows surface one watermark-delay late, at a
batch boundary. The batch as-of pass (`operators/joins.asof_join`) remains
the durable backfill for late partners, the same stream+batch composition
as streaming/dedup.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    *,
    lower: str = "0 seconds",
    upper: str = "1 hour",
    watermark: str = "30 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join two streams on ``key`` where
    ``right_ts ∈ [left_ts - lower, left_ts + upper]``; ``how`` is
    ``inner`` or ``leftOuter`` (unmatched left rows null-padded once
    their horizon expires — see module docstring).

    Both sides get the same watermark; Spark derives each side's state
    retention from the watermark plus the interval bounds (the
    JOIN-condition time range is what licenses state eviction — an
    unconstrained stream-stream join would require unbounded state and
    Spark rejects it in append mode).
    """
    l_wm = left.withWatermark(left_ts, watermark)
    r_wm = right.withWatermark(right_ts, watermark)
    cond = (
        (l_wm[key] == r_wm[key])
        & (
            r_wm[right_ts]
            >= l_wm[left_ts] - F.expr(f"INTERVAL {lower}")
        )
        & (
            r_wm[right_ts]
            <= l_wm[left_ts] + F.expr(f"INTERVAL {upper}")
        )
    )
    if how not in ("inner", "leftOuter"):
        raise ValueError(f"how must be inner or leftOuter, got {how!r}")
    return l_wm.join(r_wm, cond, how).drop(r_wm[key])


def enrich_stream_with_dim(
    stream: DataFrame,
    dim: DataFrame,
    keys,
    *,
    broadcast: bool = True,
    how: str = "left",
) -> DataFrame:
    """Stream-static enrichment join — the most common production
    streaming shape (fact feed + slowly-changing dimension): each
    micro-batch joins the CURRENT static frame, no streaming state at
    all. The reference does this per cron cycle when tagging sessions
    with facility/script metadata (catalog routing + hospitals map);
    on a live feed the same lookup rides every micro-batch.

    ``broadcast=True`` hints the dim side — correct for genuinely
    dimension-sized tables (facility registry, script catalog); pass
    False for sf-growing sides and let AQE decide (the g6 standard).
    Note Spark re-plans the static side each micro-batch, so a dim
    backed by a mutable table (Delta, refreshed view) picks up updates
    between batches — the streaming form of a slowly-changing lookup;
    a plain parquet read snapshots per-batch file listing instead.
    """
    d = F.broadcast(dim) if broadcast else dim
    return stream.join(d, list(keys), how)
