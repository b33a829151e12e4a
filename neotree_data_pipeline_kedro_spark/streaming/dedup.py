"""Streaming dedup (SURVEY.md §2.9 / §2.3 D1+S2 in streaming form).

The reference's import path skips sessions whose (uid, scriptid) already
exist in the sink (import_raw_jsons.py:217-229) and its batch dedup keeps
the last upload per key (assorted_queries.py:235-289). On an unbounded
stream "last" is unknowable, so the streaming mapping is the standard one:
FIRST arrival per key wins, with duplicate suppression guaranteed inside
the watermark horizon (`dropDuplicatesWithinWatermark`); a duplicate
arriving after state eviction re-emits, exactly the window the batch
anti-join (`streaming/incremental.py`) closes on the next cron pass. The
two layers compose: the stream suppresses near-time duplicates with
bounded state, the batch NOT-EXISTS remains the durable guard.

State size is #distinct keys inside the horizon, not the stream length —
the property that makes this safe on an unbounded 100 TB/day feed.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def dedup_stream(
    events: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    watermark: str = "10 minutes",
) -> DataFrame:
    """First-arrival-wins streaming dedup on ``keys`` with duplicate
    suppression guaranteed within ``watermark`` of event time."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )
