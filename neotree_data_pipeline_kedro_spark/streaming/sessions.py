"""Stateful streaming sessionization (SURVEY.md §2.9 / §2.6 W3).

The reference's episode machinery is a batch pandas cumsum re-run by cron
(tidy_admissions_discharges_and_create_mcl_tables.py:293-315). The batch
twin lives in operators/windows.py (episode_sessionize / gap_sessionize);
this module is the Structured Streaming form: per-key GroupState carries
(last basis value, episode counter) across micro-batches via
``applyInPandasWithState``, so episodes keep numbering continuously as new
files/batches arrive instead of recomputing the whole history.

Contract: events must arrive in non-decreasing ``ts_col`` order per key
across batches (the reference's cron + NOT-EXISTS ingestion guarantees
this — each run appends strictly newer sessions). Within one micro-batch,
rows are sorted per key before state is applied, so intra-batch order is
free; cross-batch disorder would need a watermark + reordering buffer the
reference has no equivalent for.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def sessionize_stream(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    out_col: str = "episode",
    gap_seconds: int | None = None,
) -> DataFrame:
    """Streaming episode sessionization over a (possibly streaming) frame.

    Default basis is the calendar date of ``ts_col`` — a new episode starts
    whenever the date changes within a key, exactly the W3 batch semantics.
    With ``gap_seconds`` the basis becomes inactivity: a new episode starts
    when the previous event is more than ``gap_seconds`` older
    (gap_sessionize twin, whole-second granularity).

    State per key is two scalars (last epoch value, episode counter) —
    constant memory per key regardless of history length, which is what
    makes this viable over unbounded streams where the batch window
    (full-history shuffle) is not.
    """
    out_schema = T.StructType(
        [
            T.StructField(key_col, df.schema[key_col].dataType),
            T.StructField(ts_col, T.TimestampType()),
            T.StructField(out_col, T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("last_basis", T.LongType()),
            T.StructField("episode", T.LongType()),
        ]
    )

    def fn(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        last_basis, episode = state.get if state.exists else (None, 0)
        for pdf in pdfs:
            if pdf.empty:
                continue
            pdf = pdf.sort_values(ts_col)
            ts = pd.to_datetime(pdf[ts_col])
            epoch = (ts.astype("int64") // 1_000_000_000).to_numpy()
            # date-change basis = days since epoch; gap basis = raw seconds
            basis = epoch // 86_400 if gap_seconds is None else epoch
            episodes = []
            for b in basis:
                if last_basis is None or (
                    (b != last_basis)
                    if gap_seconds is None
                    else (b - last_basis) > gap_seconds
                ):
                    episode += 1
                last_basis = int(b)
                episodes.append(episode)
            yield pd.DataFrame(
                {
                    key_col: pdf[key_col].to_numpy(),
                    ts_col: ts,
                    out_col: episodes,
                }
            )
        state.update((last_basis, episode))

    return df.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
