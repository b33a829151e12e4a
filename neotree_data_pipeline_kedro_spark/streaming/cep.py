"""Streaming complex-event-processing: sequence detection with TTL state.

The MATCH_RECOGNIZE / windowFunnel primitive as a Structured Streaming
operator: per key, detect occurrences of event A followed by event B
within ``within_seconds``, emitting one match row per (A, B) pair the
moment B arrives. The batch twins for funnel analytics live in the
registry (a39_funnel_steps, a40_bounce_rate, w11_event_paths); this is
the ONLINE form — alerts, fraud sequences, abandoned-cart triggers —
where re-running the batch window over all history per tick is not an
option.

State per key is the bounded list of pending-A timestamps newer than the
horizon (pruned on every batch, and evicted wholesale by a processing-
time TTL when a key goes quiet), so memory is O(active keys × pending As
within the window), never O(history). The same non-decreasing per-key
arrival contract as sessions.py applies; out-of-order handling would add
a watermark reorder buffer.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def detect_sequence_stream(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    type_col: str,
    first: str,
    then: str,
    within_seconds: int,
    ttl_seconds: int = 3600,
) -> DataFrame:
    """A→B sequence matcher over a (possibly streaming) frame.

    Returns one row per match: (key, first_ts, then_ts, gap_seconds).
    Every pending A matches every qualifying later B (the windowFunnel
    'all pairs within horizon' semantics); an A is dropped from state as
    soon as it can no longer match (older than horizon behind the newest
    event seen for the key).
    """
    out_schema = T.StructType(
        [
            T.StructField(key_col, df.schema[key_col].dataType),
            T.StructField("first_ts", T.TimestampType()),
            T.StructField("then_ts", T.TimestampType()),
            T.StructField("gap_seconds", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [T.StructField("pending", T.ArrayType(T.LongType()))]
    )

    def fn(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        (pending,) = state.get if state.exists else ([],)
        pending = list(pending)
        out_first: list[int] = []
        out_then: list[int] = []
        for pdf in pdfs:
            if pdf.empty:
                continue
            pdf = pdf.sort_values(ts_col)
            ts = pd.to_datetime(pdf[ts_col])
            epoch = (ts.astype("int64") // 1_000_000_000).to_numpy()
            types = pdf[type_col].to_numpy()
            for e, t in zip(epoch, types):
                # prune As that can no longer match anything
                pending = [p for p in pending if e - p <= within_seconds]
                if t == then:
                    for p in pending:
                        out_first.append(int(p))
                        out_then.append(int(e))
                if t == first:
                    pending.append(int(e))
        state.update((pending,))
        state.setTimeoutDuration(ttl_seconds * 1000)
        if out_first:
            yield pd.DataFrame(
                {
                    key_col: [key[0]] * len(out_first),
                    "first_ts": pd.to_datetime(
                        pd.Series(out_first, dtype="int64") * 1_000_000_000
                    ),
                    "then_ts": pd.to_datetime(
                        pd.Series(out_then, dtype="int64") * 1_000_000_000
                    ),
                    "gap_seconds": pd.Series(
                        [b - a for a, b in zip(out_first, out_then)],
                        dtype="int64",
                    ),
                }
            )

    return df.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
