"""Operator-level contracts for operators/timeseries.py — the semantic
edges the registry oracle can't isolate: no-backfill, gap-bin visibility,
clamp idempotence, and the short-circuit cases."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from neotree_data_pipeline_kedro_spark.operators.timeseries import (
    forward_fill,
    resample_grid,
    winsorize,
)


def _ts(day: int, hour: int = 0) -> datetime.datetime:
    return datetime.datetime(2024, 1, day, hour)


@pytest.fixture(scope="module")
def series(spark):
    rows = [
        # key "a": observation on day 1 and day 4; nulls between
        ("a", _ts(1), 1, 10.0),
        ("a", _ts(2), 2, None),
        ("a", _ts(4), 3, 40.0),
        ("a", _ts(6), 4, None),
        # key "b": leading null must STAY null (no backfill)
        ("b", _ts(1), 5, None),
        ("b", _ts(3), 6, 7.0),
    ]
    return spark.createDataFrame(rows, "k string, ts timestamp, id int, v double")


def test_forward_fill_carries_and_never_backfills(series):
    out = {
        (r.k, r.id): r.ffill_v
        for r in forward_fill(
            series, ["k"], "ts", ["v"], tiebreak=["id"]
        ).collect()
    }
    assert out[("a", 1)] == 10.0
    assert out[("a", 2)] == 10.0  # carried
    assert out[("a", 3)] == 40.0  # replaced by newer observation
    assert out[("a", 4)] == 40.0
    assert out[("b", 5)] is None  # before first observation: NO backfill
    assert out[("b", 6)] == 7.0


def test_forward_fill_tiebreak_orders_same_timestamp(spark):
    rows = [("k", _ts(1), 1, 5.0), ("k", _ts(1), 2, 9.0), ("k", _ts(2), 3, None)]
    df = spark.createDataFrame(rows, "k string, ts timestamp, id int, v double")
    out = {r.id: r.ffill_v for r in forward_fill(df, ["k"], "ts", ["v"], ["id"]).collect()}
    assert out[3] == 9.0  # highest tiebreak at the tied timestamp wins


def test_resample_grid_emits_gap_bins_with_zero_events(series):
    out = resample_grid(series, ["k"], "ts", "v", step="1 day")
    a = {r.bin_ts.day: r for r in out.filter("k = 'a'").collect()}
    # span day 1..6 inclusive: all six bins exist
    assert sorted(a) == [1, 2, 3, 4, 5, 6]
    assert a[3].n_events == 0 and a[5].n_events == 0  # gap bins explicit
    assert a[2].n_events == 1  # null-valued event still counts as an event
    assert a[3].bin_sum is None  # observed sum stays null on gaps...
    assert float(a[3].filled_sum) == 10.0  # ...but the carry fills it
    assert float(a[5].filled_sum) == 40.0


def test_resample_grid_rejects_unknown_step(series):
    with pytest.raises(ValueError):
        resample_grid(series, ["k"], "ts", "v", step="17 fortnights")


def test_winsorize_clamps_only_outside_the_envelope(spark):
    df = spark.createDataFrame(
        [("g", float(v)) for v in range(1, 101)], "g string, x double"
    )
    out = winsorize(df, "x", group_cols=["g"], lower=0.05, upper=0.95)
    rows = out.collect()
    lo, hi = rows[0].w_lo, rows[0].w_hi
    # quantile_cont on 1..100: p05 = 5.95, p95 = 95.05
    assert abs(lo - 5.95) < 1e-9 and abs(hi - 95.05) < 1e-9
    for r in rows:
        assert r.x_w == min(max(r.x, lo), hi)
    # interior values are untouched
    assert all(r.x_w == r.x for r in rows if lo <= r.x <= hi)


def test_winsorize_ungrouped_uses_global_envelope(spark):
    df = spark.createDataFrame([(float(v),) for v in [1, 2, 3, 1000]], "x double")
    out = winsorize(df, "x", lower=0.0, upper=0.5)
    assert {r.x_w for r in out.collect()} == {1.0, 2.0, 2.5}


def test_interval_concurrency_matches_bruteforce(spark):
    import datetime as dt

    from neotree_data_pipeline_kedro_spark.operators.windows import (
        interval_concurrency,
    )

    D = dt.datetime
    # overlapping, nested, touching, and instant-swap ([a,b) then [b,c))
    iv = [
        (D(2024, 1, 1), D(2024, 1, 5)),
        (D(2024, 1, 2), D(2024, 1, 3)),   # nested
        (D(2024, 1, 3), D(2024, 1, 7)),   # starts exactly when one ends
        (D(2024, 1, 5), D(2024, 1, 6)),
        (D(2024, 1, 10), D(2024, 1, 11)),  # isolated
    ]
    df = spark.createDataFrame(iv, "s timestamp, e timestamp")
    got = {
        r.t: r.concurrency
        for r in interval_concurrency(df, "s", "e").collect()
    }
    # brute force: at instant t, count of intervals with s <= t < e
    boundaries = sorted({t for pair in iv for t in pair})
    want = {
        t: sum(1 for s, e in iv if s <= t < e) for t in boundaries
    }
    assert got == want
    # half-open semantics: at Jan 3 the nested interval is gone and the
    # touching one is active — net concurrency stays 2
    assert got[D(2024, 1, 3)] == 2
    assert got[D(2024, 1, 11)] == 0  # all closed at the end


def test_median_polish_plan_constant(spark):
    """The r7 verdict flagged median_polish's un-truncated lineage: each
    sweep's plan re-derived every earlier sweep (91 exchanges at
    iterations=2, growing geometrically). With the per-sweep
    flat_checkpoint the FINAL plan must be iteration-independent: the
    last sweep always reads the previous materialization, so doubling
    iterations must not grow the explain string (small wobble allowed
    for RDD ids), and the result must stay the exact same decomposition."""
    import io
    import contextlib

    from neotree_data_pipeline_kedro_spark.operators.timeseries import (
        median_polish,
    )

    rows = [
        (r, c, (r * 7 + c * 13 + (r * c) % 5) * 100)
        for r in range(6)
        for c in range(5)
    ]
    df = spark.createDataFrame(rows, "r int, c int, y bigint")

    def explain_len(iters: int) -> int:
        out = median_polish(df, "r", "c", "y", iterations=iters)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            out.explain("formatted")
        return len(buf.getvalue())

    l2 = explain_len(2)
    l4 = explain_len(4)
    # iteration-count must not grow the final plan (was ~2x per sweep
    # pre-fix); 10% slack covers RDD-id digit drift in scan names
    assert l4 <= l2 * 1.1, (l2, l4)
    # and the identity still holds at iterations=4
    from neotree_data_pipeline_kedro_spark.operators.timeseries import (
        median_polish as mp,
    )

    got = mp(df, "r", "c", "y", iterations=4).collect()
    assert all(r.y == r.row_effect + r.col_effect + r.residual for r in got)
