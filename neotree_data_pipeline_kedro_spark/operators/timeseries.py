"""Time-series conditioning operators: forward-fill, regular-grid
resampling, and quantile winsorization.

These extend the §2.6 window family (operators/windows.py) toward the
feature-engineering shapes a large-scale training pipeline needs: the
reference's as-of machinery (merge_admissions_discharges, matching.py)
carries the *latest* observation onto a single probe row; these carry it
onto every subsequent row (LOCF), onto a dense regular grid (resample),
or clamp a column into its per-group quantile envelope (winsorize).

Scale shapes:
- forward_fill: ONE window shuffle on the entity key; `last(ignorenulls)`
  is linear per partition with O(1) state — no self-join, no driver work.
- resample_grid: per-key bounds agg (one shuffle) → `sequence`/`explode`
  builds the grid IN the executors (rows materialize map-side, never on
  the driver) → left join observed bins on the same key → LOCF window.
  Grid size is bounded by span/step per key; callers choose the step so
  a key's grid fits a partition (the natural contract for per-entity
  series).
- winsorize: exact per-group percentile bounds (tiny: one row per group)
  broadcast back onto the fact side — the fact table is scanned once and
  never shuffled.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def forward_fill(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_cols: Sequence[str],
    tiebreak: Sequence[str] = (),
    out_prefix: str = "ffill_",
) -> DataFrame:
    """Last-observation-carried-forward per key: each row gains
    ``{out_prefix}{col}`` = the latest non-null value of ``col`` at or
    before its timestamp. Null until the first observation (no backfill —
    that would leak the future into training features).

    A unique total order is part of the contract: pass ``tiebreak`` when
    ``ts_col`` can repeat within a key.
    """
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in tiebreak]
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df
    for c in value_cols:
        out = out.withColumn(
            f"{out_prefix}{c}", F.last(c, ignorenulls=True).over(w)
        )
    return out


def resample_grid(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    step: str = "1 day",
    fill: bool = True,
) -> DataFrame:
    """Resample an irregular event series onto a dense regular grid per
    key: bin events to ``step`` boundaries (sum of ``value_col`` as exact
    decimal + count per bin), emit EVERY grid point between each key's
    first and last bin, and — when ``fill`` — carry the last observed bin
    sum forward across the gaps (``filled_sum``; gap bins keep
    ``n_events = 0`` so imputation stays distinguishable from data).

    Output: (key..., bin_ts, n_events, bin_sum, filled_sum?).
    """
    keys = list(key_cols)
    bin_ts = F.date_trunc("day", F.col(ts_col)) if step == "1 day" else None
    if bin_ts is None:
        raise ValueError(f"unsupported step {step!r}; extend the trunc map")
    binned = (
        df.withColumn("bin_ts", bin_ts)
        .groupBy(*keys, "bin_ts")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col(value_col).cast("decimal(18,6)")).alias("bin_sum"),
        )
    )
    spans = binned.groupBy(*keys).agg(
        F.min("bin_ts").alias("__lo"), F.max("bin_ts").alias("__hi")
    )
    grid = spans.select(
        *keys,
        F.explode(
            F.sequence(F.col("__lo"), F.col("__hi"), F.expr(f"INTERVAL {step}"))
        ).alias("bin_ts"),
    )
    out = (
        grid.join(binned, keys + ["bin_ts"], "left")
        .withColumn("n_events", F.coalesce("n_events", F.lit(0)))
    )
    if fill:
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col("bin_ts").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        out = out.withColumn(
            "filled_sum", F.last("bin_sum", ignorenulls=True).over(w)
        )
    return out


def winsorize(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str] = (),
    lower: float = 0.05,
    upper: float = 0.95,
    out_col: str | None = None,
) -> DataFrame:
    """Clamp ``value_col`` into its per-group exact quantile envelope
    [p_lower, p_upper] — the standard outlier-capping step before scale-
    sensitive featurization. Exact interpolated percentiles (the
    quantile_cont definition, same as a10) keep the bounds deterministic;
    the 100 TB path swaps in percentile_approx with the error bound pinned
    in tests/test_validation.py.

    Adds ``{out_col}`` (default ``{value_col}_w``) plus the bounds
    (``__lo``/``__hi`` are retained as ``w_lo``/``w_hi`` for audit).
    """
    out_col = out_col or f"{value_col}_w"
    groups = list(group_cols)
    bounds = (df.groupBy(*groups) if groups else df.groupBy()).agg(
        F.percentile(F.col(value_col), F.lit(lower)).alias("w_lo"),
        F.percentile(F.col(value_col), F.lit(upper)).alias("w_hi"),
    )
    joined = (
        df.join(F.broadcast(bounds), groups, "left")
        if groups
        else df.crossJoin(F.broadcast(bounds))
    )
    return joined.withColumn(
        out_col,
        F.least(F.greatest(F.col(value_col), F.col("w_lo")), F.col("w_hi")),
    )


def interpolate_linear(
    df: DataFrame,
    key_cols: Sequence[str],
    t_col: str,
    value_col: str,
    *,
    out_col: str = "interp",
) -> DataFrame:
    """Linear interpolation of NULL gaps in a per-key series: each missing
    point takes prev + (next - prev) * (t - t_prev) / (t_next - t_prev)
    from its nearest observed neighbors; leading/trailing gaps fall back
    to the single available neighbor (LOCF / back-fill) — the imputation
    step after ``resample_grid`` turns irregular events into a dense grid
    (forward_fill carries, this one SLOPES, which matters for rates and
    gauges).

    ``t_col`` must be numeric (days/seconds since epoch — cast before
    calling): the fraction is then pure arithmetic on exact integers and
    the interpolated double is the same IEEE expression on any engine.
    Two window passes (backward + forward) over one key shuffle; state
    per row is O(1), no self-join against observed points.
    """
    keys = list(key_cols)
    obs_t = F.when(F.col(value_col).isNotNull(), F.col(t_col))
    wb = (
        Window.partitionBy(*keys)
        .orderBy(t_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy(*keys)
        .orderBy(t_col)
        .rowsBetween(0, Window.unboundedFollowing)
    )
    prev_v = F.last(value_col, ignorenulls=True).over(wb)
    prev_t = F.last(obs_t, ignorenulls=True).over(wb)
    next_v = F.first(value_col, ignorenulls=True).over(wf)
    next_t = F.first(obs_t, ignorenulls=True).over(wf)
    interp = F.when(F.col(value_col).isNotNull(), F.col(value_col)).otherwise(
        F.when(
            prev_v.isNotNull() & next_v.isNotNull(),
            prev_v
            + (next_v - prev_v)
            * (F.col(t_col) - prev_t)
            / (next_t - prev_t),
        ).otherwise(F.coalesce(prev_v, next_v))
    )
    return df.withColumn(out_col, interp)


def cusum_integer(
    df: DataFrame,
    part_cols: Sequence[str],
    order_col: str,
    value_micro_col: str,
    *,
    k_micro: int,
    h_micro: int,
    out_col: str = "cusum",
    alarm_col: str = "alarm",
) -> DataFrame:
    """One-sided CUSUM change-point detection as an exact integer
    recurrence: s_t = max(0, s_{t-1} + (x_t - k)), alarm when s_t > h —
    the classic drift detector (Page 1954) for per-entity metric series
    (order values, latencies, vitals). ``k_micro`` is the reference
    level plus slack; ``h_micro`` the decision threshold, both in the
    value's micro units so every step is bigint arithmetic a
    recursive-CTE oracle replays bit-for-bit.

    Same partition-scan shape as ewma_integer (operators/windows.py):
    hash-repartition on the single group key, sort within partitions,
    one mapInPandas pass with a cross-batch (group, state) carry —
    per-group overhead is zero, Python touches each row once.
    """
    import pandas as pd  # noqa: PLC0415 — worker-side dependency

    part_cols = list(part_cols)
    if len(part_cols) != 1:
        raise ValueError("cusum_integer expects exactly one group column")
    g = part_cols[0]
    parted = df.repartition(F.col(g)).sortWithinPartitions(g, order_col)

    def scan(batches):
        carry_g = None
        carry_s = 0
        for pdf in batches:
            if not len(pdf):
                continue
            gs = pdf[g].to_numpy()
            xs = pdf[value_micro_col].to_numpy()
            out = []
            cg, cs = carry_g, carry_s
            for gi, xi in zip(gs, xs):
                if gi != cg:
                    cs = 0
                cs = max(0, cs + int(xi) - k_micro)
                cg = gi
                out.append(cs)
            carry_g, carry_s = cg, cs
            pdf = pdf.copy()
            pdf[out_col] = pd.Series(out, dtype="int64").values
            pdf[alarm_col] = pdf[out_col] > h_micro
            yield pdf

    schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField(out_col, T.LongType()), T.StructField(alarm_col, T.BooleanType())]
    )
    return parted.mapInPandas(scan, schema=schema)


def decayed_sum_integer(
    df: DataFrame,
    part_cols: Sequence[str],
    day_col: str,
    value_col: str,
    *,
    half_life_days: int = 30,
    out_col: str = "decayed",
) -> DataFrame:
    """Time-decayed accumulator for IRREGULAR series — the ranking /
    popularity counter (Reddit-hot style) where each observation decays
    by half every ``half_life_days``:

        s_t = x_t + (s_prev >> min(Δdays // half_life_days, 62))

    Quantizing the decay to power-of-two halvings keeps every step in
    exact bigint shift arithmetic, so a recursive-CTE oracle (``>>`` in
    DuckDB) replays it bit-for-bit — where EWMA (w13) assumes regular
    spacing and float exp(−λΔt) drifts cross-engine. ``day_col`` must
    be an epoch-day integer (datediff from 1970-01-01): pure-int gaps
    sidestep every engine date convention. Same partition-scan shape as
    ewma/cusum/km: one group-key repartition, sorted scan, cross-batch
    (group, day, state) carry.
    """
    import pandas as pd  # noqa: PLC0415 — worker-side dependency

    part_cols = list(part_cols)
    if len(part_cols) != 1:
        raise ValueError("decayed_sum_integer expects exactly one group column")
    g = part_cols[0]
    parted = df.repartition(F.col(g)).sortWithinPartitions(g, day_col)

    def scan(batches):
        cg, cd, cs = None, 0, 0
        for pdf in batches:
            if not len(pdf):
                continue
            gs = pdf[g].to_numpy()
            ds = pdf[day_col].to_numpy()
            xs = pdf[value_col].to_numpy()
            out = []
            for gi, di, xi in zip(gs, ds, xs):
                di, xi = int(di), int(xi)
                if gi != cg:
                    cs = xi
                else:
                    shift = min((di - cd) // half_life_days, 62)
                    cs = xi + (cs >> shift)
                cg, cd = gi, di
                out.append(cs)
            pdf = pdf.copy()
            pdf[out_col] = pd.Series(out, dtype="int64").values
            yield pdf

    schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, T.LongType())]
    )
    return parted.mapInPandas(scan, schema=schema)


def km_survival_integer(
    df: DataFrame,
    cohort_col: str,
    order_col: str,
    n_risk_col: str,
    d_events_col: str,
    *,
    scale: int = 10**9,
    out_col: str = "survival_ppb",
) -> DataFrame:
    """Kaplan-Meier product-limit survival estimate as an exact integer
    recurrence in parts-per-``scale``:

        S_0 = scale;  S_t = (S_{t-1} * (n_t - d_t)) // n_t

    over the cohort's event times in ascending ``order_col`` order,
    where ``n_t`` is the at-risk count and ``d_t`` the events at t.
    Every step is bigint floor-div on non-negative operands, so a
    recursive-CTE oracle (DuckDB ``//``) replays the product limit
    bit-for-bit — the float cumulative product drifts cross-engine.
    ``scale * max(n)`` must stay inside bigint (ppb is safe to ~1e9
    subjects per cohort).

    Input is the ALREADY-AGGREGATED per-(cohort, time) life table —
    calendar-bounded, tiny relative to the subject table — so the
    sequential walk touches few rows; the same partition-scan shape as
    cusum_integer keeps per-group overhead at zero regardless of how
    many cohorts there are.
    """
    import pandas as pd  # noqa: PLC0415 — worker-side dependency

    parted = df.repartition(F.col(cohort_col)).sortWithinPartitions(
        cohort_col, order_col
    )

    def scan(batches):
        carry_g, carry_s = None, scale
        for pdf in batches:
            if not len(pdf):
                continue
            gs = pdf[cohort_col].to_numpy()
            ns = pdf[n_risk_col].to_numpy()
            ds = pdf[d_events_col].to_numpy()
            out = []
            cg, cs = carry_g, carry_s
            for gi, ni, di in zip(gs, ns, ds):
                if gi != cg:
                    cs = scale
                ni, di = int(ni), int(di)
                cs = (cs * (ni - di)) // ni
                cg = gi
                out.append(cs)
            carry_g, carry_s = cg, cs
            pdf = pdf.copy()
            pdf[out_col] = pd.Series(out, dtype="int64").values
            yield pdf

    schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, T.LongType())]
    )
    return parted.mapInPandas(scan, schema=schema)


def dtw_to_reference(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    reference: Sequence[int],
    band: int = 5,
    out_col: str = "dtw_cost",
) -> DataFrame:
    """Banded Dynamic Time Warping distance from every entity's series to
    one fixed reference series — the elastic-alignment distance that
    tolerates phase shift (a user whose weekly rhythm is the corpus
    rhythm two days late scores near zero, where Euclidean distance
    would not). The workhorse for "which entities track the centroid"
    screens before a heavier clustering pass.

    Values and the reference must already be INTEGER-quantized by the
    caller (milli/micro units): the DP recurrence is then exact int64
    arithmetic, so results are bit-stable across partitionings and
    replayable by any independent twin. The Sakoe-Chiba band (width
    ``band`` around the length-scaled diagonal) bounds each row's work
    to O(band), making per-series cost O(n·band), not O(n·m); the band
    is widened automatically to ceil(m/n)+1 so the warping path always
    stays connected for unequal lengths.

    Scale shape: ONE hash shuffle on the entity key with a within-
    partition (key, order) sort, then a LINEAR mapInPandas pass that
    walks contiguous per-key runs with a batch-boundary carry — one
    Arrow stream per partition, NOT one framed batch per group. (The
    original applyInPandas form paid ~2.4 ms of Arrow framing per
    group: 3.6 s for 1500 groups at sf0.1 on a TRIVIAL kernel, i.e.
    pure overhead dominating the O(n·band) DP. The linear pass is the
    same shuffle with per-partition framing instead — measured 4.7 s ->
    ~1 s for the full operator.) DP state is two O(m) rows per key;
    series are per-entity-bounded (days, visits), never corpus-sized.
    The reference list rides into executors via the task closure: it is
    calendar/window-bounded (tens to thousands of points), not
    data-sized. Output: (key, n_points, ``out_col``); series that cannot
    reach the reference end inside the band (pathological length skew)
    report NULL.
    """
    import pandas as pd  # noqa: PLC0415 — worker-side dependency

    ref = [int(v) for v in reference]
    m = len(ref)
    if m == 0:
        raise ValueError("dtw_to_reference: empty reference series")
    big = (1 << 62) - 1

    key_field = df.schema[key_col].dataType

    def dtw_cost(x: list[int]) -> int | None:
        n = len(x)
        r = ref
        w = max(band, -(-m // max(n, 1)) + 1)
        prev = [0] + [big] * m
        for i in range(1, n + 1):
            cur = [big] * (m + 1)
            c = (i * m) // n
            lo, hi = max(1, c - w), min(m, c + w)
            xi = x[i - 1]
            for j in range(lo, hi + 1):
                best = prev[j]
                if prev[j - 1] < best:
                    best = prev[j - 1]
                if cur[j - 1] < best:
                    best = cur[j - 1]
                if best < big:
                    cur[j] = best + abs(xi - r[j - 1])
            prev = cur
        return prev[m] if prev[m] < big else None

    def run_keys(pdf: pd.DataFrame) -> pd.DataFrame:
        keys, ns, costs = [], [], []
        # rows are (key, order)-sorted; per-key runs are contiguous
        for k, g in pdf.groupby(key_col, sort=False):
            x = [int(v) for v in g[value_col].to_numpy(dtype="int64")]
            keys.append(k)
            ns.append(len(x))
            costs.append(dtw_cost(x))
        return pd.DataFrame(
            {
                key_col: pd.Series(keys),
                "n_points": pd.Series(ns, dtype="int64"),
                out_col: pd.array(costs, dtype="Int64"),
            }
        )

    def linear(batches):
        carry: pd.DataFrame | None = None
        for pdf in batches:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
            if not len(pdf):
                continue
            # hold back the (possibly batch-spanning) last key's rows
            last = pdf[key_col].iloc[-1]
            mask = pdf[key_col] == last
            carry = pdf[mask]
            done = pdf[~mask]
            if len(done):
                yield run_keys(done)
        if carry is not None and len(carry):
            yield run_keys(carry)

    schema = T.StructType(
        [
            T.StructField(key_col, key_field),
            T.StructField("n_points", T.LongType()),
            T.StructField(out_col, T.LongType()),
        ]
    )
    parted = df.repartition(F.col(key_col)).sortWithinPartitions(
        key_col, order_col
    )
    return parted.mapInPandas(linear, schema=schema)


def theil_sen_slope(
    df: DataFrame,
    group_cols: Sequence[str],
    x_col: str,
    y_col: str,
    *,
    slope_col: str = "ts_slope",
) -> DataFrame:
    """Theil–Sen robust trend estimator per group: the (lower) median of
    all pairwise slopes (y2 − y1)/(x2 − x1) over x1 < x2.

    Reference parity: the reference ships only least-squares trends
    (mirrored in a16_trend_slope); Theil–Sen is the standard robust
    companion — a 29% breakdown point, immune to the revenue spikes and
    sensor glitches that wreck OLS on operational series.

    Scale shape: a self-equi-join on the GROUP key expands each group's
    series into C(n, 2) pairs — bounded by the series length, which for
    calendar-bucketed series is a constant (≤31 for a month of dailies),
    so the expansion is a bounded multiple of the input no matter how
    many groups there are. Both the join and the median window shuffle
    once on the group key; nothing is quadratic in the number of groups
    and nothing touches the driver. For multi-year series, bucket or
    sample x first (classical Theil–Sen subsampling) to keep C(n, 2)
    bounded.

    Determinism contract: y must be exact (DECIMAL or a cents-scaled
    integer — never raw double, whose subtraction order would differ);
    the slope is evaluated in double from the exact difference and
    integer x-gap, the same expression shape DuckDB uses, so the doubles
    are bit-equal. The median is the LOWER median — the element at
    row_number (n_pairs + 1) div 2 under the total order
    (slope, x1, x2) — never an average of two middles, so no engine's
    interpolation convention can disagree.
    """
    gcols = list(group_cols)
    a = df.select(
        *gcols, F.col(x_col).alias("_x1"), F.col(y_col).alias("_y1")
    )
    b = df.select(
        *gcols, F.col(x_col).alias("_x2"), F.col(y_col).alias("_y2")
    )
    pairs = a.join(b, on=gcols).where(F.col("_x1") < F.col("_x2"))
    slope = (F.col("_y2") - F.col("_y1")).cast("double") / (
        F.col("_x2") - F.col("_x1")
    ).cast("double")
    pairs = pairs.select(*gcols, "_x1", "_x2", slope.alias("_slope"))
    w = Window.partitionBy(*gcols).orderBy(
        F.col("_slope").asc(), F.col("_x1").asc(), F.col("_x2").asc()
    )
    ranked = pairs.select(
        *gcols,
        "_slope",
        F.row_number().over(w).alias("_rn"),
        F.count(F.lit(1)).over(Window.partitionBy(*gcols)).alias("n_pairs"),
    )
    return ranked.where(
        F.col("_rn") == F.expr("(n_pairs + 1) div 2")
    ).select(*gcols, F.col("n_pairs").cast("bigint"), F.col("_slope").alias(slope_col))


def western_electric_flags(
    df: DataFrame,
    group_cols: Sequence[str],
    order_col: str,
    y_col: str,
) -> DataFrame:
    """Western-Electric control-chart rules per group over an ordered
    series: flag each point that violates

      r1 — the point is beyond mean ± 3σ;
      r2 — ≥2 of the last 3 points beyond 2σ on the SAME side;
      r3 — ≥4 of the last 5 points beyond 1σ on the same side;
      r4 — 8 consecutive points on the same side of the mean.

    The classic SPC ruleset (public domain, Western Electric Handbook
    1956) — the monitoring layer the reference's data_validation module
    stops short of (it checks ranges, not run patterns).

    Scale shape: mean and σ come from ONE grouped aggregate of exact
    sums (y is a cents-scaled integer; Σy² goes through DECIMAL(37,0)
    so the square never overflows a long), joined
    back onto the series (group-count rows — dimension-sized, AQE
    broadcasts it); the rules themselves are rolling SUMs over
    row-bounded windows on the (group, order) shuffle — one window
    shuffle total, linear state, no self-join.

    Determinism contract: mean/σ evaluated in double from the
    exact sums with the same expression shape as the oracle
    (population σ via sqrt(Σy²/n − mean²)), so every threshold
    comparison sees bit-identical doubles in both engines.
    """
    gcols = list(group_cols)
    stats = df.groupBy(*gcols).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(y_col).alias("_sy"),
        F.sum(
            F.col(y_col).cast("decimal(18,0)") * F.col(y_col).cast("decimal(18,0)")
        ).alias("_syy"),
    )
    mean = F.col("_sy").cast("double") / F.col("_n")
    var = F.col("_syy").cast("double") / F.col("_n") - mean * mean
    stats = stats.select(
        *gcols,
        mean.alias("_mean"),
        F.sqrt(F.greatest(var, F.lit(0.0))).alias("_sigma"),
    )
    y = F.col(y_col).cast("double")
    joined = df.join(stats, on=gcols)
    up1 = (y > F.col("_mean") + F.col("_sigma")).cast("int")
    dn1 = (y < F.col("_mean") - F.col("_sigma")).cast("int")
    up2 = (y > F.col("_mean") + 2 * F.col("_sigma")).cast("int")
    dn2 = (y < F.col("_mean") - 2 * F.col("_sigma")).cast("int")
    above = (y > F.col("_mean")).cast("int")
    below = (y < F.col("_mean")).cast("int")
    joined = joined.select(
        *gcols,
        order_col,
        y.alias("_y"),
        F.col("_mean"),
        F.col("_sigma"),
        up1.alias("_up1"),
        dn1.alias("_dn1"),
        up2.alias("_up2"),
        dn2.alias("_dn2"),
        above.alias("_ab"),
        below.alias("_be"),
    )

    def roll(col: str, n: int) -> Column:
        w = (
            Window.partitionBy(*gcols)
            .orderBy(order_col)
            .rowsBetween(-(n - 1), 0)
        )
        return F.sum(col).over(w)

    r1 = (F.abs(F.col("_y") - F.col("_mean")) > 3 * F.col("_sigma")).alias("r1")
    r2 = ((roll("_up2", 3) >= 2) | (roll("_dn2", 3) >= 2)).alias("r2")
    r3 = ((roll("_up1", 5) >= 4) | (roll("_dn1", 5) >= 4)).alias("r3")
    r4 = ((roll("_ab", 8) >= 8) | (roll("_be", 8) >= 8)).alias("r4")
    return joined.select(
        *gcols,
        order_col,
        F.col("_y").alias("y"),
        F.col("_mean").alias("series_mean"),
        F.col("_sigma").alias("series_sigma"),
        r1,
        r2,
        r3,
        r4,
    )


def _lower_median(
    df: DataFrame, keys: Sequence[str], y: str, tiebreak: str, out: str
) -> DataFrame:
    """Per-key LOWER median of ``y``: the element at row_number
    (n + 1) div 2 under the (y, tiebreak) total order — exact on integer
    inputs, no interpolation convention to disagree on."""
    w = Window.partitionBy(*keys).orderBy(F.col(y).asc(), F.col(tiebreak).asc())
    return (
        df.select(
            *keys,
            y,
            F.row_number().over(w).alias("__rn"),
            F.count(F.lit(1)).over(Window.partitionBy(*keys)).alias("__n"),
        )
        .where(F.col("__rn") == F.expr("(__n + 1) div 2"))
        .select(*keys, F.col(y).alias(out))
    )


def median_polish(
    df: DataFrame,
    row_col: str,
    col_col: str,
    y_col: str,
    *,
    iterations: int = 2,
) -> DataFrame:
    """Tukey median polish: robust two-way table decomposition
    y ≈ row_effect + col_effect + residual by alternately sweeping out
    row medians then column medians (``iterations`` full sweeps) — the
    EDA workhorse for separating "which rows are high" from "which
    columns are high" without letting outlier cells poison the answer
    the way two-way means (ANOVA) do.

    Deterministic variant: every median is the LOWER median under a
    (value, crossing-key) total order, so on exact integer inputs
    (cents) every intermediate stays an exact integer and any engine
    replays it bit-for-bit. Classic Tukey interpolates even-count
    medians; lower-median converges the same way and removes the only
    cross-engine float hazard.

    Scale shape: per sweep one window (the per-key median pick) + one
    dimension-sized equi-join back (AQE broadcasts it) — 2·iterations
    windows total, shuffles alternating between the row key and the
    column key. No driver state, no collect; rows×cols can be billions
    of cells as long as one row/column's cells fit a partition (the
    usual window contract).

    Lineage is TRUNCATED once per sweep (components.flat_checkpoint on
    ``cur``/``row_eff``/``col_eff``): each sweep's median derives from
    the previous sweep's residuals, and the effect accumulators join
    back onto frames derived from ``cur``, so without truncation the
    final plan re-derives every earlier sweep for each of base/row_eff/
    col_eff — the r7 plan at iterations=2 already held 91 exchanges /
    96 scans and the shape grows geometrically with ``iterations``.
    With the checkpoint the plan size is CONSTANT per sweep (each
    iteration reads the previous materialization), pinned by
    tests/test_timeseries.py::test_median_polish_plan_constant.

    Output: (row, col, y, row_effect, col_effect, residual) with
    y = row_effect + col_effect + residual exactly (integer identity;
    effects are the summed sweep medians).
    """
    from .components import flat_checkpoint

    cur = flat_checkpoint(
        df.select(
            F.col(row_col).alias("__row"),
            F.col(col_col).alias("__col"),
            F.col(y_col).alias("__y"),
        )
    )
    base = cur
    row_eff: DataFrame | None = None
    col_eff: DataFrame | None = None
    for _ in range(iterations):
        rm = _lower_median(cur, ["__row"], "__y", "__col", "__m")
        cur = cur.join(rm, "__row").select(
            "__row", "__col", (F.col("__y") - F.col("__m")).alias("__y")
        )
        row_eff = (
            rm.select("__row", F.col("__m").alias("__re"))
            if row_eff is None
            else row_eff.join(rm, "__row").select(
                "__row", (F.col("__re") + F.col("__m")).alias("__re")
            )
        )
        cm = _lower_median(cur, ["__col"], "__y", "__row", "__m")
        cur = cur.join(cm, "__col").select(
            "__row", "__col", (F.col("__y") - F.col("__m")).alias("__y")
        )
        col_eff = (
            cm.select("__col", F.col("__m").alias("__ce"))
            if col_eff is None
            else col_eff.join(cm, "__col").select(
                "__col", (F.col("__ce") + F.col("__m")).alias("__ce")
            )
        )
        cur = flat_checkpoint(cur)
        row_eff = flat_checkpoint(row_eff)
        col_eff = flat_checkpoint(col_eff)
    return (
        base.join(cur.withColumnRenamed("__y", "__resid"), ["__row", "__col"])
        .join(row_eff, "__row")
        .join(col_eff, "__col")
        .select(
            F.col("__row").alias(row_col),
            F.col("__col").alias(col_col),
            F.col("__y").alias(y_col),
            F.col("__re").alias("row_effect"),
            F.col("__ce").alias("col_effect"),
            F.col("__resid").alias("residual"),
        )
    )


def ohlc_bars(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    tiebreak_col: str,
    value_col: str,
) -> DataFrame:
    """OHLC resampling: per key (typically entity × time-bucket), the
    open/high/low/close of an exact-integer value series plus count and
    sum — the candlestick reduction, and more generally the
    "first/last/extremes in one pass" shape for sensor and price feeds.

    ONE grouped aggregate, no window: open/close are min/max over a
    lexicographic (ts, tiebreak, value) struct — argmin/argmax by total
    order expressed as a plain aggregate, so it partial-aggregates
    map-side and never materializes a per-key sort. ``tiebreak_col``
    must make (ts, tiebreak) unique per key (an event id); value must
    be an exact integer (cents) per the determinism discipline.
    """
    key = [F.col(c) for c in key_cols]
    o = F.struct(
        F.col(ts_col).alias("t"),
        F.col(tiebreak_col).alias("e"),
        F.col(value_col).alias("c"),
    )
    return df.groupBy(*key).agg(
        F.min(o).getField("c").alias("open"),
        F.max(value_col).alias("high"),
        F.min(value_col).alias("low"),
        F.max(o).getField("c").alias("close"),
        F.count(F.lit(1)).alias("n_points"),
        F.sum(value_col).cast("bigint").alias("total"),
    )


def lttb_downsample(
    df: DataFrame,
    key_col: str,
    x_col: str,
    y_col: str,
    *,
    buckets: int = 12,
) -> DataFrame:
    """Largest-Triangle downsampling of a per-key series to ~``buckets``
    visually-representative points (Steinarsson's LTTB family; this is
    the parallel centroid-anchor variant — LTTB proper anchors each
    triangle on the previously SELECTED point, a sequential dependency,
    so the scalable form anchors on the NEIGHBOR BUCKET CENTROIDS
    instead, which the thesis reports as visually indistinguishable and
    which makes every bucket's argmax independent).

    Per key: rank points by (x, y) into a total order, assign rank r to
    bucket floor((r-1)·B/n); the first bucket keeps its first point and
    the last bucket its last point (series endpoints always survive);
    every interior bucket keeps the point with the largest triangle
    area against the previous and next buckets' centroids. The area
    comparison is EXACT: with integer x (epoch days) and y (cents), the
    doubled area scaled by np²·nn (np/nn = neighbor bucket sizes,
    constant within a bucket, so the argmax is unchanged) is the pure
    int64 expression

        |(Sxp·nn − Sxn·np)·(y·np − Syp) − (Sxp − x·np)·(Syn·np − Syp·nn)|

    over neighbor-bucket sums — no floats anywhere, so the selection is
    engine-portable bit-for-bit. Ties: lowest rank wins. Keys with
    n ≤ buckets pass through complete (every point kept, score 0).

    int64 bound: |x|·n, |y|·n products must stay below ~2^62 — epoch-day
    x and cent-scale y are safe to ~10^5-point buckets; rescale x to a
    coarser unit past that.

    Scale shape: ONE window shuffle on the key (rank + count), one
    small per-(key, bucket) aggregate reused via lag/lead (window over
    the bucket table, negligible), broadcast-sized join back onto the
    points by (key, bucket), one final per-bucket argmax window. No
    driver state, no iteration.

    Output: key, bucket, x, y, a2_score (the scaled doubled area;
    0 for endpoint/passthrough picks).
    """
    k, b = F.col(key_col), F.col("__b")
    w = Window.partitionBy(key_col).orderBy(x_col, y_col)
    pts = (
        df.select(key_col, x_col, y_col)
        .distinct()
        .withColumn("__rn", F.row_number().over(w).cast("bigint"))
        .withColumn("__n", F.count(F.lit(1)).over(Window.partitionBy(key_col)))
        .withColumn(
            "__b",
            F.expr(f"((__rn - 1) * {int(buckets)}) div __n").cast("bigint"),
        )
    )
    bsum = pts.groupBy(key_col, "__b").agg(
        F.sum(x_col).cast("bigint").alias("sx"),
        F.sum(y_col).cast("bigint").alias("sy"),
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
    )
    wb = Window.partitionBy(key_col).orderBy("__b")
    nb = bsum.select(
        key_col,
        "__b",
        F.lag("sx").over(wb).alias("sxp"),
        F.lag("sy").over(wb).alias("syp"),
        F.lag("cnt").over(wb).alias("np"),
        F.lead("sx").over(wb).alias("sxn"),
        F.lead("sy").over(wb).alias("syn"),
        F.lead("cnt").over(wb).alias("nn"),
    )
    x, y = F.col(x_col).cast("bigint"), F.col(y_col).cast("bigint")
    a2 = F.abs(
        (F.col("sxp") * F.col("nn") - F.col("sxn") * F.col("np"))
        * (y * F.col("np") - F.col("syp"))
        - (F.col("sxp") - x * F.col("np"))
        * (F.col("syn") * F.col("np") - F.col("syp") * F.col("nn"))
    )
    scored = pts.join(nb, [key_col, "__b"]).withColumn(
        "__a2",
        F.when(
            (b == 0) | (b == buckets - 1) | (F.col("__n") <= buckets),
            F.lit(0).cast("bigint"),
        ).otherwise(a2),
    )
    wpick = Window.partitionBy(key_col, "__b").orderBy(
        F.desc("__a2"), F.asc("__rn")
    )
    keep_rule = (
        F.when(F.col("__n") <= buckets, F.lit(True))
        .when(b == 0, F.col("__rn") == 1)
        .when(b == buckets - 1, F.col("__rn") == F.col("__n"))
        .otherwise(F.row_number().over(wpick) == 1)
    )
    return (
        scored.withColumn("__keep", keep_rule)
        .filter(F.col("__keep"))
        .select(
            k,
            b.cast("bigint").alias("bucket"),
            F.col(x_col),
            F.col(y_col),
            F.col("__a2").alias("a2_score"),
        )
    )


def isotonic_fit(
    df: DataFrame, key_col: str, x_col: str, y_col: str
) -> DataFrame:
    """Isotonic (non-decreasing) regression per key via pool-adjacent-
    violators (PAVA) — the monotone calibration primitive (calibrating
    a quality/relevance score against observed outcomes, enforcing
    monotone dose-response curves). EXACT arithmetic: blocks carry
    integer (sum, count); the violation test is the cross-multiplied
    comparison s₁·c₂ > s₂·c₁ (strict — equal means stay separate
    blocks, matching the oracle's replay rule); each point's fitted
    value is returned as the gcd-reduced fraction (fit_num, fit_den)
    of its block mean, so the whole fit value-hashes across engines.

    Contract: ``x_col`` is unique per key (aggregate first) and each
    key's series fits one Arrow batch — the dtw_to_reference scale
    shape: ONE shuffle on the key, a linear-time stack kernel per
    series, no iteration over the cluster. int64 bound: block sums and
    the cross-multiplication must stay below 2^63 (|y|·n² in the worst
    case).

    Output: key, x, y, fit_num, fit_den (block mean = fit_num/fit_den,
    non-decreasing in x within each key).
    """
    from math import gcd

    import pandas as pd

    fields = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    schema = (
        f"{key_col} {fields[key_col]}, {x_col} {fields[x_col]}, "
        f"{y_col} bigint, fit_num bigint, fit_den bigint"
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(x_col, kind="mergesort").reset_index(drop=True)
        blocks: list[list[int]] = []
        for y in pdf[y_col]:
            blocks.append([int(y), 1])
            while (
                len(blocks) >= 2
                and blocks[-2][0] * blocks[-1][1]
                > blocks[-1][0] * blocks[-2][1]
            ):
                s, c = blocks.pop()
                blocks[-1][0] += s
                blocks[-1][1] += c
        num, den = [], []
        for s, c in blocks:
            g = gcd(s, c) or 1
            num.extend([s // g] * c)
            den.extend([c // g] * c)
        return pd.DataFrame(
            {
                key_col: pdf[key_col],
                x_col: pdf[x_col],
                y_col: pdf[y_col].astype("int64"),
                "fit_num": pd.Series(num, dtype="int64"),
                "fit_den": pd.Series(den, dtype="int64"),
            }
        )

    return df.select(key_col, x_col, F.col(y_col).cast("bigint").alias(y_col)) \
        .groupBy(key_col).applyInPandas(kernel, schema)


def xcorr_lag_scan(
    a: DataFrame,
    b: DataFrame,
    t_col: str,
    a_col: str,
    b_col: str,
    *,
    max_lag: int = 7,
) -> DataFrame:
    """Cross-correlation lag scan between two integer-valued series:
    for every lag k in [-max_lag, max_lag], the exact Pearson-numerator
    components of (a(t), b(t + k)) over co-observed time points — the
    lead/lag alignment finder (does metric B follow metric A by k
    days?). Everything stays int64: per lag the scan emits n, Σab and
    the centered pieces num = n·Σab − Σa·Σb, den_a = n·Σa² − (Σa)²,
    den_b likewise, so the full correlation ordering is recoverable
    exactly (corr² = num²/(den_a·den_b)) without a cross-engine sqrt.
    int64 bound: n·Σa² must stay below 2^63 — pre-scale heavy series
    (the registry fixture uses whole currency units, not cents).

    Plan: the lag axis is a 2·max_lag+1-element generated column (no
    driver loop), one equi-join on the shifted time key, one group-by
    on lag — two shuffles total regardless of series length; inner-join
    semantics (only co-observed points count) are part of the
    contract.
    """
    lags = F.explode(
        F.sequence(F.lit(-max_lag), F.lit(max_lag))
    ).alias("lag")
    av = F.col(a_col).cast("bigint")
    bv = F.col(b_col).cast("bigint")
    left = a.select(
        F.col(t_col).cast("bigint").alias("__t"), av.alias("__a")
    ).select("*", lags)
    right = b.select(
        F.col(t_col).cast("bigint").alias("__tb"), bv.alias("__b")
    )
    joined = left.join(
        right, F.col("__tb") == F.col("__t") + F.col("lag")
    )
    agg = joined.groupBy("lag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_points"),
        F.sum("__a").alias("sa"),
        F.sum("__b").alias("sb"),
        F.sum(F.col("__a") * F.col("__b")).alias("sab"),
        F.sum(F.col("__a") * F.col("__a")).alias("saa"),
        F.sum(F.col("__b") * F.col("__b")).alias("sbb"),
    )
    return agg.select(
        F.col("lag").cast("int"),
        "n_points",
        (F.col("n_points") * F.col("sab") - F.col("sa") * F.col("sb"))
        .cast("bigint")
        .alias("num"),
        (F.col("n_points") * F.col("saa") - F.col("sa") * F.col("sa"))
        .cast("bigint")
        .alias("den_a"),
        (F.col("n_points") * F.col("sbb") - F.col("sb") * F.col("sb"))
        .cast("bigint")
        .alias("den_b"),
    )
