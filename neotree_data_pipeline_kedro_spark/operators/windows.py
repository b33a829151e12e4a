"""Window / sessionization operator family (SURVEY.md §2.6, W1-W6).

The reference's episode machinery is a pandas shift/cumsum row loop; here it
is the standard Spark lag + conditional cumsum — one shuffle on the
partition key, linear in partition size, no driver involvement.

Every window takes explicit tiebreak columns: pandas relies on frame order
for equal keys, which does not exist distributed; a total order is part of
the operator contract (SURVEY §7 "keep first" hard part).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _order(ts_col: str, tiebreak: Sequence[str]) -> list[Column]:
    return [F.col(ts_col).asc()] + [F.col(c).asc() for c in tiebreak]


def episode_sessionize(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    out_col: str = "episode",
    change_expr: Column | None = None,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """W3: new episode whenever the (date of the) ordering column changes
    within a key (tidy_...mcl_tables.py:293-315 — neolab culture-date
    cumsum). Default change test: calendar date of ``ts_col`` differs from
    the previous row's.
    """
    w_order = Window.partitionBy(*key_cols).orderBy(*_order(ts_col, tiebreak))
    basis = F.to_date(F.col(ts_col)) if change_expr is None else change_expr
    prev = F.lag(basis).over(w_order)
    is_new = F.when(prev.isNull() | (basis != prev), 1).otherwise(0)
    w_cum = w_order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn(out_col, F.sum(is_new).over(w_cum))


def gap_sessionize(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    gap_seconds: int,
    out_col: str = "session_id",
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Gap-based sessionization (LLM/eventstream extension of W3): a new
    session starts when the time since the previous event exceeds
    ``gap_seconds`` (whole-second granularity, matching unix_timestamp)."""
    w_order = Window.partitionBy(*key_cols).orderBy(*_order(ts_col, tiebreak))
    u = F.unix_timestamp(F.col(ts_col))
    prev_u = F.lag(u).over(w_order)
    is_new = F.when(prev_u.isNull() | ((u - prev_u) > gap_seconds), 1).otherwise(0)
    w_cum = w_order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn(out_col, F.sum(is_new).over(w_cum))


def episode_labels(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    result_col: str,
    final_tokens: Sequence[str] = ("Pos", "Neg", "PC"),
    out_col: str = "bc_type",
) -> DataFrame:
    """W4: BCType ordinal labeling within (uid, episode) ordered by DateBCR
    (tidy_...mcl_tables.py:317-339): non-final rows get ``PRELIMINARY-n``
    (running counter); the LAST row whose result is in ``final_tokens`` gets
    ``FINAL``.
    """
    w_order = Window.partitionBy(*key_cols).orderBy(
        *[F.col(c).asc() for c in order_cols]
    )
    w_all = Window.partitionBy(*key_cols)
    rn = F.row_number().over(w_order)
    is_final_candidate = F.col(result_col).isin(*final_tokens)
    df2 = df.withColumn("__rn", rn).withColumn(
        "__last_final", F.max(F.when(is_final_candidate, F.col("__rn"))).over(w_all)
    )
    return (
        df2.withColumn(
            out_col,
            F.when(
                is_final_candidate & (F.col("__rn") == F.col("__last_final")), "FINAL"
            ).otherwise(F.concat(F.lit("PRELIMINARY-"), F.col("__rn"))),
        )
        .drop("__rn", "__last_final")
    )


def ecdf_normalize(
    df: DataFrame,
    value_col: str,
    partition_cols: Sequence[str] = (),
    tiebreak_col: str | None = None,
    n_tiles: int = 4,
    prefix: str = "",
) -> DataFrame:
    """Empirical-CDF feature normalization: percent_rank, cume_dist, and an
    n-tile bucket of ``value_col`` within each partition — the
    distribution-free rescaling used for per-source quality-score
    calibration before mixture sampling (a raw quality score is comparable
    only within its source; its ECDF position is comparable across
    sources).

    percent_rank/cume_dist are exact rationals of integer ranks, so they
    are bit-identical across engines; the n-tile bucket needs a unique
    total order to be deterministic — pass ``tiebreak_col`` (e.g. the doc
    id) whenever ``value_col`` can repeat. One window shuffle on the
    partition key.
    """
    order = [F.col(value_col).asc()]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col).asc())
    w = Window.partitionBy(*partition_cols).orderBy(*order)
    return (
        df.withColumn(prefix + "pct_rank", F.percent_rank().over(w))
        .withColumn(prefix + "cume_dist", F.cume_dist().over(w))
        .withColumn(prefix + "tile", F.ntile(n_tiles).over(w))
    )


def scd2_from_changelog(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    tiebreak: Sequence[str] = (),
    attr_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Type-2 slowly-changing-dimension build from a change log: each row
    becomes a version interval ``[valid_from, valid_to)`` per key, with
    ``valid_to`` = the next change's timestamp (NULL on the open current
    version), ``version`` = 1-based change ordinal, and ``is_current``
    marking the latest row.

    This is the warehouse-dimension counterpart of the reference's
    lifecycle/reconcile machinery (conf/common/sql_functions.py upsert +
    merge_all.py lifecycle flags): instead of overwriting the matched row,
    history is preserved as intervals — the standard dimensional-modeling
    shape a 100 TB warehouse needs for as-of joins against facts
    (pair with ``asof_nearest``).

    Scale shape: ONE window shuffle on the dimension key; lead/row_number
    are linear per partition, no self-join and no driver involvement. A
    unique total order is part of the contract — pass ``tiebreak`` when
    ``ts_col`` can repeat within a key (pandas frame order does not exist
    distributed).
    """
    keys = list(key_cols)
    w = Window.partitionBy(*keys).orderBy(*_order(ts_col, tiebreak))
    # attr_cols, when given, is the FULL output projection (keys included)
    cols = list(attr_cols) if attr_cols is not None else df.columns
    out = (
        df.withColumn("version", F.row_number().over(w))
        .withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead(ts_col).over(w))
    )
    return out.select(
        *[c for c in cols if c not in (ts_col,)],
        "version",
        "valid_from",
        "valid_to",
        F.col("valid_to").isNull().alias("is_current"),
    )


def interval_concurrency(
    df: DataFrame,
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Sweep-line concurrency: for every boundary instant, how many
    half-open intervals ``[start, end)`` are active from that instant
    until the next boundary — max concurrent sessions / open orders /
    admitted patients over time.

    The naive form is a running sum over ONE global ordering — an
    ``ORDER BY t`` window with a single-partition sort that caps out on
    one executor. This is the scalable two-phase prefix sum instead:

    1. boundary deltas (+1 at start, −1 at end) aggregate per distinct
       instant (one key shuffle; equal instants collapse so the total
       order is over unique keys and needs no tiebreak);
    2. instants are RANGE-partitioned and sorted within partitions; a
       mapInPandas pass computes each partition's LOCAL running sum
       (linear, streaming over Arrow batches);
    3. per-partition grand totals — one tiny row per partition — come to
       the driver, their exclusive prefix sums become per-partition
       offsets, and a broadcast join adds offset to local sum.

    Every phase is delta-sized or partition-count-sized; no single-
    executor global sort at any scale. The intermediate is persisted so
    the totals pass and the final pass see one consistent partition
    assignment; it stays cached until the session evicts it (callers
    embedding this in a long-lived pipeline can unpersist the RETURNED
    frame's lineage after materializing downstream).

    Output: (t, concurrency) — the active-interval count on [t, next t).
    """
    deltas = (
        df.select(F.col(start_col).alias("t"), F.lit(1).alias("d"))
        .unionByName(df.select(F.col(end_col).alias("t"), F.lit(-1).alias("d")))
        .groupBy("t")
        .agg(F.sum("d").alias("net"))
    )
    n_parts = max(2, df.sparkSession.sparkContext.defaultParallelism)
    parted = (
        deltas.repartitionByRange(n_parts, "t")
        .sortWithinPartitions("t")
        .withColumn("pid", F.spark_partition_id())
    )

    def local_cumsum(batches):
        import pandas as pd  # noqa: PLC0415 — worker-side import

        running = 0
        for pdf in batches:
            if not len(pdf):
                continue
            cum = pdf["net"].cumsum() + running
            running = int(cum.iloc[-1])
            yield pd.DataFrame(
                {
                    "t": pdf["t"],
                    "pid": pdf["pid"],
                    "net": pdf["net"],
                    "local_cum": cum,
                }
            )

    local = parted.mapInPandas(
        local_cumsum,
        schema=T.StructType(
            [
                T.StructField("t", df.schema[start_col].dataType),
                T.StructField("pid", T.IntegerType()),
                T.StructField("net", T.LongType()),
                T.StructField("local_cum", T.LongType()),
            ]
        ),
    ).persist()
    # a partition's grand total = sum of its deltas (NOT max of the cumsum:
    # negative deltas make the running sum non-monotone) — one tiny row per
    # partition to the driver
    totals = sorted(
        (r.pid, r.total)
        for r in local.groupBy("pid").agg(F.sum("net").alias("total")).collect()
    )
    offsets, acc = [], 0
    for pid, total in totals:
        offsets.append((pid, acc))
        acc += int(total)
    off_df = df.sparkSession.createDataFrame(offsets, "pid int, offset long")
    return (
        local.join(F.broadcast(off_df), "pid")
        .select("t", (F.col("local_cum") + F.col("offset")).alias("concurrency"))
    )


def global_row_number(
    df: DataFrame,
    order_cols: Sequence[str],
    out_col: str = "rn",
) -> DataFrame:
    """1-based global row number over ONE total ordering, without the
    single-partition sort a bare ``row_number() OVER (ORDER BY ...)``
    forces. Same two-phase shape as ``interval_concurrency``:

    1. range-partition + sort within partitions on ``order_cols``;
    2. a linear mapInPandas pass assigns each partition's LOCAL 1-based
       index (streaming over Arrow batches with a carry);
    3. per-partition row counts — one tiny row per partition — come to
       the driver, their exclusive prefix sums become offsets, and a
       broadcast join turns local index into global rank.

    ``order_cols`` must be a TOTAL order (include a unique tiebreak
    column) or equal rows get arbitrary-but-stable relative ranks.
    The intermediate persists so the counts pass and the final pass see
    one consistent partition assignment."""
    order_cols = list(order_cols)
    n_parts = max(2, df.sparkSession.sparkContext.defaultParallelism)
    parted = (
        df.repartitionByRange(n_parts, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("_pid", F.spark_partition_id())
    )

    def local_index(batches):
        import pandas as pd  # noqa: PLC0415 — worker-side import

        seen = 0
        for pdf in batches:
            if not len(pdf):
                continue
            pdf = pdf.copy()
            pdf["_local_rn"] = pd.RangeIndex(seen + 1, seen + 1 + len(pdf))
            seen += len(pdf)
            yield pdf

    schema = T.StructType(
        list(parted.schema.fields) + [T.StructField("_local_rn", T.LongType())]
    )
    local = parted.mapInPandas(local_index, schema=schema).persist()
    counts = sorted(
        (r["_pid"], r["n"])
        for r in local.groupBy("_pid").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    offsets, acc = [], 0
    for pid, n in counts:
        offsets.append((pid, acc))
        acc += int(n)
    off_df = df.sparkSession.createDataFrame(offsets, "_pid int, _offset long")
    return (
        local.join(F.broadcast(off_df), "_pid")
        .withColumn(out_col, F.col("_local_rn") + F.col("_offset"))
        .drop("_pid", "_local_rn", "_offset")
    )


def global_prefix_scan(
    df: DataFrame,
    order_cols: Sequence[str],
    value_col: str,
    rn_col: str = "rn",
    cum_col: str = "cum",
) -> DataFrame:
    """Global 1-based rank AND running sum of ``value_col`` over one
    total ordering, in a single two-phase pass (global_row_number's
    shape, carrying two accumulators): range-partition + sorted local
    scan producing local index and local cumsum, then per-partition
    (count, sum) rows — one per partition — become driver-side
    exclusive-prefix offsets broadcast back. No single-partition sort
    at any scale. ``order_cols`` must be a total order."""
    order_cols = list(order_cols)
    n_parts = max(2, df.sparkSession.sparkContext.defaultParallelism)
    parted = (
        df.repartitionByRange(n_parts, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("_pid", F.spark_partition_id())
    )

    def local_scan(batches):
        import pandas as pd  # noqa: PLC0415 — worker-side import

        seen, run = 0, 0
        for pdf in batches:
            if not len(pdf):
                continue
            pdf = pdf.copy()
            pdf["_local_rn"] = pd.RangeIndex(seen + 1, seen + 1 + len(pdf))
            cum = pdf[value_col].cumsum() + run
            pdf["_local_cum"] = cum
            seen += len(pdf)
            run = int(cum.iloc[-1])
            yield pdf

    schema = T.StructType(
        list(parted.schema.fields)
        + [
            T.StructField("_local_rn", T.LongType()),
            T.StructField("_local_cum", T.LongType()),
        ]
    )
    local = parted.mapInPandas(local_scan, schema=schema).persist()
    stats = sorted(
        (r["_pid"], r["n"], r["s"])
        for r in local.groupBy("_pid")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(value_col).cast("bigint").alias("s"),
        )
        .collect()
    )
    offsets, n_acc, s_acc = [], 0, 0
    for pid, n, s in stats:
        offsets.append((pid, n_acc, s_acc))
        n_acc += int(n)
        s_acc += int(s)
    off_df = df.sparkSession.createDataFrame(
        offsets, "_pid int, _rn_off long, _cum_off long"
    )
    return (
        local.join(F.broadcast(off_df), "_pid")
        .withColumn(rn_col, F.col("_local_rn") + F.col("_rn_off"))
        .withColumn(cum_col, F.col("_local_cum") + F.col("_cum_off"))
        .drop("_pid", "_local_rn", "_local_cum", "_rn_off", "_cum_off")
    )


def ntile_from_rank(rn: Column, n_total: Column, n_buckets: int) -> Column:
    """ANSI ntile bucket from a 1-based global rank and the total row
    count, as a pure expression: the first ``n_total % n_buckets``
    buckets hold ``ceil(n/b)`` rows, the rest ``floor(n/b)`` — exactly
    the SQL-standard remainder-first distribution, so a DuckDB
    ``ntile(b) OVER (ORDER BY ...)`` twin reproduces it bit-for-bit.
    All arithmetic is bigint ``div`` (exact cross-engine; everything is
    non-negative so truncation == floor)."""
    def idiv(num: Column, den: Column) -> Column:
        # exact bigint floor-div for non-negative operands: integral
        # `div` (IntegralDivide) stays in long arithmetic at any
        # magnitude — never `/`, which routes through doubles and
        # rounds past 2^53 — and truncation == floor when num >= 0
        return F.call_function("div", num, den).cast("bigint")

    b = F.lit(n_buckets).cast("bigint")
    n = n_total.cast("bigint")
    q_size = idiv(n, b)  # small-bucket size; big buckets hold q_size + 1
    r = n % b
    threshold = r * (q_size + F.lit(1))
    in_big = rn <= threshold
    big_bucket = idiv(rn + q_size, q_size + F.lit(1))
    small_bucket = r + idiv(
        rn - threshold + q_size - F.lit(1), F.greatest(q_size, F.lit(1))
    )
    return F.when(in_big, big_bucket).otherwise(small_bucket)


def pareto_frontier_2d(df: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """2-D skyline (both dimensions minimized): keep every row not
    dominated by another — B dominates A when B.x <= A.x, B.y <= A.y and
    at least one is strict. Duplicate frontier points all survive (no
    point strictly beats its twin), matching the declarative NOT EXISTS
    form an oracle states.

    The naive form is the O(n^2) dominance anti-join; the classic
    single-node form is one global sort + running min — a one-partition
    window that caps out on one executor. This runs the scalable
    decomposition instead:

    1. per-x minima (one groupBy shuffle — candidates are at most one
       per distinct x);
    2. running min over x-ascending minima via the same two-phase
       prefix pattern as ``interval_concurrency``: range-partition by x,
       per-partition local running min, per-partition totals to the
       driver (one tiny row per partition), exclusive prefix-min
       re-broadcast as offsets;
    3. frontier xs = those whose ymin beats every smaller x's min;
       broadcast-join back to the input keeps all rows AT frontier
       points and drops dominated rows.

    Every phase is distinct-x-sized or partition-count-sized.
    """
    minima = df.groupBy(F.col(x_col).alias("__x")).agg(
        F.min(F.col(y_col)).alias("__ymin")
    )
    n_parts = max(2, df.sparkSession.sparkContext.defaultParallelism)
    parted = (
        minima.repartitionByRange(n_parts, "__x")
        .sortWithinPartitions("__x")
        .withColumn("__pid", F.spark_partition_id())
    )

    def local_cummin(batches):
        import pandas as pd  # noqa: PLC0415 — worker-side import

        running = None
        for pdf in batches:
            if not len(pdf):
                continue
            cum = pdf["__ymin"].cummin()
            if running is not None:
                cum = cum.clip(upper=running)
            running = cum.iloc[-1]
            out = pdf[["__x", "__ymin", "__pid"]].copy()
            out["__localmin"] = cum
            yield out

    local = parted.mapInPandas(
        local_cummin,
        schema=T.StructType(
            [
                parted.schema["__x"],
                parted.schema["__ymin"],
                T.StructField("__pid", T.IntegerType()),
                T.StructField("__localmin", parted.schema["__ymin"].dataType),
            ]
        ),
    ).persist()
    totals = (
        local.groupBy("__pid").agg(F.min("__localmin").alias("__pmin")).collect()
    )
    prefix: dict[int, float | None] = {}
    best = None
    for row in sorted(totals, key=lambda r: r["__pid"]):
        prefix[row["__pid"]] = best  # EXCLUSIVE prefix: min of all earlier parts
        cand = row["__pmin"]
        best = cand if best is None or (cand is not None and cand < best) else best
    spark = df.sparkSession
    off = spark.createDataFrame(
        [(pid, v) for pid, v in prefix.items()],
        T.StructType(
            [
                T.StructField("__pid", T.IntegerType()),
                T.StructField("__before", parted.schema["__ymin"].dataType),
            ]
        ),
    )
    # frontier: strictly better than everything at a smaller x. Same-x ties
    # collapsed in phase 1; the EXCLUSIVE local shift compares against
    # predecessors only.
    w = Window.partitionBy("__pid").orderBy("__x")
    frontier = (
        local.withColumn("__prevlocal", F.lag("__localmin").over(w))
        .join(F.broadcast(off), "__pid")
        .withColumn("__beforeme", F.least("__prevlocal", "__before"))
        .filter(F.col("__beforeme").isNull() | (F.col("__ymin") < F.col("__beforeme")))
        .select(F.col("__x"), F.col("__ymin"))
    )
    return df.join(
        F.broadcast(frontier),
        (F.col(x_col) == F.col("__x")) & (F.col(y_col) == F.col("__ymin")),
        "left_semi",
    )


def rolling_median(
    df: DataFrame,
    part_cols: Sequence[str],
    order_cols: Sequence[str] | str,
    value_col: str,
    *,
    window: int = 7,
    out_col: str = "rolling_median",
) -> DataFrame:
    """Exact rolling median over the trailing ``window`` rows per group,
    emitted only once the window is full (partial windows are bias, not
    signal). Implemented as collect_list over a bounded rows-frame +
    in-row sort — exact and engine-portable, unlike percentile_approx.
    For odd windows the median is one element, so no float interpolation
    can diverge between engines.

    Scale: one window shuffle on the group key; per-row state is the
    ``window`` values (bounded, small). This is the right shape when
    window is tens-of-rows; for thousands-wide windows switch to a
    two-heap/mergeable-sketch pandas UDF."""
    if isinstance(order_cols, str):
        order_cols = [order_cols]
    # the ordering must be TOTAL — a rows-frame with ties admits any of
    # several trailing windows and the median stops being well-defined
    w = (
        Window.partitionBy(*part_cols)
        .orderBy(*order_cols)
        .rowsBetween(-(window - 1), 0)
    )
    arr = F.sort_array(F.collect_list(F.col(value_col)).over(w))
    mid = window // 2
    med = F.when(
        F.size(arr) == window,
        F.when(
            F.lit(window % 2 == 1), F.element_at(arr, mid + 1)
        ).otherwise(
            (F.element_at(arr, mid) + F.element_at(arr, mid + 1)) / 2
        ),
    )
    return df.withColumn(out_col, med)


def running_distinct(
    df: DataFrame,
    key_col: str,
    time_col: str,
) -> DataFrame:
    """Cumulative-distinct time series: for each distinct ``time_col``
    value, how many distinct keys have been seen at-or-before it, plus
    how many appeared first at that instant. Count-distinct over a
    cumulative window is unsupported (and inherently quadratic); the
    standard decomposition is exact: each key contributes +1 at its FIRST
    appearance (one groupBy min), and the running sum of first-appearance
    counts IS the cumulative distinct.

    The running sum goes over distinct time values (one row each). A
    single window over them is time-cardinality-bounded — fine for
    calendar-grained series; reuse the two-phase prefix pattern
    (interval_concurrency / pareto_frontier_2d) when the time axis is
    itself unbounded.

    Output: (time_col, new_keys, cum_distinct)."""
    first = df.groupBy(key_col).agg(F.min(time_col).alias("__t0"))
    per_t = first.groupBy(F.col("__t0").alias(time_col)).agg(
        F.count(F.lit(1)).alias("new_keys")
    )
    all_t = df.select(time_col).distinct().join(per_t, [time_col], "left").select(
        time_col, F.coalesce("new_keys", F.lit(0)).alias("new_keys")
    )
    # bounded-window: distinct time values (calendar-grained; see
    # docstring for the unbounded-axis escape hatch)
    w = Window.orderBy(time_col).rowsBetween(Window.unboundedPreceding, 0)
    return all_t.withColumn("cum_distinct", F.sum("new_keys").over(w))


def ewma_integer(
    df: DataFrame,
    part_cols: Sequence[str],
    order_col: str,
    value_micro_col: str,
    *,
    num: int = 1,
    den: int = 4,
    out_col: str = "ewma_micro",
) -> DataFrame:
    """Exponentially-weighted moving average as a pure-integer recurrence:
    s_t = floor((num * x_t + (den - num) * s_{t-1}) / den) over
    micro-quantized values — alpha = num/den. The floor-div keeps every
    step in exact bigint arithmetic, so any engine replaying the same
    walk (e.g. a recursive-CTE oracle) lands on identical values;
    float EWMA recurrences accumulate rounding that makes cross-engine
    equality a coin flip.

    Inherently sequential WITHIN a group, but grouped applyInPandas pays
    ~1 ms of invocation overhead PER GROUP — ruinous for many tiny
    series (measured 14 s for 10k customers). This runs the
    partition-scan form instead: hash-repartition on the group key (all
    of a group's rows land in one partition), sort within partitions by
    (group, order), then ONE mapInPandas pass walks each partition's
    rows with a group-boundary reset, carrying (group, state) across
    Arrow batches. Python touches each row once; per-group overhead is
    zero.

    Output: input + ``out_col`` (bigint micro-units).
    """
    import pandas as pd  # noqa: PLC0415 — worker-side dependency

    part_cols = list(part_cols)
    if len(part_cols) != 1:
        raise ValueError("ewma_integer expects exactly one group column")
    g = part_cols[0]
    parted = df.repartition(F.col(g)).sortWithinPartitions(g, order_col)

    def scan(batches):
        carry_g = None
        carry_s = None
        for pdf in batches:
            if not len(pdf):
                continue
            gs = pdf[g].to_numpy()
            xs = pdf[value_micro_col].to_numpy()
            out = []
            cg, cs = carry_g, carry_s
            for gi, xi in zip(gs, xs):
                xi = int(xi)
                cs = xi if gi != cg else (num * xi + (den - num) * cs) // den
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


def holt_linear_integer(
    df: DataFrame,
    part_cols: Sequence[str],
    order_col: str,
    value_micro_col: str,
    *,
    alpha_num: int = 1,
    alpha_den: int = 4,
    beta_num: int = 1,
    beta_den: int = 4,
    level_col: str = "level_micro",
    trend_col: str = "trend_micro",
    forecast_col: str = "forecast_micro",
) -> DataFrame:
    """Holt's linear-trend double exponential smoothing as a pure-integer
    recurrence over micro-quantized values:

        l_t = floor((an*x_t + (ad-an)*(l_{t-1} + b_{t-1})) / ad)
        b_t = floor((bn*(l_t - l_{t-1}) + (bd-bn)*b_{t-1}) / bd)

    seeded l_1 = x_1, b_1 = 0; the one-step-ahead forecast is l_t + b_t.
    Every step is exact bigint floor-div arithmetic (Python ``//`` and SQL
    FLOOR(a/d) both floor toward -inf, and for the den=4 default the float
    division is a power of two, hence exact), so a recursive-CTE oracle
    replays the walk to identical values — the float form drifts
    cross-engine (same discipline as ewma_integer above).

    Same execution shape as ewma_integer: inherently sequential within a
    series, so hash-repartition on the group key, sort within partitions
    by (group, order), ONE mapInPandas scan with a cross-batch
    (group, level, trend) carry. Zero per-group overhead — grouped
    applyInPandas costs ~1 ms per group and 10k tiny series pay 14 s.

    Output: input + level/trend/forecast bigint micro-unit columns.
    """
    import pandas as pd  # noqa: PLC0415 — worker-side dependency

    part_cols = list(part_cols)
    if len(part_cols) != 1:
        raise ValueError("holt_linear_integer expects exactly one group column")
    g = part_cols[0]
    an, ad, bn, bd = alpha_num, alpha_den, beta_num, beta_den
    parted = df.repartition(F.col(g)).sortWithinPartitions(g, order_col)

    def scan(batches):
        carry = (None, None, None)  # (group, level, trend)
        for pdf in batches:
            if not len(pdf):
                continue
            gs = pdf[g].to_numpy()
            xs = pdf[value_micro_col].to_numpy()
            levels, trends = [], []
            cg, cl, cb = carry
            for gi, xi in zip(gs, xs):
                xi = int(xi)
                if gi != cg:
                    cl, cb = xi, 0
                else:
                    prev_l = cl
                    cl = (an * xi + (ad - an) * (cl + cb)) // ad
                    cb = (bn * (cl - prev_l) + (bd - bn) * cb) // bd
                cg = gi
                levels.append(cl)
                trends.append(cb)
            carry = (cg, cl, cb)
            pdf = pdf.copy()
            pdf[level_col] = pd.Series(levels, dtype="int64").values
            pdf[trend_col] = pd.Series(trends, dtype="int64").values
            pdf[forecast_col] = pdf[level_col] + pdf[trend_col]
            yield pdf

    schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField(level_col, T.LongType()),
            T.StructField(trend_col, T.LongType()),
            T.StructField(forecast_col, T.LongType()),
        ]
    )
    return parted.mapInPandas(scan, schema=schema)


def holt_winters_integer(
    df: DataFrame,
    part_cols: Sequence[str],
    order_col: str,
    value_col: str,
    *,
    period: int = 7,
    alpha_num: int = 1,
    alpha_den: int = 4,
    beta_num: int = 1,
    beta_den: int = 4,
    gamma_num: int = 1,
    gamma_den: int = 4,
) -> DataFrame:
    """Additive Holt-Winters triple exponential smoothing as a pure
    integer recurrence (level + trend + a ``period``-slot seasonal
    vector):

        l_t = floor((an*(x_t − s[i]) + (ad−an)*(l+b)) / ad)
        b_t = floor((bn*(l_t − l) + (bd−bn)*b) / bd)
        s[i] = floor((gn*(x_t − l_t) + (gd−gn)*s[i]) / gd),  i = (t−1) % period

    seeded l=x_1, b=0, s=0s; ``fitted`` is the one-step-ahead forecast
    l+b+s[i] made before observing x_t (NULL at t=1). Denominators must
    be powers of two: the oracle replays the walk with FLOOR(expr/4.0)
    — exact for dyadic denominators and flooring toward −inf like
    Python ``//`` (DuckDB's integer ``//`` truncates on negatives, and
    trend/seasonal terms DO go negative). Same partition-scan shape as
    ewma/holt: one repartition on the group key, sorted scan, carry =
    (group, t, level, trend, seasonal list) across Arrow batches.

    Output: input + level, trend, seasonal (slot i after update),
    fitted — all bigint.
    """
    import pandas as pd  # noqa: PLC0415 — worker-side dependency

    for den in (alpha_den, beta_den, gamma_den):
        if den & (den - 1):
            raise ValueError(f"denominators must be powers of two, got {den}")
    part_cols = list(part_cols)
    if len(part_cols) != 1:
        raise ValueError("holt_winters_integer expects exactly one group column")
    g = part_cols[0]
    an, ad, bn, bd, gn, gd = (
        alpha_num, alpha_den, beta_num, beta_den, gamma_num, gamma_den,
    )
    parted = df.repartition(F.col(g)).sortWithinPartitions(g, order_col)

    def scan(batches):
        carry = (None, 0, 0, 0, None)  # (group, t, level, trend, s list)
        for pdf in batches:
            if not len(pdf):
                continue
            gs = pdf[g].to_numpy()
            xs = pdf[value_col].to_numpy()
            lvls, trends, seas, fits = [], [], [], []
            cg, ct, cl, cb, cs = carry
            for gi, xi in zip(gs, xs):
                xi = int(xi)
                if gi != cg:
                    cg, ct, cl, cb, cs = gi, 1, xi, 0, [0] * period
                    fit = None
                else:
                    ct += 1
                    i = (ct - 1) % period
                    sp = cs[i]
                    fit = cl + cb + sp
                    l_new = (an * (xi - sp) + (ad - an) * (cl + cb)) // ad
                    cb = (bn * (l_new - cl) + (bd - bn) * cb) // bd
                    cs[i] = (gn * (xi - l_new) + (gd - gn) * sp) // gd
                    cl = l_new
                lvls.append(cl)
                trends.append(cb)
                seas.append(cs[(ct - 1) % period])
                fits.append(fit)
            carry = (cg, ct, cl, cb, cs)
            pdf = pdf.copy()
            pdf["level"] = pd.Series(lvls, dtype="int64").values
            pdf["trend"] = pd.Series(trends, dtype="int64").values
            pdf["seasonal"] = pd.Series(seas, dtype="int64").values
            pdf["fitted"] = pd.array(fits, dtype="Int64")
            yield pdf

    schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("level", T.LongType()),
            T.StructField("trend", T.LongType()),
            T.StructField("seasonal", T.LongType()),
            T.StructField("fitted", T.LongType()),
        ]
    )
    return parted.mapInPandas(scan, schema=schema)


def rolling_zscore_outliers(
    df: DataFrame,
    part_cols: Sequence[str],
    order_cols: Sequence[str],
    value_int_col: str,
    *,
    window: int = 7,
    z: int = 3,
    out_col: str = "is_outlier",
) -> DataFrame:
    """Rolling z-score outlier flag WITHOUT sqrt or float thresholds:
    x is compared against the ``window`` rows STRICTLY BEFORE it — flag
    when (x - mean)^2 > z^2 * variance, cross-multiplied into pure
    bigint arithmetic on integer-quantized values:
    (x*n - sum)^2 > z^2 * (n*sumsq - sum^2). Exact, so any engine
    replays the boundary decision bit-for-bit (a sqrt-based z-score
    flips on float rounding).

    The baseline EXCLUDES the current row by construction: a point
    inside its own n-row window can never exceed z = (n-1)/sqrt(n)
    (~2.27 at n=7), so a self-inclusive 3-sigma test is structurally
    blind — the classic rolling-outlier bug.

    Partial baselines emit NULL (variance of a warm-up is bias). One
    window shuffle; sums and sums-of-squares are the only state. Values
    must be pre-quantized ints sized so n*sumsq fits int64 (cents of
    6-figure amounts over tens-of-rows windows are safe).
    """
    w = (
        Window.partitionBy(*part_cols)
        .orderBy(*order_cols)
        .rowsBetween(-window, -1)
    )
    x = F.col(value_int_col).cast("long")
    s = F.sum(x).over(w)
    sq = F.sum(x * x).over(w)
    cnt = F.count(x).over(w)
    n = F.lit(window).cast("long")
    dev = x * n - s
    flag = dev * dev > F.lit(z * z) * (n * sq - s * s)
    return df.withColumn(
        out_col, F.when(cnt == window, flag)
    )


def interval_coalesce(
    df: DataFrame,
    key_cols: Sequence[str],
    start_col: str,
    end_col: str,
    *,
    out_start: str = "s",
    out_end: str = "e",
) -> DataFrame:
    """Merge overlapping-or-touching intervals per key into maximal
    covered spans (gaps-and-islands): order a key's intervals by
    (start, end), open a new island exactly when an interval starts
    AFTER the running max end of everything before it, then collapse
    each island to (min start, max end, member count). The canonical
    interval-normalization step before coverage/occupancy math — the
    dual of interval_concurrency (which counts overlap depth, where
    this erases it). Closed-merge semantics: an interval starting
    exactly at the running max end joins the island (use half-open
    inputs shifted by one tick if touching must NOT merge).

    Shape: ONE window over (key, start, end) — running max end over the
    preceding frame plus a running sum of island-open flags — then one
    grouped aggregate on (key, island). A key's intervals must fit a
    partition (the usual window contract); islands never span keys.
    Deterministic: equal (start, end) duplicates are interchangeable,
    and every other order position is forced by the total order.

    Output: (*key_cols, out_start, out_end, n_merged).
    """
    keys = list(key_cols)
    w = Window.partitionBy(*keys).orderBy(start_col, end_col)
    prev_max_e = F.max(end_col).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    opens = F.when(
        prev_max_e.isNull() | (F.col(start_col) > prev_max_e), 1
    ).otherwise(0)
    island = F.sum(opens).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn("__island", island)
        .groupBy(*keys, "__island")
        .agg(
            F.min(start_col).alias(out_start),
            F.max(end_col).alias(out_end),
            F.count(F.lit(1)).cast("bigint").alias("n_merged"),
        )
        .drop("__island")
    )
