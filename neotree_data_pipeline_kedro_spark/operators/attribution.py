"""Markov-chain marketing attribution: removal effects over user journey
graphs (Anderl et al. 2014's framework, the data-driven alternative to
last-touch/position rules that j26_multitouch implements).

No counterpart in the reference engine; first-class LLM/analytics
extension alongside SURVEY §2.12.

Scale shape: the DISTRIBUTED work is building the first-order transition
counts — two windows over the event stream (first-conversion truncation +
lead pairing) and one grouped count, all keyed on user then on
(from, to). What crosses to the driver is the transition MATRIX:
(channels + 1) × (channels + 2) integers — bounded by the channel
vocabulary (single digits to hundreds), never by event volume. The
absorption probabilities then come from value iteration on that constant-
size matrix in exact Python integers, and the result re-enters the plan
as literals. This is the same bounded-collect discipline as
operators/uids (collision set) and operators/windows (partition offsets).

Determinism contract: probabilities are micro-scaled integers (1e12 =
certainty); each value-iteration step is
p'(s) = (Σ_t cnt[s][t]·p(t)) // out(s) — exact integer multiply-sum and
one truncating division of non-negative operands, so Python //, DuckDB //
and Spark `div` all agree bit-for-bit and a SQL oracle can replay the
whole iteration (list-state recursive CTE, the Holt-Winters technique).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MICRO = 1_000_000_000_000


def journey_edges(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    tiebreak_col: str,
    channel_col: str,
    conversion: str,
) -> DataFrame:
    """First-order journey transitions with start/conv/null states:
    each user's event stream is truncated at the FIRST conversion event
    (inclusive); edges are start→first, each adjacent pair, and
    last→null when the journey never converts. Output:
    (from_state, to_state, cnt) with states named by channel plus
    '__start__' / '__conv__' / '__null__'.
    """
    ev = events.select(
        F.col(user_col).alias("u"),
        F.col(ts_col).alias("t"),
        F.col(tiebreak_col).alias("e"),
        F.col(channel_col).alias("ch"),
    )
    fp = (
        ev.where(F.col("ch") == conversion)
        .groupBy("u")
        .agg(F.min(F.struct(F.col("t").alias("m"), F.col("e").alias("e"))).alias("f"))
    )
    kept = ev.join(fp, "u", "left").where(
        F.col("f").isNull()
        | (F.col("t") < F.col("f.m"))
        | ((F.col("t") == F.col("f.m")) & (F.col("e") <= F.col("f.e")))
    )
    w = Window.partitionBy("u").orderBy(F.col("t").asc(), F.col("e").asc())
    seq = kept.select(
        "u",
        F.when(F.col("ch") == conversion, F.lit("__conv__"))
        .otherwise(F.col("ch"))
        .alias("st"),
        F.row_number().over(w).alias("rn"),
        F.lead(
            F.when(F.col("ch") == conversion, F.lit("__conv__")).otherwise(
                F.col("ch")
            )
        )
        .over(w)
        .alias("nxt"),
    )
    starts = seq.where(F.col("rn") == 1).select(
        F.lit("__start__").alias("from_state"), F.col("st").alias("to_state")
    )
    mids = seq.where(F.col("nxt").isNotNull()).select(
        F.col("st").alias("from_state"), F.col("nxt").alias("to_state")
    )
    ends = seq.where(
        F.col("nxt").isNull() & (F.col("st") != "__conv__")
    ).select(
        F.col("st").alias("from_state"), F.lit("__null__").alias("to_state")
    )
    return (
        starts.unionByName(mids)
        .unionByName(ends)
        .groupBy("from_state", "to_state")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def _value_iterate(
    cnt: dict[tuple[int, int], int], n_from: int, n_states: int, iters: int
) -> list[int]:
    """Exact integer value iteration: p[conv]=MICRO fixed, p[null]=0
    fixed; transient states s get (Σ_t cnt·p) // out. Returns the final
    p vector (1-indexed state ids at positions 0..n_states-1)."""
    out = [0] * (n_from + 1)
    for (s, _t), c in cnt.items():
        out[s] += c
    p = [0] * (n_states + 1)
    p[n_states - 1] = MICRO  # conv state = n_states-1 by convention
    for _ in range(iters):
        new = p[:]
        for s in range(1, n_from + 1):
            if out[s] > 0:
                acc = 0
                for t in range(1, n_states + 1):
                    c = cnt.get((s, t), 0)
                    if c:
                        acc += c * p[t]
                new[s] = acc // out[s]
        p = new
    return p


def markov_removal_effects(
    edges: DataFrame,
    channels: Sequence[str],
    *,
    iters: int = 25,
) -> list[tuple[str, int, int, int]]:
    """Removal effect per channel from a journey-edge table: rebuild the
    chain with transitions INTO the channel redirected to __null__ and
    re-solve; effect_ppm = (p_base − p_removed)·1e6 // p_base.

    Returns driver-side rows (channel, p_base_micro, p_removed_micro,
    removal_effect_ppm) — callers lift them back into a DataFrame. The
    collect is the (channels+1)×(channels+2) count matrix (bounded by
    the channel vocabulary, see module docstring).
    """
    chans = list(channels)
    # state ids: 1=__start__, 2..k+1 = channels, k+2=__conv__, k+3=__null__
    idx = {"__start__": 1}
    for i, c in enumerate(chans, start=2):
        idx[c] = i
    conv_i = len(chans) + 2
    null_i = len(chans) + 3
    idx["__conv__"] = conv_i
    idx["__null__"] = null_i
    rows = edges.collect()  # bounded: one row per (state, state) pair
    # validate up front: an edge state outside the declared channel
    # vocabulary (caller passed a subset, or a typo) would otherwise
    # surface as a bare KeyError on the driver with no context (r7
    # advice) — name the offenders instead
    unknown = sorted(
        {s for r in rows for s in (r.from_state, r.to_state) if s not in idx}
    )
    if unknown:
        raise ValueError(
            "markov_removal_effects: edge table contains state(s) not in "
            f"`channels` (nor __start__/__conv__/__null__): {unknown}; "
            "pass them in `channels` or map them to __null__ upstream"
        )
    cnt: dict[tuple[int, int], int] = {}
    for r in rows:
        s, t = idx[r.from_state], idx[r.to_state]
        cnt[(s, t)] = cnt.get((s, t), 0) + int(r.cnt)
    n_from = len(chans) + 1
    base = _value_iterate(cnt, n_from, null_i, iters)
    p_base = base[1]
    outp = []
    for c in chans:
        ci = idx[c]
        red: dict[tuple[int, int], int] = {}
        for (s, t), v in cnt.items():
            key = (s, null_i) if t == ci else (s, t)
            red[key] = red.get(key, 0) + v
        p_rm = _value_iterate(red, n_from, null_i, iters)[1]
        ppm = ((p_base - p_rm) * 1_000_000) // p_base if p_base > 0 else 0
        outp.append((c, p_base, p_rm, ppm))
    return outp
