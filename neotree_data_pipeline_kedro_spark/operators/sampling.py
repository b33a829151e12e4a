"""Deterministic sampling primitives for training-data mixture construction
(BASELINE.json north-star extension, same family as operators/neardup).

A corpus at 100 TB is sampled *declaratively*: every decision is a pure
function of the row's key, so re-runs, retries, and incremental additions
select the same rows without any stored sampling state. Two primitives:

- ``hash_gate``: keep a row iff md5(key) is below a hex threshold — a
  stateless per-source rate gate (string comparison on the hex digest, so
  any engine with md5 agrees bit-for-bit; '80' = 50%, '40' = 25%, 'c0' =
  75%, two hex chars give 1/256 granularity). Runs in the scan stage,
  shuffle-free.
- ``budget_prefix``: per group, keep the hash-ordered prefix of rows whose
  running weight (e.g. token count) stays within a budget — "N tokens per
  source" dataset construction. One window shuffle on the group key; the
  running sum never materializes more than the sampled rows.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def hash_gate(key: Column | str, threshold: Column | str) -> Column:
    """True iff md5(key-as-string) < threshold (hex-string comparison).

    ``threshold`` may be a literal hex prefix ('80' keeps the ~50% of keys
    whose digest sorts below it) or a Column (per-row rates, e.g. a
    per-source map lookup). Deterministic, stateless, engine-portable —
    portable ONLY for integer/string keys: float/timestamp CAST-to-string
    renderings are engine-specific, so gate on a stable key column.
    """
    t = F.lit(threshold) if isinstance(threshold, str) else threshold
    return F.md5(_col(key).cast("string")) < t


def rate_map(rates: Mapping[str, str]) -> Column:
    """Literal map col for per-group hash_gate thresholds."""
    from itertools import chain

    return F.create_map(
        *chain.from_iterable((F.lit(k), F.lit(v)) for k, v in rates.items())
    )


def greedy_pack(
    df: DataFrame,
    group_cols: Sequence[str],
    weight_col: str,
    budget: int,
    key_col: str,
    pack_col: str = "pack_id",
) -> DataFrame:
    """Greedy in-order sequence packing: within each group, walk rows in
    deterministic hash order and assign each to the current pack while the
    pack's weight stays <= ``budget``; an overflowing row starts the next
    pack (an oversized single row gets a pack of its own). The
    fixed-token-window batching step of LLM training-data prep.

    The accumulator resets on overflow, so this is NOT a running-sum
    window (cum//budget would leak leftover capacity across packs) — it is
    inherently sequential per group, hence ``applyInPandas``: one shuffle
    on the group key, a tight numpy loop per group, nothing on the driver.
    At 100 TB, sub-shard big groups first (e.g. ``hash_gate`` buckets) so
    each pandas group stays bounded; packs never span shards by design.

    ``key_col`` must be integer- or string-typed: the walk order is
    md5(str(key)), and Python ``str()`` of floats/timestamps renders
    differently from SQL ``CAST(key AS VARCHAR)``, which would silently
    break the cross-engine deterministic-order contract.
    """
    import pandas as pd

    key_type = df.schema[key_col].dataType.simpleString()
    if key_type not in ("tinyint", "smallint", "int", "bigint", "string"):
        raise ValueError(
            f"greedy_pack: key_col {key_col!r} must be integer or string "
            f"(got {key_type}); str()-rendering of {key_type} differs from "
            "SQL CAST AS VARCHAR and breaks deterministic order"
        )

    out_fields = df.schema.fields
    schema = (
        ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in out_fields)
        + f", {pack_col} bigint"
    )
    budget_ = int(budget)
    weight_, key_ = weight_col, key_col

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.copy()
        pdf["__h"] = pdf[key_].astype(str).map(
            lambda s: __import__("hashlib").md5(s.encode()).hexdigest()
        )
        pdf = pdf.sort_values(["__h", key_], kind="mergesort")
        ids, fill, cur = [], 0, 0
        for w in pdf[weight_]:
            w = int(w)
            if fill > 0 and fill + w > budget_:
                cur += 1
                fill = 0
            fill += w
            ids.append(cur)
        pdf[pack_col] = ids
        return pdf.drop(columns="__h")

    return df.groupBy(*group_cols).applyInPandas(pack, schema=schema)


def budget_prefix(
    df: DataFrame,
    group_cols: Sequence[str],
    weight_col: Column | str,
    budget: int,
    order_cols: Sequence[Column] | None = None,
    key_col: str | None = None,
    cum_col: str = "cum_weight",
) -> DataFrame:
    """Keep each group's prefix (in deterministic hash order by default)
    while the running sum of ``weight_col`` stays <= ``budget``.

    The inclusive-prefix contract: a row is kept iff the running total
    *including it* is within budget — the greedy "fill to the brim, skip
    the overflowing doc and stop" rule, made order-deterministic. One
    window shuffle on ``group_cols``.
    """
    w = _col(weight_col)
    order = list(order_cols or [])
    if not order:
        if key_col is None:
            raise ValueError("budget_prefix: pass order_cols or key_col")
        order = [F.md5(F.col(key_col).cast("string")), F.col(key_col)]
    win = (
        Window.partitionBy(*group_cols)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(cum_col, F.sum(w).over(win)).filter(
        F.col(cum_col) <= budget
    )


def stratified_sample(
    df: DataFrame,
    stratum_cols: Sequence[str],
    key_col: str,
    n_per_stratum: int,
    *,
    counts: Mapping[str, int] | None = None,
) -> DataFrame:
    """Exact-count per-stratum sample: keep the first ``n`` rows of each
    stratum in deterministic md5(key) order — the rebalancing step of
    training-mixture construction ("at most N docs per language/source").

    ``counts`` (values of the FIRST stratum column → n) overrides the
    default count per stratum, so minority strata can be kept whole while
    the head stratum is capped. Like ``hash_gate``, the decision is a pure
    function of the row's key: re-runs and incremental additions agree on
    the kept set with no sampling state. One window shuffle on the stratum
    key; ``key_col`` must be integer- or string-typed for the same
    cross-engine str()/CAST reason as ``greedy_pack``.
    """
    key_type = dict(df.dtypes)[key_col]
    # exact names, not startswith: "interval day" would match "int"
    if key_type not in ("string", "tinyint", "smallint", "int", "bigint"):
        raise ValueError(
            f"stratified_sample: key_col {key_col!r} must be integer or "
            f"string (got {key_type})"
        )
    win = Window.partitionBy(*stratum_cols).orderBy(
        F.md5(F.col(key_col).cast("string")), F.col(key_col)
    )
    limit = F.lit(n_per_stratum)
    if counts:
        limit = F.coalesce(
            F.element_at(
                F.create_map(
                    *[F.lit(x) for kv in counts.items() for x in kv]
                ),
                F.col(stratum_cols[0]).cast("string"),
            ),
            F.lit(n_per_stratum),
        )
    return (
        df.withColumn("__rn", F.row_number().over(win))
        .filter(F.col("__rn") <= limit)
        .drop("__rn")
    )


def split_assign(
    df: DataFrame,
    key_col: Column | str,
    splits: Sequence[tuple[str, float]],
    out_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: each key's md5 digest is
    compared against cumulative hex boundaries, so the split is a pure
    function of the key — stable across runs, partitionings, engines, and
    dataset growth (a key keeps its split when new data arrives, the
    property random() splits lack and training reproducibility needs).

    ``splits`` is an ordered [(name, fraction), ...]; fractions should sum
    to 1 (the last split absorbs any remainder). Same key contract as
    hash_gate: integer/string keys only. Stateless map-side expression —
    no shuffle, composes with any scan.
    """
    if not splits:
        raise ValueError("split_assign: at least one split required")
    total = sum(f for _, f in splits)
    if not 0.999 <= total <= 1.001:
        raise ValueError(
            f"split_assign: fractions sum to {total}, expected ~1.0 "
            "(the last split only absorbs rounding, not a missing share)"
        )
    bounds: list[tuple[str, str]] = []
    cum = 0.0
    for name, frac in splits[:-1]:
        cum += frac
        bounds.append((name, format(min(16**8 - 1, int(cum * 16**8)), "08x")))
    digest = F.md5(_col(key_col).cast("string"))
    assign = F.lit(splits[-1][0])
    for name, bound in reversed(bounds):
        assign = F.when(digest < F.lit(bound), F.lit(name)).otherwise(assign)
    return df.withColumn(out_col, assign)


def priority_sample(
    df: DataFrame,
    key_col: Column | str,
    weight_col: Column | str,
    k: int,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Deterministic weighted sampling via priority sampling (Duffield/
    Lund/Thorup): each row gets priority q = w / u with u a
    hash-derived uniform in (0, 1], and the k highest-priority rows are
    the sample — heavier rows win proportionally more often, with no
    transcendental in the key (the exponential-clock A-ExpJ variant
    needs ln(u); q = w/u is the published ln-free scheme, so the
    priorities are exact double divisions and the sample is identical on
    any engine/partitioning).

    The uniform comes from a Knuth multiplicative hash of the key
    (pure integer arithmetic — portable where md5-hex parsing is not);
    ``key_col`` must be integer-typed. Negative keys are fine: the hash
    goes through pmod (always in [0, 2^32)), not %, whose sign follows
    the dividend and would make u_inv NULL (divide-by-zero) or negative.
    Ties break to the lowest key. One top-k window per group
    (TakeOrdered when ungrouped).
    """
    h = F.pmod(_col(key_col).cast("long") * F.lit(2654435761), F.lit(4294967296))
    u_inv = F.lit(4294967297.0) / (h + 1).cast("double")  # = 1/u in [1, 2^32]
    q = _col(weight_col).cast("double") * u_inv
    ranked = df.withColumn("__priority", q)
    w = Window.partitionBy(*group_cols).orderBy(
        F.desc("__priority"), _col(key_col).asc()
    )
    return (
        ranked.withColumn("__rank", F.row_number().over(w))
        .filter(F.col("__rank") <= k)
        .drop("__rank")
    )


# Literal affine constants for rendezvous_assign: h_s(k) = (a_s·k + b_s)
# mod (2^31 − 1). Fixed literals (not runtime randomness) so the SAME
# integers appear in the Spark plan and in any SQL oracle — the portable-
# hash discipline dd_minhash_estimate_eval established. Generated once
# from splitmix-style mixing of the shard index; coprime with p.
RENDEZVOUS_P = 2_147_483_647


def rendezvous_consts(n_shards: int) -> list[tuple[int, int]]:
    """(a_s, b_s) per shard — deterministic literals derived from the
    shard index with 64-bit splitmix mixing, reduced mod p into [1, p-1]
    (a) and [0, p-1] (b)."""
    out = []
    for s in range(n_shards):
        z = (s * 0x9E3779B97F4A7C15 + 0xBF58476D1CE4E5B9) % (1 << 64)
        z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9 % (1 << 64)
        z = (z ^ (z >> 27)) * 0x94D049BB133111EB % (1 << 64)
        z ^= z >> 31
        a = z % (RENDEZVOUS_P - 1) + 1
        b = (z >> 32) % RENDEZVOUS_P
        out.append((a, b))
    return out


def rendezvous_assign(
    df: DataFrame,
    key_col: str,
    n_shards: int,
    *,
    out_col: str = "shard",
) -> DataFrame:
    """Rendezvous (highest-random-weight) sharding: each key goes to the
    shard whose keyed hash h_s(key) is largest — the consistent-placement
    primitive for routing a corpus to N workers/buckets such that
    growing N to N+1 moves only ~1/(N+1) of the keys (vs ~all of them
    under `key % N`). The placement layer for incremental corpus
    re-distribution, cache assignment, and shard-stable retries.

    Scale shape: shuffle-free — a per-row map over n_shards literal
    affine hashes folded with array_max; no join, no window, no state.
    n_shards is a plan-time constant (the expression tree is n_shards
    wide), fine for the hundreds-of-shards regime this targets.

    Determinism: integer affine hashes mod the Mersenne prime 2^31−1
    with LITERAL constants (rendezvous_consts), max-struct tie-break to
    the smallest shard id — reproducible in any engine, no engine hash
    function involved. Keys must be non-negative integers (id-like);
    map strings through a stable key first.
    """
    consts = rendezvous_consts(n_shards)
    k = F.col(key_col).cast("bigint") % RENDEZVOUS_P
    pairs = [
        F.struct(
            ((F.lit(a) * k + F.lit(b)) % RENDEZVOUS_P).alias("h"),
            F.lit(-s).cast("int").alias("ns"),
        )
        for s, (a, b) in enumerate(consts)
    ]
    best = F.array_max(F.array(*pairs))
    return df.withColumn(out_col, (-best.getField("ns")).cast("int"))


def grid_diversity_sample(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    sign_dims: int = 8,
    quota: int = 8,
) -> DataFrame:
    """Cluster-balanced diversity sampling over an embedding column: map
    every vector to a deterministic sign-pattern cell (bit i set when
    component i is >= 0 — a 2^sign_dims-cell partition of embedding
    space, the hyperplane-LSH bucketing with axis-aligned planes), then
    keep at most ``quota`` rows per cell by md5-of-id priority. The
    diversity-quota step of training-data curation: near-duplicate
    regions of embedding space stop dominating the sample because every
    cell — dense or sparse — contributes the same cap, and the
    md5 priority makes the draw reproducible and engine-portable
    (no RNG, no engine hash).

    All built-in expressions: a fold over the first ``sign_dims``
    components, one window per cell. Shuffle carries (cell, priority,
    id) plus whatever the caller selects; at 100 TB the cell key is
    uniform-ish by construction (sign bits of roughly centered
    embeddings), and quota bounds every cell's survivors regardless of
    skew. Output: input columns + (cell INT, pick_rank INT), filtered
    to the quota.
    """
    cell = None
    for i in range(sign_dims):
        bit = F.when(
            F.element_at(F.col(vec_col), i + 1) >= 0, F.lit(1 << i)
        ).otherwise(F.lit(0))
        cell = bit if cell is None else cell + bit
    prio = F.md5(F.col(id_col).cast("string"))
    w = Window.partitionBy("cell").orderBy(prio.alias("__p"), id_col)
    return (
        df.withColumn("cell", cell.cast("int"))
        .withColumn("pick_rank", F.row_number().over(w).cast("int"))
        .filter(F.col("pick_rank") <= quota)
    )


def domain_mix_rebalance(
    df: DataFrame,
    group_col: str,
    weight_col: str,
    key_col: str,
    shares_ppm: Mapping[str, int],
) -> DataFrame:
    """Static mixture rebalancing: downsample each group (language,
    domain, source) so the kept corpus matches a target mixture — the
    data-mixture step of LLM corpus construction (the static-weights
    half of the DoReMi/Pile recipe: given target shares, never
    upsample, find the largest corpus that satisfies every share cap
    and the per-group rates that realize it).

    Exact integer arithmetic throughout, so the whole computation is
    one declarative plan with a value-hash oracle:

    - ``tot_d``        = sum of ``weight_col`` per group (one shuffle);
    - ``feasible_d``   = floor(tot_d * 1e6 / share_ppm_d) — the largest
      total corpus for which group d's cap holds;
    - ``T*``           = min_d feasible_d (a 1-row aggregate, broadcast
      back — no driver collect);
    - ``rate_ppm_d``   = min(1e6, floor(T* * share_ppm_d / tot_d));
    - a row is kept iff the top 24 bits of md5(key) scaled by 1e6 fall
      below rate_ppm_d * 2^24 — the stateless ``hash_gate`` family, so
      retries and incremental re-runs keep the same rows.

    Groups absent from ``shares_ppm`` are dropped (rate 0) and omitted
    from the report. int64 bounds: tot_d * 1e6 and T* * share_ppm_d
    must stay below 2^63, i.e. per-group weight totals up to ~9.2e12
    (tokens); past that switch the two products to decimal(38,0) — the
    comparison structure is unchanged.

    Output (one row per targeted group): group, share_ppm, tot_weight,
    rate_ppm, n_kept, weight_kept. Plan shape at 100 TB: one group-by
    shuffle for totals, one broadcast of the per-group rate table back
    onto the corpus scan (the gate itself is scan-stage, shuffle-free),
    one group-by for the kept report.
    """
    g = F.col(group_col)
    share = rate_map({k: str(v) for k, v in shares_ppm.items()})[g].cast(
        "bigint"
    )
    totals = (
        df.groupBy(group_col)
        .agg(F.sum(F.col(weight_col).cast("bigint")).alias("tot_weight"))
        .withColumn("share_ppm", share)
        .filter(F.col("share_ppm").isNotNull())
    )
    t_star = totals.select(
        F.min(F.expr("(tot_weight * CAST(1000000 AS BIGINT)) div share_ppm"))
        .cast("bigint")
        .alias("t_star")
    )
    rates = (
        totals.crossJoin(F.broadcast(t_star))
        .withColumn(
            "rate_ppm",
            F.least(
                F.lit(1_000_000).cast("bigint"),
                F.expr("(t_star * share_ppm) div tot_weight"),
            ),
        )
        .select(group_col, "share_ppm", "tot_weight", "rate_ppm")
        # one row per targeted group, but derived from a full corpus
        # scan — materialize it so the gate pass and the final report
        # join don't each replay that scan (the g5/g6 lesson)
        .localCheckpoint()
    )
    gate = (
        F.expr(
            f"CAST(conv(substring(md5(CAST({key_col} AS STRING)), 1, 6), "
            "16, 10) AS BIGINT)"
        )
        * F.lit(1_000_000)
    )
    kept = (
        df.join(F.broadcast(rates.select(group_col, "rate_ppm")), group_col)
        .filter(gate < F.col("rate_ppm") * F.lit(16_777_216))
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_kept"),
            F.sum(F.col(weight_col).cast("bigint")).alias("weight_kept"),
        )
    )
    return rates.join(kept, group_col, "left").select(
        g.alias("grp"),
        "share_ppm",
        "tot_weight",
        "rate_ppm",
        F.coalesce(F.col("n_kept"), F.lit(0).cast("bigint")).alias("n_kept"),
        F.coalesce(F.col("weight_kept"), F.lit(0).cast("bigint")).alias(
            "weight_kept"
        ),
    )
