"""Deduplication operator family (SURVEY.md §2.3, D1-D9).

The reference implements five near-identical GROUP-BY-MAX(id)+join-back SQL
dedups plus pandas drop_duplicates variants; all collapse into ONE
parametrized window-dedup here. A window (`row_number() == 1`) beats the
reference's aggregate-then-self-join shape in Spark: one shuffle on the key
instead of two, and AQE handles skewed keys.

Scale note: partitionBy(keys) shuffles once on the dedup key — the natural
partitioning for everything downstream that groups on the same key. No
collect, no batching loops (the reference's 10k-row DELETE batches,
data_fix.py:45-72, exist only because Postgres locks; a full columnar
rewrite is the Spark idiom).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_RN = "__rn"


def dedupe_keep_latest(
    df: DataFrame,
    keys: Sequence[str | Column],
    order: Sequence[Column],
) -> DataFrame:
    """Generic last-writer-wins dedup (D1/D2/D3/D5/D7).

    Reference shape: ``GROUP BY <keys> -> MAX(id)`` joined back to the base
    table (queries/assorted_queries.py:235-289 and clones). ``order`` must be
    a *total* order (e.g. ``[F.desc("id")]``) so the result is deterministic —
    the reference's pandas ``drop_duplicates(keep='first')`` depends on frame
    order; we require an explicit ordering instead (SURVEY §7 "keep first").
    """
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn(_RN, F.row_number().over(w))
        .filter(F.col(_RN) == 1)
        .drop(_RN)
    )


def dedupe_prefix_key(
    df: DataFrame,
    uid_col: str,
    key_col: str,
    order: Sequence[Column],
    prefix_len: int = 10,
) -> DataFrame:
    """Prefix-key dedup (D6/D7): dedupe on (uid, LEFT(key, 10)).

    Reference: queries/data_fix.py:49-62 (``ROW_NUMBER() OVER (PARTITION BY
    LEFT(unique_key,10), uid ...)``) and the pandas ``DEDUPLICATER``
    (create_joined_table_and_derived_columns.py:432-445 — prefix is NULL when
    ``len(key) < 10``, and pandas drop_duplicates keeps NULL-key rows
    distinct only as a group; we keep the SQL variant's semantics: NULL
    prefixes form one group per uid).
    """
    prefix = F.when(
        F.length(F.col(key_col)) >= prefix_len,
        F.substring(F.col(key_col), 1, prefix_len),
    )
    return dedupe_keep_latest(
        df.withColumn("__prefix", prefix),
        ["__prefix", uid_col],
        order,
    ).drop("__prefix")


def review_numbering(
    df: DataFrame,
    uid_col: str,
    date_col: str,
    tiebreak_col: str,
    existing_max: DataFrame | None = None,
) -> DataFrame:
    """Review-numbered dedup (D4, daily_review/infections;
    queries/assorted_queries.py:98-233).

    First pass: keep the latest row per (uid, date) then number reviews
    ``ROW_NUMBER() OVER (PARTITION BY uid ORDER BY date, tiebreak)``.
    Incremental: pass ``existing_max`` = DataFrame(uid, max_review_number) to
    continue numbering from the stored maximum (the reference's
    ``MAX(review_number)`` subquery + offset).
    """
    day = F.to_date(F.col(date_col))
    latest = dedupe_keep_latest(
        df.withColumn("__day", day),
        [uid_col, "__day"],
        [F.desc(tiebreak_col)],
    )
    w = Window.partitionBy(uid_col).orderBy(F.col(date_col), F.col(tiebreak_col))
    numbered = latest.withColumn("review_number", F.row_number().over(w)).drop("__day")
    if existing_max is not None:
        offsets = existing_max.select(
            F.col(uid_col), F.col("max_review_number").alias("__off")
        )
        numbered = (
            numbered.join(F.broadcast(offsets), uid_col, "left")
            .withColumn(
                "review_number",
                F.col("review_number") + F.coalesce(F.col("__off"), F.lit(0)),
            )
            .drop("__off")
        )
    return numbered


def incremental_append(
    incoming: DataFrame,
    existing: DataFrame,
    keys: Sequence[str],
) -> DataFrame:
    """Append-only NOT-EXISTS ingestion (§2.9/J4): rows of ``incoming`` whose
    key is absent from ``existing``. Reference pattern at
    assorted_queries.py:241-252,849-855 and merge_all.py:598-629.

    left_anti join — Catalyst/AQE broadcasts the key set when small; at
    100 TB the sink side should be pre-partitioned (bucketed) on ``keys`` so
    the anti-join co-locates without a full shuffle of the sink.
    """
    return incoming.join(
        existing.select(*keys).dropDuplicates(list(keys)),
        on=list(keys),
        how="left_anti",
    )


def survivorship(
    df: DataFrame,
    cluster_col: str,
    ts_col: str,
    rules: Sequence[tuple[str, str]],
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Golden-record survivorship: collapse each duplicate cluster (the
    output of connected-components / semantic dedup / D1's key groups)
    into ONE record by per-column merge rules — the master-data step
    after matching decides WHO is the same entity, this decides WHAT the
    merged entity says.

    Rules (per ``(column, rule)``):
    - ``latest``: value from the newest row whose value is non-null
      (D1's keep-latest generalized to per-COLUMN recency — a cluster's
      golden record can mix columns from different source rows);
    - ``longest``: the longest non-null string (most-complete-value
      heuristic), ties to the lexicographically largest (max-struct
      ordering);
    - ``max`` / ``min``: numeric extremes.

    One aggregation per cluster: ``latest`` rides max_by over a struct
    rank (newest non-null wins), so the whole merge is a single
    partial-agg-friendly shuffle on the cluster key — no window, no
    self-join, no per-cluster pandas.
    """
    order_rank = F.struct(
        F.col(ts_col), *[F.col(c) for c in tiebreak]
    )
    aggs = [F.count(F.lit(1)).alias("n_members")]
    for col, rule in rules:
        c = F.col(col)
        if rule == "latest":
            aggs.append(
                F.max(
                    F.when(c.isNotNull(), F.struct(order_rank.alias("o"), c.alias("v")))
                ).getField("v").alias(col)
            )
        elif rule == "longest":
            aggs.append(
                F.max(
                    F.when(
                        c.isNotNull(),
                        # longer wins; equal lengths fall to the max string
                        F.struct(F.length(c).alias("l"), c.alias("v")),
                    )
                ).getField("v").alias(col)
            )
        elif rule in ("max", "min"):
            aggs.append(getattr(F, rule)(c).alias(col))
        else:
            raise ValueError(f"survivorship: unknown rule {rule!r} for {col!r}")
    return df.groupBy(cluster_col).agg(*aggs)
