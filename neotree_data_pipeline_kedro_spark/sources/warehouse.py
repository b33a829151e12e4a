"""Bucketed warehouse writes: co-located joins without runtime shuffles.

The reference leans on Postgres B-tree indexes for its hot join keys
(create_joined_table_and_derived_columns.py:130-155;
merge_all.py:537-588). The Spark-native counterpart is bucketing: write
both sides of a recurring join bucketed (and optionally sorted) by the
join key, and every subsequent join on that key reads bucket-aligned
files — no Exchange on either side, the single biggest shuffle saving for
the admission↔discharge / uid-keyed join family at 100 TB. The contract
is pinned in tests/test_warehouse_bucketing.py: a MERGE-hinted join of
two co-bucketed tables plans with zero exchanges.

Use for the stable silver/gold tables the engine re-joins every cron
cycle (deduplicated sessions, admissions/discharges, the ALL table);
one-shot intermediates should stay plain parquet (bucketing costs a
shuffle at write time).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: Sequence[str],
    buckets: int = 64,
    sort_by: Sequence[str] | None = None,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Save ``df`` as a managed table bucketed by ``keys`` into
    ``buckets`` files per partition (sorted within buckets when
    ``sort_by`` is given, which also removes the Sort under sort-merge
    joins). Bucket count is a durable layout choice: both sides of a
    co-located join must use the same keys and count."""
    w = df.write.format(fmt).mode(mode).bucketBy(int(buckets), *keys)
    if sort_by:
        w = w.sortBy(*sort_by)
    w.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Read a managed table back (bucketing metadata applies
    automatically; no option needed)."""
    return spark.table(table)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str],
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Hive-style partitioned write (one directory per partition value).

    The complement of bucketing for the time axis: the engine's derived
    tables are re-read every cron cycle with a recency predicate
    (ingested_at month, unique_key date prefix — assorted_queries.py's
    NOT-EXISTS windows), and a partition column turns that predicate into
    directory pruning — the scan never opens non-matching files
    (PartitionFilters in explain; pinned in
    tests/test_warehouse_bucketing.py). Choose low-cardinality columns
    (month, facility): one directory per value, and files per partition
    should stay in the hundreds of MB at 100 TB."""
    df.write.format(fmt).mode(mode).partitionBy(*partition_cols).save(path)


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_mb: int = 128,
    sort_within_by: Sequence[str] | None = None,
) -> int:
    """Small-file compaction: rewrite a parquet location into
    ~``target_file_mb`` files — the maintenance job every long-lived
    landing zone needs (streaming/incremental appends accrete thousands of
    tiny files; each costs a task + a footer read + NameNode/S3 metadata,
    and row-group-level pruning stops working).

    File count = ceil(total_bytes / target), measured from the existing
    footprint, so the rewrite is one job with no driver-side data.
    ``sort_within_by`` sorts within output files (sortWithinPartitions —
    NO global shuffle) so min/max row-group statistics on those columns
    become selective and scans with matching filters skip whole files.
    Writes to a sibling temp dir then swaps via two renames — readers
    never see a half-written file set (they can race the brief window
    between renames and retry; on object stores, prefer a manifest/catalog
    pointer flip instead). Returns the new file count.
    """
    import os
    import shutil

    total = 0
    for root, _, names in os.walk(path):
        for n in names:
            if n.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, n))
    n_files = max(1, -(-total // (target_file_mb << 20)))
    df = spark.read.parquet(path).repartition(n_files)
    if sort_within_by:
        df = df.sortWithinPartitions(*sort_within_by)
    tmp = path.rstrip("/") + ".__compact_tmp"
    df.write.mode("overwrite").parquet(tmp)
    old = path.rstrip("/") + ".__compact_old"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return n_files
