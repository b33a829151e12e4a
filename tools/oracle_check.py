"""Driver-faithful oracle check: vanilla SparkSession vs DuckDB.

Usage: python tools/oracle_check.py SF_DIR [query ...]
With no queries named, sweeps the whole registry. Prints one line per
query (OK/FAIL) and a summary. Mirrors the driver's contract: vanilla
session (ANSI on, no package configs), canon = sort columns by name,
sort rows (na_position last), round(6) numerics, md5 of to_csv.
"""
from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def canon_hash(pdf):
    import pandas as pd  # noqa: F401

    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        if pdf[c].dtype.kind in "fc":
            pdf[c] = pdf[c].round(6)
    if len(pdf.columns):
        pdf = pdf.sort_values(
            by=list(pdf.columns), na_position="last", kind="mergesort"
        ).reset_index(drop=True)
    return hashlib.md5(pdf.to_csv(index=False).encode()).hexdigest()


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]

    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as e

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        # full-registry sweeps at sf0.1 OOM the vanilla 1g driver heap
        # around query ~265 (toPandas collects accumulate; the r8 note
        # in the verify skill) — memory only, no query-semantics configs
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = e.queries()
    oracles = e.oracle_sql()
    if not names:
        names = list(qs)

    from neotree_data_pipeline_kedro_spark.sources.tables import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    n_ok = n_fail = n_noracle = 0
    for name in names:
        try:
            got = qs[name](spark, sf_dir).toPandas()
            if name not in oracles:
                n_noracle += 1
                print(f"NO-ORACLE {name} rows={len(got)}")
                continue
            want = con.execute(oracles[name]).fetchdf()
            ok = (
                len(got) == len(want)
                and sorted(got.columns) == sorted(want.columns)
                and canon_hash(got) == canon_hash(want)
            )
            if ok:
                n_ok += 1
                print(f"OK   {name} rows={len(got)}")
            else:
                n_fail += 1
                print(
                    f"FAIL {name} spark_rows={len(got)} oracle_rows="
                    f"{len(want)} hash {canon_hash(got)[:8]} vs "
                    f"{canon_hash(want)[:8]}"
                )
        except Exception as exc:  # noqa: BLE001
            n_fail += 1
            print(f"ERR  {name}: {type(exc).__name__}: {exc}")
    print(f"SUMMARY ok={n_ok} fail={n_fail} no_oracle={n_noracle}")


if __name__ == "__main__":
    main()
