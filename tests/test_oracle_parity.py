"""Local mirror of the driver's correctness gate: every registry query runs
on Spark at sf0.001 and must match its DuckDB oracle exactly (sorted rows,
sorted columns, exact values — floats included, by deterministic design).
"""

from __future__ import annotations

import datetime
import math

import pandas as pd
import pytest

from neotree_data_pipeline_kedro_spark.plans.queries import ORACLE_SQL, QUERIES

from conftest import SF_SMOKE


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            def _coerce(v):
                if hasattr(v, "as_tuple"):  # Decimal
                    return float(v)
                if isinstance(v, datetime.date) and not isinstance(v, datetime.datetime):
                    # Spark DATE columns arrive as datetime.date while DuckDB's
                    # fetchdf yields midnight datetime64 — same calendar value.
                    return pd.Timestamp(v)
                return v

            df[c] = df[c].map(_coerce)
    def cell_key(v) -> str:
        if pd.isna(v):
            return "\x01NULL"
        if isinstance(v, float):
            return repr(v)
        return str(v)

    key = df.apply(lambda r: "\x00".join(cell_key(v) for v in r.values), axis=1)
    if len(df) == 0:
        return df
    return df.iloc[key.argsort(kind="mergesort")].reset_index(drop=True)


def _cells_equal(a, b) -> bool:
    if pd.isna(a) and pd.isna(b):
        return True
    if isinstance(a, float) and isinstance(b, float):
        return a == b or (math.isnan(a) and math.isnan(b))
    return a == b


@pytest.mark.parametrize("name", sorted(ORACLE_SQL))
def test_oracle_parity(spark, duck, name):
    sdf = QUERIES[name](spark, SF_SMOKE).toPandas()
    odf = duck.execute(ORACLE_SQL[name]).fetchdf()
    assert sorted(map(str.lower, sdf.columns)) == sorted(
        map(str.lower, odf.columns)
    ), f"{name}: column names differ: {sorted(sdf.columns)} vs {sorted(odf.columns)}"
    odf.columns = [
        next(sc for sc in sdf.columns if sc.lower() == oc.lower()) for oc in odf.columns
    ]
    s, o = _normalize(sdf), _normalize(odf)
    assert len(s) == len(o), f"{name}: row count {len(s)} vs oracle {len(o)}"
    for c in s.columns:
        sv, ov = s[c].tolist(), o[c].tolist()
        bad = [
            (i, a, b) for i, (a, b) in enumerate(zip(sv, ov)) if not _cells_equal(a, b)
        ]
        assert not bad, f"{name}.{c}: {len(bad)} mismatches, first 5: {bad[:5]}"


@pytest.mark.parametrize(
    "name", sorted(set(QUERIES) - set(ORACLE_SQL))
)
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, SF_SMOKE)
    n = df.count()
    assert n >= 0
    df.limit(5).collect()
