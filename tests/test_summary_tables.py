"""Whole-table summary twins (plans/summary_tables.py): unit-level checks
on the manifest-driven builder, beyond the registry's oracle hash gate.

Reference semantics pinned here:
- create_summary_admissions_sql.py:95-102 — admissions date CASE ends
  ELSE NULL (unrecognized formats DROP);
- create_summary_discharges_sql.py:55-62 — discharges date CASE falls
  back to a cast (ISO strings survive, garbage nulls via try_cast);
- build_column_select / get_column_or_null — aliases over columns the
  source table lacks are NULL-injected;
- :234-241 / :276-278 — the exam-pair and AgeCat fallback CASEs.
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from neotree_data_pipeline_kedro_spark.plans.summary_tables import (
    ADMISSIONS_COLUMNS,
    ADMISSIONS_MISSING,
    DISCHARGES_COLUMNS,
    DISCHARGES_MISSING,
    build_summary,
    build_summary_oracle,
)


def _adm(spark, n=200):
    base = spark.range(1, n + 1).select(F.col("id").alias("o_orderkey"))
    return build_summary(base, ADMISSIONS_COLUMNS, ADMISSIONS_MISSING, "ADM")


def _dis(spark, n=200):
    base = spark.range(1, n + 1).select(F.col("id").alias("o_orderkey"))
    return build_summary(base, DISCHARGES_COLUMNS, DISCHARGES_MISSING, "DIS")


def test_admissions_full_column_contract(spark):
    df = _adm(spark)
    # the reference SELECT produces exactly these aliases, in this order
    assert df.columns == [e[0] for e in ADMISSIONS_COLUMNS]
    assert len(df.columns) == 154
    # schema-evolution NULL injection: missing sources → all-NULL aliases
    agg = df.agg(
        F.count("`Low Birth Weight?`").alias("lbw"),
        F.count("`Chest Ausc`").alias("ca"),
        F.count("`Respiratory Support`").alias("rs"),
    ).collect()[0]
    assert (agg.lbw, agg.ca, agg.rs) == (0, 0, 0)
    # ...while their present near-namesakes are populated
    assert df.filter(F.col("`Chest Auscultation`").isNotNull()).count() > 0
    assert df.filter(F.col("RespSR").isNotNull()).count() > 0


def test_admissions_date_case_drops_unrecognized(spark):
    # ELSE NULL: the ISO class (cls=2) and garbage class (cls=3) must both
    # come out NULL in admissions, only the two "Mon," formats parse
    rows = _adm(spark, 500).select("`DateTime Admission`").collect()
    parsed = [r[0] for r in rows if r[0] is not None]
    assert parsed  # the two textual formats did parse
    # ~2/5 of rows parse (cls 0,1), ~3/5 are NULL (ISO-dropped+n/a+NULL)
    assert 0.3 < len(parsed) / 500 < 0.5
    assert all(isinstance(p, datetime.datetime) for p in parsed)


def test_discharges_date_case_casts_iso(spark):
    # the discharge CASE's ELSE try_cast keeps ISO timestamps (cls=2)
    # that admissions would have dropped → strictly more non-NULLs
    n = 500
    adm = _adm(spark, n).filter(F.col("`DateTime Admission`").isNotNull())
    dis = _dis(spark, n).filter(F.col("Started_at").isNotNull())
    assert dis.count() > adm.count()
    # the 08:30 time-of-day survives only through the cast branch
    assert (
        _dis(spark, n)
        .filter(F.hour("Started_at") == 8)
        .count()
        > 0
    )


def test_exam_fallback_pairs(spark):
    # CASE WHEN SuckTh.label IS NULL THEN SuckReflex.label ELSE SuckTh
    df = _adm(spark, 500)
    suck = df.select("`Suck Reflex`").collect()
    vals = {r[0] for r in suck if r[0] is not None}
    assert any(v.startswith("SuckTh.label#") for v in vals)
    assert any(v.startswith("SuckReflex.label#") for v in vals)
    # AgeCategory is a MISSING column: the fallback collapses to
    # AgeCat.label alone (NULL secondary), never an 'AgeCategory#' token
    age = {r[0] for r in df.select("`Age Category`").collect() if r[0]}
    assert age and all(v.startswith("AgeCat.label#") for v in age)


def test_numguard_casts_only_numerics(spark):
    df = _adm(spark, 500).select(
        F.col("`Mother Oxygen saturations`").alias("v")
    )
    vals = [r.v for r in df.collect() if r.v is not None]
    # classes: '97.5', '88', '9e1'→90.0 pass the regex; 'abc'/NULL drop
    assert set(vals) == {97.5, 88.0, 90.0}
    assert dict(df.dtypes)["v"] == "double"


def test_oracle_sql_generated_from_same_manifest():
    sql = build_summary_oracle(ADMISSIONS_COLUMNS, ADMISSIONS_MISSING, "ADM")
    # every alias appears exactly once as a quoted output name
    for alias, _kind, *_ in ADMISSIONS_COLUMNS:
        assert f'AS "{alias}"' in sql
    # missing sources are never synthesized in the source CTE ("RespSR"
    # et al. may still appear as OUTPUT aliases of present columns)
    synth_cte = sql.split("FROM orders")[0]
    for src in ADMISSIONS_MISSING:
        assert f'AS "{src}"' not in synth_cte
    dsql = build_summary_oracle(DISCHARGES_COLUMNS, DISCHARGES_MISSING, "DIS")
    assert dsql.count("try_strptime") == 2 * 8  # 8 date columns x 2 formats
    assert dsql.count("TRY_CAST") == 8  # the cast fallback per date column


def test_summary_plans_are_shuffle_free(spark):
    import contextlib
    import io

    for df in (_adm(spark), _dis(spark)):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        assert "Exchange" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEval" not in plan
