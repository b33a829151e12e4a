"""Country-parameterized bucketing CASE ladders (SURVEY.md §2.8 "Bucketing").

The reference implements these as *cascading* pandas ``.loc`` assignments
where later conditions OVERWRITE earlier ones
(data_tyding/create_derived_columns.py:7-229 — "order of statements
matters"). A Spark ``when`` chain evaluates FIRST match, so every ladder here
is encoded in reverse-specificity order; each function's docstring pins the
effective interval semantics, including the reference's quirks (the
"Unknowwn" typo, NULL fall-throughs, gap intervals mapping to NULL).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _num(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    # pd.to_numeric(errors='coerce') equivalence: try_cast → NULL on junk,
    # regardless of the session's ANSI setting
    return c.try_cast("double")


def gest_group(col: Column | str, country: str = "zimbabwe") -> Column:
    """GestGroup ladder (create_derived_columns.py:34-57).

    zimbabwe: <28 | 28-32 | 33-36 | 37-41 | 42+ | null→"Unknowwn" (sic —
    the reference's typo is part of its observable output).
    other (malawi): <28 | 28-32 | 32-34 | 34-36+6 | Term | null→NULL.
    """
    g = _num(col)
    if country.lower() == "zimbabwe":
        return (
            F.when(g.isNull(), "Unknowwn")
            .when(g < 28, "<28")
            .when(g < 33, "28-32 wks")
            .when(g < 37, "33-36 wks")
            .when(g < 42, "37-41 wks")
            .otherwise("42 wks or above")
        )
    return (
        F.when(g.isNull(), F.lit(None).cast("string"))
        .when(g < 28, "<28")
        .when(g < 32, "28-32 wks")
        .when(g < 34, "32-34 wks")
        .when(g < 37, "34-36+6 wks")
        .otherwise("Term")
    )


def bw_group(col: Column | str) -> Column:
    """BWGroup: ELBW<1000 | VLBW<1500 | LBW<2500 | NBW<4000 | HBW≥4000 |
    null→Unknown (create_derived_columns.py:61-86)."""
    w = _num(col)
    return (
        F.when(w.isNull(), "Unknown")
        .when(w < 1000, "ELBW")
        .when(w < 1500, "VLBW")
        .when(w < 2500, "LBW")
        .when(w < 4000, "NBW")
        .otherwise("HBW")
    )


def aw_group(col: Column | str) -> Column:
    """AWGroup gram ranges (create_derived_columns.py:89-118)."""
    w = _num(col)
    return (
        F.when(w.isNull(), "Unknown")
        .when(w < 1000, "<1000g")
        .when(w < 1500, "1000-1500g")
        .when(w < 2500, "1500-2500g")
        .when(w < 4000, "2500-4000g")
        .otherwise(">4000g")
    )


def temp_group(col: Column | str) -> Column:
    """TempGroup 1°C bins 30.5-41.5 (create_derived_columns.py:121-149).

    No isnull branch in the reference → NULL input stays NULL.
    """
    t = _num(col)
    ladder = F.when(t < 30.5, "<30.5")
    lo = 30.5
    while lo < 41.5:
        hi = round(lo + 1.0, 1)
        ladder = ladder.when(t < hi, f"{lo}-{hi}")
        lo = hi
    return ladder.when(t >= 41.5, ">41.5").otherwise(F.lit(None).cast("string"))


def temp_thermia(col: Column | str, country: str = "zimbabwe") -> Column:
    """TempThermia (create_derived_columns.py:152-182).

    zimbabwe 5-level with NULL→Unknown and *gap* intervals (32,32.1) and
    (35.9,36.0), (36.4,36.5) falling through to NULL — faithful to the
    reference's interval arithmetic. other: 3-level, NULL stays NULL.
    """
    t = _num(col)
    if country.lower() == "zimbabwe":
        return (
            F.when(t.isNull(), "Unknown")
            .when(t <= 32.0, "Severe Hypothermia")
            .when((t >= 32.1) & (t <= 35.9), "Moderate Hypothermia")
            .when((t >= 36.0) & (t <= 36.4), "Mild Hypothermia")
            .when((t >= 36.5) & (t <= 37.5), "Normothermia")
            .when(t > 37.5, "Fever")
            .otherwise(F.lit(None).cast("string"))
        )
    return (
        F.when(t.isNull(), F.lit(None).cast("string"))
        .when(t < 36.5, "Hypothermia")
        .when(t < 37.5, "Normothermia")
        .otherwise("Hyperthermia")
    )


def lbw_binary(bw: Column | str) -> Column:
    """LBWBinary = (bw>0 AND bw<2500); NULL bw → False, matching pandas'
    NaN-comparison-is-False (create_derived_columns.py:184-189)."""
    w = _num(bw)
    return F.coalesce((w > 0) & (w < 2500), F.lit(False))


def under_28wks_1kg(bw: Column | str, gestation: Column | str | None = None) -> Column:
    """"<28wks/1kg" flag (create_derived_columns.py:191-197).

    The reference's gestation clause is dead code (``isinstance(Series, …)``
    is always False), so its observable semantics are (bw>0 AND bw<1000).
    Pass ``gestation`` to opt into the *intended* OR-gestation<28 semantics.
    """
    w = _num(bw)
    base = (w > 0) & (w < 1000)
    if gestation is not None:
        base = (w > 0) & ((w < 1000) | (_num(gestation) < 28))
    return F.coalesce(base, F.lit(False))


def age_category(age_hours: Column | str) -> Column:
    """AgeCategory 5 levels from age-in-hours
    (tidy_admissions_discharges_and_create_mcl_tables.py:144-156); only
    assigned when age>0 and non-null (:204-206), else NULL."""
    a = _num(age_hours)
    return (
        F.when(a.isNull() | (a <= 0), F.lit(None).cast("string"))
        .when(a < 2, "Fresh Newborn (< 2 hours old)")
        .when(a <= 23, "Newborn (2 - 23 hrs old)")
        .when(a <= 47, "Newborn (1 day - 1 day 23 hrs old)")
        .when(a <= 71, "Infant (2 days - 2 days 23 hrs old)")
        .otherwise("Infant (> 3 days old)")
    )


def summary_gest_group(col: Column | str, country: str = "malawi") -> Column:
    """Summary-table GestationGroup ladder
    (create_summary_maternal_outcomes_sql.py:22-42).

    malawi (default): NULL→'Unkown' (sic) | <28wks | 28-32wks | '34-34wks'
    (sic — the reference labels the 32-34 interval this way) | 34-36wks |
    Term (37-41) | Post Term (42+).
    zimbabwe: NULL→'Unkown' | week-range labels; gestation > 44 falls
    through to NULL (the reference CASE has no ELSE).
    """
    g = _num(col)
    if country.lower() == "zimbabwe":
        return (
            F.when(g.isNull(), "Unkown")
            .when(g < 28, "<28 weeks")
            .when(g < 32, "28-31 weeks")
            .when(g < 34, "32-33 weeks")
            .when(g < 37, "34-36 weeks")
            .when(g < 40, "37-39 weeks")
            .when(g <= 44, "40-44 weeks")
        )
    return (
        F.when(g.isNull(), "Unkown")
        .when(g < 28, "<28wks")
        .when(g < 32, "28-32wks")
        .when(g < 34, "34-34wks")
        .when(g < 37, "34-36wks")
        .when(g < 42, "Term")
        .otherwise("Post Term")
    )


def summary_gest_group_sort(col: Column | str) -> Column:
    """GestationGroupSort 1-7 ladder, NULL→7
    (create_summary_maternal_outcomes_sql.py:88-96)."""
    g = _num(col)
    return (
        F.when(g.isNull(), 7)
        .when(g < 28, 1)
        .when(g < 32, 2)
        .when(g < 34, 3)
        .when(g < 37, 4)
        .when(g < 42, 5)
        .otherwise(6)
    )


def summary_bw_group(col: Column | str) -> Column:
    """Summary-table BirthWeightGroup gram ranges with the 3500 split
    (create_summary_maternal_outcomes_sql.py:78-86); NULL→'Unknown'."""
    w = _num(col)
    return (
        F.when(w.isNull(), "Unknown")
        .when(w < 1000, "<1000g")
        .when(w < 1500, "1000-1500g")
        .when(w < 2500, "1500-2500g")
        .when(w < 3500, "2500-3500g")
        .when(w < 4000, "3500-4000g")
        .otherwise(">4000g")
    )


def summary_bw_group_sort(col: Column | str) -> Column:
    """BirthWeightGroupSort 1-7 ladder, NULL→7
    (create_summary_maternal_outcomes_sql.py:97-105)."""
    w = _num(col)
    return (
        F.when(w.isNull(), 7)
        .when(w < 1000, 1)
        .when(w < 1500, 2)
        .when(w < 2500, 3)
        .when(w < 3500, 4)
        .when(w < 4000, 5)
        .otherwise(6)
    )
