"""Validation-report text render (SURVEY.md §2.11 final piece).

Composes the §2.11 metric DataFrames (operators/validation.py) into the
reference's structured log report — validate.py:316-888's section layout
line-for-line: [TECH-1] UID SCHEMA & STRUCTURE, [TECH-2] DATA TYPES,
[TECH-3] DATA QUALITY, [IMPLEMENTATION-2] REQUIRED FIELDS,
[IMPLEMENTATION-3] VALUE RANGES, the ===-framed SUMMARY with the
first-5-then-"... and N more" error/warning lists (validate.py:796-817),
and [COMPLIANCE-1] SENSITIVE/CONFIDENTIAL DATA CHECK (validate.py:819-888).
The email/PDF delivery (validate.py:899-961) stays a documented deliberate
drop — the report is returned as a string for whatever channel the caller
has.

Scale: every section is a single full-scan aggregate (the §2.11 operators
are already one-pass); the only row-level collects are explicit 3-sample
LIMITs (duplicate-uid samples, required-field sample UIDs), so the driver
never holds more than sections x samples rows. Divergence from the
reference, documented: sample rows are picked by ORDER BY (deterministic
under Spark's unordered frames) where pandas took frame-order head(), and
IQR outliers report counts, not row dumps.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.nulls import nullify
from .validation import (
    SENSITIVE_KEYWORDS,
    compile_condition,
    conditional_required_nulls,
    confidential_column_report,
    duplicate_keys,
    null_rates,
    type_conformance,
    value_label_consistency,
)

_BAR = "=" * 60
_TYPE_MAP = {"number": "numeric", "numeric": "numeric",
             "boolean": "boolean", "yesno": "boolean",
             "datetime": "datetime", "date": "datetime"}


def _fmt_list(xs: Sequence) -> str:
    return "[" + ", ".join(repr(x) for x in xs) + "]"


def render_validation_report(
    df: DataFrame,
    fields: Sequence[Mapping],
    script: str,
    *,
    allow_multiple_uids: bool = False,
    high_null_pct: float = 50.0,
    value_suffix: str = ".value",
    label_suffix: str = ".label",
) -> str:
    """Render the reference's validation log for one script's wide table.

    ``fields``: the script's field metadata (key, label, dataType,
    optional, condition, minValue/maxValue, confidential, options) — the
    same registry shape the other §2.11 operators take.
    """
    lines: list[str] = []
    errors: list[str] = []
    warnings: list[str] = []
    cols = df.columns
    n_rows = df.count()

    lines += [_BAR, f"VALIDATING: {script.upper()} | Rows: {n_rows} | "
              f"Cols: {len(cols)}", _BAR]

    # ---------------------------------------------- [TECH-1] (validate.py:316-350)
    lines.append("")
    lines.append("[TECH-1] UID SCHEMA & STRUCTURE")
    if "uid" not in cols:
        lines.append("❌ UID column missing from dataset")
        errors.append("UID column missing")
    elif allow_multiple_uids:
        agg = df.agg(
            F.countDistinct("uid").alias("u"), F.count(F.lit(1)).alias("n")
        ).collect()[0]
        avg = agg.n / agg.u if agg.u else 0.0
        lines.append(
            f"✓ UIDs validated (multiple entries allowed) | {agg.u} unique "
            f"UIDs | {agg.n} total rows | Avg: {avg:.2f} records/UID"
        )
    else:
        dups = duplicate_keys(df.filter(F.col("uid").isNotNull()), ["uid"])
        stats = dups.agg(
            F.coalesce(F.sum("n_rows"), F.lit(0)).alias("rows"),
            F.count(F.lit(1)).alias("uids"),
        ).collect()[0]
        if stats.rows:
            samples = [
                r.uid for r in dups.orderBy("uid").limit(3).collect()
            ]
            lines.append(
                f"❌ {stats.rows} duplicate UID entries ({stats.uids} unique "
                f"UIDs) | Samples: {_fmt_list(samples)}"
            )
            errors.append(f"Duplicate UIDs found: {stats.rows} rows")
        else:
            lines.append("✓ All UIDs unique and non-null")

    # ---------------------------------------------- [TECH-2] (validate.py:634-653)
    lines.append("")
    lines.append("[TECH-2] DATA TYPES")
    type_errors = 0
    typed = [
        (f["key"], _TYPE_MAP[str(f.get("dataType") or "").lower()])
        for f in fields
        if str(f.get("dataType") or "").lower() in _TYPE_MAP
        and f"{f['key']}{value_suffix}" in cols
    ]
    for key, expected in typed:
        row = type_conformance(
            df, f"`{key}{value_suffix}`", expected
        ).collect()[0]
        if row.nonconforming:
            type_errors += 1
            lines.append(
                f"❌ '{key}': {row.nonconforming} invalid-{expected} values"
            )
            errors.append(f"Field '{key}': {row.nonconforming} "
                          f"invalid-{expected} values")
    for r in value_label_consistency(
        df, fields, value_suffix, label_suffix
    ).collect():
        if r.mismatch_count:
            type_errors += 1
            lines.append(
                f"❌ '{r.base_key}': {r.mismatch_count} label mismatches"
            )
            errors.append(
                f"Field '{r.base_key}': {r.mismatch_count} label mismatches"
            )
    if type_errors == 0:
        lines.append("✓ All data types valid")
    else:
        lines.append(f"Summary: {type_errors} fields with errors")

    # ---------------------------------------------- [TECH-3] (validate.py:658-752)
    lines.append("")
    lines.append("[TECH-3] DATA QUALITY")
    nr = null_rates(df).collect()
    total_cells = n_rows * len(cols)
    null_cells = sum(r.null_count for r in nr)
    completeness = (
        (total_cells - null_cells) / total_cells * 100 if total_cells else 100.0
    )
    lines.append(
        f"   Completeness: {completeness:.2f}% "
        f"({total_cells - null_cells}/{total_cells} cells)"
    )
    high = sorted(
        (
            (r.column_name, r.null_rate * 100)
            for r in nr
            if r.null_rate * 100 > high_null_pct
        ),
        key=lambda t: (-t[1], t[0]),
    )
    if high:
        warnings.append(f"{len(high)} columns with >50% NULL values")
        lines.append(f"⚠ {len(high)} columns >{high_null_pct:.0f}% NULL:")
        for col, rate in high[:5]:
            lines.append(f"   {col}: {rate:.1f}%")
        if len(high) > 5:
            lines.append(f"   ... and {len(high) - 5} more")

    # ------------------------------------ [IMPLEMENTATION-2] (validate.py:759-775)
    lines.append("")
    lines.append("[IMPLEMENTATION-2] REQUIRED FIELDS")
    required = [f for f in fields if not f.get("optional", False)]
    req_rows = (
        conditional_required_nulls(df, required, value_suffix).collect()
        if required
        else []
    )
    offenders = [r for r in req_rows if r.null_count]
    boolean_keys = {
        f["key"]
        for f in fields
        if str(f.get("dataType") or "").lower() in ("boolean", "yesno")
    }
    by_key = {f["key"]: f for f in required}
    for r in offenders:
        vcol = f"{r.base_key}{value_suffix}"
        samples: list = []
        if "uid" in cols and vcol in cols:
            eligible = compile_condition(
                by_key[r.base_key].get("condition"),
                set(cols),
                boolean_keys,
                value_suffix,
            )
            samples = [
                s.uid
                for s in df.filter(
                    eligible
                    & nullify(F.col(f"`{vcol}`").cast("string")).isNull()
                    & F.col("uid").isNotNull()
                )
                .select("uid")
                .orderBy("uid")
                .limit(3)
                .collect()
            ]
        lines.append(
            f"❌ '{r.base_key}': {r.null_count}/{r.eligible_count} "
            f"({r.null_pct:.1f}%) NULL | UIDs: {_fmt_list(samples)}"
        )
        errors.append(
            f"Required field '{r.base_key}' has {r.null_count} NULL values"
        )
    if offenders:
        lines.append(
            f"Summary: {len(offenders)} fields checked, "
            f"{len(offenders)} with errors"
        )
    elif required:
        lines.append(f"✓ All {len(required)} required fields populated")

    # ------------------------------------ [IMPLEMENTATION-3] (validate.py:778-793)
    lines.append("")
    lines.append("[IMPLEMENTATION-3] VALUE RANGES")
    ranged = [
        f
        for f in fields
        if (
            str(f.get("minValue") if f.get("minValue") is not None else "").strip()
            or str(f.get("maxValue") if f.get("maxValue") is not None else "").strip()
        )
        and f"{f['key']}{value_suffix}" in cols
    ]
    range_offenders = 0
    if ranged:
        # one full-scan aggregate for every ranged field, never per-field
        aggs = []
        for i, fld in enumerate(ranged):
            c = F.col(f"`{fld['key']}{value_suffix}`").try_cast("double")
            lo, hi = fld.get("minValue"), fld.get("maxValue")
            viol = F.lit(False)
            if lo is not None and str(lo).strip():
                viol = viol | (c < float(lo))
            if hi is not None and str(hi).strip():
                viol = viol | (c > float(hi))
            aggs.append(F.sum(viol.cast("long")).alias(f"__v_{i}"))
            aggs.append(F.sum(c.isNotNull().cast("long")).alias(f"__t_{i}"))
        row = df.agg(*aggs).collect()[0]
        for i, fld in enumerate(ranged):
            v, t = row[f"__v_{i}"] or 0, row[f"__t_{i}"] or 0
            if v:
                range_offenders += 1
                pct = v / t * 100 if t else 0.0
                lines.append(
                    f"❌ '{fld['key']}': {v}/{t} ({pct:.1f}%) out of "
                    f"[{fld.get('minValue')}, {fld.get('maxValue')}]"
                )
                errors.append(
                    f"Field '{fld['key']}': {v} out-of-range values"
                )
        if range_offenders:
            lines.append(
                f"Summary: {range_offenders} fields checked, "
                f"{range_offenders} with violations"
            )
        else:
            lines.append(f"✓ All {len(ranged)} range-validated fields valid")

    # ------------------------------------------ [COMPLIANCE-1] (validate.py:819-888)
    lines.append("")
    lines.append("[COMPLIANCE-1] SENSITIVE/CONFIDENTIAL DATA CHECK")
    conf = confidential_column_report(df, fields).collect()
    known = sorted(r.key for r in conf if r.kind == "known_sensitive")
    schema_hits = [r for r in conf if r.kind == "schema_confidential"]
    if known:
        lines.append(
            f"❌ {len(known)} known sensitive column(s): {', '.join(known)}"
        )
        warnings.append(
            f"Found {len(known)} sensitive/unwanted columns: "
            f"{', '.join(known)}"
        )
    if schema_hits:
        lines.append(
            f"❌ {len(schema_hits)} schema-based confidential field(s):"
        )
        for r in sorted(schema_hits, key=lambda r: r.key)[:3]:
            lines.append(f"   {r.key}: {r.matched_columns}")
        if len(schema_hits) > 3:
            lines.append(f"   ... and {len(schema_hits) - 3} more")
        errors.append(
            f"Found {len(schema_hits)} confidential fields in dataset"
        )
    if not known and not schema_hits:
        lines.append("✓ No sensitive/confidential data detected")

    # ------------------------------------------------ SUMMARY (validate.py:796-817)
    lines += ["", _BAR,
              f"SUMMARY: {script} | Rows: {n_rows} | Cols: {len(cols)}",
              f"Results: {len(errors)} errors, {len(warnings)} warnings",
              _BAR]
    if errors:
        lines.append(f"❌ VALIDATION FAILED - {len(errors)} ERRORS")
        for i, e in enumerate(errors[:5], 1):
            lines.append(f"  {i}. {e}")
        if len(errors) > 5:
            lines.append(f"  ... and {len(errors) - 5} more")
    else:
        lines.append("✓ VALIDATION PASSED")
    if warnings:
        lines.append(f"⚠ {len(warnings)} WARNINGS:")
        for i, w in enumerate(warnings[:5], 1):
            lines.append(f"  {i}. {w}")
        if len(warnings) > 5:
            lines.append(f"  ... and {len(warnings) - 5} more")
    lines.append(_BAR)
    return "\n".join(lines)


# silence the unused-import guard for the keyword list re-export callers use
__all__ = ["render_validation_report", "SENSITIVE_KEYWORDS"]
