"""Golden tests for the validation-report text render
(operators/validation_report.py — validate.py:316-888 layout)."""

from __future__ import annotations

from neotree_data_pipeline_kedro_spark.operators.validation_report import (
    render_validation_report,
)

FIELDS = [
    {"key": "Temperature", "label": "Temp", "dataType": "number",
     "optional": False, "minValue": "30", "maxValue": "43"},
    {"key": "Gestation", "label": "Gestation", "dataType": "number",
     "optional": True},
    {"key": "Outcome", "label": "Outcome", "fieldType": "dropdown",
     "optional": True,
     "options": [{"value": "DC", "valueLabel": "Discharged"},
                 {"value": "NND", "valueLabel": "Died"}]},
    {"key": "DOB", "label": "DOB", "dataType": "datetime",
     "optional": True, "confidential": True},
]


def _dirty(spark):
    rows = [
        # uid, Temp.value, Gest.value, Outcome.value, Outcome.label, DOB.value
        ("U1", "36.5", "34", "DC", "Discharged", "2024-01-01"),
        ("U1", "37.0", "35", "DC", "Discharged", "2024-01-02"),  # dup uid
        ("U2", "abc", "33", "NND", "Discharged", None),  # bad type + label
        ("U3", "99", None, "DC", "Discharged", None),    # out of range
        ("U4", None, None, "DC", "Discharged", None),    # required NULL
    ]
    return spark.createDataFrame(
        rows,
        "uid string, `Temperature.value` string, `Gestation.value` string, "
        "`Outcome.value` string, `Outcome.label` string, `DOB.value` string",
    )


def _clean(spark):
    rows = [("U1", "36.5", "34"), ("U2", "37.1", "35")]
    return spark.createDataFrame(
        rows, "uid string, `Temperature.value` string, `Gestation.value` string"
    )


def test_report_flags_every_section(spark):
    rep = render_validation_report(_dirty(spark), FIELDS, "admissions")
    assert "VALIDATING: ADMISSIONS | Rows: 5 | Cols: 6" in rep
    # TECH-1: both U1 rows are duplicates
    assert "❌ 2 duplicate UID entries (1 unique UIDs) | Samples: ['U1']" in rep
    # TECH-2: 'abc' fails the numeric regex; U2's label contradicts NND
    assert "❌ 'Temperature': 1 invalid-numeric values" in rep
    assert "❌ 'Outcome': 1 label mismatches" in rep
    # TECH-3: DOB.value is 3/5 null -> >50% NULL warning block
    assert "⚠" in rep and "DOB.value: 60.0%" in rep
    # IMPLEMENTATION-2: Temperature required, U4 null (abc is non-null)
    assert "❌ 'Temperature': 1/5 (20.0%) NULL | UIDs: ['U4']" in rep
    # IMPLEMENTATION-3: 99 outside [30, 43]; total counts the 3 castable
    assert "❌ 'Temperature': 1/3 (33.3%) out of [30, 43]" in rep
    # COMPLIANCE-1: DOB flagged confidential via schema
    assert "schema-based confidential field(s):" in rep
    assert "DOB: DOB.value" in rep
    # SUMMARY: failure block with enumerated errors
    assert "❌ VALIDATION FAILED - " in rep
    assert "  1. Duplicate UIDs found: 2 rows" in rep
    assert "⚠ " in rep  # warnings block rendered


def test_report_passes_clean_frame(spark):
    fields = [f for f in FIELDS if f["key"] in ("Temperature", "Gestation")]
    rep = render_validation_report(_clean(spark), fields, "admissions")
    assert "✓ All UIDs unique and non-null" in rep
    assert "✓ All data types valid" in rep
    assert "✓ All 1 required fields populated" in rep
    assert "✓ All 1 range-validated fields valid" in rep
    assert "✓ No sensitive/confidential data detected" in rep
    assert "✓ VALIDATION PASSED" in rep
    assert "❌" not in rep
    assert "Results: 0 errors, 0 warnings" in rep


def test_report_multiple_uid_mode(spark):
    rep = render_validation_report(
        _dirty(spark), FIELDS, "daily_review", allow_multiple_uids=True
    )
    assert (
        "✓ UIDs validated (multiple entries allowed) | 4 unique UIDs | "
        "5 total rows | Avg: 1.25 records/UID" in rep
    )
    assert "duplicate UID entries" not in rep
