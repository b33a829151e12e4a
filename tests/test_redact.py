"""P6 redact: keyword column drop, metadata drop, map-key deletion — incl.
the empty-keyword and empty-metadata edge paths (sql_functions.py:1592-1610,
:1140-1145; assorted_queries.py:870-908)."""

from __future__ import annotations

from neotree_data_pipeline_kedro_spark.operators.redact import (
    confidential_columns,
    redact,
)


def _df(spark):
    return spark.createDataFrame(
        [("1", "555", "home", {"KinCell": "555", "Gender": "F", "Phone2": "x"})],
        ["id", "phone_number", "address_line", "entries"],
    )


def test_redact_drops_and_filters_map(spark):
    out = redact(_df(spark), metadata_confidential=("KinCell",), map_cols=("entries",))
    assert out.columns == ["id", "entries"]  # keyword cols dropped
    row = out.collect()[0]
    # KinCell (metadata) and Phone2 (keyword rlike) deleted, Gender kept
    assert row.entries == {"Gender": "F"}


def test_redact_empty_keywords(spark):
    out = redact(
        _df(spark), metadata_confidential=("KinCell",), keywords=(), map_cols=("entries",)
    )
    assert out.columns == ["id", "phone_number", "address_line", "entries"]
    assert out.collect()[0].entries == {"Gender": "F", "Phone2": "x"}


def test_redact_no_lists_is_noop(spark):
    out = redact(_df(spark), metadata_confidential=(), keywords=(), map_cols=("entries",))
    assert out.collect()[0].entries == {"KinCell": "555", "Gender": "F", "Phone2": "x"}


def test_confidential_columns():
    cols = ["id", "MotherFirstName", "KinPhone", "ok"]
    assert confidential_columns(cols, extra=("ok",)) == [
        "MotherFirstName",
        "KinPhone",
        "ok",
    ]
