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


def test_k_anonymity_flags_small_groups(spark):
    from neotree_data_pipeline_kedro_spark.operators.redact import (
        k_anonymity_groups,
    )

    rows = [("a", i) for i in range(7)] + [("b", 1), ("b", 2)] + [("c", 1)]
    df = spark.createDataFrame(rows, "g string, v int")
    out = {
        r.g: r
        for r in k_anonymity_groups(
            df, ["g"], k=3, measures=[("v", "max")]
        ).collect()
    }
    assert not out["a"].suppressed and out["a"].n_rows == 7
    assert out["b"].suppressed and out["b"].n_rows == 2
    assert out["c"].suppressed
    assert out["a"].max_v == 6  # measures ride the same aggregation pass
    # the release filter + suppression accounting both derive from the flag
    released = [g for g, r in out.items() if not r.suppressed]
    cost = sum(r.n_rows for r in out.values() if r.suppressed)
    assert released == ["a"] and cost == 3
