"""SQL-surface Python UDTFs (functions/udtfs.py)."""

from __future__ import annotations

import pytest

from neotree_data_pipeline_kedro_spark.functions.udtfs import register_udtfs


@pytest.fixture(scope="module", autouse=True)
def registered(spark):
    register_udtfs(spark)


def test_explode_entries_lateral_join(spark):
    spark.createDataFrame(
        [
            ("u1", '{"b": 2, "a": "x", "c": null}'),
            ("u2", '{"nested": {"k": 1}}'),
            ("u3", "not json"),   # malformed: no rows
            ("u4", "[1, 2]"),     # non-object: no rows
            ("u5", None),
        ],
        "uid string, entries string",
    ).createOrReplaceTempView("udtf_sessions")
    rows = spark.sql(
        """
        SELECT s.uid, e.key, e.value, e.n_keys
        FROM udtf_sessions s, LATERAL explode_entries(s.entries) e
        ORDER BY s.uid, e.key
        """
    ).collect()
    got = [(r.uid, r.key, r.value, r.n_keys) for r in rows]
    assert got == [
        ("u1", "a", "x", 3),
        ("u1", "b", "2", 3),
        ("u1", "c", None, 3),
        ("u2", "nested", '{"k": 1}', 1),
    ]
