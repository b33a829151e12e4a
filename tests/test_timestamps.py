"""Edge-case pins for the multi-format timestamp parser (SURVEY.md §2.8).

The five ISO-ish CASE guards (reference sql_functions.py:173-293 branches
2-6) are merged into one alternation regex in parse_timestamp_multi; these
tests pin that the union is exact — members parse identically, non-members
still fall through to the tolerant cast.
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest

from pyspark.sql import functions as F

from neotree_data_pipeline_kedro_spark.functions.timestamps import (
    parse_timestamp_multi,
)

CASES = [
    # ISO family (merged guard) — all must hit the canonical ISO parse
    ("2024-05-06", dt.datetime(2024, 5, 6)),
    ("2024/5/6", dt.datetime(2024, 5, 6)),
    ("2024.05.06", dt.datetime(2024, 5, 6)),
    ("2024-5-6 7:30", dt.datetime(2024, 5, 6, 7, 30)),
    ("2024-05-06 07:30:15", dt.datetime(2024, 5, 6, 7, 30, 15)),
    ("2024-05-06T07:30", dt.datetime(2024, 5, 6, 7, 30)),
    ("2024-05-06T07:30:15.123", dt.datetime(2024, 5, 6, 7, 30, 15)),
    # trailing-dot variants (reference branches 2-3)
    ("2024-05-06T07:30:15.", dt.datetime(2024, 5, 6, 7, 30, 15)),
    ("2024-05-06 07:30.", dt.datetime(2024, 5, 6, 7, 30)),
    # NON-members of the merged guard: garbage suffix without time or
    # trailing dot must NOT parse (falls to try_cast → NULL), exactly as
    # the five separate guards behaved
    ("2024-05-06Tgarbage", None),
    ("2024-05-06 garbage", None),
    # textual months
    ("6 March 2024", dt.datetime(2024, 3, 6)),
    ("March 6, 2024", dt.datetime(2024, 3, 6)),
    ("2024 March 6", dt.datetime(2024, 3, 6)),
    ("19-Jul-2025", dt.datetime(2025, 7, 19)),
    ("12 Mar, 2024 10:22", dt.datetime(2024, 3, 12, 10, 22)),
    # US-before-EU for 4-digit years; EU wins only when US can't match
    ("03/04/2024", dt.datetime(2024, 3, 4)),
    ("13/04/2024", dt.datetime(2024, 4, 13)),
    ("04.03.2024", dt.datetime(2024, 3, 4)),
    ("04-03-2024", dt.datetime(2024, 3, 4)),
    # compact + unix epochs
    ("20240506", dt.datetime(2024, 5, 6)),
    ("1715000000", dt.datetime.fromtimestamp(1715000000, dt.timezone.utc).replace(tzinfo=None)),
    # null tokens
    ("nan", None),
    ("NaT", None),
    ("", None),
    ("not-a-date", None),
]


@pytest.fixture(scope="module")
def parsed(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"i": range(len(CASES)), "s": [c[0] for c in CASES]})
    )
    rows = (
        df.select("i", "s", parse_timestamp_multi("s").alias("p"))
        .orderBy("i")
        .collect()
    )
    return {r["s"]: r["p"] for r in rows}


@pytest.mark.parametrize("raw,expected", CASES, ids=[c[0] or "<empty>" for c in CASES])
def test_parse(parsed, raw, expected):
    got = parsed[raw]
    if expected is None:
        assert got is None, f"{raw!r} should not parse, got {got}"
    else:
        assert got == expected, f"{raw!r}: {got} != {expected}"
