"""Bucket-blocked range join: parity vs a naive cross-filter, pair
uniqueness across bucket seams, the overlap guard, and the no-cartesian
plan contract."""

from __future__ import annotations

import contextlib
import datetime as dt
import io

import pytest

from neotree_data_pipeline_kedro_spark.operators.joins import range_join

D = dt.datetime
HOUR_US = 3600 * 1_000_000


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", D(2024, 1, 1, 12, 0)),
            (2, "u1", D(2024, 1, 1, 18, 0)),
            (3, "u2", D(2024, 1, 2, 0, 30)),
        ],
        "lid bigint, user string, lts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, "u1", D(2024, 1, 1, 11, 59)),  # 1 min before lid=1
            (11, "u1", D(2024, 1, 1, 6, 1)),    # 5h59 before lid=1
            (12, "u1", D(2024, 1, 1, 6, 0)),    # exactly 6h before: excluded (open)
            (13, "u1", D(2024, 1, 1, 12, 0)),   # equal ts: included (closed)
            (14, "u2", D(2024, 1, 1, 23, 0)),   # bucket seam for lid=3
            (15, "u2", D(2024, 1, 2, 0, 30)),
            (16, "u3", D(2024, 1, 1, 12, 0)),   # wrong key
        ],
        "rid bigint, user string, rts timestamp",
    )
    return left, right


def _naive(left, right, lower_us, upper_us):
    out = set()
    for l in left.collect():
        for r in right.collect():
            if l.user != r.user:
                continue
            diff = (r.rts - l.lts).total_seconds() * 1_000_000
            if lower_us < diff <= upper_us:
                out.add((l.lid, r.rid))
    return out


def test_range_join_matches_naive(spark):
    left, right = _frames(spark)
    got = {
        (r.lid, r.rid)
        for r in range_join(
            left, right, ["user"], "lts", "rts", -6 * HOUR_US, 0
        ).collect()
    }
    assert got == _naive(left, right, -6 * HOUR_US, 0)
    # boundary semantics spelled out: open lower, closed upper
    assert (1, 12) not in got and (1, 13) in got


def test_range_join_no_duplicate_pairs_across_buckets(spark):
    left, right = _frames(spark)
    rows = range_join(
        left, right, ["user"], "lts", "rts", -6 * HOUR_US, 0
    ).collect()
    pairs = [(r.lid, r.rid) for r in rows]
    assert len(pairs) == len(set(pairs))


def test_range_join_forward_window(spark):
    left, right = _frames(spark)
    got = {
        (r.lid, r.rid)
        for r in range_join(
            left, right, ["user"], "lts", "rts", 0, 12 * HOUR_US
        ).collect()
    }
    assert got == _naive(left, right, 0, 12 * HOUR_US)


def test_range_join_guards(spark):
    left, right = _frames(spark)
    with pytest.raises(ValueError, match="upper_us must exceed"):
        range_join(left, right, ["user"], "lts", "rts", 5, 5)
    clash = right.withColumnRenamed("rts", "lts")
    with pytest.raises(ValueError, match="overlapping non-key"):
        range_join(left, clash, ["user"], "lts", "lts", 0, 10)


def test_j11_plan_has_no_cartesian(spark):
    from neotree_data_pipeline_kedro_spark.plans.queries import QUERIES

    from conftest import SF_SMOKE

    df = QUERIES["j11_range_join_attribution"](spark, SF_SMOKE)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_fuzzy_string_join_complete_vs_naive(spark):
    """Length-bucket blocking must not lose any pair within max_dist —
    including edits at position 0 (which first-char blocking would drop)."""
    from neotree_data_pipeline_kedro_spark.operators.joins import fuzzy_string_join

    left = spark.createDataFrame(
        [("kitten",), ("Xold widget",), ("bolt",), ("zzzzz",)], "probe string"
    )
    right = spark.createDataFrame(
        [("sitten",), ("cold widget",), ("bolts",), ("bole",), ("unrelated",)],
        "name string",
    )
    got = {
        (r.probe, r.name, r.edit_dist)
        for r in fuzzy_string_join(left, right, "probe", "name", max_dist=1).collect()
    }
    import itertools

    def lev(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a):
            cur = [i + 1]
            for j, cb in enumerate(b):
                cur.append(min(prev[j + 1] + 1, cur[j] + 1, prev[j] + (ca != cb)))
            prev = cur
        return prev[-1]

    want = {
        (l.probe, r.name, lev(l.probe.lower(), r.name.lower()))
        for l, r in itertools.product(left.collect(), right.collect())
        if lev(l.probe.lower(), r.name.lower()) <= 1
    }
    assert got == want
    assert ("kitten", "sitten", 1) in got     # substitution at position 0
    assert ("Xold widget", "cold widget", 1) in got


def test_grid_distance_join_exact_vs_bruteforce(spark):
    """Grid blocking must find EVERY pair within radius exactly once —
    including pairs straddling cell boundaries — and none outside."""
    import itertools

    from neotree_data_pipeline_kedro_spark.operators.joins import (
        grid_distance_join,
    )

    pts = [
        (1, 0.0, 0.0),
        (2, 9.9, 0.0),    # within r=10 of 1, straddles the cell boundary
        (3, 10.1, 0.0),   # within r of 2, NOT of 1 (dist 10.1)
        (4, 0.0, 25.0),   # isolated
        (5, 7.0, 7.0),    # within r of 1 and 2
        (6, -9.0, -3.0),  # negative coords: within r of 1
    ]
    df = spark.createDataFrame(pts, "id long, x double, y double")
    out = grid_distance_join(
        df.withColumnRenamed("id", "a"),
        df.withColumnRenamed("id", "b"),
        "x", "y", radius=10.0, left_id="a", right_id="b",
    ).filter("a < b")
    got = {(r.a, r.b) for r in out.collect()}
    want = {
        (i, j)
        for (i, xi, yi), (j, xj, yj) in itertools.combinations(pts, 2)
        if (xi - xj) ** 2 + (yi - yj) ** 2 <= 100.0
    }
    assert got == want
    # each pair exactly once (no dup from the 3x3 replication)
    assert out.count() == len(got)


def test_grid_distance_join_no_cartesian_plan(spark):
    import contextlib
    import io

    from neotree_data_pipeline_kedro_spark.operators.joins import (
        grid_distance_join,
    )

    df = spark.range(100).selectExpr(
        "id", "CAST(id % 37 AS DOUBLE) x", "CAST(id % 41 AS DOUBLE) y"
    )
    out = grid_distance_join(
        df.withColumnRenamed("id", "a"),
        df.withColumnRenamed("id", "b"),
        "x", "y", radius=3.0, left_id="a", right_id="b",
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
