"""Driver-surface and source-idiom contract pins (VERDICT r10 #3/#4).

Two classes of drift this file makes structurally impossible:

1. The ``__spark_entry__.oracle_sql`` docstring documents which registry
   queries are rows-only (no DuckDB oracle) — the surface the driver and
   the judge read. Rounds 8-10 each changed the membership and the
   docstring lagged reality twice; the pin asserts the documented list
   IS ``set(QUERIES) - set(ORACLE_SQL)``.

2. Long division written as ``/`` where the result is cast back to an
   integral type routes through doubles and silently rounds past 2^53.
   The repo has hit this exact bug class three times (r5 epoch-day, r10
   interval_overlap_join, r11 range_join); the cure is integral ``div``
   (``F.call_function("div", ...)`` / SQL ``div``). The grep contract
   bans the idiom from every non-test source file so a fourth instance
   cannot land.
"""

from __future__ import annotations

import pathlib
import re

import pytest

PKG = pathlib.Path(__file__).resolve().parents[1] / (
    "neotree_data_pipeline_kedro_spark"
)


def test_no_oracle_docstring_matches_registry():
    import __spark_entry__ as entry

    doc = entry.oracle_sql.__doc__
    m = re.search(r"Exactly (\d+) keys are absent here — (.*?) — because", doc, re.S)
    assert m, "oracle_sql docstring lost its 'Exactly N keys absent' contract"
    claimed_n = int(m.group(1))
    claimed = set(re.findall(r"[a-z][a-z0-9_]+", m.group(2)))
    actual = set(entry.queries()) - set(entry.oracle_sql())
    assert claimed == actual, (
        f"docstring no-oracle list drifted: documented-but-oracled="
        f"{sorted(claimed - actual)}, undocumented={sorted(actual - claimed)}"
    )
    assert claimed_n == len(actual)


def _source_windows():
    """Yield (path, lineno, two-line window) over non-test source, with
    comments stripped (docstrings stay: idioms only matter in code, and
    code inside docstring examples would still be a bad teaching)."""
    for p in sorted(PKG.rglob("*.py")):
        lines = p.read_text().split("\n")
        code = [re.sub(r"(^|\s)#.*$", "", ln) for ln in lines]
        for i in range(len(code)):
            yield p, i + 1, " ".join(code[i : i + 2])


def test_no_float_division_into_integral_cast():
    """Ban ``... / x).cast("long"|"bigint")`` — truncating a double
    quotient. Exact integral division must use ``div``; genuine float
    math keeps its float result or goes through an explicit F.floor
    (floor-of-ratio intent on magnitudes a double represents exactly,
    which the reviewer sees at the call site)."""
    bad = []
    pat = re.compile(r"/\s*[\w.()\"']+\s*\)\s*\.cast\(\s*[\"'](?:long|bigint)")
    for p, lineno, window in _source_windows():
        if pat.search(window) and "floor(" not in window and "//" not in window:
            bad.append(f"{p.relative_to(PKG.parent)}:{lineno}")
    assert not bad, f"float division cast to integral (use `div`): {bad}"


@pytest.mark.parametrize(
    ("sf_dir", "max_rounds"),
    [
        ("/root/testdata/sf0.001", 12),
        ("/root/testdata/sf0.01", 12),
        ("/root/testdata/sf0.1", 12),
    ],
)
def test_g4_kcore_oracle_round_bound_converges(sf_dir, max_rounds):
    """The g4_kcore DuckDB oracle replays the peel for a HARDCODED 12
    recursion rounds (rounds past the fixpoint are idempotent, so 12 is
    valid only while the true peel converges faster). Pin the bound at
    every registered SF with an independent Python peel on the same
    co-purchase fixture — if a fixture or SF change ever needs >12
    rounds, this fails before the oracle silently emits a partial peel
    (ADVICE r10)."""
    import duckdb

    con = duckdb.connect()
    edges = con.execute(
        f"""
        WITH li AS (
          SELECT DISTINCT l_orderkey AS o, l_partkey AS p
          FROM read_parquet('{sf_dir}/lineitem.parquet')
          WHERE l_partkey % 10 < 3
        )
        SELECT DISTINCT a.p AS src, b.p AS dst
        FROM li a JOIN li b ON a.o = b.o AND a.p < b.p
        """
    ).fetchall()
    k = 24
    e = set(edges)
    rounds = 0
    while True:
        deg: dict[int, int] = {}
        for a, b in e:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        kept = {(a, b) for a, b in e if deg[a] >= k and deg[b] >= k}
        if kept == e:
            break
        e = kept
        rounds += 1
        assert rounds <= max_rounds, (
            f"kcore peel at {sf_dir} needs more than {max_rounds} rounds; "
            "the hardcoded oracle recursion bound is now WRONG"
        )


def test_no_exact_multiple_division_via_slash():
    """Ban the ``(x - pmod(x, w)) / w`` and ``(x - x % w) / w`` forms:
    the numerator is an exact multiple by construction, so the author
    MEANT integral division — write ``div`` so the arithmetic never
    visits doubles."""
    bad = []
    for p, lineno, window in _source_windows():
        if re.search(
            r"-\s*[\w.]*pmod\([^)]*\)\s*\)?\s*/(?!/)", window
        ) or re.search(r"-\s*[\w.]+\s*%\s*[\w.]+\s*\)\s*/(?!/)", window):
            bad.append(f"{p.relative_to(PKG.parent)}:{lineno}")
    assert not bad, f"exact-multiple division via `/` (use `div`): {bad}"


def test_duplicate_registration_raises():
    from neotree_data_pipeline_kedro_spark.plans.queries import _register

    with pytest.raises(ValueError, match="duplicate registry name"):
        _register("q1_pricing_summary")(lambda spark, sf: None)
