"""bench.py stdout contract: the LAST printed line must survive the round
artifact's ~2000-char tail capture intact and parse as JSON (r3/r4 lost the
first ~29 queries' minima because one giant line was printed alone; r5's
names-keyed compact map still dropped 170 of 239 — the positional "t"
array is the fix: ~5 chars/query, every number fits)."""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # noqa: E402

TAIL_CHARS = 2000  # driver keeps the last 2000 chars of stdout


def _fake_payload(n_queries: int) -> dict:
    names = [f"some_registry_query_name_{i:03d}" for i in range(n_queries)]
    return {
        "metric": "total_query_wall_time",
        "value": 123.4567,
        "unit": "sec",
        "queries": {n: 12.3456 for n in names},
        "runs": {n: [12.3456, 13.1] for n in names},
        "unstable": ["a", "b"],
        "loadavg": [1.0, 2.0, 3.0],
        "sf": 0.1,
    }


def test_last_line_survives_tail_capture_with_every_number():
    payload = _fake_payload(250)  # worse than the real registry today
    lines = bench.emit_lines(payload)
    stdout = "\n".join(lines) + "\n"
    tail = stdout[-TAIL_CHARS:]
    last = [ln for ln in tail.split("\n") if ln.strip()][-1]
    parsed = json.loads(last)  # must be a COMPLETE line inside the tail
    assert parsed["value"] == payload["value"]
    assert parsed["unit"] == "sec"
    # EVERY per-query minimum present, positionally aligned with the
    # registry (= payload["queries"]) order
    assert parsed["n_queries"] == 250
    assert parsed["t"] == [12.35] * 250
    assert parsed["full"] == "BENCH_FULL.json"
    # the worst offenders are still named inline
    assert all(v == 12.35 for v in parsed["slowest"].values())
    assert len(parsed["slowest"]) >= 1


def test_huge_registry_degrades_to_one_decimal_not_truncation():
    payload = _fake_payload(340)
    lines = bench.emit_lines(payload)
    last = lines[-1]
    assert len(last) <= 2000 - 10
    parsed = json.loads(last)
    assert parsed["t"] == [12.3] * 340  # 1-decimal fallback, still complete


def test_compact_line_carries_alignment_contract():
    """r13 (VERDICT r12 #1): the compact line must let a consumer align
    the positional "t" array safely — "reg" is an 8-hex md5 of the
    comma-joined registry names, "cpus" disambiguates runs, and "full"
    names the non-clobbering per-core-count payload file."""
    import hashlib

    payload = _fake_payload(250)
    payload["cpus"] = 32
    parsed = json.loads(bench.emit_lines(payload)[-1])
    want = hashlib.md5(
        ",".join(payload["queries"]).encode()
    ).hexdigest()[:8]
    assert parsed["reg"] == want
    assert parsed["cpus"] == 32
    assert parsed["full"] == "BENCH_FULL_32c.json"
    # a different registry order/name list must change the checksum
    payload2 = _fake_payload(250)
    payload2["cpus"] = 32
    payload2["queries"] = dict(reversed(list(payload2["queries"].items())))
    assert json.loads(bench.emit_lines(payload2)[-1])["reg"] != want


def test_midrun_load_flag_surfaces_in_compact_line():
    payload = _fake_payload(50)
    payload["load_flag_midrun"] = True
    parsed = json.loads(bench.emit_lines(payload)[-1])
    assert parsed["load_flag_midrun"] is True
    clean = _fake_payload(50)
    assert "load_flag_midrun" not in json.loads(bench.emit_lines(clean)[-1])


def test_full_line_printed_first():
    payload = _fake_payload(10)
    full = json.loads(bench.emit_lines(payload)[0])
    assert full["runs"] == payload["runs"]
    compact = json.loads(bench.emit_lines(payload)[-1])
    assert compact["t"] == [round(v, 2) for v in payload["queries"].values()]
