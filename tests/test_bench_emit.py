"""bench.py stdout contract: the LAST printed line must survive the round
artifact's ~2000-char tail capture intact and parse as JSON (r3/r4 lost the
first ~29 queries' minima because one giant line was printed alone)."""

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


def test_last_line_survives_tail_capture():
    payload = _fake_payload(120)  # worse than the real registry will ever be
    lines = bench.emit_lines(payload)
    stdout = "\n".join(lines) + "\n"
    tail = stdout[-TAIL_CHARS:]
    last = [ln for ln in tail.split("\n") if ln.strip()][-1]
    parsed = json.loads(last)  # must be a COMPLETE line inside the tail
    assert parsed["value"] == payload["value"]
    assert parsed["unit"] == "sec"
    # priority order preserved and the cut is explicit, never silent
    kept = list(parsed["queries"])
    assert kept == list(payload["queries"])[: len(kept)]
    assert parsed["dropped"] == len(payload["queries"]) - len(kept)
    assert parsed["full"] == "BENCH_FULL.json"


def test_small_registry_fits_whole():
    payload = _fake_payload(10)
    parsed = json.loads(bench.emit_lines(payload)[-1])
    assert parsed["dropped"] == 0
    assert len(parsed["queries"]) == 10
    # first line is the full verbose payload
    full = json.loads(bench.emit_lines(payload)[0])
    assert full["runs"] == payload["runs"]
