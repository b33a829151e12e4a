"""Round-7 ADVICE fixes.

1. foreachBatch rollup idempotency must survive a CHECKPOINT LINEAGE
   change: epoch ids restart at 0 under a fresh/relocated checkpoint and
   the batch->content mapping can re-group, so the merge guard is now a
   per-source-file manifest (_merged_files sidecar), not the epoch id.
2. bench.emit_lines must ALWAYS emit a parseable final line that fits the
   driver's ~2000-char tail window, however large the registry grows.
"""

from __future__ import annotations

import json

from tests.test_round6_fixes import _write_batches


def test_rollup_survives_fresh_checkpoint_with_regrouped_batches(
    spark, tmp_path
):
    """The ADVICE scenario: a rollup built under checkpoint A (one file
    per micro-batch) is resumed under a FRESH checkpoint B with a wider
    trigger, after new files arrived. Epochs renumber from 0 and one
    micro-batch now mixes already-merged and never-merged files; an
    epoch-based skip either double-counts or silently drops the new
    file. The file manifest must merge exactly the new content."""
    from neotree_data_pipeline_kedro_spark.streaming.incremental import (
        run_foreach_batch_rollup,
    )

    src = tmp_path / "src"
    rollup = str(tmp_path / "rollup")
    schema = _write_batches(
        spark, src, [[("a", 1), ("b", 10)], [("a", 4)]]
    )
    run_foreach_batch_rollup(
        spark, str(src) + "/*", schema, rollup, str(tmp_path / "c1"),
        ["g"], {"v": "sum"},
    )
    assert {
        r.g: r.sum_v for r in spark.read.parquet(rollup).collect()
    } == {"a": 5, "b": 10}

    # new data lands, then the stream restarts with a RELOCATED
    # checkpoint and NO per-file trigger: every file, merged and new,
    # arrives in one epoch-0 batch
    _write_batches(spark, src, [[("b", 7), ("c", 2)]], start=2)
    run_foreach_batch_rollup(
        spark, str(src) + "/*", schema, rollup, str(tmp_path / "c2"),
        ["g"], {"v": "sum"}, max_files_per_trigger=None,
    )
    got = {r.g: r.sum_v for r in spark.read.parquet(rollup).collect()}
    assert got == {"a": 5, "b": 17, "c": 2}  # no double-count, no drop

    # and a full replay under yet another fresh checkpoint is a no-op
    run_foreach_batch_rollup(
        spark, str(src) + "/*", schema, rollup, str(tmp_path / "c3"),
        ["g"], {"v": "sum"}, max_files_per_trigger=None,
    )
    got = {r.g: r.sum_v for r in spark.read.parquet(rollup).collect()}
    assert got == {"a": 5, "b": 17, "c": 2}


def _fake_payload(n_queries: int, sec: float) -> dict:
    queries = {f"query_name_{i:04d}": sec for i in range(n_queries)}
    return {
        "metric": "total_query_wall_time",
        "value": round(sec * n_queries, 4),
        "unit": "sec",
        "queries": queries,
        "runs": {k: [sec, sec] for k in queries},
        "unstable": [],
        "loadavg": [1.0, 1.0, 1.0],
        "sf": 0.1,
    }


def test_bench_final_line_always_fits_and_parses():
    import bench

    # current registry size, huge registry, and huge registry with
    # 4-digit per-query seconds (the inflation case from the ADVICE)
    for n, sec in [(239, 3.21), (400, 3.21), (400, 1234.5678), (900, 9999.9)]:
        lines = bench.emit_lines(_fake_payload(n, sec))
        final = lines[-1]
        assert len(final) <= bench._TAIL_BUDGET, (n, sec, len(final))
        parsed = json.loads(final)
        assert parsed["n_queries"] == n
        kept = len(parsed["t"])
        if kept < n:
            assert parsed["t_dropped"] == n - kept  # explicit marker
        else:
            assert "t_dropped" not in parsed
        # whatever survived must still be the real minima
        assert all(abs(t - round(sec, 0)) <= 0.5 for t in parsed["t"][:5])


def test_bench_small_registry_keeps_two_decimals():
    import bench

    lines = bench.emit_lines(_fake_payload(239, 3.217))
    parsed = json.loads(lines[-1])
    assert parsed["t"][0] == 3.22 and len(parsed["t"]) == 239
    assert parsed["slowest"]  # names fitted into the leftover budget
