"""Paired subset bench: time a few registry queries with the noop sink.

Usage: python tools/subbench.py q1 q2 ... [--runs N] [--sf DIR]
Prints one JSON line {name: [run_secs...]} plus min/median per query.
Run on a quiet machine; compare MIN-of-runs across code variants
(guide §1.4 — first run pays janino/JIT, min is the steady state).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from neotree_data_pipeline_kedro_spark.plans.queries import QUERIES
    from neotree_data_pipeline_kedro_spark.session import get_spark

    spark = get_spark(app_name="subbench")
    spark.sparkContext.setLogLevel("ERROR")
    # warmup: absorb JVM/codegen/Arrow + python worker pool startup
    next(iter(QUERIES.values()))(spark, args.sf).write.format("noop").mode(
        "overwrite"
    ).save()
    spark.range(
        0, 32_000, numPartitions=spark.sparkContext.defaultParallelism
    ).mapInPandas(lambda it: it, schema="id long").write.format("noop").mode(
        "overwrite"
    ).save()

    out: dict[str, list[float]] = {}
    for name in args.queries:
        fn = QUERIES[name]
        spark.sparkContext.setJobDescription(f"subbench:{name}")
        runs = []
        for _ in range(args.runs):
            t0 = time.perf_counter()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
        out[name] = runs
        print(f"{name}: min {min(runs):.2f} runs {runs}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
