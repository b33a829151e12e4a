"""Dump .explain('formatted') for registry queries to files.

Usage: python tools/capture_plan.py OUTDIR SUFFIX q1 [q2 ...]
Writes OUTDIR/<query>_<SUFFIX>.txt for each query.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    outdir, suffix, *names = sys.argv[1:]
    os.makedirs(outdir, exist_ok=True)
    from neotree_data_pipeline_kedro_spark.plans.queries import QUERIES
    from neotree_data_pipeline_kedro_spark.session import get_spark

    spark = get_spark(app_name="capture-plan")
    spark.sparkContext.setLogLevel("ERROR")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for name in names:
        df = QUERIES[name](spark, sf)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)", file=sys.stderr)


if __name__ == "__main__":
    main()
