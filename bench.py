"""Benchmark harness: runs every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Each query is forced end-to-end with the no-op sink (full physical
execution, no driver collect — same shape a cluster write would have).

Output layout (truncation-proof): the round-N artifact keeps only the LAST
~2000 chars of stdout and parses the last JSON line found in that tail, so
the final line MUST fit ~1900 chars. A names-keyed map of 230+ queries never
can (~27 chars/entry; r5's artifact "dropped" 170 entries), so:
  1. the FULL payload (per-query minima, both raw runs, unstable list,
     loadavg) is written to BENCH_FULL.json next to this script, and printed
     first as one verbose JSON line (complete in real logs / CI captures);
  2. the LAST line printed is a compact summary whose "t" field is ALL
     per-query minima as a positional array in registry order (~5 chars per
     query — every number survives the tail window); "names" points at where
     the order is defined, and "slowest" names the worst offenders inline,
     greedily fitted to the remaining budget.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from neotree_data_pipeline_kedro_spark.plans.queries import QUERIES  # noqa: E402
from neotree_data_pipeline_kedro_spark.session import get_spark  # noqa: E402


_TAIL_BUDGET = 1950  # stay inside the ~2000-char tail window with margin


def emit_lines(payload: dict) -> list[str]:
    """Render stdout lines: verbose-full first, compact-fitting last.

    The compact line carries the headline metric plus EVERY per-query
    minimum: "t" is a positional array aligned with the registry order
    (the same order "queries" iterates in the full payload — ~5 chars per
    query, so all of them fit the ~2000-char tail window the driver
    parses), and "slowest" names the worst queries inline, greedily
    fitted to whatever budget remains.
    """
    lines = [json.dumps(payload)]
    items = list(payload["queries"].items())
    # r13 (VERDICT r12 #1): the driver aligns the positional "t" array by
    # name via the committed full payload; "reg" is the first 8 hex of
    # md5(",".join(names)) so a consumer can PROVE its name list matches
    # this run's registry order before zipping, and "cpus" disambiguates
    # the 32c vs 8c runs (the full payloads are also written to
    # non-clobbering BENCH_FULL_<cpus>c.json so consecutive runs at
    # different core counts both survive).
    reg = hashlib.md5(
        ",".join(name for name, _ in items).encode()
    ).hexdigest()[:8]
    cpus = payload.get("cpus")
    full_name = f"BENCH_FULL_{cpus}c.json" if cpus else "BENCH_FULL.json"
    compact = {
        "metric": payload["metric"],
        "value": payload["value"],
        "unit": payload["unit"],
        "n_queries": len(items),
        "t": [round(sec, 2) for _, sec in items],
        "names": "registry order",
        "reg": reg,
        "slowest": {},
        "unstable": len(payload.get("unstable", [])),
        "loadavg": payload.get("loadavg"),
        "loadavg_before": payload.get("loadavg_before"),
        "sf": payload["sf"],
        "full": full_name,
    }
    if cpus is not None:
        compact["cpus"] = cpus
    if payload.get("load_flag_midrun"):
        compact["load_flag_midrun"] = True
    if len(json.dumps(compact, separators=(",", ":"))) > _TAIL_BUDGET:
        # registry grew past what 2-decimal fits: 1 decimal still ranks
        compact["t"] = [round(sec, 1) for _, sec in items]
    if len(json.dumps(compact, separators=(",", ":"))) > _TAIL_BUDGET:
        # still over (350+ queries / multi-digit seconds): 0 decimals
        compact["t"] = [round(sec) for _, sec in items]
    while (
        len(json.dumps(compact, separators=(",", ":"))) > _TAIL_BUDGET
        and compact["t"]
    ):
        # last resort: drop trailing entries with an explicit marker so
        # the line ALWAYS fits and parses — never a truncated-JSON tail
        compact["t"] = compact["t"][: max(0, len(compact["t"]) - 25)]
        compact["t_dropped"] = len(items) - len(compact["t"])
    for name, sec in sorted(items, key=lambda kv: -kv[1]):
        compact["slowest"][name] = round(sec, 2)
        if len(json.dumps(compact, separators=(",", ":"))) > _TAIL_BUDGET:
            del compact["slowest"][name]
            break
    lines.append(json.dumps(compact, separators=(",", ":")))
    return lines


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(Path(sf_dir).name.replace("sf", "") or 0.1)
    # loadavg BEFORE the bench generates its own load: the in-run/tail
    # loadavg always reflects the bench's 32 threads, so only this value
    # says whether the MACHINE was quiet when the run started
    try:
        load_before = [round(x, 2) for x in os.getloadavg()]
    except OSError:
        load_before = None
    # Load guard (VERDICT r8 #4): a contended host inflates per-query
    # numbers 2-7x and the artifact then reads as a code regression
    # (r8's recorded 1.23x "regression" started at loadavg 12.7 and
    # evaporated on a quiet re-run). Loop-wait until the 1-minute load
    # drops under the threshold rather than refusing outright — the
    # driver runs this unattended and an absent artifact is worse than
    # a late one; if the host never quiets down within the budget, run
    # anyway and record how long we waited so the reader can discount.
    # Default 2, not 4 (VERDICT r9 #3): the r9 driver run started at
    # loadavg 3.7 — "under the old threshold" — and still recorded a
    # median 2.6x inflation over the first 50 registry positions.
    # Gate on BOTH the 1-minute and the 5-minute averages (VERDICT r11
    # #3/#5): the r11 driver run started at load1 1.59 but load5 7.4 — a
    # just-finished heavy job still draining page cache / GC shadow —
    # and recorded 49 unstable entries with four fake >2x "regressions".
    # load5/2 > threshold means the box was busy within the last few
    # minutes even if the instantaneous load already dropped; wait for
    # the drain too.
    max_load = float(os.environ.get("SPARK_GRAFT_MAX_LOAD", "2"))
    wait_budget = float(os.environ.get("SPARK_GRAFT_LOAD_WAIT_SEC", "600"))
    waited = 0.0

    def _gate(lv: list[float]) -> float:
        return max(lv[0], lv[1] / 2.0)

    while (
        load_before is not None
        and _gate(load_before) > max_load
        and waited < wait_budget
    ):
        print(
            f"bench: loadavg {load_before[0]} (5m {load_before[1]}) gate "
            f"{_gate(load_before):.2f} > {max_load}, waiting 15s "
            f"({waited:.0f}/{wait_budget:.0f}s used)",
            file=sys.stderr,
        )
        time.sleep(15)
        waited += 15
        load_before = [round(x, 2) for x in os.getloadavg()]
    spark = get_spark(app_name="neotree-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Adaptive warmup (r13 measurement fix, declared in
    # OPTIMIZATION_r13.md): one untimed execution was enough on earlier
    # hosts, but a cold JVM on a slow box keeps C2-compiling through the
    # first MINUTES of a run — the r13 baseline recorded the first
    # registry query at 12.65 s in-bench vs 1.5 s in a warm session, and
    # the per-query min-of-2 cannot absorb a tax that decays over ~20
    # queries. Re-run the first registry query untimed until its wall
    # time stabilizes (consecutive runs within 25%), capped at 6 runs;
    # the warmup run count/times are recorded in the payload. The timed
    # region, query set, sink and two-timed-runs methodology are
    # unchanged.
    warm_fn = next(iter(QUERIES.values()))
    warmup_times: list[float] = []
    for _ in range(6):
        t0 = time.perf_counter()
        warm_fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        warmup_times.append(round(time.perf_counter() - t0, 3))
        # stabilized = the PREVIOUS run was not much slower than this
        # one (a big drop means compilation is still burning off and the
        # loop must continue; the first artifact's [23.2, 7.7] pair
        # wrongly passed a current<=1.25*previous test)
        if (
            len(warmup_times) >= 2
            and warmup_times[-2] <= 1.25 * warmup_times[-1]
        ):
            break
    # ...and one partition-per-core pandas pass spins up the Python worker
    # pool, so daemon startup doesn't land on the first mapInPandas query
    # (steady-state clusters keep workers alive between jobs)
    spark.range(0, 32_000, numPartitions=spark.sparkContext.defaultParallelism).mapInPandas(
        lambda it: it, schema="id long"
    ).write.format("noop").mode("overwrite").save()

    # Two executions per query: the first can absorb one-off costs (plan
    # compilation, codegen cache, broadcast build, shuffle-file reuse misses),
    # the second is the steady-state number a long-lived cluster would see.
    # We report min(first, second) per query and flag >30% swings so an
    # environmental hiccup can't masquerade as a code regression.
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    runs: dict[str, list[float]] = {}
    n_extra_runs = 0
    # Mid-run load samples (VERDICT r12 #8): the pre-run gate passed at
    # load1 1.79 in r12 while a contaminated run was starting; sampling
    # the 1-minute average every 25 queries lets the artifact
    # self-identify contamination that arrives MID-run. A clean solo
    # bench run on this box sits at load1 ~11 on local[32], so the flag
    # threshold is cpus/2 above that own-load floor: flagged when any
    # sample exceeds cpus/2 + 8 (own load) — conservative, the series
    # itself is recorded for readers who want a different cut.
    load_series: list[list[float]] = []
    for qi, (name, fn) in enumerate(QUERIES.items()):
        if qi % 25 == 24:
            try:
                load_series.append(
                    [round(x, 2) for x in os.getloadavg()]
                )
            except OSError:
                pass
            # ~300 queries in one JVM accumulate dropped-but-uncollected
            # RDD/broadcast state (localCheckpoint blocks release via
            # ContextCleaner weak refs only after a GC); an explicit
            # collection every ~25 queries keeps late-registry queries
            # from paying earlier queries' heap pressure — measured as
            # the difference between a 4.7 s in-bench number and a 0.9 s
            # standalone number for the same query (round 8). Untimed.
            spark.sparkContext._jvm.System.gc()
        pair = []
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            pair.append(round(time.perf_counter() - t0, 4))
        # Contamination escape (VERDICT r9 #3): a >2x run1/run2 spread is
        # the signature of an external load spike landing on ONE of the
        # runs (steady code never swings that far) — take a third run and
        # let min() discard the contaminated sample.
        if max(pair) > 2.0 * min(pair) and max(pair) - min(pair) > 0.5:
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            pair.append(round(time.perf_counter() - t0, 4))
            n_extra_runs += 1
        runs[name] = pair

    timings = {name: min(pair) for name, pair in runs.items()}
    unstable = {
        name: pair
        for name, pair in runs.items()
        if max(pair) > 1.3 * min(pair) and max(pair) - min(pair) > 0.5
    }
    total = round(sum(timings.values()), 4)
    # host load context: this container shares its machine; totals have
    # measured 65 s and 84 s an hour apart on identical code. loadavg in
    # the artifact lets a reader separate environmental drift from
    # regressions (compare per-query steady-state, never totals).
    try:
        load1, load5, load15 = (round(x, 2) for x in os.getloadavg())
    except OSError:
        load1 = load5 = load15 = None
    payload = {
        "metric": "total_query_wall_time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "runs": runs,
        "names": list(timings),
        "cpus": cpus,
        "unstable": sorted(unstable),
        "loadavg": [load1, load5, load15],
        "loadavg_before": load_before,
        "load_series": load_series,
        "load_flag_midrun": any(
            lv[0] > cpus / 2 + 8 for lv in load_series
        ),
        "load_guard": {"threshold": max_load, "waited_sec": waited},
        "warmup_times": warmup_times,
        "n_extra_runs": n_extra_runs,
        "sf": sf,
    }
    # Non-clobbering per-core-count artifact PLUS the legacy name
    # (VERDICT r12 #1: the driver's 8-core run overwrote the 32-core
    # run's per-query payload, leaving two rounds with no name-aligned
    # perf comparison).
    here = Path(__file__).resolve().parent
    for fname in ("BENCH_FULL.json", f"BENCH_FULL_{cpus}c.json"):
        try:
            here.joinpath(fname).write_text(json.dumps(payload, indent=1))
        except OSError:
            pass  # read-only checkout: stdout still carries everything
    for line in emit_lines(payload):
        print(line)


if __name__ == "__main__":
    main()
