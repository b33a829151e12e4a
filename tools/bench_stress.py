"""Heavy-tail stress bench (round-8 task): run the slowest registry
queries at sf0.1 / sf0.3 / sf0.5 (tools/make_stress_data.py replicas)
and report per-query wall time plus the empirical growth exponent
alpha = ln(t_0.5 / t_0.1) / ln(5). Sub-quadratic growth (alpha < 2)
is the pass bar for the four queries whose asymptotics matter most
(dd_ppjoin_pairs, g5_link_prediction, g6_node_jaccard,
w28_dtw_to_centroid); anything super-linear by a distance is the next
round's first optimization target.

Each query runs twice per scale and the MIN is kept (first run pays
janino/JIT compilation; see .claude/skills/verify/SKILL.md). Writes
BENCH_STRESS.json at the repo root: one JSON object
{"scales": {...}, "per_query": {name: {"sf0.1": s, "sf0.3": s,
"sf0.5": s, "alpha": a}}, "pass_subquadratic": bool}.

Usage: python tools/bench_stress.py  (run on a quiet machine)
"""
from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    # the four asymptotics-critical ones first
    "dd_ppjoin_pairs",
    "g5_link_prediction",
    "g6_node_jaccard",
    "w28_dtw_to_centroid",
    # the rest of the r7 slow tail
    "g12_ppr",
    "dd_minhash_estimate_eval",
    "sm_admissions_full",
    "a42_median_polish",
    "g1_pagerank",
    "a22_rfm_segmentation",
    "g13_modularity",
    "ann_topk_ivf_kmeans",
    "g10_hyperball_reach",
    "v_fd_discovery",
    "ta_langid_ngram",
    # round-8 session additions with iterative / join-heavy shapes.
    # Deliberately absent: g15_dag_layers (its dst >= 2*src fixture
    # filter is not shard-shift-invariant, so stress volume would not
    # grow) and emb_binary_quantize (its exact brute-force EVAL arm is
    # quadratic in corpus x queries by construction — an eval fixture,
    # not a scale path).
    "g14_random_walks",
    "w34_lttb_downsample",
    "w35_isotonic_fit",
    "dd_cdc_chunks",
    # round-9 additions with join/scan-heavy shapes. Shift-invariance
    # audit: j34 blocks per (user, hour-bucket) with no key-modulo
    # filter; a80 collapses to the (segment, distinct value) grain
    # (custkey % 2 survives the 10^7 shift); ta_token_f1_eval pairs
    # (doc_id, doc_id+1) stay within a shard because shard id ranges
    # are disjoint and the shift is even. g16/g15 stay excluded (the
    # dst >= 2*src fixture is not shift-invariant).
    "j34_interval_overlap_join",
    "a80_mann_whitney",
    "ta_token_f1_eval",
    # round-10 additions (VERDICT r9 #4). Shift-invariance audit:
    # er1/er2 needed a generator fix — stress shards now embed
    # custkey + i*10^5 in c_name so both blocking keys (prefix-17,
    # suffix-6) stay shard-local and cross-shard copies are never
    # co-blocked (verbatim names merged everything at lev 0/1);
    # a74 groups on o_orderpriority with no key-modulo predicate;
    # mm_shot_boundaries gates on event_id % 40 (40 | 10^7; the i%3
    # clip-length draw shifts per shard but stays 6..8 frames).
    # g16_topo_positions stays EXCLUDED alongside g15: its DAG fixture
    # keeps only dst >= 2*src edges, which shard-i key ranges almost
    # never satisfy, so stress volume would not grow.
    "er1_entity_resolution",
    "er2_incremental_clusters",
    "a74_sprt_sequential",
    "mm_shot_boundaries",
    # round-11 additions (VERDICT r10 #5): the r10 compositions.
    # Shift-invariance audit: cb1's plant predicates are doc_id % 250
    # and % 100 (both divide 10^7, so every shard plants its own
    # cohort) and plant ids sit at +1e9/+2e9/+3e9, far above the
    # max shifted doc_id (~4e7); its fp-dedup stays shard-local
    # because shard texts carry the per-shard copyshard suffix.
    # cb3's v2 edit/remove/add predicates are % 25 / % 50 (divide
    # 10^7) and its +5e9 additions clear every shifted id. cb2's TRUE
    # near-dup pair set grows ~K^2 BY CONSTRUCTION on these shards
    # (each base doc's K copyshard variants are mutual near-dups at
    # J≈0.99), so its alpha reflects genuine output growth on top of
    # the candidate machinery — judge it against that floor, not
    # against a linear-output fixture. er3 rides er1's generator-fixed
    # fixture (custkey-embedded names keep blocks shard-local).
    # g17/g4 filter on l_partkey % 10 (divides 10^7): the co-purchase
    # graph is K disjoint copies, so per-round work scales K x with
    # round counts unchanged.
    "cb1_corpus_build_funnel",
    "cb2_split_leak_guard",
    "cb3_dataset_version_diff",
    "er3_golden_record",
    "g17_pagerank_exact",
    "g4_kcore",
    # round-11 new queries. Shift-invariance audit: ir1/ir2 query terms
    # match shard copies identically (texts gain only a copyshardN
    # suffix token), so postings volume grows K x while the ranked
    # depth stays capped; w39 cohorts on user_id % 5 (5 | 10^7) over
    # shard-disjoint user streams; er4 rides the er1 generator fix
    # (custkey-embedded names keep blocks shard-local); s23's file keys
    # are l_orderkey div 100 (shard key ranges disjoint, bins contiguous
    # per shard).
    "ir1_retrieval_eval",
    "ir2_rrf_fusion",
    "w39_session_funnel",
    "er4_blocking_quality",
    "s23_compaction_plan",
    # round-12 additions (VERDICT r11 #3/#4). Shift-invariance audit:
    # cb5's benchmark slice is now FROZEN to the unshifted id range
    # (doc_id % 17 AND doc_id < 10^7 — a benchmark registry does not
    # grow with the corpus), so the broadcast index is constant and the
    # corpus probe scales linearly in K; the former %17-mutates-
    # under-shift exclusion no longer applies. ta_contrastive_triples
    # shares cb2's caveat: the TRUE near-dup pair set grows ~K^2 by
    # construction (each base doc's K copyshard variants are mutual
    # near-dups), so judge its alpha against that output floor.
    # emb_silhouette is O(n*k) with k=8 fixed centroids chosen by
    # md5-order TakeOrdered — linear in corpus volume. ml2/ml3
    # collapse events to the (user_id%4, distinct floor(value*100))
    # grain; 4 | 10^7 keeps cohorts shard-stable and the value domain
    # is shard-invariant, so post-scan state is constant while the
    # scan grows K x.
    "cb5_decontamination_plan",
    "ta_contrastive_triples",
    "emb_silhouette",
    "ml2_auc_exact",
    "ml3_eval_suite",
    # ...and the other r12 queries. ta_dedup_threshold_sweep shares the
    # cb2/triples caveat (K copyshard variants are mutual near-dups, so
    # the true pair set grows ~K^2 by construction); its %10 plants
    # divide 10^7 and planted ids sit at +2e9..+4e9, above every
    # shifted key. ml4 slices on priority/segment/nation with no
    # key-modulo predicate; emb_index_health is O(n*k), k=8 fixed;
    # cb6 collapses to the 5-language census after one scan.
    "ta_dedup_threshold_sweep",
    "ml4_slice_finder",
    "emb_index_health",
    "cb6_mixture_plan",
]
SCALES = {
    "sf0.1": "/root/testdata/sf0.1",
    "sf0.3": "/root/repo/stress_data/sf0.3",
    "sf0.5": "/root/repo/stress_data/sf0.5",
}
CRITICAL = QUERIES[:4]


def main() -> None:
    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry

    qs = entry.queries()
    # argv subset: validate new entries without re-running the fleet
    # (a subset run prints but does NOT overwrite BENCH_STRESS.json)
    subset = [a for a in sys.argv[1:] if a in QUERIES]
    run_list = subset or QUERIES
    per_query: dict[str, dict[str, float]] = {}
    for name in run_list:
        per_query[name] = {}
        for label, d in SCALES.items():
            if not os.path.isdir(d) and not os.path.isfile(
                os.path.join(d, "lineitem.parquet")
            ) and not os.path.exists(d):
                continue
            best = None
            for _ in range(2):
                t0 = time.time()
                qs[name](spark, d).count()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            per_query[name][label] = round(best, 3)
            print(f"{name} @ {label}: {per_query[name][label]}s", flush=True)
        t1, t5 = per_query[name].get("sf0.1"), per_query[name].get("sf0.5")
        if t1 and t5:
            per_query[name]["alpha"] = round(
                math.log(max(t5, 1e-9) / max(t1, 1e-9)) / math.log(5), 3
            )
    ok = all(
        per_query[q].get("alpha", 99) < 2.0
        for q in CRITICAL
        if q in per_query
    )
    if subset:
        print(json.dumps({"subset": per_query}))
        return
    out = {
        "scales": SCALES,
        "per_query": per_query,
        "critical": CRITICAL,
        "pass_subquadratic": ok,
        "note": (
            "alpha = ln(t_sf0.5/t_sf0.1)/ln(5); data volume grows 5x with "
            "per-key structure constant (disjoint shards). alpha<1 means "
            "fixed overhead still dominates; alpha<2 is the pass bar."
        ),
    }
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH_STRESS.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({"pass_subquadratic": ok}))


if __name__ == "__main__":
    main()
