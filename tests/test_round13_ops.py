"""Round-13 optimization guards.

Each test pins the OUTPUT of an operator whose internals round 13
touched for performance: the optimization must be invisible here.
"""

from __future__ import annotations

import sys
from itertools import combinations
from pathlib import Path

from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _brute_pairs(sets: dict[int, set], tau_num: int, tau_den: int):
    out = []
    for a, b in combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        union = len(sets[a] | sets[b])
        if inter * tau_den >= tau_num * union:
            out.append((a, b, inter, union))
    return sorted(out)


def test_ppjoin_small_vocab_layout_invariant_vs_bruteforce(spark):
    """r13 hardening (VERDICT r12 #4): the vocab-id map is now pinned
    with a lazy localCheckpoint so every consumer — including the
    small-vocab `bits` collect — reads ONE materialized id assignment.
    Guard: the ≤63-token bitmask path must produce the identical,
    brute-force-correct pair set no matter how the input is
    partitioned (different layouts perturb repartitionByRange's
    sampled boundaries, which is exactly the seam the pin closes)."""
    import random

    from neotree_data_pipeline_kedro_spark.operators.neardup import (
        set_similarity_join,
    )

    rng = random.Random(13)
    vocab = [f"t{i:02d}" for i in range(40)]  # <= 63: bitmask path
    sets = {i: set(rng.sample(vocab, rng.randint(5, 15))) for i in range(60)}
    sets[21] = set(sets[7])  # exact dup => jaccard 1.0
    sets[22] = sets[7] | {"t39"}
    rows = [(i, sorted(s)) for i, s in sets.items()]
    df = spark.createDataFrame(rows, "id bigint, s array<string>")
    want = _brute_pairs(sets, 6, 10)
    key = lambda r: (r["id_a"], r["id_b"], r["inter"], r["union_n"])  # noqa: E731
    for layout in (df.coalesce(1), df.repartition(64), df.repartition(5, "id")):
        got = sorted(map(key, set_similarity_join(layout, "id", "s").collect()))
        assert got == want and len(got) > 0
