"""Connected-components twins: min-label propagation vs the independent
large-star/small-star implementation must agree on every graph, and both
must match a driver-side union-find on small fixtures."""

from __future__ import annotations

import pytest

from neotree_data_pipeline_kedro_spark.operators.components import (
    connected_components,
    connected_components_star,
    dedup_groups,
)


def _uf(edges: list[tuple[int, int]], nodes: set[int]) -> dict[int, int]:
    parent = {n: n for n in nodes}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        parent.setdefault(u, u)
        parent.setdefault(v, v)
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    roots = {n: find(n) for n in parent}
    # canonical id = min of component
    comp_min: dict[int, int] = {}
    for n, r in roots.items():
        comp_min[r] = min(comp_min.get(r, n), n)
    return {n: comp_min[roots[n]] for n in parent}


GRAPHS = {
    "two_triangles_bridge": [(1, 2), (2, 3), (3, 1), (10, 11), (11, 12), (12, 10), (3, 10)],
    "long_chain": [(i, i + 1) for i in range(30)],
    "stars_merged": [(0, i) for i in range(1, 6)] + [(100, i) for i in range(101, 106)] + [(5, 101)],
    "self_loops_and_dups": [(1, 1), (1, 2), (2, 1), (2, 2), (5, 6), (6, 5)],
    "singleton_heavy": [(7, 8)],
}


@pytest.mark.parametrize("name", sorted(GRAPHS))
def test_cc_twins_and_unionfind(spark, name):
    edges = GRAPHS[name]
    nodes = sorted({x for e in edges for x in e} | {999})  # 999 isolated
    edf = spark.createDataFrame(edges, "src bigint, dst bigint")
    ndf = spark.createDataFrame([(n,) for n in nodes], "id bigint")

    # local_threshold=0 forces the distributed label-prop loop; the default
    # small-graph fast path is covered by test_cc_local_path_matches
    lp = connected_components(edf, nodes=ndf, local_threshold=0)
    star = connected_components_star(edf, nodes=ndf)
    local = connected_components(edf, nodes=ndf)
    expect = _uf(edges, set(nodes))

    got_lp = {r["id"]: r["comp"] for r in lp.collect()}
    got_star = {r["id"]: r["comp"] for r in star.collect()}
    got_local = {r["id"]: r["comp"] for r in local.collect()}
    want = dict(expect)
    want[999] = 999
    assert got_lp == want, f"{name}: labelprop vs union-find"
    assert got_star == want, f"{name}: star vs union-find"
    assert got_local == want, f"{name}: local fast path vs union-find"


def test_dedup_groups_flags(spark):
    edf = spark.createDataFrame([(1, 2), (2, 3)], "src bigint, dst bigint")
    ndf = spark.createDataFrame([(1,), (2,), (3,), (9,)], "id bigint")
    out = dedup_groups(connected_components(edf, nodes=ndf)).collect()
    rows = {r["id"]: r for r in out}
    assert rows[1]["is_canonical"] and rows[1]["component_size"] == 3
    assert not rows[2]["is_canonical"] and rows[2]["comp"] == 1
    assert rows[9]["is_canonical"] and rows[9]["component_size"] == 1


def test_cc_empty_edges(spark):
    edf = spark.createDataFrame([], "src bigint, dst bigint")
    ndf = spark.createDataFrame([(4,), (5,)], "id bigint")
    got = {r["id"]: r["comp"] for r in connected_components(edf, nodes=ndf).collect()}
    assert got == {4: 4, 5: 5}
