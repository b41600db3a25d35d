"""Connected-components operators: min-label propagation vs the
alternating large-star/small-star algorithm (Kiveris et al., SoCC'14).

The star variant is the 100 TB path for duplicate-cluster extraction
(dedup_clusters / sim_semantic_clusters): O(log²) shuffle rounds vs
propagation's O(component diameter). These tests pin (a) equivalence of
the two on random graphs, (b) ground truth on known topologies, and
(c) the round-count guarantee that justifies the star variant.
"""

from __future__ import annotations

import random

import pytest

from dolphinbeat_spark.operators.dedup import (
    connected_components,
    connected_components_star,
)


def _labels(df) -> dict[int, int]:
    return {r["node"]: r["cluster_id"] for r in df.collect()}


def _truth(n_nodes: int, edges: list[tuple[int, int]]) -> dict[int, int]:
    """Reference union-find over the same edge list."""
    parent = list(range(n_nodes))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min node of the component
    comp: dict[int, list[int]] = {}
    for x in range(n_nodes):
        comp.setdefault(find(x), []).append(x)
    out = {}
    for members in comp.values():
        m = min(members)
        for x in members:
            out[x] = m
    # only nodes that appear in an edge are in the operators' output
    touched = {x for e in edges for x in e}
    return {x: out[x] for x in touched}


def _pairs_df(spark, edges):
    return spark.createDataFrame(
        [(a, b) for a, b in edges], "id_a long, id_b long"
    )


def test_star_equals_propagation_on_random_graphs(spark):
    rng = random.Random(42)
    for trial in range(4):
        n = 60
        edges = [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(rng.randrange(20, 80))
        ]
        edges = [(a, b) for a, b in edges if a != b]
        if not edges:
            continue
        df = _pairs_df(spark, edges)
        want = _truth(n, edges)
        got_star = _labels(connected_components_star(df))
        got_prop = _labels(connected_components(df))
        assert got_star == want, f"trial {trial}: star != union-find truth"
        assert got_prop == want, f"trial {trial}: propagation != truth"


def test_star_known_topologies(spark):
    # disjoint cliques
    cliq = [(a, b) for base in (0, 10) for a in range(base, base + 4)
            for b in range(a + 1, base + 4)]
    got = _labels(connected_components_star(_pairs_df(spark, cliq)))
    assert got == {**{i: 0 for i in range(4)}, **{i: 10 for i in range(10, 14)}}
    # self-loops and duplicate edges are absorbed
    messy = [(1, 2), (2, 1), (2, 2), (1, 2), (3, 3)]
    got = _labels(connected_components_star(_pairs_df(spark, messy)))
    assert got == {1: 1, 2: 1}  # pure self-loop node 3 has no real edge


def test_star_round_count_beats_propagation_on_chains(spark):
    """A length-64 path: propagation needs ~63 rounds (its max_iter=20
    leaves it UNCONVERGED); large-star/small-star settles in O(log n)
    — the concrete scale argument for the star variant."""
    n = 64
    chain = [(i, i + 1) for i in range(n - 1)]
    rounds: list[int] = []
    got = _labels(
        connected_components_star(_pairs_df(spark, chain), rounds_out=rounds)
    )
    assert got == {i: 0 for i in range(n)}
    assert rounds[0] <= 8, f"star took {rounds[0]} rounds on a 64-chain"
    # propagation at the same budget does NOT finish a 64-chain
    prop = _labels(connected_components(_pairs_df(spark, chain), max_iter=8))
    assert prop != got


def test_star_rounds_scale_logarithmically(spark):
    """Doubling the chain adds O(1) rounds, not O(n)."""
    r64: list[int] = []
    r128: list[int] = []
    connected_components_star(
        _pairs_df(spark, [(i, i + 1) for i in range(63)]), rounds_out=r64
    ).collect()
    connected_components_star(
        _pairs_df(spark, [(i, i + 1) for i in range(127)]), rounds_out=r128
    ).collect()
    assert r128[0] <= r64[0] + 2
