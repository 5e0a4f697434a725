"""Large-star/small-star connected components (operators/components.py):
equality with the min-label-propagation twin and a Python union-find
ground truth on shaped + fuzz graphs, and the round-count win on a
long chain (the upgrade's reason to exist)."""

from __future__ import annotations

import random

import pytest

from kinesis_stream_spark.operators.components import (
    connected_components_bigstar,
    duplicate_clusters_bigstar,
)
from kinesis_stream_spark.operators.dedup import (
    connected_components,
    duplicate_clusters,
)


def _df(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "id_a long, id_b long"
    )


def _truth(pairs):
    """Union-find ground truth: {vertex: min id of its component}."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in parent}


def _labels(df):
    return {r.v: r.comp for r in df.collect()}


GRAPHS = {
    "single_edge": [(1, 2)],
    "triangle_plus_isolated_pair": [(1, 2), (2, 3), (1, 3), (10, 11)],
    "chain_transitive": [(1, 2), (2, 3), (3, 4), (4, 5)],
    "two_cliques_bridged": [(1, 2), (1, 3), (2, 3), (7, 8), (7, 9), (8, 9), (3, 7)],
    "star_high_center": [(100, 1), (100, 2), (100, 3), (100, 4)],
    "duplicate_edges_both_orders": [(5, 6), (6, 5), (5, 6), (6, 7)],
}


@pytest.mark.parametrize("name", sorted(GRAPHS))
def test_bigstar_matches_truth_and_twin(spark, name):
    pairs = GRAPHS[name]
    df = _df(spark, pairs)
    got = _labels(connected_components_bigstar(df))
    assert got == _truth(pairs)
    assert got == _labels(connected_components(df))


@pytest.mark.slow  # fuzz tier (conftest.py)
def test_bigstar_fuzz_random_graphs(spark):
    rng = random.Random(7)
    for trial in range(5):
        n = rng.randint(10, 60)
        pairs = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(rng.randint(5, 80))
        ]
        pairs = [(a, b) for a, b in pairs if a != b]
        if not pairs:
            continue
        got = _labels(connected_components_bigstar(_df(spark, pairs)))
        assert got == _truth(pairs), (trial, pairs)


def test_bigstar_long_chain_converges_in_logarithmic_rounds(spark):
    """A 64-node path has diameter 63: min-label propagation needs 63
    rounds (beyond its default 25-round cap), large-star/small-star
    must finish within 10 — the scale claim, pinned as a hard bound."""
    pairs = [(i, i + 1) for i in range(63)]
    got = _labels(connected_components_bigstar(_df(spark, pairs), max_rounds=10))
    assert got == {i: 0 for i in range(64)}


def test_bigstar_raises_instead_of_partial_output(spark):
    """An unconverged exit must raise, never return partial clusters."""
    pairs = [(i, i + 1) for i in range(16)]
    with pytest.raises(ValueError, match="no fixpoint"):
        connected_components_bigstar(_df(spark, pairs), max_rounds=1)


def test_bigstar_empty_edges(spark):
    assert connected_components_bigstar(_df(spark, [])).count() == 0
    assert duplicate_clusters_bigstar(_df(spark, [])).count() == 0


def test_bigstar_selfloop_only_vertices_kept_as_singletons(spark):
    """Drop-in contract on ANY edge input: a vertex appearing only in
    self-loop edges is a singleton component in the propagation twin,
    so bigstar must return it too (round-7 review finding)."""
    pairs = [(1, 2), (5, 5), (9, 9), (2, 2)]  # 2 also has real edges
    df = _df(spark, pairs)
    got = _labels(connected_components_bigstar(df))
    assert got == _labels(connected_components(df))
    assert got == {1: 1, 2: 1, 5: 5, 9: 9}
    # all-self-loop input: every vertex is its own component
    only = _df(spark, [(3, 3), (4, 4)])
    assert _labels(connected_components_bigstar(only)) == {3: 3, 4: 4}


def test_cluster_summary_matches_twin(spark):
    pairs = GRAPHS["two_cliques_bridged"] + [(200, 201), (300, 301), (301, 302)]
    df = _df(spark, pairs)
    got = {
        (r.canonical_id, r.cluster_size, r.max_id)
        for r in duplicate_clusters_bigstar(df).collect()
    }
    want = {
        (r.canonical_id, r.cluster_size, r.max_id)
        for r in duplicate_clusters(df).collect()
    }
    assert got == want and got
