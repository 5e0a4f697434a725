"""PageRank (operators/graph.py): exact-integer equality with a Python
reference implementing the same fixed-point semantics, dangling-mass
and self-loop handling, mass accounting, and empty edges. Cross-engine
parity for the registered query runs in test_oracle_parity.py."""

from __future__ import annotations

from collections import Counter

import pytest

from kinesis_stream_spark.operators.graph import PR_SCALE, pagerank


def _df(spark, pairs):
    return spark.createDataFrame(
        [(str(a), str(b)) for a, b in pairs], "src string, dst string"
    )


def _truth(pairs, iterations=3):
    e = sorted({(str(a), str(b)) for a, b in pairs})
    nodes = sorted({u for u, _ in e} | {v for _, v in e})
    n = len(nodes)
    out = Counter(u for u, _ in e)
    r = {v: PR_SCALE // n for v in nodes}
    for _ in range(iterations):
        c = Counter()
        for u, v in e:
            c[v] += (17 * r[u]) // (20 * out[u])
        ds = sum(r[v] for v in nodes if out[v] == 0)
        t = (3 * PR_SCALE) // (20 * n)
        d = (17 * ds) // (20 * n)
        r = {v: t + d + c[v] for v in nodes}
    return r


GRAPHS = {
    "chain_with_sink": [(1, 2), (2, 3), (3, 4)],  # 4 is dangling
    "star_into_hub": [(1, 9), (2, 9), (3, 9), (4, 9)],  # hub dangles
    "ring_no_dangling": [(1, 2), (2, 3), (3, 1)],
    "self_loop_and_dup_edges": [(1, 1), (1, 2), (1, 2), (2, 1)],
    "two_components": [(1, 2), (2, 1), (10, 11)],
}


@pytest.mark.parametrize("name", sorted(GRAPHS))
def test_pagerank_matches_integer_reference(spark, name):
    pairs = GRAPHS[name]
    got = {r.node: r.rank_fx for r in pagerank(_df(spark, pairs)).collect()}
    assert got == _truth(pairs)


def test_pagerank_hub_outranks_spokes(spark):
    got = {
        r.node: r.rank_fx
        for r in pagerank(_df(spark, GRAPHS["star_into_hub"])).collect()
    }
    assert got["9"] > max(v for k, v in got.items() if k != "9")


def test_pagerank_mass_approximately_conserved(spark):
    """Floor division may only LOSE mass, bounded by (edges + 2·N) units
    per round at 2^-40 granularity — never create it."""
    pairs = GRAPHS["ring_no_dangling"]
    got = pagerank(_df(spark, pairs)).collect()
    total = sum(r.rank_fx for r in got)
    n, n_edges, rounds = 3, 3, 3
    assert total <= PR_SCALE
    assert total >= PR_SCALE - rounds * (n_edges + 2 * n) - n


def test_pagerank_empty_edges(spark):
    assert pagerank(_df(spark, [])).count() == 0


def test_pagerank_null_endpoints_dropped(spark):
    df = spark.createDataFrame(
        [("1", "2"), (None, "3"), ("4", None)], "src string, dst string"
    )
    got = {r.node for r in pagerank(df).collect()}
    assert got == {"1", "2"}


def test_kcore_peels_cascade(spark):
    """A triangle core survives k=2 peeling; a pendant chain cascades
    out over successive rounds (round 1 removes the leaf, round 2 the
    newly exposed degree-1 node)."""
    from kinesis_stream_spark.operators.graph import kcore

    edges = [
        ("a", "b"), ("b", "c"), ("c", "a"),   # triangle: degree 2 each
        ("c", "d"), ("d", "e"),               # chain hanging off c
        ("x", "x"),                           # self-loop: dropped
    ]
    df = spark.createDataFrame(edges, "src string, dst string")
    # one round: only the leaf e (and isolated-by-self-loop x) go;
    # d survives round 1 with degree 2 (c and e) before e's removal
    one = {r.node: r.degree for r in kcore(df, k=2, rounds=1).collect()}
    assert set(one) == {"a", "b", "c", "d"}
    # two rounds: e's removal exposes d (degree 1) -> removed
    two = {r.node: r.degree for r in kcore(df, k=2, rounds=2).collect()}
    assert two == {"a": 2, "b": 2, "c": 2}
    # fixpoint: further rounds change nothing
    three = {r.node: r.degree for r in kcore(df, k=2, rounds=3).collect()}
    assert three == two


def test_kcore_rejects_bad_params(spark):
    import pytest
    from kinesis_stream_spark.operators.graph import kcore

    df = spark.createDataFrame([("a", "b")], "src string, dst string")
    with pytest.raises(ValueError):
        kcore(df, k=0, rounds=1)
    with pytest.raises(ValueError):
        kcore(df, k=2, rounds=0)


def test_label_propagation_two_cliques(spark):
    """Two triangles joined by one bridge edge: each triangle converges
    to its minimum member label; deterministic tie-breaks."""
    from kinesis_stream_spark.operators.graph import label_propagation

    edges = [
        ("a", "b"), ("b", "c"), ("c", "a"),      # clique 1
        ("x", "y"), ("y", "z"), ("z", "x"),      # clique 2
        ("c", "x"),                               # bridge
    ]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r.node: r.label for r in label_propagation(df, rounds=4).collect()}
    assert set(got) == {"a", "b", "c", "x", "y", "z"}
    # hand-traced 4 rounds: clique 1 converges to "a"; clique 2 to "c"
    # ("c" enters via the bridge in round 1 — x's neighbor set {y,z,c}
    # ties at count 1 and "c" is the min — and then outvotes "x")
    assert {got[n] for n in "abc"} == {"a"}
    assert {got[n] for n in "xyz"} == {"c"}


def test_label_propagation_round1_is_neighbor_min_majority(spark):
    """One round on a star: leaves adopt the hub's label, the hub
    adopts the smallest leaf label (all neighbor labels tie at 1)."""
    from kinesis_stream_spark.operators.graph import label_propagation

    df = spark.createDataFrame(
        [("hub", "l1"), ("hub", "l2"), ("hub", "l3")], "src string, dst string"
    )
    got = {r.node: r.label for r in label_propagation(df, rounds=1).collect()}
    assert got == {"hub": "l1", "l1": "hub", "l2": "hub", "l3": "hub"}


def test_triangle_stats_known_graph(spark):
    """K4 minus one edge: two triangles share an edge; degrees and
    local clustering coefficients are hand-checkable."""
    from kinesis_stream_spark.operators.graph import triangle_stats

    # nodes 1-4, all edges except (3,4): triangles (1,2,3) and (1,2,4)
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (4, 2), (9, 9)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r for r in triangle_stats(df).collect()}
    assert {n: r.n_triangles for n, r in got.items()} == {1: 2, 2: 2, 3: 1, 4: 1}
    assert {n: r.degree for n, r in got.items()} == {1: 3, 2: 3, 3: 2, 4: 2}
    assert got[1].clustering_coeff == 2 * 2 / (3 * 2)
    assert got[3].clustering_coeff == 1.0
    assert 9 not in got  # self-loop-only node has no simple edges


def test_bfs_hops_chain_hand_traced(spark):
    """Chain a-b-c-d-e with source {a}: dists 0,1,2,3 within 3 rounds;
    e stays unreached (would need round 4). Off-graph sources drop."""
    from kinesis_stream_spark.operators.graph import bfs_hops

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")],
        "src string, dst string",
    )
    sources = spark.createDataFrame(
        [("a",), ("zzz_not_in_graph",)], "node string"
    )
    got = {r.node: r.dist for r in bfs_hops(edges, sources, rounds=3).collect()}
    assert got == {"a": 0, "b": 1, "c": 2, "d": 3}


def test_bfs_hops_min_distance_over_multiple_sources(spark):
    """Two sources; every node takes the NEARER source. Undirected:
    reachability flows against edge direction too."""
    from kinesis_stream_spark.operators.graph import bfs_hops

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("x", "d")],
        "src string, dst string",
    )
    sources = spark.createDataFrame([("a",), ("x",)], "node string")
    got = {r.node: r.dist for r in bfs_hops(edges, sources, rounds=3).collect()}
    # d: 1 via x (not 3 via a); c: 2 via x (tie with 2 via a)
    assert got == {"a": 0, "x": 0, "b": 1, "d": 1, "c": 2}


def test_bfs_hops_rejects_bad_rounds(spark):
    import pytest
    from kinesis_stream_spark.operators.graph import bfs_hops

    edges = spark.createDataFrame([("a", "b")], "src string, dst string")
    sources = spark.createDataFrame([("a",)], "node string")
    with pytest.raises(ValueError):
        bfs_hops(edges, sources, rounds=0)


def test_bfs_hops_frontier_stays_frontier_sized(spark):
    """On a chain, each round's relaxation input is ONE node — not the
    whole discovered set. frontier_sizes exposes the per-round join
    input; whole-set relaxation would read [1, 2, 3, 4, ...]."""
    from kinesis_stream_spark.operators.graph import bfs_hops

    n = 6
    edges = spark.createDataFrame(
        [(f"n{i}", f"n{i+1}") for i in range(n)], "src string, dst string"
    )
    sources = spark.createDataFrame([("n0",)], "node string")
    sizes: list[int] = []
    got = {
        r.node: r.dist
        for r in bfs_hops(
            edges, sources, rounds=4, frontier_sizes=sizes
        ).collect()
    }
    assert got == {f"n{i}": i for i in range(5)}
    assert sizes == [1, 1, 1, 1, 1]


def test_bfs_hops_early_exit_on_empty_frontier(spark):
    """rounds larger than the graph diameter: the frontier empties and
    the loop stops relaxing (result unchanged vs the unrolled oracle,
    which replays fixed-point no-op rounds)."""
    from kinesis_stream_spark.operators.graph import bfs_hops

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c")], "src string, dst string"
    )
    sources = spark.createDataFrame([("a",)], "node string")
    sizes: list[int] = []
    got = {
        r.node: r.dist
        for r in bfs_hops(
            edges, sources, rounds=10, frontier_sizes=sizes
        ).collect()
    }
    assert got == {"a": 0, "b": 1, "c": 2}
    # seed, two discovery rounds, one empty round, then stop
    assert sizes == [1, 1, 1, 0]


def test_cheapest_path_frontier_is_improved_only(spark):
    """Weighted chain with a shortcut that re-improves a settled node:
    only just-improved nodes join the next round. Chain a-b-c (w=10
    each) plus cheap path a-x-y-c (w=1 each): c first settles at 20
    (round 2 via b), then improves to 3 (round 3 via y)."""
    from kinesis_stream_spark.operators.graph import cheapest_path

    edges = spark.createDataFrame(
        [
            ("a", "b", 10), ("b", "c", 10),
            ("a", "x", 1), ("x", "y", 1), ("y", "c", 1),
        ],
        "src string, dst string, w long",
    )
    sources = spark.createDataFrame([("a",)], "node string")
    sizes: list[int] = []
    got = {
        r.node: r.cost
        for r in cheapest_path(
            edges, sources, rounds=5, frontier_sizes=sizes
        ).collect()
    }
    assert got == {"a": 0, "b": 10, "x": 1, "y": 2, "c": 3}
    # r1: {b,x} improve; r2: {y,c(=20)}; r3: {c(=3)}; r4: {} -> stop
    assert sizes == [1, 2, 2, 1, 0]


def test_ppr_mass_concentrates_near_seed(spark):
    """Star graph seeded at the hub: the hub must outrank every leaf,
    leaves (1 hop) must outrank a detached pair (unreachable -> 0),
    and total mass stays <= PR_SCALE (conservation up to floor loss)."""
    from kinesis_stream_spark.operators.graph import PR_SCALE, personalized_pagerank

    edges = spark.createDataFrame(
        [("hub", f"leaf{i}") for i in range(4)]
        + [(f"leaf{i}", "hub") for i in range(4)]
        + [("iso1", "iso2")],
        "src string, dst string",
    )
    seeds = spark.createDataFrame([("hub",)], "node string")
    got = {r.node: r.rank_fx for r in personalized_pagerank(edges, seeds, iterations=3).collect()}
    assert got["hub"] > got["leaf0"] > 0
    assert got["iso1"] == 0 and got["iso2"] == 0
    assert sum(got.values()) <= PR_SCALE


def test_ppr_offgraph_seed_drops_and_empty_seed_zeroes(spark):
    from kinesis_stream_spark.operators.graph import personalized_pagerank

    edges = spark.createDataFrame([("a", "b")], "src string, dst string")
    seeds = spark.createDataFrame([("a",), ("ghost",)], "node string")
    got = {r.node: r.rank_fx for r in personalized_pagerank(edges, seeds, iterations=2).collect()}
    # |S| = 1 (ghost dropped): a holds teleport mass, b gets contributions
    assert got["a"] > 0 and got["b"] > 0
