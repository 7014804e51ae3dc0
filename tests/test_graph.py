"""Triangle counting / clustering coefficients (operators/graph.py)
against brute-force enumeration on small and randomized graphs."""

from __future__ import annotations

import itertools
import random

import pytest

from security_data_pipeline_spark.operators import graph


def _edges_df(spark, pairs):
    return spark.createDataFrame(
        [(a, b) for a, b in pairs], "src string, dst string"
    )


def _brute(pairs):
    """(triangle set, per-node degree, per-node triangle count) of an
    undirected simple graph given as (possibly messy) pairs."""
    es = set()
    for a, b in pairs:
        if a is None or b is None or a == b:
            continue
        es.add((min(a, b), max(a, b)))
    nodes = sorted({n for e in es for n in e})
    adj = {n: set() for n in nodes}
    for u, v in es:
        adj[u].add(v)
        adj[v].add(u)
    tris = {
        (x, y, z)
        for x, y, z in itertools.combinations(nodes, 3)
        if y in adj[x] and z in adj[x] and z in adj[y]
    }
    per_node = {n: 0 for n in nodes}
    for t in tris:
        for n in t:
            per_node[n] += 1
    deg = {n: len(adj[n]) for n in nodes}
    return tris, deg, per_node


def _check(spark, pairs):
    df = _edges_df(spark, pairs)
    tris, deg, per_node = _brute(pairs)

    got_tris = {
        (r["x"], r["y"], r["z"])
        for r in graph.triangle_vertices(df).collect()
    }
    assert got_tris == tris

    rows = {r["node"]: r for r in graph.clustering_coefficients(df).collect()}
    assert set(rows) == set(deg)
    for n, r in rows.items():
        assert r["degree"] == deg[n]
        assert r["triangles"] == per_node[n]
        if deg[n] < 2:
            assert r["coeff"] is None
        else:
            expect = 2.0 * per_node[n] / (deg[n] * (deg[n] - 1))
            assert r["coeff"] == pytest.approx(expect, abs=1e-6)

    g = graph.triangle_count(df).collect()[0]
    assert g["n_nodes"] == len(deg)
    n_edges = sum(deg.values()) // 2
    assert g["n_edges"] == n_edges
    assert g["n_triangles"] == len(tris)
    wedges = sum(d * (d - 1) // 2 for d in deg.values())
    if wedges == 0:
        assert g["global_coeff"] is None
    else:
        assert g["global_coeff"] == pytest.approx(
            3 * len(tris) / wedges, abs=1e-6
        )


def test_complete_k4(spark):
    nodes = ["a", "b", "c", "d"]
    _check(spark, list(itertools.combinations(nodes, 2)))


def test_star_has_no_triangles(spark):
    _check(spark, [("hub", f"leaf{i}") for i in range(5)])


def test_path_and_pendant(spark):
    # path a-b-c plus a triangle with a pendant tail
    _check(
        spark,
        [("a", "b"), ("b", "c"), ("p", "q"), ("q", "r"), ("r", "p"), ("r", "s")],
    )


def test_canonicalization_messy_input(spark):
    # duplicates, reversed directions, self-loops, NULL endpoints all
    # collapse to one clean triangle
    pairs = [
        ("a", "b"),
        ("b", "a"),
        ("b", "c"),
        ("c", "a"),
        ("a", "a"),
        (None, "b"),
        ("c", None),
        ("a", "b"),
    ]
    df = _edges_df(spark, pairs)
    g = graph.triangle_count(df).collect()[0]
    assert (g["n_nodes"], g["n_edges"], g["n_triangles"]) == (3, 3, 1)


def test_regular_graph_all_ties(spark):
    # 3-regular K4 minus matching = 4-cycle: every degree equal — the
    # node-id tie-break must still orient totally (no dropped/doubled
    # triangles). A 4-cycle has 0 triangles; K4 has 4.
    _check(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")])


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_random_graphs_match_bruteforce(spark, seed):
    rng = random.Random(seed)
    nodes = [f"n{i:02d}" for i in range(14)]
    pairs = [
        (a, b)
        for a, b in itertools.combinations(nodes, 2)
        if rng.random() < 0.3
    ]
    # add a hub to stress the degree-orientation path
    pairs += [("hub", n) for n in nodes if rng.random() < 0.8]
    _check(spark, pairs)


def test_skewed_hub_wedge_bound(spark):
    # one hub connected to 40 leaves plus a sparse ring among leaves:
    # with degree orientation every hub edge is oriented INTO the hub
    # (leaves have lower degree), so the hub emits ZERO wedges — the
    # wedge explosion the naive form would pay (40^2) never happens.
    leaves = [f"l{i}" for i in range(40)]
    pairs = [("hub", l) for l in leaves]
    pairs += [(leaves[i], leaves[(i + 1) % 40]) for i in range(0, 40, 2)]
    _check(spark, pairs)
    # structural witness: orientation sends every (leaf, hub) edge
    # leaf → hub, so no wedge is anchored at the hub
    edges = graph.undirected_edges(_edges_df(spark, pairs))
    deg = graph.degrees(edges)
    o = graph._oriented(edges, deg)
    assert o.filter(o.lo == "hub").count() == 0


def _numpy_pagerank(pairs, damping=0.85, n_iter=5):
    _, deg, _ = ({}, {}, {})
    es = set()
    for a, b in pairs:
        if a is None or b is None or a == b:
            continue
        es.add((min(a, b), max(a, b)))
    nodes = sorted({n for e in es for n in e})
    adj = {n: [] for n in nodes}
    for u, v in es:
        adj[u].append(v)
        adj[v].append(u)
    n = len(nodes)
    pr = {v: 1.0 / n for v in nodes}
    for _ in range(n_iter):
        pr = {
            v: (1.0 - damping) / n
            + damping * sum(pr[u] / len(adj[u]) for u in adj[v])
            for v in nodes
        }
    return pr, {v: len(adj[v]) for v in nodes}


@pytest.mark.parametrize(
    "pairs",
    [
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")],  # ring: uniform
        [("hub", f"l{i}") for i in range(6)],  # star
        list(itertools.combinations(["a", "b", "c", "d", "e"], 2)),  # K5
    ],
)
def test_pagerank_matches_reference(spark, pairs):
    got = {
        r["node"]: (r["degree"], r["pr"])
        for r in graph.pagerank(_edges_df(spark, pairs)).collect()
    }
    want, deg = _numpy_pagerank(pairs)
    assert set(got) == set(want)
    for v in want:
        assert got[v][0] == deg[v]
        assert got[v][1] == pytest.approx(want[v], abs=2e-6)
    # undirected graph has no dangling nodes: ranks sum to 1
    assert sum(p for _, p in got.values()) == pytest.approx(1.0, abs=1e-4)


def test_pagerank_random_graph(spark):
    rng = random.Random(5)
    nodes = [f"n{i:02d}" for i in range(12)]
    pairs = [
        (a, b)
        for a, b in itertools.combinations(nodes, 2)
        if rng.random() < 0.35
    ]
    got = {
        r["node"]: r["pr"]
        for r in graph.pagerank(_edges_df(spark, pairs)).collect()
    }
    want, _ = _numpy_pagerank(pairs)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=2e-6)
    # hubs outrank leaves: max-degree node carries the largest pr in a
    # star-augmented check
    star = [("hub", n) for n in nodes]
    got_star = {
        r["node"]: r["pr"]
        for r in graph.pagerank(_edges_df(spark, star)).collect()
    }
    assert max(got_star, key=got_star.get) == "hub"


def _brute_ra(pairs, cap):
    es = set()
    for a, b in pairs:
        if a is None or b is None or a == b:
            continue
        es.add((min(a, b), max(a, b)))
    nodes = sorted({n for e in es for n in e})
    adj = {n: set() for n in nodes}
    for u, v in es:
        adj[u].add(v)
        adj[v].add(u)
    deg = {n: len(adj[n]) for n in nodes}
    scores = {}
    for w in nodes:
        if deg[w] > cap:
            continue
        nbrs = sorted(adj[w])
        for i in range(len(nbrs)):
            for j in range(i + 1, len(nbrs)):
                key = (nbrs[i], nbrs[j])
                n, s = scores.get(key, (0, 0.0))
                scores[key] = (n + 1, s + 1.0 / deg[w])
    return {k: v for k, v in scores.items() if k not in es}


@pytest.mark.parametrize("seed,cap", [(31, 100), (37, 3)])
def test_link_prediction_ra_matches_bruteforce(spark, seed, cap):
    rng = random.Random(seed)
    nodes = [f"n{i:02d}" for i in range(12)]
    pairs = [
        (a, b)
        for a, b in itertools.combinations(nodes, 2)
        if rng.random() < 0.3
    ] + [("hub", n) for n in nodes]  # a hub the cap=3 leg must drop
    got = {
        (r["id_a"], r["id_b"]): (r["n_common"], r["ra_score"])
        for r in graph.link_prediction_ra(
            _edges_df(spark, pairs), max_center_degree=cap
        ).collect()
    }
    want = _brute_ra(pairs, cap)
    assert set(got) == set(want)
    for k, (n, s) in want.items():
        assert got[k][0] == n
        assert got[k][1] == pytest.approx(s, abs=1e-6)


def test_link_prediction_topk_total_order(spark):
    # path a-b-c-d: non-edges (a,c),(b,d) share one common neighbor of
    # degree 2 each; (a,d) has none. Tie between (a,c) and (b,d) breaks
    # on (id_a, id_b).
    pairs = [("a", "b"), ("b", "c"), ("c", "d")]
    got = graph.link_prediction_ra(
        _edges_df(spark, pairs), top_k=2
    ).collect()
    assert [(r["id_a"], r["id_b"]) for r in got] == [("a", "c"), ("b", "d")]
    assert all(r["ra_score"] == pytest.approx(0.5) for r in got)
