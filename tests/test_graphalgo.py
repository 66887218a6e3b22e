"""BFS shortest paths / triangle counting / label propagation against
pure-Python oracles, including seeded random-graph differentials."""

from collections import deque

import numpy as np
import pytest

from oxigraph_spark.operators.graphalgo import (
    label_propagation, shortest_paths, triangle_count,
    weighted_shortest_paths)

EDGES = [  # two triangles sharing edge (1,2), a tail, and an island
    (0, 1), (1, 2), (2, 0), (1, 3), (3, 2), (3, 4), (10, 11),
]


def bfs_to_landmark(edges, landmark):
    """dist(node -> landmark) following edge direction."""
    rev = {}
    nodes = set()
    for s, d in edges:
        rev.setdefault(d, []).append(s)
        nodes.update((s, d))
    if landmark not in nodes:
        return {}
    dist = {landmark: 0}
    q = deque([landmark])
    while q:
        v = q.popleft()
        for u in rev.get(v, []):
            if u not in dist:
                dist[u] = dist[v] + 1
                q.append(u)
    return dist


def brute_triangles(edges):
    adj = {}
    nodes = set()
    for s, d in edges:
        if s == d:
            continue
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
        nodes.update((s, d))
    tri = {v: 0 for v in nodes}
    tri_total = 0
    ns = sorted(nodes)
    for i, a in enumerate(ns):
        for b in ns[i + 1:]:
            if b not in adj.get(a, ()):
                continue
            for c in ns:
                if c <= b:
                    continue
                if c in adj.get(a, ()) and c in adj.get(b, ()):
                    tri[a] += 1
                    tri[b] += 1
                    tri[c] += 1
                    tri_total += 1
    return tri, tri_total


def python_lpa(edges, iters):
    nbrs = {}
    for s, d in edges:
        if s == d:
            continue
        nbrs.setdefault(s, set()).add(d)
        nbrs.setdefault(d, set()).add(s)
    labels = {v: v for v in nbrs}
    for _ in range(iters):
        nxt = {}
        for v in nbrs:
            counts = {}
            for u in nbrs[v]:
                counts[labels[u]] = counts.get(labels[u], 0) + 1
            # max count, tie -> smallest label
            nxt[v] = min(counts, key=lambda l: (-counts[l], l))
        labels = nxt
    return labels


def test_shortest_paths_single_landmark(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    got = {(r["node"], r["landmark"]): r["dist"]
           for r in shortest_paths(df, [2]).collect()}
    want = bfs_to_landmark(EDGES, 2)
    assert got == {(n, 2): d for n, d in want.items()}
    # the island never reaches landmark 2
    assert (10, 2) not in got and (11, 2) not in got


def test_shortest_paths_multi_landmark_and_bound(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    got = {(r["node"], r["landmark"]): r["dist"]
           for r in shortest_paths(df, [2, 4, 11]).collect()}
    for lm in (2, 4, 11):
        want = bfs_to_landmark(EDGES, lm)
        assert {n: d for (n, l), d in got.items() if l == lm} == want
    capped = {(r["node"], r["landmark"]): r["dist"]
              for r in shortest_paths(df, [2], max_dist=1).collect()}
    assert capped == {(n, 2): d for n, d in bfs_to_landmark(EDGES, 2).items()
                      if d <= 1}


def test_shortest_paths_empty_seeds_raise(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    with pytest.raises(ValueError):
        shortest_paths(df, [])
    # absent landmark: empty result, not an error
    assert shortest_paths(df, [999]).count() == 0


def test_shortest_paths_random_differential(spark):
    rng = np.random.default_rng(11)
    for _ in range(3):
        n = int(rng.integers(6, 15))
        m = int(rng.integers(n, 4 * n))
        edges = [(int(rng.integers(0, n)), int(rng.integers(0, n)))
                 for _ in range(m)]
        lms = [int(rng.integers(0, n)) for _ in range(2)]
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {(r["node"], r["landmark"]): r["dist"]
               for r in shortest_paths(df, lms).collect()}
        want = {}
        for lm in sorted(set(lms)):
            for node, d in bfs_to_landmark(edges, lm).items():
                want[(node, lm)] = d
        assert got == want


def dijkstra_to_landmark(edges, landmark):
    """cheapest cost(node -> landmark) following edge direction;
    edges = [(src, dst, w)]."""
    import heapq
    rev = {}
    nodes = set()
    for s, d, w in edges:
        rev.setdefault(d, []).append((s, w))
        nodes.update((s, d))
    if landmark not in nodes:
        return {}
    dist = {landmark: 0.0}
    heap = [(0.0, landmark)]
    while heap:
        dv, v = heapq.heappop(heap)
        if dv > dist.get(v, float("inf")):
            continue
        for u, w in rev.get(v, []):
            nd = dv + w
            if nd < dist.get(u, float("inf")):
                dist[u] = nd
                heapq.heappush(heap, (nd, u))
    return dist


WEIGHTED = [  # cheap long way round beats the heavy direct edge
    (0, 2, 10.0), (0, 1, 1.0), (1, 2, 1.0), (3, 0, 2.5),
    (2, 4, 0.5), (10, 11, 7.0),
]


def test_weighted_shortest_paths_known_graph(spark):
    df = spark.createDataFrame(WEIGHTED, "src long, dst long, weight double")
    got = {(r["node"], r["landmark"]): r["dist"]
           for r in weighted_shortest_paths(df, [2, 11]).collect()}
    want = {}
    for lm in (2, 11):
        for n, d in dijkstra_to_landmark(WEIGHTED, lm).items():
            want[(n, lm)] = d
    assert got == pytest.approx(want)
    # the detour 0->1->2 (2.0) beats the direct 0->2 (10.0)
    assert got[(0, 2)] == 2.0


def test_weighted_shortest_paths_validates(spark):
    df = spark.createDataFrame(WEIGHTED, "src long, dst long, weight double")
    with pytest.raises(ValueError):
        weighted_shortest_paths(df, [])
    neg = spark.createDataFrame([(0, 1, -1.0)],
                                "src long, dst long, weight double")
    with pytest.raises(ValueError):
        weighted_shortest_paths(neg, [1])
    # absent landmark: empty result, not an error
    assert weighted_shortest_paths(df, [999]).count() == 0
    # parallel edges: the cheapest wins
    par = spark.createDataFrame([(0, 1, 5.0), (0, 1, 2.0)],
                                "src long, dst long, weight double")
    rows = weighted_shortest_paths(par, [1]).collect()
    assert {(r["node"], r["dist"]) for r in rows} == {(1, 0.0), (0, 2.0)}


def test_weighted_shortest_paths_max_rounds_bound(spark):
    # chain 0->1->2->3 of unit weights: 2 rounds only reaches 2 edges back
    chain = [(i, i + 1, 1.0) for i in range(4)]
    df = spark.createDataFrame(chain, "src long, dst long, weight double")
    got = {r["node"]: r["dist"]
           for r in weighted_shortest_paths(df, [4], max_rounds=2).collect()}
    assert got == {4: 0.0, 3: 1.0, 2: 2.0}


def test_weighted_shortest_paths_random_differential(spark):
    rng = np.random.default_rng(37)
    for _ in range(3):
        n = int(rng.integers(6, 14))
        m = int(rng.integers(n, 4 * n))
        edges = [(int(rng.integers(0, n)), int(rng.integers(0, n)),
                  round(float(rng.uniform(0.5, 4.0)), 2))
                 for _ in range(m)]
        lms = [int(rng.integers(0, n)) for _ in range(2)]
        df = spark.createDataFrame(
            edges, "src long, dst long, weight double")
        got = {(r["node"], r["landmark"]): r["dist"]
               for r in weighted_shortest_paths(df, lms).collect()}
        want = {}
        for lm in sorted(set(lms)):
            for node, d in dijkstra_to_landmark(edges, lm).items():
                want[(node, lm)] = d
        assert got == pytest.approx(want)


def test_triangle_count_known_graph(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    got = {r["node"]: r["triangles"] for r in triangle_count(df).collect()}
    want, total = brute_triangles(EDGES)
    assert got == want
    assert sum(got.values()) == 3 * total
    assert got[10] == 0 and got[4] == 0   # island edge + tail: no triangle


def test_triangle_count_direction_and_duplicates_ignored(spark):
    # both orientations + duplicates + a self-loop of one triangle
    df = spark.createDataFrame(
        [(0, 1), (1, 0), (1, 2), (2, 0), (0, 2), (2, 2)],
        "src long, dst long")
    got = {r["node"]: r["triangles"] for r in triangle_count(df).collect()}
    assert got == {0: 1, 1: 1, 2: 1}


def test_triangle_count_random_differential(spark):
    rng = np.random.default_rng(23)
    for _ in range(3):
        n = int(rng.integers(5, 12))
        m = int(rng.integers(n, 3 * n))
        edges = [(int(rng.integers(0, n)), int(rng.integers(0, n)))
                 for _ in range(m)]
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {r["node"]: r["triangles"]
               for r in triangle_count(df).collect()}
        want, _ = brute_triangles(edges)
        assert got == want


def test_label_propagation_two_communities(spark):
    # two K4 cliques joined by one bridge edge
    k4a = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    k4b = [(a + 10, b + 10) for a, b in k4a]
    edges = k4a + k4b + [(3, 10)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["label"]
           for r in label_propagation(df, max_iter=5).collect()}
    want = python_lpa(edges, 5)
    assert got == want
    # each clique converges to one label; the two differ
    assert len({got[v] for v in range(3)}) == 1
    assert len({got[v + 11] for v in range(3)}) == 1
    assert got[0] != got[11]


def test_label_propagation_matches_python_random(spark):
    rng = np.random.default_rng(5)
    n, m = 12, 30
    edges = list({(int(rng.integers(0, n)), int(rng.integers(0, n)))
                  for _ in range(m)})
    df = spark.createDataFrame(edges, "src long, dst long")
    for iters in (1, 3):
        got = {r["node"]: r["label"]
               for r in label_propagation(df, max_iter=iters).collect()}
        assert got == python_lpa(edges, iters)


def test_label_propagation_validates(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    with pytest.raises(ValueError):
        label_propagation(df, max_iter=0)
