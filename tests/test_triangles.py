"""Tests for operators/triangles.py — brute-force parity on random
graphs, goldens, simple-graph semantics."""

import itertools
import random

import pytest


def _brute(edges):
    adj = {}
    und = set()
    for a, b in edges:
        a, b = str(a), str(b)
        if a == b:
            continue
        und.add((min(a, b), max(a, b)))
    for u, v in und:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    tri = {n: 0 for n in adj}
    for u, v, w in itertools.combinations(sorted(adj), 3):
        if v in adj[u] and w in adj[u] and w in adj[v]:
            tri[u] += 1
            tri[v] += 1
            tri[w] += 1
    out = {}
    for n in adj:
        d = len(adj[n])
        cc = 2 * tri[n] / (d * (d - 1)) if d >= 2 else 0.0
        out[n] = (d, tri[n], cc)
    return out


def test_triangles_random_parity(spark):
    from graphrole_spark.operators.triangles import triangle_counts

    rng = random.Random(13)
    edges = [
        (f"n{rng.randint(0, 25)}", f"n{rng.randint(0, 25)}")
        for _ in range(150)
    ]
    # a hub connected to everyone — the orientation's stress case
    edges += [("hub", f"n{i}") for i in range(26)]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {
        r["node"]: (r["degree"], r["triangles"], r["clustering_coef"])
        for r in triangle_counts(df).collect()
    }
    want = _brute(edges)
    assert set(got) == set(want)
    for n, (d, t, cc) in want.items():
        assert got[n][0] == d, n
        assert got[n][1] == t, n
        assert got[n][2] == pytest.approx(cc, abs=1e-8), n


def test_triangles_goldens(spark):
    from graphrole_spark.operators.triangles import triangle_counts

    # K4: every node in 3 triangles, coefficient 1
    k4 = [(a, b) for a, b in itertools.combinations("abcd", 2)]
    df = spark.createDataFrame(k4, "src string, dst string")
    got = {r["node"]: r for r in triangle_counts(df).collect()}
    for n in "abcd":
        assert got[n]["triangles"] == 3
        assert got[n]["clustering_coef"] == 1.0
    # path graph: no triangles; parallel edges/self-loops/direction
    # are ignored
    path = [("a", "b"), ("b", "a"), ("b", "b"), ("b", "c"), ("b", "c")]
    got = {
        r["node"]: r
        for r in triangle_counts(
            spark.createDataFrame(path, "src string, dst string")
        ).collect()
    }
    assert all(r["triangles"] == 0 for r in got.values())
    assert got["b"]["degree"] == 2
