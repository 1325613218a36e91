"""Tests for operators/linkpred.py — brute-force score parity,
negative-sampling contracts, dense-index correctness."""

import itertools
import math
import random

import pytest


def _graph(seed=7, n=20, m=60):
    rng = random.Random(seed)
    edges = set()
    while len(edges) < m:
        a, b = rng.sample(range(n), 2)
        edges.add((f"n{min(a,b)}", f"n{max(a,b)}"))
    return sorted(edges)


def _brute_scores(edges, min_common=1):
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    out = {}
    for a, b in itertools.combinations(sorted(adj), 2):
        if b in adj[a]:
            continue
        common = adj[a] & adj[b]
        if len(common) < min_common:
            continue
        aa = sum(1.0 / math.log(len(adj[z])) for z in common)
        jac = len(common) / len(adj[a] | adj[b])
        out[(a, b)] = (len(common), jac, aa)
    return out


def test_link_scores_brute_force_parity(spark):
    from graphrole_spark.operators.linkpred import link_scores

    edges = _graph()
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {
        (r["node_a"], r["node_b"]): (
            r["common_neighbors"], r["jaccard"], r["adamic_adar"]
        )
        for r in link_scores(df).collect()
    }
    want = _brute_scores(edges)
    assert set(got) == set(want)
    for k, (cn, jac, aa) in want.items():
        assert got[k][0] == cn, k
        assert got[k][1] == pytest.approx(jac, abs=1e-8), k
        assert got[k][2] == pytest.approx(aa, abs=1e-8), k


def test_link_scores_hub_cap_and_validation(spark):
    from graphrole_spark.operators.linkpred import link_scores

    # star: hub h connects to 10 leaves; with the hub allowed, every
    # leaf pair has 1 common neighbor; with max_degree below 10, the
    # hub can't serve as a wedge center -> no pairs at all
    edges = [("h", f"l{i}") for i in range(10)]
    df = spark.createDataFrame(edges, "src string, dst string")
    allowed = link_scores(df).collect()
    assert len(allowed) == 45  # C(10,2) leaf pairs
    capped = link_scores(df, max_degree=5).collect()
    assert capped == []
    for bad in (dict(max_degree=1), dict(min_common=0)):
        with pytest.raises(ValueError):
            link_scores(df, **bad)


def test_negative_edges_contracts(spark):
    from graphrole_spark.operators.linkpred import negative_edges

    edges = _graph(seed=3)
    df = spark.createDataFrame(edges, "src string, dst string")
    neg = negative_edges(df, k_per_node=6).collect()
    true = set(edges)
    nodes = {x for e in edges for x in e}
    assert len(neg) > 0
    for r in neg:
        a, b = r["node_a"], r["node_b"]
        assert a < b and a != b
        assert (a, b) not in true  # never a real edge
        assert a in nodes and b in nodes
        assert r["label"] == 0
    # deterministic across partitionings
    again = negative_edges(df.repartition(7), k_per_node=6).collect()
    assert sorted(map(tuple, neg)) == sorted(map(tuple, again))
    with pytest.raises(ValueError):
        negative_edges(df, k_per_node=0)


def test_dense_index_bucketed(spark):
    from graphrole_spark.operators.linkpred import _dense_index

    nodes = spark.createDataFrame(
        [(f"x{i:03d}",) for i in range(257)], "node string"
    )
    idx = _dense_index(nodes, buckets=16).collect()
    ids = sorted(r["__i"] for r in idx)
    assert ids == list(range(257))  # dense, 0-based, no gaps/dupes
