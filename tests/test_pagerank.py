"""Tests for operators/pagerank.py — numpy power-iteration parity
(the networkx fixpoint with uniform dangling redistribution)."""

import random

import numpy as np
import pytest
from pyspark.sql import functions as F


def _numpy_pagerank(edges, d=0.85, n_iter=20, weighted=True):
    """Dense reference: damped power iteration, weighted shares,
    uniform dangling redistribution — networkx.pagerank's fixpoint."""
    nodes = sorted({s for s, _, _ in edges} | {t for _, t, _ in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    M = np.zeros((n, n))
    for s, t, w in edges:
        M[idx[t], idx[s]] += w if weighted else 1.0
    out = M.sum(axis=0)
    dangling = out == 0
    with np.errstate(divide="ignore", invalid="ignore"):
        M = np.where(out > 0, M / out, 0.0)
    r = np.full(n, 1.0 / n)
    for _ in range(n_iter):
        r = (1 - d) / n + d * (M @ r + r[dangling].sum() / n)
    return dict(zip(nodes, r))


def _random_edges(seed=7, n_nodes=30, n_edges=80):
    rng = random.Random(seed)
    edges = []
    for _ in range(n_edges):
        s = f"n{rng.randint(0, n_nodes - 1)}"
        t = f"n{rng.randint(0, n_nodes - 1)}"
        edges.append((s, t, round(rng.uniform(0.5, 3.0), 2)))
    # a few guaranteed dangling sinks
    edges += [("n0", "sink1", 1.0), ("n1", "sink2", 2.0)]
    return edges


def test_pagerank_numpy_parity_weighted(spark):
    from graphrole_spark.operators.pagerank import pagerank

    edges = _random_edges()
    df = spark.createDataFrame(edges, "src string, dst string, weight double")
    got = {
        r["node"]: r["rank"]
        for r in pagerank(df, n_iter=20).collect()
    }
    want = _numpy_pagerank(edges, n_iter=20)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-9), v
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_unweighted_and_parallel_edges(spark):
    from graphrole_spark.operators.pagerank import pagerank

    edges = [("a", "b", 5.0), ("a", "b", 1.0), ("b", "c", 9.0),
             ("c", "a", 1.0), ("a", "c", 2.0)]
    df = spark.createDataFrame(edges, "src string, dst string, weight double")
    got = {
        r["node"]: r["rank"]
        for r in pagerank(df, n_iter=15, weight_col=None).collect()
    }
    want = _numpy_pagerank(edges, n_iter=15, weighted=False)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-9), v


def test_pagerank_tol_early_stop_and_validation(spark):
    from graphrole_spark.operators.pagerank import pagerank

    edges = [("a", "b", 1.0), ("b", "a", 1.0)]  # symmetric: converges fast
    df = spark.createDataFrame(edges, "src string, dst string, weight double")
    got = {r["node"]: r["rank"] for r in pagerank(df, n_iter=50, tol=1e-12).collect()}
    assert got["a"] == pytest.approx(0.5, abs=1e-9)
    assert got["b"] == pytest.approx(0.5, abs=1e-9)
    for bad in (dict(damping=1.0), dict(damping=0.0), dict(n_iter=0),
                dict(tol=-1.0)):
        with pytest.raises(ValueError):
            pagerank(df, **bad)


def test_pagerank_drops_nonpositive_weights(spark):
    from graphrole_spark.operators.pagerank import pagerank

    edges = [("a", "b", 1.0), ("a", "c", -5.0), ("a", "d", None),
             ("b", "a", 1.0)]
    df = spark.createDataFrame(edges, "src string, dst string, weight double")
    got = {r["node"]: r["rank"] for r in pagerank(df, n_iter=10).collect()}
    # NULL/non-positive edges are dropped BEFORE the node set is built:
    # c and d (reachable only via dropped edges) do not appear at all,
    # and the result equals PageRank on the surviving a<->b cycle
    want = _numpy_pagerank([("a", "b", 1.0), ("b", "a", 1.0)], n_iter=10)
    assert set(got) == {"a", "b"}
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-9)


def test_pagerank_features_column_shape(spark):
    from graphrole_spark.operators.pagerank import pagerank_features

    df = spark.createDataFrame(
        [("a", "b", 1.0)], "src string, dst string, weight double"
    )
    out = pagerank_features(df, n_iter=3)
    assert out.columns == ["node", "pagerank"]


def _numpy_ppr(edges, seeds, d=0.85, n_iter=20):
    """Personalized variant: teleport + dangling mass land on the
    normalized seed vector (networkx personalization semantics)."""
    nodes = sorted({s for s, _, _ in edges} | {t for _, t, _ in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    M = np.zeros((n, n))
    for s, t, w in edges:
        M[idx[t], idx[s]] += w
    out = M.sum(axis=0)
    dangling = out == 0
    with np.errstate(divide="ignore", invalid="ignore"):
        M = np.where(out > 0, M / out, 0.0)
    p0 = np.zeros(n)
    for v, w in seeds.items():
        if v in idx:
            p0[idx[v]] += w
    p0 /= p0.sum()
    r = np.full(n, 1.0 / n)
    for _ in range(n_iter):
        r = (1 - d) * p0 + d * (M @ r + r[dangling].sum() * p0)
    return dict(zip(nodes, r))


def test_personalized_pagerank_numpy_parity(spark):
    from graphrole_spark.operators.pagerank import pagerank

    edges = _random_edges(seed=15)
    df = spark.createDataFrame(edges, "src string, dst string, weight double")
    seeds = {"n0": 2.0, "n7": 1.0, "ghost": 5.0}  # ghost not in graph
    pz = spark.createDataFrame(
        list(seeds.items()), "node string, weight double"
    )
    got = {
        r["node"]: r["rank"]
        for r in pagerank(df, n_iter=15, personalize=pz).collect()
    }
    want = _numpy_ppr(edges, {"n0": 2.0, "n7": 1.0}, n_iter=15)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-9), v
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    # seeds' neighborhoods outrank the global average
    assert got["n0"] > 1.0 / len(got)
    with pytest.raises(ValueError):
        pagerank(df, personalize=spark.createDataFrame(
            [("ghost", 1.0)], "node string, weight double"
        )).collect()


def test_pagerank_warm_start_converges_fast(spark):
    from graphrole_spark.operators.pagerank import pagerank

    edges = _random_edges(seed=21, n_nodes=12, n_edges=30)
    df = spark.createDataFrame(edges, "src string, dst string, weight double")
    # converge cold to tol=1e-6 (damping 0.85 contracts ~0.85^k, so
    # the tol actually fires well inside the budget)
    cold = pagerank(df, n_iter=120, tol=1e-6)
    cold_rows = cold.collect()
    # warm start from the converged vector: the first iteration's L1
    # delta is already < tol, so it exits immediately at (essentially)
    # the same fixpoint — one extra contraction step of drift at most
    warm = pagerank(df, n_iter=120, tol=1e-6, init_ranks=cold)
    got = {r["node"]: r["rank"] for r in warm.collect()}
    for r in cold_rows:
        assert got[r["node"]] == pytest.approx(r["rank"], abs=2e-6)
    # new-node handling: a warm vector missing nodes still normalizes
    partial = cold.limit(5)
    out = pagerank(df, n_iter=5, init_ranks=partial)
    total = sum(r["rank"] for r in out.collect())
    assert total == pytest.approx(1.0, abs=1e-9)
    # explicit all-zero warm vector over the graph's own nodes: no
    # mass to normalize -> hard error (an unknown node alone is fine:
    # it's ignored and graph nodes fall back to uniform mass)
    zeros = cold.select("node", (F.col("rank") * 0).alias("rank"))
    with pytest.raises(ValueError):
        pagerank(df, init_ranks=zeros).collect()
