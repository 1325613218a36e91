"""k-core decomposition: networkx exact parity, handcrafted goldens,
subgraph derivation, and the per-iteration stats hook."""

import pytest
from pyspark.sql import functions as F

from graphrole_spark.operators.kcore import core_numbers, kcore_subgraph


def _cores(spark, edge_list):
    df = spark.createDataFrame(edge_list, "src string, dst string")
    return {
        r["node"]: r["core_number"] for r in core_numbers(df).collect()
    }


def test_kcore_handcrafted_golden(spark):
    """Triangle + tail: triangle nodes are 2-core, the tail is 1-core."""
    got = _cores(spark, [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")])
    assert got == {"a": 2, "b": 2, "c": 2, "d": 1}


def test_kcore_clique_with_periphery(spark):
    """K5 is a 4-core even when every clique node also has pendant
    spokes (degree alone would say 5+; coreness must say 4)."""
    clique = [
        (f"k{i}", f"k{j}") for i in range(5) for j in range(i + 1, 5)
    ]
    spokes = [(f"k{i}", f"p{i}{t}") for i in range(5) for t in range(3)]
    got = _cores(spark, clique + spokes)
    for i in range(5):
        assert got[f"k{i}"] == 4
    for i in range(5):
        for t in range(3):
            assert got[f"p{i}{t}"] == 1


def test_kcore_networkx_parity_random(spark):
    """Exact equality with networkx.core_number on a seeded random
    graph with parallel edges, self-loops and both directions mixed in
    (all must be ignored)."""
    import random

    import networkx as nx

    rng = random.Random(73)
    edges = []
    for _ in range(400):
        u, v = rng.randrange(60), rng.randrange(60)
        edges.append((f"n{u}", f"n{v}"))  # self-loops possible
    edges += edges[:50]  # parallel duplicates
    edges += [(b, a) for a, b in edges[50:90]]  # reversed duplicates

    g = nx.Graph()
    g.add_edges_from((a, b) for a, b in edges if a != b)
    want = nx.core_number(g)
    got = _cores(spark, edges)
    assert got == dict(want)


def test_kcore_chain_is_one_core(spark):
    got = _cores(spark, [(f"c{i}", f"c{i+1}") for i in range(20)])
    assert set(got.values()) == {1}


def test_kcore_subgraph(spark):
    """k=2 subgraph of triangle+tail keeps exactly the triangle."""
    df = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")],
        "src string, dst string",
    )
    got = sorted(
        (r["u"], r["v"]) for r in kcore_subgraph(df, k=2).collect()
    )
    assert got == [("a", "b"), ("a", "c"), ("b", "c")]
    # k above the degeneracy -> empty
    assert kcore_subgraph(df, k=3).count() == 0
    with pytest.raises(ValueError, match=">= 1"):
        kcore_subgraph(df, k=0)


def test_kcore_iter_stats_and_early_stop(spark):
    """The stats hook records monotone convergence and the loop stops
    well before max_iter on a small graph."""
    df = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("d", "e")],
        "src string, dst string",
    )
    stats: list = []
    core_numbers(df, max_iter=50, iter_stats=stats).collect()
    assert 1 <= len(stats) < 50
    assert stats[-1]["changed"] is False  # converged round recorded
    assert all(s["sec"] >= 0 for s in stats)


def test_kcore_deterministic(spark):
    import random

    rng = random.Random(5)
    edges = [
        (f"n{rng.randrange(40)}", f"n{rng.randrange(40)}")
        for _ in range(150)
    ]
    a = _cores(spark, edges)
    b = _cores(spark, edges)
    assert a == b


def test_kcore_nonconvergence_warns_and_strict_raises(spark):
    """ADVICE r4 (high): a path graph needs ~diameter/2 rounds — with
    max_iter too small the loop exits before the fixpoint and the
    values are only an upper bound. That must WARN (or raise with
    strict=True), never return silently; with enough rounds the same
    graph converges to all-ones with no warning."""
    import warnings

    import pytest

    from graphrole_spark.operators.kcore import core_numbers

    path = spark.createDataFrame(
        [(str(i), str(i + 1)) for i in range(60)], "src string, dst string"
    )
    with warnings.catch_warnings(record=True) as seen:
        warnings.simplefilter("always")
        core_numbers(path, max_iter=3).count()
    assert any(
        issubclass(w.category, RuntimeWarning)
        and "UPPER BOUND" in str(w.message)
        for w in seen
    )

    with pytest.raises(RuntimeError, match="fixpoint"):
        core_numbers(path, max_iter=3, strict=True).count()

    with warnings.catch_warnings(record=True) as seen:
        warnings.simplefilter("always")
        out = core_numbers(path, max_iter=60)
        vals = {r.core_number for r in out.collect()}
    assert vals == {1}
    assert not any(issubclass(w.category, RuntimeWarning) for w in seen)
