"""Tests for operators/communities.py — python synchronous-LPA
parity, clique-bridge golden, determinism."""

import random

import pytest


def _python_lpa(edges, n_iter=10, self_weight=0.5, weighted=False):
    """Exact replica of the deterministic SEMI-SYNCHRONOUS variant:
    md5-parity checkerboard half-steps, argmax with min-label ties,
    stop after two unchanged half-steps."""
    import hashlib
    from collections import defaultdict

    und = {}
    for e in edges:
        a, b = str(e[0]), str(e[1])
        w = float(e[2]) if weighted else 1.0
        if a == b:
            continue
        k = (min(a, b), max(a, b))
        und[k] = und.get(k, 0.0) + w
    adj = defaultdict(list)
    for (a, b), w in und.items():
        adj[a].append((b, w))
        adj[b].append((a, w))
    parity = {
        n: int(hashlib.md5(n.encode()).hexdigest()[:8], 16) % 2
        for n in adj
    }
    labels = {n: n for n in adj}
    it_run = 0
    prev_unchanged = False
    for it in range(n_iter):
        active = it % 2
        new = dict(labels)
        for n in adj:
            if parity[n] != active:
                continue
            tally = defaultdict(float)
            for m, w in adj[n]:
                tally[labels[m]] += w
            if self_weight > 0:
                tally[labels[n]] += self_weight
            new[n] = min(
                tally.items(), key=lambda kv: (-kv[1], kv[0])
            )[0]
        it_run = it + 1
        if new == labels:
            if prev_unchanged:
                break
            prev_unchanged = True
        else:
            prev_unchanged = False
        labels = new
    return labels, it_run


def test_lpa_python_parity_random(spark):
    from graphrole_spark.operators.communities import label_propagation

    rng = random.Random(5)
    edges = [
        (f"n{rng.randint(0, 30)}", f"n{rng.randint(0, 30)}")
        for _ in range(90)
    ]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {
        r["node"]: r["community"]
        for r in label_propagation(df, n_iter=8).collect()
    }
    want, _ = _python_lpa(edges, n_iter=8)
    assert got == want


def test_lpa_two_cliques_with_bridge(spark):
    import itertools

    from graphrole_spark.operators.communities import label_propagation

    c1 = [(f"a{i}", f"a{j}") for i, j in itertools.combinations(range(5), 2)]
    c2 = [(f"b{i}", f"b{j}") for i, j in itertools.combinations(range(5), 2)]
    edges = c1 + c2 + [("a0", "b0")]
    df = spark.createDataFrame(edges, "src string, dst string")
    rows = label_propagation(df, n_iter=10).collect()
    comm = {r["node"]: r["community"] for r in rows}
    a_comms = {comm[f"a{i}"] for i in range(5)}
    b_comms = {comm[f"b{i}"] for i in range(5)}
    assert len(a_comms) == 1 and len(b_comms) == 1
    assert a_comms != b_comms  # the bridge does not merge the cliques
    # python replica agrees including iteration count
    want, it = _python_lpa(edges, n_iter=10)
    assert comm == want
    assert rows[0]["n_iter_run"] == it


def test_lpa_weighted_and_determinism(spark):
    from graphrole_spark.operators.communities import label_propagation

    # x is pulled by weight toward the 'h' side despite more 'l'
    # edges (weights tie-free: equal-weight h<->h2 vs x<->h creates a
    # two-cycle the sync variant resolves only by label order)
    edges = [("x", "h", 10.0), ("x", "l1", 1.0), ("x", "l2", 1.0),
             ("h", "h2", 5.0), ("l1", "l2", 1.0)]
    df = spark.createDataFrame(edges, "src string, dst string, weight double")
    got = {
        r["node"]: r["community"]
        for r in label_propagation(df, n_iter=6, weight_col="weight").collect()
    }
    want, _ = _python_lpa(edges, n_iter=6, weighted=True)
    assert got == want
    assert got["x"] == got["h"] == got["h2"]  # one heavy-side cluster
    again = {
        r["node"]: r["community"]
        for r in label_propagation(
            df.repartition(5), n_iter=6, weight_col="weight"
        ).collect()
    }
    assert got == again
    for bad in (dict(n_iter=0), dict(self_weight=-1.0)):
        with pytest.raises(ValueError):
            label_propagation(df, **bad)
