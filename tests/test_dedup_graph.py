"""Connected components + canonical-doc selection (functions/dedup_graph).

Parity oracle: a pure-python union-find over the same pair list — the
distributed large-star/small-star result must match it exactly,
including on adversarial shapes (long chains = worst-case diameter,
hubs = worst-case skew).
"""

import random

import pytest
from pyspark.sql import functions as F

from graphrole_spark.functions.dedup_graph import (
    connected_components,
    dedup_keep,
)


def _uf_components(pairs):
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
    # canonical: min id per component
    comp = {}
    for x in list(parent):
        root = find(x)
        comp.setdefault(root, []).append(x)
    out = {}
    for root, members in comp.items():
        m = min(members)
        for x in members:
            out[x] = m
    return out


def _assert_matches(spark, pairs):
    df = spark.createDataFrame(pairs, "doc_a bigint, doc_b bigint")
    got = {
        r["node"]: r["component"]
        for r in connected_components(df).collect()
    }
    want = _uf_components([(a, b) for a, b in pairs if a != b])
    assert got == want


def test_cc_basic_shapes(spark):
    _assert_matches(spark, [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22)])


def test_cc_long_chain(spark):
    # 120-node path: worst-case diameter for label propagation; the
    # alternating-star algorithm must still converge well under the
    # iteration guard
    _assert_matches(spark, [(i, i + 1) for i in range(120)])


def test_cc_hub_and_cliques(spark):
    pairs = [(0, i) for i in range(1, 60)]              # hub
    pairs += [(100 + i, 100 + j) for i in range(6) for j in range(i + 1, 6)]
    _assert_matches(spark, pairs)


def test_cc_random_graphs(spark):
    rng = random.Random(42)
    for trial in range(3):
        n = 80
        pairs = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(60 + 40 * trial)
        ]
        pairs = [(a, b) for a, b in pairs if a != b]
        _assert_matches(spark, pairs)


def test_cc_string_ids(spark):
    df = spark.createDataFrame(
        [("b", "c"), ("a", "b"), ("x", "y")], "doc_a string, doc_b string"
    )
    got = {r["node"]: r["component"] for r in connected_components(df).collect()}
    assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_cc_empty_and_self_pairs(spark):
    df = spark.createDataFrame([(1, 1), (None, 2)], "doc_a bigint, doc_b bigint")
    assert connected_components(df).count() == 0


def test_dedup_keep_invariants(spark):
    rng = random.Random(7)
    n = 60
    pairs = [(rng.randrange(n), rng.randrange(n)) for _ in range(45)]
    pairs = [(a, b) for a, b in pairs if a != b]
    docs = spark.createDataFrame(
        [(i, float(rng.randrange(10))) for i in range(n)],
        "doc_id bigint, q double",
    )
    pdf = spark.createDataFrame(pairs, "doc_a bigint, doc_b bigint")
    out = dedup_keep(docs, pdf, quality_col="q").toPandas()

    assert len(out) == n                                  # every doc decided
    grp = out.groupby("cluster_id")
    assert (grp["keep"].sum() == 1).all()                 # one survivor each
    assert (grp.size().values == grp["cluster_size"].first().values).all()

    # survivor is argmax quality (ties -> min doc_id)
    docs_pd = docs.toPandas().set_index("doc_id")["q"]
    for cid, g in grp:
        best = g.sort_values(["doc_id"]).assign(q=lambda d: d["doc_id"].map(docs_pd))
        best = best.sort_values(["q", "doc_id"], ascending=[False, True])
        assert g.loc[g["keep"] == 1, "doc_id"].iloc[0] == best["doc_id"].iloc[0]

    # cluster assignment matches union-find
    want = _uf_components(pairs)
    for _, row in out.iterrows():
        assert row["cluster_id"] == want.get(row["doc_id"], row["doc_id"])


def test_dedup_keep_no_quality_keeps_min_id(spark):
    docs = spark.createDataFrame([(i,) for i in range(6)], "doc_id bigint")
    pdf = spark.createDataFrame([(3, 5), (5, 4)], "doc_a bigint, doc_b bigint")
    out = dedup_keep(docs, pdf).toPandas().set_index("doc_id")
    assert out.loc[3, "keep"] == 1 and out.loc[4, "keep"] == 0
    assert out.loc[5, "cluster_id"] == 3


def test_cc_runaway_guard(spark):
    df = spark.createDataFrame([(i, i + 1) for i in range(40)],
                               "doc_a bigint, doc_b bigint")
    with pytest.raises(RuntimeError, match="converge"):
        connected_components(df, max_iterations=0)


def test_semantic_dedup_composition(spark):
    """Embedding near-dup pairs resolve to keep decisions through the
    same cluster machinery as the text dedup path."""
    import numpy as np

    from graphrole_spark.functions.similarity import embedding_near_duplicates

    rng = np.random.default_rng(3)
    base = rng.normal(size=(4, 16))
    rows = []
    vid = 0
    for b in base:
        for _ in range(3):                       # 3 near-copies per seed
            v = b + rng.normal(scale=0.01, size=16)
            rows.append((vid, (v / np.linalg.norm(v)).tolist()))
            vid += 1
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pairs = embedding_near_duplicates(corpus, threshold=0.95)
    out = dedup_keep(corpus, pairs, id_col="vec_id", src="id_a", dst="id_b").toPandas()
    assert len(out) == 12
    assert out["keep"].sum() == 4                 # one survivor per seed
    assert (out.groupby("cluster_id").size() == 3).all()


def test_cc_plan_has_no_nested_loop_join(spark):
    """The star rounds must stay equi-join shaped: no CartesianProduct /
    BroadcastNestedLoopJoin anywhere in a round's physical plan."""
    from graphrole_spark.functions.dedup_graph import _star_round, _symmetrize

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(50)], "doc_a bigint, doc_b bigint"
    )
    edges = _symmetrize(
        pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
    )
    for large in (True, False):
        plan = _star_round(edges, large=large)._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


def test_split_leakage_duckdb_parity_and_unassigned(spark):
    """functions/dedup_graph.py::split_leakage — cross-split near-dup
    audit with (unassigned) passthrough; DuckDB value parity."""
    import duckdb
    import pandas as pd

    from graphrole_spark.functions.dedup_graph import split_leakage

    pairs = pd.DataFrame(
        [(1, 2), (2, 3), (4, 5), (6, 7), (8, 99)],
        columns=["doc_id_a", "doc_id_b"],
    )
    asg = pd.DataFrame(
        [(1, "train"), (2, "train"), (3, "test"), (4, "train"),
         (5, "val"), (6, "test"), (7, "test"), (8, "train")],
        columns=["doc_id", "split"],
    )
    got = split_leakage(
        spark.createDataFrame(pairs), spark.createDataFrame(asg)
    ).toPandas()
    con = duckdb.connect()
    con.register("p", pairs)
    con.register("a", asg)
    oracle = con.execute("""
        WITH j AS (
          SELECT coalesce(sa.split, '(unassigned)') AS s1,
                 coalesce(sb.split, '(unassigned)') AS s2
          FROM p
          LEFT JOIN a sa ON p.doc_id_a = sa.doc_id
          LEFT JOIN a sb ON p.doc_id_b = sb.doc_id)
        SELECT least(s1, s2) AS split_a, greatest(s1, s2) AS split_b,
               CAST(count(*) AS BIGINT) AS n_pairs,
               CAST(least(s1, s2) <> greatest(s1, s2) AS INT) AS leaking
        FROM j GROUP BY 1, 2, 4 ORDER BY 1, 2
    """).df()
    for c in ["split_a", "split_b", "n_pairs", "leaking"]:
        assert got[c].tolist() == oracle[c].tolist(), c
    # the known layout: 1-2 within train, 2-3 leaks, 4-5 leaks,
    # 6-7 within test, 8-99 hits (unassigned)
    by = {(r["split_a"], r["split_b"]): r["n_pairs"]
          for _, r in got.iterrows()}
    assert by[("train", "train")] == 1
    assert by[("test", "train")] == 1
    assert by[("train", "val")] == 1
    assert by[("(unassigned)", "train")] == 1
    leak_total = got.loc[got["leaking"] == 1, "n_pairs"].sum()
    assert leak_total == 3  # 2-3, 4-5, and the unassigned pair
