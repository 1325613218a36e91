"""Distributed spherical k-means (functions/clustering.py): exact
python-oracle parity on the whole fit loop (same deterministic md5
init, same Lloyd updates), determinism, degenerate inputs, and the
two integration points it upgrades — semantic_dedup(cells="kmeans")
and ivf_topk(train="full")."""

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F


def _emb(spark, mat, ids=None):
    ids = ids if ids is not None else range(len(mat))
    return spark.createDataFrame(
        [(int(i), [float(x) for x in row]) for i, row in zip(ids, mat)],
        "vec_id long, embedding array<float>",
    )


def _normalize(M):
    n = np.linalg.norm(M, axis=1)
    return M / np.where(n > 0, n, 1.0)[:, None]


def _oracle_fit(ids, M, k, max_iters=12, tol=1e-6):
    """Pure-python/numpy replica of kmeans_fit: md5(id)-min init,
    spherical Lloyd updates over normalized vectors, empty cells keep
    their centroid, early stop on max centroid L2 shift < tol."""
    M = np.asarray(M, dtype=np.float64)
    order = np.argsort(
        [hashlib.md5(str(int(i)).encode()).hexdigest() for i in ids],
        kind="stable",
    )
    cent = _normalize(M[order[: min(k, len(M))]].copy())
    Vn = _normalize(M)
    for _ in range(max_iters):
        sims = Vn @ cent.T
        assign = np.argmax(sims, axis=1)
        new = cent.copy()
        for c in range(len(cent)):
            members = Vn[assign == c]
            if len(members):
                new[c] = _normalize(members.mean(axis=0)[None, :])[0]
        shift = float(np.max(np.linalg.norm(new - cent, axis=1)))
        cent = new
        if shift < tol:
            break
    return cent, np.argmax(Vn @ cent.T, axis=1)


def test_kmeans_fit_matches_python_oracle(spark):
    from graphrole_spark.functions.clustering import kmeans_assign, kmeans_fit

    rng = np.random.default_rng(7)
    # three well-separated direction clusters + noise
    M = np.concatenate(
        [
            rng.normal(loc=c, scale=0.15, size=(40, 6))
            for c in ([3, 0, 0, 0, 0, 0], [0, 3, 0, 0, 0, 0], [0, 0, 3, 0, 0, 0])
        ]
    ).astype(np.float32)  # match array<float> storage so the oracle sees
    # exactly the values Spark reads back
    ids = np.arange(len(M))
    df = _emb(spark, M, ids).repartition(7)

    model = kmeans_fit(df, n_cells=3, max_iters=12)
    cent_o, assign_o = _oracle_fit(ids, M, 3)

    assert model.centroids.shape == cent_o.shape
    assert np.allclose(model.centroids, cent_o, atol=1e-9)
    got = {
        r.vec_id: r.cell
        for r in kmeans_assign(df, model).select("vec_id", "cell").collect()
    }
    assert got == {int(i): int(a) for i, a in zip(ids, assign_o)}
    assert model.n_vectors == len(M)
    assert 0.9 < model.mean_sim <= 1.0  # tight direction clusters


def test_kmeans_fit_deterministic_and_early_stops(spark):
    from graphrole_spark.functions.clustering import kmeans_fit

    rng = np.random.default_rng(3)
    M = rng.normal(size=(50, 5))
    df = _emb(spark, M)
    m1 = kmeans_fit(df, n_cells=4)
    m2 = kmeans_fit(df.repartition(11), n_cells=4)
    # partitioning must not change the result beyond float-sum noise
    assert np.allclose(m1.centroids, m2.centroids, atol=1e-9)
    assert m1.iters_run == m2.iters_run <= 12


def test_kmeans_fit_clamps_k_and_rejects_empty(spark):
    from graphrole_spark.functions.clustering import kmeans_fit

    small = _emb(spark, np.eye(3))
    m = kmeans_fit(small, n_cells=10)
    assert m.n_cells == 3
    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError):
        kmeans_fit(empty, n_cells=2)


def test_semantic_dedup_kmeans_cells_matches_numpy(spark):
    """kmeans-cell SemDeDup == numpy replica (same cells from the fitted
    model, same lower-id in-cell drop rule); the planted duplicate that
    straddles a sign hyperplane is caught by kmeans cells."""
    from graphrole_spark.functions.clustering import kmeans_fit
    from graphrole_spark.functions.similarity import semantic_dedup

    rng = np.random.default_rng(19)
    M = rng.normal(size=(60, 6)).astype(np.float32)
    # duplicate pair straddling the dim-0 sign boundary: sign buckets
    # split them, a direction-aware clustering must not
    M[40] = np.array([0.01, 2.0, 1.0, 0.5, 0.25, 0.125], dtype=np.float32)
    M[41] = np.array([-0.01, 2.0, 1.0, 0.5, 0.25, 0.125], dtype=np.float32)
    df = _emb(spark, M)
    tau = 0.95

    out = semantic_dedup(df, tau, cells="kmeans", n_cells=4)
    got = {r.vec_id: (r.bucket, r.keep) for r in out.collect()}

    model = kmeans_fit(df, n_cells=4)
    Vn = _normalize(np.asarray(M, dtype=np.float64))
    cell = np.argmax(Vn @ model.centroids.T, axis=1)
    cos = Vn @ Vn.T
    for j in range(len(M)):
        dup = any(cell[i] == cell[j] and cos[i, j] >= tau for i in range(j))
        assert got[j] == (cell[j], not dup), j
    # the planted straddling pair resolves: 41 dropped as 40's duplicate
    assert got[40][1] and not got[41][1]
    # and sign cells would have missed it (documenting the upgrade)
    sign = ((M[:, :4] >= 0) @ (2 ** np.arange(4))).astype(int)
    assert sign[40] != sign[41]


def test_ivf_topk_full_train_recall(spark):
    from graphrole_spark.functions.similarity import brute_force_topk, ivf_topk

    rng = np.random.default_rng(5)
    M = rng.normal(size=(200, 8))
    corpus = _emb(spark, M)
    queries = _emb(spark, M[:10])

    exact = brute_force_topk(corpus, queries, k=5)
    approx = ivf_topk(corpus, queries, k=5, n_cells=8, n_probe=4, train="full")
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    a = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    assert len(a & e) / len(e) >= 0.9

    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert ivf_topk(empty, queries, k=5, train="full").count() == 0


def test_diversify_corpus_budgets_dedup_and_determinism(spark):
    """D4 composition: planted semantic duplicates are dropped before
    budgeting; each cell's kept tokens respect the per-cell budget with
    <= one-doc overshoot; deterministic across partitionings."""
    from graphrole_spark.functions.corpus import diversify_corpus

    rng = np.random.default_rng(23)
    # three direction clusters, 30 docs each; doc i has ~20 tokens
    M = np.concatenate(
        [
            rng.normal(loc=c, scale=1.0, size=(30, 6))
            for c in ([4, 0, 0, 0, 0, 0], [0, 4, 0, 0, 0, 0], [0, 0, 4, 0, 0, 0])
        ]
    ).astype(np.float32)
    M[10] = M[5] * 1.5  # planted in-cluster semantic duplicate
    emb = _emb(spark, M).withColumnRenamed("vec_id", "doc_id")
    docs = spark.createDataFrame(
        [(i, " ".join(f"w{i}_{j}" for j in range(20))) for i in range(len(M))],
        "doc_id long, text string",
    )

    out = diversify_corpus(
        docs, emb, total_tokens=300, n_cells=3, dedup_threshold=0.95,
        id_col="doc_id",
    )
    rows = {r.doc_id: r for r in out.collect()}
    assert len(rows) == len(M)
    assert rows[10].dup_drop and not rows[10].keep  # dup dropped pre-budget
    assert not rows[5].dup_drop
    # per-cell budget: 100 tokens = 5 docs, boundary doc kept -> <= 6
    import collections

    kept = collections.Counter(r.cell for r in rows.values() if r.keep)
    assert set(kept) == {0, 1, 2}
    for c, n in kept.items():
        assert 5 <= n <= 6, (c, n)
        tok = sum(r.n_tokens for r in rows.values() if r.keep and r.cell == c)
        assert tok < 100 + 20  # budget + one doc

    out2 = diversify_corpus(
        docs.repartition(13), emb.repartition(7), total_tokens=300,
        n_cells=3, dedup_threshold=0.95, id_col="doc_id",
    )
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, out2.collect()))


def test_diversify_corpus_no_dedup_and_missing_embeddings(spark):
    from graphrole_spark.functions.corpus import diversify_corpus

    rng = np.random.default_rng(31)
    M = rng.normal(size=(20, 4)).astype(np.float32)
    emb = _emb(spark, M).withColumnRenamed("vec_id", "doc_id")
    # doc 99 has no embedding -> dropped (inner join, documented)
    docs = spark.createDataFrame(
        [(i, "a b c") for i in list(range(20)) + [99]],
        "doc_id long, text string",
    )
    out = diversify_corpus(docs, emb, total_tokens=1000, n_cells=4)
    ids = {r.doc_id for r in out.collect()}
    assert ids == set(range(20))
    got = out.collect()
    assert all(not r.dup_drop for r in got)  # dedup off
    assert all(r.keep for r in got)  # budget ample -> everything kept


def test_diversify_corpus_custom_id_col(spark):
    """id_col threads through BOTH tables (review finding: the documents
    side was hardcoded to doc_id)."""
    from graphrole_spark.functions.corpus import diversify_corpus

    rng = np.random.default_rng(43)
    M = rng.normal(size=(12, 4)).astype(np.float32)
    emb = _emb(spark, M)  # keyed vec_id
    docs = spark.createDataFrame(
        [(i, "x y z") for i in range(12)], "vec_id long, text string"
    )
    out = diversify_corpus(
        docs, emb, total_tokens=1000, n_cells=2, id_col="vec_id"
    )
    assert out.count() == 12 and all(r.keep for r in out.collect())


def test_kmeans_fit_parity_randomized_configs(spark):
    """Whole-fit parity vs the python oracle across random shapes,
    cluster counts and id spaces — the broadened version of the single
    fixture above (dims, k, n, and non-contiguous ids all vary)."""
    from graphrole_spark.functions.clustering import kmeans_assign, kmeans_fit

    for seed, n, d, k in [(1, 25, 3, 2), (2, 60, 5, 4), (3, 40, 8, 7)]:
        rng = np.random.default_rng(seed)
        M = rng.normal(size=(n, d)).astype(np.float32)
        ids = np.arange(n) * 13 + 7  # non-contiguous ids
        df = _emb(spark, M, ids).repartition(5)
        model = kmeans_fit(df, n_cells=k, max_iters=8)
        cent_o, assign_o = _oracle_fit(ids, M, k, max_iters=8)
        assert np.allclose(model.centroids, cent_o, atol=1e-9), (seed, k)
        got = {
            r.vec_id: r.cell
            for r in kmeans_assign(df, model).select("vec_id", "cell").collect()
        }
        assert got == {int(i): int(a) for i, a in zip(ids, assign_o)}, seed
