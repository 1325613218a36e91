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
