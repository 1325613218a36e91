"""Streaming embedding ingestion dedup (streaming/vector_ingest.py)."""

import os

import numpy as np

from graphrole_spark.streaming.vector_ingest import apply_vector_delta


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _mk(rng, base=None, jitter=0.01, dim=16):
    v = (base if base is not None else rng.normal(size=dim)) + (
        rng.normal(scale=jitter, size=dim) if base is not None else 0.0
    )
    return (v / np.linalg.norm(v)).tolist()


def test_vector_ingest_decisions_and_replay(spark, tmp_path):
    rng = np.random.default_rng(11)
    store = str(tmp_path / "vstore")
    a = np.asarray(_mk(rng))
    b = np.asarray(_mk(rng))

    d1 = {
        r["vec_id"]: r["status"]
        for r in apply_vector_delta(
            spark, _vecs(spark, [(0, a.tolist()), (3, b.tolist())]), store,
            batch_id=0,
        ).collect()
    }
    assert d1 == {0: "new", 3: "new"}

    batch2 = _vecs(
        spark,
        [
            (1, _mk(rng, base=a)),          # near dup of stored 0
            (4, _mk(rng)),                   # fresh direction
            (5, _mk(rng, base=None)),        # fresh direction
        ],
    )
    d2 = {
        r["vec_id"]: r["status"]
        for r in apply_vector_delta(spark, batch2, store, batch_id=1).collect()
    }
    assert d2[1] == "near_dup" and d2[4] == "new" and d2[5] == "new"

    # replay of batch 2 (same batch_id): identical decisions, store stable
    before = spark.read.parquet(os.path.join(store, "vectors")).count()
    d2r = {
        r["vec_id"]: r["status"]
        for r in apply_vector_delta(spark, batch2, store, batch_id=1).collect()
    }
    assert d2r == d2
    assert spark.read.parquet(os.path.join(store, "vectors")).count() == before

    # only admitted vectors are stored
    stored = sorted(
        r["vec_id"]
        for r in spark.read.parquet(os.path.join(store, "vectors")).collect()
    )
    assert stored == [0, 3, 4, 5]


def test_vector_ingest_intra_batch_cluster(spark, tmp_path):
    rng = np.random.default_rng(7)
    store = str(tmp_path / "vstore")
    base = np.asarray(_mk(rng))
    batch = _vecs(
        spark,
        [
            (10, _mk(rng, base=base, jitter=0.005)),
            (11, _mk(rng, base=base, jitter=0.005)),   # near dup of 10
            (12, _mk(rng)),                             # unrelated
        ],
    )
    d = {
        r["vec_id"]: r["status"]
        for r in apply_vector_delta(spark, batch, store, batch_id=0).collect()
    }
    assert d == {10: "new", 11: "near_dup", 12: "new"}


def test_vector_ingest_param_mismatch(spark, tmp_path):
    import pytest

    rng = np.random.default_rng(3)
    store = str(tmp_path / "vstore")
    apply_vector_delta(spark, _vecs(spark, [(0, _mk(rng))]), store, batch_id=0)
    with pytest.raises(ValueError, match="incomparable"):
        apply_vector_delta(
            spark, _vecs(spark, [(1, _mk(rng))]), store,
            threshold=0.8, batch_id=1,
        )
