"""Text/dedup/similarity/multimodal operator tests."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from graphrole_spark.functions.multimodal import (
    extract_media_features,
    frame_sample_plan,
    synthesize_media,
)
from graphrole_spark.functions.similarity import brute_force_topk, lsh_topk
from graphrole_spark.functions.text import (
    exact_duplicates,
    minhash_near_duplicates,
    rolling_fingerprint,
    simhash_near_duplicates,
    simhash64,
    token_count,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),          # exact dup of 1
        (3, "the quick brown fox leaps over the lazy dog"),          # near dup of 1
        (4, "completely different content about spark engines"),
        (5, "der schnelle braune fuchs springt und springt"),
        (6, "el rapido zorro marron salta sobre el perro"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_duplicates(docs):
    out = exact_duplicates(docs).toPandas()
    dup = out[out.n_docs > 1]
    assert len(dup) == 1
    assert dup.iloc[0].canonical_doc == 1
    assert dup.iloc[0].n_docs == 2


def test_minhash_near_duplicates(docs):
    pairs = minhash_near_duplicates(
        docs, jaccard_threshold=0.3, shingle_n=2
    ).toPandas()
    got = set(map(tuple, pairs[["doc_a", "doc_b"]].values))
    assert (1, 2) in got  # exact dup always collides
    assert (1, 3) in got or (2, 3) in got  # near dup found
    assert not any(4 in p for p in got)


def test_simhash_frame_matches_column_expression(docs):
    """The codegen explode+agg form computes the exact same 64-bit value
    as the HOF fold column expression."""
    from graphrole_spark.functions.text import simhash_frame

    via_col = (
        docs.select("doc_id", simhash64(F.col("text")).alias("sim"))
        .toPandas().set_index("doc_id")["sim"]
    )
    via_frame = simhash_frame(docs).toPandas().set_index("doc_id")["sim"]
    assert via_col.sort_index().equals(via_frame.sort_index())


def test_simhash_identical_and_near(docs, spark):
    h = docs.select("doc_id", simhash64(F.col("text")).alias("h")).toPandas()
    h = h.set_index("doc_id")["h"]
    assert h[1] == h[2]
    pairs = simhash_near_duplicates(docs, max_hamming=8).toPandas()
    got = set(map(tuple, pairs[["doc_a", "doc_b"]].values))
    assert (1, 2) in got


def test_token_count_and_fingerprint(docs):
    out = docs.select(
        "doc_id",
        token_count(F.col("text")).alias("n"),
        rolling_fingerprint(F.col("text")).alias("fp"),
    ).toPandas()
    assert out.set_index("doc_id").loc[1, "n"] == 9
    # identical docs → identical fingerprints
    assert out.set_index("doc_id").loc[1, "fp"] == out.set_index("doc_id").loc[2, "fp"]


def _clustered_embeddings(spark):
    rng = np.random.RandomState(5)
    base = rng.randn(40, 16).astype(np.float32)
    # make clusters: rows 0..19 near row 0, rows 20..39 random
    base[1:20] = base[0] + 0.05 * rng.randn(19, 16).astype(np.float32)
    pdf = pd.DataFrame(
        {"vec_id": range(40), "embedding": [list(map(float, v)) for v in base]}
    )
    return spark.createDataFrame(pdf, "vec_id long, embedding array<float>")


def test_lsh_recall_vs_brute_force(spark):
    emb = _clustered_embeddings(spark)
    queries = emb.where(F.col("vec_id") == 0)
    exact = brute_force_topk(emb, queries, k=5).toPandas()
    approx = lsh_topk(emb, queries, k=5, n_planes=6, n_tables=6).toPandas()
    inter = set(exact.neighbor_id) & set(approx.neighbor_id)
    assert len(inter) >= 3  # ≥60% recall on a clustered fixture


def test_ivf_recall_vs_brute_force(spark):
    from graphrole_spark.functions.similarity import ivf_topk

    emb = _clustered_embeddings(spark)
    queries = emb.where(F.col("vec_id") == 0)
    exact = brute_force_topk(emb, queries, k=5).toPandas()
    approx = ivf_topk(emb, queries, k=5, n_cells=6, n_probe=2).toPandas()
    inter = set(exact.neighbor_id) & set(approx.neighbor_id)
    # the query's own cluster is one IVF cell: probing it finds the block
    assert len(inter) >= 4
    # determinism: same result on a rerun (fixed seed end to end)
    again = ivf_topk(emb, queries, k=5, n_cells=6, n_probe=2).toPandas()
    assert approx.sort_values("rank").neighbor_id.tolist() == \
        again.sort_values("rank").neighbor_id.tolist()


def test_embedding_near_duplicates(spark):
    from graphrole_spark.functions.similarity import embedding_near_duplicates

    rng = np.random.RandomState(9)
    base = rng.randn(30, 8)
    base[7] = base[3] + 0.01 * rng.randn(8)   # near-dup pair (3, 7)
    base[20] = base[3] * 2.0                  # exact direction dup (3, 20)
    pdf = pd.DataFrame(
        {"vec_id": range(30), "embedding": [list(map(float, v)) for v in base]}
    )
    emb = spark.createDataFrame(pdf, "vec_id long, embedding array<float>")
    pairs = embedding_near_duplicates(emb, threshold=0.95).toPandas()
    got = set(map(tuple, pairs[["id_a", "id_b"]].values))
    assert (3, 7) in got and (3, 20) in got and (7, 20) in got
    assert all(a < b for a, b in got)
    assert (pairs.cosine_sim >= 0.95).all()


def test_media_features_and_frames(spark):
    media = synthesize_media(spark, 30)
    feats = extract_media_features(media).toPandas()
    assert len(feats) == 30
    assert all(len(v) == 16 for v in feats.features)
    # deterministic across runs
    feats2 = extract_media_features(synthesize_media(spark, 30)).toPandas()
    a = [list(v) for v in feats.sort_values("media_id").features]
    b = [list(v) for v in feats2.sort_values("media_id").features]
    assert a == b

    frames = frame_sample_plan(media, every_ms=5000)
    n_videos = media.where(F.col("kind") == "video").count()
    if n_videos:
        assert frames.count() >= n_videos

    with pytest.raises(Exception):  # strict mode surfaces NotImplementedError
        extract_media_features(media, decode_mode="strict").collect()
