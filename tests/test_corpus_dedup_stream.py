"""Streaming ingestion dedup (streaming/corpus_dedup.py): new batches
are checked against the accumulated corpus, first arrival wins."""

import os

from pyspark.sql import functions as F

from graphrole_spark.streaming.corpus_dedup import (
    apply_dedup_delta,
    ingest_available_now,
)

BASE = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
    "kilo lima mike november oscar papa quebec romeo sierra tango"
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_apply_dedup_delta_decisions(spark, tmp_path):
    store = str(tmp_path / "store")
    b1 = _docs(spark, [(0, BASE), (3, "completely different text about spark engines here")])
    d1 = {r["doc_id"]: r["status"] for r in apply_dedup_delta(spark, b1, store, batch_id=0).collect()}
    assert d1 == {0: "new", 3: "new"}

    b2 = _docs(
        spark,
        [
            (1, BASE.replace("echo", "exho")),   # near dup of 0
            (2, BASE),                            # exact dup of 0
            (4, "unique fourth document with its own fresh content words"),
        ],
    )
    d2 = {r["doc_id"]: r["status"] for r in apply_dedup_delta(spark, b2, store, batch_id=1).collect()}
    assert d2 == {1: "near_dup", 2: "exact_dup", 4: "new"}

    # only admitted docs entered the store
    content = spark.read.parquet(os.path.join(store, "content"))
    assert sorted(r["doc_id"] for r in content.collect()) == [0, 3, 4]


def test_apply_dedup_delta_intra_batch_and_replay(spark, tmp_path):
    store = str(tmp_path / "store")
    batch = _docs(
        spark,
        [
            (10, BASE),
            (11, BASE),                           # intra-batch exact dup
            (12, BASE + " zulu"),                 # intra-batch near dup (J≈0.95)
            (13, "some other standalone document body entirely different"),
        ],
    )
    d = {r["doc_id"]: r["status"] for r in apply_dedup_delta(spark, batch, store, batch_id=0).collect()}
    assert d == {10: "new", 11: "exact_dup", 12: "near_dup", 13: "new"}

    # at-least-once replay of the SAME batch: decisions identical (the
    # store's own partial rows are excluded from probes) and the store
    # does not grow
    before = spark.read.parquet(os.path.join(store, "content")).count()
    d2 = {r["doc_id"]: r["status"] for r in apply_dedup_delta(spark, batch, store, batch_id=0).collect()}
    assert d2 == d
    after = spark.read.parquet(os.path.join(store, "content")).count()
    assert after == before


def test_ingest_available_now_stream(spark, tmp_path):
    src = str(tmp_path / "src")
    store = str(tmp_path / "store")
    # two source files -> two micro-batches (maxFilesPerTrigger=1)
    _docs(spark, [(0, BASE), (3, "first unique other doc right here okay")]).coalesce(
        1
    ).write.mode("append").parquet(src)
    _docs(
        spark, [(1, BASE), (4, "second unique other doc over there fine")]
    ).coalesce(1).write.mode("append").parquet(src)

    n = ingest_available_now(
        spark, src, store, checkpoint_dir=str(tmp_path / "ckpt")
    )
    assert n == 2
    decisions = spark.read.parquet(os.path.join(store, "decisions"))
    by_doc = {r["doc_id"]: r["status"] for r in decisions.collect()}
    assert by_doc[0] == "new" and by_doc[3] == "new" and by_doc[4] == "new"
    assert by_doc[1] == "exact_dup"              # arrived in the later batch
    admitted = spark.read.parquet(os.path.join(store, "content"))
    assert admitted.count() == 3


def test_store_param_mismatch_raises(spark, tmp_path):
    import pytest

    store = str(tmp_path / "store")
    apply_dedup_delta(spark, _docs(spark, [(0, BASE)]), store, batch_id=0)
    with pytest.raises(ValueError, match="incomparable"):
        apply_dedup_delta(
            spark, _docs(spark, [(1, BASE)]), store,
            jaccard_threshold=0.5, batch_id=1,
        )


def test_cross_batch_redelivery_is_exact_dup(spark, tmp_path):
    """A doc re-delivered in a LATER batch (same id, same content) is an
    exact_dup — batch-keyed replay exclusion must not hide it."""
    store = str(tmp_path / "store")
    apply_dedup_delta(spark, _docs(spark, [(0, BASE)]), store, batch_id=0)
    d = {
        r["doc_id"]: r["status"]
        for r in apply_dedup_delta(
            spark, _docs(spark, [(0, BASE)]), store, batch_id=5
        ).collect()
    }
    assert d == {0: "exact_dup"}


def test_store_hash_scheme_version_guard(spark, tmp_path):
    """ADVICE r4 (medium): a store built under an older shingle-hash
    scheme must fail LOUDLY — its persisted shh/band hashes can never
    match new-batch hashes, so proceeding would silently admit every
    near-duplicate. The scheme version is stamped into _params.json; a
    store whose params lack (or mismatch) it is rejected."""
    import json
    import os

    import pytest

    from graphrole_spark.functions.text import SHINGLE_HASH_SCHEME
    from graphrole_spark.streaming.corpus_dedup import apply_dedup_delta

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta")], "doc_id long, text string"
    )
    store = str(tmp_path / "store")
    apply_dedup_delta(spark, docs, store, batch_id=0)

    params_path = os.path.join(store, "_params.json")
    with open(params_path) as fh:
        params = json.load(fh)
    assert params["shingle_hash_scheme"] == SHINGLE_HASH_SCHEME

    # simulate a store written under the r3 flat-hash scheme
    params["shingle_hash_scheme"] = "flat-xxhash64-v1"
    with open(params_path, "w") as fh:
        json.dump(params, fh)
    with pytest.raises(ValueError, match="incomparable"):
        apply_dedup_delta(spark, docs, store, batch_id=1)

    # and a pre-versioning store (field absent entirely) also fails
    del params["shingle_hash_scheme"]
    with open(params_path, "w") as fh:
        json.dump(params, fh)
    with pytest.raises(ValueError, match="incomparable"):
        apply_dedup_delta(spark, docs, store, batch_id=1)
