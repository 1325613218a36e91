"""Training-shard sink: deterministic assignment, manifest integrity,
torn-copy detection (sources/shards.py)."""

import glob
import json
import os

import pytest
from pyspark.sql import functions as F

from graphrole_spark.sources.shards import read_training_shards, write_training_shards


@pytest.fixture(scope="module")
def docs(spark):
    return (
        spark.range(0, 200)
        .select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("doc "), F.col("id").cast("string")).alias("text"),
            (F.col("id") % 7 + 1).cast("long").alias("n_tokens"),
        )
        .persist()
    )


def test_write_read_roundtrip(spark, docs, tmp_path):
    path = str(tmp_path / "shards")
    manifest = write_training_shards(
        docs, path, n_shards=4, token_col="n_tokens"
    )
    assert manifest["total_rows"] == 200
    assert sum(s["rows"] for s in manifest["shards"].values()) == 200
    assert sum(s["tokens"] for s in manifest["shards"].values()) == (
        docs.agg(F.sum("n_tokens")).collect()[0][0]
    )
    # one parquet file per shard — the streamable-layout contract
    for s in manifest["shards"]:
        files = glob.glob(os.path.join(path, f"shard={s}", "*.parquet"))
        assert len(files) == 1

    back = read_training_shards(spark, path)
    assert back.count() == 200
    assert set(back.columns) == {"doc_id", "text", "n_tokens", "shard"}

    # subset read (resumable-loader case) validates only what it reads
    some = [int(s) for s in list(manifest["shards"])[:2]]
    sub = read_training_shards(spark, path, shards=some)
    assert sub.count() == sum(
        manifest["shards"][str(s)]["rows"] for s in some
    )


def test_assignment_is_deterministic(spark, docs, tmp_path):
    m1 = write_training_shards(docs, str(tmp_path / "a"), n_shards=4)
    m2 = write_training_shards(docs, str(tmp_path / "b"), n_shards=4)
    assert m1 == m2  # same keys -> same shards, rows, checksums


def test_torn_copy_is_detected(spark, docs, tmp_path):
    path = str(tmp_path / "shards")
    manifest = write_training_shards(docs, path, n_shards=4)
    victim = next(iter(manifest["shards"]))
    f = glob.glob(os.path.join(path, f"shard={victim}", "*.parquet"))[0]
    os.remove(f)
    with pytest.raises(RuntimeError, match="fails manifest validation"):
        read_training_shards(spark, path)
    # the untouched shards still validate when read selectively
    ok = [int(s) for s in manifest["shards"] if s != victim]
    assert read_training_shards(spark, path, shards=ok).count() == sum(
        manifest["shards"][str(s)]["rows"] for s in ok
    )


def test_unknown_shard_and_bad_args(spark, docs, tmp_path):
    path = str(tmp_path / "shards")
    write_training_shards(docs, path, n_shards=2)
    with pytest.raises(ValueError, match="not in manifest"):
        read_training_shards(spark, path, shards=[99])
    with pytest.raises(ValueError, match="n_shards"):
        write_training_shards(docs, str(tmp_path / "x"), n_shards=0)


def test_manifest_matches_md5_rule(spark, docs, tmp_path):
    """Shard membership is reproducible from the manifest parameters
    alone: md5(key)[:8] as int mod n_shards — the documented contract a
    loader in any language can re-derive."""
    import hashlib

    path = str(tmp_path / "shards")
    write_training_shards(docs, path, n_shards=4)
    rows = read_training_shards(spark, path).select("doc_id", "shard").collect()
    for r in rows:
        expect = int(hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:8], 16) % 4
        assert r["shard"] == expect
