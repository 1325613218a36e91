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


def test_assemble_then_shard_integration(spark, tmp_path):
    """The production path's terminal stage: assemble_corpus's packed
    sequences flow into the manifest-backed sink with token accounting
    intact and a byte-identical read-back."""
    from graphrole_spark.functions.corpus import assemble_corpus

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    srcs = [r[0] for r in docs.select("source").distinct().collect()]
    asm_raw = assemble_corpus(
        docs, {s: 1.0 for s in srcs}, total_tokens=2000, max_seq_tokens=128
    ).persist()
    # the sink reserves 'shard' and must refuse pack_documents' own
    # shard column instead of silently clobbering it
    with pytest.raises(ValueError, match="reserves 'shard'"):
        write_training_shards(asm_raw, str(tmp_path / "clash"), n_shards=4)
    asm = asm_raw.withColumnRenamed("shard", "pack_shard")
    path = str(tmp_path / "shards")
    manifest = write_training_shards(
        asm, path, n_shards=4, token_col="n_tokens"
    )
    assert manifest["total_rows"] == asm.count()
    assert sum(s["tokens"] for s in manifest["shards"].values()) == (
        asm.agg(F.sum("n_tokens")).collect()[0][0]
    )
    back = (
        read_training_shards(spark, path)
        .drop("shard")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = asm.toPandas().sort_values("doc_id").reset_index(drop=True)
    import pandas as pd

    pd.testing.assert_frame_equal(
        back[sorted(back.columns)], want[sorted(want.columns)]
    )


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
