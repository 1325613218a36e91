"""Store compaction: one file per partition, byte-identical rows,
probe parity and replay idempotency preserved (streaming/compaction.py)."""

import glob
import os

import pandas as pd
from pyspark.sql import functions as F

from graphrole_spark.streaming.compaction import (
    compact_partitioned_dir,
    compact_store,
)
from graphrole_spark.streaming.corpus_dedup import apply_dedup_delta


def _files(path):
    return glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)


def test_compact_partitioned_dir_roundtrip(spark, tmp_path):
    p = str(tmp_path / "t")
    for lo, hi in ((0, 100), (100, 150), (150, 160)):
        (
            spark.range(lo, hi)
            .withColumn("__b", F.pmod("id", F.lit(4)).cast("int"))
            .write.mode("append")
            .partitionBy("__b")
            .parquet(p)
        )
    before = sorted(
        spark.read.parquet(p).toPandas().itertuples(index=False, name=None)
    )
    n_before = len(_files(p))
    stats = compact_partitioned_dir(spark, p)
    assert stats["files_before"] == n_before
    assert stats["files_after"] == 4  # one file per partition
    assert stats["files_after"] < n_before
    after = sorted(
        spark.read.parquet(p).toPandas().itertuples(index=False, name=None)
    )
    assert after == before


def test_compact_missing_dir_is_noop(spark, tmp_path):
    stats = compact_partitioned_dir(spark, str(tmp_path / "absent"))
    assert stats == {"files_before": 0, "files_after": 0, "rows": 0}


_DOCS = {
    0: [
        (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (2, "one two three four five six seven eight nine ten"),
    ],
    1: [
        (3, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),  # exact dup of 1
        (4, "red orange yellow green blue indigo violet cyan magenta white"),
    ],
    2: [
        (5, "north south east west up down left right front back"),
    ],
}
_PROBE = [
    (6, "one two three four five six seven eight nine eleven"),  # near dup of 2
    (7, "completely fresh sentence with ten entirely novel words here now"),
]


def _build(spark, store):
    for bid, rows in _DOCS.items():
        df = spark.createDataFrame(rows, "doc_id long, text string")
        apply_dedup_delta(spark, df, store, n_buckets=8, batch_id=bid)


def test_compact_dedup_store_preserves_rows_and_decisions(spark, tmp_path):
    plain, compacted = str(tmp_path / "plain"), str(tmp_path / "compacted")
    _build(spark, plain)
    _build(spark, compacted)

    sort_keys = {
        "content": ["doc_id"],
        "bands": ["doc_id", "band", "bhash"],
        "shingles": ["doc_id"],
    }
    before = {
        s: spark.read.parquet(os.path.join(compacted, s))
        .toPandas().sort_values(sort_keys[s]).reset_index(drop=True)
        for s in ("content", "bands", "shingles")
    }
    stats = compact_store(spark, compacted)
    assert set(stats) == {"content", "bands", "shingles"}
    for s, st in stats.items():
        path = os.path.join(compacted, s)
        parts = [d for d in os.listdir(path) if "=" in d]
        assert st["files_after"] == len(parts)  # one file per partition
        after = (
            spark.read.parquet(path)
            .toPandas().sort_values(sort_keys[s]).reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            after[sorted(after.columns)], before[s][sorted(before[s].columns)]
        )
    # three batches over 8 band buckets must have stacked files somewhere
    assert sum(st["files_before"] for st in stats.values()) > sum(
        st["files_after"] for st in stats.values()
    )

    # probe parity: the same new batch decides identically on both stores
    probe = spark.createDataFrame(_PROBE, "doc_id long, text string")
    want = (
        apply_dedup_delta(spark, probe, plain, n_buckets=8, batch_id=3)
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    got = (
        apply_dedup_delta(spark, probe, compacted, n_buckets=8, batch_id=3)
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
    assert set(got["status"]) == {"near_dup", "new"}


def test_interrupted_compaction_recovers_on_probe(spark, tmp_path):
    """Crash window between compaction's two renames: the live store dir
    is missing, data sits at <path>.__old__. The next probe must restore
    it and still catch duplicates — never silently probe an empty store."""
    store = str(tmp_path / "store")
    _build(spark, store)
    content = os.path.join(store, "content")
    os.rename(content, content + ".__old__")

    probe = spark.createDataFrame(
        [(8001, _DOCS[0][0][1])], "doc_id long, text string"
    )  # exact text of doc 1 under a fresh id
    dec = apply_dedup_delta(spark, probe, store, n_buckets=8, batch_id=9).toPandas()
    assert dec.loc[0, "status"] == "exact_dup"
    assert os.path.isdir(content)
    assert not os.path.isdir(content + ".__old__")


def test_compact_then_replay_is_idempotent(spark, tmp_path):
    store = str(tmp_path / "store")
    _build(spark, store)
    compact_store(spark, store)
    rows_before = {
        s: spark.read.parquet(os.path.join(store, s)).count()
        for s in ("content", "bands", "shingles")
    }
    # redeliver batch 1 (same batch_id, same payload) after compaction:
    # decisions must match the original run, stores must not grow
    df = spark.createDataFrame(_DOCS[1], "doc_id long, text string")
    dec = apply_dedup_delta(spark, df, store, n_buckets=8, batch_id=1).toPandas()
    assert dict(zip(dec["doc_id"], dec["status"])) == {3: "exact_dup", 4: "new"}
    for s, n in rows_before.items():
        assert spark.read.parquet(os.path.join(store, s)).count() == n
