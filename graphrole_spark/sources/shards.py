"""Training-shard sink: deterministic, manifest-backed parquet shards.

The last mile of the corpus pipeline: after clean → dedup → mix → pack
(:func:`graphrole_spark.functions.corpus.assemble_corpus`), training
jobs want the corpus as fixed-size shards with a manifest — integrity
counts per shard, so a downstream loader can resume mid-epoch, verify a
partial copy, and schedule work without listing/scanning files.

Design for 100 TB:

* **Shard assignment is a pure projection** — the portable md5 bucket
  of the key column (``corpus._md5_bucket``, the repo's ONE hash
  idiom), so membership is reproducible from the manifest parameters
  alone: no global sort, no sampled range boundaries (deterministic
  across runs and engines, unlike ``repartitionByRange`` whose sampled
  boundaries shift with partition layout).
* **One file per shard** via ``repartition(shard)`` before the
  partitioned write — the same layout rule the store compactor
  enforces; a shard is therefore one parquet file a loader can stream.
* **Manifest from ONE aggregation** — per-shard row counts, optional
  token sums, key ranges, and an order-independent integrity checksum
  (sum of the keys' md5-longs mod 2^62) computed in a single groupBy
  over the data, then cross-checked against a post-write re-read so the
  manifest describes what is actually on disk, not what was planned.

``read_training_shards`` validates a shard directory against its
manifest before handing the frame to the caller (a partial or torn copy
fails loudly instead of training on a truncated corpus).
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphrole_spark.functions.corpus import _md5_bucket, _md5_long

__all__ = ["write_training_shards", "read_training_shards"]

_MOD = 1 << 62  # checksum modulus: fits a signed 64-bit literal


def _checksum(key):
    """Order-independent shard checksum: sum of the keys' md5-longs,
    accumulated in decimal(38,0) so shards beyond 2^31 rows cannot
    silently overflow the long sum, reduced mod 2^62."""
    return (
        F.pmod(F.sum(_md5_long(key).cast("decimal(38,0)")), F.lit(_MOD))
        .cast("long")
        .alias("checksum")
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    key_col: str = "doc_id",
    token_col: Optional[str] = None,
    sort_cols: Optional[Sequence[str]] = None,
) -> Dict:
    """Write ``df`` as ``n_shards`` deterministic parquet shards plus a
    ``_manifest.json``. Returns the manifest dict.

    Rows land in ``shard = md5(key) % n_shards`` (reproducible from the
    manifest alone); within a shard, rows are sorted by ``sort_cols``
    (default: the key) so shard content is byte-stable across runs.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    if "shard" in df.columns:
        raise ValueError(
            "input already has a 'shard' column (pack_documents emits one "
            "for its token-packing shards); rename it first — the sink "
            "reserves 'shard' for its partition column"
        )
    key = F.col(key_col).cast("string")
    out = df.withColumn("shard", _md5_bucket(key, n_shards).cast("int"))
    per_shard_aggs = [
        F.count("*").alias("rows"),
        _checksum(key),
        F.min(key_col).alias("key_min"),
        F.max(key_col).alias("key_max"),
    ]
    if token_col is not None:
        per_shard_aggs.append(F.sum(token_col).cast("long").alias("tokens"))
    stats = {
        int(r["shard"]): {k: r[k] for k in r.asDict() if k != "shard"}
        for r in out.groupBy("shard").agg(*per_shard_aggs).collect()
    }

    (
        out.repartition(F.col("shard"))
        .sortWithinPartitions(*(sort_cols or [key_col]))
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )

    # the manifest must describe what is ON DISK: re-read and cross-check
    written = {
        int(r["shard"]): int(r["rows"])
        for r in df.sparkSession.read.parquet(path).groupBy("shard").count()
        .withColumnRenamed("count", "rows").collect()
    }
    expected = {s: int(v["rows"]) for s, v in stats.items()}
    if written != expected:
        raise RuntimeError(
            f"shard write verification failed: planned {expected}, on disk {written}"
        )

    manifest = {
        "n_shards": n_shards,
        "key_col": key_col,
        "token_col": token_col,
        "assignment": "md5_hex8_mod",  # corpus._md5_bucket(key, n_shards)
        "total_rows": sum(expected.values()),
        "shards": {
            str(s): {
                "path": f"shard={s}",
                "rows": int(v["rows"]),
                "checksum": int(v["checksum"]),
                "key_min": v["key_min"],
                "key_max": v["key_max"],
                **(
                    {"tokens": int(v["tokens"] or 0)}
                    if token_col is not None
                    else {}
                ),
            }
            for s, v in sorted(stats.items())
        },
    }
    with open(os.path.join(path, "_manifest.json"), "w") as fh:
        json.dump(manifest, fh, indent=2)
    return manifest


def read_training_shards(
    spark: SparkSession,
    path: str,
    shards: Optional[Sequence[int]] = None,
) -> DataFrame:
    """Read back a shard directory, validating rows + checksum against
    the manifest first (``shards`` selects a subset — the resumable-
    loader case — validating only what is read). A missing manifest or
    any mismatch raises instead of silently training on a torn copy."""
    with open(os.path.join(path, "_manifest.json")) as fh:
        manifest = json.load(fh)
    wanted = (
        sorted(int(s) for s in shards)
        if shards is not None
        else sorted(int(s) for s in manifest["shards"])
    )
    for s in wanted:
        if str(s) not in manifest["shards"]:
            raise ValueError(f"shard {s} not in manifest ({path})")
    df = spark.read.parquet(path).where(F.col("shard").isin(wanted))
    key = F.col(manifest["key_col"]).cast("string")
    got = {
        int(r["shard"]): (int(r["rows"]), int(r["checksum"]))
        for r in df.groupBy("shard")
        .agg(F.count("*").alias("rows"), _checksum(key))
        .collect()
    }
    for s in wanted:
        m = manifest["shards"][str(s)]
        if got.get(s, (0, 0)) != (m["rows"], m["checksum"]):
            raise RuntimeError(
                f"shard {s} fails manifest validation: manifest "
                f"(rows={m['rows']}, checksum={m['checksum']}), "
                f"on disk {got.get(s, (0, 0))}"
            )
    return df
