"""Streaming ingestion dedup: new documents are checked against the
accumulated corpus BEFORE they are admitted.

The ingestion-side twin of :mod:`graphrole_spark.streaming.maintenance`
(which maintains features; this maintains the corpus itself): batches of
new documents stream in, and each batch is deduplicated

1. exactly — md5 content hash against the accumulated content store;
2. near — MinHash band collisions against the accumulated band store,
   exact-Jaccard-verified against the stored shingle sets,

with **first-arrival-wins** semantics: the earliest admitted copy stays
canonical and later near-copies are rejected (a batch rebuild with
:func:`~graphrole_spark.functions.dedup_graph.dedup_keep` can instead
keep the best-quality copy — streaming trades that choice for never
reprocessing history).

Scale design — every store is hash-bucketed so a probe touches
O(batch) bytes, not O(corpus):

* ``content/``  (content_hash, doc_id)        bucketed by content hash;
* ``bands/``    (band, bhash, doc_id)         bucketed by band hash —
  the probe is the same ids-only band equi-join as the batch
  near-dup operator;
* ``shingles/`` (doc_id, shh: array<long>)    bucketed by doc id,
  read only for the band-collision candidates (semi-join pruned).

``apply_dedup_delta`` is idempotent under foreachBatch's at-least-once
replay: store appends are keyed by doc_id anti-joins, and probe reads
exclude rows a crashed earlier attempt of the SAME batch may have
appended (otherwise a replayed doc would reject itself as a duplicate).
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from graphrole_spark.functions.text import (
    bands_for_threshold,
    minhash_bands,
    minhash_shingle_hashes,
)

N_BUCKETS = 64


def _bucket(col, n_buckets: int = N_BUCKETS):
    return F.pmod(F.xxhash64(col), F.lit(n_buckets)).cast("int")


def _dir(store_dir: str, name: str) -> str:
    return os.path.join(store_dir, name)


def _read_store(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """Read a store directory, or an empty frame before first append."""
    try:
        return spark.read.parquet(path)
    except Exception:  # noqa: BLE001 — path-missing on a fresh store
        return spark.createDataFrame([], schema)


def apply_dedup_delta(
    spark: SparkSession,
    delta: DataFrame,
    store_dir: str,
    text_col: str = "text",
    jaccard_threshold: float = 0.7,
    shingle_n: int = 3,
    n_hashes: int = 32,
    seed: int = 7,
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """One ingestion step. Returns the batch's decision frame
    ``(doc_id, status)`` with status ∈ {'new', 'exact_dup', 'near_dup'}
    and appends the admitted docs' hashes/bands/shingles to the store.

    The returned frame is already collected-safe (one row per batch
    doc); callers wanting the admitted documents semi-join status='new'.
    """
    bands = bands_for_threshold(jaccard_threshold, n_hashes)
    delta = delta.select(
        "doc_id", F.col(text_col).alias("__text")
    ).localCheckpoint()
    batch_ids = delta.select("doc_id").distinct()

    # ---- exact stage -----------------------------------------------------
    hashed = delta.select(
        "doc_id", F.md5(F.coalesce("__text", F.lit(""))).alias("content_hash")
    )
    # intra-batch: first (min doc_id) copy per content hash survives
    hashed = hashed.withColumn(
        "__first", F.min("doc_id").over(Window.partitionBy("content_hash"))
    )
    intra_exact_dup = hashed.where(F.col("doc_id") != F.col("__first"))

    content_store = _read_store(
        spark,
        _dir(store_dir, "content"),
        "content_hash string, doc_id long, __cb int",
    )
    probe_cb = [
        r["__cb"]
        for r in hashed.select(_bucket(F.col("content_hash"), n_buckets).alias("__cb"))
        .distinct()
        .collect()
    ]
    store_hashes = (
        content_store.where(F.col("__cb").isin(probe_cb or [-1]))
        # exclude this batch's own (possibly partially-replayed) rows
        .join(batch_ids, "doc_id", "left_anti")
        .select("content_hash")
        .distinct()
    )
    store_exact_dup = (
        hashed.where(F.col("doc_id") == F.col("__first"))
        .join(store_hashes, "content_hash", "left_semi")
        .select("doc_id")
    )
    exact_dup_ids = (
        intra_exact_dup.select("doc_id").unionByName(store_exact_dup).distinct()
    )
    after_exact = delta.join(exact_dup_ids, "doc_id", "left_anti")

    # ---- near stage ------------------------------------------------------
    from graphrole_spark.functions.dedup_graph import dedup_keep
    from graphrole_spark.functions.text import minhash_near_duplicates

    # intra-batch near-dups: earliest (min doc_id) copy per cluster wins
    intra_pairs = minhash_near_duplicates(
        after_exact.withColumnRenamed("__text", text_col),
        text_col,
        shingle_n=shingle_n,
        n_hashes=n_hashes,
        jaccard_threshold=jaccard_threshold,
        seed=seed,
    )
    intra_keep = dedup_keep(after_exact, intra_pairs)
    intra_near_dup = intra_keep.where(F.col("keep") == 0).select("doc_id")
    survivors = after_exact.join(intra_near_dup, "doc_id", "left_anti")
    survivors = survivors.withColumnRenamed("__text", text_col).localCheckpoint()

    # store probe: band collisions → exact Jaccard vs stored shingles
    new_bands = minhash_bands(
        survivors, text_col, shingle_n, n_hashes, bands, seed
    ).localCheckpoint()
    band_store = _read_store(
        spark,
        _dir(store_dir, "bands"),
        "band int, bhash long, doc_id long, __bb int",
    )
    probe_bb = [
        r["__bb"]
        for r in new_bands.select(_bucket(F.col("bhash"), n_buckets).alias("__bb"))
        .distinct()
        .collect()
    ]
    cand = (
        new_bands.join(
            band_store.where(F.col("__bb").isin(probe_bb or [-1]))
            .join(batch_ids, "doc_id", "left_anti")
            .select("band", "bhash", F.col("doc_id").alias("old_id")),
            ["band", "bhash"],
        )
        .select("doc_id", "old_id")
        .distinct()
    )
    shingle_store = _read_store(
        spark,
        _dir(store_dir, "shingles"),
        "doc_id long, shh array<long>, __sb int",
    )
    old_sh = shingle_store.join(
        cand.select(F.col("old_id").alias("doc_id")).distinct(), "doc_id", "left_semi"
    ).select(F.col("doc_id").alias("old_id"), F.col("shh").alias("sh_old"))
    new_sh = minhash_shingle_hashes(survivors, text_col, shingle_n, seed)
    jac = F.size(F.array_intersect("shh", "sh_old")) / F.size(
        F.array_union("shh", "sh_old")
    )
    near_dup_ids = (
        cand.join(new_sh, "doc_id")
        .join(old_sh, "old_id")
        .where(F.round(jac, 6) >= jaccard_threshold)
        .select("doc_id")
        .distinct()
        .localCheckpoint()
    )
    admitted = survivors.join(near_dup_ids, "doc_id", "left_anti").localCheckpoint()

    # ---- append admitted docs to the stores (idempotent by doc_id) -------
    def append(df: DataFrame, sub: str, bucket_col) -> None:
        path = _dir(store_dir, sub)
        try:
            existing_ids = spark.read.parquet(path).select("doc_id").distinct()
            new_rows = df.join(existing_ids, "doc_id", "left_anti")
        except Exception:  # noqa: BLE001 — fresh store, nothing to dedup
            new_rows = df
        new_rows.write.mode("append").partitionBy(bucket_col).parquet(path)

    append(
        admitted.select(
            "doc_id",
            F.md5(F.coalesce(text_col, F.lit(""))).alias("content_hash"),
        ).withColumn("__cb", _bucket(F.col("content_hash"), n_buckets)),
        "content",
        "__cb",
    )
    append(
        new_bands.join(admitted.select("doc_id"), "doc_id", "left_semi")
        .withColumn("__bb", _bucket(F.col("bhash"), n_buckets)),
        "bands",
        "__bb",
    )
    append(
        new_sh.join(admitted.select("doc_id"), "doc_id", "left_semi")
        .withColumn("__sb", _bucket(F.col("doc_id"), n_buckets)),
        "shingles",
        "__sb",
    )

    return (
        delta.select("doc_id")
        .join(exact_dup_ids.withColumn("__s", F.lit("exact_dup")), "doc_id", "left")
        .join(
            intra_near_dup.unionByName(near_dup_ids)
            .distinct()
            .withColumn("__s2", F.lit("near_dup")),
            "doc_id",
            "left",
        )
        .select(
            "doc_id",
            F.coalesce("__s", "__s2", F.lit("new")).alias("status"),
        )
    )


def ingest_available_now(
    spark: SparkSession,
    source_dir: str,
    store_dir: str,
    text_col: str = "text",
    jaccard_threshold: float = 0.7,
    max_files_per_trigger: Optional[int] = 1,
    checkpoint_dir: Optional[str] = None,
) -> int:
    """Drain a parquet append stream through the ingestion dedup (one
    ``apply_dedup_delta`` per micro-batch; ``availableNow`` runs to
    completion — production would run unbounded). Decisions are written
    to ``<store_dir>/decisions`` per batch. Returns the number of
    micro-batches processed."""
    schema = spark.read.parquet(source_dir).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)

    n_batches = {"n": 0}

    def step(batch_df: DataFrame, batch_id: int) -> None:
        decisions = apply_dedup_delta(
            spark, batch_df, store_dir, text_col, jaccard_threshold
        )
        decisions.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(_dir(store_dir, "decisions"))
        n_batches["n"] += 1

    writer = stream.writeStream.foreachBatch(step).trigger(availableNow=True)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    writer.start().awaitTermination()
    return n_batches["n"]
