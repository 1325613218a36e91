#!/usr/bin/env python
"""Scale evidence for the dedup layer (r02 VERDICT item 3).

Runs minhash_near_duplicates and simhash_near_duplicates at 5k / 50k /
500k synthetic documents (10x / 100x the sf0.1 corpus) and reports wall
time, emitted pairs, and band/chunk bucket-size stats — the quantity
that bounds candidate-verification cost. Near-linear growth + bounded
max bucket = the banded joins hold at scale.

The corpus is synthesized fully JVM-side (deterministic xxhash64 token
streams, ~145 tokens/doc, ~6% seeded near-duplicate pairs), written to
parquet once per size, so the measured pipeline reads parquet exactly
like production.

Usage: python scripts/dedup_scale.py [--sizes 5000,50000,500000]
Appends one JSON line per size to BENCH_DEDUP_SCALE.jsonl.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VOCAB = 30_000


def synth_docs(spark, n: int, out_dir: str):
    """Deterministic synthetic corpus: doc i with id%17==1 is a near-dup
    of doc i-1 (every 23rd token replaced), all token choices are pure
    functions of (seed_id, position)."""
    from pyspark.sql import functions as F

    ids = spark.range(n).select(F.col("id").alias("doc_id"))
    seed_id = F.when(
        F.col("doc_id") % 17 == 1, F.col("doc_id") - 1
    ).otherwise(F.col("doc_id"))
    n_toks = (F.pmod(F.xxhash64(seed_id, F.lit(99)), F.lit(80)) + 80).cast("int")
    tok = lambda j: F.concat(
        F.lit("w"), F.pmod(F.xxhash64(seed_id, j), F.lit(VOCAB)).cast("string")
    )
    perturbed = lambda j: F.when(
        (F.col("doc_id") % 17 == 1) & (j % 23 == 0),
        F.concat(F.lit("x"), j.cast("string")),
    ).otherwise(tok(j))
    text = F.concat_ws(
        " ", F.transform(F.sequence(F.lit(0), n_toks - 1), perturbed)
    )
    docs = ids.select("doc_id", text.alias("text"))
    docs.write.mode("overwrite").parquet(out_dir)


def bucket_stats(df, keys):
    from pyspark.sql import functions as F

    row = (
        df.groupBy(*keys)
        .agg(F.count("*").alias("c"))
        .agg(
            F.max("c").alias("max"),
            F.expr("percentile(c, 0.999)").alias("p999"),
            F.count("*").alias("n_buckets"),
        )
        .collect()[0]
    )
    return {"max": int(row["max"]), "p999": float(row["p999"]),
            "n_buckets": int(row["n_buckets"])}


def run(spark, n: int, work_dir: str) -> dict:
    from pyspark.sql import functions as F

    from graphrole_spark.functions.text import (
        bands_for_threshold,
        minhash_bands,
        minhash_near_duplicates,
        simhash_chunk_pairs,
        simhash_frame,
        simhash_near_duplicates,
    )

    pq = os.path.join(work_dir, f"docs_{n}")
    if not os.path.exists(os.path.join(pq, "_SUCCESS")):
        synth_docs(spark, n, pq)
    docs = spark.read.parquet(pq)

    out: dict = {"n_docs": n}

    t0 = time.time()
    mh = minhash_near_duplicates(docs, jaccard_threshold=0.5)
    out["minhash_pairs"] = mh.count()
    out["minhash_sec"] = round(time.time() - t0, 2)
    out["minhash_buckets"] = bucket_stats(
        minhash_bands(docs, bands=bands_for_threshold(0.5)), ["band", "bhash"]
    )

    t0 = time.time()
    sh = simhash_near_duplicates(docs, max_hamming=3)
    out["simhash_pairs"] = sh.count()
    out["simhash_sec"] = round(time.time() - t0, 2)
    chunks = simhash_chunk_pairs(simhash_frame(docs), max_hamming=3)
    out["simhash_buckets"] = bucket_stats(chunks, ["table", "h1", "h2"])

    # pairs -> clusters -> keep decision (the dedup_clusters tail stage)
    from graphrole_spark.functions.dedup_graph import dedup_keep

    t0 = time.time()
    kept = dedup_keep(
        docs.withColumn("n_chars", F.length("text")),
        mh, quality_col="n_chars",
    )
    agg = kept.agg(
        F.count("*").alias("n"),
        F.sum("keep").alias("n_keep"),
        F.max("cluster_size").alias("max_cluster"),
    ).collect()[0]
    out["cluster_sec"] = round(time.time() - t0, 2)
    out["n_dropped"] = int(agg["n"] - agg["n_keep"])
    out["max_cluster"] = int(agg["max_cluster"])
    return out


def cc_stress(spark, n_nodes: int) -> dict:
    """Connected components alone on an adversarial edge list:
    diameter-100 chains (worst case for label propagation — the
    alternating-star algorithm must collapse them in O(log^2) rounds)
    plus intra-block random shortcuts, n_nodes edges total."""
    from pyspark.sql import functions as F

    from graphrole_spark.functions.dedup_graph import connected_components

    ids = spark.range(n_nodes)
    chain = ids.where(F.col("id") % 100 != 99).select(
        F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b")
    )
    # deterministic shortcut edges inside each 100-block (~1% of nodes)
    shortcut = (
        ids.where(F.pmod(F.xxhash64("id"), F.lit(100)) == 0)
        .select(
            F.col("id").alias("doc_a"),
            (F.col("id") - F.col("id") % 100
             + F.pmod(F.xxhash64("id", F.lit(1)), F.lit(100))).alias("doc_b"),
        )
        .where(F.col("doc_a") != F.col("doc_b"))
    )
    pairs = chain.unionByName(shortcut).localCheckpoint()

    stats: dict = {}
    t0 = time.time()
    comp = connected_components(pairs, stats=stats)
    n_comp = comp.select("component").distinct().count()
    return {
        "cc_nodes": n_nodes,
        "cc_edges": stats.get("initial_edges"),
        "cc_rounds": stats.get("rounds"),
        "cc_components": n_comp,
        "cc_sec": round(time.time() - t0, 2),
    }


def ingest_stress(spark, store_docs: int, batch_docs: int, work_dir: str) -> dict:
    """Streaming-ingest probe-cost evidence: bootstrap a dedup store
    with ``store_docs`` documents, then time ONE ``apply_dedup_delta``
    of a fresh ``batch_docs``-doc batch. Run at several store sizes with
    the same batch: near-constant batch time = the probe reads O(batch)
    bytes (bucket-pruned), not O(store)."""
    import shutil

    from graphrole_spark.streaming.corpus_dedup import apply_dedup_delta

    pq = os.path.join(work_dir, f"docs_{store_docs + batch_docs}")
    if not os.path.exists(os.path.join(pq, "_SUCCESS")):
        synth_docs(spark, store_docs + batch_docs, pq)
    docs = spark.read.parquet(pq)
    from pyspark.sql import functions as F

    store_dir = os.path.join(work_dir, f"ingest_store_{store_docs}")
    shutil.rmtree(store_dir, ignore_errors=True)

    t0 = time.time()
    apply_dedup_delta(
        spark, docs.where(F.col("doc_id") < store_docs), store_dir,
        jaccard_threshold=0.5, batch_id=0,
    )
    bootstrap_sec = round(time.time() - t0, 2)

    batch = docs.where(F.col("doc_id") >= store_docs).localCheckpoint()
    t0 = time.time()
    decisions = apply_dedup_delta(
        spark, batch, store_dir, jaccard_threshold=0.5, batch_id=1
    )
    # apply_dedup_delta returns a localCheckpoint-ed frame: the whole
    # step (probes + appends) has executed by the time it returns
    batch_sec = round(time.time() - t0, 2)
    counts = {r["status"]: r["n"] for r in
              decisions.groupBy("status").agg(F.count("*").alias("n")).collect()}
    shutil.rmtree(store_dir, ignore_errors=True)
    return {
        "ingest_store_docs": store_docs,
        "ingest_batch_docs": batch_docs,
        "bootstrap_sec": bootstrap_sec,
        "batch_sec": batch_sec,
        "batch_decisions": counts,
    }


def lines_stress(spark, n: int, work_dir: str) -> dict:
    """Line-dedup scale evidence: multi-line synthetic docs (10 lines
    each, ~30% drawn from a 50-line boilerplate pool, the rest globally
    unique), timed through dedup_lines. Near-linear wall time + a
    boilerplate set that stays pool-sized = the heavy-hitter broadcast
    shape holds at scale."""
    from pyspark.sql import functions as F

    from graphrole_spark.functions.text import dedup_lines

    pq = os.path.join(work_dir, f"linedocs_{n}")
    if not os.path.exists(os.path.join(pq, "_SUCCESS")):
        ids = spark.range(n).select(F.col("id").alias("doc_id"))
        line = lambda j: F.when(  # noqa: E731
            F.pmod(F.xxhash64("doc_id", j, F.lit(5)), F.lit(10)) < 3,
            F.concat(
                F.lit("boilerplate line "),
                F.pmod(F.xxhash64(j, F.lit(6), "doc_id"), F.lit(50)).cast("string"),
            ),
        ).otherwise(
            F.concat(F.lit("unique "), F.xxhash64("doc_id", j).cast("string"))
        )
        text = F.concat_ws("\n", F.transform(F.sequence(F.lit(0), F.lit(9)), line))
        ids.select("doc_id", text.alias("text")).write.mode("overwrite").parquet(pq)
    docs = spark.read.parquet(pq)

    t0 = time.time()
    out = dedup_lines(docs, min_docs=2)
    agg = out.agg(
        F.count("*").alias("n"),
        F.sum("n_lines_kept").alias("kept"),
        F.sum("n_lines_dropped").alias("dropped"),
    ).collect()[0]
    return {
        "lines_docs": n,
        "lines_sec": round(time.time() - t0, 2),
        "lines_kept": int(agg["kept"]),
        "lines_dropped": int(agg["dropped"]),
    }


def dsir_stress(spark, n: int, work_dir: str) -> dict:
    """DSIR scale evidence on the multi-line synthetic corpus (every
    10th doc is 'target'): two corpus gram scans + <=buckets-row
    broadcast dims, so wall time should track the corpus linearly."""
    from pyspark.sql import functions as F

    from graphrole_spark.functions.importance import dsir_select

    pq = os.path.join(work_dir, f"linedocs_{n}")
    if not os.path.exists(os.path.join(pq, "_SUCCESS")):
        lines_stress(spark, n, work_dir)  # synthesizes the corpus
    docs = spark.read.parquet(pq)
    target = docs.where(F.col("doc_id") % 10 == 0)

    t0 = time.time()
    out = dsir_select(docs, target, k=max(1, n // 10))
    agg = out.agg(
        F.count("*").alias("n"),
        F.sum("selected").alias("n_sel"),
        F.round(F.avg("dsir_score"), 6).alias("mean_score"),
    ).collect()[0]
    return {
        "dsir_docs": n,
        "dsir_sec": round(time.time() - t0, 2),
        "dsir_selected": int(agg["n_sel"]),
        "dsir_mean_score": float(agg["mean_score"]),
    }


def bpe_stress(spark, n: int, work_dir: str) -> dict:
    """BPE trainer scale evidence: the corpus-size-dependent work is one
    word-frequency pass (the merge loop runs on the bounded vocab), so
    fit wall should track the corpus while merges stay constant-cost;
    encode is one partition-preserving Arrow pass."""
    from pyspark.sql import functions as F

    from graphrole_spark.functions.tokenizer import bpe_encode, bpe_fit

    pq = os.path.join(work_dir, f"linedocs_{n}")
    if not os.path.exists(os.path.join(pq, "_SUCCESS")):
        lines_stress(spark, n, work_dir)  # synthesizes the corpus
    docs = spark.read.parquet(pq)

    t0 = time.time()
    merges = bpe_fit(docs, n_merges=200, min_freq=2, max_vocab_words=100_000)
    fit_sec = round(time.time() - t0, 2)
    t0 = time.time()
    tot = bpe_encode(docs, merges).agg(
        F.sum("n_bpe_tokens").alias("t")
    ).collect()[0]["t"]
    return {
        "bpe_docs": n,
        "bpe_fit_sec": fit_sec,
        "bpe_encode_sec": round(time.time() - t0, 2),
        "bpe_merges": len(merges),
        "bpe_total_tokens": int(tot),
    }


def pack_stress(spark, n: int, work_dir: str, merges=[]) -> dict:
    """Tokenize-and-pack scale evidence: a FIXED merge list (fit once on
    the smallest corpus, passed in) so the sweep isolates the
    corpus-size-dependent stages — Arrow encode, vocab aggregate, and
    the concat-and-chunk pack (document-grain array-slice shuffle). Wall
    should track the corpus linearly; sequences = ceil(tokens/max_len)
    per shard."""
    from pyspark.sql import functions as F

    from graphrole_spark.functions.tokenizer import bpe_fit, tokenize_pack

    pq = os.path.join(work_dir, f"linedocs_{n}")
    if not os.path.exists(os.path.join(pq, "_SUCCESS")):
        lines_stress(spark, n, work_dir)
    docs = spark.read.parquet(pq)
    if not merges:
        merges.extend(bpe_fit(docs, n_merges=200, min_freq=2))

    t0 = time.time()
    packed = tokenize_pack(docs, max_len=2048, merges=list(merges), shards=64)
    agg = packed.agg(
        F.count("*").alias("n_seqs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.sum((F.col("n_tokens") == 2048).cast("int")).alias("n_full"),
    ).collect()[0]
    return {
        "pack_docs": n,
        "pack_sec": round(time.time() - t0, 2),
        "pack_seqs": int(agg["n_seqs"]),
        "pack_tokens": int(agg["n_tokens"]),
        "pack_full_seqs": int(agg["n_full"]),
    }


def nb_stress(spark, n: int, work_dir: str) -> dict:
    """NB quality-classifier scale evidence: fit = one gram explode +
    conditional-sum groupBy, score = one explode + broadcast join —
    the same physical plan family as the DSIR sweep."""
    from pyspark.sql import functions as F

    from graphrole_spark.functions.classifier import (
        nb_quality_fit,
        nb_quality_score,
    )

    pq = os.path.join(work_dir, f"linedocs_{n}")
    if not os.path.exists(os.path.join(pq, "_SUCCESS")):
        lines_stress(spark, n, work_dir)
    docs = spark.read.parquet(pq).withColumn(
        "label", F.col("doc_id") % 3 == 0
    )
    t0 = time.time()
    model = nb_quality_fit(docs)
    fit_sec = round(time.time() - t0, 2)
    t0 = time.time()
    agg = nb_quality_score(docs, model).agg(
        F.count("*").alias("n"),
        F.sum(F.col("predicted").cast("int")).alias("pos"),
    ).collect()[0]
    return {
        "nb_docs": n,
        "nb_fit_sec": fit_sec,
        "nb_score_sec": round(time.time() - t0, 2),
        "nb_predicted_pos": int(agg["pos"]),
    }


def topgram_stress(spark, n: int, work_dir: str) -> dict:
    """Heavy-hitter n-gram scale evidence: the lines_stress corpus (30%
    of lines from a 50-line boilerplate pool) through top_ngrams(n=3).
    The scale-sensitive part is the hashed gram aggregate (cardinality
    ~ total token positions); the display pass touches only the k
    winners, so wall time should track the gram count near-linearly
    and the planted boilerplate grams must surface as the top hits."""
    from pyspark.sql import functions as F

    from graphrole_spark.functions.text import top_ngrams

    pq = os.path.join(work_dir, f"linedocs_{n}")
    if not os.path.exists(os.path.join(pq, "_SUCCESS")):
        lines_stress(spark, n, work_dir)  # synthesizes the corpus
    docs = spark.read.parquet(pq)
    t0 = time.time()
    rows = top_ngrams(docs, n=3, k=20, min_docs=2).collect()
    sec = round(time.time() - t0, 2)
    top_boiler = sum(1 for r in rows if r["gram"].startswith("boilerplate"))
    return {
        "topgram_docs": n,
        "topgram_sec": sec,
        "topgram_rows": len(rows),
        "topgram_boiler_hits": top_boiler,
        "topgram_max_occ": int(rows[0]["n_occurrences"]) if rows else 0,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="5000,50000,500000")
    ap.add_argument("--cc-sizes", default="",
                    help="node counts for the CC-only stress (chains+shortcuts)")
    ap.add_argument("--ingest-stores", default="",
                    help="store sizes for the streaming-ingest probe-cost stress")
    ap.add_argument("--lines-sizes", default="",
                    help="doc counts for the cross-doc line-dedup stress")
    ap.add_argument("--dsir-sizes", default="",
                    help="doc counts for the DSIR scoring stress")
    ap.add_argument("--bpe-sizes", default="",
                    help="doc counts for the BPE trainer stress")
    ap.add_argument("--nb-sizes", default="",
                    help="doc counts for the NB classifier stress")
    ap.add_argument("--pack-sizes", default="",
                    help="doc counts for the tokenize-and-pack stress")
    ap.add_argument("--topgram-sizes", default="",
                    help="doc counts for the heavy-hitter n-gram stress")
    ap.add_argument("--ingest-batch", type=int, default=5000)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--work-dir", default="/tmp/dedup_scale")
    args = ap.parse_args()

    from graphrole_spark.session import get_spark

    spark = get_spark("dedup_scale", cores=args.cpus)
    os.makedirs(args.work_dir, exist_ok=True)
    def record(r: dict, pre_load: float) -> None:
        r["cpus"] = args.cpus
        # co-tenant noise context: load1_pre is the 1-min load BEFORE
        # the timed run starts (the co-tenancy signal — our own 32-core
        # work hasn't pushed it up yet); load1 is at row-write time
        # (dominated by our own just-finished run, for completeness)
        r["load1_pre"] = round(pre_load, 1)
        r["load1"] = round(os.getloadavg()[0], 1)
        print(json.dumps(r), flush=True)
        with open("BENCH_DEDUP_SCALE.jsonl", "a") as f:
            f.write(json.dumps(r) + "\n")

    for n in [int(s) for s in args.sizes.split(",") if s]:
        pre = os.getloadavg()[0]
        record(run(spark, n, args.work_dir), pre)
    for n in [int(s) for s in args.cc_sizes.split(",") if s]:
        pre = os.getloadavg()[0]
        record(cc_stress(spark, n), pre)
    for n in [int(s) for s in args.ingest_stores.split(",") if s]:
        pre = os.getloadavg()[0]
        record(ingest_stress(spark, n, args.ingest_batch, args.work_dir), pre)
    for n in [int(s) for s in args.lines_sizes.split(",") if s]:
        pre = os.getloadavg()[0]
        record(lines_stress(spark, n, args.work_dir), pre)
    for n in [int(s) for s in args.dsir_sizes.split(",") if s]:
        pre = os.getloadavg()[0]
        record(dsir_stress(spark, n, args.work_dir), pre)
    for n in [int(s) for s in args.bpe_sizes.split(",") if s]:
        pre = os.getloadavg()[0]
        record(bpe_stress(spark, n, args.work_dir), pre)
    for n in [int(s) for s in args.nb_sizes.split(",") if s]:
        pre = os.getloadavg()[0]
        record(nb_stress(spark, n, args.work_dir), pre)
    pack_merges: list = []
    for n in [int(s) for s in args.pack_sizes.split(",") if s]:
        pre = os.getloadavg()[0]
        record(pack_stress(spark, n, args.work_dir, merges=pack_merges), pre)
    for n in [int(s) for s in args.topgram_sizes.split(",") if s]:
        pre = os.getloadavg()[0]
        record(topgram_stress(spark, n, args.work_dir), pre)


if __name__ == "__main__":
    main()
