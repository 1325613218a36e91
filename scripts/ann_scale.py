#!/usr/bin/env python
"""Scale evidence for the embedding near-duplicate layer (r02 VERDICT
item 2 follow-through).

Synthesizes clustered embedding corpora fully JVM-side (deterministic
xxhash64 coordinates; groups of 4 ids share a base vector with small
per-id jitter → high intra-group cosine) and measures:

* 5k / 50k vectors: the exact block-pair plan AND the LSH-banded plan —
  wall time, pair counts, and LSH recall vs exact;
* 500k vectors: LSH only (exact all-pairs is O(n²) by definition — the
  point of the banded path), with band-bucket stats.

Appends one JSON line per size to BENCH_ANN_SCALE.jsonl.
Usage: python scripts/ann_scale.py [--sizes 5000,50000,500000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DIM = 64
THRESHOLD = 0.9
EXACT_LIMIT = 60_000


def synth_embeddings(spark, n: int, out_dir: str):
    from pyspark.sql import functions as F

    ids = spark.range(n).select(F.col("id").alias("vec_id"))
    base_id = (F.col("vec_id") / 4).cast("long")  # groups of 4 near-dups
    j = None
    coord = lambda k: (
        (F.pmod(F.xxhash64(base_id, k), F.lit(2001)) - 1000) / 1000.0
        + (F.pmod(F.xxhash64(F.col("vec_id"), k, F.lit(7)), F.lit(201)) - 100) / 2500.0
    ).cast("float")
    vec = F.array(*[coord(F.lit(k)) for k in range(DIM)])
    ids.select("vec_id", vec.alias("embedding")).write.mode("overwrite").parquet(out_dir)


def run(spark, n: int, work_dir: str) -> dict:
    from pyspark.sql import functions as F

    from graphrole_spark.functions.similarity import embedding_near_duplicates

    pq = os.path.join(work_dir, f"emb_{n}")
    if not os.path.exists(os.path.join(pq, "_SUCCESS")):
        synth_embeddings(spark, n, pq)
    emb = spark.read.parquet(pq)
    out: dict = {"n_vectors": n, "dim": DIM, "threshold": THRESHOLD}

    lsh_kwargs = dict(method="lsh", n_planes=16, n_tables=8)
    t0 = time.time()
    lsh_pairs = embedding_near_duplicates(emb, THRESHOLD, **lsh_kwargs)
    out["lsh_pairs"] = lsh_pairs.count()
    out["lsh_sec"] = round(time.time() - t0, 2)

    if n <= EXACT_LIMIT:
        n_blocks = max(4, n // 4000)
        t0 = time.time()
        exact_pairs = embedding_near_duplicates(
            emb, THRESHOLD, method="block", n_blocks=n_blocks
        )
        out["block_pairs"] = exact_pairs.count()
        out["block_sec"] = round(time.time() - t0, 2)
        out["block_n_blocks"] = n_blocks
        out["lsh_recall"] = round(out["lsh_pairs"] / max(out["block_pairs"], 1), 4)
    return out


def run_kmeans(spark, n: int, work_dir: str, n_cells: int = 64) -> dict:
    """Distributed k-means scale point: fixed-iteration fit + one assign
    pass — the near-linear claim is sec/iteration vs corpus size (model
    traffic is n_cells×(dim+2) doubles per iteration at every size)."""
    from graphrole_spark.functions.clustering import kmeans_assign, kmeans_fit

    pq = os.path.join(work_dir, f"emb_{n}")
    if not os.path.exists(os.path.join(pq, "_SUCCESS")):
        synth_embeddings(spark, n, pq)
    emb = spark.read.parquet(pq)
    out: dict = {"op": "kmeans_fit", "n_vectors": n, "dim": DIM, "n_cells": n_cells}
    t0 = time.time()
    model = kmeans_fit(emb, n_cells=n_cells, id_col="vec_id", max_iters=5, tol=0.0)
    out["fit_sec"] = round(time.time() - t0, 2)
    out["iters"] = model.iters_run
    out["sec_per_iter"] = round(out["fit_sec"] / max(model.iters_run, 1), 2)
    out["mean_sim"] = round(model.mean_sim, 4)
    t0 = time.time()
    kmeans_assign(emb, model, vec_col="embedding").agg(
        {"cell": "max"}
    ).collect()
    out["assign_sec"] = round(time.time() - t0, 2)
    return out


def run_pq(spark, n: int, work_dir: str, k: int = 10, n_queries: int = 16) -> dict:
    """PQ scale point: end-to-end pq_topk (train on ≤50k sample → encode
    scan → ADC scan → exact re-rank) vs the brute-force exact scan on
    the same queries — wall time and recall@k. Both plans are single
    corpus scans, so the claim is near-linear wall growth with the PQ
    scan touching only m_sub-byte codes instead of dim-float vectors."""
    from pyspark.sql import functions as F

    from graphrole_spark.functions.similarity import brute_force_topk, pq_topk

    import numpy as np

    from graphrole_spark.functions.similarity import pq_encode, pq_train

    pq_dir = os.path.join(work_dir, f"emb_{n}")
    if not os.path.exists(os.path.join(pq_dir, "_SUCCESS")):
        synth_embeddings(spark, n, pq_dir)
    emb = spark.read.parquet(pq_dir)
    queries = emb.where(F.col("vec_id") % (n // n_queries) == 0)
    out: dict = {"op": "pq_topk", "n_vectors": n, "dim": DIM, "k": k,
                 "n_queries": n_queries}

    # build phase (once per corpus): train codebooks, encode, persist
    t0 = time.time()
    spdf = emb.select("embedding").limit(50_000).toPandas()
    S = np.stack([np.asarray(v, dtype=float) for v in spdf["embedding"]])
    S /= np.where(np.linalg.norm(S, axis=1) > 0,
                  np.linalg.norm(S, axis=1), 1.0)[:, None]
    books = pq_train(S, m_sub=8, n_codes=256)
    out["train_sec"] = round(time.time() - t0, 2)
    codes_dir = os.path.join(work_dir, f"pq_codes_{n}")
    t0 = time.time()
    pq_encode(emb, books).write.mode("overwrite").parquet(codes_dir)
    out["encode_sec"] = round(time.time() - t0, 2)

    # serve phase (per query batch): ADC over codes + exact re-rank
    codes = spark.read.parquet(codes_dir)
    t0 = time.time()
    approx = pq_topk(emb, queries, k=k, refine=4,
                     codebooks=books, codes=codes)
    a = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    out["search_sec"] = round(time.time() - t0, 2)
    t0 = time.time()
    exact = brute_force_topk(emb, queries, k=k)
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    out["bf_sec"] = round(time.time() - t0, 2)
    out["recall"] = round(len(a & e) / max(len(e), 1), 4)
    return out


def run_decontam(spark, n: int, work_dir: str, n_eval: int = 1000) -> dict:
    """Scale point for the two newest single-scan embedding ops:
    semantic_decontaminate (broadcast eval matrix, one Arrow matmul
    scan, no shuffle) and quantize_embeddings (pure JVM projection).
    Both plans are narrow maps over the corpus scan, so the claim under
    test is near-linear wall growth with corpus size; the eval side is
    held at ``n_eval`` so only the corpus axis moves."""
    from pyspark.sql import functions as F

    from graphrole_spark.functions.similarity import (
        quantize_embeddings,
        semantic_decontaminate,
    )

    pq = os.path.join(work_dir, f"emb_{n}")
    if not os.path.exists(os.path.join(pq, "_SUCCESS")):
        synth_embeddings(spark, n, pq)
    emb = spark.read.parquet(pq)
    ev = emb.where(F.col("vec_id") % max(n // n_eval, 1) == 0)
    out: dict = {"op": "decontam_quant", "n_vectors": n, "dim": DIM,
                 "n_eval": n_eval}
    t0 = time.time()
    flags = semantic_decontaminate(emb, ev, threshold=0.9)
    agg = flags.agg(
        F.sum(F.col("contaminated").cast("long")).alias("c"),
        F.count("*").alias("n"),
    ).first()
    out["decontam_sec"] = round(time.time() - t0, 2)
    out["n_contaminated"] = int(agg["c"])  # >= n_eval: self-hits at 1.0
    # sharded leg: an eval set LARGER than the broadcast budget — the
    # auto-sharding path (chained mapInPandas, one slice per pass).
    # 50k eval vecs x 64 dims x 8B = 25.6 MB against a 4 MB budget ->
    # 7 slices; flags must still count every planted self-hit.
    n_eval_big = min(n, 50_000)
    budget = 4 * 2**20
    ev_big = emb.where(
        F.col("vec_id") % max(n // n_eval_big, 1) == 0
    )
    n_eval_big_actual = ev_big.count()
    t0 = time.time()
    flags2 = semantic_decontaminate(
        emb, ev_big, threshold=0.9, max_eval_bytes=budget
    )
    agg2 = flags2.agg(
        F.sum(F.col("contaminated").cast("long")).alias("c")
    ).first()
    out["decontam_sharded_sec"] = round(time.time() - t0, 2)
    out["n_eval_sharded"] = int(n_eval_big_actual)
    out["sharded_eval_bytes"] = int(n_eval_big_actual * DIM * 8)
    out["sharded_budget_bytes"] = budget
    out["sharded_n_slices"] = -(-int(n_eval_big_actual * DIM * 8) // budget)
    out["n_contaminated_sharded"] = int(agg2["c"])
    t0 = time.time()
    q = quantize_embeddings(emb).agg(
        F.round(F.avg("recon_cos"), 6).alias("mean_cos"),
        F.round(F.min("recon_cos"), 6).alias("min_cos"),
    ).first()
    out["quant_sec"] = round(time.time() - t0, 2)
    out["mean_recon_cos"] = float(q["mean_cos"])
    out["min_recon_cos"] = float(q["min_cos"])
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default=None)  # default sweep only when
    # no other mode was requested — an explicit --sizes always runs
    ap.add_argument("--kmeans-sizes", default="")
    ap.add_argument("--pq-sizes", default="")
    ap.add_argument("--decontam-sizes", default="")
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--work-dir", default="/tmp/ann_scale")
    args = ap.parse_args()

    from graphrole_spark.session import get_spark

    spark = get_spark("ann_scale", cores=args.cpus)
    os.makedirs(args.work_dir, exist_ok=True)
    if args.kmeans_sizes:
        for n in [int(s) for s in args.kmeans_sizes.split(",")]:
            r = run_kmeans(spark, n, args.work_dir)
            r["cpus"] = args.cpus
            print(json.dumps(r), flush=True)
            with open("BENCH_ANN_SCALE.jsonl", "a") as f:
                f.write(json.dumps(r) + "\n")
    if args.pq_sizes:
        for n in [int(s) for s in args.pq_sizes.split(",")]:
            r = run_pq(spark, n, args.work_dir)
            r["cpus"] = args.cpus
            print(json.dumps(r), flush=True)
            with open("BENCH_ANN_SCALE.jsonl", "a") as f:
                f.write(json.dumps(r) + "\n")
        if args.sizes is None:
            return
    if args.decontam_sizes:
        for n in [int(s) for s in args.decontam_sizes.split(",")]:
            r = run_decontam(spark, n, args.work_dir)
            r["cpus"] = args.cpus
            print(json.dumps(r), flush=True)
            with open("BENCH_ANN_SCALE.jsonl", "a") as f:
                f.write(json.dumps(r) + "\n")
        if args.sizes is None:
            return
    if args.kmeans_sizes and args.sizes is None:
        return
    elif args.sizes is None:
        args.sizes = "5000,50000,500000"
    if not args.sizes:
        return
    for n in [int(s) for s in args.sizes.split(",")]:
        r = run(spark, n, args.work_dir)
        r["cpus"] = args.cpus
        print(json.dumps(r), flush=True)
        with open("BENCH_ANN_SCALE.jsonl", "a") as f:
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
