#!/usr/bin/env python
"""Scale evidence for the evaluation/encoding layer (round-3 additions).

Runs majority_vote, binary_metrics, target_encode(prefix) and
dawid_skene over deterministic synthetic tables at 1e5 / 1e6 / 1e7 rows
(votes / scored examples / events) and reports wall time plus the
quantities that bound each operator's cost: distinct-score histogram
size for the rank-AUC (the only thing its windows ever sort) and the
per-item vote contingency for the EM loop. Near-linear growth = the
hash-aggregate shapes hold at scale.

Everything is synthesized JVM-side (xxhash64 pure functions of row id),
written to parquet once per size so the measured pipeline reads parquet
exactly like production.

Usage: python scripts/eval_scale.py [--sizes 100000,1000000,10000000]
       [--ds-max 1000000]
Appends one JSON line per size to BENCH_EVAL_SCALE.jsonl.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synth(spark, n: int, out_dir: str):
    """One row per vote/example: n/5 items x 5 workers; 3-class labels
    with per-worker reliability; a [0,1] two-decimal score correlated
    with a binary label; an event_type/value/ts triple for encoding."""
    from pyspark.sql import functions as F

    rows = spark.range(n)
    item = (F.col("id") / 5).cast("long")
    worker = F.pmod(F.col("id"), F.lit(5)).cast("int")
    truth = F.pmod(F.xxhash64(item, F.lit(1)), F.lit(3))
    acc = F.element_at(
        F.array(F.lit(95), F.lit(90), F.lit(70), F.lit(45), F.lit(15)),
        worker + 1,
    )
    u = F.pmod(F.xxhash64(F.col("id"), F.lit(2)), F.lit(100))
    wrong = F.pmod(truth + 1 + u % 2, F.lit(3))
    label3 = F.when(u < acc, truth).otherwise(wrong)
    y = F.pmod(F.xxhash64(F.col("id"), F.lit(3)), F.lit(2))
    noise = F.pmod(F.xxhash64(F.col("id"), F.lit(4)), F.lit(1000)) / 1000.0
    score = F.round(0.25 * y + 0.75 * noise, 2)  # overlapping classes
    ts = F.timestamp_seconds(
        F.lit(1704067200) + F.pmod(F.xxhash64(F.col("id"), F.lit(5)), F.lit(86400 * 30))
    )
    cat = F.concat(
        F.lit("t"),
        F.pmod(F.xxhash64(F.col("id"), F.lit(6)), F.lit(50)).cast("string"),
    )
    value = F.pmod(F.xxhash64(F.col("id"), F.lit(7)), F.lit(10000)) / 100.0
    rows.select(
        F.col("id").alias("row_id"),
        item.cast("string").alias("item_id"),
        F.concat(F.lit("w"), worker.cast("string")).alias("worker_id"),
        F.concat(F.lit("c"), label3.cast("string")).alias("label"),
        y.cast("int").alias("y"),
        score.alias("score"),
        cat.alias("event_type"),
        value.alias("value"),
        ts.alias("ts"),
    ).write.mode("overwrite").parquet(out_dir)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="100000,1000000,10000000")
    ap.add_argument("--ds-max", type=int, default=1_000_000)
    ap.add_argument("--out", default="BENCH_EVAL_SCALE.jsonl")
    args = ap.parse_args()

    from graphrole_spark.session import get_spark
    from graphrole_spark.functions.evaluation import (
        binary_metrics,
        dawid_skene,
        majority_vote,
    )
    from graphrole_spark.operators.encode import target_encode

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("eval_scale", cores=cpus, shuffle_partitions=cpus)
    work = tempfile.mkdtemp(prefix="eval_scale_")
    try:
        for n in [int(s) for s in args.sizes.split(",")]:
            p = f"{work}/t_{n}.parquet"
            synth(spark, n, p)
            df = spark.read.parquet(p)
            rec = {"n_rows": n, "cpus": cpus}

            t0 = time.time()
            nv = majority_vote(df).count()
            rec["vote_items"] = nv
            rec["vote_sec"] = round(time.time() - t0, 2)

            t0 = time.time()
            bm = binary_metrics(
                df.select(df.y.alias("label"), "score")
            ).collect()[0]
            rec["auc"] = round(bm["auc"], 4)
            rec["auc_sec"] = round(time.time() - t0, 2)
            rec["distinct_scores"] = df.select("score").distinct().count()

            t0 = time.time()
            target_encode(
                df.select("event_type", "value", "ts"),
                "event_type",
                "value",
                method="prefix",
            ).write.format("noop").mode("overwrite").save()
            rec["encode_sec"] = round(time.time() - t0, 2)

            if n <= args.ds_max:
                t0 = time.time()
                assign, _workers = dawid_skene(df, n_iter=3)
                rec["ds_items"] = assign.count()
                rec["ds_sec"] = round(time.time() - t0, 2)

            print(json.dumps(rec), flush=True)
            with open(args.out, "a") as f:
                f.write(json.dumps(rec) + "\n")
            shutil.rmtree(p, ignore_errors=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
