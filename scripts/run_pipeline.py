#!/usr/bin/env python
"""spark-submit entry point for the transcript feature pipeline.

Cluster usage (north_rule: spark-submit --py-files on multi-executor):

    zip -r graphrole_spark.zip graphrole_spark
    spark-submit --py-files graphrole_spark.zip scripts/run_pipeline.py \
        --input /data/transcripts --output /data/features \
        --checkpoint /data/ckpt --generations 5 --cutoff "2025-06-01T00:00:00"

Local smoke:

    python scripts/run_pipeline.py --synthesize 1000 --output /tmp/feats
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", help="transcripts table path (parquet/iceberg)")
    p.add_argument("--synthesize", type=int, default=0, help="generate N synthetic conversations instead of reading --input")
    p.add_argument("--output", required=True)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--generations", type=int, default=5)
    p.add_argument("--cutoff", default=None, help="point-in-time ISO timestamp")
    p.add_argument("--block-size", type=int, default=None,
                   help="halo-blocked chain windows: bound window-task size "
                        "under heavy-tail conversations (identical results)")
    p.add_argument("--resume", action="store_true", help="resume from --checkpoint")
    args = p.parse_args()

    from pyspark.sql import SparkSession

    # on a cluster, master/memory come from spark-submit; local fallback here
    spark = SparkSession.builder.appName("graphrole_spark_pipeline").getOrCreate()
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    from graphrole_spark.pipeline import extract_transcript_features
    from graphrole_spark.sources.transcripts import load_transcripts, synthesize_transcripts

    if args.synthesize:
        transcripts = synthesize_transcripts(spark, args.synthesize, seed=42)
    elif args.input:
        transcripts = load_transcripts(spark, args.input)
    else:
        p.error("provide --input or --synthesize")

    t0 = time.time()
    feats = extract_transcript_features(
        transcripts,
        cutoff_ts=args.cutoff,
        max_generations=args.generations,
        checkpoint_dir=args.checkpoint,
        chain_block_size=args.block_size,
    )
    feats.write.mode("overwrite").parquet(args.output)
    n = spark.read.parquet(args.output).count()
    sec = time.time() - t0
    print(json.dumps({"rows": n, "seconds": round(sec, 2), "rows_per_sec": round(n / sec, 1)}))


if __name__ == "__main__":
    main()
