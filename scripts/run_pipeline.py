#!/usr/bin/env python
"""spark-submit entry point for the transcript feature pipeline.

Cluster usage (north_rule: spark-submit --py-files on multi-executor):

    zip -r graphrole_spark.zip graphrole_spark
    spark-submit --py-files graphrole_spark.zip scripts/run_pipeline.py \
        --input /data/transcripts --output /data/features \
        --checkpoint /data/ckpt --generations 5 --cutoff "2025-06-01T00:00:00"

Local smoke:

    python scripts/run_pipeline.py --synthesize 1000 --output /tmp/feats

Fit / transform / incremental (FeatureModel):

    # fit once, freeze the pruning decisions
    ... run_pipeline.py --input T0 --output /data/f0 --save-model /data/m.json
    # serve path: replay on the full table (zero per-generation actions)
    ... run_pipeline.py --input T --output /data/f --model /data/m.json
    # daily append: recompute only the touched conversations
    ... run_pipeline.py --input T --update-delta /data/delta \
        --prev-features /data/f0 --model /data/m.json --output /data/f1
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
    p.add_argument("--generations", type=int, default=None,
                   help="max recursion generations (fit default: 5; "
                        "resume default: the fitted run's own setting)")
    p.add_argument("--cutoff", default=None, help="point-in-time ISO timestamp")
    p.add_argument("--block-size", type=int, default=None,
                   help="halo-blocked chain windows: bound window-task size "
                        "under heavy-tail conversations (identical results)")
    p.add_argument("--resume", action="store_true", help="resume from --checkpoint")
    p.add_argument("--save-model", default=None,
                   help="after the fit, save the frozen FeatureModel "
                        "(pruning decisions + bin boundaries) as JSON here")
    p.add_argument("--model", default=None,
                   help="transform mode: replay a saved FeatureModel "
                        "(zero per-generation driver actions) instead of fitting")
    p.add_argument("--update-delta", default=None,
                   help="incremental mode: path of the appended turns; "
                        "recomputes only their conversations under --model, "
                        "reusing --prev-features for the rest")
    p.add_argument("--prev-features", default=None,
                   help="previous feature parquet for --update-delta")
    args = p.parse_args()

    from pyspark.sql import SparkSession

    # on a cluster, master/memory come from spark-submit; local fallback here
    spark = SparkSession.builder.appName("graphrole_spark_pipeline").getOrCreate()
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    from graphrole_spark.pipeline import extract_transcript_features
    from graphrole_spark.sources.transcripts import load_transcripts, synthesize_transcripts

    def write_and_report(feats, rfe, t0, **extra_stats) -> None:
        """Shared epilogue for every mode: write features, optionally
        save the fitted model, print one JSON stats line."""
        feats.write.mode("overwrite").parquet(args.output)
        if args.save_model:
            if rfe is None:
                p.error("--save-model needs a run that fits or resumes a "
                        "model (not --update-delta, which replays one)")
            rfe.fitted_model().save(args.save_model)
        n = spark.read.parquet(args.output).count()
        sec = time.time() - t0
        print(json.dumps({"rows": n, "seconds": round(sec, 2),
                          "rows_per_sec": round(n / sec, 1), **extra_stats}))

    if args.resume:
        # restart a killed run from its per-generation checkpoints: no
        # input scan, no recompute of finished generations — the
        # _lineage.json manifest carries aggs/depth/chain settings.
        # --generations HIGHER than the fitted depth extends a finished
        # run deeper; equal-or-lower reproduces the checkpointed output
        if not args.checkpoint:
            p.error("--resume requires --checkpoint")
        from graphrole_spark.operators.recursion import RecursiveFeatureExtractor

        with open(os.path.join(args.checkpoint, "_lineage.json")) as fh:
            if not json.load(fh).get("chain_keys"):
                p.error("--resume supports chain-mode checkpoints (the shape "
                        "this CLI writes); edge-mode runs resume via "
                        "RecursiveFeatureExtractor.resume(spark, dir, edges)")
        extra = (
            {"max_generations": args.generations}
            if args.generations is not None else {}
        )
        t0 = time.time()
        rfe = RecursiveFeatureExtractor.resume(spark, args.checkpoint, **extra)
        feats = rfe.extract_features()
        if "conv_id" in feats.columns:
            feats = feats.drop("node")
        write_and_report(feats, rfe, t0, resumed=True)
        return

    if args.synthesize:
        transcripts = synthesize_transcripts(spark, args.synthesize, seed=42)
    elif args.input:
        transcripts = load_transcripts(spark, args.input)
    else:
        p.error("provide --input or --synthesize")

    model = None
    if args.model:
        from graphrole_spark.operators.model import FeatureModel

        model = FeatureModel.load(args.model)

    t0 = time.time()
    if args.update_delta:
        if not (model and args.prev_features):
            p.error("--update-delta requires --model and --prev-features")
        from graphrole_spark.pipeline import update_transcript_features

        feats = update_transcript_features(
            transcripts,
            load_transcripts(spark, args.update_delta),
            spark.read.parquet(args.prev_features),
            model,
            chain_block_size=args.block_size,
        )
        rfe = None
    else:
        feats, rfe = extract_transcript_features(
            transcripts,
            cutoff_ts=args.cutoff,
            max_generations=5 if args.generations is None else args.generations,
            checkpoint_dir=args.checkpoint,
            chain_block_size=args.block_size,
            model=model,
            return_extractor=True,
        )
    write_and_report(feats, rfe, t0)


if __name__ == "__main__":
    main()
