#!/usr/bin/env python
"""Scale evidence for the conversation-grain operators
(functions/conversations.py): SFT example assembly, transcript
integrity audit, conversation-level exact dedup, and MinHash-LSH
conversation near-dup (the replayed-export clones double as planted
near-dup pairs — jaccard 1.0 — so the sweep reports recall on them).

Runs each operator at three synthetic-transcript sizes (decade steps in
conversation count, heavy-tail lengths included) and reports wall time
and output rows. All three are single-scan window/hash-agg plans keyed
on conv_id, so near-linear wall growth per decade is the expectation;
the one data-dependent quantity — the dedup fingerprint group size — is
reported too. To make conv_dedup's duplicate path do real work, every
41st conversation is written twice (a replayed-export clone with a
distinct conv_id), so ~2.4% of conversations form real duplicate
groups whose clone must be dropped.

The transcripts are synthesized with the same distributed deterministic
generator the flagship bench uses (sources/transcripts.py), written to
parquet once per size, so the measured pipeline reads parquet exactly
like production.

Usage: python scripts/conversation_scale.py [--sizes 10000,100000,1000000]
Appends one JSON line per size to BENCH_CONV_SCALE.jsonl.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CLONE_EVERY = 41


def synth(spark, n_convs: int, out_dir: str) -> None:
    from pyspark.sql import functions as F

    from graphrole_spark.sources.transcripts import synthesize_transcripts

    t = synthesize_transcripts(spark, n_convs)
    clones = t.where(
        F.pmod(F.xxhash64("conv_id"), F.lit(CLONE_EVERY)) == 0
    ).withColumn("conv_id", F.concat(F.col("conv_id"), F.lit("_replay")))
    t.unionByName(clones).write.mode("overwrite").parquet(out_dir)


REGEN_EVERY = 37


def synth_prefs(spark, src_pq: str, out_dir: str) -> None:
    """Preference-mining corpus derived from the base transcripts: every
    final turn forced to the assistant role (eligibility), and every
     37th conversation given a regenerated-final-turn alternative with a
    distinct conv_id — a true preference group of size 2."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    turns = spark.read.parquet(src_pq)
    w = Window.partitionBy("conv_id")
    mx = turns.select(
        "conv_id",
        "turn_idx",
        "role",
        "text",
        F.max("turn_idx").over(w).alias("__mx"),
    )
    is_final = F.col("turn_idx") == F.col("__mx")
    base = mx.select(
        "conv_id",
        "turn_idx",
        F.when(is_final, F.lit("assistant")).otherwise(F.col("role")).alias("role"),
        "text",
        "__mx",
    )
    alt = base.where(F.pmod(F.xxhash64("conv_id"), F.lit(REGEN_EVERY)) == 0).select(
        F.concat(F.col("conv_id"), F.lit("_regen")).alias("conv_id"),
        "turn_idx",
        "role",
        F.when(is_final, F.concat(F.lit("regenerated: "), F.col("text")))
        .otherwise(F.col("text"))
        .alias("text"),
        "__mx",
    )
    base.unionByName(alt).drop("__mx").write.mode("overwrite").parquet(out_dir)


def run(spark, n_convs: int, work_dir: str, ops: set[str]) -> dict:
    from pyspark.sql import functions as F

    from graphrole_spark.functions.conversations import (
        assemble_preference_pairs,
        assemble_sft_examples,
        conversation_duplicates,
        conversation_near_duplicates,
        transcript_integrity,
    )

    pq = os.path.join(work_dir, f"convs_{n_convs}")
    if not os.path.exists(os.path.join(pq, "_SUCCESS")):
        synth(spark, n_convs, pq)
    turns = spark.read.parquet(pq)
    out: dict = {
        "n_convs": n_convs,
        "n_turns": turns.count(),  # also warms the page cache for parity
    }

    if "sft" in ops:
        t0 = time.time()
        sft = assemble_sft_examples(turns, target_roles=("assistant",), max_tokens=256)
        row = sft.agg(
            F.count("*").alias("n"), F.sum("fits_budget").alias("n_fit")
        ).collect()[0]
        out["sft_sec"] = round(time.time() - t0, 2)
        out["sft_examples"] = int(row["n"])
        out["sft_fit_budget"] = int(row["n_fit"])

    if "integrity" in ops:
        t0 = time.time()
        integ = transcript_integrity(turns)
        row = integ.agg(
            F.count("*").alias("n"), F.sum("is_valid").alias("n_valid")
        ).collect()[0]
        out["integrity_sec"] = round(time.time() - t0, 2)
        out["integrity_convs"] = int(row["n"])
        out["integrity_valid"] = int(row["n_valid"])

    if "dedup" in ops:
        t0 = time.time()
        dd = conversation_duplicates(turns)
        row = dd.agg(
            F.count("*").alias("n"),
            F.sum(F.when(F.col("keep") == 0, 1).otherwise(0)).alias("n_dropped"),
            F.max("group_size").alias("max_group"),
        ).collect()[0]
        out["dedup_sec"] = round(time.time() - t0, 2)
        out["dedup_convs"] = int(row["n"])
        out["dedup_dropped"] = int(row["n_dropped"])
        out["dedup_max_group"] = int(row["max_group"])

    if "near_dup" in ops:
        t0 = time.time()
        nd = conversation_near_duplicates(turns, jaccard_threshold=0.8)
        planted_found = F.sum(
            F.when(
                F.col("conv_b") == F.concat(F.col("conv_a"), F.lit("_replay")), 1
            ).otherwise(0)
        )
        row = nd.agg(F.count("*").alias("n"), planted_found.alias("n_planted")).collect()[0]
        out["near_dup_sec"] = round(time.time() - t0, 2)
        out["near_dup_pairs"] = int(row["n"])
        out["near_dup_planted_found"] = int(row["n_planted"])
        out["near_dup_planted_total"] = int(
            turns.where(F.col("conv_id").endswith("_replay"))
            .select("conv_id")
            .distinct()
            .count()
        )

    if "pref" in ops:
        ppq = os.path.join(work_dir, f"prefs_{n_convs}")
        if not os.path.exists(os.path.join(ppq, "_SUCCESS")):
            synth_prefs(spark, pq, ppq)
        pref_turns = spark.read.parquet(ppq)
        t0 = time.time()
        pp = assemble_preference_pairs(pref_turns)
        # the regenerated alternative gains one token ("regenerated:") so it
        # wins the length-proxy score: a planted pair is recalled iff
        # chosen == rejected + "_regen"
        planted = F.sum(
            F.when(
                F.col("chosen_conv") == F.concat(F.col("rejected_conv"), F.lit("_regen")),
                1,
            ).otherwise(0)
        )
        row = pp.agg(F.count("*").alias("n"), planted.alias("n_planted")).collect()[0]
        out["pref_sec"] = round(time.time() - t0, 2)
        out["pref_pairs"] = int(row["n"])
        out["pref_planted_found"] = int(row["n_planted"])
        out["pref_planted_total"] = int(
            pref_turns.where(F.col("conv_id").endswith("_regen"))
            .select("conv_id")
            .distinct()
            .count()
        )

    if "compact" in ops:
        from graphrole_spark.functions.conversations import compact_trajectories

        # the generator's texts are single tokens, which makes elision a
        # no-op (nothing to save); give tool turns realistic 40-token
        # outputs so compaction does real work
        cpq = os.path.join(work_dir, f"compact_{n_convs}")
        if not os.path.exists(os.path.join(cpq, "_SUCCESS")):
            is_tool = F.length(F.trim(F.coalesce(F.col("tool"), F.lit("")))) > 0
            turns.select(
                "conv_id",
                "turn_idx",
                "role",
                F.when(
                    is_tool, F.rtrim(F.repeat(F.concat(F.col("text"), F.lit(" ")), 40))
                )
                .otherwise(F.col("text"))
                .alias("text"),
                "tool",
            ).write.mode("overwrite").parquet(cpq)
        compact_turns = spark.read.parquet(cpq)
        t0 = time.time()
        ct = compact_trajectories(compact_turns, max_tokens=256, keep_last=2)
        row = ct.agg(
            F.count("*").alias("n"),
            F.sum("elided").alias("n_elided"),
            F.countDistinct(
                F.when(F.col("conv_fits") == 0, F.col("conv_id"))
            ).alias("unfit_convs"),
        ).collect()[0]
        out["compact_sec"] = round(time.time() - t0, 2)
        out["compact_elided"] = int(row["n_elided"])
        out["compact_unfit_convs"] = int(row["unfit_convs"])

    if "merge" in ops:
        from graphrole_spark.functions.conversations import (
            merge_consecutive_turns,
        )

        t0 = time.time()
        mg = merge_consecutive_turns(turns)
        row = mg.agg(
            F.count("*").alias("n"),
            F.sum("n_merged").alias("n_src"),
            F.max("n_merged").alias("max_run"),
        ).collect()[0]
        out["merge_sec"] = round(time.time() - t0, 2)
        out["merge_turns_out"] = int(row["n"])
        out["merge_turns_in"] = int(row["n_src"])
        out["merge_max_run"] = int(row["max_run"])

    if "render" in ops:
        from graphrole_spark.functions.conversations import (
            render_conversations,
        )

        t0 = time.time()
        rc = render_conversations(turns)
        row = rc.agg(
            F.count("*").alias("n"),
            F.sum("n_chars").alias("chars"),
            F.max("n_chars").alias("max_chars"),
        ).collect()[0]
        out["render_sec"] = round(time.time() - t0, 2)
        out["render_convs"] = int(row["n"])
        out["render_chars"] = int(row["chars"])
        out["render_max_chars"] = int(row["max_chars"])

    if "highlights" in ops:
        from graphrole_spark.functions.conversations import (
            conversation_highlights,
        )

        t0 = time.time()
        hl = conversation_highlights(turns, k=3)
        row = hl.agg(
            F.count("*").alias("n"),
            F.round(F.avg("salience"), 2).alias("mean_sal"),
        ).collect()[0]
        out["highlights_sec"] = round(time.time() - t0, 2)
        out["highlights_rows"] = int(row["n"])
        out["highlights_mean_salience"] = float(row["mean_sal"])
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="10000,100000,1000000")
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--work-dir", default="/tmp/conversation_scale")
    ap.add_argument(
        "--ops",
        default="sft,integrity,dedup,near_dup,pref,compact,highlights,merge,render",
        help="comma list of stages to run (quiet-window remeasure of one op)",
    )
    args = ap.parse_args()

    from graphrole_spark.session import get_spark

    spark = get_spark("conversation_scale", cores=args.cpus)
    os.makedirs(args.work_dir, exist_ok=True)
    ops = {s.strip() for s in args.ops.split(",") if s.strip()}
    for n in [int(s) for s in args.sizes.split(",") if s]:
        r = run(spark, n, args.work_dir, ops)
        r["cpus"] = args.cpus
        print(json.dumps(r), flush=True)
        with open("BENCH_CONV_SCALE.jsonl", "a") as f:
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
