#!/usr/bin/env python
"""Benchmark driver: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": <total sec>, "unit": "sec", "queries": {...},
 "sf": ..., "turns_per_sec": ...}

The flagship metric is ReFeX transcript-feature throughput (turns/sec,
BASELINE.md) measured on a deterministic synthetic transcript table
sized to the scale factor; the remaining entries time the temporal /
dedup / similarity operator suite on the shared testdata tables.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# synthetic transcript scale: ~22 turns/conversation mean
N_CONVS = int(os.environ.get("SPARK_GRAFT_BENCH_CONVS", "40000"))


def main() -> None:
    from graphrole_spark.session import get_spark

    spark = get_spark("graphrole_spark_bench", cores=CPUS)
    sf = SF_DIR.rstrip("/").split("sf")[-1]

    import __spark_entry__ as entrymod
    from graphrole_spark.pipeline import extract_transcript_features
    from graphrole_spark.sources.transcripts import synthesize_transcripts

    timings: dict[str, float] = {}

    # Protocol: min-of-2 per timed section. Co-tenant load on this VM
    # swings identical runs 3-5x (BENCH.md); a single draw makes the
    # round-over-round comparison noise, min-of-2 recovers the
    # comparable statistic at 2x bench wall time.
    REPEATS = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "2"))
    # The flagship is the headline metric and its single reps swing up
    # to 4x under co-tenant load (BENCH.md noise section), so it gets
    # one extra rep: min-of-3 by default vs min-of-2 for the suite.
    FLAGSHIP_REPEATS = int(
        os.environ.get("SPARK_GRAFT_BENCH_FLAGSHIP_REPEATS", str(max(REPEATS, 3)))
    )

    # -- flagship: ReFeX over synthetic transcripts (turns/sec) ------------
    transcripts = synthesize_transcripts(spark, N_CONVS, seed=42).persist()
    n_turns = transcripts.count()

    refex_runs = []
    for rep in range(FLAGSHIP_REPEATS):
        if rep:
            # drop the previous fit's persisted generation frames —
            # cache-manager plan matching would otherwise serve them to
            # the re-run and time a cache read; re-pin input (untimed)
            spark.catalog.clearCache()
            transcripts = transcripts.persist()
            transcripts.count()
        t0 = time.time()
        feats, rfe = extract_transcript_features(
            transcripts, max_generations=4, return_extractor=True
        )
        n_rows = feats.count()
        refex_runs.append(round(time.time() - t0, 3))
    refex_sec = min(refex_runs)
    timings["refex_pipeline_synth"] = refex_sec
    turns_per_sec = n_turns / refex_sec

    # -- serve path: replay the frozen model (fit/transform split) ---------
    # same features, but the recursion is ONE lazy plan with zero
    # per-generation driver actions — the configuration for transforming
    # the full-scale table with a model fitted on a sample
    model = rfe.fitted_model()
    # drop the fit's persisted generation frames — cache-manager plan
    # matching would otherwise serve them to the transform and time a
    # cache read instead of the recursion; re-pin the input (untimed)
    spark.catalog.clearCache()
    transcripts = transcripts.persist()
    transcripts.count()
    transform_runs = []
    for _ in range(REPEATS):
        t0 = time.time()
        extract_transcript_features(transcripts, model=model).write.format(
            "noop"
        ).mode("overwrite").save()
        transform_runs.append(round(time.time() - t0, 3))
    transform_sec = min(transform_runs)
    timings["refex_transform_synth"] = transform_sec
    transcripts.unpersist()

    # -- operator suite on the shared sf tables ------------------------------
    # (every queries() entry except the NMF-driven rolx_roles /
    # rolx_multicutoff, whose iterative factorization would dominate the
    # suite total, and streaming_dedup, which re-runs the whole minhash +
    # CC stack twice against a disk store per invocation; pytest covers
    # both, and the driver's correctness harness still runs rolx)
    suite = [
        "session_features",
        "lag_lead_rank",
        "backfill",
        "prefix_agg",
        "asof_directions",
        "interval_count",
        "time_rollups",
        "streaming_sessions",
        "streaming_state",
        "egonet",
        "lang_guess",
        "vocab_coverage",
        "degree_undirected",
        "degree_directed",
        "chain_seeds",
        "refex_gen1",
        "refex_gen2",
        "refex_transform",
        "refex_multicutoff",
        "pit_training_set",
        "log_binning",
        "groupby_agg",
        "set_ops",
        "rollup_cube",
        "sft_examples",
        "turn_integrity",
        "conv_dedup",
        "tool_transitions",
        "conv_near_dup",
        "preference_pairs",
        "compact_trajectories",
        "conv_split",
        "merge_turns",
        "group_advantages",
        "compression",
        "cap_duplicates",
        "conv_decontam",
        "gopher_filter",
        "render_chat",
        "top_ngrams",
        "transcript_pipeline",
        "scd2",
        "feature_scale",
        "temporal_split",
        "encoding_quality",
        "dedup_exact",
        "corpus_clean",
        "quality",
        "pack_greedy",
        "chunk_documents",
        "split_sample",
        "media_features",
        "minhash_dedup",
        "dedup_clusters",
        "ngram_jaccard",
        "dup_ngrams",
        "dedup_lines",
        "dsir_weights",
        "feature_drift",
        "dedup_spans",
        "rolling_fingerprint",
        "simhash_dedup",
        "cosine_topk",
        "cosine_dedup",
        "semantic_dedup",
        "pii_redact",
        "tfidf_topk",
        "lm_score",
        "lsh_topk",
        "ivf_topk",
        "mix_corpus",
        "decontaminate",
        "corpus_pipeline",
        "training_shards",
        "kmeans_cells",
        "quality_classifier",
        "diversify",
        "bpe_tokenizer",
        "tokenize_pack",
        "temperature_mix",
        "pq_topk",
        "bm25_topk",
        "detect_loops",
        "upsample_corpus",
        "corpus_stats",
        "corpus_diff",
        "semantic_decontam",
        "quantize_embeddings",
        "conv_highlights",
        "conv_vectors",
        "topic_shift",
        "turn_signals",
        "curriculum",
        "label_quality",
        # truth_inference excluded like rolx_roles: the Dawid-Skene EM
        # loop's per-iteration materialization would dominate the suite
        # total; pytest + the registry still cover it
        "retrieval_eval",
        "classifier_eval",
        "bt_leaderboard",
        "target_encode",
        "feature_relevance",
        "weighted_sample",
        "dedup_weights",
        "source_overlap",
        "hybrid_search",
        "dq_checks",
        "resample",
        "funnel",
        "cohort_retention",
        "rolling_anomalies",
        "ab_test",
        "kaplan_meier",
        "skew_join",
        "split_leakage",
        "rank_normalize",
        "pass_at_k",
        "multiclass_eval",
        "future_label",
        "calibrate",
        "triangles",
        "bootstrap_ci",
        "json_profile",
        "cooccur_pmi",
        "link_prediction",
        "k_anonymity",
        "fuzzy_link",
        "seasonal_anomalies",
        "injection_signals",
        "conformal",
        "overlap_join",
        "forecast_baseline",
        # role_align excluded like rolx_roles: two NMF fits per
        # invocation; pytest + registry cover it. communities (LPA, 6
        # checkpointed half-steps) and pagerank (8 checkpointed
        # iterations) excluded for the same reason; both remain
        # driver-registry entries and have their own scale sweeps
        # (BENCH_GRAPH_SCALE.jsonl)
    ]
    queries = entrymod.queries()
    for name in suite:
        best = None
        for _ in range(REPEATS):
            t0 = time.time()
            queries[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            sec = round(time.time() - t0, 3)
            best = sec if best is None else min(best, sec)
        timings[name] = best

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "refex_transcript_feature_extraction+operator_suite",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "turns": n_turns,
                "feature_rows": n_rows,
                "turns_per_sec": round(turns_per_sec, 1),
                "transform_turns_per_sec": round(n_turns / transform_sec, 1),
                "cpus": CPUS,
                "protocol": f"min_of_{REPEATS}",
                "refex_runs": refex_runs,
                "transform_runs": transform_runs,
            }
        )
    )


if __name__ == "__main__":
    main()
