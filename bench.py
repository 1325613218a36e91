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

# Co-tenancy guard: every rep records the 1-minute load average sampled
# immediately BEFORE it starts, and a timed section earns extra reps
# (bounded) while every completed rep started above this threshold —
# so the published min comes from a quiet-window rep whenever one
# occurs, and the artifact self-documents contamination when none did
# (the round-3 driver artifact was 3x slow purely from sustained
# co-tenant load; min-of-3 absorbed bursts but not that).
LOAD1_MAX = float(os.environ.get("SPARK_GRAFT_BENCH_LOAD1_MAX", "8"))
LOAD_RETRIES = int(os.environ.get("SPARK_GRAFT_BENCH_LOAD_RETRIES", "2"))
# iterative layer (NMF / LPA / pagerank / role alignment): ONE bounded
# invocation each on a small FIXED input so round-over-round
# regressions are visible without letting fixpoint loops dominate the
# suite total; separate from "queries" so the headline protocol is
# unchanged
ITER_DIR = os.environ.get(
    "SPARK_GRAFT_BENCH_ITER_DIR", "/root/testdata/sf0.01"
)
RUN_ITERATIVE = os.environ.get("SPARK_GRAFT_BENCH_ITERATIVE", "1") == "1"


def timed_reps(fn, n_reps, prepare=None, extra=LOAD_RETRIES):
    """Run ``fn`` ``n_reps`` times — plus up to ``extra`` more while
    every completed rep started under load1 > LOAD1_MAX — returning
    ``(runs_sec, rep_load1)`` aligned by rep."""
    runs, loads = [], []
    while True:
        done = len(runs)
        if done >= n_reps and (
            any(l <= LOAD1_MAX for l in loads) or done >= n_reps + extra
        ):
            break
        if prepare is not None and done:
            prepare()
        l1 = os.getloadavg()[0]
        t0 = time.time()
        fn()
        runs.append(round(time.time() - t0, 3))
        loads.append(round(l1, 2))
    return runs, loads


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

    state: dict = {}

    def refex_prepare():
        # drop the previous fit's persisted generation frames —
        # cache-manager plan matching would otherwise serve them to
        # the re-run and time a cache read; re-pin input (untimed)
        spark.catalog.clearCache()
        transcripts.persist()
        transcripts.count()

    def refex_once():
        feats, rfe = extract_transcript_features(
            transcripts, max_generations=4, return_extractor=True
        )
        state["n_rows"] = feats.count()
        state["rfe"] = rfe

    refex_runs, refex_loads = timed_reps(
        refex_once, FLAGSHIP_REPEATS, prepare=refex_prepare
    )
    n_rows, rfe = state["n_rows"], state["rfe"]
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
    refex_prepare()

    def transform_once():
        extract_transcript_features(transcripts, model=model).write.format(
            "noop"
        ).mode("overwrite").save()

    transform_runs, transform_loads = timed_reps(transform_once, REPEATS)
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
    rep_loads: dict[str, list[float]] = {
        "refex_pipeline_synth": refex_loads,
        "refex_transform_synth": transform_loads,
    }
    for name in suite:
        runs, loads = timed_reps(
            lambda: queries[name](spark, SF_DIR)
            .write.format("noop")
            .mode("overwrite")
            .save(),
            REPEATS,
            extra=1,
        )
        timings[name] = min(runs)
        rep_loads[name] = loads

    # -- iterative layer: one bounded invocation each on a fixed input ----
    iterative: dict[str, float] = {}
    iterative_loads: dict[str, float] = {}
    if RUN_ITERATIVE:
        for name in (
            "rolx_roles", "role_align", "communities", "pagerank", "kcore"
        ):
            l1 = os.getloadavg()[0]
            t0 = time.time()
            queries[name](spark, ITER_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            iterative[name] = round(time.time() - t0, 3)
            iterative_loads[name] = round(l1, 2)

    total = round(sum(timings.values()), 3)
    payload = json.dumps(
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
                # co-tenancy self-description: load1 sampled before each
                # rep; a section whose reps ALL started above load1_max
                # already re-ran up to the retry budget — treat its min
                # as contaminated if min(rep_loads) is still above
                "load1_max": LOAD1_MAX,
                "rep_loads": rep_loads,
                "iterative": iterative,
                "iterative_loads": iterative_loads,
                "iterative_sf_dir": ITER_DIR if RUN_ITERATIVE else None,
            }
        )
    print(payload)
    # also land the SAME JSON on disk: the driver captures stdout, and
    # two rounds running have truncated that capture mid-line
    # (BENCH_r03/r04 "parsed: null") — BENCH_SELF.json guarantees a
    # parseable, rep-load-annotated artifact in the repo regardless
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "BENCH_SELF.json"), "w"
    ) as fh:
        fh.write(payload + "\n")


if __name__ == "__main__":
    main()
