"""Physical-plan regression guards.

The engine's 100TB story rests on specific plan shapes (PERF.md); these
tests pin them so a future change that silently reintroduces a shuffle
or breaks pushdown fails CI, not a cluster run.
"""

import pytest
from pyspark.sql import functions as F

from graphrole_spark.pipeline import chain_seed_features, extract_transcript_features
from graphrole_spark.sources.transcripts import synthesize_transcripts


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


@pytest.fixture(scope="module")
def transcripts(spark, tmp_path_factory):
    # parquet round-trip: a clean scan leaf, so exchange counts below
    # measure OUR plan (a cached/synthesized source renders its own
    # build plan — including its exchanges — inside the tree)
    p = str(tmp_path_factory.mktemp("plan") / "t.parquet")
    synthesize_transcripts(spark, 20, seed=5).write.parquet(p)
    return spark.read.parquet(p)


def test_chain_seeds_single_exchange(spark, transcripts):
    """Seed features (sessionize + attributes + closed forms) must cost
    ONE hash exchange on conv_id — the fused single-pass select."""
    plan = _plan(chain_seed_features(transcripts, with_attributes=True))
    n_exchange = plan.count("Exchange hashpartitioning")
    assert n_exchange == 1, plan[:4000]


def test_prune_false_recursion_exchange_free_after_seeds(spark, transcripts):
    """Fixed-depth no-prune recursion = lazy window stack; the whole
    3-generation plan still contains exactly the seed exchange."""
    feats = extract_transcript_features(
        transcripts, max_generations=3, with_attributes=False
    )
    # with pruning the per-generation plans read from caches; use the
    # lazy prune=False configuration to see the full end-to-end plan
    from graphrole_spark.operators.recursion import RecursiveFeatureExtractor

    seeds = chain_seed_features(transcripts, with_attributes=False)
    rfe = RecursiveFeatureExtractor(
        seed_frame=seeds, chain_keys=("conv_id", "turn_idx"),
        max_generations=3, prune=False,
    )
    plan = _plan(rfe.extract_features())
    assert plan.count("Exchange hashpartitioning") == 1, plan[:4000]


def test_transform_recursion_single_exchange(spark, transcripts):
    """Frozen-model transform (the serve path): the whole fitted-depth
    recursion — including its pruning decisions — must compile to one
    lazy plan with exactly the seed exchange, exactly like prune=False,
    even though the fit used data-dependent pruning."""
    from graphrole_spark.pipeline import fit_transcript_features

    _, model = fit_transcript_features(transcripts, max_generations=3)
    # drop the fit's persisted frames: cache-manager plan matching would
    # otherwise substitute InMemoryRelations (whose rendered build plans
    # include their exchanges) into the transform's tree
    spark.catalog.clearCache()
    out = extract_transcript_features(transcripts, model=model)
    plan = _plan(out)
    assert plan.count("Exchange hashpartitioning") == 1, plan[:4000]


def test_parquet_scan_prunes_columns(spark):
    """Filter + projection reach the parquet scan (ReadSchema pruned)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    q = docs.where(F.col("doc_id") < 100).select("doc_id", F.length("text"))
    plan = _plan(q)
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in plan, plan
    assert "PushedFilters: [" in plan and "LessThan(doc_id,100)" in plan, plan


def test_join_agg_broadcasts_dimension(spark):
    """Small dimension side must broadcast (no shuffle of the fact)."""
    import __spark_entry__ as e

    plan = _plan(e.queries()["groupby_agg"](spark, "/root/testdata/sf0.001"))
    assert "BroadcastHashJoin" in plan, plan[:4000]


def test_asof_join_single_exchange(spark):
    """One bare backward as-of = exactly one hash exchange (the union
    repartition); the registry's `asof_directions` entry unions four of
    these, so the plan-shape pin targets the operator directly."""
    from pyspark.sql import functions as F

    from graphrole_spark.temporal.asof import asof_join

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    probes = events.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    refs = events.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    plan = _plan(asof_join(probes, refs, ["user_id"], "ts", "ts", ["value"]))
    assert plan.count("Exchange hashpartitioning") == 1, plan[:4000]


def test_vocab_coverage_plan_shape(spark):
    """Vocabulary top-K must compile to the distributed
    TakeOrderedAndProject (per-partition heaps), never a global sort,
    and the membership join must broadcast the vocabulary."""
    from graphrole_spark.functions.text import vocab_coverage

    docs = spark.createDataFrame(
        [(i, f"tok{i % 7} common") for i in range(100)], "doc_id long, text string"
    )
    plan = (
        vocab_coverage(docs, vocab_size=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    assert "rangepartitioning" not in plan      # no global sort exchange


def test_dedup_lines_plan_shape(spark):
    """Line dedup: the frequent-line set must come back as a BROADCAST
    join (never a shuffled join of the full line stream against it),
    and the plan costs exactly three hash exchanges: the two-phase
    distinct aggregation for count_distinct(doc_id) per line (partial
    distinct map-side, so already-deduped pairs shuffle) plus the
    per-doc rebuild."""
    from graphrole_spark.functions.text import dedup_lines

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = _plan(dedup_lines(docs))
    assert "BroadcastHashJoin" in plan
    assert plan.count("Exchange hashpartitioning") == 3, plan[:4000]


def test_dsir_plan_shape(spark):
    """DSIR: the log-ratio dim broadcasts into the scoring pass, the
    selection cut is the distributed TakeOrderedAndProject (never a
    global sort exchange), and the top-k flag broadcasts. Since the r5
    bonus round, dsir_select localCheckpoints the scores frame, so the
    scoring-pass shape is asserted on dsir_scores' own (pre-barrier)
    plan and the select plan only shows the cut + flag join."""
    from graphrole_spark.functions.importance import dsir_scores, dsir_select

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    target = docs.where(F.col("lang") == "en")
    scores_plan = _plan(dsir_scores(docs, target))
    # the log-ratio dim is an explicit broadcast into the scoring pass
    # (the outer id join is left to the planner / AQE)
    assert scores_plan.count("BroadcastHashJoin") >= 1, scores_plan[:4000]
    plan = _plan(dsir_select(docs, target, k=10))
    assert "TakeOrderedAndProject" in plan
    assert "rangepartitioning" not in plan
    assert plan.count("BroadcastHashJoin") >= 1, plan[:4000]
    # subset mode replaces the target-side gram explode with an id
    # semi-join against the already-exploded raw stream (the explode
    # count itself is not assertable here: the persisted raw_g lineage
    # is printed once per referencing branch)
    sub_plan = _plan(dsir_scores(docs, target, target_within_raw=True))
    assert "LeftSemi" in sub_plan, sub_plan[:4000]


def test_scd2_history_single_exchange(spark, transcripts, tmp_path_factory):
    """SCD2 history = two window passes over ONE key sort: exactly one
    hash exchange on the key, and the second window (valid_to lead)
    must reuse the first's partitioning rather than re-shuffling."""
    from graphrole_spark.temporal.scd import scd2_history

    p = str(tmp_path_factory.mktemp("scd") / "e.parquet")
    transcripts.select(
        F.col("conv_id").alias("k"), F.col("ts").alias("t"),
        F.col("role").alias("attr"),
    ).write.parquet(p)
    changes = spark.read.parquet(p)
    plan = _plan(scd2_history(changes, ["k"], "t", ["attr"]))
    assert plan.count("Exchange hashpartitioning") == 1, plan[:4000]


def test_normalize_projection_shuffle_free(spark, transcripts, tmp_path_factory):
    """normalize_features' apply pass is a pure projection: after the
    driver-side moment fit, the output plan contains NO exchange (the
    fit itself is a separate one-agg job not part of this plan)."""
    from graphrole_spark.operators.normalize import normalize_features

    p = str(tmp_path_factory.mktemp("norm") / "f.parquet")
    transcripts.select(
        "conv_id", "turn_idx", F.length("text").cast("double").alias("f"),
    ).write.parquet(p)
    feats = spark.read.parquet(p)
    plan = _plan(normalize_features(feats, ["f"], method="zscore"))
    assert "Exchange" not in plan, plan[:4000]


def test_target_encode_prefix_single_exchange(spark, transcripts, tmp_path_factory):
    """prefix target encoding is ONE category-keyed exchange (the
    running-mean RANGE window); the broadcast prior adds no shuffle."""
    from graphrole_spark.operators.encode import target_encode

    p = str(tmp_path_factory.mktemp("enc") / "e.parquet")
    transcripts.select(
        "conv_id", "ts", F.col("role").alias("cat"),
        F.length("text").cast("double").alias("label"),
    ).write.parquet(p)
    df = spark.read.parquet(p)
    plan = _plan(target_encode(df, "cat", "label", method="prefix"))
    assert plan.count("Exchange hashpartitioning") == 1, plan[:4000]


def test_target_encode_oof_fact_side_broadcast_join(spark, transcripts, tmp_path_factory):
    """oof encoding joins the tiny (cat, fold) table back via broadcast:
    the fact table itself is never hash-exchanged."""
    from graphrole_spark.operators.encode import target_encode

    p = str(tmp_path_factory.mktemp("enc2") / "e.parquet")
    transcripts.select(
        "conv_id", "turn_idx", F.col("role").alias("cat"),
        F.length("text").cast("double").alias("label"),
    ).write.parquet(p)
    df = spark.read.parquet(p)
    out = target_encode(
        df, "cat", "label", method="oof", id_col="turn_idx", n_folds=3
    )
    plan = _plan(out)
    assert "BroadcastHashJoin" in plan, plan[:4000]


def test_weighted_sample_global_is_take_ordered(spark):
    """Global weighted_sample compiles to TakeOrderedAndProject — each
    partition keeps its local top-n, no corpus-wide sort (the
    docstring's claimed plan)."""
    from graphrole_spark.functions.corpus import weighted_sample

    docs = spark.createDataFrame(
        [(i, float(i % 7 + 1)) for i in range(100)], "doc_id long, w double"
    )
    plan = _plan(weighted_sample(docs, n=5, weight_col="w"))
    assert "TakeOrderedAndProject" in plan, plan[:2000]
    # the only full Sort allowed is the bounded <=n-row rank window
    assert plan.count("Exchange rangepartitioning") == 0, plan[:2000]


def test_bootstrap_ci_partial_combines_before_shuffle(spark):
    """The exploded (row × replicate) stream must partial-aggregate
    map-side: the shuffle carries groups × n_boot rows, never the
    exploded stream."""
    from graphrole_spark.functions.evaluation import bootstrap_ci

    df = spark.createDataFrame(
        [(i, "g", float(i)) for i in range(50)], "rid long, grp string, v double"
    )
    plan = _plan(bootstrap_ci(df, "v", ["grp"], n_boot=20, id_col="rid"))
    assert "Generate explode" in plan
    assert "partial_sum" in plan, plan[:3000]


def test_cooccurrence_no_cartesian(spark):
    """The pair join is an equi-join on the context key — no
    cartesian/broadcast-nested-loop anywhere in the plan."""
    from graphrole_spark.functions.cooccur import cooccurrence_edges

    df = spark.createDataFrame(
        [(i % 9, f"i{i % 4}") for i in range(60)], "ctx long, item string"
    )
    plan = _plan(cooccurrence_edges(df, ["ctx"], "item"))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_isotonic_apply_is_pure_projection(spark):
    """The step-function apply is a WHEN-tree projection: no joins, no
    exchanges added beyond the input's own plan."""
    from graphrole_spark.functions.calibration import isotonic_apply

    scored = spark.createDataFrame(
        [(float(i),) for i in range(20)], "score double"
    )
    mapping = spark.createDataFrame(
        [(0.0, 0.1), (5.0, 0.4), (12.0, 0.9)],
        "score_from double, calibrated double",
    )
    plan = _plan(isotonic_apply(scored, mapping))
    assert "Join" not in plan
    assert "Exchange" not in plan


def test_top_ngrams_single_lazy_arrow_pass(spark):
    """The r6 rewrite: ONE lazy Arrow counting pass — no Generate
    (gram explode) anywhere, no second corpus scan for display
    strings, the top-k cut planned as TakeOrderedAndProject (never a
    global sort exchange), and the frame is lazy (construction runs no
    jobs — the pre-r6 form collected pass-1 winners at call time)."""
    from graphrole_spark.functions.text import top_ngrams

    docs = spark.createDataFrame(
        [(i, "the same boilerplate line " + f"tail{i}") for i in range(30)],
        "doc_id long, text string",
    )
    out = top_ngrams(docs, n=3, k=5, min_docs=2)
    plan = _plan(out)
    assert "Generate" not in plan, plan[:3000]
    assert "MapInPandas" in plan or "ArrowEvalPython" in plan, plan[:3000]
    assert "TakeOrderedAndProject" in plan, plan[:3000]
    assert plan.count("Scan ") <= 1 or plan.count("FileScan") <= 1


def test_conv_decontam_zero_corpus_shuffle(spark):
    """Registry `conv_decontam`: hashed conversation vectors + broadcast
    eval matmul — the corpus side must never hash-exchange (the plan is
    narrow maps over the conversation aggregate's single keyed shuffle)."""
    import __spark_entry__ as e

    q = e.queries().get("conv_decontam")
    if q is None:
        import pytest as _p
        _p.skip("conv_decontam not in registry")
    plan = _plan(q(spark, "/root/testdata/sf0.001"))
    # one keyed exchange builds per-conversation vectors; the decontam
    # scoring itself adds none
    assert plan.count("Exchange hashpartitioning") <= 1, plan[:4000]


def test_curate_transcripts_stage_boundaries(spark):
    """Registry `transcript_pipeline` (functions/conversations.py::
    curate_transcripts): the 6-stage composition's docstring claims the
    fan-out boundaries are id-only localCheckpoints — so the FINAL SFT
    frame's physical plan must hang off the two checkpointed boundary
    RDDs (post-integrity turns, post-dedup survivors) and pay only the
    assembly's own two keyed exchanges, never re-executing the
    integrity/dedup machinery inline (r4 VERDICT stretch item: pin the
    stage-count claim like preference_pairs' exchange pin)."""
    import __spark_entry__ as e

    plan = _plan(
        e._all_queries()["transcript_pipeline"](
            spark, "/root/testdata/sf0.001"
        )
    )
    assert plan.count("Scan ExistingRDD") == 2, plan[:4000]
    assert plan.count("Exchange hashpartitioning") == 2, plan[:4000]
