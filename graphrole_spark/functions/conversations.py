"""Conversation-level operators over multi-turn transcript tables.

The engine's canonical payload is a transcripts table
``(conv_id, turn_idx, role, text, tool, ts)`` (BASELINE.json
input_hint). The operators here are the conversation-granularity
stages an LLM training-data pipeline runs AFTER document-style
cleaning: assemble supervised-fine-tuning examples under a token
budget, audit transcript structural integrity, and deduplicate whole
conversations by content.

All three are pure DataFrame plans — windows and hash aggregates, no
Python UDFs — and every output column is reproducible in ANSI SQL, so
each has a DuckDB value oracle in ``__spark_entry__.oracle_sql``.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from graphrole_spark.functions.text import token_count

# unit separator for the conversation fingerprint: it cannot appear in
# the synthetic corpora and makes (turn_idx, role, text) concatenation
# injective for ordinary text
_FIELD_SEP = "\x1f"


def assemble_sft_examples(
    turns: DataFrame,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    target_roles: Sequence[str] = ("assistant",),
    max_tokens: int = 512,
) -> DataFrame:
    """One supervised-fine-tuning example per target-role turn: the
    turn itself plus as much preceding context as a token budget admits.

    The whole assembly is two window passes over ONE hash exchange on
    ``conv_col`` — no self-join, no per-target rescan:

    1. ``cum`` = running whitespace-token count per conversation in turn
       order (each turn costs ``max(1, tokens)`` so ``cum`` is strictly
       increasing and the RANGE frame below never sees ties).
    2. A constant-bound RANGE frame ordered by ``cum``:
       ``RANGE BETWEEN max_tokens PRECEDING AND 1 PRECEDING`` counts
       exactly the prior turns ``j`` with ``cum_i - cum_j <= max_tokens``
       — i.e. every turn whose *successors up through the target* fit
       the budget.

    TRUNCATION SEMANTICS (straddle bound, same contract as
    :func:`graphrole_spark.functions.corpus.pack_documents`): the budget
    bounds the tokens strictly AFTER each kept context turn, so the
    OLDEST kept turn may straddle the boundary — an example's total
    token count is ``< max_tokens + oldest_context_turn_tokens``. The
    emitted ``fits_budget`` flag marks examples that are fully inside
    the budget including the target's own tokens; callers needing a
    hard cap filter on it or drop the oldest context turn.

    Output grain: one row per target turn —
    ``(conv_col, order_col, n_context_turns, context_tokens,
    target_tokens, example_tokens, fits_budget, len_bucket)``.
    ``len_bucket`` is the pad-to-64 batching bucket
    (``floor((example_tokens - 1) / 64)``) so a downstream batcher can
    group examples of similar padded length without a second pass.
    """
    if max_tokens < 1:
        raise ValueError(f"max_tokens must be >= 1, got {max_tokens}")
    tok = F.greatest(F.lit(1), token_count(F.col(text_col))).cast("long")
    w_cum = (
        Window.partitionBy(conv_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = turns.select(
        conv_col, order_col, role_col, tok.alias("__tok")
    ).withColumn("__cum", F.sum("__tok").over(w_cum))
    # same conv_col exchange as w_cum: __cum ordering is a refinement of
    # the turn ordering, so this adds an in-partition sort only
    w_ctx = (
        Window.partitionBy(conv_col)
        .orderBy("__cum")
        .rangeBetween(-int(max_tokens), -1)
    )
    n_ctx = F.coalesce(F.count("*").over(w_ctx), F.lit(0))
    ctx_tok = F.coalesce(F.sum("__tok").over(w_ctx), F.lit(0))
    return (
        cum.select(
            conv_col,
            order_col,
            role_col,
            n_ctx.alias("n_context_turns"),
            ctx_tok.alias("context_tokens"),
            F.col("__tok").alias("target_tokens"),
        )
        .where(F.col(role_col).isin(list(target_roles)))
        .select(
            conv_col,
            order_col,
            "n_context_turns",
            "context_tokens",
            "target_tokens",
            (F.col("context_tokens") + F.col("target_tokens")).alias(
                "example_tokens"
            ),
            (
                F.col("context_tokens") + F.col("target_tokens")
                <= F.lit(max_tokens)
            )
            .cast("int")
            .alias("fits_budget"),
            F.floor(
                (F.col("context_tokens") + F.col("target_tokens") - 1) / 64
            )
            .cast("int")
            .alias("len_bucket"),
        )
    )


def transcript_integrity(
    turns: DataFrame,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    ts_col: str = "ts",
    tool_col: str = "tool",
) -> DataFrame:
    """Per-conversation structural audit — the ingest gate that protects
    the "per-turn text equality under stable (conv_id, turn_idx)
    ordering" invariant every downstream feature assumes.

    Counts, per conversation in ``order_col`` order: index gaps
    (``turn_idx`` not contiguous from its minimum), timestamp inversions
    (``ts`` decreasing between consecutive turns), consecutive
    same-role turns, and empty/whitespace-only texts — plus the
    reply-latency profile (mean/max seconds between consecutive turns;
    NULL for single-turn conversations) and the agent tool-usage
    profile: ``n_tool_calls`` (turns with a non-empty ``tool_col``),
    ``n_distinct_tools``, and ``n_tool_switches`` — transitions to a
    *different* tool along the conversation's tool-call subsequence
    (intervening non-tool turns don't reset the trajectory; a
    re-invocation of the same tool is not a switch). If ``tool_col`` is
    absent from the frame the three columns are emitted as zeros.
    ``is_valid`` = no gaps, no inversions, no empty texts (role repeats
    are reported but allowed — agent traces legitimately emit
    consecutive tool turns).

    Plan: one window pass + one hash aggregate, both keyed on
    ``conv_col`` — a single exchange end to end. The distinct-tool
    count is a ``collect_set`` size, not a second distinct aggregate:
    per-conversation tool sets are bounded by the tool vocabulary (a
    small enum at any scale), so the sets partial-aggregate map-side
    and the plan keeps its one exchange.
    """
    w = Window.partitionBy(conv_col).orderBy("__idx")
    epoch = F.col("__ts").cast("timestamp").cast("double")
    tool_src = (
        F.col(tool_col) if tool_col in turns.columns else F.lit(None).cast("string")
    )
    flagged = turns.select(
        conv_col,
        F.col(order_col).alias("__idx"),
        F.col(ts_col).alias("__ts"),
        F.col(role_col).alias("__role"),
        (F.length(F.trim(F.coalesce(F.col(text_col), F.lit("")))) == 0)
        .cast("int")
        .alias("__empty"),
        F.nullif(F.trim(F.coalesce(tool_src, F.lit(""))), F.lit("")).alias("__tool"),
    ).select(
        conv_col,
        "__empty",
        "__tool",
        F.when(
            F.lag("__idx").over(w).isNotNull()
            & (F.col("__idx") != F.lag("__idx").over(w) + 1),
            1,
        )
        .otherwise(0)
        .alias("__gap"),
        F.when(F.col("__ts") < F.lag("__ts").over(w), 1)
        .otherwise(0)
        .alias("__inv"),
        F.when(F.col("__role") == F.lag("__role").over(w), 1)
        .otherwise(0)
        .alias("__rep"),
        (epoch - F.lag(epoch).over(w)).alias("__gap_s"),
        # previous tool CALL (not previous turn): last non-null __tool
        # strictly before this row — same (conv, idx) sort as the lags
        F.last("__tool", ignorenulls=True)
        .over(w.rowsBetween(Window.unboundedPreceding, -1))
        .alias("__prev_tool"),
    )
    switch = (
        F.col("__tool").isNotNull()
        & F.col("__prev_tool").isNotNull()
        & (F.col("__tool") != F.col("__prev_tool"))
    )
    agg = flagged.groupBy(conv_col).agg(
        F.count("*").alias("n_turns"),
        F.sum("__gap").alias("n_index_gaps"),
        F.sum("__inv").alias("n_ts_inversions"),
        F.sum("__rep").alias("n_role_repeats"),
        F.sum("__empty").alias("n_empty_texts"),
        F.sum(F.when(F.col("__tool").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_tool_calls"),
        F.size(F.collect_set("__tool")).alias("n_distinct_tools"),
        F.sum(switch.cast("int")).cast("long").alias("n_tool_switches"),
        F.round(F.avg("__gap_s"), 6).alias("mean_gap_s"),
        F.round(F.max("__gap_s"), 6).alias("max_gap_s"),
    )
    ok = (
        (F.col("n_index_gaps") == 0)
        & (F.col("n_ts_inversions") == 0)
        & (F.col("n_empty_texts") == 0)
    )
    return agg.withColumn("is_valid", ok.cast("int"))


def tool_transitions(
    turns: DataFrame,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    tool_col: str = "tool",
) -> DataFrame:
    """Corpus-level Markov transition counts over each conversation's
    tool-call trajectory — the agent-behavior profile of a transcript
    corpus (which tool follows which, and in how many conversations).

    The trajectory is the subsequence of tool-bearing turns in
    ``order_col`` order; intervening non-tool turns (plain user /
    assistant text) are skipped, so ``search → code`` counts even when
    an assistant message sits between the two calls. Self-transitions
    (``code → code``) are counted — they are the re-invocation signal.

    Output grain: ``(from_tool, to_tool, n_transitions,
    n_conversations)`` — at most |tool vocabulary|² rows, so the result
    is driver-safe at any corpus scale.

    Plan: the non-tool filter pushes to the scan, one window exchange
    on ``conv_col`` builds the lag pairs, and the final aggregate
    reduces to the tiny (from, to) grain (its countDistinct expands on
    (from, to, conv) first — bounded by conversations × vocab², still a
    contraction of the turn-level input).
    """
    tool = F.nullif(F.trim(F.coalesce(F.col(tool_col), F.lit(""))), F.lit(""))
    calls = turns.select(
        conv_col, F.col(order_col).alias("__idx"), tool.alias("__tool")
    ).where(F.col("__tool").isNotNull())
    w = Window.partitionBy(conv_col).orderBy("__idx")
    pairs = calls.select(
        conv_col,
        F.lag("__tool").over(w).alias("from_tool"),
        F.col("__tool").alias("to_tool"),
    ).where(F.col("from_tool").isNotNull())
    return pairs.groupBy("from_tool", "to_tool").agg(
        F.count("*").alias("n_transitions"),
        F.countDistinct(conv_col).alias("n_conversations"),
    )


def detect_loops(
    turns: DataFrame,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    tool_col: str = "tool",
    min_run: int = 3,
    runs: bool = False,
) -> DataFrame:
    """Stuck-agent loop detection: maximal runs of CONSECUTIVE turns
    with identical ``(role, tool, text)`` content inside a conversation
    — the signature of an agent retrying the same tool call or emitting
    the same response until a step cap kills it. Such trajectories are
    poison for SFT/preference data (the model learns to repeat itself),
    so the curation gate needs the signal per conversation.

    Run-length encoding as dataflow: per-turn content signature
    ``md5(role ␟ tool ␟ text)`` (NULLs coalesce to ''), a run starts
    where the signature differs from the previous turn's
    (``lag`` + running ``sum`` over the ``conv_col`` window), runs are
    the ``(conv, run_id)`` groups. A run counts as a loop when its
    length ≥ ``min_run`` (default 3 — two identical turns in a row are
    common benign retries; three is pathological). Only ADJACENT
    repeats count; a recurring greeting ten turns apart is not a loop.

    Default output, one row per conversation: ``(conv_id, n_turns,
    n_loop_runs, max_run_len, looped_turns, loop_frac,
    first_loop_turn, has_loop)`` — ``first_loop_turn`` is the
    ``order_col`` value where the earliest loop starts (NULL when
    clean). With ``runs=True``: one row per loop run ``(conv_id,
    start_turn, end_turn, run_len, role, tool)`` for drill-down.

    Plan: the signature window, the ``(conv, run)`` aggregate, and the
    per-conversation rollup all key on ``conv_col`` (hash partitioning
    on a prefix of the grouping keys satisfies the distribution), so
    the whole operator is ONE exchange, no joins, no Python.
    """
    if min_run < 2:
        raise ValueError("min_run must be >= 2 (a run of 1 is every turn)")
    sig = F.md5(
        F.concat_ws(
            _FIELD_SEP,
            F.coalesce(F.col(role_col), F.lit("")),
            F.coalesce(F.col(tool_col), F.lit("")),
            F.coalesce(F.col(text_col), F.lit("")),
        )
    )
    w = Window.partitionBy(conv_col).orderBy("__idx")
    sigged = turns.select(
        conv_col,
        F.col(order_col).alias("__idx"),
        F.coalesce(F.col(role_col), F.lit("")).alias("__role"),
        F.coalesce(F.col(tool_col), F.lit("")).alias("__tool"),
        sig.alias("__sig"),
    )
    new_run = (
        F.when(F.col("__sig") == F.lag("__sig").over(w), 0).otherwise(1)
    )
    run_ids = sigged.select(
        conv_col,
        "__idx",
        "__role",
        "__tool",
        F.sum(new_run)
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("__run"),
    )
    run_rows = run_ids.groupBy(conv_col, "__run").agg(
        F.count("*").cast("long").alias("run_len"),
        F.min("__idx").alias("start_turn"),
        F.max("__idx").alias("end_turn"),
        F.first("__role").alias("role"),
        F.first("__tool").alias("tool"),
    )
    if runs:
        return run_rows.where(F.col("run_len") >= min_run).select(
            conv_col, "start_turn", "end_turn", "run_len", "role", "tool"
        )
    is_loop = F.col("run_len") >= min_run
    prof = run_rows.groupBy(conv_col).agg(
        F.sum("run_len").cast("long").alias("n_turns"),
        F.sum(is_loop.cast("int")).cast("long").alias("n_loop_runs"),
        F.max("run_len").alias("max_run_len"),
        F.sum(F.when(is_loop, F.col("run_len")).otherwise(0))
        .cast("long")
        .alias("looped_turns"),
        F.min(F.when(is_loop, F.col("start_turn"))).alias("first_loop_turn"),
    )
    return prof.select(
        conv_col,
        "n_turns",
        "n_loop_runs",
        "max_run_len",
        "looped_turns",
        F.round(F.col("looped_turns") / F.col("n_turns"), 6).alias("loop_frac"),
        "first_loop_turn",
        (F.col("n_loop_runs") > 0).cast("int").alias("has_loop"),
    )


def merge_consecutive_turns(
    turns: DataFrame,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    tool_col: str = "tool",
    ts_col: str = "ts",
    sep: str = "\n",
) -> DataFrame:
    """Chat canonicalization: merge runs of CONSECUTIVE turns with the
    same role into one turn. Chat-format training data (and most chat
    templates) require strictly alternating roles; raw agent logs
    routinely violate that — an assistant emits a message then a tool
    call as two rows, a user sends two messages back to back, a
    resumed stream re-opens the same role. The standard repair is to
    concatenate adjacent same-role turns before SFT assembly
    (``assemble_sft_examples``) or template rendering.

    Run-length encoding over roles as dataflow (the ``detect_loops``
    shape): a run starts where the role differs from the previous
    turn's (null-safe comparison — two adjacent NULL-role turns DO
    merge), runs are the ``(conv, run_id)`` groups. Per run:

    - ``turn_idx``: the run's 0-based ordinal — output conversations
      are contiguously re-indexed, preserving order;
    - ``role``: the run's role (unchanged);
    - ``text``: member texts joined by ``sep`` in turn order (NULL
      texts are skipped, matching SQL ``string_agg``; an all-NULL run
      yields NULL);
    - ``tool``: first non-NULL tool in turn order (a merged
      message+tool-call assistant turn keeps its tool tag);
    - ``ts``: the run's first timestamp (start time);
    - ``src_first_idx`` / ``src_last_idx`` / ``n_merged``: provenance
      back into the raw table.

    Plan: the run-id window, the per-run aggregate, and the re-index
    window all key on ``conv_col`` — ONE exchange, no joins, no
    Python. In-order text assembly uses the tokenize_pack idiom
    (collect ``(idx, text, tool)`` structs, ``array_sort``, JVM-side
    fold) so no ordered-aggregation nondeterminism leaks in. Fully
    SQL-expressible (DuckDB ``string_agg(... ORDER BY)``), so the
    registry entry carries a value oracle.
    """
    w = Window.partitionBy(conv_col).orderBy("__idx")
    base = turns.select(
        conv_col,
        F.col(order_col).alias("__idx"),
        F.col(role_col).alias("__role"),
        F.col(text_col).alias("__text"),
        F.col(tool_col).alias("__tool"),
        F.col(ts_col).alias("__ts"),
    )
    new_run = F.when(
        F.col("__role").eqNullSafe(F.lag("__role").over(w)), 0
    ).otherwise(1)
    run_ids = base.select(
        conv_col,
        "__idx",
        "__role",
        "__text",
        "__tool",
        "__ts",
        F.sum(new_run)
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("__run"),
    )
    members = F.array_sort(
        F.collect_list(F.struct("__idx", "__text", "__tool"))
    )
    runs = run_ids.groupBy(conv_col, "__run").agg(
        F.first("__role").alias("role"),
        members.alias("__members"),
        F.min("__ts").alias("ts"),
        F.min("__idx").alias("src_first_idx"),
        F.max("__idx").alias("src_last_idx"),
        F.count("*").cast("long").alias("n_merged"),
    )
    texts = F.transform(F.col("__members"), lambda m: m["__text"])
    non_null = F.filter(texts, lambda t: t.isNotNull())
    tools = F.filter(
        F.transform(F.col("__members"), lambda m: m["__tool"]),
        lambda t: t.isNotNull(),
    )
    w_out = Window.partitionBy(conv_col).orderBy("__run")
    return runs.select(
        conv_col,
        (F.row_number().over(w_out) - F.lit(1)).alias("turn_idx"),
        "role",
        F.when(F.size(non_null) > 0, F.array_join(non_null, sep)).alias(
            "text"
        ),
        F.get(tools, 0).alias("tool"),
        "ts",
        "src_first_idx",
        "src_last_idx",
        "n_merged",
    )


def conversation_near_duplicates(
    turns: DataFrame,
    conv_col: str = "conv_id",
    role_col: str = "role",
    text_col: str = "text",
    n_hashes: int = 32,
    bands: int | None = None,
    jaccard_threshold: float = 0.8,
    seed: int = 7,
    materialize: bool = True,
) -> DataFrame:
    """Fuzzy conversation-level dedup: near-duplicate conversation
    PAIRS via MinHash-LSH over each conversation's set of turn-content
    hashes — catches what :func:`conversation_duplicates` (exact) must
    miss: re-exports with one edited/regenerated turn, truncated
    prefixes of the same session, and trailing-turn additions.

    ``materialize`` (default True) localCheckpoints the three fan-out
    boundaries (turn hashes, signatures, candidate pairs) — identical
    results, but each is computed once instead of once per referencing
    branch (the sf1.0 plan held 80 copies of the input scan without
    the barriers). ``materialize=False`` keeps the single fully-lazy
    plan for plan-shape inspection.

    A conversation's "shingle set" is the distinct ``xxhash64`` of each
    turn's ``role<US>text`` (content identity, deliberately
    position-free: inserting one turn shifts every later ``turn_idx``,
    and position-aware hashes would zero the similarity of otherwise
    identical sessions). Repeated identical turns collapse into one set
    element — the same distinct-set semantics document shingles have.
    Jaccard is therefore over distinct turn contents.

    Plan shape (the 100 TB property, mirroring
    :func:`graphrole_spark.functions.text.minhash_near_duplicates`):
    the text bytes die inside the scan projection (one string hash per
    turn); the signature is ``n_hashes`` fused codegen min-aggregates —
    map-side combined, so only ``(conv_id, n_hashes longs)`` reach the
    exchange and a heavy-tail conversation costs partial-agg work, not
    a giant reducer. Banding/candidate-join/verification reuse the
    document machinery; only *candidate* conversations' hash sets are
    ever materialized (semi-join), never the corpus's.

    Returns ``(conv_a, conv_b, jaccard)`` with ``conv_a < conv_b`` and
    ``jaccard >= jaccard_threshold``.
    """
    from graphrole_spark.functions.text import bands_for_threshold, minhash_bands

    if bands is None:
        bands = bands_for_threshold(jaccard_threshold, n_hashes)
    content = F.concat(
        F.coalesce(F.col(role_col), F.lit("")),
        F.lit(_FIELD_SEP),
        F.coalesce(F.col(text_col), F.lit("")),
    )
    # materialize the (conv, turn-hash) rows ONCE: they feed the
    # signature aggregate AND the verification sets, and every later
    # fan-out (band self-join sides, candidate-id union, verify joins)
    # would otherwise re-derive the full upstream turn lineage — the
    # sf1.0 plan held 80 copies of the input scan before this. Two
    # longs-ish per turn.
    def _ck(df):
        return df.localCheckpoint() if materialize else df

    th = _ck(turns.select(
        F.col(conv_col).alias("doc_id"),
        F.xxhash64(content, F.lit(seed)).alias("__h"),
    ))
    # min() is duplicate-insensitive: no distinct pass before the
    # signature, the dedup happens implicitly. Checkpointed: the banded
    # relation below is self-joined (a × b), so an unmaterialized sig
    # would run the n_hashes-wide aggregate once per side.
    sig = _ck(th.groupBy("doc_id").agg(
        *[
            F.min(F.xxhash64(F.col("__h"), F.lit(seed + 1 + i))).alias(f"__m{i}")
            for i in range(n_hashes)
        ]
    ))
    banded = minhash_bands(None, n_hashes=n_hashes, bands=bands, seed=seed, sig=sig)
    # The band self-join fans out quadratically inside collision
    # buckets while its INPUT is tiny — AQE sizes the exchange by
    # input bytes and coalesces it to ~1 partition, so the whole pair
    # stream is generated and shuffle-written on one core. Explicit
    # same-key repartitions (user counts are AQE-coalesce-exempt)
    # satisfy the join's distribution requirement with no extra
    # exchange and keep the fan-out core-parallel.
    par = turns.sparkSession.sparkContext.defaultParallelism
    a = banded.select(F.col("doc_id").alias("conv_a"), "band", "bhash")
    b = banded.select(F.col("doc_id").alias("conv_b"), "band", "bhash")
    cand = (
        a.repartition(par, "band", "bhash")
        .join(b.repartition(par, "band", "bhash"), ["band", "bhash"])
        .where(F.col("conv_a") < F.col("conv_b"))
        .select("conv_a", "conv_b")
        .dropDuplicates(["conv_a", "conv_b"])
    )
    cand = _ck(cand)
    cand_ids = (
        cand.select(F.col("conv_a").alias("doc_id"))
        .unionByName(cand.select(F.col("conv_b").alias("doc_id")))
        .distinct()
    )
    sets = (
        th.join(cand_ids, "doc_id", "left_semi")
        .groupBy("doc_id")
        .agg(F.collect_set("__h").alias("shh"))
        .withColumn("__n", F.size("shh"))
    )
    # |A∪B| = |A| + |B| − |A∩B| exactly (collect_set outputs are
    # duplicate-free), so the union array is never materialized — the
    # per-pair cost is ONE array_intersect instead of intersect + a
    # full union allocation (measured 3x on a 10M-candidate verify)
    i = F.size(F.array_intersect("sh_a", "sh_b"))
    jac = i / (F.col("__na") + F.col("__nb") - i)
    return (
        cand.join(
            sets.select(F.col("doc_id").alias("conv_a"),
                        F.col("shh").alias("sh_a"),
                        F.col("__n").alias("__na")),
            "conv_a",
        )
        .join(
            sets.select(F.col("doc_id").alias("conv_b"),
                        F.col("shh").alias("sh_b"),
                        F.col("__n").alias("__nb")),
            "conv_b",
        )
        .withColumn("jaccard", F.round(jac, 6))
        .where(F.col("jaccard") >= jaccard_threshold)
        .select("conv_a", "conv_b", "jaccard")
    )


def assemble_preference_pairs(
    turns: DataFrame,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    score_col: str | None = None,
    assistant_role: str = "assistant",
) -> DataFrame:
    """Preference-pair (DPO/RLHF) mining: pair alternative final
    assistant responses to the SAME conversation prefix.

    A post-training pipeline samples several completions per prompt
    (or re-ingests the same session from tools that regenerate the
    last reply); the pairable unit is "conversations whose turns are
    identical except the final assistant turn". Grouping key = an
    order-aware fingerprint of the prompt prefix (every turn except
    the last); within a group the highest-scored response is
    ``chosen`` and each *content-distinct* other response yields one
    ``(chosen, rejected)`` row.

    Eligibility: a conversation enters a group only if its final turn
    (max ``order_col``) has ``role == assistant_role`` and at least
    one prompt turn precedes it. ``score_col`` is a per-turn column
    (e.g. a reward-model output); the conversation's score is its
    final turn's value. When ``score_col`` is None the final
    response's whitespace token count stands in as a deterministic
    proxy (documented heuristic — length is NOT a reward model; pass
    real scores in production).

    Output (one row per rejected alternative):
    ``(prompt_fp, n_candidates, chosen_conv, rejected_conv,
    chosen_text, rejected_text, chosen_score, rejected_score,
    margin)`` with ``margin = chosen_score - rejected_score``. The
    prompt's text is intentionally NOT materialized here — it is the
    chosen conversation's turns minus the last, one semi-join away —
    so corpus text bytes never ride the group shuffle.

    PLAN SHAPE (the 100 TB property, same algebra as
    :func:`conversation_duplicates`): the prefix fingerprint is
    derived by SUBTRACTION — one map-side-combinable aggregate
    computes the whole-conversation lane sums plus ``max_by`` of the
    final turn's lanes, and prefix lanes = total − final. No second
    scan, no per-group sort, no ``collect_list``; only
    ``(conv_id, a-few-longs, final-turn text)`` reach the first
    exchange, and the pairing is a single window over ``prompt_fp``
    (chosen carried by ``first(...)`` — no self-join). Two shuffles
    total. Group sizes are bounded by the per-prompt sample count, so
    no skew path is needed.
    """
    payload = F.concat(
        F.col(order_col).cast("string"),
        F.lit(_FIELD_SEP),
        F.coalesce(F.col(role_col), F.lit("")),
        F.lit(_FIELD_SEP),
        F.coalesce(F.col(text_col), F.lit("")),
    )
    h = F.md5(payload)

    def lane(start: int):
        return F.conv(F.substring(h, start, 8), 16, 10).cast("long")

    final_fields = [
        lane(1).alias("a"),
        lane(17).alias("b"),
        F.length(payload).alias("len"),
        F.coalesce(F.col(role_col), F.lit("")).alias("role"),
        F.coalesce(F.col(text_col), F.lit("")).alias("text"),
    ]
    # an explicit score column is a cheap per-turn ref and rides the
    # max_by struct; the token-count PROXY is a regex scan, so it is
    # deferred to the post-aggregation final-turn texts (one evaluation
    # per conversation, not per turn — measured 19x wall for a 10x
    # input without the deferral at 32.6M turns)
    if score_col is not None:
        final_fields.append(F.col(score_col).cast("double").alias("score"))
    agg = turns.groupBy(conv_col).agg(
        F.count("*").alias("__n"),
        F.sum(lane(1)).alias("__a"),
        F.sum(lane(17)).alias("__b"),
        F.sum(F.length(payload)).alias("__len"),
        F.max_by(F.struct(*final_fields), F.col(order_col)).alias("__f"),
    )
    score = (
        F.col("__f.score")
        if score_col is not None
        else token_count(F.col("__f.text")).cast("double")
    )
    cand = agg.where(
        (F.col("__f.role") == assistant_role) & (F.col("__n") >= 2)
    ).select(
        F.col(conv_col).alias("conv"),
        F.md5(
            F.concat_ws(
                "|",
                (F.col("__n") - 1).cast("string"),
                (F.col("__a") - F.col("__f.a")).cast("string"),
                (F.col("__b") - F.col("__f.b")).cast("string"),
                (F.col("__len") - F.col("__f.len")).cast("string"),
            )
        ).alias("prompt_fp"),
        F.md5(F.col("__f.text")).alias("__resp_h"),
        F.col("__f.text").alias("resp_text"),
        score.alias("resp_score"),
    )
    # chosen = highest score, ties broken by conv id for determinism;
    # first(...) over the same ordering carries the chosen row's fields
    # to every group member — no self-join back on prompt_fp
    w = Window.partitionBy("prompt_fp").orderBy(
        F.col("resp_score").desc(), F.col("conv").asc()
    )
    wg = Window.partitionBy("prompt_fp")
    ranked = cand.select(
        "prompt_fp",
        "conv",
        "__resp_h",
        "resp_text",
        "resp_score",
        F.row_number().over(w).alias("__rn"),
        F.count("*").over(wg).alias("n_candidates"),
        F.first("conv").over(w).alias("chosen_conv"),
        F.first("__resp_h").over(w).alias("__chosen_h"),
        F.first("resp_text").over(w).alias("chosen_text"),
        F.first("resp_score").over(w).alias("chosen_score"),
    )
    return ranked.where(
        (F.col("__rn") > 1) & (F.col("__resp_h") != F.col("__chosen_h"))
    ).select(
        "prompt_fp",
        "n_candidates",
        "chosen_conv",
        F.col("conv").alias("rejected_conv"),
        "chosen_text",
        F.col("resp_text").alias("rejected_text"),
        "chosen_score",
        F.col("resp_score").alias("rejected_score"),
        (F.col("chosen_score") - F.col("resp_score")).alias("margin"),
    )


def compact_trajectories(
    turns: DataFrame,
    max_tokens: int = 2048,
    keep_last: int = 2,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    tool_col: str = "tool",
    placeholder: str = "[tool output elided]",
) -> DataFrame:
    """Agent-trajectory context compaction: elide the OLDEST tool-output
    turns of each over-budget conversation until it fits ``max_tokens``
    — the standard prep step before packing long agent sessions into a
    model context (tool outputs dominate trajectory length but stale
    ones carry little training signal; roles/structure stay intact).

    A turn is *elidable* when its ``tool_col`` is non-empty and it is
    not among the conversation's last ``keep_last`` turns (recent tool
    results are the ones the final assistant turns condition on).
    Eliding replaces the text with ``placeholder`` (whose whitespace
    token count, usually 3, is the residual cost). Greedy front-first:
    elidable turns are taken in ``order_col`` order until the running
    savings cover the overage; already-fitting conversations pass
    through untouched.

    Output: every input turn as ``(conv_id, turn_idx, role, text,
    elided, n_tokens, conv_tokens, conv_fits)`` where ``text``/
    ``n_tokens`` reflect the elision, ``conv_tokens`` is the
    conversation's post-compaction total and ``conv_fits`` flags
    whether the budget was reached (a conversation whose non-elidable
    turns alone exceed the budget cannot fit — flagged, not dropped;
    chunk or truncate downstream).

    PLAN SHAPE: two window passes over ONE ``conv_col`` partitioning
    (total/rank bookkeeping, then the savings cumsum over elidable
    turns) — Spark plans a single exchange and sorts within it; no
    joins, no collect, text bytes stay in place (the shuffle carries
    each turn once, unavoidable for a per-turn rewrite keyed on
    conversation state).
    """
    ph_tokens = len([t for t in placeholder.split(" ") if t])
    w = Window.partitionBy(conv_col)
    w_ord = w.orderBy(F.col(order_col).asc())
    w_rev = w.orderBy(F.col(order_col).desc())
    tok = token_count(F.col(text_col)).cast("long")
    base = turns.select(
        conv_col,
        order_col,
        role_col,
        text_col,
        tok.alias("__tok"),
        (
            (F.length(F.trim(F.coalesce(F.col(tool_col), F.lit("")))) > 0)
            & (F.row_number().over(w_rev) > keep_last)
        ).alias("__elidable"),
    )
    saving = F.when(
        F.col("__elidable") & (F.col("__tok") > ph_tokens),
        F.col("__tok") - F.lit(ph_tokens),
    ).otherwise(F.lit(0))
    staged = base.select(
        conv_col,
        order_col,
        role_col,
        text_col,
        "__tok",
        saving.alias("__save"),
        F.sum("__tok").over(w).alias("__total"),
        F.sum(saving).over(w_ord).alias("__cum_save"),
    )
    overage = F.greatest(F.col("__total") - F.lit(max_tokens), F.lit(0))
    # greedy front-first: elide while the PRIOR turns' savings have not
    # yet covered the overage (cumsum includes self, so prior = cum - own)
    elide = (F.col("__save") > 0) & (
        (F.col("__cum_save") - F.col("__save")) < overage
    )
    conv_tokens = F.col("__total") - F.sum(
        F.when(elide, F.col("__save")).otherwise(F.lit(0))
    ).over(w)
    return staged.select(
        conv_col,
        order_col,
        role_col,
        F.when(elide, F.lit(placeholder)).otherwise(F.col(text_col)).alias(text_col),
        elide.cast("int").alias("elided"),
        F.when(elide, F.lit(ph_tokens)).otherwise(F.col("__tok")).alias("n_tokens"),
        conv_tokens.alias("conv_tokens"),
        (conv_tokens <= max_tokens).cast("int").alias("conv_fits"),
    )


def curate_transcripts(
    turns: DataFrame,
    compact_max_tokens: int = 2048,
    keep_last: int = 2,
    sft_max_tokens: int = 512,
    target_roles: Sequence[str] = ("assistant",),
    test_frac: float = 0.1,
    val_frac: float = 0.1,
    salt: str = "v1",
    near_dup_threshold: float | None = 0.8,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    tool_col: str = "tool",
    ts_col: str = "ts",
    checkpoint_turns: bool = True,
) -> DataFrame:
    """The full transcript post-training pipeline as one composition —
    the production path from raw multi-turn agent logs to split-labeled
    SFT examples (the conversation twin of
    :func:`graphrole_spark.functions.corpus.assemble_corpus`):

    1. structural integrity gate (:func:`transcript_integrity` —
       index-gap / ts-inversion / empty-text conversations never enter
       the corpus);
    2. exact conversation dedup (:func:`conversation_duplicates`,
       lexicographically-smallest survivor);
    3. near-duplicate CLUSTER removal (optional:
       :func:`conversation_near_duplicates` pairs → alternating-star
       connected components → one survivor per cluster via
       :func:`~graphrole_spark.functions.dedup_graph.dedup_keep`);
    4. leakage-safe split (:func:`split_conversations` — survivors are
       unique by construction here, so exact-fingerprint grouping
       suffices);
    5. context compaction (:func:`compact_trajectories` — stale tool
       outputs elided to ``compact_max_tokens``);
    6. SFT example assembly over the COMPACTED turns
       (:func:`assemble_sft_examples`).

    Every stage is the already-tested operator; this function wires
    survivorship between them the way ``assemble_corpus`` does: each
    stage's surviving conv-id set is ``localCheckpoint``-ed (ids ONLY),
    preventing the recompute-at-fan-out trap (PERF.md log 20) since the
    dedup machinery would otherwise re-execute once per downstream
    consumer. With ``checkpoint_turns=True`` (default) the gated TURN
    sets are additionally materialized at the two fan-out boundaries
    (post-integrity: 3 consumers; post-dedup: 2 consumers plus the
    near-dup machinery's own multi-scan) — when the input is a derived
    view rather than a cheap columnar scan, re-deriving it per consumer
    dominates wall (measured 20 s → 8 s at sf0.1). At warehouse scale
    the equivalent move is staging the curated turns to a table between
    stages; pass ``checkpoint_turns=False`` to keep the pure
    semi-join-on-ids plan when the input is a pruned parquet scan that
    is cheaper to repeat than to materialize.

    Output grain: one row per SFT example —
    ``(conv_col, order_col, split, n_context_turns, context_tokens,
    target_tokens, example_tokens, fits_budget, len_bucket)``.
    """
    ids = lambda df: df.select(conv_col).localCheckpoint()  # noqa: E731
    stage = (
        (lambda df: df.localCheckpoint()) if checkpoint_turns else (lambda df: df)
    )

    integ = transcript_integrity(
        turns, conv_col, order_col, role_col, text_col, ts_col, tool_col
    )
    valid = ids(integ.where(F.col("is_valid") == 1))
    t_valid = stage(turns.join(valid, conv_col, "left_semi"))

    dd = conversation_duplicates(t_valid, conv_col, order_col, role_col, text_col)
    uniq = ids(dd.where(F.col("keep") == 1))
    t_uniq = t_valid.join(uniq, conv_col, "left_semi")

    if near_dup_threshold is not None:
        from graphrole_spark.functions.dedup_graph import dedup_keep

        pairs = conversation_near_duplicates(
            t_uniq,
            conv_col=conv_col,
            role_col=role_col,
            text_col=text_col,
            jaccard_threshold=near_dup_threshold,
        )
        kp = dedup_keep(uniq, pairs, id_col=conv_col, src="conv_a", dst="conv_b")
        uniq = ids(kp.where(F.col("keep") == 1))
        t_uniq = t_valid.join(uniq, conv_col, "left_semi")

    t_uniq = stage(t_uniq)
    splits = split_conversations(
        t_uniq,
        test_frac=test_frac,
        val_frac=val_frac,
        salt=salt,
        conv_col=conv_col,
        order_col=order_col,
        role_col=role_col,
        text_col=text_col,
    ).select(conv_col, "split")

    compacted = compact_trajectories(
        t_uniq,
        max_tokens=compact_max_tokens,
        keep_last=keep_last,
        conv_col=conv_col,
        order_col=order_col,
        role_col=role_col,
        text_col=text_col,
        tool_col=tool_col,
    )
    examples = assemble_sft_examples(
        compacted,
        conv_col=conv_col,
        order_col=order_col,
        role_col=role_col,
        text_col=text_col,
        target_roles=target_roles,
        max_tokens=sft_max_tokens,
    )
    return examples.join(splits, conv_col).select(
        conv_col,
        order_col,
        "split",
        "n_context_turns",
        "context_tokens",
        "target_tokens",
        "example_tokens",
        "fits_budget",
        "len_bucket",
    )


def _conversation_fingerprints(
    turns: DataFrame,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
) -> DataFrame:
    """(conv_col, conv_fingerprint): the position-aware mergeable
    multiset hash documented on :func:`conversation_duplicates` — one
    map-side-combinable aggregate, text bytes never shuffle. Shared by
    the dedup (adds the group window) and the leakage-safe split
    (hashes the fingerprint directly, no window needed)."""
    payload = F.concat(
        F.col(order_col).cast("string"),
        F.lit(_FIELD_SEP),
        F.coalesce(F.col(role_col), F.lit("")),
        F.lit(_FIELD_SEP),
        F.coalesce(F.col(text_col), F.lit("")),
    )
    h = F.md5(payload)

    def lane(start: int):
        return F.conv(F.substring(h, start, 8), 16, 10).cast("long")

    return (
        turns.groupBy(conv_col)
        .agg(
            F.count("*").alias("__n"),
            F.sum(lane(1)).alias("__a"),
            F.sum(lane(17)).alias("__b"),
            F.sum(F.length(payload)).alias("__len"),
        )
        .select(
            conv_col,
            F.md5(
                F.concat_ws(
                    "|",
                    F.col("__n").cast("string"),
                    F.col("__a").cast("string"),
                    F.col("__b").cast("string"),
                    F.col("__len").cast("string"),
                )
            ).alias("conv_fingerprint"),
        )
    )


def split_conversations(
    turns: DataFrame,
    test_frac: float = 0.1,
    val_frac: float = 0.1,
    salt: str = "v1",
    near_dup_pairs: DataFrame | None = None,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
) -> DataFrame:
    """Leakage-safe train/val/test split at CONVERSATION grain:
    ``(conv_id, split_key, split)`` with splits assigned by hashing a
    duplicate-group key, never the conversation id — so byte-identical
    re-exports of one session can never straddle train and test (the
    classic eval-contamination leak that a naive per-id hash split
    permits), and turns never split apart (the split is per
    conversation by construction).

    Group key: the order-aware content fingerprint of
    :func:`conversation_duplicates` (identical conversations → same
    key → same split, any salt). With ``near_dup_pairs`` — a
    ``(conv_a, conv_b)`` frame, e.g. from
    :func:`conversation_near_duplicates` — groups widen to the
    connected components of (exact-dup ∪ near-dup) edges, so
    one-edited-turn re-exports co-travel too (transitively).

    Assignment mirrors the document splitter's portable hash: ``u =
    first-8-hex(md5(key||':'||salt)) / 2^32``; ``u < test_frac`` →
    test, ``< test_frac + val_frac`` → val, else train. Deterministic
    across runs/partitionings; re-salting reshuffles every group as a
    unit.

    PLAN SHAPE: exact mode is ONE map-side-combinable aggregate and a
    hash projection — no window, no join; pair mode adds the
    alternating-star CC (``functions/dedup_graph.py``, node-key
    shuffles bounded by pair count, not corpus size) and one
    fingerprint-grain join back.
    """
    fps = _conversation_fingerprints(turns, conv_col, order_col, role_col, text_col)
    if near_dup_pairs is None:
        keyed = fps.select(conv_col, F.col("conv_fingerprint").alias("split_key"))
    else:
        from graphrole_spark.functions.dedup_graph import connected_components

        a, b = near_dup_pairs.columns[:2]
        # exact-dup identity edges (conv -> its fingerprint-group min)
        # bridge near-dup components across byte-identical re-exports
        gmin = Window.partitionBy("conv_fingerprint")
        exact_edges = (
            fps.select(
                conv_col, F.min(conv_col).over(gmin).alias("__rep")
            )
            .where(F.col(conv_col) != F.col("__rep"))
            .select(F.col(conv_col).alias("__ea"), F.col("__rep").alias("__eb"))
        )
        edges = near_dup_pairs.select(
            F.col(a).alias("__ea"), F.col(b).alias("__eb")
        ).unionByName(exact_edges)
        comp = connected_components(edges, src="__ea", dst="__eb")
        keyed = (
            fps.join(
                comp.select(
                    F.col("node").alias(conv_col),
                    F.col("component").alias("__comp"),
                ),
                conv_col,
                "left",
            )
            # isolated conversations (no dup of any kind) key on their
            # own fingerprint; grouped ones on the component rep
            .select(
                conv_col,
                F.coalesce(F.col("__comp"), F.col("conv_fingerprint")).alias(
                    "split_key"
                ),
            )
        )
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("split_key"), F.lit(":" + salt))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        / F.lit(4294967296.0)
    )
    split = (
        F.when(u < F.lit(float(test_frac)), F.lit("test"))
        .when(u < F.lit(float(test_frac + val_frac)), F.lit("val"))
        .otherwise(F.lit("train"))
    )
    return keyed.select(conv_col, "split_key", split.alias("split"))


def conversation_duplicates(
    turns: DataFrame,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
) -> DataFrame:
    """Conversation-level exact dedup: fingerprint each conversation by
    its full ``(turn_idx, role, text)`` turn set and group identical
    conversations — the transcript analogue of
    :func:`graphrole_spark.functions.text.exact_duplicates` (identical
    multi-turn sessions re-ingested from overlapping exports survive
    document-level dedup because no single turn is a whole document).

    Per conversation: ``(conv_col, conv_fingerprint, group_size, keep)``
    with ``keep`` = 1 on the lexicographically smallest conv_id of each
    fingerprint group.

    FINGERPRINT: a position-aware mergeable multiset hash. Each turn
    hashes to ``md5(turn_idx<US>role<US>text)``; a conversation's
    fingerprint is the md5 of (turn count, sum of two independent
    32-bit md5 lanes, total payload length). Because turn position is
    embedded in each per-turn hash, summation is order-insensitive yet
    the fingerprint still distinguishes reordered conversations; two
    conversations collide only by md5-lane accident (~2^-64 per pair —
    fine for pipeline dedup, not adversarial input).

    Chosen over sorting the turn sequence per group for the plan shape
    (the 100 TB property, measured 22x at 3.2M turns in
    BENCH_CONV_SCALE.jsonl / BENCH.md): plain codegen SUM/COUNT aggregates are
    map-side combined, so only ``(conv_id, 4 longs)`` reaches the
    exchange — the corpus text bytes NEVER shuffle, and a heavy-tail
    conversation adds partial-agg work on its input partitions instead
    of one giant reducer-side array sort. A ``collect_list``+
    ``sort_array`` variant shuffles every byte and falls back to
    spill-prone object aggregation.

    Two shuffles total: the tiny per-conversation digest, then the
    window exchange on the fingerprint ranking each duplicate group.
    """
    fp = _conversation_fingerprints(turns, conv_col, order_col, role_col, text_col)
    w = Window.partitionBy("conv_fingerprint")
    return fp.select(
        conv_col,
        "conv_fingerprint",
        F.count("*").over(w).alias("group_size"),
        (F.col(conv_col) == F.min(conv_col).over(w)).cast("int").alias("keep"),
    )


def conversation_highlights(
    transcripts: DataFrame,
    k: int = 3,
    text_col: str = "text",
) -> DataFrame:
    """Extractive per-conversation highlights: the ``k`` most salient
    turns of every conversation by corpus-level TF-IDF — the cheap
    deterministic "gist" used to index, label, or preview transcripts
    without running a summarizer.

    Salience of a turn = Σ over its term occurrences of
    ``idf(term) = ln(N_convs / df_convs(term))`` with document
    frequency counted over *conversations* (a term used by every
    conversation scores 0 — greetings and boilerplate vanish without a
    stopword list).  Scores are rounded to 6 decimals; ranking breaks
    ties on the earliest turn.  Turns with no tokens are not
    candidates.

    Plan: one explode → per-(conv, turn, term) count, a term-level
    conversation-df aggregate joined back (vocabulary-sized — hash
    join, broadcastable at moderate vocab), one per-turn sum, one
    per-conversation top-k window.  Every shuffle is keyed on
    (conv/term) longs; nothing is quadratic in turns or conversations.
    Terms travel as ``xxhash64`` longs from the explode on — the token
    stream (the big shuffle) never carries term strings (the same
    equality-barring-a-64-bit-collision convention as ``dup_ngrams``
    and the minhash family; cut the 32.6M-turn sweep 241.5 → 131.7 s).

    Returns ``(conv_id, turn_idx, role, n_terms, salience, rank)``
    with ``rank <= k``.
    """
    toks = F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), " +")
    inst = (
        transcripts.select(
            "conv_id", "turn_idx", "role",
            F.explode(toks).alias("term"),
        )
        .where(F.col("term") != "")
        .select(
            "conv_id", "turn_idx", "role",
            F.xxhash64("term").alias("__th"),
        )
    )
    # persist: tf feeds BOTH the df aggregate and the salience join —
    # unpersisted, Catalyst re-runs the corpus explode for each branch
    # (the terms.py fan-out rule; cache ownership documented in
    # PERF.md "Known costs")
    tf = inst.groupBy("conv_id", "turn_idx", "role", "__th").agg(
        F.count("*").alias("tf")
    ).persist()
    n_convs = transcripts.select("conv_id").distinct().count()
    df_ = (
        tf.select("conv_id", "__th")
        .distinct()
        .groupBy("__th")
        .agg(F.count("*").alias("df"))
    )
    idf = F.log(F.lit(float(n_convs)) / F.col("df"))
    scored = (
        tf.join(df_, "__th")
        .groupBy("conv_id", "turn_idx", "role")
        .agg(
            F.sum("tf").cast("long").alias("n_terms"),
            F.round(F.sum(F.col("tf") * idf), 6).alias("salience"),
        )
    )
    w = Window.partitionBy("conv_id").orderBy(
        F.desc("salience"), F.asc("turn_idx")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def conversation_vectors(
    transcripts: DataFrame,
    dim: int = 64,
    text_col: str = "text",
) -> DataFrame:
    """Deterministic conversation embeddings WITHOUT a model: hashed
    bag-of-words (feature hashing, Weinberger et al. 2009) pooled over
    the conversation and L2-normalized.  This is the bridge between
    the text grain and the embedding grain — the output drops straight
    into every vector operator in ``functions/similarity.py``
    (semantic_dedup / semantic_decontaminate / ANN / quantize), giving
    conversation-level semantic dedup and retrieval with zero external
    model dependencies and full engine portability (md5-derived
    dimension + sign, reproducible in SQL).

    Each token lands in dimension ``md5(term) mod dim`` with sign
    ``md5(term||'#s') mod 2`` (the signed hash keeps collisions
    mean-zero, the standard hashing-trick correction); counts pool
    additively over all turns, then the vector is L2-normalized so
    downstream cosine thresholds are corpus-size-independent.

    Plan: explode → one (conv, dim, signed-count) aggregate → one
    ``array_agg``-free pivot via ``map_from_entries``-less dense
    assembly: a (conv, dim) groupBy then a conv-keyed collect into a
    dense array with ``aggregate`` — two keyed shuffles total, output
    one ``dim``-float row per conversation.  Conversations with no
    tokens emit the zero vector (norm 0 kept as 0s, NULL-safe
    downstream by the similarity kernels' zero-norm guards).

    Returns ``(conv_id, embedding array<double>, n_terms long)``.
    """
    return _hashed_vectors(transcripts, ["conv_id"], dim, text_col)


_CHAT_TEMPLATES = {
    # ChatML (OpenAI/Qwen lineage): the de-facto open-weights format
    "chatml": ("<|im_start|>{role}\n", "<|im_end|>\n", ""),
    # plain role-prefixed text (inspection / lexical ops)
    "plain": ("{role}: ", "\n\n", ""),
}


def render_conversations(
    turns: DataFrame,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    template: str = "chatml",
    system_prompt: str | None = None,
) -> DataFrame:
    """Chat-template rendering: flatten each conversation into ONE
    training-ready string — the materialization step between transcript
    curation and ``tokenize_pack`` (SFT corpora are packed as rendered
    text, not as turn rows). Templates: ``chatml``
    (``<|im_start|>role\\n text <|im_end|>``, the de-facto open-weights
    format) and ``plain`` (``role: text`` + blank line).

    ``system_prompt`` prepends a synthetic ``system`` turn to every
    conversation. NULL text renders as '' inside its turn (the turn
    STILL renders — dropping it would silently desync tool-call
    structure); NULL role renders as ''. Turns render in ``order_col``
    order via the tokenize_pack idiom (collect structs, ``array_sort``,
    JVM-side transform+join) — no ordered-aggregation nondeterminism.

    Output: ``(conv_id, text, n_turns, n_chars)``; one conversation-key
    exchange, no joins, no Python. Fully SQL-expressible (DuckDB
    ``string_agg(... ORDER BY)`` twin pytest-pinned).
    """
    if template not in _CHAT_TEMPLATES:
        raise ValueError(
            f"unknown template {template!r}; have {sorted(_CHAT_TEMPLATES)}"
        )
    head_fmt, tail, _ = _CHAT_TEMPLATES[template]
    pre, post = head_fmt.split("{role}")

    def _render(role: Column, text: Column) -> Column:
        return F.concat(
            F.lit(pre),
            F.coalesce(role, F.lit("")),
            F.lit(post),
            F.coalesce(text, F.lit("")),
            F.lit(tail),
        )

    agg = turns.groupBy(F.col(conv_col).alias("conv_id")).agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col(order_col).alias("__idx"),
                    F.col(role_col).alias("__role"),
                    F.col(text_col).alias("__text"),
                )
            )
        ).alias("__members"),
        F.count("*").cast("long").alias("n_turns"),
    )
    rendered = F.array_join(
        F.transform(
            F.col("__members"), lambda m: _render(m["__role"], m["__text"])
        ),
        "",
    )
    if system_prompt is not None:
        rendered = F.concat(
            _render(F.lit("system"), F.lit(system_prompt)), rendered
        )
    # render once; n_chars derives from the materialized column
    return agg.select(
        "conv_id", rendered.alias("text"), "n_turns"
    ).withColumn("n_chars", F.length("text").cast("long"))


def decontaminate_conversations(
    transcripts: DataFrame,
    eval_transcripts: DataFrame,
    dim: int = 64,
    threshold: float = 0.9,
    conv_col: str = "conv_id",
    text_col: str = "text",
) -> DataFrame:
    """Conversation-grain semantic decontamination: flag corpus
    conversations whose content sits next to any EVAL-SET conversation
    in embedding space — the paraphrase-robust guard against benchmark
    dialogues (MT-Bench-style multi-turn evals, agent-task suites)
    leaking into SFT/preference data. The n-gram decontaminator misses
    a re-worded eval dialogue; hashed-vector cosine does not, and at
    conversation grain a one-turn edit barely moves the pooled vector.

    Composition of two adjudicated operators: model-free
    ``conversation_vectors`` over BOTH tables (same ``dim`` — the hash
    family must agree) feeding ``semantic_decontaminate``'s broadcast
    block-matmul scan. The eval side is small by contract (benchmarks
    are 10^2-10^5 conversations); the corpus side is one narrow scan,
    no shuffle beyond the two vector aggregations.

    Returns one row per corpus conversation:
    ``(conv_id, n_terms, nearest_eval_id, eval_sim, contaminated)``.
    """
    from graphrole_spark.functions.similarity import semantic_decontaminate

    # materialize once: the vectors feed two plan branches (the n_terms
    # projection and the decontaminate scan) and unmaterialized each
    # branch re-runs the hashing aggregate (PERF.md #32)
    corpus_vecs = conversation_vectors(
        transcripts.withColumnRenamed(conv_col, "conv_id"), dim, text_col
    ).localCheckpoint()
    eval_vecs = conversation_vectors(
        eval_transcripts.withColumnRenamed(conv_col, "conv_id"), dim, text_col
    )
    flags = semantic_decontaminate(
        corpus_vecs.withColumnRenamed("conv_id", "vec_id"),
        eval_vecs.withColumnRenamed("conv_id", "vec_id"),
        threshold=threshold,
    )
    return corpus_vecs.select(
        "conv_id", "n_terms"
    ).join(
        flags.withColumnRenamed("vec_id", "conv_id"), "conv_id"
    )


def _hashed_vectors(
    frame: DataFrame,
    keys: list[str],
    dim: int,
    text_col: str,
) -> DataFrame:
    """Shared signed-feature-hashing kernel: one L2-normalized dense
    ``dim``-vector per distinct ``keys`` group (conversation grain for
    :func:`conversation_vectors`, turn grain for
    :func:`turn_topic_shift`).  Semantics documented on
    :func:`conversation_vectors`.

    Plan: ONE aggregation straight from the exploded token stream into
    ``dim`` fused codegen conditional sums (the simhash rewrite
    pattern — no per-cell pre-aggregate, no map pivot, no interpreted
    per-element HOF; the first version's ``map_from_entries`` +
    ``element_at`` assembly cost 6-9 s at sf0.1, this one ~1 s), then
    the norm and the output array as wide codegen expressions.  ``dim``
    is a fused-aggregate width — keep it ≤ 256 (64 default), which is
    also where the hashing trick stops paying anyway.
    """
    toks = F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), " +")
    # keep the explode's empty-term rows (they arise EXACTLY for
    # empty/whitespace-only text — trim+split cannot produce '' mid
    # array) with a NULL bucket: every key then reaches the aggregate,
    # so the zero-token keys need no anti-join + union leg — one
    # aggregate emits the whole frame (r6; the NULL bucket never
    # matches a conditional sum and count(__d) counts valid terms)
    inst = frame.select(*keys, F.explode(toks).alias("term"))
    from graphrole_spark.functions.corpus import _md5_long

    valid = F.col("term") != ""
    d = F.when(
        valid, F.pmod(_md5_long(F.col("term")), F.lit(dim)).cast("int")
    )
    sign = (
        F.pmod(_md5_long(F.concat(F.col("term"), F.lit("#s"))), F.lit(2))
        * 2 - 1
    ).cast("double")
    sums = [
        F.coalesce(
            F.sum(F.when(F.col("__d") == i, F.col("__s"))), F.lit(0.0)
        ).alias(f"__c{i}")
        for i in range(dim)
    ]
    dense = (
        inst.select(*keys, d.alias("__d"), sign.alias("__s"))
        .groupBy(*keys)
        .agg(*sums, F.count("__d").cast("long").alias("n_terms"))
    )
    norm_sq = None
    for i in range(dim):
        sq = F.col(f"__c{i}") * F.col(f"__c{i}")
        norm_sq = sq if norm_sq is None else norm_sq + sq
    empty_vec = F.array(*[F.lit(0.0) for _ in range(dim)])
    unit = F.array(
        *[
            F.round(F.col(f"__c{i}") / F.col("__norm"), 9)
            for i in range(dim)
        ]
    )
    return (
        dense.withColumn("__norm", F.sqrt(norm_sq))
        .select(
            *keys,
            F.when(F.col("__norm") > 0, unit)
            .otherwise(empty_vec)
            .alias("embedding"),
            "n_terms",
        )
    )


def _hashed_vectors_rowwise(
    frame: DataFrame,
    keys: list[str],
    dim: int,
    text_col: str,
) -> DataFrame:
    """Row-grain twin of :func:`_hashed_vectors` for callers whose
    ``keys`` are the frame's own row grain (turn grain in
    :func:`turn_topic_shift`): the signed-hash unit vector is then a
    row-LOCAL computation, so one Arrow pass replaces the explode +
    64-wide aggregate + anti-join/union — no exchange at all, and the
    per-row array materializes into primitive Arrow buffers instead of
    72M boxed doubles (measured ~6 s → ~1.5 s for the 1M-turn
    topic-shift kernel at 10× bench scale).

    Bit-compatible with the group kernel: same ``_md5_long`` dim/sign
    draws (first 8 md5 hex chars), same space-only trim/split, and the
    component rounding ``floor(|v|·1e9 + 0.5)·sign/1e9`` reproduces
    ``F.round(v, 9)`` (HALF_UP) for these quotients — parity is
    asserted against the aggregate kernel in
    tests/test_conversations.py.
    """
    name_to_type = {f.name: f.dataType.simpleString() for f in frame.schema}
    key_schema = ", ".join(f"{k} {name_to_type[k]}" for k in keys)
    schema = f"{key_schema}, embedding array<double>, n_terms bigint"
    key_list = list(keys)

    def kernel(batches):
        import hashlib
        import re

        import numpy as np

        md5 = hashlib.md5
        split = re.compile(" +").split
        for pdf in batches:
            embs = []
            nts = []
            for t in pdf[text_col]:
                t = t if isinstance(t, str) else ""
                toks = [x for x in split(t.strip(" ")) if x]
                c = np.zeros(dim)
                for tok in toks:
                    b = tok.encode("utf-8")
                    d = int(md5(b).hexdigest()[:8], 16) % dim
                    s = (
                        1.0
                        if int(md5(b + b"#s").hexdigest()[:8], 16) % 2
                        else -1.0
                    )
                    c[d] += s
                norm = float(np.sqrt((c * c).sum()))
                if norm > 0:
                    v = c / norm
                    v = np.copysign(
                        np.floor(np.abs(v) * 1e9 + 0.5), v
                    ) / 1e9
                    embs.append(v.tolist())
                else:
                    embs.append([0.0] * dim)
                nts.append(len(toks))
            out = pdf[key_list].copy()
            out["embedding"] = embs
            out["n_terms"] = np.asarray(nts, dtype=np.int64)
            yield out

    return frame.select(*key_list, text_col).mapInPandas(kernel, schema)


def turn_topic_shift(
    transcripts: DataFrame,
    dim: int = 64,
    threshold: float = 0.5,
    text_col: str = "text",
) -> DataFrame:
    """Topic-boundary detection inside a conversation — the temporal ×
    embedding fusion: hash each turn into the same signed-BOW unit
    vector :func:`conversation_vectors` uses, then compare each turn
    to its predecessor with one ``lag`` window; a cosine below
    ``threshold`` marks a topic shift, and the running count of shifts
    segments the conversation.  Downstream uses: split long
    conversations into topically-coherent training examples, find
    abrupt context switches in agent trajectories, and size the
    segments compaction should respect.

    Because both vectors are unit-normalized, the cosine is a plain
    ``zip_with`` dot product — no norms at comparison time.  The first
    turn of a conversation has no predecessor: ``prev_cos`` NULL,
    ``new_topic`` true (it opens segment 1).  A token-less turn is the
    zero vector → cosine 0 with any neighbor → reads as a shift at any
    positive threshold (documented; filter empty turns first if that
    is noise for your corpus).

    Plan: the hashing kernel's two keyed aggregations + ONE
    conv-partitioned window pass (lag + running sum share the same
    sort) — the same shape as the flagship chain operators, no join.

    Returns ``(conv_id, turn_idx, n_terms, prev_cos, new_topic,
    segment_id)`` — one row per turn.
    """
    vecs = _hashed_vectors_rowwise(
        transcripts, ["conv_id", "turn_idx"], dim, text_col
    )
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    prev = F.lag("embedding").over(w)
    cos = F.round(
        F.aggregate(
            F.zip_with(F.col("embedding"), prev, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
        6,
    )
    shifted = vecs.select(
        "conv_id",
        "turn_idx",
        "n_terms",
        cos.alias("prev_cos"),
    ).withColumn(
        "new_topic",
        F.col("prev_cos").isNull() | (F.col("prev_cos") < threshold),
    )
    seg = F.sum(F.col("new_topic").cast("int")).over(
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return shifted.withColumn("segment_id", seg.cast("int"))


def turn_signals(
    transcripts: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Dialogue-specific heuristic signals per turn — the cheap gate an
    RLHF/SFT filtering pass runs before any model-based scoring:
    refusals, apologies, questions, code blocks, URLs, and shouting,
    each one codegen regexp/length expression (no Python, no shuffle —
    a pure projection over the transcript scan, linear at any scale).

    Signals (all computed on ``coalesce(text, '')``):

    * ``n_tokens`` / ``n_chars`` — whitespace tokens, raw length;
    * ``is_question`` — contains a ``?``;
    * ``n_code_blocks`` — fenced \\`\\`\\` pairs (``count(```)/2``);
    * ``n_urls`` — ``https?://`` occurrences;
    * ``refusal`` — case-insensitive "I cannot/can't/won't/unable
      to/I'm not able to" (the standard refusal-rate probe);
    * ``apology`` — case-insensitive "sorry/I apologize";
    * ``exclaims`` — ``!`` count;
    * ``caps_ratio`` — uppercase share of letters, 6 decimals
      (0 when the turn has no letters).

    Returns the transcript keys + role and the signal columns, one row
    per turn.
    """
    txt = F.coalesce(F.col(text_col), F.lit(""))
    letters = F.regexp_count(txt, F.lit(r"[A-Za-z]"))
    uppers = F.regexp_count(txt, F.lit(r"[A-Z]"))
    return transcripts.select(
        "conv_id",
        "turn_idx",
        "role",
        F.regexp_count(txt, F.lit(r"[^ ]+")).alias("n_tokens"),
        F.length(txt).alias("n_chars"),
        txt.contains("?").alias("is_question"),
        (F.regexp_count(txt, F.lit("```")) / 2)
        .cast("int")
        .alias("n_code_blocks"),
        F.regexp_count(txt, F.lit(r"https?://")).alias("n_urls"),
        (
            F.regexp_count(
                F.lower(txt),
                F.lit(
                    r"i cannot|i can't|i won't|unable to|i'm not able to"
                ),
            )
            > 0
        ).alias("refusal"),
        (
            F.regexp_count(F.lower(txt), F.lit(r"sorry|i apologize")) > 0
        ).alias("apology"),
        F.regexp_count(txt, F.lit("!")).alias("exclaims"),
        F.when(
            letters > 0,
            F.round(uppers.cast("double") / letters, 6),
        )
        .otherwise(F.lit(0.0))
        .alias("caps_ratio"),
    )


def injection_signals(
    transcripts: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Prompt-injection / jailbreak heuristic flags per turn — the
    safety-curation companion to :func:`turn_signals`: agent-transcript
    corpora routinely contain injection ATTEMPTS (in user turns and in
    tool outputs carrying untrusted web content), and a curation pass
    wants them surfaced — to exclude, downweight, or deliberately keep
    as adversarial training data — not silently mixed in.

    Heuristic regex families (documented, auditable, codegen-only —
    a cheap FIRST gate, not a safety classifier; all case-insensitive
    over ``coalesce(text, '')``):

    * ``override_attempt`` — "ignore/disregard/forget (all) previous/
      prior/above instructions", "new instructions:";
    * ``exfil_attempt`` — "reveal/print/show/repeat your (system)
      prompt/instructions";
    * ``persona_attempt`` — "you are now", "act as if", "pretend to
      be", "developer mode", "DAN mode";
    * ``encoding_evasion`` — base64-ish runs ≥ 40 chars, "decode the
      following", "rot13";
    * ``injection_score`` — the flag count (0-4), the sortable
      triage column.

    Pure projection: no shuffle, linear at any scale. Per-conversation
    rollups are one groupBy away; the per-turn grain keeps the
    evidence attached to the turn that carried it.
    """
    txt = F.lower(F.coalesce(F.col(text_col), F.lit("")))
    override = (
        F.regexp_count(
            txt,
            F.lit(
                r"(ignore|disregard|forget)\s+(all\s+)?"
                r"(previous|prior|above|earlier)\s+"
                r"(instructions?|prompts?|rules?|context)"
                r"|new instructions\s*:"
            ),
        )
        > 0
    )
    exfil = (
        F.regexp_count(
            txt,
            F.lit(
                r"(reveal|print|show|repeat|output|leak)\s+(me\s+)?"
                r"(your|the)\s+(system\s+)?(prompt|instructions?)"
            ),
        )
        > 0
    )
    persona = (
        F.regexp_count(
            txt,
            F.lit(
                r"you are now|act as if|pretend (to be|you are)"
                r"|developer mode|dan mode|jailbreak"
            ),
        )
        > 0
    )
    encoding = (
        F.regexp_count(
            txt,
            F.lit(r"[a-z0-9+/]{40,}={0,2}|decode the following|rot13"),
        )
        > 0
    )
    return transcripts.select(
        "conv_id",
        "turn_idx",
        "role",
        override.alias("override_attempt"),
        exfil.alias("exfil_attempt"),
        persona.alias("persona_attempt"),
        encoding.alias("encoding_evasion"),
        (
            override.cast("int")
            + exfil.cast("int")
            + persona.cast("int")
            + encoding.cast("int")
        ).alias("injection_score"),
    )
