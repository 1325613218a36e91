"""Duplicate-cluster resolution: connected components over near-dup
pairs and canonical-document selection.

The dedup operators in :mod:`graphrole_spark.functions.text` and
:mod:`graphrole_spark.functions.similarity` emit *pairs* — but a
training-data pipeline needs per-document decisions: which cluster does
each doc belong to, and which single doc per cluster survives.  Pair →
cluster is a connected-components problem (near-dup similarity is not
transitive, so clusters chain), and at 100 TB the dup graph does not fit
on the driver, so we use the alternating large-star/small-star algorithm
(Kiveris et al., "Connected Components in MapReduce and Beyond",
SoCC'14): O(log^2 n) rounds of groupBy+join, each a plain shuffle on the
node key, no driver-side graph.  Each round's edge set is
``localCheckpoint``-ed to cut lineage (same discipline as the ReFeX
recursion driver, operators/recursion.py).

No reference counterpart: GraphRole has no dedup layer; this extends the
brief's training-data-pipeline surface.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, functions as F


def _canonical_edge_stats(edges: DataFrame, pre_deduped: bool = False) -> tuple[int, int]:
    """(count, xor-ish hash) of the canonical undirected edge set —
    cheap convergence fingerprint, one aggregate job.

    ``pre_deduped=True`` skips the distinct shuffle: star-round output
    is already distinct AND uniformly high→low directed, so the
    least/greatest canonicalization is a bijection on its rows — the
    dedup would re-shuffle the whole edge list per round for nothing
    (review finding; the initial symmetric call still needs it)."""
    canon = edges.select(
        F.least("u", "v").alias("a"), F.greatest("u", "v").alias("b")
    )
    if not pre_deduped:
        canon = canon.distinct()
    row = (
        canon
        .agg(
            F.count("*").alias("n"),
            # bit_xor: order-independent and overflow-free under ANSI mode
            F.coalesce(F.bit_xor(F.xxhash64("a", "b")), F.lit(0)).alias("h"),
        )
        .first()
    )
    return int(row["n"]), int(row["h"])


def _symmetrize(edges: DataFrame, dedup: bool = True) -> DataFrame:
    """Both directions of an edge list in ONE pass: explode a 2-element
    struct array instead of a self-union.  Besides reading the input
    once, this dodges a Catalyst constraint-propagation bug
    (UnionBase.rewriteConstraints "key not found") that a self-union
    sharing expression ids can trigger on Spark 4.1.

    ``dedup=False`` skips the distinct shuffle — correct whenever the
    input is already distinct AND uniformly directed (star-round output
    is always high→low, so reversing cannot collide), making the
    symmetrization a pure map."""
    pair = F.explode(
        F.array(
            F.struct(F.col("u").alias("a"), F.col("v").alias("b")),
            F.struct(F.col("v").alias("a"), F.col("u").alias("b")),
        )
    )
    out = (
        edges.select(pair.alias("e"))
        .select(F.col("e.a").alias("u"), F.col("e.b").alias("v"))
    )
    return out.distinct() if dedup else out


def _star_round(edges: DataFrame, large: bool) -> DataFrame:
    """One large-star (or small-star) round over a symmetric edge list.

    large-star: for every node u, connect its *greater* neighbors to
    m = min(N(u) ∪ {u}).  small-star: connect its ≤ neighbors (and u
    itself) to m.  Both are one groupBy(u) + one re-join, shuffling on
    the node key only.
    """
    nbr_min = edges.groupBy("u").agg(
        F.least(F.min("v"), F.first("u")).alias("m")
    )
    joined = edges.join(nbr_min, "u")
    if large:
        out = joined.where(F.col("v") > F.col("u")).select(
            F.col("v").alias("u"), F.col("m").alias("v")
        )
    else:
        low = joined.where(F.col("v") <= F.col("u")).select(
            F.col("v").alias("u"), F.col("m").alias("v")
        )
        self_edge = nbr_min.select(F.col("u"), F.col("m").alias("v"))
        out = low.unionByName(self_edge)
    return out.where(F.col("u") != F.col("v")).distinct()


def connected_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iterations: int = 30,
    stats: Optional[dict] = None,
) -> DataFrame:
    """Resolve an undirected pair list to components.

    Returns ``(node, component)`` for every node appearing in ``pairs``,
    where ``component`` is the minimum node id in that node's component
    (under the id column's natural ordering — works for longs and
    strings alike).  Alternates large-star/small-star until the
    canonical edge set is stable; each round is two shuffles on the node
    key and the intermediate edge list is checkpointed so the physical
    plan stays flat regardless of round count.

    Raises ``RuntimeError`` if ``max_iterations`` rounds do not
    converge (never observed below ~10 rounds on real dup graphs; the
    bound is a runaway guard, not a tuning knob).
    """
    edges = (
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .where(F.col("u").isNotNull() & F.col("v").isNotNull())
        .where(F.col("u") != F.col("v"))
    )
    # one checkpoint of the (possibly expensive) upstream pair plan —
    # nodes and the iteration both read the materialized copy
    sym = _symmetrize(edges).localCheckpoint()
    nodes = sym.select(F.col("u").alias("node")).distinct()

    spark = pairs.sparkSession
    cp_key = "spark.sql.constraintPropagation.enabled"
    cp_prev = spark.conf.get(cp_key, "true")
    # the small-star union below can still hit the same Catalyst
    # constraint-rewrite bug; constraints buy nothing in this loop
    spark.conf.set(cp_key, "false")
    try:
        cur = sym
        prev_stats = _canonical_edge_stats(cur)
        if stats is not None:
            stats["initial_edges"] = prev_stats[0]
            stats["rounds"] = 0
        for _round in range(max_iterations):
            # Each star's output is checkpointed before the next step
            # reads it twice (groupBy side + join probe side) — without
            # the materialization the recompute fan-out compounds per
            # round and the sweep goes super-linear.  Star output is
            # distinct and high→low directed, so the re-symmetrizations
            # are pure maps (dedup=False, no shuffle).
            after_large = _star_round(cur, large=True).localCheckpoint()
            cur_half = _star_round(
                _symmetrize(after_large, dedup=False), large=False
            ).localCheckpoint()
            cur = _symmetrize(cur_half, dedup=False)
            cur_stats = _canonical_edge_stats(cur_half, pre_deduped=True)
            if stats is not None:
                stats["rounds"] = _round + 1
            if cur_stats == prev_stats:
                break
            prev_stats = cur_stats
        else:
            raise RuntimeError(
                f"connected_components did not converge in {max_iterations} rounds"
            )
    finally:
        spark.conf.set(cp_key, cp_prev)

    # converged: `cur` is a forest of stars v -> min; a node's component
    # is the min over its star edges (or itself for singleton stars).
    comp = cur.groupBy("u").agg(F.min("v").alias("_m"))
    return (
        nodes.join(comp, nodes["node"] == comp["u"], "left")
        .select(
            "node",
            F.least(F.coalesce("_m", "node"), "node").alias("component"),
        )
    )


def dedup_keep(
    documents: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "doc_a",
    dst: str = "doc_b",
    quality_col: Optional[str] = None,
    max_iterations: int = 30,
) -> DataFrame:
    """Per-document dedup decision from a near-dup pair list.

    Joins every document to its duplicate cluster (docs in no pair form
    their own singleton cluster) and selects one canonical survivor per
    cluster: the highest ``quality_col`` (ties → smallest id), or the
    smallest id when no quality column is given.

    Returns ``documents``' id column plus ``(cluster_id, cluster_size,
    keep)``.  One CC pass + one broadcast-friendly join + one window —
    the window partitions by cluster, whose size is bounded by the dup
    cluster size, not the corpus.
    """
    from pyspark.sql import Window

    comp = connected_components(
        pairs, src=src, dst=dst, max_iterations=max_iterations
    )
    docs = documents.select(
        F.col(id_col),
        *( [F.col(quality_col)] if quality_col else [] ),
    )
    with_comp = docs.join(
        comp, docs[id_col] == comp["node"], "left"
    ).select(
        id_col,
        *( [quality_col] if quality_col else [] ),
        F.coalesce("component", F.col(id_col)).alias("cluster_id"),
    )
    order = (
        [F.desc(quality_col), F.asc(id_col)] if quality_col else [F.asc(id_col)]
    )
    w = Window.partitionBy("cluster_id").orderBy(*order)
    wsz = Window.partitionBy("cluster_id")
    return with_comp.select(
        id_col,
        "cluster_id",
        F.count("*").over(wsz).alias("cluster_size"),
        (F.row_number().over(w) == 1).cast("int").alias("keep"),
    )


def split_leakage(
    pairs: DataFrame,
    assignment: DataFrame,
    id_col: str = "doc_id",
    split_col: str = "split",
    pair_cols: tuple[str, str] = ("doc_id_a", "doc_id_b"),
) -> DataFrame:
    """Audit an EXISTING train/val/test assignment against a near-dup
    pair list: count pairs whose endpoints landed in different splits
    — the leakage the group-aware splitters (`conversations.py::
    split_conversations`, `corpus.split_assign` on cluster keys)
    prevent by construction, and the first thing to check on a split
    you inherited rather than built.

    Returns one row per unordered split pair:
    ``(split_a, split_b, n_pairs, leaking)`` with ``split_a <=
    split_b`` and ``leaking = 1`` iff the splits differ (diagonal rows
    are the benign within-split duplicate counts, kept for context).
    Pairs with an endpoint missing from ``assignment`` are counted
    under split ``"(unassigned)"`` — silent drops would hide exactly
    the rows most likely to be wrong.

    Plan: two broadcast-or-shuffle equi-joins of the (bounded,
    candidate-sized) pair list against the assignment, one tiny
    aggregate. The assignment side is (id, split) only — column-pruned
    at the scan.
    """
    a_col, b_col = pair_cols
    asg = assignment.select(
        F.col(id_col).alias("__id"), F.col(split_col).alias("__s")
    )
    joined = (
        pairs.select(F.col(a_col).alias("__a"), F.col(b_col).alias("__b"))
        .join(asg.withColumnRenamed("__id", "__a")
              .withColumnRenamed("__s", "__sa"), "__a", "left")
        .join(asg.withColumnRenamed("__id", "__b")
              .withColumnRenamed("__s", "__sb"), "__b", "left")
    )
    sa = F.coalesce(F.col("__sa"), F.lit("(unassigned)"))
    sb = F.coalesce(F.col("__sb"), F.lit("(unassigned)"))
    return (
        joined.select(
            F.least(sa, sb).alias("split_a"),
            F.greatest(sa, sb).alias("split_b"),
        )
        .groupBy("split_a", "split_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
        .withColumn(
            "leaking",
            (F.col("split_a") != F.col("split_b")).cast("int"),
        )
        .orderBy("split_a", "split_b")
    )
