"""Distributed PageRank over an edge DataFrame — the global-importance
companion to the reference's local/egonet seed features (GraphRole
computes degree-family features only, graphrole/graph/interface.py;
role-discovery practice (ReFeX/RolX, Henderson et al. KDD'11/'12)
routinely appends centrality columns to the regional feature matrix,
and `pagerank_features` plugs straight into the engine's seed frame).

Semantics: standard damped PageRank (Brin & Page 1998) with weighted
out-edge distribution and uniform dangling-mass redistribution —
``networkx.pagerank`` parity (same fixpoint, same dangling rule).

Plan (100 TB lens): the transition structure is computed ONCE — one
out-weight aggregate joined back to edges, the share-normalized edge
frame persisted and hash-partitioned by ``src``. Each iteration is
one co-partitioned join (ranks are hashed on the same key) + one
``dst`` aggregate, with the dangling mass riding along as a lazy
broadcast 1-row frame; ranks are ``localCheckpoint``-ed each
iteration (one driver job per iteration, lineage O(1) — see the
in-loop note for why chaining iterations lazily is a trap). No
driver-side graph.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    n_iter: int = 20,
    tol: Optional[float] = None,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: Optional[str] = "weight",
    personalize: Optional[DataFrame] = None,
    init_ranks: Optional[DataFrame] = None,
    iter_stats: Optional[list] = None,
) -> DataFrame:
    """PageRank scores for every node appearing as ``src`` or ``dst``.

    * ``damping`` — teleport 1−d to a uniform jump (d in (0, 1)).
    * ``n_iter`` — fixed iteration budget.
    * ``tol`` — optional early stop when the L1 rank delta falls below
      it (costs one extra scalar reduction per iteration).
    * ``weight_col`` — out-edge mass is distributed ∝ weight
      (``None`` → unweighted). Non-positive / NULL weights are
      dropped — a node reachable ONLY via dropped edges does not
      appear in the output at all; parallel edges accumulate.
    * dangling nodes (no out-edges) spread their mass uniformly over
      ALL nodes each iteration — the ``networkx.pagerank`` rule, so
      ranks sum to 1 at every step.
    * ``personalize`` — optional ``(node, weight)`` frame: teleport
      (and dangling mass) lands on these nodes ∝ weight instead of
      uniformly — personalized PageRank, the "nodes similar to this
      seed set" primitive (networkx ``personalization=`` semantics:
      weights normalized to 1; listed nodes missing from the graph
      are ignored; graph nodes absent from the list get reset mass
      0). The reset vector rides the same hash partitioning as the
      ranks, so iterations stay one join + one aggregate.
    * ``iter_stats`` — optional caller-owned list; each iteration
      appends ``{"iter", "sec"}`` (+``"delta"`` when ``tol`` is set)
      right after its eager checkpoint, so scale sweeps can record
      per-iteration wall without touching the plan.
    * ``init_ranks`` — optional ``(node, rank)`` warm start (e.g.
      yesterday's converged ranks after an edge append): the vector
      is re-normalized to sum 1 over the CURRENT node set (new nodes
      start at the uniform mass), and with ``tol`` set a near-
      converged start exits in one or two iterations instead of
      paying the full budget — the incremental-recompute path.

    Returns ``(node, rank)`` with ``sum(rank) = 1``.

    Reference scope note: GraphRole itself stops at degree/egonet
    features (graphrole/graph/interface.py:60-150); this operator is
    part of the engine's beyond-reference graph layer.
    """
    if not 0.0 < damping < 1.0:
        raise ValueError("damping must be in (0, 1)")
    if n_iter < 1:
        raise ValueError("n_iter must be >= 1")
    if tol is not None and tol <= 0:
        raise ValueError("tol must be positive")

    w = (
        F.col(weight_col).cast("double")
        if weight_col is not None
        else F.lit(1.0)
    )
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst"), w.alias("w")
    )
    if weight_col is not None:
        e = e.where(F.col("w").isNotNull() & (F.col("w") > 0))

    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    if n == 0:
        return nodes.select("node", F.lit(0.0).alias("rank"))

    out_w = e.groupBy("src").agg(F.sum("w").alias("__ow"))
    # share-normalized transition edges: computed once, pinned, and
    # pre-hashed on src so every iteration's join is co-partitioned
    trans = (
        e.join(out_w, "src")
        .select("src", "dst", (F.col("w") / F.col("__ow")).alias("share"))
        .repartition("src")
        .persist()
    )
    trans.count()
    # dangling = nodes with no out-edges (left-anti against src set)
    dangling = nodes.join(
        trans.select(F.col("src").alias("node")).distinct(),
        "node",
        "left_anti",
    ).persist()

    d = float(damping)
    if personalize is not None:
        pz = personalize.select(
            F.col("node"), F.col("weight").cast("double").alias("__pw")
        ).where(F.col("__pw").isNotNull() & (F.col("__pw") > 0))
        pz = nodes.join(pz, "node", "inner")
        ptot = pz.agg(F.sum("__pw")).collect()[0][0]
        if not ptot:
            raise ValueError("personalization has no positive-weight graph nodes")
        reset = (
            nodes.join(pz, "node", "left")
            .select(
                "node",
                (F.coalesce(F.col("__pw"), F.lit(0.0)) / F.lit(float(ptot))).alias("__p0"),
            )
            .repartition("node")
            .persist()
        )
    else:
        reset = nodes.select(
            "node", F.lit(1.0 / n).alias("__p0")
        ).repartition("node").persist()
    reset.count()
    if init_ranks is not None:
        warm = init_ranks.select(
            "node", F.col("rank").cast("double").alias("__r0")
        ).where(F.col("__r0").isNotNull() & (F.col("__r0") >= 0))
        seeded = nodes.join(warm, "node", "left").select(
            "node", F.coalesce("__r0", F.lit(1.0 / n)).alias("__r0")
        )
        tot = seeded.agg(F.sum("__r0")).collect()[0][0]
        if not tot:
            raise ValueError("init_ranks carries no positive mass")
        ranks = seeded.select(
            "node", (F.col("__r0") / F.lit(float(tot))).alias("rank")
        ).repartition("node")
    else:
        ranks = reset.select(
            "node", F.lit(1.0 / n).alias("rank")
        ).repartition("node")
    ranks = ranks.localCheckpoint(eager=True)

    import time as _time

    for it in range(n_iter):
        _t0 = _time.time()
        # dangling mass as a LAZY broadcast 1-row frame off the
        # PREVIOUS (checkpointed) ranks — no separate collect job.
        # NOTE a tempting non-fix: letting several iterations chain
        # lazily between checkpoints goes QUADRATIC, because each
        # iteration's dang broadcast re-executes its whole un-
        # materialized prefix (Spark does not reuse subplans across a
        # broadcast boundary) — measured 17.7 s -> 67 s at 1M edges.
        # One checkpoint per iteration keeps every subplan reference
        # one materialized step away: one driver job per iteration.
        dang = (
            dangling.join(ranks, "node")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__dm"))
        )
        contribs = (
            trans.join(
                ranks.withColumnRenamed("node", "src"), "src"
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("share") * F.col("rank")).alias("__c"))
        )
        new_ranks = (
            reset.join(contribs, "node", "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "node",
                (
                    F.lit(1.0 - d) * F.col("__p0")
                    + F.lit(d)
                    * (F.coalesce(F.col("__c"), F.lit(0.0))
                       + F.col("__dm") * F.col("__p0"))
                ).alias("rank"),
            )
        )
        new_ranks = new_ranks.localCheckpoint(eager=True)
        if iter_stats is not None:
            iter_stats.append(
                {"iter": it + 1, "sec": round(_time.time() - _t0, 3)}
            )
        if tol is not None:
            delta = (
                ranks.withColumnRenamed("rank", "__old")
                .join(new_ranks, "node")
                .agg(F.sum(F.abs(F.col("rank") - F.col("__old"))))
                .collect()[0][0]
            )
            if iter_stats is not None and iter_stats:
                iter_stats[-1]["delta"] = delta
            if delta is not None and delta < tol:
                ranks = new_ranks
                break
        ranks = new_ranks

    return ranks.select("node", F.round("rank", 12).alias("rank"))


def pagerank_features(
    edges: DataFrame,
    damping: float = 0.85,
    n_iter: int = 20,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: Optional[str] = "weight",
) -> DataFrame:
    """:func:`pagerank` shaped like a seed-feature frame
    (``node, pagerank``) so it concatenates with
    ``operators/seeds.py`` outputs on the ``node`` key."""
    return pagerank(
        edges,
        damping=damping,
        n_iter=n_iter,
        src_col=src_col,
        dst_col=dst_col,
        weight_col=weight_col,
    ).withColumnRenamed("rank", "pagerank")
