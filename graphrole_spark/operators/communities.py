"""Community detection by label propagation (Raghavan, Albert &
Kumara 2007) — the near-linear-time community operator that pairs
with the role layer: RolX groups nodes by structural ROLE (hubs with
hubs, even across the graph); communities group by CONNECTIVITY
(dense neighborhoods). Role × community is the standard joint
descriptor for transcript/interaction graphs.

This is the DETERMINISTIC semi-synchronous variant: nodes are split
into two parity classes by the portable md5 hash, and each half-step
updates ONE class — a node adopts the label carrying the maximum
incident weight among its neighbors plus its own current label
(self-inclusion), ties toward the smallest label. The checkerboard
schedule is the standard fix for synchronous LPA's two-cycles (a
tightly-coupled pair can otherwise swap labels forever — observed on
a weighted pair fixture); no randomness anywhere, so results are
reproducible across runs and partitionings (the original paper's
random asynchronous order converges faster but is irreproducible by
design).

Plan: per iteration one edges⋈labels join (both directions of the
symmetrized edge list) + one (node, label) weight aggregate + one
per-node argmax window over degree-bounded rows; labels are
``localCheckpoint``-ed per iteration (the pagerank discipline — see
pagerank.py for why lazy chaining across iterations is a trap).
Early-stops after two consecutive half-steps change nothing (one
full checkerboard cycle with no movement).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def label_propagation(
    edges: DataFrame,
    n_iter: int = 10,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: Optional[str] = None,
    self_weight: float = 0.5,
    iter_stats: Optional[list] = None,
) -> DataFrame:
    """Community labels for every node of the undirected (symmetrized,
    deduplicated, self-loop-free) graph underlying ``edges``.

    * ``weight_col`` — neighbor votes count ∝ weight (``None`` →
      unweighted); non-positive/NULL weights drop the edge.
    * ``self_weight`` — the node's own current label joins the vote
      with this weight (0 disables; a mild self-vote stabilizes
      boundary nodes — the checkerboard schedule, not this, is what
      prevents two-cycles).
    * labels start as the node's own id; after convergence the
      community id is the smallest node id the propagation settled on.
    * ``n_iter`` counts HALF-steps (one parity class each); the loop
      early-stops when two consecutive half-steps change nothing.
    * ``iter_stats`` — optional caller-owned list; each half-step
      appends ``{"iter", "sec", "changed"}`` (wall to and including
      its eager checkpoint + the any-change probe), for per-iteration
      scale evidence.

    Returns ``(node, community, n_iter_run int)`` — ``n_iter_run`` is
    the same value on every row (half-steps actually executed).
    """
    if n_iter < 1:
        raise ValueError("n_iter must be >= 1")
    if self_weight < 0:
        raise ValueError("self_weight must be >= 0")
    a = F.col(src_col).cast("string")
    b = F.col(dst_col).cast("string")
    w = (
        F.col(weight_col).cast("double")
        if weight_col is not None
        else F.lit(1.0)
    )
    e = edges.select(
        F.least(a, b).alias("u"), F.greatest(a, b).alias("v"), w.alias("w")
    ).where(F.col("u") != F.col("v"))
    if weight_col is not None:
        e = e.where(F.col("w").isNotNull() & (F.col("w") > 0))
    # parallel edges accumulate weight; symmetrize once
    und = e.groupBy("u", "v").agg(F.sum("w").alias("w"))
    adj = und.unionByName(
        und.select(
            F.col("v").alias("u"), F.col("u").alias("v"), F.col("w")
        )
    ).persist()
    nodes = adj.select(F.col("u").alias("node")).distinct()
    # portable md5 parity class (reproducible in the python oracle)
    parity = F.pmod(
        F.conv(F.substring(F.md5(F.col("node")), 1, 8), 16, 10).cast(
            "long"
        ),
        F.lit(2),
    )
    labels = nodes.select(
        "node", F.col("node").alias("label"), parity.alias("__p")
    ).localCheckpoint(eager=True)

    import time as _time

    it_run = 0
    prev_unchanged = False
    for it in range(n_iter):
        _t0 = _time.time()
        votes = (
            adj.join(
                labels.select(F.col("node").alias("v"), F.col("label")),
                "v",
            )
            .select(F.col("u").alias("node"), "label", "w")
        )
        if self_weight > 0:
            votes = votes.unionByName(
                labels.select(
                    "node", "label", F.lit(float(self_weight)).alias("w")
                )
            )
        tallied = votes.groupBy("node", "label").agg(
            F.sum("w").alias("__w")
        )
        wn = Window.partitionBy("node").orderBy(
            F.desc("__w"), F.asc("label")
        )
        best = (
            tallied.withColumn("__r", F.row_number().over(wn))
            .where(F.col("__r") == 1)
            .select("node", F.col("label").alias("__new"))
        )
        active = it % 2
        new_labels = (
            labels.join(best, "node", "left")
            .select(
                "node",
                F.when(
                    (F.col("__p") == active) & F.col("__new").isNotNull(),
                    F.col("__new"),
                )
                .otherwise(F.col("label"))
                .alias("label"),
                "__p",
            )
            .localCheckpoint(eager=True)
        )
        it_run = it + 1
        changed = (
            new_labels.join(
                labels.select(
                    "node", F.col("label").alias("__old")
                ),
                "node",
            )
            .where(F.col("label") != F.col("__old"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if iter_stats is not None:
            iter_stats.append(
                {
                    "iter": it + 1,
                    "sec": round(_time.time() - _t0, 3),
                    "changed": bool(changed),
                }
            )
        if changed == 0:
            if prev_unchanged:
                break
            prev_unchanged = True
        else:
            prev_unchanged = False
    adj.unpersist()
    return labels.select(
        "node",
        F.col("label").alias("community"),
        F.lit(it_run).alias("n_iter_run"),
    )
