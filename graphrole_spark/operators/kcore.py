"""k-core decomposition — the degeneracy-ordering structural feature
that completes the graph layer's seed family (degree, egonet,
triangles, pagerank, communities): ``core_number(v)`` is the largest
``k`` such that ``v`` survives in the subgraph where every node has
degree ≥ k. It is the standard "how deep inside a dense region does
this node sit" signal — hubs on the periphery of a network have high
degree but LOW coreness, which is exactly the distinction RolX-style
role features want.

Algorithm: the distributed H-index fixpoint (Lü, Zhou, Zhang & Stanley,
"The H-index of a network node and its relation to degree and
coreness", Nat. Commun. 2016): initialize ``c(v) = degree(v)`` and
repeatedly replace ``c(v)`` with the H-index of its neighbors' current
values (the largest ``h`` such that ≥ h neighbors have ``c ≥ h``).
The sequence is monotonically non-increasing and converges exactly to
the core number — no sequential peeling, so the whole update is one
edges⋈labels join + one per-node ordered aggregate per round,
embarrassingly parallel at any graph size (unlike the textbook
min-degree peeling, whose peel order is inherently sequential).

Plan per round: join labels onto the symmetrized edge list (node-keyed
hash exchange), then the H-index per node via one window rank over the
node's neighbor values — ``h = max over sorted-desc neighbors of
min(rank, value)`` — and labels are ``localCheckpoint``-ed per round
(the pagerank discipline; see pagerank.py for why lazy chaining across
iterations is quadratic). Early-stops when a round changes no label.

Convergence bound: the fixpoint needs O(graph diameter) rounds in the
worst case — information about a low-degree fringe propagates one hop
per round, so path/ring-like graphs of length L need ~L/2 rounds, NOT
single digits. Heavy-tailed web/social graphs (small diameter) converge
in single digits, which is where the default ``max_iter`` is sized; on
long-path-like graphs pass ``max_iter`` ≥ diameter. If the loop
exhausts ``max_iter`` before the fixpoint, the returned values are an
UPPER BOUND on coreness, not coreness — ``core_numbers`` warns loudly
(or raises with ``strict=True``) instead of returning them silently.

Reference scope note: GraphRole stops at degree/egonet features
(graphrole/graph/interface.py:60-150); this operator is part of the
engine's beyond-reference graph layer.
"""

from __future__ import annotations

import warnings
from typing import Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def core_numbers(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 50,
    iter_stats: Optional[list] = None,
    strict: bool = False,
) -> DataFrame:
    """Core number for every node of the undirected simple graph
    underlying ``edges`` (direction/weights/parallel edges/self-loops
    ignored — coreness is a property of the simple graph).

    * ``max_iter`` — safety bound on H-index rounds. The loop
      early-stops on the first round with zero label changes; the
      worst-case round count is O(graph diameter) (see module
      docstring), so size ``max_iter`` accordingly for path/ring-like
      topologies. If the bound is hit before the fixpoint, the values
      are only an upper bound on coreness: a ``RuntimeWarning`` is
      emitted (or ``RuntimeError`` raised with ``strict=True``).
    * ``iter_stats`` — optional caller-owned list; each round appends
      ``{"iter", "sec", "changed"}`` (wall to and including the eager
      checkpoint + the change count) for per-iteration scale evidence.
    * ``strict`` — raise instead of warn on non-convergence.

    Returns ``(node string, core_number int)`` for every node with at
    least one edge (isolated nodes never enter ``edges`` and would
    trivially have coreness 0).
    """
    if max_iter < 1:
        raise ValueError("max_iter must be >= 1")
    a, b = F.col(src_col).cast("string"), F.col(dst_col).cast("string")
    und = (
        edges.select(F.least(a, b).alias("u"), F.greatest(a, b).alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    # symmetrized adjacency, pre-hashed on "v" — the key every round's
    # labels join actually probes on (labels are joined as (v, __nc)),
    # so the wide adjacency never re-exchanges; the post-join H-index
    # window on node=u needs its own exchange either way, but that one
    # carries only narrow (node, v, __nc) rows
    adj = (
        und.unionByName(
            und.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        .repartition("v")
        .persist()
    )
    adj.count()

    labels = (
        adj.groupBy(F.col("u").alias("node"))
        .agg(F.count(F.lit(1)).cast("int").alias("c"))
        .localCheckpoint(eager=True)
    )

    import time as _time

    wn = Window.partitionBy("node").orderBy(F.desc("__nc"), F.asc("v"))
    for it in range(max_iter):
        _t0 = _time.time()
        neigh = adj.join(
            labels.select(F.col("node").alias("v"), F.col("c").alias("__nc")),
            "v",
        ).select(F.col("u").alias("node"), "v", "__nc")
        # H-index: with neighbor values sorted desc, h = max_r min(r, value_r)
        hidx = (
            neigh.withColumn("__r", F.row_number().over(wn))
            .groupBy("node")
            .agg(
                F.max(F.least(F.col("__r"), F.col("__nc")))
                .cast("int")
                .alias("__h")
            )
        )
        new_labels = (
            labels.join(hidx, "node", "left")
            .select(
                "node",
                # H-index over the FULL neighbor multiset can exceed the
                # current label only transiently; coreness iteration is
                # non-increasing, so clamp (guards numeric drift, no-op
                # on a correct trace)
                F.least(
                    F.coalesce(F.col("__h"), F.lit(0)), F.col("c")
                ).alias("c"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.join(
                labels.select("node", F.col("c").alias("__old")), "node"
            )
            .where(F.col("c") != F.col("__old"))
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
            break
    adj.unpersist()
    if changed != 0:
        msg = (
            f"core_numbers did not reach the H-index fixpoint within "
            f"max_iter={max_iter} rounds; the returned values are an "
            f"UPPER BOUND on coreness, not coreness. Convergence needs "
            f"O(graph diameter) rounds on path/ring-like graphs — "
            f"raise max_iter."
        )
        if strict:
            raise RuntimeError(msg)
        warnings.warn(msg, RuntimeWarning, stacklevel=2)
    return labels.select("node", F.col("c").alias("core_number"))


def kcore_subgraph(
    edges: DataFrame,
    k: int,
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 50,
    strict: bool = False,
) -> DataFrame:
    """Edges of the ``k``-core: the maximal subgraph where every node
    has degree ≥ k — the classic "throw away the ragged periphery"
    cut before community detection or embedding training.

    Derived from :func:`core_numbers` (both endpoints' coreness ≥ k)
    rather than re-peeling, so one decomposition serves every ``k``.
    ``max_iter``/``strict`` pass through to :func:`core_numbers` (a
    non-converged decomposition over-admits edges, so the same
    warning/raise discipline applies here). Returns ``(u string,
    v string)`` with ``u < v``.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    cn = core_numbers(
        edges, src_col=src_col, dst_col=dst_col, max_iter=max_iter,
        strict=strict,
    ).where(F.col("core_number") >= k)
    a, b = F.col(src_col).cast("string"), F.col(dst_col).cast("string")
    und = (
        edges.select(F.least(a, b).alias("u"), F.greatest(a, b).alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    keep = cn.select(F.col("node"))
    return (
        und.join(keep.select(F.col("node").alias("u")), "u", "left_semi")
        .join(keep.select(F.col("node").alias("v")), "v", "left_semi")
        .select("u", "v")
    )
