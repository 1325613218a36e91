"""Per-node triangle counting + local clustering coefficient — the
classic structural seed feature one step beyond GraphRole's
degree/egonet family (the reference's egonet internal-edge count is a
triangle-adjacent quantity already; the clustering coefficient is its
normalized form and a standard ReFeX seed column).

Algorithm (the MapReduce-classic degree-ordered orientation, Suri &
Vassilvitskii WWW'11): orient every undirected edge from its lower
(degree, id) endpoint to the higher; every triangle then has exactly
ONE source whose two out-edges form the wedge, so each triangle is
generated once, and the wedge fan-out per node is bounded by the
ORIENTED out-degree — O(m^{3/2}) total wedges on any graph, hub-proof
(a 10⁷-degree hub has tiny oriented out-degree because almost all its
neighbors out-rank it).

Plan: one degree aggregate, one orientation projection, one
self-join on the wedge source, one membership join against oriented
edges (both equi-joins on hash-balanced keys), one per-node count.
No driver state; parallel edges/self-loops dropped first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def triangle_counts(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Exact per-node triangle count and local clustering coefficient
    over the UNDIRECTED simple graph underlying ``edges`` (direction,
    weights, parallel edges and self-loops are ignored — triangle
    structure is a property of the simple graph).

    Returns ``(node, degree, triangles, clustering_coef)`` for every
    node, ``clustering_coef = 2·T / (deg·(deg−1))`` rounded to 9
    (0 when ``deg < 2``).
    """
    a, b = F.col(src_col).cast("string"), F.col(dst_col).cast("string")
    und = (
        edges.select(
            F.least(a, b).alias("u"), F.greatest(a, b).alias("v")
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
        .persist()
    )
    deg = (
        und.select(F.col("u").alias("node"))
        .unionByName(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("degree"))
        .persist()
    )
    # orientation rank: (degree, node) — total order, hub-proof
    du = deg.select(
        F.col("node").alias("u"), F.col("degree").alias("__du")
    )
    dv = deg.select(
        F.col("node").alias("v"), F.col("degree").alias("__dv")
    )
    ranked = und.join(du, "u").join(dv, "v")
    lower_first = (F.col("__du") < F.col("__dv")) | (
        (F.col("__du") == F.col("__dv")) & (F.col("u") < F.col("v"))
    )
    oriented = ranked.select(
        F.when(lower_first, F.col("u")).otherwise(F.col("v")).alias("s"),
        F.when(lower_first, F.col("v")).otherwise(F.col("u")).alias("t"),
    ).persist()
    # wedges from each source's oriented out-neighbors (x < y by rank
    # order is not needed — dedup via strict name inequality)
    o1 = oriented.select(F.col("s"), F.col("t").alias("x"))
    o2 = oriented.select(F.col("s"), F.col("t").alias("y"))
    wedges = o1.join(o2, "s").where(F.col("x") < F.col("y"))
    # close the wedge: (x, y) must be an edge of the simple graph
    closing = und.select(
        F.col("u").alias("x"), F.col("v").alias("y")
    )
    tris = wedges.join(closing, ["x", "y"])
    corners = (
        tris.select(F.col("s").alias("node"))
        .unionByName(tris.select(F.col("x").alias("node")))
        .unionByName(tris.select(F.col("y").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("triangles"))
    )
    out = deg.join(corners, "node", "left").select(
        "node",
        "degree",
        F.coalesce("triangles", F.lit(0)).alias("triangles"),
        F.round(
            F.when(
                F.col("degree") >= 2,
                2.0
                * F.coalesce("triangles", F.lit(0))
                / (F.col("degree") * (F.col("degree") - 1)),
            ).otherwise(F.lit(0.0)),
            9,
        ).alias("clustering_coef"),
    )
    return out
