"""Graph-object source adapters — the reference's front door.

The reference dispatches on the input graph's library
(reference: graphrole/graph/interface/__init__.py:12-53, adapters at
interface/networkx.py:12 and interface/igraph.py:19). This module gives
the Spark engine the same entry point: a networkx (or igraph, when
installed) object is converted ONCE on the driver into the engine's
native relations — an edge DataFrame ``(src, dst, weight)``, a node
DataFrame, and an optional node-attribute DataFrame — after which every
computation is distributed. Conversion cost is O(|E|) driver work, which
is the correct boundary: a graph that arrives as an in-memory networkx
object is driver-sized by definition; graphs at engine scale arrive as
tables and skip this path entirely.
"""

from __future__ import annotations

from typing import Optional, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_WEIGHT = 1.0  # reference: interface/networkx.py:115-123


def _spark(spark: Optional[SparkSession]) -> SparkSession:
    return spark or SparkSession.builder.getOrCreate()


def from_networkx(
    G,
    spark: Optional[SparkSession] = None,
    weight_attr: str = "weight",
) -> Tuple[DataFrame, DataFrame, Optional[DataFrame], bool]:
    """Convert a networkx graph to engine relations.

    Returns ``(edges, nodes, node_attributes, directed)``:

    * ``edges``: (src, dst, weight) — missing edge weights default to 1.0
      (reference: networkx.py:115-123);
    * ``nodes``: every node, including isolated ones (kept 0-filled by
      the extractor, reference semantics);
    * ``node_attributes``: one column per node attribute when any node
      carries attributes, else None — non-numeric columns are skipped
      downstream and missing values 0-filled
      (reference: networkx.py:87-113);
    * ``directed``: ``G.is_directed()``.
    """
    spark = _spark(spark)
    node_ids = [str(n) for n in G.nodes]
    edge_rows = [
        (str(u), str(v), float(d.get(weight_attr, DEFAULT_WEIGHT)))
        for u, v, d in G.edges(data=True)
    ]
    edges = spark.createDataFrame(
        edge_rows, "src string, dst string, weight double"
    ) if edge_rows else spark.createDataFrame([], "src string, dst string, weight double")
    nodes = spark.createDataFrame([(n,) for n in node_ids], "node string")

    # non-numeric attributes are skipped entirely; missing values -> 0
    # downstream (reference: networkx.py:87-113)
    def _numeric(a) -> bool:
        vals = [d[a] for _, d in G.nodes(data=True) if a in d]
        return bool(vals) and all(
            isinstance(v, (int, float)) and not isinstance(v, bool) for v in vals
        )

    attr_names = sorted(
        a for a in {k for _, d in G.nodes(data=True) for k in d} if _numeric(a)
    )
    node_attributes = None
    if attr_names:
        rows = [
            tuple(
                [str(n)]
                + [float(d[a]) if a in d else None for a in attr_names]
            )
            for n, d in G.nodes(data=True)
        ]
        schema = ", ".join(["node string"] + [f"`{a}` double" for a in attr_names])
        node_attributes = spark.createDataFrame(rows, schema)
    return edges, nodes, node_attributes, bool(G.is_directed())


def from_igraph(
    G,
    spark: Optional[SparkSession] = None,
    weight_attr: str = "weight",
) -> Tuple[DataFrame, DataFrame, Optional[DataFrame], bool]:
    """igraph variant (available when python-igraph is installed).

    Mirrors the reference adapter (interface/igraph.py:23-41): edge
    weights default to 1.0; the reserved vertex attribute ``name`` is
    never a feature (igraph.py:14-16) but is used as the node id when
    present.
    """
    spark = _spark(spark)
    names = (
        [str(v["name"]) for v in G.vs]
        if "name" in G.vs.attribute_names()
        else [str(i) for i in range(G.vcount())]
    )
    has_w = weight_attr in G.es.attribute_names()
    edge_rows = [
        (
            names[e.source],
            names[e.target],
            float(e[weight_attr]) if has_w and e[weight_attr] is not None
            else DEFAULT_WEIGHT,
        )
        for e in G.es
    ]
    edges = spark.createDataFrame(
        edge_rows, "src string, dst string, weight double"
    ) if edge_rows else spark.createDataFrame([], "src string, dst string, weight double")
    nodes = spark.createDataFrame([(n,) for n in names], "node string")

    attr_names = sorted(
        a for a in G.vs.attribute_names() if a != "name"  # igraph.py:14-16
    )
    node_attributes = None
    if attr_names:
        def coerce(v):
            try:
                return float(v)
            except (TypeError, ValueError):
                return None

        rows = [
            tuple([names[v.index]] + [coerce(v[a]) for a in attr_names])
            for v in G.vs
        ]
        schema = ", ".join(["node string"] + [f"`{a}` double" for a in attr_names])
        node_attributes = spark.createDataFrame(rows, schema)
    return edges, nodes, node_attributes, bool(G.is_directed())


def get_interface(obj):
    """Reference-style dispatch (interface/__init__.py:39-53): return the
    converter for a recognized graph object, else None."""
    mod = type(obj).__module__ or ""
    if mod.startswith("networkx"):
        return from_networkx
    if mod.startswith("igraph"):
        return from_igraph
    return None
