"""Co-occurrence graph construction + PMI association scores — the
bridge from event/relational data to the graph layer: "items that
appear in the same basket/session/conversation" becomes an edge list
that :mod:`graphrole_spark.operators.pagerank`,
:mod:`~graphrole_spark.operators.triangles` and the ReFeX extractor
consume directly, and PMI turns raw counts into the association
strength used for item-item recommendation and phrase mining
(Church & Hanks 1990).

Scale design: items are deduplicated per context first (one hash
aggregate), so the pair join fans out per context as C(k, 2) over
DISTINCT items only. ``max_items_per_context`` drops pathological
contexts (a crawler session touching everything) BEFORE the join —
the quadratic guard, standard market-basket practice; audit how many
contexts the cap removed by comparing distinct-context counts before
and after if the rate matters. One further aggregate on the (a, b) pair key (map-side combined,
``a < b`` so each unordered pair counts once).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cooccurrence_edges(
    df: DataFrame,
    context_cols: Sequence[str],
    item_col: str,
    min_count: int = 1,
    max_items_per_context: int = 1000,
) -> DataFrame:
    """Undirected co-occurrence edge list: ``(src, dst, weight)`` with
    ``src < dst`` and ``weight`` = number of contexts containing both
    items; ready for the graph operators' ``edges`` contract.

    * items are distinct per context (an item repeated in one session
      still co-occurs once — presence semantics);
    * contexts with more than ``max_items_per_context`` DISTINCT
      items are dropped entirely (the C(k,2) quadratic guard);
    * ``min_count`` prunes rare pairs after the count.
    """
    if min_count < 1:
        raise ValueError("min_count must be >= 1")
    if max_items_per_context < 2:
        raise ValueError("max_items_per_context must be >= 2")
    g = list(context_cols)
    items = (
        df.select(*g, F.col(item_col).alias("__i"))
        .where(F.col("__i").isNotNull())
        .distinct()
    )
    wk = Window.partitionBy(*g)
    items = (
        items.withColumn("__k", F.count(F.lit(1)).over(wk))
        .where(F.col("__k") <= max_items_per_context)
        .drop("__k")
    )
    a = items.select(*g, F.col("__i").alias("src"))
    b = items.select(*g, F.col("__i").alias("dst"))
    return (
        a.join(b, g)
        .where(F.col("src") < F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("long").alias("weight"))
        .where(F.col("weight") >= min_count)
    )


def pmi_scores(
    df: DataFrame,
    context_cols: Sequence[str],
    item_col: str,
    min_count: int = 1,
    max_items_per_context: int = 1000,
    positive: bool = True,
) -> DataFrame:
    """Pointwise mutual information per co-occurring pair::

        pmi(a, b) = ln( p(a, b) / (p(a) · p(b)) )
                  = ln( c_ab · N / (c_a · c_b) )

    over contexts: ``N`` = number of (item-bearing, cap-surviving)
    contexts, ``c_x`` = contexts containing ``x``, ``c_ab`` = contexts
    containing both. ``positive=True`` clips at 0 (PPMI — the standard
    association matrix for SVD/embedding pipelines, Levy & Goldberg
    2014). Returns ``(src, dst, weight, pmi)`` (pmi rounded to 9).

    Plan: :func:`cooccurrence_edges` + one per-item context-count
    aggregate (item-vocabulary-sized, joined twice onto the pair
    frame — broadcastable at moderate vocab) + the 1-row N frame.
    """
    g = list(context_cols)
    items = (
        df.select(*g, F.col(item_col).alias("__i"))
        .where(F.col("__i").isNotNull())
        .distinct()
    )
    wk = Window.partitionBy(*g)
    items = (
        items.withColumn("__k", F.count(F.lit(1)).over(wk))
        .where(F.col("__k") <= max_items_per_context)
        .drop("__k")
        .persist()
    )
    n_ctx = items.select(*g).distinct().count()
    if n_ctx == 0:
        raise ValueError("no contexts survive the item filters")
    item_counts = items.groupBy("__i").agg(
        F.count(F.lit(1)).cast("long").alias("__c")
    )
    a = items.select(*g, F.col("__i").alias("src"))
    b = items.select(*g, F.col("__i").alias("dst"))
    pairs = (
        a.join(b, g)
        .where(F.col("src") < F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("long").alias("weight"))
        .where(F.col("weight") >= int(min_count))
    )
    ca = item_counts.select(
        F.col("__i").alias("src"), F.col("__c").alias("__ca")
    )
    cb = item_counts.select(
        F.col("__i").alias("dst"), F.col("__c").alias("__cb")
    )
    pmi = F.log(
        F.col("weight") * F.lit(float(n_ctx))
        / (F.col("__ca") * F.col("__cb"))
    )
    if positive:
        pmi = F.greatest(pmi, F.lit(0.0))
    # items stays pinned: the returned lazy plan reads it three ways
    # (pair join twice + item counts); unpersisting here would force
    # three recomputes at evaluation. Same documented tradeoff as the
    # terms.py term-aggregate persist (PERF "Known costs").
    return (
        pairs.join(ca, "src")
        .join(cb, "dst")
        .select("src", "dst", "weight", F.round(pmi, 9).alias("pmi"))
    )
