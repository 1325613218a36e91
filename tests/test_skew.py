"""Hub-skew guard for the generic egonet path (r02 VERDICT item 5).

A power-law hub funnels ~deg² intermediate rows through one join key in
the egonet membership join. The salted variant must (a) return
bit-identical features and (b) provably split the hot key's work.
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from graphrole_spark.operators.seeds import (
    ego_membership,
    egonet_features,
    node_set,
)

SALT = 8
THRESHOLD = 50


@pytest.fixture(scope="module")
def hub_graph(spark):
    """One hub connected to 300 spokes + a chain through the spokes —
    the hub is a member of 300 egonets and carries 300 edges."""
    edges = [(f"n{i}", "hub", 1.0) for i in range(300)]
    edges += [(f"n{i}", f"n{i+1}", 0.5) for i in range(299)]
    return spark.createDataFrame(edges, "src string, dst string, weight double")


def _sorted(df):
    return (
        df.toPandas()
        .sort_values("node")
        .reset_index(drop=True)
        .round(6)
    )


@pytest.mark.parametrize("directed", [True, False])
def test_egonet_salted_parity(spark, hub_graph, directed):
    nodes = node_set(hub_graph)
    plain = _sorted(egonet_features(hub_graph, directed=directed, nodes=nodes))
    salted = _sorted(
        egonet_features(
            hub_graph, directed=directed, nodes=nodes,
            skew_salt=SALT, skew_degree_threshold=THRESHOLD,
        )
    )
    pd.testing.assert_frame_equal(plain, salted)


def test_salt_splits_hot_join_key(spark, hub_graph):
    """Data-level skew evidence: the max per-join-key intermediate
    cardinality (membership rows × edge rows sharing the key) drops by
    ~the salt factor for the hot node."""
    nodes = node_set(hub_graph)
    m = ego_membership(hub_graph, directed=False, nodes=nodes)
    e = hub_graph.select("src", "dst", "weight").unionByName(
        hub_graph.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"
        )
    )

    def max_key_product(m_keyed, e_keyed, keys):
        mc = m_keyed.groupBy(*keys).agg(F.count("*").alias("mc"))
        ec = e_keyed.groupBy(*keys).agg(F.count("*").alias("ec"))
        prod = mc.join(ec, list(keys)).select(
            (F.col("mc") * F.col("ec")).alias("p")
        )
        return prod.agg(F.max("p")).collect()[0][0]

    plain_max = max_key_product(
        m.select(F.col("member").alias("k")),
        e.select(F.col("src").alias("k")),
        ["k"],
    )

    hot = (
        m.groupBy("member").agg(F.count("*").alias("c"))
        .where(F.col("c") > THRESHOLD)
        .select(F.col("member").alias("__hot"))
    )
    m_salted = m.join(hot, m.member == hot.__hot, "left").select(
        F.col("member").alias("k"),
        F.when(F.col("__hot").isNotNull(), F.pmod(F.xxhash64("center"), F.lit(SALT)))
        .otherwise(F.lit(0)).alias("s"),
    )
    e_salted = e.join(hot, e.src == hot.__hot, "left").select(
        F.col("src").alias("k"),
        F.explode(
            F.when(F.col("__hot").isNotNull(), F.sequence(F.lit(0), F.lit(SALT - 1)))
            .otherwise(F.array(F.lit(0)))
        ).alias("s"),
    )
    salted_max = max_key_product(m_salted, e_salted, ["k", "s"])

    # hub key product: ~300 members × ~300 edges = ~90k plain;
    # salted: (300/8) × 300 ≈ 11k — require at least a 4× split
    assert plain_max >= 80_000
    assert salted_max * 4 <= plain_max, (plain_max, salted_max)
