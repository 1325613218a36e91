"""Tests for operators/joins.py — skew audit + hot-key salted join
(exact parity with the plain join, physical spread of the hot key)."""

import random

import pandas as pd
import pytest

from pyspark.sql import functions as F


def _skewed(spark, seed=37):
    rng = random.Random(seed)
    # one mega-key carrying half the fact rows + a cold tail
    left = [("hub" if rng.random() < 0.5 else f"k{rng.randint(0, 50)}",
             i, round(rng.uniform(0, 1), 4)) for i in range(4000)]
    right = [(f"k{i}", f"dim{i}") for i in range(0, 51, 2)] + [
        ("hub", "dimhub"), ("hub", "dimhub2"), ("orphan", "never"),
    ]
    ldf = spark.createDataFrame(left, "key string, row_id long, v double")
    rdf = spark.createDataFrame(right, "key string, label string")
    return ldf, rdf


def _sorted_rows(df):
    # None-safe total order (left joins produce NULL columns)
    return sorted(
        (tuple(r) for r in df.collect()),
        key=lambda t: tuple((x is None, str(x)) for x in t),
    )


def test_salted_join_inner_parity(spark):
    from graphrole_spark.operators.joins import salted_join

    ldf, rdf = _skewed(spark)
    plain = ldf.join(rdf, "key", "inner")
    salted = salted_join(ldf, rdf, "key", how="inner", salt=8,
                         hot_threshold=500)
    assert _sorted_rows(salted.select(*plain.columns)) == _sorted_rows(plain)


def test_salted_join_left_parity_with_nulls(spark):
    from graphrole_spark.operators.joins import salted_join

    ldf, rdf = _skewed(spark, seed=5)
    ldf = ldf.unionByName(
        spark.createDataFrame(
            [(None, 99999, 0.5)], "key string, row_id long, v double"
        )
    )
    plain = ldf.join(rdf, "key", "left")
    salted = salted_join(ldf, rdf, "key", how="left", salt=8,
                         hot_threshold=500)
    assert _sorted_rows(salted.select(*plain.columns)) == _sorted_rows(plain)


def test_salted_join_explicit_hot_keys_and_validation(spark):
    from graphrole_spark.operators.joins import salted_join

    ldf, rdf = _skewed(spark, seed=9)
    plain = ldf.join(rdf, "key", "inner")
    salted = salted_join(ldf, rdf, "key", salt=4, hot_keys=["hub"])
    assert _sorted_rows(salted.select(*plain.columns)) == _sorted_rows(plain)
    for bad in (
        dict(salt=1, hot_keys=["hub"]),
        dict(how="full", hot_keys=["hub"]),
        dict(hot_threshold=0),
        dict(),
        dict(hot_threshold=10, hot_keys=["hub"]),
    ):
        kw = dict(salt=4)
        kw.update(bad)
        with pytest.raises(ValueError):
            salted_join(ldf, rdf, "key", **kw)


def test_salted_join_spreads_hot_key(spark):
    """The hub's fact rows must land in >=4 distinct salt buckets —
    the physical spread that kills the straggler task."""
    from graphrole_spark.operators.joins import salted_join

    ldf, rdf = _skewed(spark, seed=21)
    # instrument: re-derive the salt the join uses for hub rows
    hub_rows = ldf.where(F.col("key") == "hub")
    salts = (
        hub_rows.select(
            F.pmod(F.xxhash64(*[F.col(c) for c in ldf.columns]), F.lit(8))
            .alias("s")
        )
        .distinct()
        .count()
    )
    assert salts >= 4
    # and cold keys pay zero replication: right-side cold rows appear
    # once in the salted right frame (checked via output row parity in
    # the tests above; here assert the join result has no duplicates)
    out = salted_join(ldf, rdf, "key", salt=8, hot_threshold=500)
    assert out.count() == ldf.join(rdf, "key").count()


def test_skew_stats(spark):
    from graphrole_spark.operators.joins import skew_stats

    ldf, _ = _skewed(spark, seed=2)
    top = skew_stats(ldf, ["key"], k=5).toPandas()
    assert top.iloc[0]["key"] == "hub"
    assert top.iloc[0]["share"] == pytest.approx(
        ldf.where("key = 'hub'").count() / ldf.count(), abs=1e-6
    )
    assert len(top) == 5
    assert (top["n_rows"].diff().dropna() <= 0).all()
    with pytest.raises(ValueError):
        skew_stats(ldf, ["key"], k=0)
