"""target_encode (operators/encode.py): leak-discipline contracts,
python/DuckDB oracles for all three methods."""

import random
from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from graphrole_spark.operators.encode import target_encode


def _ts(i):
    return datetime(2024, 1, 1, tzinfo=timezone.utc).replace(
        hour=i // 60, minute=i % 60
    )


def _frame(spark, rows):
    # rows: (row_id, cat, label, minute)
    return spark.createDataFrame(
        [(rid, c, y, _ts(m)) for rid, c, y, m in rows],
        schema="row_id long, cat string, label double, ts timestamp",
    )


def _mk_rows(seed=7, n=120, cats=("a", "b", "c"), null_every=11):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        y = None if i % null_every == 10 else float(rng.randint(0, 1))
        rows.append((i, rng.choice(cats), y, rng.randrange(0, 600)))
    return rows


def _prior(rows):
    ys = [y for *_x, y, _m in [(r[0], r[1], r[2], r[3]) for r in rows] if y is not None]
    ys = [r[2] for r in rows if r[2] is not None]
    return sum(ys) / len(ys)


def test_prefix_python_oracle_and_no_leak(spark):
    rows = _mk_rows()
    sm = 5.0
    got = {
        r["row_id"]: r["cat_enc"]
        for r in target_encode(
            _frame(spark, rows), "cat", "label", method="prefix",
            smoothing=sm,
        ).collect()
    }
    prior = _prior(rows)
    for rid, cat, _y, m in rows:
        hist = [
            y for rid2, c2, y, m2 in rows
            if c2 == cat and m2 < m and y is not None
        ]
        want = (sum(hist) + sm * prior) / (len(hist) + sm)
        assert got[rid] == pytest.approx(want), rid


def test_prefix_same_timestamp_mutually_invisible(spark):
    # two same-cat rows at the SAME ts: neither sees the other
    rows = [(0, "a", 1.0, 5), (1, "a", 0.0, 5), (2, "a", 1.0, 9)]
    got = {
        r["row_id"]: r["cat_enc"]
        for r in target_encode(
            _frame(spark, rows), "cat", "label", method="prefix",
            smoothing=10.0,
        ).collect()
    }
    prior = 2 / 3
    # rows 0 and 1 have no strict history -> pure prior
    assert got[0] == pytest.approx(prior) == got[1]
    # row 2 sees both earlier rows
    assert got[2] == pytest.approx((1.0 + 10 * prior) / (2 + 10))


def test_prefix_duckdb_parity(spark):
    import duckdb
    import pandas as pd

    rows = _mk_rows(seed=19, n=200)
    got = (
        target_encode(
            _frame(spark, rows), "cat", "label", method="prefix",
            smoothing=20.0,
        )
        .orderBy("row_id")
        .toPandas()
    )
    pdf = pd.DataFrame(
        [(rid, c, y, _ts(m)) for rid, c, y, m in rows],
        columns=["row_id", "cat", "label", "ts"],
    )
    con = duckdb.connect()
    con.register("t", pdf)
    want = con.execute("""
        SELECT row_id,
               (coalesce(sum(label) OVER w, 0)
                  + 20.0 * (SELECT avg(label) FROM t))
               / (count(label) OVER w + 20.0) AS enc
        FROM t
        WINDOW w AS (PARTITION BY cat ORDER BY ts
                     RANGE BETWEEN UNBOUNDED PRECEDING
                           AND INTERVAL 1 MICROSECOND PRECEDING)
        ORDER BY row_id
    """).df()
    assert got["cat_enc"].tolist() == pytest.approx(want["enc"].tolist())


def test_oof_excludes_own_fold(spark):
    rows = _mk_rows(seed=3, n=150)
    sm = 8.0
    df = _frame(spark, rows).withColumn(
        "fold", (F.col("row_id") % 4).cast("int")
    )
    got = {
        r["row_id"]: r["cat_enc"]
        for r in target_encode(
            df, "cat", "label", method="oof", fold_col="fold", smoothing=sm
        ).collect()
    }
    prior = _prior(rows)
    for rid, cat, _y, _m in rows:
        other = [
            y for rid2, c2, y, _m2 in rows
            if c2 == cat and rid2 % 4 != rid % 4 and y is not None
        ]
        want = (sum(other) + sm * prior) / (len(other) + sm)
        assert got[rid] == pytest.approx(want), rid


def test_oof_md5_folds_deterministic(spark):
    rows = _mk_rows(seed=23, n=80)
    df = _frame(spark, rows)
    a = target_encode(df, "cat", "label", method="oof", id_col="row_id")
    b = target_encode(df, "cat", "label", method="oof", id_col="row_id")
    pa = a.orderBy("row_id").toPandas()["cat_enc"]
    pb = b.orderBy("row_id").toPandas()["cat_enc"]
    assert pa.tolist() == pb.tolist()
    # the md5 fold assignment matches the python twin exactly
    import hashlib

    got_folds = {
        r["row_id"]: r["__fold"]
        for r in df.select(
            "row_id",
            (
                F.conv(
                    F.substring(F.md5(F.col("row_id").cast("string")), 1, 8),
                    16,
                    10,
                ).cast("long")
                % 5
            ).alias("__fold"),
        ).collect()
    }
    for rid, *_rest in rows:
        h = int(hashlib.md5(str(rid).encode()).hexdigest()[:8], 16) % 5
        assert got_folds[rid] == h, rid


def test_fit_table_and_serving_join(spark):
    rows = _mk_rows(seed=5, n=90)
    sm = 12.0
    fit = {
        r["cat"]: (r["cat_enc"], r["n"])
        for r in target_encode(
            _frame(spark, rows), "cat", "label", method="fit", smoothing=sm
        ).collect()
    }
    prior = _prior(rows)
    for cat in ("a", "b", "c"):
        ys = [y for _r, c, y, _m in rows if c == cat and y is not None]
        want = (sum(ys) + sm * prior) / (len(ys) + sm)
        assert fit[cat][0] == pytest.approx(want)
        assert fit[cat][1] == len(ys)


def test_unseen_category_and_empty_history_get_prior(spark):
    rows = [(0, "new", 1.0, 5)]
    got = target_encode(
        _frame(spark, rows), "cat", "label", method="prefix", smoothing=7.0
    ).collect()[0]
    assert got["cat_enc"] == pytest.approx(1.0)  # prior == only label


def test_rejects_bad_args(spark):
    df = _frame(spark, [(0, "a", 1.0, 1)])
    with pytest.raises(ValueError):
        target_encode(df, "cat", "label", method="nope")
    with pytest.raises(ValueError):
        target_encode(df, "cat", "label", smoothing=0.0)
    with pytest.raises(ValueError):
        target_encode(df, "cat", "label", method="oof")
