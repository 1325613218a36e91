"""Tests for evaluation.py::{pass_at_k,multiclass_metrics} —
math.comb / hand-contingency python oracles + convention goldens."""

import math
import random
from collections import Counter

import pandas as pd
import pytest


def _passk_ref(n, c, k):
    if n < k:
        return None
    if n - c < k:
        return 1.0
    return 1.0 - math.comb(n - c, k) / math.comb(n, k)


def test_pass_at_k_python_parity(spark):
    from graphrole_spark.functions.evaluation import pass_at_k

    rng = random.Random(3)
    rows = []
    for p in range(40):
        n = rng.randint(1, 20)
        rate = rng.random()
        for _ in range(n):
            rows.append((p, int(rng.random() < rate)))
    df = spark.createDataFrame(rows, "problem_id long, is_correct int")
    got = pass_at_k(df, ks=(1, 5, 10)).toPandas()
    per = got[got["problem_id"].notna()].set_index("problem_id")
    counts = {}
    for p, ok in rows:
        nn, cc = counts.get(p, (0, 0))
        counts[p] = (nn + 1, cc + ok)
    for p, (n, c) in counts.items():
        row = per.loc[p]
        assert row["n_samples"] == n and row["n_correct"] == c
        for k in (1, 5, 10):
            want = _passk_ref(n, c, k)
            gotv = row[f"pass_at_{k}"]
            if want is None:
                assert pd.isna(gotv), (p, k)
            else:
                assert gotv == pytest.approx(want, abs=1e-8), (p, k)
    # summary row: means over defined problems
    summ = got[got["problem_id"].isna()].iloc[0]
    for k in (1, 5, 10):
        vals = [
            _passk_ref(n, c, k)
            for n, c in counts.values()
            if _passk_ref(n, c, k) is not None
        ]
        assert summ[f"pass_at_{k}"] == pytest.approx(
            sum(vals) / len(vals), abs=1e-8
        )
    with pytest.raises(ValueError):
        pass_at_k(df, ks=(0, 1))


def test_pass_at_k_goldens(spark):
    from graphrole_spark.functions.evaluation import pass_at_k

    # 4 samples, 2 correct: pass@1 = 0.5; pass@2 = 1 - C(2,2)/C(4,2)
    # = 1 - 1/6; pass@4 = 1; pass@5 undefined
    rows = [(1, 1), (1, 1), (1, 0), (1, 0)]
    df = spark.createDataFrame(rows, "problem_id long, is_correct int")
    got = pass_at_k(df, ks=(1, 2, 4, 5)).toPandas()
    row = got[got["problem_id"].notna()].iloc[0]
    assert row["pass_at_1"] == pytest.approx(0.5)
    assert row["pass_at_2"] == pytest.approx(1 - 1 / 6, abs=1e-9)
    assert row["pass_at_4"] == 1.0
    assert pd.isna(row["pass_at_5"])


def test_multiclass_metrics_python_parity(spark):
    from graphrole_spark.functions.evaluation import multiclass_metrics

    rng = random.Random(11)
    classes = ["a", "b", "c", "d"]
    rows = []
    for _ in range(500):
        y = rng.choice(classes)
        p = y if rng.random() < 0.6 else rng.choice(classes + ["e"])
        rows.append((y, p))
    df = spark.createDataFrame(rows, "label string, prediction string")
    got = multiclass_metrics(df).toPandas().set_index("cls")
    all_cls = sorted({y for y, _ in rows} | {p for _, p in rows})
    true_tot = Counter(y for y, _ in rows)
    pred_tot = Counter(p for _, p in rows)
    tp = Counter(y for y, p in rows if y == p)
    precs, recs, f1s = [], [], []
    for cl in all_cls:
        prec = tp[cl] / pred_tot[cl] if pred_tot[cl] else 0.0
        rec = tp[cl] / true_tot[cl] if true_tot[cl] else 0.0
        f1 = (2 * prec * rec / (prec + rec)) if (prec + rec) else 0.0
        precs.append(prec); recs.append(rec); f1s.append(f1)
        row = got.loc[cl]
        assert row["n_true"] == true_tot[cl]
        assert row["n_pred"] == pred_tot[cl]
        assert row["precision"] == pytest.approx(prec, abs=1e-8)
        assert row["recall"] == pytest.approx(rec, abs=1e-8)
        assert row["f1"] == pytest.approx(f1, abs=1e-8)
    assert got.loc["(macro)", "f1"] == pytest.approx(
        sum(f1s) / len(f1s), abs=1e-7
    )
    acc = sum(tp.values()) / len(rows)
    for c in ["precision", "recall", "f1"]:
        assert got.loc["(micro)", c] == pytest.approx(acc, abs=1e-8)
    # class "e" appears only as a prediction: recall 0, f1 0, row kept
    assert got.loc["e", "n_true"] == 0 and got.loc["e", "recall"] == 0.0


def test_multiclass_metrics_null_rows_excluded(spark):
    """NULL labels/predictions must not form a phantom all-zero class
    that deflates the macro averages."""
    from graphrole_spark.functions.evaluation import multiclass_metrics

    rows = [
        ("a", "a"), ("a", "b"), ("b", "b"),
        (None, "a"), ("b", None), (None, None),
    ]
    df = spark.createDataFrame(rows, "label string, prediction string")
    got = multiclass_metrics(df).toPandas().set_index("cls")
    # only the 3 fully-labeled rows score; classes are exactly {a, b}
    assert sorted(c for c in got.index if not c.startswith("(")) == ["a", "b"]
    assert got.loc["(micro)", "n_true"] == 3
    # a: tp=1 n_pred=1 n_true=2 -> p=1  r=.5 f1=2/3
    # b: tp=1 n_pred=2 n_true=1 -> p=.5 r=1  f1=2/3
    assert got.loc["(macro)", "f1"] == pytest.approx(2 / 3, abs=1e-8)


def test_bootstrap_ci_duckdb_parity(spark):
    """evaluation.py::bootstrap_ci — full DuckDB twin of the md5
    Poisson ladder + replicate means + percentile interval."""
    import duckdb

    from graphrole_spark.functions.evaluation import bootstrap_ci

    rng = random.Random(17)
    rows = [
        (i, "g1" if i % 2 else "g2", round(rng.gauss(10, 3), 4))
        for i in range(400)
    ]
    pdf = pd.DataFrame(rows, columns=["rid", "grp", "val"])
    df = spark.createDataFrame(pdf)
    got = (
        bootstrap_ci(df, "val", ["grp"], n_boot=50, id_col="rid",
                     hash_fn="md5")
        .orderBy("grp")
        .toPandas()
    )
    con = duckdb.connect()
    con.register("t", pdf)
    cdf = [0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
           0.9810118431238462, 0.9963401531726563, 0.9994058151824183,
           0.9999167588507119, 0.9999897508033253]
    ladder = "CASE " + " ".join(
        f"WHEN u < {c} THEN {k}" for k, c in enumerate(cdf)
    ) + " ELSE 8 END"
    oracle = con.execute(f"""
        WITH rep AS (
          SELECT grp, val, rid, b FROM t,
                 unnest(generate_series(0, 49)) AS s(b)),
        uu AS (
          SELECT grp, val, b,
                 CAST(concat('0x', substr(md5(concat(CAST(rid AS VARCHAR),
                      '|', CAST(b AS VARCHAR), '|bs1')), 1, 8)) AS BIGINT)
                   / 4294967296.0 AS u
          FROM rep),
        w AS (SELECT grp, val, b, {ladder} AS w FROM uu),
        m AS (SELECT grp, b, sum(w * val) / sum(w) AS m
              FROM w GROUP BY grp, b HAVING sum(w) > 0)
        SELECT grp,
               round(quantile_cont(m, 0.025), 9) AS ci_lo,
               round(quantile_cont(m, 0.975), 9) AS ci_hi
        FROM m GROUP BY grp ORDER BY grp
    """).df()
    assert got["ci_lo"].tolist() == pytest.approx(
        oracle["ci_lo"].tolist(), abs=1e-8
    )
    assert got["ci_hi"].tolist() == pytest.approx(
        oracle["ci_hi"].tolist(), abs=1e-8
    )
    # interval brackets the point estimate and is sane for n=200/group
    for _, r in got.iterrows():
        assert r["ci_lo"] < r["mean"] < r["ci_hi"]
        assert 0.1 < r["ci_hi"] - r["ci_lo"] < 2.5
    with pytest.raises(ValueError):
        bootstrap_ci(df, "val", ["grp"], id_col=None)
    with pytest.raises(ValueError):
        bootstrap_ci(df, "val", ["grp"], n_boot=5, id_col="rid")
    with pytest.raises(ValueError):
        bootstrap_ci(df, "val", ["grp"], id_col="rid", hash_fn="sha1")
    # fast xxhash64 path: deterministic across partitionings, interval
    # statistically consistent with the md5 universe
    fast = (
        bootstrap_ci(df, "val", ["grp"], n_boot=50, id_col="rid")
        .orderBy("grp").toPandas()
    )
    again = (
        bootstrap_ci(df.repartition(7), "val", ["grp"], n_boot=50,
                     id_col="rid")
        .orderBy("grp").toPandas()
    )
    assert fast["ci_lo"].tolist() == again["ci_lo"].tolist()
    for f, m in zip(fast.itertuples(), got.itertuples()):
        assert abs(f.ci_lo - m.ci_lo) < 0.5
        assert abs(f.ci_hi - m.ci_hi) < 0.5
