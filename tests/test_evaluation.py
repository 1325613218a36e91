"""Label-quality / model-evaluation operators (functions/evaluation.py).

Strategy mirrors the rest of the suite: pure-python oracles for the
metric math (rank-based AUC vs an independent rankdata implementation,
trec_eval-convention retrieval metrics, the published Fleiss 1971
worked example), DuckDB SQL twins for the SQL-expressible operators
(the tail-entry stand-in for the driver oracle — registry window is
full), and behavioural contracts for the Dawid-Skene EM fit
(determinism, truth recovery beating majority vote on an adversarial
annotator fixture, worker-reliability ordering).
"""

import math
import random

import pytest
from pyspark.sql import functions as F

from graphrole_spark.functions.evaluation import (
    binary_metrics,
    dawid_skene,
    fleiss_kappa,
    majority_vote,
    retrieval_metrics,
)


# --------------------------------------------------------------------------
# fixtures
# --------------------------------------------------------------------------

ANN_SCHEMA = "item_id string, worker_id string, label string"


def _annotations(spark, rows):
    return spark.createDataFrame(rows, schema=ANN_SCHEMA)


def _noisy_annotations(n_items=60, seed=5):
    """Ground-truth labels + 5 annotators: two reliable, one mediocre,
    one near-random, one adversarial (systematically swaps classes).
    Returns (rows, truth dict, per-worker empirical accuracy)."""
    rng = random.Random(seed)
    classes = ["neg", "neu", "pos"]
    swap = {"neg": "pos", "pos": "neg", "neu": "neg"}
    acc = {"w_good1": 0.95, "w_good2": 0.9, "w_mid": 0.7, "w_rand": 0.4}
    truth, rows, hits = {}, [], {w: [0, 0] for w in list(acc) + ["w_adv"]}
    for i in range(n_items):
        item = f"i{i:03d}"
        t = classes[rng.randrange(3)]
        truth[item] = t
        for w, a in acc.items():
            lab = t if rng.random() < a else rng.choice(
                [c for c in classes if c != t]
            )
            rows.append((item, w, lab))
            hits[w][0] += lab == t
            hits[w][1] += 1
        # adversary votes on every item with a deterministic class swap
        lab = swap[t] if rng.random() < 0.9 else t
        rows.append((item, "w_adv", lab))
        hits["w_adv"][0] += lab == t
        hits["w_adv"][1] += 1
    emp = {w: h / n for w, (h, n) in hits.items()}
    return rows, truth, emp


# --------------------------------------------------------------------------
# majority_vote
# --------------------------------------------------------------------------

def _mv_oracle(rows):
    from collections import Counter, defaultdict

    votes = defaultdict(list)
    for item, _w, lab in rows:
        if lab is not None:
            votes[item].append(lab)
    out = {}
    for item, labs in votes.items():
        c = Counter(labs)
        ranked = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))
        modal, n_modal = ranked[0]
        runner = ranked[1][1] if len(ranked) > 1 else 0
        n = len(labs)
        out[item] = (
            modal, n, len(c), n_modal / n, (n_modal - runner) / n,
        )
    return out


def test_majority_vote_python_parity(spark):
    rng = random.Random(3)
    rows = [
        (f"i{i}", f"w{w}", rng.choice(["a", "b", "c", None]))
        for i in range(40)
        for w in range(rng.randint(1, 7))
    ]
    got = {
        r["item_id"]: (
            r["label"], r["n_votes"], r["n_distinct_labels"],
            round(r["agreement"], 9), round(r["margin"], 9),
        )
        for r in majority_vote(_annotations(spark, rows)).collect()
    }
    want = {
        k: (v[0], v[1], v[2], round(v[3], 9), round(v[4], 9))
        for k, v in _mv_oracle(rows).items()
    }
    assert got == want


def test_majority_vote_tie_breaks_lexicographic(spark):
    rows = [("i0", "w0", "b"), ("i0", "w1", "a"),
            ("i0", "w2", "b"), ("i0", "w3", "a")]
    r = majority_vote(_annotations(spark, rows)).collect()[0]
    assert r["label"] == "a"
    assert r["margin"] == 0.0 and r["agreement"] == 0.5


def test_majority_vote_duckdb_parity(spark):
    import duckdb
    import pandas as pd

    rng = random.Random(17)
    rows = [
        (f"i{i:02d}", f"w{w}", rng.choice(["x", "y", "z"]))
        for i in range(25)
        for w in range(rng.randint(2, 6))
    ]
    got = majority_vote(_annotations(spark, rows)).toPandas()
    con = duckdb.connect()
    con.register(
        "ann", pd.DataFrame(rows, columns=["item_id", "worker_id", "label"])
    )
    want = con.execute("""
        WITH counts AS (
          SELECT item_id AS item, label, count(*) AS n
          FROM ann WHERE label IS NOT NULL GROUP BY 1, 2),
        ranked AS (
          SELECT item, label, n,
                 row_number() OVER w AS rn,
                 sum(n) OVER (PARTITION BY item) AS n_votes,
                 count(*) OVER (PARTITION BY item) AS n_distinct_labels,
                 lead(n) OVER w AS runner_up
          FROM counts WINDOW w AS (PARTITION BY item ORDER BY n DESC, label))
        SELECT item AS item_id, label,
               n_votes, n_distinct_labels,
               n / CAST(n_votes AS DOUBLE) AS agreement,
               (n - coalesce(runner_up, 0)) / CAST(n_votes AS DOUBLE)
                 AS margin
        FROM ranked WHERE rn = 1 ORDER BY item_id
    """).df()
    assert got["item_id"].tolist() == want["item_id"].tolist()
    assert got["label"].tolist() == want["label"].tolist()
    assert got["n_votes"].tolist() == want["n_votes"].tolist()
    for c in ("agreement", "margin"):
        assert got[c].tolist() == pytest.approx(want[c].tolist())


# --------------------------------------------------------------------------
# fleiss_kappa
# --------------------------------------------------------------------------

# Fleiss (1971) worked example (psychiatric diagnoses): 10 subjects x
# 14 raters x 5 categories — the standard published contingency table.
FLEISS_TABLE = [
    [0, 0, 0, 0, 14],
    [0, 2, 6, 4, 2],
    [0, 0, 3, 5, 6],
    [0, 3, 9, 2, 0],
    [2, 2, 8, 1, 1],
    [7, 7, 0, 0, 0],
    [3, 2, 6, 3, 0],
    [2, 5, 3, 2, 2],
    [6, 5, 2, 1, 0],
    [0, 2, 2, 3, 7],
]


def _kappa_oracle(counts_by_item):
    """Generalized Fleiss over a {item: {label: n}} contingency."""
    rated = {i: c for i, c in counts_by_item.items() if sum(c.values()) >= 2}
    p_is = []
    nk = {}
    for c in rated.values():
        n_i = sum(c.values())
        ss = sum(v * v for v in c.values())
        p_is.append((ss - n_i) / (n_i * (n_i - 1)))
        for lab, v in c.items():
            nk[lab] = nk.get(lab, 0) + v
    p_bar = sum(p_is) / len(p_is)
    total = sum(nk.values())
    p_e = sum((v / total) ** 2 for v in nk.values())
    return (p_bar - p_e) / (1 - p_e), p_bar, p_e


def test_fleiss_kappa_published_example(spark):
    rows = [
        (f"s{i}", f"r{k}_{j}", f"cat{k}")
        for i, item in enumerate(FLEISS_TABLE)
        for k, n in enumerate(item)
        for j in range(n)
    ]
    r = fleiss_kappa(_annotations(spark, rows)).collect()[0]
    counts = {
        f"s{i}": {f"cat{k}": n for k, n in enumerate(item) if n}
        for i, item in enumerate(FLEISS_TABLE)
    }
    kap, p_bar, p_e = _kappa_oracle(counts)
    assert r["kappa"] == pytest.approx(kap)
    assert r["p_bar"] == pytest.approx(p_bar)
    assert r["p_e"] == pytest.approx(p_e)
    # the published value for this table
    assert round(r["kappa"], 3) == 0.210
    assert r["n_items"] == 10 and r["n_votes"] == 140


def test_fleiss_kappa_variable_raters_and_singletons(spark):
    rng = random.Random(9)
    rows = []
    counts = {}
    for i in range(30):
        item = f"i{i}"
        n_raters = rng.randint(1, 6)  # singletons must be excluded
        c = {}
        for w in range(n_raters):
            lab = rng.choice(["a", "b"])
            rows.append((item, f"w{w}", lab))
            c[lab] = c.get(lab, 0) + 1
        counts[item] = c
    r = fleiss_kappa(_annotations(spark, rows)).collect()[0]
    kap, p_bar, p_e = _kappa_oracle(counts)
    assert r["kappa"] == pytest.approx(kap)
    assert r["n_items"] == sum(1 for c in counts.values() if sum(c.values()) >= 2)


def test_fleiss_kappa_perfect_agreement(spark):
    rows = [(f"i{i}", f"w{w}", "a" if i % 2 else "b")
            for i in range(10) for w in range(3)]
    r = fleiss_kappa(_annotations(spark, rows)).collect()[0]
    assert r["kappa"] == pytest.approx(1.0)
    assert r["p_bar"] == pytest.approx(1.0)


# --------------------------------------------------------------------------
# dawid_skene
# --------------------------------------------------------------------------

def test_dawid_skene_beats_majority_vote_under_adversary(spark):
    rows, truth, emp = _noisy_annotations()
    ann = _annotations(spark, rows)
    assign, workers = dawid_skene(ann, n_iter=8)
    got = {r["item_id"]: r["label"] for r in assign.collect()}
    ds_acc = sum(got[i] == t for i, t in truth.items()) / len(truth)
    mv = {r["item_id"]: r["label"] for r in majority_vote(ann).collect()}
    mv_acc = sum(mv[i] == t for i, t in truth.items()) / len(truth)
    # the adversary drags majority vote down; DS should shrug it off
    assert ds_acc >= mv_acc
    assert ds_acc >= 0.9

    west = {r["worker_id"]: r["est_accuracy"] for r in workers.collect()}
    # reliability ordering recovered: good > mid > random > adversary
    assert west["w_good1"] > west["w_mid"] > west["w_rand"] > west["w_adv"]
    # estimated accuracies track the empirical ones loosely
    for w in ("w_good1", "w_good2", "w_mid"):
        assert abs(west[w] - emp[w]) < 0.15
    nv = {r["worker_id"]: r["n_votes"] for r in workers.collect()}
    assert all(v == 60 for v in nv.values())


def test_dawid_skene_deterministic_and_confident(spark):
    rows, _truth, _ = _noisy_annotations(n_items=25, seed=11)
    ann = _annotations(spark, rows)
    a1, w1 = dawid_skene(ann, n_iter=5)
    a2, w2 = dawid_skene(ann, n_iter=5)
    p1 = a1.toPandas()
    p2 = a2.toPandas()
    assert p1["label"].tolist() == p2["label"].tolist()
    assert p1["confidence"].tolist() == pytest.approx(p2["confidence"].tolist())
    assert w1.toPandas()["est_accuracy"].tolist() == pytest.approx(
        w2.toPandas()["est_accuracy"].tolist()
    )
    # posteriors are probabilities; entropy bounded by log K
    assert ((p1["confidence"] > 0) & (p1["confidence"] <= 1)).all()
    assert (p1["posterior_entropy"] <= math.log(3) + 1e-9).all()


def test_dawid_skene_ignores_null_votes(spark):
    rows = [("i0", "w0", "a"), ("i0", "w1", None), ("i0", "w2", "a"),
            ("i1", "w0", "b"), ("i1", "w1", "b"), ("i1", "w2", None)]
    assign, workers = dawid_skene(_annotations(spark, rows), n_iter=3)
    got = {r["item_id"]: r["label"] for r in assign.collect()}
    assert got == {"i0": "a", "i1": "b"}
    nv = {r["worker_id"]: r["n_votes"] for r in workers.collect()}
    assert nv == {"w0": 2, "w1": 1, "w2": 1}


# --------------------------------------------------------------------------
# retrieval_metrics
# --------------------------------------------------------------------------

def _retrieval_oracle(results, qrels, k):
    """trec_eval-convention metrics; results = {q: [(doc, score)]},
    qrels = {q: {doc: grade>0}}."""
    out = {}
    for q, rel in qrels.items():
        if not rel:
            continue
        ranked = sorted(results.get(q, []), key=lambda ds: (-ds[1], ds[0]))[:k]
        n_rel = len(rel)
        hits = [1 if d in rel else 0 for d, _ in ranked]
        n_hit = sum(hits)
        rr = 0.0
        sum_prec = 0.0
        dcg = 0.0
        got = 0
        for pos, (d, _s) in enumerate(ranked, start=1):
            if d in rel:
                got += 1
                if rr == 0.0:
                    rr = 1.0 / pos
                sum_prec += got / pos
                dcg += (2.0 ** rel[d] - 1) / math.log2(pos + 1)
        ideal = sorted(rel.items(), key=lambda dg: (-dg[1], dg[0]))[:k]
        idcg = sum(
            (2.0 ** g - 1) / math.log2(pos + 1)
            for pos, (_d, g) in enumerate(ideal, start=1)
        )
        out[q] = dict(
            n_rel=n_rel,
            precision_at_k=n_hit / k,
            recall_at_k=n_hit / n_rel,
            rr_at_k=rr,
            ap_at_k=sum_prec / min(n_rel, k),
            ndcg_at_k=(dcg / idcg) if idcg > 0 else 0.0,
        )
    return out


def test_retrieval_metrics_python_parity(spark):
    rng = random.Random(23)
    k = 5
    results = {
        f"q{q}": [
            (f"d{rng.randrange(30)}", round(rng.random(), 6))
            for _ in range(rng.randint(0, 12))
        ]
        for q in range(12)
    }
    # dedupe docs per query (rankers emit each doc once)
    results = {
        q: list({d: (d, s) for d, s in rows}.values())
        for q, rows in results.items()
    }
    qrels = {
        f"q{q}": {
            f"d{rng.randrange(30)}": rng.randint(1, 3)
            for _ in range(rng.randint(0, 6))
        }
        for q in range(14)  # q12/q13 judged but never retrieved
    }
    res_df = spark.createDataFrame(
        [(q, d, s) for q, rows in results.items() for d, s in rows],
        schema="query_id string, doc_id string, score double",
    )
    qrel_df = spark.createDataFrame(
        [(q, d, g) for q, rel in qrels.items() for d, g in rel.items()],
        schema="query_id string, doc_id string, grade int",
    )
    got = {
        r["query_id"]: r.asDict()
        for r in retrieval_metrics(res_df, qrel_df, k=k).collect()
    }
    want = _retrieval_oracle(results, qrels, k)
    assert set(got) == set(want)  # only queries with >=1 relevant doc
    for q, m in want.items():
        for key, val in m.items():
            assert got[q][key] == pytest.approx(val), (q, key)


def test_retrieval_metrics_perfect_ranker(spark):
    res = spark.createDataFrame(
        [("q0", f"d{i}", 10.0 - i) for i in range(5)],
        schema="query_id string, doc_id string, score double",
    )
    qrels = spark.createDataFrame(
        [("q0", f"d{i}", 1) for i in range(3)],
        schema="query_id string, doc_id string, grade int",
    )
    r = retrieval_metrics(res, qrels, k=5).collect()[0]
    assert r["recall_at_k"] == 1.0
    assert r["precision_at_k"] == pytest.approx(3 / 5)
    assert r["rr_at_k"] == 1.0
    assert r["ap_at_k"] == pytest.approx(1.0)
    assert r["ndcg_at_k"] == pytest.approx(1.0)


def test_retrieval_metrics_respects_rank_col(spark):
    # rank column contradicts the scores; rank wins
    res = spark.createDataFrame(
        [("q0", "bad", 9.0, 2), ("q0", "good", 1.0, 1)],
        schema="query_id string, doc_id string, score double, rank int",
    )
    qrels = spark.createDataFrame(
        [("q0", "good", 1)], schema="query_id string, doc_id string, grade int"
    )
    r = retrieval_metrics(res, qrels, k=2, rank_col="rank").collect()[0]
    assert r["rr_at_k"] == 1.0


# --------------------------------------------------------------------------
# binary_metrics
# --------------------------------------------------------------------------

def _rankdata(xs):
    """Average ranks with ties — independent of the SQL cumsum trick."""
    order = sorted(range(len(xs)), key=lambda i: xs[i])
    ranks = [0.0] * len(xs)
    i = 0
    while i < len(order):
        j = i
        while j + 1 < len(order) and xs[order[j + 1]] == xs[order[i]]:
            j += 1
        avg = (i + j) / 2 + 1
        for t in range(i, j + 1):
            ranks[order[t]] = avg
        i = j + 1
    return ranks


def _binary_oracle(pairs, threshold=0.5, bins=10):
    ys = [y for y, _ in pairs]
    ss = [s for _, s in pairs]
    n = len(ys)
    n_pos = sum(ys)
    n_neg = n - n_pos
    ranks = _rankdata(ss)
    auc = None
    if n_pos and n_neg:
        rank_pos = sum(r for r, y in zip(ranks, ys) if y)
        auc = (rank_pos - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg)
    brier = sum((s - y) ** 2 for y, s in pairs) / n
    by_bin = {}
    for y, s in pairs:
        b = min(bins - 1, max(0, math.floor(s * bins)))
        acc = by_bin.setdefault(b, [0, 0.0, 0.0])
        acc[0] += 1
        acc[1] += s
        acc[2] += y
    ece = sum(
        cnt * abs(sc / cnt - yc / cnt) for cnt, sc, yc in by_bin.values()
    ) / n
    tp = sum(1 for y, s in pairs if y and s >= threshold)
    fp = sum(1 for y, s in pairs if not y and s >= threshold)
    fn = n_pos - tp
    tn = n_neg - fp
    return dict(
        n=n, n_pos=n_pos, auc=auc, brier=brier, ece=ece,
        accuracy=(tp + tn) / n,
        precision=tp / (tp + fp) if tp + fp else None,
        recall=tp / n_pos if n_pos else None,
        f1=2 * tp / (2 * tp + fp + fn) if 2 * tp + fp + fn else None,
    )


def test_binary_metrics_python_parity_with_ties(spark):
    rng = random.Random(31)
    # coarse score grid -> heavy ties, exercising the histogram ranks
    pairs = [
        (rng.randint(0, 1), round(rng.randrange(0, 11) / 10, 1))
        for _ in range(400)
    ]
    df = spark.createDataFrame(pairs, schema="label int, score double")
    r = binary_metrics(df).collect()[0]
    want = _binary_oracle(pairs)
    for key, val in want.items():
        if val is None:
            assert r[key] is None, key
        else:
            assert r[key] == pytest.approx(val), key


def test_binary_metrics_grouped_and_degenerate(spark):
    rng = random.Random(41)
    rows = []
    for g, flip in (("good", 0.9), ("bad", 0.3), ("onecls", None)):
        for _ in range(50):
            if flip is None:
                y = 1  # single-class group -> NULL auc
                s = rng.random()
            else:
                y = rng.randint(0, 1)
                s = y * flip + (1 - y) * (1 - flip) + rng.gauss(0, 0.05)
                s = min(1.0, max(0.0, s))
            rows.append((g, y, s))
    df = spark.createDataFrame(rows, schema="grp string, label int, score double")
    got = {r["grp"]: r for r in binary_metrics(df, by="grp").collect()}
    assert got["onecls"]["auc"] is None
    assert got["good"]["auc"] > 0.9 > got["bad"]["auc"]
    for g in ("good", "bad", "onecls"):
        sub = [(y, s) for gg, y, s in rows if gg == g]
        want = _binary_oracle(sub)
        for key in ("n", "n_pos", "brier", "ece", "accuracy"):
            assert got[g][key] == pytest.approx(want[key]), (g, key)


def test_binary_metrics_duckdb_parity(spark):
    import duckdb
    import pandas as pd

    rng = random.Random(53)
    pairs = [
        (rng.randint(0, 1), round(rng.random(), 2)) for _ in range(300)
    ]
    df = spark.createDataFrame(pairs, schema="label int, score double")
    got = binary_metrics(df, threshold=0.6, bins=5).toPandas().iloc[0]
    con = duckdb.connect()
    con.register("scored", pd.DataFrame(pairs, columns=["label", "score"]))
    want = con.execute("""
        WITH hist AS (
          SELECT score AS s, count(*) AS n_s, sum(label) AS pos_s
          FROM scored GROUP BY score),
        ranked AS (
          SELECT s, n_s, pos_s,
                 coalesce(sum(n_s) OVER (ORDER BY s
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   + (n_s + 1) / 2.0 AS ar,
                 least(4, greatest(0, CAST(floor(s * 5) AS INT))) AS b
          FROM hist),
        binned AS (
          SELECT b, sum(n_s) AS nb,
                 sum(s * n_s) / sum(n_s) AS conf,
                 sum(pos_s) / CAST(sum(n_s) AS DOUBLE) AS acc
          FROM ranked GROUP BY b)
        SELECT
          (SELECT sum(n_s) FROM ranked) AS n,
          (SELECT sum(pos_s) FROM ranked) AS n_pos,
          (SELECT (sum(pos_s * ar) - sum(pos_s) * (sum(pos_s) + 1) / 2.0)
                  / (sum(pos_s) * (sum(n_s) - sum(pos_s))) FROM ranked) AS auc,
          (SELECT sum(pos_s * (s-1)*(s-1) + (n_s-pos_s) * s * s) / sum(n_s)
             FROM ranked) AS brier,
          (SELECT sum(nb * abs(conf - acc)) / sum(nb) FROM binned) AS ece,
          (SELECT sum(CASE WHEN s >= 0.6 THEN pos_s ELSE 0 END)
             FROM ranked) AS tp,
          (SELECT sum(CASE WHEN s >= 0.6 THEN n_s - pos_s ELSE 0 END)
             FROM ranked) AS fp
    """).df().iloc[0]
    assert got["n"] == want["n"] and got["n_pos"] == want["n_pos"]
    for c in ("auc", "brier", "ece"):
        assert got[c] == pytest.approx(want[c]), c
    assert got["precision"] == pytest.approx(
        want["tp"] / (want["tp"] + want["fp"])
    )
    assert got["recall"] == pytest.approx(want["tp"] / want["n_pos"])


def test_binary_metrics_drops_null_rows(spark):
    df = spark.createDataFrame(
        [(1, 0.9), (0, 0.1), (None, 0.5), (1, None)],
        schema="label int, score double",
    )
    r = binary_metrics(df).collect()[0]
    assert r["n"] == 2 and r["n_pos"] == 1 and r["auc"] == 1.0
