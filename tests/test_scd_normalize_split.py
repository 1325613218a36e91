"""Round-3 operators vs DuckDB oracle + invariants.

* scd2_history / scd2_merge / scd2_lookup (temporal/scd.py)
* normalize_features (operators/normalize.py)
* temporal_split (temporal/ops.py)
* encoding_quality (functions/text.py)
"""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from graphrole_spark.functions.text import encoding_quality
from graphrole_spark.operators.normalize import normalize_features
from graphrole_spark.temporal.ops import temporal_split
from graphrole_spark.temporal.scd import scd2_history, scd2_lookup, scd2_merge

SF_DIR = "/root/testdata/sf0.001"
EVENTS = f"{SF_DIR}/events.parquet"


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(EVENTS)


def _duck(sql):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{EVENTS}'")
    return con.execute(sql).df()


def _compare(spark_df, duck_pdf, keys):
    got = spark_df.toPandas().sort_values(keys).reset_index(drop=True)
    exp = duck_pdf.sort_values(keys).reset_index(drop=True)
    for df in (got, exp):  # unify ns- vs µs-resolution timestamps
        for c in df.columns:
            if pd.api.types.is_datetime64_any_dtype(df[c]):
                df[c] = df[c].astype("datetime64[us]")
    got = got[sorted(got.columns)]
    exp = exp[sorted(exp.columns)]
    assert list(got.columns) == list(exp.columns), (got.columns, exp.columns)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False, atol=1e-9)


SCD2_SQL = """
WITH ordered AS (
  SELECT user_id, ts, event_type,
         lag(ts)         OVER w AS prev_ts,
         lag(event_type) OVER w AS prev_attr
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_type)
),
opens AS (
  SELECT user_id, ts, event_type,
         CASE WHEN prev_ts IS NULL
                OR event_type IS DISTINCT FROM prev_attr THEN 1 ELSE 0 END
           AS is_open
  FROM ordered
),
vers AS (
  SELECT user_id, ts, event_type,
         SUM(is_open) OVER (PARTITION BY user_id ORDER BY ts, event_type
                            ROWS UNBOUNDED PRECEDING) AS ver
  FROM opens
),
per_ver AS (
  SELECT user_id, ver, min(ts) AS valid_from,
         min(event_type) AS event_type
  FROM vers GROUP BY user_id, ver
)
SELECT user_id, event_type, valid_from,
       lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from, ver)
         AS valid_to,
       lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from, ver)
         IS NULL AS is_current
FROM per_ver
"""


def test_scd2_history_vs_duckdb(events):
    got = scd2_history(events, ["user_id"], "ts", ["event_type"])
    _compare(got, _duck(SCD2_SQL), ["user_id", "valid_from"])


def test_scd2_history_collapses_repeats(spark):
    changes = spark.createDataFrame(
        [
            ("u1", 1.0, "a"),
            ("u1", 2.0, "a"),  # repeat -> absorbed
            ("u1", 3.0, "b"),
            ("u1", 4.0, "a"),  # back to a -> NEW version (type 2)
            ("u2", 1.0, None),  # null attr opens a version
            ("u2", 2.0, None),  # null == null (null-safe) -> absorbed
        ],
        "k string, t double, attr string",
    ).select("k", F.timestamp_seconds("t").alias("t"), "attr")
    h = (
        scd2_history(changes, ["k"], "t", ["attr"])
        .orderBy("k", "valid_from")
        .collect()
    )
    assert [(r.k, r.attr) for r in h] == [
        ("u1", "a"), ("u1", "b"), ("u1", "a"), ("u2", None)
    ]
    assert [r.is_current for r in h] == [False, False, True, True]
    # versions tile the timeline: valid_to == next valid_from
    u1 = [r for r in h if r.k == "u1"]
    assert all(
        u1[i].valid_to == u1[i + 1].valid_from for i in range(len(u1) - 1)
    )


def test_scd2_merge_equals_full_rebuild(events):
    """Incremental merge over a split feed == one-shot history."""
    cut = events.agg(
        F.percentile(F.col("ts").cast("timestamp").cast("double"), F.lit(0.6))
    ).collect()[0][0]
    old = events.where(F.col("ts").cast("timestamp").cast("double") <= cut)
    new = events.where(F.col("ts").cast("timestamp").cast("double") > cut)
    dim = scd2_history(old, ["user_id"], "ts", ["event_type"])
    merged = scd2_merge(dim, new, ["user_id"], "ts", ["event_type"])
    full = scd2_history(events, ["user_id"], "ts", ["event_type"])
    _compare(merged, full.toPandas(), ["user_id", "valid_from"])


def test_scd2_merge_backfill_and_untouched(spark):
    changes = spark.createDataFrame(
        [("u1", 2.0, "a"), ("u1", 4.0, "b"), ("u9", 1.0, "z")],
        "k string, t double, attr string",
    ).select("k", F.timestamp_seconds("t").alias("t"), "attr")
    dim = scd2_history(changes, ["k"], "t", ["attr"])
    # an update OLDER than u1's history back-fills; u9 untouched
    upd = spark.createDataFrame(
        [("u1", 1.0, "pre")], "k string, t double, attr string"
    ).select("k", F.timestamp_seconds("t").alias("t"), "attr")
    out = scd2_merge(dim, upd, ["k"], "t", ["attr"]).orderBy("k", "valid_from")
    rows = out.collect()
    assert [(r.k, r.attr) for r in rows] == [
        ("u1", "pre"), ("u1", "a"), ("u1", "b"), ("u9", "z")
    ]


def test_scd2_lookup_point_in_time(spark):
    changes = spark.createDataFrame(
        [("u1", 1.0, "a"), ("u1", 3.0, "b")], "k string, t double, attr string"
    ).select("k", F.timestamp_seconds("t").alias("t"), "attr")
    dim = scd2_history(changes, ["k"], "t", ["attr"])
    facts = spark.createDataFrame(
        [("u1", 0.5), ("u1", 1.0), ("u1", 2.9), ("u1", 3.0), ("u1", 9.0),
         ("u2", 1.0)],
        "k string, t double",
    ).select("k", F.timestamp_seconds("t").alias("t"))
    out = scd2_lookup(facts, dim, ["k"], "t", ["attr"]).orderBy("k", "t")
    vals = [r.attr_dim for r in out.collect()]
    # before history -> null; boundaries are [from, to)
    assert vals == [None, "a", "a", "b", "b", None]


NORM_SQL = {
    "zscore": """
      SELECT event_id,
             CASE WHEN stddev_pop(value) OVER () > 0
                  THEN (value - avg(value) OVER ()) / stddev_pop(value) OVER ()
                  ELSE 0.0 END AS value
      FROM events
    """,
    "minmax": """
      SELECT event_id,
             CASE WHEN max(value) OVER () > min(value) OVER ()
                  THEN (value - min(value) OVER ())
                       / (max(value) OVER () - min(value) OVER ())
                  ELSE 0.0 END AS value
      FROM events
    """,
    "robust": """
      WITH s AS (SELECT quantile_cont(value, 0.5) AS med,
                        quantile_cont(value, 0.75) - quantile_cont(value, 0.25)
                          AS iqr
                 FROM events)
      SELECT event_id,
             CASE WHEN iqr > 0 THEN (value - med) / iqr ELSE 0.0 END AS value
      FROM events, s
    """,
}


@pytest.mark.parametrize("method", ["zscore", "minmax", "robust"])
def test_normalize_vs_duckdb(events, method):
    got = normalize_features(
        events.select("event_id", "value"), ["value"], method=method
    )
    _compare(got, _duck(NORM_SQL[method]), ["event_id"])


def test_normalize_constant_and_null(spark):
    df = spark.createDataFrame(
        [(1, 5.0, 1.0), (2, 5.0, None), (3, 5.0, 3.0)],
        "id int, const double, v double",
    )
    out = normalize_features(df, ["const", "v"], method="zscore").orderBy("id")
    rows = out.collect()
    assert [r.const for r in rows] == [0.0, 0.0, 0.0]  # zero variance -> 0
    assert rows[1].v is None  # nulls pass through
    # clip winsorizes
    clipped = normalize_features(df, ["v"], method="zscore", clip=0.5)
    assert all(abs(r.v) <= 0.5 for r in clipped.collect() if r.v is not None)


def test_temporal_split_vs_duckdb(events):
    got = temporal_split(events, "ts", 0.8, 0.1).select("event_id", "split")
    exp = _duck(
        """
        WITH c AS (SELECT quantile_cont(epoch(ts), 0.8) AS t1,
                          quantile_cont(epoch(ts), 0.9) AS t2 FROM events)
        SELECT event_id,
               CASE WHEN epoch(ts) <= t1 THEN 'train'
                    WHEN epoch(ts) <= t2 THEN 'val'
                    ELSE 'test' END AS split
        FROM events, c
        """
    )
    _compare(got, exp, ["event_id"])


def test_temporal_split_embargo_and_order(events):
    e = 6 * 3600.0  # must stay well under the val band's time span
    out = temporal_split(events, "ts", 0.7, 0.15, embargo_seconds=e)
    agg = {
        r.split: (r.lo, r.hi)
        for r in out.groupBy("split")
        .agg(F.min("ts").alias("lo"), F.max("ts").alias("hi"))
        .collect()
    }
    # strict time ordering: max(train) < min(val) ... with embargo gaps
    assert agg["train"][1] < agg["val"][0]
    assert agg["val"][1] < agg["test"][0]
    assert "embargo" in agg
    # every embargoed row sits inside (boundary, boundary+e] of a split
    n = out.count()
    assert n == events.count()
    with pytest.raises(ValueError):
        temporal_split(events, "ts", 0.9, 0.2)


def test_rolling_origin_folds_vs_duckdb(events):
    from graphrole_spark.temporal.ops import rolling_origin_folds

    got = rolling_origin_folds(events, "ts", n_folds=3, base_train_frac=0.4)
    got = got.select("event_id", "fold")
    exp = _duck(
        """
        WITH c AS (SELECT quantile_cont(epoch(ts), 0.4) AS c0,
                          quantile_cont(epoch(ts), 0.6) AS c1,
                          quantile_cont(epoch(ts), 0.8) AS c2 FROM events)
        SELECT event_id,
               CASE WHEN epoch(ts) <= c0 THEN 0
                    WHEN epoch(ts) <= c1 THEN 1
                    WHEN epoch(ts) <= c2 THEN 2
                    ELSE 3 END AS fold
        FROM events, c
        """
    )
    _compare(got, exp, ["event_id"])


def test_rolling_origin_folds_embargo_invariants(events):
    from graphrole_spark.temporal.ops import rolling_origin_folds

    out = rolling_origin_folds(
        events, "ts", n_folds=3, base_train_frac=0.4,
        embargo_seconds=6 * 3600.0,
    )
    spans = {
        r.fold: (r.lo, r.hi)
        for r in out.groupBy("fold")
        .agg(F.min("ts").alias("lo"), F.max("ts").alias("hi"))
        .collect()
    }
    assert set(spans) == {-1, 0, 1, 2, 3}
    # expanding-window ordering: every fold's test span starts after all
    # earlier folds end
    for i in range(1, 4):
        for j in range(i):
            assert spans[j][1] < spans[i][0]
    assert out.count() == events.count()
    with pytest.raises(ValueError):
        rolling_origin_folds(events, "ts", n_folds=0)


def test_encoding_quality_signals(spark):
    docs = spark.createDataFrame(
        [
            (1, "clean ascii text"),
            (2, "mojibake: cafÃ© and â€™quoteâ€™"),
            (3, "repl �� char"),
            (4, "ctrl\x07byte\x00here"),
            (5, ""),
            (6, None),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in encoding_quality(docs).collect()}
    assert out[1].encoding_ok and out[1].bad_ratio == 0.0
    assert out[2].n_mojibake == 3 and not out[2].encoding_ok
    assert out[3].n_replacement == 2 and not out[3].encoding_ok
    assert out[4].n_control == 2 and not out[4].encoding_ok
    assert out[5].encoding_ok and out[6].encoding_ok  # empty/null pass


def test_encoding_quality_vs_duckdb(spark):
    sdf = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = encoding_quality(sdf).select("doc_id", "n_replacement", "n_control",
                                       "n_mojibake", "encoding_ok")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    exp = con.execute(
        r"""
        SELECT doc_id,
               len(regexp_extract_all(coalesce(text,''), '\x{FFFD}'))
                 AS n_replacement,
               len(regexp_extract_all(coalesce(text,''),
                   '[\x00-\x08\x0B\x0C\x0E-\x1F]')) AS n_control,
               len(regexp_extract_all(coalesce(text,''),
                   '(Ã[\x{80}-\x{BF}])|(â€.)|(Â[\x{A0}-\x{BF}])'))
                 AS n_mojibake,
               CASE WHEN length(coalesce(text,'')) > 0
                    THEN round(
                      (len(regexp_extract_all(coalesce(text,''), '\x{FFFD}'))
                       + len(regexp_extract_all(coalesce(text,''),
                             '[\x00-\x08\x0B\x0C\x0E-\x1F]'))
                       + len(regexp_extract_all(coalesce(text,''),
                             '(Ã[\x{80}-\x{BF}])|(â€.)|(Â[\x{A0}-\x{BF}])'))
                      ) / CAST(length(coalesce(text,'')) AS DOUBLE), 6)
                    ELSE 0.0 END <= 0.01 AS encoding_ok
        FROM documents
        """
    ).df()
    _compare(got, exp, ["doc_id"])
