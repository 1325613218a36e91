"""Tests for temporal/cohort.py::cohort_retention and
temporal/ops.py::rolling_anomalies (DuckDB parity + invariants)."""

import datetime as dt
import random

import duckdb
import pandas as pd
import pytest


def _events_pdf(seed=17, n_users=60):
    rng = random.Random(seed)
    base = dt.datetime(2024, 1, 1)
    rows = []
    for u in range(n_users):
        start = rng.randint(0, 21)  # first-seen day over 3 weeks
        for _ in range(rng.randint(1, 15)):
            d = start + rng.randint(0, 40)
            rows.append(
                (u, base + dt.timedelta(days=d, seconds=rng.randint(0, 86399)),
                 round(rng.uniform(0, 100), 2))
            )
    return pd.DataFrame(rows, columns=["user_id", "ts", "value"])


def test_cohort_retention_duckdb_parity(spark):
    from graphrole_spark.temporal.cohort import cohort_retention

    pdf = _events_pdf()
    df = spark.createDataFrame(pdf)
    got = (
        cohort_retention(df, ["user_id"], "ts", period="week")
        .orderBy("cohort_ts", "offset")
        .toPandas()
    )
    con = duckdb.connect()
    con.register("t", pdf)
    oracle = con.execute("""
        WITH a AS (
          SELECT DISTINCT user_id,
                 CAST(floor(epoch(ts) / 604800) * 604800 AS BIGINT) AS b
          FROM t),
        c AS (
          SELECT *, min(b) OVER (PARTITION BY user_id) AS cohort FROM a),
        o AS (
          SELECT cohort, CAST((b - cohort) / 604800 AS INT) AS off
          FROM c),
        cnt AS (
          SELECT cohort, off, CAST(count(*) AS BIGINT) AS n_active
          FROM o GROUP BY 1, 2),
        sz AS (
          SELECT *, max(CASE WHEN off = 0 THEN n_active END)
                      OVER (PARTITION BY cohort) AS cohort_size
          FROM cnt)
        SELECT cohort, off AS offset_, n_active, cohort_size,
               round(n_active / cohort_size, 6) AS retention
        FROM sz ORDER BY cohort, off
    """).df()
    assert [x.timestamp() for x in got["cohort_ts"]] == oracle[
        "cohort"
    ].tolist()
    assert got["offset"].tolist() == oracle["offset_"].tolist()
    for c in ["n_active", "cohort_size"]:
        assert got[c].tolist() == oracle[c].tolist(), c
    assert got["retention"].tolist() == pytest.approx(
        oracle["retention"].tolist(), abs=1e-9
    )
    # offset-0 rows are retention 1 by construction
    assert (got.loc[got["offset"] == 0, "retention"] == 1.0).all()
    # retention never exceeds 1
    assert (got["retention"] <= 1.0).all()


def test_cohort_retention_max_offset_and_validation(spark):
    from graphrole_spark.temporal.cohort import cohort_retention

    pdf = _events_pdf(seed=3)
    df = spark.createDataFrame(pdf)
    got = cohort_retention(
        df, ["user_id"], "ts", period="day", max_offset=7
    ).toPandas()
    assert got["offset"].max() <= 7
    with pytest.raises(ValueError):
        cohort_retention(df, ["user_id"], "ts", period="month")
    with pytest.raises(ValueError):
        cohort_retention(df, ["user_id"], "ts", max_offset=-1)


def test_rolling_anomalies_duckdb_parity(spark):
    from graphrole_spark.temporal.ops import rolling_anomalies

    pdf = _events_pdf(seed=23)
    # unique ts per user (dedupe) so both engines' sorts agree
    pdf = pdf.drop_duplicates(subset=["user_id", "ts"]).reset_index(drop=True)
    df = spark.createDataFrame(pdf)
    got = (
        rolling_anomalies(
            df, ["user_id"], "ts", "value", window=5, z_thresh=1.5,
            min_periods=3,
        )
        .orderBy("user_id", "ts")
        .toPandas()
    )
    con = duckdb.connect()
    con.register("t", pdf)
    oracle = con.execute("""
        SELECT user_id, ts, value,
               CAST(count(value) OVER w AS INT) AS trail_n,
               round(avg(value) OVER w, 9) AS trail_mean,
               CASE WHEN count(value) OVER w >= 3
                         AND stddev_samp(value) OVER w > 0
                    THEN round((value - avg(value) OVER w)
                               / stddev_samp(value) OVER w, 9)
               END AS z
        FROM t
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
                     ROWS BETWEEN 5 PRECEDING AND 1 PRECEDING)
        ORDER BY user_id, ts
    """).df()
    assert got["trail_n"].tolist() == oracle["trail_n"].tolist()
    gz = [None if pd.isna(x) else x for x in got["z"]]
    oz = [None if pd.isna(x) else x for x in oracle["z"]]
    assert len(gz) == len(oz)
    for a, b in zip(gz, oz):
        if a is None or b is None:
            assert a is None and b is None
        else:
            assert a == pytest.approx(b, abs=1e-8)
    # flags consistent with |z| > 1.5; cold starts are never anomalies
    want_flags = [0 if x is None else int(abs(x) > 1.5) for x in gz]
    assert got["is_anomaly"].tolist() == want_flags


def test_rolling_anomalies_leakage_free_and_validation(spark):
    from graphrole_spark.temporal.ops import rolling_anomalies

    # a huge spike must NOT suppress its own z by inflating the
    # baseline — the trailing frame excludes the current row
    base = dt.datetime(2024, 1, 1)
    rows = [(1, base + dt.timedelta(minutes=i), 10.0 + (i % 3) * 0.5)
            for i in range(10)]
    rows.append((1, base + dt.timedelta(minutes=10), 1000.0))
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    got = (
        rolling_anomalies(df, ["user_id"], "ts", "value", window=5,
                          z_thresh=3.0)
        .orderBy("ts")
        .toPandas()
    )
    assert got.iloc[-1]["is_anomaly"] == 1
    assert got.iloc[-1]["z"] > 100  # baseline untouched by the spike
    for bad in (dict(window=0), dict(min_periods=0), dict(z_thresh=0)):
        with pytest.raises(ValueError):
            rolling_anomalies(df, ["user_id"], "ts", "value", **bad)


def test_future_window_label_duckdb_parity(spark):
    """temporal/ops.py::future_window_label — forward-horizon labels
    + censoring flags; DuckDB RANGE-frame parity."""
    import duckdb

    from graphrole_spark.temporal.ops import future_window_label

    pdf = _events_pdf(seed=41)
    pdf = pdf.drop_duplicates(subset=["user_id", "ts"]).reset_index(drop=True)
    pdf["is_err"] = (pdf["value"] > 80).astype(int)
    df = spark.createDataFrame(pdf)
    got = (
        future_window_label(
            df, ["user_id"], "ts", "is_err", horizon_seconds=86400 * 3
        )
        .orderBy("user_id", "ts")
        .toPandas()
    )
    con = duckdb.connect()
    con.register("t", pdf)
    oracle = con.execute("""
        SELECT user_id, ts,
               coalesce(max(is_err) OVER (
                 PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 1 FOLLOWING AND 259200000000 FOLLOWING
               ), 0) AS label,
               CAST(epoch_us(ts) + 259200000000 >
                    max(epoch_us(ts)) OVER (PARTITION BY user_id)
                 AS INT) AS label_censored
        FROM t ORDER BY user_id, ts
    """).df()
    assert got["label"].tolist() == oracle["label"].tolist()
    assert got["label_censored"].tolist() == oracle[
        "label_censored"
    ].tolist()
    # labels only look FORWARD: the event row itself is excluded
    one = pdf[pdf["is_err"] == 1].iloc[0]
    row = got[(got["user_id"] == one["user_id"]) & (got["ts"] == one["ts"])]
    # its own label depends only on LATER events, not itself
    later = pdf[
        (pdf["user_id"] == one["user_id"]) & (pdf["ts"] > one["ts"])
        & (pdf["ts"] <= one["ts"] + pd.Timedelta(days=3))
    ]
    assert row["label"].iloc[0] == int(later["is_err"].any())
    # the last row of every key is always censored
    last = got.sort_values("ts").groupby("user_id").tail(1)
    assert (last["label_censored"] == 1).all()
    with pytest.raises(ValueError):
        future_window_label(df, ["user_id"], "ts", "is_err", 0)


def test_seasonal_profile_and_anomalies_duckdb_parity(spark):
    """temporal/seasonal.py — fit/score parity against a DuckDB twin
    (hour_of_day slots) + planted-spike detection."""
    import duckdb

    from graphrole_spark.temporal.seasonal import (
        seasonal_anomalies,
        seasonal_profile,
    )

    rng = random.Random(31)
    base = dt.datetime(2024, 2, 5)  # Monday
    rows = []
    for day in range(14):
        for hour in range(24):
            for k in ("a", "b"):
                # daily shape: high at hour 12, low at night + noise
                level = 50 + 30 * (1 if 9 <= hour <= 17 else -1)
                rows.append(
                    (k, base + dt.timedelta(days=day, hours=hour),
                     round(level + rng.gauss(0, 3), 3))
                )
    # plant a clear violation: nighttime value at daytime level
    spike_ts = base + dt.timedelta(days=13, hours=3)
    rows.append(("a", spike_ts + dt.timedelta(minutes=1), 80.0))
    pdf = pd.DataFrame(rows, columns=["k", "ts", "value"])
    df = spark.createDataFrame(pdf)
    prof = seasonal_profile(df, ["k"], "ts", "value", period="hour_of_day")
    got_prof = prof.orderBy("k", "slot").toPandas()
    con = duckdb.connect()
    con.register("t", pdf)
    oracle = con.execute("""
        SELECT k, CAST(floor(epoch(ts) / 3600) % 24 AS INT) AS slot,
               CAST(count(*) AS BIGINT) AS n,
               round(avg(value), 9) AS mean,
               round(stddev_samp(value), 9) AS std
        FROM t GROUP BY 1, 2 ORDER BY k, slot
    """).df()
    for c in ["k", "slot", "n"]:
        assert got_prof[c].tolist() == oracle[c].tolist(), c
    assert got_prof["mean"].tolist() == pytest.approx(
        oracle["mean"].tolist(), abs=1e-8
    )
    assert got_prof["std"].tolist() == pytest.approx(
        oracle["std"].tolist(), abs=1e-8
    )
    scored = seasonal_anomalies(
        df, prof, ["k"], "ts", "value", period="hour_of_day"
    ).toPandas()
    flagged = scored[scored["is_anomaly"] == 1]
    # the planted spike is flagged; the regular stream mostly is not
    assert len(flagged) >= 1
    assert any(
        r["k"] == "a" and abs(r["value"] - 80.0) < 1e-9
        for _, r in flagged.iterrows()
    )
    assert len(flagged) < 0.02 * len(scored)
    # unseen-slot rows (no profile for key 'c') score NULL / 0
    extra = spark.createDataFrame(
        [("c", dt.datetime(2024, 2, 5, 3), 99.0)], "k string, ts timestamp, value double"
    )
    sc = seasonal_anomalies(
        extra, prof, ["k"], "ts", "value", period="hour_of_day"
    ).toPandas()
    assert pd.isna(sc["resid_z"][0]) and sc["is_anomaly"][0] == 0
    for bad in (dict(period="month"), dict(z_thresh=0), dict(min_slot_n=0)):
        with pytest.raises(ValueError):
            seasonal_anomalies(df, prof, ["k"], "ts", "value", **bad)
