"""Tests for temporal/ops.py::resample — regular-grid resampling with
gap fill (DuckDB value parity, grid invariants, plan shape)."""

import datetime as dt
import random

import duckdb
import pandas as pd
import pytest


def _series_pdf(seed=5, n_keys=6, n_rows=40):
    rng = random.Random(seed)
    base = dt.datetime(2024, 1, 1)
    rows = []
    for k in range(n_keys):
        t = 0
        for _ in range(rng.randint(2, n_rows)):
            t += rng.randint(1, 900)  # bursty gaps up to 15 min
            rows.append(
                (f"k{k}", base + dt.timedelta(seconds=t),
                 round(rng.uniform(-5, 5), 3))
            )
    return pd.DataFrame(rows, columns=["conv_id", "ts", "value"])


ORACLE = """
    WITH b AS (
      SELECT conv_id,
             CAST(floor(epoch(ts) / {e}) * {e} AS BIGINT) AS gb,
             max_by(value, ts) AS v  -- fixture ts are unique per bucket;
             -- Spark's struct tie-break is pinned separately below
      FROM t GROUP BY 1, 2),
    n AS (
      SELECT *, lead(gb) OVER w AS nb, lead(v) OVER w AS nv
      FROM b WINDOW w AS (PARTITION BY conv_id ORDER BY gb)),
    g AS (
      SELECT conv_id, gb, v, nb, nv,
             unnest(generate_series(gb, coalesce(nb - {e}, gb), {e})) AS gg
      FROM n)
    SELECT conv_id, to_timestamp(gg) AT TIME ZONE 'UTC' AS bucket_ts,
           CASE WHEN gg > gb
                THEN round(v + (nv - v) * (gg - gb) / (nb - gb), 9)
                ELSE v END AS value,
           CASE WHEN gg > gb THEN 1 ELSE 0 END AS filled
    FROM g ORDER BY conv_id, gg
"""


def test_resample_interpolate_duckdb_parity(spark):
    from graphrole_spark.temporal.ops import resample

    pdf = _series_pdf()
    df = spark.createDataFrame(pdf)
    got = (
        resample(df, ["conv_id"], "ts", ["value"], every_seconds=300)
        .orderBy("conv_id", "bucket_ts")
        .toPandas()
    )
    con = duckdb.connect()
    con.register("t", pdf)
    oracle = con.execute(ORACLE.format(e=300)).df()
    assert got["conv_id"].tolist() == oracle["conv_id"].tolist()
    assert got["filled"].tolist() == oracle["filled"].tolist()
    assert [x.timestamp() for x in got["bucket_ts"]] == [
        x.timestamp() for x in oracle["bucket_ts"]
    ]
    pd.testing.assert_series_equal(
        got["value"], oracle["value"], check_exact=False, rtol=1e-9
    )


def test_resample_grid_is_regular_and_bounded(spark):
    from graphrole_spark.temporal.ops import resample

    pdf = _series_pdf(seed=8)
    df = spark.createDataFrame(pdf)
    out = resample(
        df, ["conv_id"], "ts", ["value"], every_seconds=60, fill="ffill"
    ).toPandas()
    for k, grp in out.groupby("conv_id"):
        secs = sorted(x.timestamp() for x in grp["bucket_ts"])
        # contiguous 60 s grid, no extrapolation past either end
        assert all(
            b - a == 60 for a, b in zip(secs, secs[1:])
        ), f"gap in grid for {k}"
        raw = pdf[pdf["conv_id"] == k]["ts"]
        lo = min(x.timestamp() for x in raw) // 60 * 60
        hi = max(x.timestamp() for x in raw) // 60 * 60
        assert secs[0] == lo and secs[-1] == hi
    # ffill: filled rows repeat the previous present value
    out = out.sort_values(["conv_id", "bucket_ts"])
    prev = out["value"].shift()
    same_key = out["conv_id"] == out["conv_id"].shift()
    filled = out["filled"] == 1
    assert (out.loc[filled & same_key, "value"].values
            == prev[filled & same_key].values).all()


def test_resample_modes_and_validation(spark):
    from graphrole_spark.temporal.ops import resample

    pdf = pd.DataFrame(
        {
            "conv_id": ["a"] * 3,
            "ts": [
                dt.datetime(2024, 1, 1, 0, 0, 10),
                dt.datetime(2024, 1, 1, 0, 0, 50),
                dt.datetime(2024, 1, 1, 0, 3, 5),
            ],
            "value": [1.0, 3.0, 9.0],
        }
    )
    df = spark.createDataFrame(pdf)
    # mean agg folds the two rows in bucket 0
    got = (
        resample(df, ["conv_id"], "ts", ["value"], 60, agg="mean")
        .orderBy("bucket_ts")
        .toPandas()
    )
    assert got["value"].tolist() == pytest.approx(
        [2.0, 4.0 + 1 / 3, 6.0 + 2 / 3, 9.0], abs=1e-8
    )
    assert got["filled"].tolist() == [0, 1, 1, 0]
    # null fill leaves gaps NULL
    gotn = (
        resample(df, ["conv_id"], "ts", ["value"], 60, fill="null")
        .orderBy("bucket_ts")
        .toPandas()
    )
    assert gotn["value"].isna().tolist() == [False, True, True, False]
    for bad in (
        dict(agg="median"), dict(fill="bfill"), dict(every_seconds=0)
    ):
        kw = dict(agg="last", fill="interpolate", every_seconds=60)
        kw.update(bad)
        with pytest.raises(ValueError):
            resample(df, ["conv_id"], "ts", ["value"], kw.pop("every_seconds"), **kw)


def test_resample_last_tie_determinism(spark):
    """Equal timestamps in one bucket: "last" picks the max value
    deterministically (struct tie-break), stable across partitionings."""
    import datetime as dt

    from graphrole_spark.temporal.ops import resample

    t = dt.datetime(2024, 1, 1)
    rows = [("a", t, 5.0), ("a", t, 2.0), ("a", t, 9.0)]
    df = spark.createDataFrame(rows, "conv_id string, ts timestamp, value double")
    for frame in (df, df.repartition(5)):
        out = resample(frame, ["conv_id"], "ts", ["value"], 60).toPandas()
        assert out["value"].tolist() == [9.0]


def test_resample_plan_shape(spark):
    """Exactly two exchanges: map-side-combined partials into the
    (key, bucket) aggregate, then the bucket-sized frame re-hashed on
    the bare key for the gap window. Raw rows never shuffle
    unaggregated and nothing collects."""
    from graphrole_spark.temporal.ops import resample

    df = spark.createDataFrame(_series_pdf())
    plan = (
        resample(df, ["conv_id"], "ts", ["value"], 300)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 2, plan[:2000]
    # the aggregate's partial (map-side combine) precedes the shuffle
    assert "partial_max_by" in plan
    # one Generate (sequence explode), no join of a grid table
    assert plan.count("Generate explode") == 1
    assert "Join" not in plan
