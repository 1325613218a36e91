"""Hypothesis property test: funnel vs a pure-python simulator on
random event streams, including same-timestamp collisions (the
deterministic prio tie order makes ties well-defined)."""

import datetime as dt

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

STEPS = ["A", "B", "C"]
BASE = dt.datetime(2024, 6, 1)


def _simulate(rows, within=None):
    """Python funnel: sort by (ts, step prio); chained earliest-at-or-
    after semantics; whole-funnel window from t1."""
    out = {}
    bykey = {}
    for key, t, s in rows:
        bykey.setdefault(key, []).append((t, s))
    prio = {s: i for i, s in enumerate(STEPS)}
    for key, evs in bykey.items():
        evs.sort(key=lambda e: (e[0], prio.get(e[1], len(STEPS))))
        m = [None] * len(STEPS)
        for t, s in evs:
            if s == STEPS[0]:
                m[0] = t if m[0] is None else min(m[0], t)
            else:
                for i in range(1, len(STEPS)):
                    if (
                        s == STEPS[i]
                        and m[i - 1] is not None
                        and (within is None or t <= m[0] + dt.timedelta(seconds=within))
                    ):
                        m[i] = t if m[i] is None else min(m[i], t)
        if m[0] is not None:
            out[key] = tuple(m)
    return out


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),       # key
            st.integers(min_value=0, max_value=40),      # ts offset (s)
            st.sampled_from(STEPS + ["X"]),              # step
        ),
        min_size=1,
        max_size=40,
    ),
    st.sampled_from([None, 10.0]),
)
@settings(max_examples=15, deadline=None)
def test_funnel_matches_python_simulator(raw, within):
    import tests.conftest  # noqa: F401  (path setup)
    from graphrole_spark.session import get_spark
    from graphrole_spark.temporal.funnel import funnel

    spark = get_spark("graphrole_spark_tests", cores=4, shuffle_partitions=4)
    rows = [(k, BASE + dt.timedelta(seconds=t), s) for k, t, s in raw]
    df = spark.createDataFrame(rows, "k long, ts timestamp, step string")
    got = funnel(
        df, ["k"], "ts", "step", STEPS, within_seconds=within
    ).toPandas()
    want = _simulate(
        [(k, BASE + dt.timedelta(seconds=t), s) for k, t, s in raw],
        within=within,
    )
    assert set(got["k"]) == set(want)
    for _, r in got.iterrows():
        wm = want[r["k"]]
        for i in range(len(STEPS)):
            g = r[f"t_{i+1}"]
            g = None if pd.isna(g) else g.to_pydatetime()
            assert g == wm[i], (r["k"], i, g, wm[i])
