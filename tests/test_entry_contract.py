"""Local replica of the driver's correctness harness.

For every ``queries()`` entry with an ``oracle_sql()`` counterpart, run
both on sf0.001 and compare row count + sorted values (the driver does
the same at sf0.01 with a value hash). Queries without oracles get a
rows-only sanity check.
"""

import duckdb
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


ORACLES = entrymod.oracle_sql()
QUERIES = entrymod.queries()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, duck, name):
    got = QUERIES[name](spark, SF_DIR).toPandas()
    exp = duck.execute(ORACLES[name]).df()

    assert sorted(got.columns) == sorted(exp.columns), name
    assert len(got) == len(exp), f"{name}: rows {len(got)} vs {len(exp)}"

    cols = sorted(got.columns)
    got = got[cols].sort_values(cols).reset_index(drop=True)
    exp = exp[cols].sort_values(cols).reset_index(drop=True)
    for c in cols:
        g, e = got[c], exp[c]
        if np.issubdtype(g.dtype, np.floating) or np.issubdtype(e.dtype, np.floating):
            assert np.allclose(
                g.fillna(np.nan).to_numpy(dtype=float),
                e.fillna(np.nan).to_numpy(dtype=float),
                atol=1e-6, equal_nan=True,
            ), f"{name}.{c}"
        else:
            pd.testing.assert_series_equal(
                g.astype(str), e.astype(str), check_names=False,
                check_index=False, obj=f"{name}.{c}",
            )


@pytest.mark.parametrize(
    "name", sorted(set(QUERIES) - set(ORACLES))
)
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0


def test_oracle_backed_queries_lead():
    """Registry-order contract: the driver adjudicates only the first 50
    queries() entries, so every oracle-backed query must sit inside that
    window and the rows-only queries at the tail."""
    names = list(QUERIES)
    oracle_names = set(ORACLES)
    assert len(oracle_names) <= 50, "oracle-backed entries exceed the check window"
    head = names[: len(oracle_names)]
    assert set(head) == oracle_names, (
        "oracle-backed queries must occupy the leading registry positions: "
        f"missing={oracle_names - set(head)} extra={set(head) - oracle_names}"
    )
