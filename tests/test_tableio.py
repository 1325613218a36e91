"""TableIO: bucketed transcript layout round-trips losslessly."""

import pandas as pd
import pytest

from graphrole_spark.sources.tableio import TableIO, iceberg_available
from graphrole_spark.sources.transcripts import synthesize_transcripts


def test_tableio_round_trip(spark, tmp_path):
    io = TableIO(spark)
    assert io.use_iceberg == iceberg_available(spark)  # no jar in sandbox
    t = synthesize_transcripts(spark, 25, seed=42)
    path = str(tmp_path / "transcripts")
    io.write_transcripts(t, path, buckets=4)

    back = io.read_transcripts(path)
    assert set(back.columns) == set(t.columns)

    a = t.orderBy("conv_id", "turn_idx").toPandas().reset_index(drop=True)
    b = back.orderBy("conv_id", "turn_idx").toPandas().reset_index(drop=True)
    # per-turn text equality under stable ordering (input_hint invariant)
    pd.testing.assert_frame_equal(a[["conv_id", "turn_idx", "text"]],
                                  b[["conv_id", "turn_idx", "text"]])
    pd.testing.assert_frame_equal(a, b[a.columns.tolist()])


def test_iceberg_wiring_dispatch(spark, monkeypatch):
    """The iceberg branch can't run end-to-end in this sandbox (no
    runtime jar), but its WIRING must not rot: when the probe reports
    the jar present, TableIO must flip to iceberg and route reads
    through READERS['iceberg'] (and the default-format pick must follow
    use_iceberg). Dispatch is verified with a sentinel reader — no jar
    needed."""
    import graphrole_spark.sources.tableio as tio

    monkeypatch.setattr(tio, "iceberg_available", lambda _s: True)
    io = tio.TableIO(spark)
    assert io.use_iceberg is True

    seen = {}

    def sentinel(s, path):
        seen["path"] = path
        return s.range(1)

    monkeypatch.setitem(tio.READERS, "iceberg", sentinel)
    df = io.read("db.transcripts")  # fmt=None → iceberg when available
    assert seen["path"] == "db.transcripts"
    assert df.count() == 1

    # prefer_iceberg=False must still force parquet regardless of jar
    assert tio.TableIO(spark, prefer_iceberg=False).use_iceberg is False


def test_iceberg_round_trip_live(spark, tmp_path):
    """End-to-end Iceberg write/read — probes the ACTUAL classpath and
    runs automatically the day the sandbox gains the runtime jar
    (sources/tableio.py:43); skipped-with-reason until then."""
    if not iceberg_available(spark):
        pytest.skip("no Iceberg runtime jar on the Spark classpath "
                    "in this environment")
    io = TableIO(spark)
    assert io.use_iceberg
    t = synthesize_transcripts(spark, 10, seed=7)
    io.write_transcripts(t, "local.db.transcripts_test", buckets=4)
    back = io.read_transcripts("local.db.transcripts_test")
    assert back.count() == t.count()
