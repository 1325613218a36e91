"""TableIO: bucketed transcript layout round-trips losslessly."""

import pandas as pd

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
