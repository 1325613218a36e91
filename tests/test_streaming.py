"""Structured Streaming operators: memory-sink smoke + batch parity."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from graphrole_spark.sources.transcripts import synthesize_transcripts
from graphrole_spark.streaming.incremental import (
    stream_conversation_state,
    stream_session_stats,
    stream_turn_attributes,
)
from graphrole_spark.temporal.ops import sessionize


@pytest.fixture(scope="module")
def transcript_dir(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("stream_src") / "transcripts")
    synthesize_transcripts(spark, 15, seed=42).write.parquet(path)
    return path


def _run_stream(spark, df, name):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.sql(f"SELECT * FROM {name}")


def test_stream_turn_attributes(spark, transcript_dir):
    batch_schema = spark.read.parquet(transcript_dir).schema
    stream = spark.readStream.schema(batch_schema).parquet(transcript_dir)
    out = _run_stream(spark, stream_turn_attributes(stream), "turn_attrs")
    batch = spark.read.parquet(transcript_dir)
    assert out.count() == batch.count()
    joined = out.join(batch, ["conv_id", "turn_idx"])
    mismatch = joined.where(
        F.col("attribute_text_len") != F.length("text")
    ).count()
    assert mismatch == 0


def test_stream_session_stats_matches_batch(spark, transcript_dir):
    batch_schema = spark.read.parquet(transcript_dir).schema
    stream = spark.readStream.schema(batch_schema).parquet(transcript_dir)
    got = _run_stream(
        spark, stream_session_stats(stream, gap_seconds=1800), "session_stats"
    ).toPandas()

    batch = spark.read.parquet(transcript_dir)
    exp = (
        sessionize(batch, ["conv_id"], "ts", 1800)
        .groupBy("conv_id", "session_seq")
        .agg(F.count("*").alias("n_turns"))
        .toPandas()
    )
    # append mode emits only sessions the watermark has CLOSED — trailing
    # sessions (within 2h+gap of the global max ts) are correctly withheld.
    assert len(got) > 0
    # every emitted (conv, n_turns) must exist in the batch multiset
    exp_sizes = exp.groupby("conv_id")["n_turns"].apply(list).to_dict()
    for conv, grp in got.groupby("conv_id"):
        batch_sizes = list(exp_sizes[conv])
        for n in grp["n_turns"]:
            assert n in batch_sizes, (conv, n, batch_sizes)
            batch_sizes.remove(n)
    # closed sessions: everything ending well before the watermark was emitted
    max_ts = batch.agg(F.max("ts")).collect()[0][0]
    import datetime as dt

    horizon = max_ts - dt.timedelta(hours=2, seconds=1800 + 1)
    full = sessionize(batch, ["conv_id"], "ts", 1800)
    closed = (
        full.groupBy("conv_id", "session_seq")
        .agg(F.count("*").alias("n_turns"), F.max("ts").alias("end_ts"))
        .where(F.col("end_ts") < F.lit(horizon))
        .count()
    )
    assert len(got) >= closed


def test_stream_conversation_state(spark, transcript_dir):
    batch_schema = spark.read.parquet(transcript_dir).schema
    stream = spark.readStream.schema(batch_schema).parquet(transcript_dir)
    out = _run_stream(spark, stream_conversation_state(stream), "conv_state").toPandas()
    batch_counts = (
        spark.read.parquet(transcript_dir).groupBy("conv_id").count().toPandas()
    )
    got_max = out.groupby("conv_id")["running_turns"].max().sort_index()
    exp = batch_counts.set_index("conv_id")["count"].sort_index()
    pd.testing.assert_series_equal(got_max, exp, check_dtype=False, check_names=False)
