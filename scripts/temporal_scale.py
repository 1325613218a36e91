#!/usr/bin/env python
"""Scale sweep for the round-3 temporal/analytics operators (funnel,
resample, rolling_anomalies, cohort_retention, future_window_label):
deterministic synthetic event streams at growing row counts, timings
appended to BENCH_TEMPORAL_SCALE.jsonl.

Stream: spark.range(m) events over ``m/50`` users (≈50 events/user,
Zipf-ish via u² skew on the user draw so some users are 10×-hot),
bursty timestamps over 60 days, 5 event types.

Usage: SPARK_GRAFT_TEMPORAL_ROWS=1000000,10000000 python scripts/temporal_scale.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def synth_events(spark, m: int):
    n_users = max(m // 50, 10)
    base = spark.range(m)

    def u(salt):
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col("id").cast("string"), F.lit(salt))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("double")
            / F.lit(float(16 ** 8))
        )

    types = F.array(*[F.lit(t) for t in
                      ["view", "click", "cart", "buy", "other"]])
    return base.select(
        F.col("id").alias("event_id"),
        F.floor(F.pow(u("u"), 2.0) * n_users).cast("long").alias("user_id"),
        F.timestamp_seconds(
            F.lit(1_700_000_000) + (u("t") * 86400 * 60).cast("long")
        ).alias("ts"),
        F.element_at(types, (F.floor(u("e") * 5) + 1).cast("int")).alias(
            "event_type"
        ),
        F.round(u("v") * 100, 4).alias("value"),
    )


def main() -> None:
    from graphrole_spark.session import get_spark
    from graphrole_spark.temporal.cohort import cohort_retention
    from graphrole_spark.temporal.funnel import funnel
    from graphrole_spark.temporal.ops import (
        future_window_label,
        resample,
        rolling_anomalies,
    )

    sizes = [
        int(x)
        for x in os.environ.get(
            "SPARK_GRAFT_TEMPORAL_ROWS", "1000000,10000000,100000000"
        ).split(",")
    ]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("temporal_scale", cores=cpus)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    log = os.path.join(repo, "BENCH_TEMPORAL_SCALE.jsonl")

    def timed(df):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 2)

    for m in sizes:
        events = synth_events(spark, m).persist()
        n = events.count()
        row = {"rows": n, "cpus": cpus}
        row["funnel_sec"] = timed(
            funnel(events, ["user_id"], "ts", "event_type",
                   ["view", "cart", "buy"])
        )
        row["resample_sec"] = timed(
            resample(events, ["user_id"], "ts", ["value"],
                     every_seconds=3600)
        )
        row["anomalies_sec"] = timed(
            rolling_anomalies(
                events.select("user_id", "ts", "value"),
                ["user_id"], "ts", "value", window=20,
            )
        )
        row["cohort_sec"] = timed(
            cohort_retention(events, ["user_id"], "ts", period="day")
        )
        row["future_label_sec"] = timed(
            future_window_label(
                events.select(
                    "user_id", "ts",
                    (F.col("event_type") == "buy").cast("int").alias("e"),
                ),
                ["user_id"], "ts", "e", horizon_seconds=86400,
            )
        )
        print(json.dumps(row), flush=True)
        with open(log, "a") as fh:
            fh.write(json.dumps(row) + "\n")
        events.unpersist()
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
