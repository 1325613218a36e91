#!/usr/bin/env python
"""Scaling-efficiency evidence: the same ReFeX job at two parallelism
levels (local[8] vs local[32] — standing in for N vs 4N executors per
the driver instruction), identical input, reported as throughput at
both plus efficiency = (T_N / T_4N) / 4 … with the conventional
definition eff = speedup / resource-ratio.

Writes/updates BENCH.md and prints one JSON line.

Run each measurement in a fresh subprocess (one JVM cannot change its
master); the child prints a single JSON line consumed here.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, os.environ["REPO"])
from graphrole_spark.session import get_spark
from graphrole_spark.pipeline import (
    extract_transcript_features,
    fit_transcript_features,
    transform_transcript_features,
)
from graphrole_spark.sources.transcripts import synthesize_transcripts

cores = int(sys.argv[1])
n_convs = int(sys.argv[2])
mode = sys.argv[3] if len(sys.argv) > 3 else "fit"
topology = sys.argv[4] if len(sys.argv) > 4 else "local"
if topology == "local-cluster":
    # executor-isolated legs (r4 VERDICT item 3): N executors of
    # $SPARK_GRAFT_SCALING_EXEC_CORES cores each in SEPARATE JVMs with
    # their own heaps and GC — removes the shared-heap artifact the
    # single-JVM local[n] legs carry at the top sizes. cores argv is
    # the TOTAL core count; executors get an equal memory split.
    exec_cores = int(os.environ.get("SPARK_GRAFT_SCALING_EXEC_CORES", "4"))
    n_exec = max(1, cores // exec_cores)
    mem_mb = int(os.environ.get("SPARK_GRAFT_SCALING_EXEC_MEM_MB", "12288"))
    spark = get_spark(
        f"scaling_lc_{cores}",
        cores=cores,
        master=f"local-cluster[{n_exec},{exec_cores},{mem_mb}]",
        extra_conf={
            "spark.executor.memory": f"{mem_mb - 2048}m",
            "spark.driver.memory": os.environ.get(
                "SPARK_GRAFT_SCALING_DRIVER_MEM", "16g"
            ),
        },
        prewarm=False,
    )
else:
    spark = get_spark(f"scaling_{cores}", cores=cores)
t = synthesize_transcripts(spark, n_convs, seed=42).persist()
n_turns = t.count()
if mode == "transform":
    # serve topology: model fitted (untimed) on a small sample, the big
    # table transformed under the frozen model — zero per-generation
    # driver actions, so the measured section is pure parallel work
    sample = synthesize_transcripts(spark, 2000, seed=42)
    _, model = fit_transcript_features(sample, max_generations=4)
    spark.catalog.clearCache()
    t = t.persist()
    t.count()
    t0 = time.time()
    # noop write, NOT count(): count() lets column pruning eliminate the
    # (filter-free) window expressions and measures a bare row count
    transform_transcript_features(t, model).write.format("noop").mode(
        "overwrite"
    ).save()
else:
    t0 = time.time()
    feats = extract_transcript_features(t, max_generations=4)
    feats.count()
sec = time.time() - t0
print(json.dumps({"cores": cores, "turns": n_turns, "sec": round(sec, 3),
                  "turns_per_sec": round(n_turns / sec, 1), "mode": mode,
                  "topology": topology,
                  "load1_pre": round(os.getloadavg()[0], 2)}))
"""


def run(cores: int, n_convs: int, mode: str = "fit",
        topology: str = "local") -> dict:
    env = dict(os.environ, REPO=REPO)
    out = subprocess.run(
        [sys.executable, "-c", CHILD, str(cores), str(n_convs), mode,
         topology],
        capture_output=True, text=True, env=env, cwd=REPO, check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    n_convs = int(os.environ.get("SPARK_GRAFT_SCALING_CONVS", "25000"))
    mode = os.environ.get("SPARK_GRAFT_SCALING_MODE", "fit")
    lo_cores, hi_cores = (
        int(x) for x in os.environ.get("SPARK_GRAFT_SCALING_CORES", "8,32").split(",")
    )
    repeats = int(os.environ.get("SPARK_GRAFT_SCALING_REPEATS", "2"))
    topology = os.environ.get("SPARK_GRAFT_SCALING_TOPOLOGY", "local")
    # interleave and take the per-config minimum: this sandbox has noisy
    # co-tenants (observed 3-5x wall-clock swings on identical runs), and
    # min-of-N interleaved is robust to contention spikes
    lo_runs, hi_runs = [], []
    for _ in range(repeats):
        lo_runs.append(run(lo_cores, n_convs, mode, topology))
        hi_runs.append(run(hi_cores, n_convs, mode, topology))
    lo = min(lo_runs, key=lambda r: r["sec"])
    hi = min(hi_runs, key=lambda r: r["sec"])
    speedup = lo["sec"] / hi["sec"]
    eff = speedup / (hi_cores / lo_cores)
    result = {
        "mode": mode,
        "topology": topology,
        "n_convs": n_convs,
        "turns": hi["turns"],
        "lo": lo,
        "hi": hi,
        "speedup": round(speedup, 3),
        "scaling_efficiency": round(eff, 3),
    }
    print(json.dumps(result))
    # record the raw measurement; BENCH.md is maintained by hand and
    # references this file (earlier versions clobbered BENCH.md)
    log_path = os.path.join(REPO, "BENCH_SCALING.jsonl")
    with open(log_path, "a") as fh:
        fh.write(json.dumps(result) + "\n")


if __name__ == "__main__":
    main()
