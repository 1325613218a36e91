#!/usr/bin/env python
"""Scale sweep for the graph layer (pagerank, triangle_counts, LPA,
k-core):
deterministic skewed synthetic graphs at growing edge counts, timings
appended to BENCH_GRAPH_SCALE.jsonl.

Graph: spark.range(m) edges with md5-uniform endpoints; dst is drawn
as floor(n·u²) so high-id nodes are rare and low-id nodes are hubs —
a heavy-tailed degree distribution that exercises the orientation
bound (triangles) and the co-partitioned join (pagerank) the way a
real power-law graph would.

Usage: SPARK_GRAFT_GRAPH_EDGES=100000,1000000 python scripts/graph_scale.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def synth_edges(spark, m: int):
    n = max(m // 10, 100)  # ~10 edges/node
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

    return base.select(
        F.floor(u("s") * n).cast("string").alias("src"),
        F.floor(F.pow(u("d"), 2.0) * n).cast("string").alias("dst"),
        F.lit(1.0).alias("weight"),
    ).where(F.col("src") != F.col("dst"))


def main() -> None:
    from graphrole_spark.operators.communities import label_propagation
    from graphrole_spark.operators.kcore import core_numbers
    from graphrole_spark.operators.pagerank import pagerank
    from graphrole_spark.operators.triangles import triangle_counts
    from graphrole_spark.session import get_spark

    sizes = [
        int(x)
        for x in os.environ.get(
            "SPARK_GRAFT_GRAPH_EDGES", "100000,1000000,10000000"
        ).split(",")
    ]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("graph_scale", cores=cpus)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    log = os.path.join(repo, "BENCH_GRAPH_SCALE.jsonl")
    lpa_halfsteps = int(os.environ.get("SPARK_GRAFT_LPA_ITERS", "4"))
    for m in sizes:
        pre_load = os.getloadavg()[0]
        edges = synth_edges(spark, m).persist()
        n_edges = edges.count()
        t0 = time.time()
        pr_iters: list = []
        pr = pagerank(edges, n_iter=8, iter_stats=pr_iters)
        n_nodes = pr.count()
        pr_sec = round(time.time() - t0, 2)
        t0 = time.time()
        tri = triangle_counts(edges)
        tri_total = tri.agg(F.sum("triangles")).collect()[0][0]
        tri_sec = round(time.time() - t0, 2)
        t0 = time.time()
        lpa_iters: list = []
        lpa = label_propagation(
            edges, n_iter=lpa_halfsteps, iter_stats=lpa_iters
        )
        n_comm = lpa.agg(F.countDistinct("community")).collect()[0][0]
        lpa_sec = round(time.time() - t0, 2)
        t0 = time.time()
        kc_iters: list = []
        # bounded-round probe: the sweep's metric is the PER-ITERATION
        # wall at each decade (flat = the round cost scales), not the
        # fixpoint itself — this synthetic u^2-tail graph has long
        # low-degree tendrils, so full H-index convergence needs
        # O(diameter) ~ 100 rounds (the operator warns, by design;
        # exactness is pinned by the networkx-parity pytest and the
        # driver's kcore invariant oracle on converged runs).
        kc_rounds = int(os.environ.get("SPARK_GRAFT_KCORE_ROUNDS", "12"))
        import warnings as _warnings
        with _warnings.catch_warnings():
            _warnings.simplefilter("ignore", RuntimeWarning)
            kc = core_numbers(edges, iter_stats=kc_iters,
                              max_iter=kc_rounds)
            kc_max = kc.agg(F.max("core_number")).collect()[0][0]
        kc_sec = round(time.time() - t0, 2)
        kc_converged = bool(kc_iters) and not kc_iters[-1]["changed"]
        row = {
            "edges": n_edges,
            "nodes": n_nodes,
            "pagerank_iters": 8,
            "pagerank_sec": pr_sec,
            "pagerank_iter_sec": [s["sec"] for s in pr_iters],
            "triangles_sum": int(tri_total or 0),
            "triangles_sec": tri_sec,
            "lpa_halfsteps": lpa_halfsteps,
            "lpa_sec": lpa_sec,
            "lpa_iter_sec": [s["sec"] for s in lpa_iters],
            "lpa_communities": int(n_comm or 0),
            "kcore_sec": kc_sec,
            "kcore_rounds": len(kc_iters),
            "kcore_converged": kc_converged,
            "kcore_iter_sec": [x["sec"] for x in kc_iters],
            "kcore_max": int(kc_max or 0),
            "cpus": cpus,
            "load1_pre": round(pre_load, 1),
            "load1": round(os.getloadavg()[0], 1),
        }
        print(json.dumps(row), flush=True)
        with open(log, "a") as fh:
            fh.write(json.dumps(row) + "\n")
        edges.unpersist()
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
