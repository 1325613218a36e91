#!/usr/bin/env python
"""Per-query isolation bench + plan capture (guide §1.1/§1.4).

NOT the frozen driver bench (bench.py is untouched): this harness times
individual declared queries with the noop sink, min-of-N, and can dump
`.explain("formatted")` to plans/r06/<query>_{before,after}.txt.

Usage:
  python bench_extra.py time  <sf_dir> <reps> <query> [query ...]
  python bench_extra.py plan  <sf_dir> <tag>  <query> [query ...]
      tag = before|after -> plans/r06/<query>_<tag>.txt

Output of `time`: one JSON line per query with runs + min + load1.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    mode, sf_dir = sys.argv[1], sys.argv[2]
    from graphrole_spark.session import get_spark

    spark = get_spark("graphrole_spark_bench_extra", cores=CPUS)
    import __spark_entry__ as entrymod

    queries = entrymod.queries()

    if mode == "plan":
        tag = sys.argv[3]
        names = sys.argv[4:]
        os.makedirs("plans/r06", exist_ok=True)
        for name in names:
            df = queries[name](spark, sf_dir)
            mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
            txt = df._jdf.queryExecution().explainString(mode)
            path = f"plans/r06/{name}_{tag}.txt"
            with open(path, "w") as fh:
                fh.write(txt)
            print(f"wrote {path} ({len(txt)} bytes)")
        return

    reps = int(sys.argv[3])
    names = sys.argv[4:]
    for name in names:
        runs = []
        loads = []
        for _ in range(reps):
            spark.catalog.clearCache()
            loads.append(round(os.getloadavg()[0], 2))
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            queries[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        print(
            json.dumps(
                {
                    "query": name,
                    "sf_dir": sf_dir,
                    "min": min(runs),
                    "runs": runs,
                    "load1": loads,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
