#!/usr/bin/env python
"""Targeted bench: time named queries (short ids) with the noop sink,
min-of-N (default 2), same methodology as bench.py but only the asked
subset — for before/after A-B during optimization work. Does NOT touch
the BENCH_LOCAL.json sidecar.

Usage: python tools/tbench.py q300 q326 [--n 3] [--sf DIR]
"""
from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:]]
    n = 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if "--n" in args:
        i = args.index("--n")
        n = int(args[i + 1])
        del args[i : i + 2]
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i : i + 2]
    wanted = args

    from etl_jetro_spark.plans.queries import QUERIES
    from etl_jetro_spark.session import get_spark

    spark = get_spark(app_name="tbench")
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    name_of = {q.split("_", 1)[0]: q for q in QUERIES}
    total = 0.0
    for short in wanted:
        name = name_of[short]
        fn = QUERIES[name]
        runs = []
        for _ in range(n):
            spark.sparkContext.setJobDescription(name)
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 2))
        best = min(runs)
        total += best
        print(f"{short}\t{best}\t{runs}", flush=True)
        # free lazy localCheckpoint blocks before the next query: the
        # Python refs gate the JVM-side ContextCleaner (same hygiene
        # as bench.py)
        gc.collect()
    print(f"TOTAL\t{round(total, 2)}", flush=True)


if __name__ == "__main__":
    main()
