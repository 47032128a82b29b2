#!/usr/bin/env python
"""Benchmark harness: run every declared query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Results are materialized with the noop sink (full computation, no
collect/transfer cost) — the number measures the engine, not the driver.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from etl_jetro_spark.plans.queries import QUERIES
    from etl_jetro_spark.session import get_spark

    spark = get_spark(app_name="etl-jetro-bench")

    # warm the JVM/codegen path once on the smallest table
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    # Short keys ("q1", not "q1_pricing_summary"): the stdout line must stay
    # small enough to survive tail-truncating capture pipelines (the r02
    # artifact lost the line's head once 107 long names pushed it past the
    # driver's buffer). The full-name map lives in the sidecar only.
    timings: dict[str, float] = {}
    for name, fn in QUERIES.items():
        short = name.split("_", 1)[0]
        t0 = time.perf_counter()
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            # 2 dp: keeps the one-line JSON under tail-capture buffers
            timings[short] = round(time.perf_counter() - t0, 2)
        except Exception as e:  # keep benching; a failure shows as null
            print(f"bench: {name} failed: {e}", file=sys.stderr)
            timings[short] = None

    total = round(sum(v for v in timings.values() if v is not None), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    payload = json.dumps(
        {
            "metric": "total_query_wall_sec",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        }
    )
    # Sidecar first: the stdout line is the contract, but a capture pipeline
    # that truncates or interleaves stdout can still recover the full JSON.
    sidecar = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_LOCAL.json")
    try:
        with open(sidecar, "w") as fh:
            fh.write(payload + "\n")
        keymap = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "BENCH_KEYS.json"
        )
        with open(keymap, "w") as fh:
            fh.write(
                json.dumps({n.split("_", 1)[0]: n for n in QUERIES}) + "\n"
            )
    except OSError as e:
        print(f"bench: sidecar write failed: {e}", file=sys.stderr)
    sys.stdout.flush()
    print(payload, flush=True)


if __name__ == "__main__":
    main()
