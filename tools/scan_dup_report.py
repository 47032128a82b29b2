#!/usr/bin/env python
"""Driver-only plan audit: for every declared query, count how many times
each parquet table (and each ExistingRDD/localCheckpoint) appears as a scan
in the FORMATTED physical plan — a repeated scan of the same file is either
a legitimate self-join or a missing barrier re-computing a shared subtree
(the q326/q328 class found in r11). No jobs are executed; explain() is
driver-side.

Usage: python tools/scan_dup_report.py [qshort ...]   (default: all)
Output: one line per query with any table scanned more than once:
  q328  lineitem=3  rdd=0
"""
import io
import contextlib
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from etl_jetro_spark.plans.queries import QUERIES
    from etl_jetro_spark.session import get_spark

    spark = get_spark(app_name="scan-dup-report")
    wanted = set(sys.argv[1:])
    name_of = {n.split("_", 1)[0]: n for n in QUERIES}
    for short, name in name_of.items():
        if wanted and short not in wanted:
            continue
        try:
            df = QUERIES[name](spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as e:  # noqa: BLE001 - report and continue
            print(f"{short}\tERROR\t{e}", flush=True)
            continue
        tables = re.findall(r"Scan parquet[^\n]*?(\w+)\.parquet", plan)
        counts: dict[str, int] = {}
        for t in tables:
            counts[t] = counts.get(t, 0) + 1
        rdd = len(re.findall(r"Scan ExistingRDD", plan))
        dups = {t: c for t, c in counts.items() if c > 1}
        if dups or rdd > 4:
            body = "  ".join(f"{t}={c}" for t, c in sorted(dups.items()))
            print(f"{short}\t{body}  rdd={rdd}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
