#!/usr/bin/env python
"""Capture .explain('formatted') for the named queries into
plans/r12/<short>_<when>.txt — the round-11 optimization evidence trail.

Usage: python tools/capture_plans_r12.py before q137 q146 ...
"""
import io
import contextlib
import os
import sys

sys.path.insert(0, "/root/repo")

def main():
    when = sys.argv[1]
    wanted = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from etl_jetro_spark.plans.queries import QUERIES
    from etl_jetro_spark.session import get_spark
    spark = get_spark(app_name="plan-capture-r12")
    name_of = {n.split("_", 1)[0]: n for n in QUERIES}
    for short in wanted:
        name = name_of.get(short, short)
        fn = QUERIES.get(name)
        if fn is None:
            print(f"skip {short}: not found", file=sys.stderr)
            continue
        df = fn(spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        out = f"/root/repo/plans/r12/{short}_{when}.txt"
        with open(out, "w") as fh:
            fh.write(f"# {name} @ {sf_dir} — {when}\n")
            fh.write(buf.getvalue())
        print(f"wrote {out}")

if __name__ == "__main__":
    main()
