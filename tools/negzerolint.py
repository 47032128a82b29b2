#!/usr/bin/env python
"""negzerolint — latent sign-of-zero audit over the declared query surface.

The round-10 corpus family surfaced a cross-engine class the
differential gate only sees AFTER it bites: a mathematically-zero
statistic folds to +/-1e-13 with an ENGINE-DEPENDENT sign, and
round(x, 6) then yields -0.0 on one engine and 0.0 on the other —
which hash/sort-compare as different rows (fixed for the family by
`+ 0.0` normalization; tools/diffcheck.py's canonicalizers now also
normalize). This lint finds queries one ulp away from that flip
ANYWHERE in the catalog: it runs each side alone and flags any float
cell that is negative zero — a -0.0 in EITHER engine's output means
the value's sign is fold-order luck and the other engine may disagree
at a different scale factor.

Usage:
    python tools/negzerolint.py [--sf DIR] [--side duck|spark|both] [names...]

Defaults: sf0.01, both sides, every query. The 9 sf3-infeasible
oracles (quadratic vector-pair mirrors, spill-bound graph oracles —
see SCALE.md) are skipped automatically when --sf points at a
scratch sf3 dir; pass names explicitly to force them.

Exit code: min(offending (engine, query, column) triples + erroring
queries, 120) — 0 means fully clean. An engine-side exception counts as
ONE unit (the query is loudly broken, not lint-clean) and is reported
separately in the summary line; the 120 cap keeps the value inside the
POSIX 8-bit exit range with headroom below the shell's reserved 126+.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

# DuckDB mirrors that are O(n^2 d) by construction or spill-bound at 30x
# (SCALE.md "Round-10: the 30x oracle sweep COMPLETE" tally).
SF3_INFEASIBLE = {
    "q39", "q124", "q312", "q335", "q338", "q339",  # quadratic oracles
    "q158", "q178", "q236",  # basket-graph oracles: single-node spill
}


def _neg_zero_cols(df: pd.DataFrame) -> list[tuple[str, int]]:
    out = []
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_float_dtype(s):
            v = s.to_numpy(dtype="float64", na_value=np.nan)
            nz = np.signbit(v) & (v == 0.0)
            if nz.any():
                out.append((c, int(nz.sum())))
    return out


def main() -> int:
    argv = sys.argv[1:]
    sf = "/root/testdata/sf0.01"
    if "--sf" in argv:
        i = argv.index("--sf")
        sf = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    side = "both"
    if "--side" in argv:
        i = argv.index("--side")
        side = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    names = [a for a in argv if not a.startswith("--")]

    from etl_jetro_spark.plans.queries import ORACLES, QUERIES

    run = names or [
        n for n in QUERIES
        if "sf3" not in sf or n.split("_")[0] not in SF3_INFEASIBLE
    ]

    con = None
    if side in ("duck", "both"):
        import duckdb

        con = duckdb.connect()
        for t in TABLES:
            p = f"{sf}/{t}.parquet"
            if os.path.isdir(p):
                p = f"{p}/*.parquet"
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    spark = None
    if side in ("spark", "both"):
        from etl_jetro_spark.session import get_spark

        spark = get_spark(app_name="negzerolint", shuffle_partitions=8)

    hits = 0
    errs = 0
    for name in run:
        frames = []
        try:
            if con is not None and name in ORACLES:
                frames.append(("duck", con.sql(ORACLES[name]).df()))
            if spark is not None:
                frames.append(("spark", QUERIES[name](spark, sf).toPandas()))
        except Exception as e:  # an erroring side is its own (loud) problem
            print(f"ERR  {name}: {str(e)[:90]}", flush=True)
            errs += 1
            continue
        bad = [(eng, c, n) for eng, df in frames for c, n in _neg_zero_cols(df)]
        for eng, c, n in bad:
            print(f"HIT  {name} [{eng}] {c}: {n} negative-zero cells", flush=True)
        hits += len(bad)
        if not bad:
            print(f"ok   {name}", flush=True)
    print(
        f"== {hits} offending columns, {errs} errors "
        f"across {len(run)} queries =="
    )
    return min(hits + errs, 120)


if __name__ == "__main__":
    raise SystemExit(main())
