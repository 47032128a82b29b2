"""Textbook-value checks for the round-9 statistical oracles.

The driver's correctness gate proves Spark == DuckDB on the same SQL —
it can NOT catch a formula bug both sides share. These tests run the
ORACLE SQL alone on hand-constructed micro-tables and compare against
values derived independently (standard formulas computed in plain
Python, or worked by hand). They run in DuckDB only — no Spark session.

This suite caught a real defect before it shipped: q348's first draft
oriented sx as sign(x_b - x_a) but sy as sign(ybar_a - ybar_b), which
swaps concordant/discordant and flips tau's sign identically on BOTH
engines (diffcheck green, statistic wrong).
"""

from __future__ import annotations

import math
import sys

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

from etl_jetro_spark.plans.queries import ORACLES  # noqa: E402


def _run(con: duckdb.DuckDBPyConnection, name: str) -> pd.DataFrame:
    return con.sql(ORACLES[name]).df()


def test_wilcoxon_signed_rank_matches_textbook_values():
    # five orders with (line1, line2) quantity pairs giving diffs
    # d = [1, 2, 3, -4, 5]: no ties, W+ = 1+2+3+5 = 11
    pairs = [(5, 4), (7, 5), (9, 6), (2, 6), (10, 5)]
    rows = []
    for ok, (q1, q2) in enumerate(pairs, start=1):
        rows.append((ok, 1, float(q1)))
        rows.append((ok, 2, float(q2)))
    li = pd.DataFrame(
        rows, columns=["l_orderkey", "l_linenumber", "l_quantity"]
    )
    con = duckdb.connect()
    con.register("lineitem", li)
    out = _run(con, "q346_wilcoxon_signed_rank").iloc[0]

    n, w_plus = 5, 11.0
    mean = n * (n + 1) / 4.0
    var = n * (n + 1) * (2 * n + 1) / 24.0  # tie term is 0 here
    z = (w_plus - mean) / math.sqrt(var)
    assert out["n_pairs"] == n
    assert out["w_plus"] == w_plus
    assert out["z"] == round(z, 4)
    assert out["effect_r"] == round(z / math.sqrt(n), 6)


def test_kendall_tau_b_matches_hand_worked_example():
    # cells (brand, size) -> mean retail price:
    #   (B1,1)=1.00  (B1,2)=3.00(x2 parts)  (B2,1)=3.00  (B2,3)=3.00
    # hand enumeration of the 6 pairs (x = size, y = mean price):
    #   (B1,1)-(B1,2): x up, y up            -> concordant
    #   (B1,1)-(B2,1): x tied, y differs     -> tie_x
    #   (B1,1)-(B2,3): x up, y up            -> concordant
    #   (B1,2)-(B2,1): x down, y tied        -> tie_y
    #   (B1,2)-(B2,3): x up, y tied          -> tie_y
    #   (B2,1)-(B2,3): x up, y tied          -> tie_y
    # tau_b = (2-0)/sqrt((6-1)*(6-3)) = 2/sqrt(15)
    part = pd.DataFrame(
        [
            (1, "B1", 1, 1.00),
            (2, "B1", 2, 3.00),
            (3, "B1", 2, 3.00),
            (4, "B2", 1, 3.00),
            (5, "B2", 3, 3.00),
        ],
        columns=["p_partkey", "p_brand", "p_size", "p_retailprice"],
    )
    con = duckdb.connect()
    con.register("part", part)
    out = _run(con, "q348_kendall_tau_parts").iloc[0]
    assert out["n_pairs"] == 6
    assert out["concordant"] == 2
    assert out["discordant"] == 0
    assert out["ties_x"] == 1
    assert out["ties_y"] == 3
    assert out["ties_both"] == 0
    assert out["tau_b"] == round(2 / math.sqrt(15), 6)


def test_brown_forsythe_matches_plain_python_formula():
    # three groups with obvious medians; F computed independently below
    groups = {
        "A": [1.0, 2.0, 3.0],
        "N": [10.0, 20.0, 30.0],
        "R": [100.0, 200.0, 300.0],
    }
    rows = [(f, x) for f, xs in groups.items() for x in xs]
    li = pd.DataFrame(rows, columns=["l_returnflag", "l_extendedprice"])
    con = duckdb.connect()
    con.register("lineitem", li)
    out = _run(con, "q347_brown_forsythe_variance")
    assert len(out) == 3

    # independent Brown-Forsythe on the raw dollars (F is scale-free,
    # so it must equal the oracle's half-cent computation exactly)
    import statistics

    z = {
        f: [abs(x - statistics.median(xs)) for x in xs]
        for f, xs in groups.items()
    }
    all_z = [v for vs in z.values() for v in vs]
    zbar = sum(all_z) / len(all_z)
    k, n = len(z), len(all_z)
    ssb = sum(
        len(vs) * (sum(vs) / len(vs) - zbar) ** 2 for vs in z.values()
    )
    ssw = sum(
        (v - sum(vs) / len(vs)) ** 2 for vs in z.values() for v in vs
    )
    f_expected = (ssb / (k - 1)) / (ssw / (n - k))
    for _, row in out.iterrows():
        assert row["bf_f"] == round(f_expected, 4)
        flag = row["l_returnflag"]
        med = statistics.median(groups[flag])
        assert row["median_cents_x2"] == round(med * 200)
        mean_dev = sum(z[flag]) / len(z[flag])
        # mean_absdev_cents is in cents (half-cent sum / 2n)
        assert row["mean_absdev_cents"] == round(mean_dev * 100, 4)


def test_lone_late_supplier_micro_case():
    # order 1: S1 late, S2 on time -> S1 gets credit
    # order 2: single-supplier late -> excluded (needs >= 2 suppliers)
    # order 3: S1 and S2 BOTH late -> excluded (late supplier not lone)
    t0 = pd.Timestamp("2000-01-01")
    late, ok = t0 + pd.Timedelta(days=100), t0 + pd.Timedelta(days=10)
    li = pd.DataFrame(
        [
            (1, 10, late), (1, 20, ok),
            (2, 10, late),
            (3, 10, late), (3, 20, late),
        ],
        columns=["l_orderkey", "l_suppkey", "l_shipdate"],
    )
    orders = pd.DataFrame(
        [(1, t0), (2, t0), (3, t0)],
        columns=["o_orderkey", "o_orderdate"],
    )
    supplier = pd.DataFrame(
        [(10, "Supplier#10"), (20, "Supplier#20")],
        columns=["s_suppkey", "s_name"],
    )
    con = duckdb.connect()
    con.register("lineitem", li)
    con.register("orders", orders)
    con.register("supplier", supplier)
    out = _run(con, "q349_lone_late_supplier")
    assert len(out) == 1
    assert out.iloc[0]["s_name"] == "Supplier#10"
    assert out.iloc[0]["numwait"] == 1
