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
from pathlib import Path

import duckdb
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from etl_jetro_spark.plans.queries import ORACLES  # noqa: E402


def _run(con: duckdb.DuckDBPyConnection, name: str) -> pd.DataFrame:
    return con.sql(ORACLES[name]).df()


def round_away(x: float, nd: int = 0) -> float:
    """Round half AWAY from zero, like DuckDB/Spark round() — Python's
    built-in round() banker-rounds exactly-representable half boundaries
    the other way (see test_cov_isotropy's 2.5/64 case). Used for every
    expected value so no assertion silently depends on the expectation
    not landing on a half boundary."""
    q = 10 ** nd
    v = math.floor(abs(x) * q + 0.5) / q * (1 if x >= 0 else -1)
    return int(v) if nd == 0 else v



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
    assert out["z"] == round_away(z, 4)
    assert out["effect_r"] == round_away(z / math.sqrt(n), 6)


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
    assert out["tau_b"] == round_away(2 / math.sqrt(15), 6)


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
        assert row["bf_f"] == round_away(f_expected, 4)
        flag = row["l_returnflag"]
        med = statistics.median(groups[flag])
        assert row["median_cents_x2"] == round_away(med * 200)
        mean_dev = sum(z[flag]) / len(z[flag])
        # mean_absdev_cents is in cents (half-cent sum / 2n)
        assert row["mean_absdev_cents"] == round_away(mean_dev * 100, 4)


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


# ---------------------------------------------------------------------------
# Retroactive audit of the OLDER statistical oracles (same rationale: a
# shared-formula bug passes the engine-parity gate by construction).
# Each expectation below is derived independently in plain Python from
# the standard definition, never by re-running the SQL's algebra.
# ---------------------------------------------------------------------------


def test_mann_whitney_orientation_and_value():
    # R quantities strictly above N: U1 must be maximal and z POSITIVE
    li = pd.DataFrame(
        [("R", 3.0), ("R", 4.0), ("N", 1.0), ("N", 2.0)],
        columns=["l_returnflag", "l_quantity"],
    )
    con = duckdb.connect()
    con.register("lineitem", li)
    out = _run(con, "q331_mann_whitney_u").iloc[0]
    n1 = n2 = 2
    r1 = 3 + 4  # ranks of the R group (values 3, 4 rank 3rd, 4th)
    u1 = r1 - n1 * (n1 + 1) / 2
    sigma = math.sqrt(n1 * n2 * (n1 + n2 + 1) / 12.0)  # no ties
    z = (u1 - n1 * n2 / 2.0) / sigma
    assert out["n1"] == n1 and out["n2"] == n2
    assert out["u1"] == u1
    assert out["z"] == round_away(z, 4) and out["z"] > 0
    assert out["effect_r"] == round_away(z / math.sqrt(n1 + n2), 6)


def test_kruskal_wallis_tie_corrected_value():
    groups = {"A": [1.0, 2.0], "N": [2.0, 3.0], "R": [3.0, 3.0]}
    li = pd.DataFrame(
        [(g, v) for g, vs in groups.items() for v in vs],
        columns=["l_returnflag", "l_quantity"],
    )
    con = duckdb.connect()
    con.register("lineitem", li)
    out = _run(con, "q337_kruskal_wallis_h").iloc[0]

    # independent tie-corrected H: average ranks over the pooled sample
    pooled = sorted(v for vs in groups.values() for v in vs)
    n = len(pooled)
    avg_rank = {
        v: sum(i + 1 for i, x in enumerate(pooled) if x == v)
        / pooled.count(v)
        for v in set(pooled)
    }
    rsum = {g: sum(avg_rank[v] for v in vs) for g, vs in groups.items()}
    h_raw = 12.0 / (n * (n + 1)) * sum(
        r * r / len(groups[g]) for g, r in rsum.items()
    ) - 3 * (n + 1)
    ties = sum(
        pooled.count(v) ** 3 - pooled.count(v) for v in set(pooled)
    )
    h = h_raw / (1 - ties / float(n**3 - n))
    k = len(groups)
    assert out["n_groups"] == k and out["n"] == n
    assert out["h"] == round_away(h, 4)
    assert out["epsilon_sq"] == round_away((h - k + 1) / (n - k), 6)


def test_spearman_perfect_monotone_is_one():
    # diversity ratio and n_chars increase together -> rho = +1
    docs = pd.DataFrame(
        [
            (1, "a a a a", 10),
            (2, "a b a b", 20),
            (3, "a b c d", 30),
        ],
        columns=["doc_id", "text", "n_chars"],
    )
    con = duckdb.connect()
    con.register("documents", docs)
    out = _run(con, "q314_length_diversity_spearman").iloc[0]
    assert out["n_docs"] == 3
    assert out["spearman_rho"] == 1.0


def test_ks_two_sample_statistic():
    # hi = {1, 3}, lo = {2, 4}: ECDF gap peaks at 0.5
    orders = pd.DataFrame(
        [
            (1.0, "1-URGENT"),
            (3.0, "2-HIGH"),
            (2.0, "5-LOW"),
            (4.0, "5-LOW"),
        ],
        columns=["o_totalprice", "o_orderpriority"],
    )
    con = duckdb.connect()
    con.register("orders", orders)
    out = _run(con, "q213_ks_test").iloc[0]
    assert out["n_high"] == 2 and out["n_low"] == 2
    assert out["ks_stat"] == 0.5
    crit = 1.36 * math.sqrt((2 + 2) / (2.0 * 2))
    assert out["critical_05"] == round_away(crit, 6)
    assert not out["reject_05"]


def test_ab_test_welch_z_orientation():
    import hashlib

    # find user ids that hash into each arm (oracle: first md5 hex digit
    # of 'ab:<uid>' even -> A, odd -> B)
    def arm(uid: int) -> str:
        d = hashlib.md5(f"ab:{uid}".encode()).hexdigest()[0]
        return "A" if int(d, 16) % 2 == 0 else "B"

    a_ids = [u for u in range(100) if arm(u) == "A"][:3]
    b_ids = [u for u in range(100) if arm(u) == "B"][:3]
    a_vals, b_vals = [1.0, 2.0, 3.0], [5.0, 6.0, 10.0]
    rows = [("click", v, u) for v, u in zip(a_vals, a_ids)] + [
        ("click", v, u) for v, u in zip(b_vals, b_ids)
    ]
    events = pd.DataFrame(rows, columns=["event_type", "value", "user_id"])
    con = duckdb.connect()
    con.register("events", events)
    out = _run(con, "q160_ab_test").iloc[0]

    def mean(xs):
        return sum(xs) / len(xs)

    def var_samp(xs):
        m = mean(xs)
        return sum((x - m) ** 2 for x in xs) / (len(xs) - 1)

    z = (mean(b_vals) - mean(a_vals)) / math.sqrt(
        var_samp(a_vals) / len(a_vals) + var_samp(b_vals) / len(b_vals)
    )
    assert out["n_a"] == 3 and out["n_b"] == 3
    assert out["diff"] == round_away(mean(b_vals) - mean(a_vals), 6)
    assert out["z"] == round_away(z, 6) and out["z"] > 0  # B above A => z > 0
    assert out["mean_a"] == round_away(mean(a_vals), 6)
    assert out["mean_b"] == round_away(mean(b_vals), 6)


def test_theil_sen_median_pairwise_slope():
    # one supplier, revenues 100/200/400 dollars in consecutive months:
    # slopes {100, 150, 200} $/month -> median 150
    t = [pd.Timestamp(f"2000-0{m}-15") for m in (1, 2, 3)]
    li = pd.DataFrame(
        [
            (7, t[0], 100.0, 0.0),
            (7, t[1], 200.0, 0.0),
            (7, t[2], 400.0, 0.0),
        ],
        columns=["l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"],
    )
    con = duckdb.connect()
    con.register("lineitem", li)
    out = _run(con, "q328_theil_sen_trend").iloc[0]
    assert out["l_suppkey"] == 7
    assert out["n_months"] == 3 and out["n_pairs"] == 3
    assert out["ts_slope"] == 150.0


def test_anova_f_pooled_over_dimensions():
    # 2 labels x 2 vectors x 2 dims; expectations via the standard
    # per-dimension one-way ANOVA sums, pooled across dimensions
    emb = pd.DataFrame(
        [
            ("a", [0.0, 0.0]),
            ("a", [2.0, 2.0]),
            ("b", [10.0, 0.0]),
            ("b", [12.0, 2.0]),
        ],
        columns=["label", "embedding"],
    )
    con = duckdb.connect()
    con.register("embeddings", emb)
    out = _run(con, "q320_label_anova_f").iloc[0]

    cols = {"a": [[0.0, 2.0], [0.0, 2.0]], "b": [[10.0, 12.0], [0.0, 2.0]]}
    ssb = ssw = 0.0
    for dim in range(2):
        allv = cols["a"][dim] + cols["b"][dim]
        grand = sum(allv) / len(allv)
        for lab in ("a", "b"):
            xs = cols[lab][dim]
            m = sum(xs) / len(xs)
            ssb += len(xs) * (m - grand) ** 2
            ssw += sum((x - m) ** 2 for x in xs)
    k, n_vecs, d = 2, 4, 2
    dfb, dfw = (k - 1) * d, (n_vecs - k) * d
    assert out["df_between"] == dfb and out["df_within"] == dfw
    assert out["ss_between"] == round_away(ssb, 4)
    assert out["ss_within"] == round_away(ssw, 4)
    assert out["f_stat"] == round_away((ssb / dfb) / (ssw / dfw), 6)


# ---------------------------------------------------------------------------
# Audit wave 2: inequality / causal-adjustment / resampling / information
# oracles. Same contract — expectations derived from the standard
# definitions in plain Python, never from the SQL's own algebra. Where a
# query embeds a deterministic sharding/binning rule (md5 buckets, rank
# deciles), the rule is replicated to BUILD the input partition, but the
# STATISTIC on top of it is computed independently.
# ---------------------------------------------------------------------------


def test_theil_decomposition_identity_and_values():
    # two nations; per-customer order totals chosen integer-cent exact
    orders = pd.DataFrame(
        [
            (1, 100, 10.0), (2, 101, 20.0),          # nation 0
            (3, 200, 10.0), (4, 201, 40.0), (5, 202, 10.0),  # nation 1
        ],
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
    )
    customer = pd.DataFrame(
        [(100, 0), (101, 0), (200, 1), (201, 1), (202, 1)],
        columns=["c_custkey", "c_nationkey"],
    )
    nation = pd.DataFrame(
        [(0, "N0"), (1, "N1")], columns=["n_nationkey", "n_name"]
    )
    con = duckdb.connect()
    con.register("orders", orders)
    con.register("customer", customer)
    con.register("nation", nation)
    out = _run(con, "q343_theil_decomposition").set_index("nation")

    # independent Theil on per-customer revenue in cents
    groups = {"N0": [1000, 2000], "N1": [1000, 4000, 1000]}
    allv = [v for vs in groups.values() for v in vs]
    n, x = len(allv), sum(allv)
    mu = x / n
    total_theil = sum((v / x) * math.log(v / mu) for v in allv)
    between = within = 0.0
    for name, vs in groups.items():
        ng, xg = len(vs), sum(vs)
        mug = xg / ng
        tg = sum((v / xg) * math.log(v / mug) for v in vs)
        share = xg / x
        assert out.loc[name]["rev_share"] == round_away(share, 6)
        assert out.loc[name]["theil_within"] == round_away(tg, 6)
        assert out.loc[name]["between_contrib"] == round_away(
            share * math.log(mug / mu), 6
        )
        assert out.loc[name]["within_contrib"] == round_away(share * tg, 6)
        between += share * math.log(mug / mu)
        within += share * tg
    # decomposition identity: T = T_between + T_within
    assert abs((between + within) - total_theil) < 1e-12


def test_cuped_theta_and_adjustment():
    # three users, one pre-half and one post-half event each
    t0, t1 = pd.Timestamp("2000-01-01"), pd.Timestamp("2000-01-02")
    pre = {1: 1.0, 2: 2.0, 3: 4.0}
    post = {1: 3.0, 2: 5.0, 3: 8.0}
    rows = [(u, v, t0) for u, v in pre.items()] + [
        (u, v, t1) for u, v in post.items()
    ]
    events = pd.DataFrame(rows, columns=["user_id", "value", "ts"])
    con = duckdb.connect()
    con.register("events", events)
    out = _run(con, "q161_cuped_adjustment").set_index("user_id")

    def mean(xs):
        return sum(xs) / len(xs)

    mp, mq = mean(list(pre.values())), mean(list(post.values()))
    cov = sum(
        (pre[u] - mp) * (post[u] - mq) for u in pre
    ) / (len(pre) - 1)
    var = sum((pre[u] - mp) ** 2 for u in pre) / (len(pre) - 1)
    theta = cov / var
    for u in pre:
        expected = post[u] - theta * (pre[u] - mp)
        assert out.loc[u]["post_cuped"] == round_away(expected, 6)


def test_jackknife_delete_one_group_se():
    import hashlib

    # replicate the query's md5 bucket rule to group, then compute the
    # delete-one-bucket jackknife independently
    orders = pd.DataFrame(
        [(k, float(10 * k)) for k in range(1, 41)],
        columns=["o_orderkey", "o_totalprice"],
    )
    con = duckdb.connect()
    con.register("orders", orders)
    out = _run(con, "q209_jackknife_ci").iloc[0]

    def bucket(k: int) -> int:
        return int(hashlib.md5(f"jk:{k}".encode()).hexdigest()[:8], 16) % 50

    from collections import defaultdict

    b = defaultdict(list)
    for k in range(1, 41):
        b[bucket(k)].append(10.0 * k)
    n = 40
    s = sum(v for vs in b.values() for v in vs)
    loo = [
        (s - sum(vs)) / (n - len(vs)) for vs in b.values()
    ]
    m_bar = sum(loo) / len(loo)
    ss = sum((m - m_bar) ** 2 for m in loo)
    se = math.sqrt((len(b) - 1.0) / len(b) * ss)
    assert out["n"] == n
    assert out["n_buckets"] == len(b)
    assert out["mean"] == round_away(s / n, 4)
    assert out["jackknife_se"] == round_away(se, 4)
    assert out["ci_lo"] == round_away(s / n - 1.96 * se, 4)
    assert out["ci_hi"] == round_away(s / n + 1.96 * se, 4)


def test_srm_chi2_equal_split():
    import hashlib

    def arm(uid: int) -> str:
        d = hashlib.md5(f"ab:{uid}".encode()).hexdigest()[0]
        return "A" if int(d, 16) % 2 == 0 else "B"

    a_ids = [u for u in range(200) if arm(u) == "A"][:12]
    b_ids = [u for u in range(200) if arm(u) == "B"][:3]
    rows = [("view", 1.0, u) for u in a_ids + b_ids]
    events = pd.DataFrame(rows, columns=["event_type", "value", "user_id"])
    con = duckdb.connect()
    con.register("events", events)
    out = _run(con, "q237_srm_check").iloc[0]
    na, nb = 12, 3
    chi2 = (na - nb) ** 2 / (na + nb)  # 81/15 = 5.4 > 3.841
    assert out["na"] == na and out["nb"] == nb
    assert out["chi2"] == round_away(chi2, 6)
    assert bool(out["srm_detected"]) is True


def test_categorical_mutual_information():
    # 2x2 contingency with known MI
    docs = []
    did = 0
    for lang, source, count in [
        ("en", "web", 4), ("en", "book", 1),
        ("fr", "web", 1), ("fr", "book", 4),
    ]:
        for _ in range(count):
            did += 1
            docs.append((did, lang, source))
    d = pd.DataFrame(docs, columns=["doc_id", "lang", "source"])
    con = duckdb.connect()
    con.register("documents", d)
    out = _run(con, "q192_categorical_mi").iloc[0]

    n = 10.0
    nij = {("en", "web"): 4, ("en", "book"): 1,
           ("fr", "web"): 1, ("fr", "book"): 4}
    ni = {"en": 5, "fr": 5}
    nj = {"web": 5, "book": 5}
    mi = sum(
        (c / n) * math.log(c * n / (ni[l] * nj[s]))
        for (l, s), c in nij.items()
    )
    h_l = -sum((c / n) * math.log(c / n) for c in ni.values())
    h_s = -sum((c / n) * math.log(c / n) for c in nj.values())
    assert out["n_docs"] == 10
    assert out["mi"] == round_away(mi, 6)
    assert out["h_lang"] == round_away(h_l, 6)
    assert out["h_source"] == round_away(h_s, 6)
    assert out["nmi"] == round_away(mi / math.sqrt(h_l * h_s), 6)


def test_woe_iv_decile_values():
    # 40 rows -> 10 bins of 4; alternate y so lower bins skew negative,
    # upper bins skew positive, no zero cells anywhere
    rows = []
    for i in range(40):
        y_pattern = [0, 0, 0, 1] if i < 20 else [0, 1, 1, 1]
        rows.append((float(i), y_pattern[i % 4]))
    pri = {1: "1-URGENT", 0: "5-LOW"}
    orders = pd.DataFrame(
        [(v, pri[y]) for v, y in rows],
        columns=["o_totalprice", "o_orderpriority"],
    )
    con = duckdb.connect()
    con.register("orders", orders)
    out = _run(con, "q222_woe_iv").set_index("bin")

    # replicate the decile rule (rank by (v, y), 10 equal bins), then
    # compute WOE/IV from the standard definition
    ranked = sorted(rows)
    tp = sum(y for _, y in rows)
    tn = len(rows) - tp
    for bin_i in range(10):
        cell = ranked[bin_i * 4 : (bin_i + 1) * 4]
        npos = sum(y for _, y in cell)
        nneg = len(cell) - npos
        woe = math.log((npos / tp) / (nneg / tn))
        iv = (npos / tp - nneg / tn) * woe
        assert out.loc[bin_i]["n_pos"] == npos
        assert out.loc[bin_i]["n_neg"] == nneg
        assert out.loc[bin_i]["woe"] == round_away(woe, 6)
        assert out.loc[bin_i]["iv_term"] == round_away(iv, 6)


def test_gini_sorted_formula():
    # revenues [1,2,3,4] in one nation: G = 2*30/(4*10) - 5/4 = 0.25
    orders = pd.DataFrame(
        [(k, 100 + k, float(k)) for k in range(1, 5)],
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
    )
    customer = pd.DataFrame(
        [(100 + k, 7) for k in range(1, 5)],
        columns=["c_custkey", "c_nationkey"],
    )
    con = duckdb.connect()
    con.register("orders", orders)
    con.register("customer", customer)
    out = _run(con, "q163_revenue_gini").iloc[0]
    assert out["nation"] == 7
    assert out["n_customers"] == 4
    assert out["gini"] == 0.25


def test_group_regression_matches_ols():
    # y = 3x + 5 exactly -> slope 3, intercept 5, r2 = 1
    li = pd.DataFrame(
        [("A", float(x), 3.0 * x + 5.0) for x in (1, 2, 3, 4)],
        columns=["l_returnflag", "l_quantity", "l_extendedprice"],
    )
    con = duckdb.connect()
    con.register("lineitem", li)
    out = _run(con, "q131_group_regression").iloc[0]
    assert out["n"] == 4
    assert out["slope"] == 3.0
    assert out["intercept"] == 5.0
    assert out["r2"] == 1.0


# ---------------------------------------------------------------------------
# Audit wave 3: time-series / robust-stats / drift oracles.
# ---------------------------------------------------------------------------


def test_autocorrelation_lag1_perfect_linear():
    # daily revenue 1,2,3,4 on consecutive days: lag-1 pairs are
    # ([1,2,3],[2,3,4]) -> corr exactly 1; lags 7/30 have no pairs
    orders = pd.DataFrame(
        [
            (k, pd.Timestamp("2000-01-01") + pd.Timedelta(days=k), float(k + 1))
            for k in range(4)
        ],
        columns=["o_orderkey", "o_orderdate", "o_totalprice"],
    )
    con = duckdb.connect()
    con.register("orders", orders)
    out = _run(con, "q212_autocorrelation")
    assert len(out) == 1  # only lag 1 has pairs
    row = out.iloc[0]
    assert row["lag_days"] == 1 and row["n_pairs"] == 3
    assert row["autocorr"] == 1.0


def test_distribution_drift_tvd():
    # one event type; first half values all in bin 0, second half split
    # between bins 0 and 9 -> TVD = 1/2 * (|1 - 0.5| + |0 - 0.5|) = 0.5
    t0, t1 = pd.Timestamp("2000-01-01"), pd.Timestamp("2000-01-02")
    rows = [
        ("click", 0.0, t0), ("click", 0.0, t0),
        ("click", 0.0, t1), ("click", 10.0, t1),
    ]
    events = pd.DataFrame(rows, columns=["event_type", "value", "ts"])
    con = duckdb.connect()
    con.register("events", events)
    out = _run(con, "q142_distribution_drift").iloc[0]
    assert out["tvd"] == 0.5


def test_mad_outlier_census():
    # values [1,2,3,4,100]: med 3, |d| = [2,1,0,1,97], MAD 1,
    # outliers (|d| > 3*MAD): only 100
    events = pd.DataFrame(
        [("buy", v) for v in (1.0, 2.0, 3.0, 4.0, 100.0)],
        columns=["event_type", "value"],
    )
    con = duckdb.connect()
    con.register("events", events)
    out = _run(con, "q122_mad_outliers").iloc[0]
    assert out["n"] == 5
    assert out["med"] == 3.0
    assert out["mad"] == 1.0
    assert out["n_outliers"] == 1


def test_group_zscore_values():
    docs = pd.DataFrame(
        [(1, "en", 10), (2, "en", 20), (3, "en", 30)],
        columns=["doc_id", "lang", "n_chars"],
    )
    con = duckdb.connect()
    con.register("documents", docs)
    out = _run(con, "q112_group_zscore").set_index("doc_id")
    mu, sigma = 20.0, 10.0  # stddev_samp of [10,20,30]
    for did, nc in [(1, 10), (2, 20), (3, 30)]:
        assert out.loc[did]["z"] == round_away((nc - mu) / sigma, 4)


def test_winsorized_mean_with_known_quantiles():
    # values 0..20: quantile_cont(.05) = 1.0, (.95) = 19.0;
    # clipped: {0 -> 1, 20 -> 19}; winsorized mean stays 10
    events = pd.DataFrame(
        [("buy", float(v)) for v in range(21)],
        columns=["event_type", "value"],
    )
    con = duckdb.connect()
    con.register("events", events)
    out = _run(con, "q133_winsorized_stats").iloc[0]
    assert out["n"] == 21
    assert out["n_clipped"] == 2
    assert out["raw_mean"] == 10.0
    assert out["winsor_mean"] == 10.0  # symmetric clip preserves mean


# ---------------------------------------------------------------------------
# Audit wave 4: graph metrics and embedding geometry.
# ---------------------------------------------------------------------------


def _basket(order: int, parts: list[int]) -> list[tuple[int, int]]:
    return [(order, p) for p in parts]


def test_triangle_count_on_known_graphs():
    # K3 on parts {1,2,3} (every pair co-occurs in TWO orders -> edges)
    # plus a 4-cycle on {11,12,13,14} (edges, no diagonal) -> 1 triangle
    rows = []
    rows += _basket(1, [1, 2, 3]) + _basket(2, [1, 2, 3])
    for o, (a, b) in enumerate(
        [(11, 12), (12, 13), (13, 14), (11, 14)], start=10
    ):
        rows += _basket(2 * o, [a, b]) + _basket(2 * o + 1, [a, b])
    li = pd.DataFrame(rows, columns=["l_orderkey", "l_partkey"])
    con = duckdb.connect()
    con.register("lineitem", li)
    out = _run(con, "q156_triangle_count").iloc[0]
    assert out["n_triangles"] == 1


def test_clustering_coefficient_triangle_nodes():
    rows = _basket(1, [1, 2, 3]) + _basket(2, [1, 2, 3])
    li = pd.DataFrame(rows, columns=["l_orderkey", "l_partkey"])
    con = duckdb.connect()
    con.register("lineitem", li)
    out = _run(con, "q158_clustering_coefficients").set_index("id")
    for p in (1, 2, 3):
        assert out.loc[p]["degree"] == 2
        assert out.loc[p]["n_triangles"] == 1
        assert out.loc[p]["coeff"] == 1.0


def test_degree_assortativity_star_is_minus_one():
    # star: center 10, leaves 11..13 (each co-purchase once -> edge)
    rows = []
    for o, leaf in enumerate([11, 12, 13], start=1):
        rows += _basket(o, [10, leaf])
    li = pd.DataFrame(rows, columns=["l_orderkey", "l_partkey"])
    con = duckdb.connect()
    con.register("lineitem", li)
    out = _run(con, "q220_degree_assortativity").iloc[0]
    assert out["n_edges"] == 3 and out["n_nodes"] == 4
    assert out["assortativity"] == -1.0


def test_silhouette_orthogonal_clusters():
    emb = pd.DataFrame(
        [
            ("a", [1.0, 0.0]), ("a", [0.0, 1.0]),
            ("b", [-1.0, 0.0]), ("b", [0.0, -1.0]),
        ],
        columns=["label", "embedding"],
    )
    emb.insert(0, "vec_id", range(1, 5))
    con = duckdb.connect()
    con.register("embeddings", emb)
    out = _run(con, "q295_label_silhouette").set_index("label")
    own = 1 / math.sqrt(2)  # cos([1,0],[.5,.5])
    for lab in ("a", "b"):
        assert out.loc[lab]["n_vecs"] == 2
        assert out.loc[lab]["avg_own_cos"] == round_away(own, 6)
        assert out.loc[lab]["avg_best_other_cos"] == round_away(-own, 6)
        assert out.loc[lab]["avg_margin"] == round_away(2 * own, 6)


def _iso_vectors():
    import numpy as np

    vecs = np.zeros((4, 64))
    vecs[0, 0], vecs[1, 0] = 2.0, -2.0
    vecs[2, 1], vecs[3, 1] = 1.0, -1.0
    return vecs


def test_cov_isotropy_two_active_dims():
    vecs = _iso_vectors()
    emb = pd.DataFrame(
        {"vec_id": range(1, 5), "embedding": [list(v) for v in vecs]}
    )
    con = duckdb.connect()
    con.register("embeddings", emb)
    out = _run(con, "q238_cov_isotropy").iloc[0]
    # population covariance: var(dim0)=2, var(dim1)=0.5, all else 0.
    # NB: 2.5/64 = 0.0390625 is an EXACTLY representable half-boundary:
    # Python's round() banker-rounds it to ...62 while DuckDB and Spark
    # both round half away from zero to ...63 (they agree with each
    # other — the parity gate is safe; only a naive python round() in a
    # test is not). Round half-away-from-zero here.
    assert out["trace"] == 2.5
    assert out["mean_variance"] == round_away(2.5 / 64, 6)
    assert out["offdiag_frobenius"] == 0.0
    assert out["offdiag_energy_frac"] == 0.0
    assert out["max_var_ratio"] == round_away(2.0 / (2.5 / 64), 6)


def test_top_principal_component_matches_numpy_power_iteration():
    import numpy as np

    vecs = _iso_vectors()
    emb = pd.DataFrame(
        {"vec_id": range(1, 5), "embedding": [list(v) for v in vecs]}
    )
    con = duckdb.connect()
    con.register("embeddings", emb)
    out = _run(con, "q228_top_principal_component")

    # replicate the DEFINED procedure (3 power steps from constant
    # 0.125 init) with numpy linear algebra instead of SQL joins
    cov = np.cov(vecs.T, bias=True)
    v = np.full(64, 0.125)
    for _ in range(2):
        w = cov @ v
        v = w / np.linalg.norm(w)
    w = cov @ v
    lam = np.linalg.norm(w)
    v = w / lam
    order = sorted(range(64), key=lambda i: (-abs(v[i]), i))[:5]
    assert list(out["dim"]) == [i + 1 for i in order]  # SQL dims 1-based
    for row, i in zip(out.itertuples(index=False), order):
        assert row.loading == round_away(v[i], 6)
        assert row.eigenvalue == round_away(lam, 6)
    # 3 power steps from the flat init approach (not reach) the true
    # top eigenvalue 2.0 — the contraction ratio here is 0.25/step
    assert abs(lam - 2.0) < 0.01


# ---------------------------------------------------------------------------
# Audit wave 5: experiment sizing, changepoint, Zipf fit, KMV sketch.
# ---------------------------------------------------------------------------


def test_ab_power_rule_of_16():
    events = pd.DataFrame(
        [("buy", 1.0), ("buy", 2.0), ("buy", 3.0)],
        columns=["event_type", "value"],
    )
    con = duckdb.connect()
    con.register("events", events)
    out = _run(con, "q233_ab_power_analysis").iloc[0]
    mean, var = 2.0, 1.0  # var_samp of [1,2,3]
    mde = 0.05 * mean
    n_per_arm = math.ceil(16.0 * var / (mde * mde))
    assert out["mean"] == mean and out["variance"] == var
    assert out["mde"] == round_away(mde, 6)
    assert out["n_per_arm"] == n_per_arm  # 1600
    assert bool(out["feasible_now"]) is (2 * n_per_arm <= 3)


def test_changepoint_step_series():
    # daily totals [1,1,1,10,10,10]: the SSE-optimal split is after
    # day 3 with full variance elimination
    rows = []
    for d, total in enumerate([1.0, 1.0, 1.0, 10.0, 10.0, 10.0]):
        rows.append(
            (d, pd.Timestamp("2000-01-01") + pd.Timedelta(days=d), total)
        )
    orders = pd.DataFrame(
        rows, columns=["o_orderkey", "o_orderdate", "o_totalprice"]
    )
    con = duckdb.connect()
    con.register("orders", orders)
    out = _run(con, "q232_changepoint_detection").iloc[0]
    assert str(out["split_day"])[:10] == "2000-01-03"
    assert out["n_days_left"] == 3 and out["n_days_right"] == 3
    assert out["mean_left"] == 1.0 and out["mean_right"] == 10.0
    assert out["variance_reduction"] == 1.0


def test_zipf_slope_ols_on_exact_power_law():
    # token counts 8,4,2,1 at ranks 1..4: y = ln c vs x = ln r; OLS
    # computed independently below
    text = " ".join(["a"] * 8 + ["b"] * 4 + ["c"] * 2 + ["d"])
    docs = pd.DataFrame(
        [(1, text, "en")], columns=["doc_id", "text", "lang"]
    )
    con = duckdb.connect()
    con.register("documents", docs)
    out = _run(con, "q258_zipf_slope").iloc[0]

    pts = [(math.log(r), math.log(c)) for r, c in
           [(1, 8), (2, 4), (3, 2), (4, 1)]]
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    sxx = sum(x * x for x, _ in pts)
    syy = sum(y * y for _, y in pts)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - sx * slope) / n
    r2 = (n * sxy - sx * sy) ** 2 / ((n * sxx - sx * sx) * (n * syy - sy * sy))
    assert out["lang"] == "en" and out["n_tokens"] == 4
    assert out["slope"] == round_away(slope, 4)
    assert out["intercept"] == round_away(intercept, 4)
    assert out["r2"] == round_away(r2, 4)
    assert out["slope"] < 0  # frequency falls with rank


def test_kmv_exact_when_under_k():
    # shingle sets smaller than k=32: the bottom-k union estimate
    # degenerates to the EXACT Jaccard.
    # S1: {a b c, b c d}; S2: {a b c, b c e} -> J = 1/3
    docs = pd.DataFrame(
        [
            (1, "a b c d", "S1"),
            (2, "a b c e", "S2"),
        ],
        columns=["doc_id", "text", "source"],
    )
    con = duckdb.connect()
    con.register("documents", docs)
    out = _run(con, "q119_kmv_source_jaccard").iloc[0]
    assert out["group_a"] == "S1" and out["group_b"] == "S2"
    assert out["n_union_k"] == 3
    assert out["est_jaccard"] == round_away(1 / 3, 6)


# ---------------------------------------------------------------------------
# Audit wave 6: entropy / divergence / concentration.
# ---------------------------------------------------------------------------


def test_token_entropy_known_distributions():
    docs = pd.DataFrame(
        [(1, "a a b b"), (2, "a b c d")], columns=["doc_id", "text"]
    )
    con = duckdb.connect()
    con.register("documents", docs)
    out = _run(con, "q134_token_entropy").set_index("doc_id")
    # H = ln N - (1/N) sum c ln c (nats)
    assert out.loc[1]["n_tokens"] == 4 and out.loc[1]["n_distinct"] == 2
    assert out.loc[1]["entropy"] == round_away(math.log(2), 6)
    assert out.loc[2]["entropy"] == round_away(math.log(4), 6)


def test_bigram_entropy_uniform():
    # "a b a b a": bigrams [a b, b a, a b, b a] -> 2 distinct, uniform
    docs = pd.DataFrame(
        [(1, "a b a b a", "S1")], columns=["doc_id", "text", "source"]
    )
    con = duckdb.connect()
    con.register("documents", docs)
    out = _run(con, "q251_bigram_entropy").iloc[0]
    assert out["n_bigrams"] == 4 and out["n_distinct"] == 2
    assert out["bigram_entropy"] == round_away(math.log(2), 6)


def test_supplier_hhi_classes():
    rows = []
    rows.append((1, 100, 10.0))                      # part 1: monopoly, h=1
    rows += [(2, 100, 5.0), (2, 101, 5.0)]           # part 2: duopoly, h=.5
    rows += [(3, 100 + s, 1.0) for s in range(10)]   # part 3: h=.1
    li = pd.DataFrame(rows, columns=["l_partkey", "l_suppkey", "l_quantity"])
    con = duckdb.connect()
    con.register("lineitem", li)
    out = _run(con, "q249_supplier_hhi").set_index("concentration")
    assert out.loc["concentrated"]["n_parts"] == 2
    assert out.loc["concentrated"]["avg_hhi"] == 0.75
    assert out.loc["competitive"]["n_parts"] == 1
    assert out.loc["competitive"]["avg_hhi"] == 0.1


def test_vocab_kl_js_with_laplace_smoothing():
    import hashlib

    def half(doc_id: int) -> int:
        return int(hashlib.md5(f"half:{doc_id}".encode()).hexdigest()[:8], 16) % 2

    a_ids = [d for d in range(1, 50) if half(d) == 0][:1]
    b_ids = [d for d in range(1, 50) if half(d) == 1][:1]
    docs = pd.DataFrame(
        [(a_ids[0], "x x y"), (b_ids[0], "x y y")],
        columns=["doc_id", "text"],
    )
    con = duckdb.connect()
    con.register("documents", docs)
    out = _run(con, "q177_vocab_kl_drift").iloc[0]

    ca, cb = {"x": 2, "y": 1}, {"x": 1, "y": 2}
    v, na, nb = 2, 3, 3
    p = {t: (ca[t] + 1) / (na + v) for t in ca}
    q = {t: (cb[t] + 1) / (nb + v) for t in cb}
    kl_ab = sum(p[t] * math.log(p[t] / q[t]) for t in p)
    kl_ba = sum(q[t] * math.log(q[t] / p[t]) for t in q)
    js = 0.5 * sum(
        p[t] * math.log(2 * p[t] / (p[t] + q[t])) for t in p
    ) + 0.5 * sum(q[t] * math.log(2 * q[t] / (p[t] + q[t])) for t in q)
    assert out["vocab"] == v
    assert out["tokens_a"] == na and out["tokens_b"] == nb
    assert out["kl_ab"] == round_away(kl_ab, 6)
    assert out["kl_ba"] == round_away(kl_ba, 6)
    assert out["js"] == round_away(js, 6)


# ---------------------------------------------------------------------------
# wave 7 (round 10): inference/decomposition oracles that had no
# first-principles micro-table derivation yet — chi2 independence,
# Pearson correlation shapes, Lorenz curve, perplexity, burstiness,
# weighted percentiles, power-law fit, centroid drift, positional entropy
# ---------------------------------------------------------------------------


def test_chi2_independence_2x2_contingency():
    # segments X/Y vs priorities P/Q, counts [[10,20],[20,10]]:
    # expected 15 each -> chi2 = 4 * 25/15 = 20/3, dof 1,
    # Cramer's V = sqrt(chi2 / N) = sqrt((20/3)/60) = 1/3
    orders = []
    for _ in range(10):
        orders.append((1, "P"))
    for _ in range(20):
        orders.append((1, "Q"))
    for _ in range(20):
        orders.append((2, "P"))
    for _ in range(10):
        orders.append((2, "Q"))
    o = pd.DataFrame(orders, columns=["o_custkey", "o_orderpriority"])
    c = pd.DataFrame(
        [(1, "X"), (2, "Y")], columns=["c_custkey", "c_mktsegment"]
    )
    con = duckdb.connect()
    con.register("orders", o)
    con.register("customer", c)
    out = _run(con, "q311_priority_segment_chi2").iloc[0]
    assert out["n"] == 60 and out["dof"] == 1
    assert out["chi2"] == round_away(20 / 3, 6)
    assert out["cramers_v"] == round_away(math.sqrt((20 / 3) / 60), 6)


def test_corr_matrix_hand_worked_pearson():
    # q=[1,2,3,4], p=2q (r=1), d=[1,2,4,3]: sample cov(q,d)=4/3,
    # var(q)=var(d)=5/3 -> r = 0.8
    li = pd.DataFrame(
        {
            "l_quantity": [1.0, 2.0, 3.0, 4.0],
            "l_extendedprice": [2.0, 4.0, 6.0, 8.0],
            "l_discount": [1.0, 2.0, 4.0, 3.0],
        }
    )
    con = duckdb.connect()
    con.register("lineitem", li)
    out = _run(con, "q103_corr_matrix").set_index(["col_a", "col_b"])
    assert out.loc[("l_quantity", "l_extendedprice")]["pearson_r"] == 1.0
    assert out.loc[("l_quantity", "l_discount")]["pearson_r"] == 0.8
    assert out.loc[("l_extendedprice", "l_discount")]["pearson_r"] == 0.8


def test_discount_quantity_corr_perfect_by_brand():
    # one brand, 100 lines alternating (d=0.0,q=1)/(d=0.1,q=2):
    # two-point scatter -> r = 1, avg_discount = 0.05
    rows = [(1, 0.0, 1.0) if i % 2 == 0 else (1, 0.1, 2.0) for i in range(100)]
    li = pd.DataFrame(rows, columns=["l_partkey", "l_discount", "l_quantity"])
    p = pd.DataFrame([(1, "Brand#1")], columns=["p_partkey", "p_brand"])
    con = duckdb.connect()
    con.register("lineitem", li)
    con.register("part", p)
    out = _run(con, "q247_discount_quantity_corr").iloc[0]
    assert out["brand"] == "Brand#1" and out["n_lines"] == 100
    assert out["avg_discount"] == 0.05
    assert out["disc_qty_corr"] == 1.0


def test_lorenz_curve_linear_deciles():
    # 10 customers with revenue 10..100: decile i holds customer i,
    # cum_share(i) = (sum of 1..i)*10 / 550
    o = pd.DataFrame(
        [(i, float(10 * i)) for i in range(1, 11)],
        columns=["o_custkey", "o_totalprice"],
    )
    con = duckdb.connect()
    con.register("orders", o)
    out = _run(con, "q313_revenue_lorenz_curve").set_index("decile")
    tot = sum(range(1, 11)) * 10
    for i in range(1, 11):
        assert out.loc[i]["n_cust"] == 1
        assert out.loc[i]["decile_revenue"] == 10.0 * i
        cum = sum(range(1, i + 1)) * 10
        assert out.loc[i]["cum_share"] == round_away(cum / tot, 6)


def test_doc_perplexity_laplace_unigram():
    # corpus: doc0 = 'a a a b', doc20 = 'b' -> lm: a:3 b:2, C=5, V=2
    docs = pd.DataFrame(
        [(0, "a a a b"), (20, "b")], columns=["doc_id", "text"]
    )
    con = duckdb.connect()
    con.register("documents", docs)
    out = _run(con, "q214_doc_perplexity").set_index("doc_id")
    h0 = (3 * math.log(7 / 4) + math.log(7 / 3)) / 4
    h20 = math.log(7 / 3)
    assert out.loc[0]["n_tokens"] == 4
    assert out.loc[0]["cross_entropy"] == round_away(h0, 6)
    assert out.loc[0]["perplexity"] == round_away(math.exp(h0), 4)
    assert out.loc[20]["n_tokens"] == 1
    assert out.loc[20]["cross_entropy"] == round_away(h20, 6)
    assert out.loc[20]["perplexity"] == round_away(math.exp(h20), 4)


def test_burstiness_fano_factor():
    # minute counts [1, 5]: mean 3, sample var 8, fano = 8/3 > 1.5
    ts0 = pd.Timestamp("2024-01-01 00:00:00")
    rows = [("a", ts0)] + [("a", ts0 + pd.Timedelta(minutes=1))] * 5
    ev = pd.DataFrame(rows, columns=["event_type", "ts"])
    con = duckdb.connect()
    con.register("events", ev)
    out = _run(con, "q216_burstiness").iloc[0]
    assert out["n_minutes"] == 2
    assert out["mean_per_min"] == 3.0
    assert out["fano_factor"] == round_away(8 / 3, 6)
    assert bool(out["bursty"])


def test_term_burstiness_cf_over_df():
    # 'x x x y' + 'x y': x cf=4 df=2 -> 2.0; y cf=2 df=2 -> 1.0
    docs = pd.DataFrame(
        [(1, "x x x y"), (2, "x y")], columns=["doc_id", "text"]
    )
    con = duckdb.connect()
    con.register("documents", docs)
    out = _run(con, "q325_term_burstiness").set_index("term")
    assert out.loc["x"]["cf"] == 4 and out.loc["x"]["df"] == 2
    assert out.loc["x"]["burstiness"] == 2.0
    assert out.loc["y"]["cf"] == 2 and out.loc["y"]["burstiness"] == 1.0


def test_weighted_percentiles_unit_weights():
    # flag A, v=1..4 with unit weights: wq25 -> 1, median -> 2, wq90 -> 4
    li = pd.DataFrame(
        [("A", float(v), 1.0, v, 1) for v in range(1, 5)],
        columns=[
            "l_returnflag",
            "l_quantity",
            "l_extendedprice",
            "l_orderkey",
            "l_linenumber",
        ],
    )
    con = duckdb.connect()
    con.register("lineitem", li)
    out = _run(con, "q155_weighted_percentiles").iloc[0]
    assert out["flag"] == "A"
    assert out["wq25"] == 1.0 and out["wmedian"] == 2.0 and out["wq90"] == 4.0


def test_length_power_law_exact_halving():
    # log2 buckets 0,1,2 with counts 8,4,2: y = ln 8 - x ln 2 exactly,
    # so slope = -ln2, intercept = ln8, r2 = 1
    n_chars = [1] * 8 + [2] * 4 + [4] * 2
    docs = pd.DataFrame({"n_chars": n_chars})
    con = duckdb.connect()
    con.register("documents", docs)
    out = _run(con, "q184_length_power_law").iloc[0]
    assert out["n_buckets"] == 3
    assert out["slope"] == round_away(-math.log(2), 6)
    assert out["intercept"] == round_away(math.log(8), 6)
    assert out["r2"] == 1.0


def test_centroid_drift_known_cosine():
    # label L: even half {(1,0),(0,1)} -> centroid (.5,.5); odd half
    # {(1,0),(1,0)} -> (1,0); cosine = .5 / (sqrt(.5)*1) = 1/sqrt(2)
    emb = pd.DataFrame(
        {
            "label": ["L"] * 4,
            "vec_id": [0, 2, 1, 3],
            "embedding": [[1.0, 0.0], [0.0, 1.0], [1.0, 0.0], [1.0, 0.0]],
        }
    )
    con = duckdb.connect()
    con.register("embeddings", emb)
    out = _run(con, "q276_embedding_centroid_drift").iloc[0]
    assert out["n_a"] == 2 and out["n_b"] == 2
    assert out["centroid_cosine"] == round_away(1 / math.sqrt(2), 6)


def test_text_embedding_norm_corr_proportional():
    # norms 5, 10, 2 with n_chars equal to the norm -> r = 1
    emb = pd.DataFrame(
        {
            "vec_id": [1, 2, 3],
            "embedding": [[3.0, 4.0], [6.0, 8.0], [0.0, 2.0]],
        }
    )
    docs = pd.DataFrame({"doc_id": [1, 2, 3], "n_chars": [5, 10, 2]})
    con = duckdb.connect()
    con.register("embeddings", emb)
    con.register("documents", docs)
    out = _run(con, "q322_text_embedding_norm_corr").iloc[0]
    assert out["n_vecs"] == 3
    assert out["avg_norm"] == round_away(17 / 3, 6)
    assert out["pearson_len_norm"] == 1.0


def test_positional_token_entropy_first_two_positions():
    # docs 'a b' / 'a c': pos1 all 'a' -> H=0; pos2 {b,c} -> H=ln2
    docs = pd.DataFrame([(1, "a b"), (2, "a c")], columns=["doc_id", "text"])
    con = duckdb.connect()
    con.register("documents", docs)
    out = _run(con, "q321_positional_token_entropy").set_index("position")
    assert out.loc[1]["n_docs_at_pos"] == 2 and out.loc[1]["n_types"] == 1
    assert out.loc[1]["entropy"] == 0.0
    assert out.loc[2]["n_docs_at_pos"] == 2 and out.loc[2]["n_types"] == 2
    assert out.loc[2]["entropy"] == round_away(math.log(2), 6)


# ---------------------------------------------------------------------------
# wave 8 (round 10): the new retrieval-fusion and dedup-state-TTL oracles,
# derived by hand on micro tables, plus the cross-query state-accounting
# invariant (q357's interval frame vs q358's closed form)
# ---------------------------------------------------------------------------


def _ttl_events() -> pd.DataFrame:
    # key A=(1,'click'): s = 0, 100, 800, 5000; key B=(2,'view'): s = 0
    rows = [
        (1, "click", 10, 0),
        (1, "click", 11, 100),
        (1, "click", 12, 800),
        (1, "click", 13, 5000),
        (2, "view", 20, 0),
    ]
    df = pd.DataFrame(rows, columns=["user_id", "event_type", "event_id", "s"])
    df["ts"] = pd.to_datetime(df.pop("s"), unit="s")
    return df


def test_ttl_hit_rates_micro():
    con = duckdb.connect()
    con.register("events", _ttl_events())
    out = _run(con, "q356_dedup_ttl_hit_rates").set_index("ttl_s")
    # gaps: A -> [null, 100, 700, 4200], B -> [null]
    assert out.loc[60]["n_dup_hits"] == 0
    assert out.loc[600]["n_dup_hits"] == 1   # gap 100
    assert out.loc[3600]["n_dup_hits"] == 2  # gaps 100, 700
    for ttl, hits in ((60, 0), (600, 1), (3600, 2)):
        assert out.loc[ttl]["n_events"] == 5
        assert out.loc[ttl]["hit_rate"] == round_away(hits / 5, 6)


def test_ttl_state_peak_micro():
    con = duckdb.connect()
    con.register("events", _ttl_events())
    out = _run(con, "q357_dedup_state_peak").iloc[0]
    # TTL=600 merged intervals: A [0,700) [800,1400) [5000,5600), B [0,600)
    assert out["n_keys"] == 2
    assert out["n_admissions"] == 4
    assert out["state_seconds"] == 700 + 600 + 600 + 600
    assert out["peak_live_state"] == 2  # A and B both live in [0,600)


def test_ttl_eviction_scaling_micro_and_invariant():
    con = duckdb.connect()
    con.register("events", _ttl_events())
    out = _run(con, "q358_ttl_eviction_scaling").set_index("ttl_s")
    assert out.loc[60]["n_admissions"] == 5
    assert out.loc[60]["state_seconds"] == 5 * 60
    assert out.loc[600]["n_admissions"] == 4
    assert out.loc[600]["state_seconds"] == 2500
    assert out.loc[3600]["n_admissions"] == 3
    assert out.loc[3600]["state_seconds"] == 3600 + 100 + 700 + 3600 + 3600
    # closed form must agree with q357's explicit interval frame at 600 s
    peak = _run(con, "q357_dedup_state_peak").iloc[0]
    assert out.loc[600]["state_seconds"] == peak["state_seconds"]
    assert out.loc[600]["n_admissions"] == peak["n_admissions"]


def _pad(front: list[float], back: list[float]) -> list[float]:
    # 34-dim vector: dims 1-2 = front, dims 33-34 = back, zeros between
    return front + [0.0] * 30 + back


def test_rrf_fusion_hand_worked():
    # probe v0 (m = max(5, ceil(4/25)) = 5 -> only vec_id 0 probes).
    # front cosines vs v0: v1=1, v3=1/sqrt(2), v2=0 -> ra = 1,3,2...
    # back cosines: v2=1, v3=1/sqrt(2), v1=0 -> rb: v2=1, v3=2, v1=3.
    emb = pd.DataFrame(
        {
            "vec_id": [0, 1, 2, 3],
            "embedding": [
                _pad([1.0, 0.0], [1.0, 0.0]),
                _pad([1.0, 0.0], [0.0, 1.0]),
                _pad([0.0, 1.0], [1.0, 0.0]),
                _pad([1.0, 1.0], [1.0, 1.0]),
            ],
        }
    )
    con = duckdb.connect()
    con.register("embeddings", emb)
    out = _run(con, "q350_rrf_rank_fusion").iloc[0]
    assert out["qid"] == 0
    assert out["top1_a"] == 1 and out["top1_b"] == 2
    # rrf(v1) = 1/61 + 1/63 == rrf(v2) exactly (commutative float add);
    # the cid tiebreak picks v1, which ranked 1 in A and 3 in B
    assert out["top1_fused"] == 1
    assert out["fused_rank_in_a"] == 1 and out["fused_rank_in_b"] == 3


def test_centroid_confusion_micro():
    # label 0: {(1,0),(1,0)} -> centroid (1,0); label 1: {(0,1),(1,0)}
    # -> centroid (.5,.5). Predictions: (1,0)->0 (cos 1 vs .707),
    # (0,1)->1 (cos 0 vs .707) => confusion (0,0,2),(1,0,1),(1,1,1)
    emb = pd.DataFrame(
        {
            "vec_id": [0, 1, 2, 3],
            "label": [0, 0, 1, 1],
            "embedding": [[1.0, 0.0], [1.0, 0.0], [0.0, 1.0], [1.0, 0.0]],
        }
    )
    con = duckdb.connect()
    con.register("embeddings", emb)
    out = _run(con, "q360_label_centroid_confusion")
    got = {(r.true_label, r.pred_label): r.n for r in out.itertuples()}
    assert got == {(0, 0): 2, (1, 1): 1, (1, 0): 1}


def test_lang_mix_entropy_micro():
    # one source, 4 docs in langs {en:2, de:1, fr:1}: p = (1/2,1/4,1/4),
    # H = -(0.5 ln 0.5 + 2 * 0.25 ln 0.25) = 0.5 ln 2 + 0.5 ln 4
    #   = 1.5 ln 2 = 1.0397207708399179...; dominant en, share 0.5.
    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": ["a", "b", "c", "d"],
            "lang": ["en", "en", "de", "fr"],
            "source": ["s0"] * 4,
            "n_chars": [1] * 4,
        }
    )
    con = duckdb.connect()
    con.register("documents", docs)
    out = _run(con, "q390_source_lang_mix_entropy").iloc[0]
    assert out["n_docs"] == 4 and out["n_langs"] == 3
    assert out["dominant_lang"] == "en"
    assert out["dominant_share"] == 0.5
    assert out["lang_entropy"] == round_away(1.5 * math.log(2), 6)


def test_lang_mix_entropy_dominant_tiebreak():
    # exact tie {de:1, en:1}: the (count DESC, lang ASC) rank must pick
    # 'de' — an integer rank key, deterministic on both engines
    docs = pd.DataFrame(
        {
            "doc_id": [0, 1],
            "text": ["a", "b"],
            "lang": ["en", "de"],
            "source": ["s0", "s0"],
            "n_chars": [1, 1],
        }
    )
    con = duckdb.connect()
    con.register("documents", docs)
    out = _run(con, "q390_source_lang_mix_entropy").iloc[0]
    assert out["dominant_lang"] == "de"
    assert out["lang_entropy"] == round_away(math.log(2), 6)


def test_backfill_depth_micro():
    # hand-placed events: day boundaries at multiples of 86_400 s.
    # u3 (user_id=3): +48h delay -> depth 2 always.
    # u4 (user_id=4): +6h delay -> event at 23:00 crosses midnight
    # (depth 1), event at 01:00 stays same-day (depth 0).
    # u0: on time -> depth 0.
    base = 1_700_000_000_000_000  # us epoch, not day-aligned
    day = 86_400_000_000
    ts0 = (base // day) * day  # midnight
    events = pd.DataFrame(
        {
            "event_id": [0, 1, 2, 3],
            "ts": pd.to_datetime(
                [ts0 + 3_600_000_000,          # u0 01:00, depth 0
                 ts0 + 23 * 3_600_000_000,     # u4 23:00 +6h -> depth 1
                 ts0 + 3_600_000_000,          # u4 01:00 +6h -> depth 0
                 ts0 + 3_600_000_000],         # u3 +48h -> depth 2
                unit="us",
            ),
            "user_id": [0, 4, 24, 3],
            "event_type": ["view"] * 4,
            "value": [1.0, 1.0, 1.0, 1.0],
            "props": ["{}"] * 4,
        }
    )
    con = duckdb.connect()
    con.register("events", events)
    out = _run(con, "q400_backfill_depth_histogram")
    got = {r.backfill_days: r.n_events for r in out.itertuples()}
    assert got == {0: 2, 1: 1, 2: 1}
