"""Textbook-value checks for the evaluation & calibration family
(operators/evalstats.py + queries q361/q363/q364 and the later wave).

Same discipline as tests/test_stat_oracles.py: the driver's gate proves
Spark == DuckDB; these tests run the ORACLE SQL (or the shared SQL
builders) alone on hand-constructed micro-tables against values derived
independently in plain Python, so a formula bug shared by both engines
cannot ship green."""

from __future__ import annotations

import math
import sys
from pathlib import Path

import duckdb
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from etl_jetro_spark.operators.evalstats import (  # noqa: E402
    brier_decomposition_sql,
    two_sided_p_sql,
)
from etl_jetro_spark.plans.queries import ORACLES  # noqa: E402


def test_brier_decomposition_textbook():
    # 8 forecasts in two bins (0.1x and 0.7x), hand-worked Murphy terms.
    rows = [
        (100_000, 0),  # bin 1 (p=0.1): outcomes 0,0,0,1
        (100_000, 0),
        (120_000, 0),
        (140_000, 1),
        (700_000, 1),  # bin 7 (p=0.7): outcomes 1,1,0,1
        (720_000, 1),
        (700_000, 0),
        (740_000, 1),
    ]
    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows, columns=["p6", "y"]))
    out = con.sql(
        brier_decomposition_sql("SELECT p6, y FROM t")
    ).df().iloc[0]

    ps = [r[0] / 1e6 for r in rows]
    ys = [r[1] for r in rows]
    n = len(rows)
    ybar = sum(ys) / n
    brier = sum((p - y) ** 2 for p, y in zip(ps, ys)) / n
    # bins: first four rows, last four rows
    bins = [rows[:4], rows[4:]]
    rel = res = ece = 0.0
    for b in bins:
        nk = len(b)
        qk = sum(r[0] for r in b) / 1e6 / nk
        yk = sum(r[1] for r in b) / nk
        rel += nk * (qk - yk) ** 2
        res += nk * (yk - ybar) ** 2
        ece += nk * abs(qk - yk)
    rel, res, ece = rel / n, res / n, ece / n
    unc = ybar * (1 - ybar)

    assert out["n_rows"] == n
    assert out["base_rate"] == round(ybar, 6)
    assert abs(out["brier"] - brier) < 1e-9
    assert abs(out["reliability"] - rel) < 1e-9
    assert abs(out["resolution"] - res) < 1e-9
    assert abs(out["uncertainty"] - unc) < 1e-9
    assert abs(out["ece"] - ece) < 1e-9
    # Murphy identity for the binned forecast
    assert abs(out["brier_binned"] - (rel - res + unc)) < 1e-9


def _doc(doc_id, lang, text, n_chars=None):
    return {
        "doc_id": doc_id,
        "lang": lang,
        "source": "s0",
        "text": text,
        "n_chars": n_chars if n_chars is not None else len(text),
    }


def test_mcnemar_textbook_counts():
    # Classifier A = stopword lang-id; B = majority declared lang.
    # 6 docs: majority declared = 'en' (3 en, 2 es, 1 de).
    # en-stopword text => pred 'en'; es-stopword text => pred 'es';
    # no stopwords => 'und'.
    en, es, und = "the and of to in", "el la de que los", "zzz qqq vvv"
    docs = [
        _doc(1, "en", en),   # A right, B right  -> both
        _doc(2, "en", es),   # A wrong, B right  -> only_b
        _doc(3, "en", und),  # A wrong, B right  -> only_b
        _doc(4, "es", es),   # A right, B wrong  -> only_a
        _doc(5, "es", en),   # A wrong, B wrong  -> neither
        _doc(6, "de", und),  # A wrong, B wrong  -> neither
    ]
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(docs))
    out = con.sql(ORACLES["q363_langid_mcnemar"]).df().iloc[0]
    assert (
        out["n"],
        out["n_both"],
        out["n_only_a"],
        out["n_only_b"],
        out["n_neither"],
    ) == (6, 1, 1, 2, 2)
    # chi2 = (|1-2| - 1)^2 / (1+2) = 0/3 = 0
    assert out["chi2"] == 0.0


def test_cochran_q_textbook():
    # Hand-worked Cochran's Q, k=3: gates g0 (200<=n_chars<=2000),
    # g1 (<=5 digits), g2 (>=30 tokens). Build rows hitting chosen
    # patterns: (1,1,1), (1,1,0), (1,0,0), (0,1,0) x 2.
    long_text = " ".join("wx" for _ in range(30))  # 30 tokens, no digits
    digits = "1 2 3 4 5 6 7"  # 7 digit chars, 7 tokens
    rows = [
        _doc(1, "en", long_text, n_chars=300),   # g=(1,1,1)
        _doc(2, "en", "short", n_chars=300),     # g=(1,1,0)
        _doc(3, "en", digits, n_chars=500),      # g=(1,0,0)
        _doc(4, "en", "tiny", n_chars=10),       # g=(0,1,0)
        _doc(5, "en", "tiny", n_chars=10),       # g=(0,1,0)
    ]
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows))
    out = con.sql(ORACLES["q364_quality_gates_cochran_q"]).df().iloc[0]
    g = [(1, 1, 1), (1, 1, 0), (1, 0, 0), (0, 1, 0), (0, 1, 0)]
    s = [sum(r[j] for r in g) for j in range(3)]
    r = [sum(row) for row in g]
    k = 3
    num = (k - 1) * (k * sum(x * x for x in s) - sum(s) ** 2)
    den = k * sum(r) - sum(x * x for x in r)
    assert out["n"] == 5
    assert [out["rate_g0"], out["rate_g1"], out["rate_g2"]] == [
        round(x / 5, 6) for x in s
    ]
    assert abs(out["q_stat"] - num / den) < 1e-9
    assert out["dof"] == 2


def test_two_sided_p_matches_normal_table():
    # A&S 26.2.17 |err| < 7.5e-8; check against table values of
    # 2*(1 - Phi(z)).
    con = duckdb.connect()
    for z, expected in [
        (0.0, 1.0),
        (1.0, 0.3173105078629141),
        (1.959963984540054, 0.05),
        (2.5758293035489004, 0.01),
        (-1.0, 0.3173105078629141),
    ]:
        got = con.sql(
            f"SELECT {two_sided_p_sql(str(z))} AS p"
        ).fetchone()[0]
        assert abs(got - expected) < 2e-7, (z, got, expected)


def test_mcnemar_continuity_correction_formula():
    # Direct formula check on asymmetric counts via a crafted corpus:
    # push 5 only_a and 1 only_b -> chi2 = (|5-1|-1)^2/6 = 1.5
    en, es, und = "the and of to in", "el la de que los", "zzz qqq vvv"
    docs = []
    i = 1
    # 5x: A right (es text declared es), B wrong (majority en)
    for _ in range(5):
        docs.append(_doc(i, "es", es))
        i += 1
    # 1x: A wrong, B right (en declared, no stopwords)
    docs.append(_doc(i, "en", und))
    i += 1
    # pad majority to 'en': add en-declared en-text docs (both correct)
    for _ in range(6):
        docs.append(_doc(i, "en", en))
        i += 1
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(docs))
    out = con.sql(ORACLES["q363_langid_mcnemar"]).df().iloc[0]
    assert (out["n_only_a"], out["n_only_b"]) == (5, 1)
    assert abs(out["chi2"] - 1.5) < 1e-12


def _phi_as(z: float) -> float:
    # Independent Python implementation of A&S 26.2.17 for expectations.
    t = 1.0 / (1.0 + 0.2316419 * abs(z))
    poly = t * (
        0.319381530
        + t * (-0.356563782 + t * (1.781477937 + t * (-1.821255978 + t * 1.330274429)))
    )
    pdf = 0.3989422804014327 * math.exp(-0.5 * z * z)
    return 2.0 * pdf * poly


def test_welch_bh_holm_micro_corpus():
    # 3 sources x 4 docs with hand-controllable lengths; source C is the
    # obvious outlier. Expectations derived independently in Python.
    lens = {
        "A": [100, 110, 120, 130],
        "B": [101, 111, 121, 131],
        "C": [500, 510, 520, 530],
    }
    docs, i = [], 1
    for s, vs in lens.items():
        for v in vs:
            docs.append(
                {"doc_id": i, "lang": "en", "source": s,
                 "text": "x", "n_chars": v}
            )
            i += 1
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(docs))
    out = (
        con.sql(ORACLES["q362_source_length_fdr"])
        .df()
        .set_index("source")
        .sort_index()
    )

    # independent Welch z + BH/Holm in plain Python
    import statistics

    all_vals = {s: vs for s, vs in lens.items()}
    stats = {}
    for s in lens:
        xs = all_vals[s]
        rest = [v for s2, vs in all_vals.items() if s2 != s for v in vs]
        ms, mr = sum(xs) / len(xs), sum(rest) / len(rest)
        vs_, vr = statistics.variance(xs), statistics.variance(rest)
        z = (ms - mr) / math.sqrt(vs_ / len(xs) + vr / len(rest))
        stats[s] = (z, min(_phi_as(z), 2.0))  # two-sided p
    m = len(stats)
    order = sorted(stats, key=lambda s: (round(stats[s][1], 12), s))
    alpha = 0.05
    # BH: largest i with p_(i) <= alpha*i/m, reject all ranks <= i
    ks = [
        i
        for i, s in enumerate(order, 1)
        if round(stats[s][1], 12) <= alpha * i / m
    ]
    bh_k = max(ks) if ks else 0
    holm_ok = [
        round(stats[s][1], 12) <= alpha / (m - i + 1)
        for i, s in enumerate(order, 1)
    ]
    for i, s in enumerate(order, 1):
        row = out.loc[s]
        assert row["p_rank"] == i
        assert abs(row["z"] - round(stats[s][0], 6)) < 1e-6
        assert row["bh_reject"] == int(i <= bh_k)
        assert row["holm_reject"] == int(all(holm_ok[:i]))
    # scenario sanity: C is the most anomalous source (vs-rest tests
    # flag A/B too here, since C shifts every "rest" — that is correct
    # behavior of the statistic, not a defect)
    assert out.loc["C"]["p_rank"] == 1 and out.loc["C"]["bh_reject"] == 1


def test_conformal_exact_order_statistic_and_k():
    import hashlib

    # one source, 9 calibration + some test docs; q_hat must be the
    # k-th smallest with k = ceil((n+1)(1-alpha)) in exact integers.
    docs = []
    cal_vals, test_vals = [], []
    i = 0
    while len(cal_vals) < 9 or len(test_vals) < 6:
        b = int(hashlib.md5(f"conf:{i}".encode()).hexdigest()[:8], 16) % 2
        v = 100 + 10 * i
        if b == 0 and len(cal_vals) < 9:
            docs.append({"doc_id": i, "lang": "en", "source": "S",
                         "text": "x", "n_chars": v})
            cal_vals.append(v)
        elif b == 1 and len(test_vals) < 6:
            docs.append({"doc_id": i, "lang": "en", "source": "S",
                         "text": "x", "n_chars": v})
            test_vals.append(v)
        i += 1
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(docs))
    out = con.sql(ORACLES["q368_conformal_length_coverage"]).df()
    for a in (1, 2):
        row = out[out.alpha_tenths == a].iloc[0]
        n = len(cal_vals)
        k = math.ceil((n + 1) * (10 - a) / 10)  # exact for tenths
        assert row["n_cal"] == n and row["n_test"] == len(test_vals)
        assert row["q_hat"] == sorted(cal_vals)[min(k, n) - 1]
        cov = sum(v <= row["q_hat"] for v in test_vals) / len(test_vals)
        assert abs(row["coverage"] - round(cov, 6)) < 1e-9


def test_eb_shrinkage_moment_estimator():
    # k = [0, 1, 5] successes out of n = 10 per source (OVER-dispersed:
    # var(k) = 14/3 > n*p*(1-p) = 1.6, so the MoM is valid); hand
    # moments: m1 = 2, m2 = 26/3. Standard beta-binomial MoM estimator.
    docs, i = [], 0
    for s, k in [("A", 0), ("B", 1), ("C", 5)]:
        for j in range(10):
            docs.append(
                {"doc_id": i, "lang": "en", "source": s, "text": "x",
                 "n_chars": 100 if j < k else 300}
            )
            i += 1
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(docs))
    out = (
        con.sql(ORACLES["q371_source_shortdoc_eb_shrinkage"])
        .df()
        .set_index("source")
        .sort_index()
    )
    n, m1, m2 = 10.0, 2.0, 26.0 / 3.0
    den = n * (m2 / m1 - m1 - 1) + m1
    ah = (n * m1 - m2) / den
    bh = (n - m1) * (n - m2 / m1) / den
    assert abs(out.loc["A"]["alpha_hat"] - round(ah, 6)) < 1e-6
    assert abs(out.loc["A"]["beta_hat"] - round(bh, 6)) < 1e-6
    pooled = m1 / n
    for s, k in [("A", 0), ("B", 1), ("C", 5)]:
        raw = k / n
        shrunk = (ah + k) / (ah + bh + n)
        assert abs(out.loc[s]["shrunk_rate"] - round(shrunk, 6)) < 1e-6
        # shrinkage property: strictly between raw rate and pooled mean
        lo, hi = sorted((raw, pooled))
        if raw != pooled:
            assert lo < shrunk < hi


def test_eb_shrinkage_underdispersed_falls_back_to_pooling():
    # k = [2, 2, 2] out of 10: zero between-source variance — the MoM
    # denominator goes negative, the model degenerates, and the output
    # must fall back to complete pooling with NULL alpha/beta.
    docs, i = [], 0
    for s in ("A", "B", "C"):
        for j in range(10):
            docs.append(
                {"doc_id": i, "lang": "en", "source": s, "text": "x",
                 "n_chars": 100 if j < 2 else 300}
            )
            i += 1
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(docs))
    out = con.sql(ORACLES["q371_source_shortdoc_eb_shrinkage"]).df()
    assert (out["shrunk_rate"] == 0.2).all()
    assert out["alpha_hat"].isna().all() and out["beta_hat"].isna().all()


def _friedman_py(blocks):
    # independent tie-corrected Friedman implementation (mid-ranks)
    k = len(blocks[0])
    n = len(blocks)
    rsum = [0.0] * k
    a = 0.0
    for b in blocks:
        order = sorted(range(k), key=lambda j: b[j])
        ranks = [0.0] * k
        i = 0
        while i < k:
            j = i
            while j + 1 < k and b[order[j + 1]] == b[order[i]]:
                j += 1
            mid = (i + j) / 2 + 1
            for t in range(i, j + 1):
                ranks[order[t]] = mid
            i = j + 1
        for j in range(k):
            rsum[j] += ranks[j]
            a += ranks[j] ** 2
    c = n * k * (k + 1) ** 2 / 4
    num = sum((r - n * (k + 1) / 2) ** 2 for r in rsum)
    return n, (k - 1) * num / (a - c)


def test_friedman_textbook_perfect_agreement_and_ties():
    types = ["click", "error", "purchase", "signup", "view"]
    # 3 users; two in perfect agreement, one with a tie block
    blocks = [
        [1.0, 2.0, 3.0, 4.0, 5.0],
        [1.0, 2.0, 3.0, 4.0, 5.0],
        [1.0, 1.0, 3.0, 4.0, 5.0],  # tie on the first two
    ]
    rows = []
    for u, b in enumerate(blocks):
        for t, v in zip(types, b):
            rows.append({"user_id": u, "event_type": t, "value": v})
    con = duckdb.connect()
    con.register("events", pd.DataFrame(rows))
    out = con.sql(ORACLES["q365_event_value_friedman"]).df().iloc[0]
    n, chi2 = _friedman_py(blocks)
    assert out["n_blocks"] == n and out["k_treatments"] == 5
    assert abs(out["chi2"] - round(chi2, 6)) < 1e-6
    assert out["dof"] == 4

    # perfect agreement alone maxes the statistic at n*(k-1)
    rows2 = [
        {"user_id": u, "event_type": t, "value": v}
        for u in range(3)
        for t, v in zip(types, [1.0, 2.0, 3.0, 4.0, 5.0])
    ]
    con2 = duckdb.connect()
    con2.register("events", pd.DataFrame(rows2))
    out2 = con2.sql(ORACLES["q365_event_value_friedman"]).df().iloc[0]
    assert abs(out2["chi2"] - 3 * 4) < 1e-9


def test_friedman_drops_incomplete_blocks():
    types = ["click", "error", "purchase", "signup", "view"]
    rows = [
        {"user_id": 0, "event_type": t, "value": float(i + 1)}
        for i, t in enumerate(types)
    ]
    rows += [  # user 1 missing two types -> dropped
        {"user_id": 1, "event_type": "click", "value": 9.0},
        {"user_id": 1, "event_type": "view", "value": 1.0},
    ]
    con = duckdb.connect()
    con.register("events", pd.DataFrame(rows))
    out = con.sql(ORACLES["q365_event_value_friedman"]).df().iloc[0]
    assert out["n_blocks"] == 1


def test_sprt_evalue_walk_hand_computed():
    c1, c0 = 0.04139268515822499, -0.010995384301463193
    days = [(0, 10, 2), (1, 5, 3), (2, 8, 0)]
    rows = []
    eid = 0
    for day, n, k in days:
        for i in range(n):
            rows.append(
                {
                    "event_id": eid,
                    "ts": pd.Timestamp("1970-01-01")
                    + pd.Timedelta(days=day, minutes=i),
                    "user_id": 1,
                    "event_type": "purchase" if i < k else "view",
                    "value": 1.0,
                    "props": "{}",
                }
            )
            eid += 1
    con = duckdb.connect()
    con.register("events", pd.DataFrame(rows))
    out = (
        con.sql(ORACLES["q372_purchase_sprt_evalue"]).df().set_index("day")
    )
    cum = 0.0
    for day, n, k in days:
        cum += k * c1 + (n - k) * c0
        row = out.loc[day]
        assert (row["n_events"], row["n_purchases"]) == (n, k)
        assert abs(row["log10_e"] - round(cum, 6)) < 1e-9
        assert row["crossed"] == int(round(cum, 9) >= 1.3010299956639813)


def test_watermark_lateness_hand_computed():
    # arrival order 1..5 with event times (seconds):
    # running max:  100, 100, 200, 200, 200
    # lateness:       0,  50,   0,  10, 190
    secs = [100, 50, 200, 190, 10]
    rows = [
        {
            "event_id": i + 1,
            "ts": pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=s),
            "user_id": 1,
            "event_type": "view",
            "value": 1.0,
            "props": "{}",
        }
        for i, s in enumerate(secs)
    ]
    con = duckdb.connect()
    con.register("events", pd.DataFrame(rows))
    out = (
        con.sql(ORACLES["q370_watermark_lateness_audit"])
        .df()
        .set_index("delay_s")
    )
    expect = {0: 3, 60: 1, 300: 0, 900: 0, 3600: 0, 21600: 0}
    for d, n_late in expect.items():
        assert out.loc[d]["n_dropped"] == n_late
        assert out.loc[d]["n_events"] == 5
        assert abs(out.loc[d]["dropped_frac"] - round(n_late / 5, 6)) < 1e-9


def _emb_table(vecs, dims, labels=None):
    rows = []
    for i, v in enumerate(vecs):
        emb = list(v) + [0.0] * (dims - len(v))
        rows.append(
            {
                "vec_id": i,
                "embedding": [float(x) for x in emb],
                "label": (labels[i] if labels else 0),
            }
        )
    return pd.DataFrame(rows)


def test_participation_ratio_hand_computed():
    # 3 vectors, only dims 1-2 vary, zero means:
    # raw second moments S11 = S22 = 2, S12 = 1 ->
    # PR = (tr N)^2 / sum N^2 = (2+2)^2 / (4+1+1+4) = 1.6
    con = duckdb.connect()
    con.register(
        "embeddings",
        _emb_table([[1.0, 0.0], [0.0, 1.0], [-1.0, -1.0]], 16),
    )
    out = con.sql(
        ORACLES["q366_embedding_participation_ratio"]
    ).df().iloc[0]
    assert out["n_vectors"] == 3 and out["dims"] == 16
    assert abs(out["participation_ratio"] - 1.6) < 1e-9
    assert abs(out["eff_dim_frac"] - 0.1) < 1e-9
    # total_var = tr(C) = (n*S11 + n*S22) / n^2 = (6 + 6) / 9 = 4/3
    assert abs(out["total_var"] - round(4 / 3, 6)) < 1e-9


def test_participation_ratio_isotropic_maxes_at_rank():
    # 4 one-hot directions +/- in 4 dims -> isotropic rank-4 covariance
    vecs = []
    for d in range(4):
        up = [0.0] * 4
        dn = [0.0] * 4
        up[d], dn[d] = 1.0, -1.0
        vecs += [up, dn]
    con = duckdb.connect()
    con.register("embeddings", _emb_table(vecs, 16))
    out = con.sql(
        ORACLES["q366_embedding_participation_ratio"]
    ).df().iloc[0]
    assert abs(out["participation_ratio"] - 4.0) < 1e-9


def test_cka_exact_one_when_coarse_quantization_lossless():
    # values exactly representable at 2 decimals -> the 1e2-unit view
    # equals the 1e4-unit view up to scale, and linear CKA must be 1.
    vecs = [
        [0.25, -0.5, 0.75, 0.1, 0.2, -0.3, 0.4, -0.25],
        [-0.75, 0.5, 0.25, -0.1, 0.3, 0.2, -0.4, 0.05],
        [0.5, 0.25, -0.25, 0.35, -0.2, 0.1, 0.15, -0.05],
    ]
    con = duckdb.connect()
    con.register("embeddings", _emb_table(vecs, 8))
    out = con.sql(ORACLES["q367_quantization_cka"]).df().iloc[0]
    assert out["n_vectors"] == 3 and out["dims"] == 8
    assert abs(out["cka"] - 1.0) < 1e-9


def test_davies_bouldin_hand_geometry():
    # two 1-D clusters on the first axis: {0, 2} and {10, 12}.
    # centroids 1 and 11, S_i = 1 each, M = 10, DB term = 0.2 for both.
    vecs = [[0.0], [2.0], [10.0], [12.0]]
    con = duckdb.connect()
    con.register(
        "embeddings", _emb_table(vecs, 64, labels=[0, 0, 1, 1])
    )
    out = (
        con.sql(ORACLES["q369_label_davies_bouldin"])
        .df()
        .set_index("label")
    )
    for lab, other in ((0, 1), (1, 0)):
        row = out.loc[lab]
        assert row["n_members"] == 2
        assert abs(row["s_intra"] - 1.0) < 1e-9
        assert row["worst_other"] == other
        assert abs(row["db_term"] - 0.2) < 1e-9


def test_benford_chi2_hand_computed():
    from etl_jetro_spark.plans.queries import _BENFORD_P

    # cents: 100,150,200,999 -> first digits 1,1,2,9
    prices = [1.00, 1.50, 2.00, 9.99]
    con = duckdb.connect()
    con.register(
        "orders",
        pd.DataFrame({"o_orderkey": range(4), "o_totalprice": prices}),
    )
    out = (
        con.sql(ORACLES["q373_order_total_benford"]).df().set_index("digit")
    )
    obs = {1: 2, 2: 1, 9: 1}
    n = 4
    ps = {int(d): float(p) for d, p in _BENFORD_P}
    chi2 = sum(
        (obs.get(d, 0) - n * ps[d]) ** 2 / (n * ps[d]) for d in range(1, 10)
    )
    for d in range(1, 10):
        row = out.loc[d]
        assert row["n_obs"] == obs.get(d, 0)
        assert abs(row["benford_p"] - round(ps[d], 6)) < 1e-9
        assert abs(row["chi2"] - round(chi2, 6)) < 1e-6
        assert row["dof"] == 8


def test_group_kfold_exclusive_and_counts():
    import hashlib

    rows = []
    eid = 0
    for u in range(40):
        for j in range(3):  # 3 events per user
            rows.append(
                {
                    "user_id": u,
                    "event_type": "purchase" if j == 0 else "view",
                    "value": 1.5,
                }
            )
            eid += 1
    con = duckdb.connect()
    con.register("events", pd.DataFrame(rows))
    out = con.sql(ORACLES["q374_group_kfold_balance"]).df().set_index("fold")

    def fold(u):
        return int(hashlib.md5(f"fold:{u}".encode()).hexdigest()[:8], 16) % 5

    expect_users = {f: 0 for f in range(5)}
    for u in range(40):
        expect_users[fold(u)] += 1
    for f in range(5):
        if expect_users[f] == 0:
            assert f not in out.index
            continue
        row = out.loc[f]
        # group exclusivity: every user contributes ALL 3 events to one fold
        assert row["n_users"] == expect_users[f]
        assert row["n_events"] == 3 * expect_users[f]
        assert abs(row["purchase_share"] - round(1 / 3, 6)) < 1e-9
        assert abs(row["avg_value"] - 1.5) < 1e-9


def test_rbo_identity_against_direct_form():
    # 6 vectors whose dims beyond 16 are zero -> prefix and full
    # rankings coincide, so X_d = min(d, 5) and the histogram-collapse
    # form must equal the direct RBO sum.
    import random

    rng = random.Random(3)
    vecs = []
    for _ in range(6):
        v = [round(rng.uniform(-1, 1), 3) for _ in range(16)] + [0.0] * 4
        vecs.append(v)
    con = duckdb.connect()
    con.register("embeddings", _emb_table(vecs, 20))
    out = con.sql(ORACLES["q375_prefix_full_rbo"]).df()
    p = 0.9
    direct = sum(
        (1 - p) * p ** (d - 1) * min(d, 5) / d for d in range(1, 11)
    )
    assert len(out) >= 1  # probes = vec_id % 5 == 0 -> {0, 5}
    for _, row in out.iterrows():
        assert row["top1_agree"] == 1
        assert row["overlap_at_10"] == 5
        assert abs(row["rbo_trunc"] - round(direct, 6)) < 1e-6
        assert abs(
            row["rbo_norm"] - round(direct / (1 - p**10), 6)
        ) < 1e-6


def test_hill_estimator_hand_computed():
    # 120 docs, lengths 1000/i**0.5-ish: exact Pareto would give
    # alpha = 2; check the estimator value against plain Python.
    lens = [int(1000 / (i**0.5)) + 1 for i in range(1, 121)]
    docs = [
        {"doc_id": i, "lang": "en", "source": "s0", "text": "x",
         "n_chars": v}
        for i, v in enumerate(lens)
    ]
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(docs))
    out = con.sql(ORACLES["q376_doclen_hill_tail_index"]).df().set_index("k")
    ordered = sorted(lens, reverse=True)
    for k in (50, 100):
        vref = ordered[k]  # (k+1)-th largest
        inv = sum(math.log(ordered[i] / vref) for i in range(k)) / k
        row = out.loc[k]
        assert row["threshold"] == vref
        assert abs(row["inv_alpha"] - round(inv, 6)) < 1e-6
        assert abs(row["hill_alpha"] - round(1 / inv, 6)) < 1e-4
