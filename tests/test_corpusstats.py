"""Textbook-value checks for the corpus-comparison family
(operators/corpusstats.py + queries q377-q386).

Same discipline as tests/test_stat_oracles.py: the driver's gate proves
Spark == DuckDB; these tests run the ORACLE SQL alone on hand-built
micro-tables against values derived independently in plain Python, so a
formula bug shared by both engines cannot ship green. One Spark test
covers the new distributed prefix-sum sweep directly."""

from __future__ import annotations

import math
import sys
from pathlib import Path

import duckdb
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from etl_jetro_spark.plans.queries import ORACLES  # noqa: E402


def round_away(x: float, nd: int = 0) -> float:
    """Round half AWAY from zero, like DuckDB/Spark round()."""
    q = 10 ** nd
    v = math.floor(abs(x) * q + 0.5) / q * (1 if x >= 0 else -1)
    return int(v) if nd == 0 else v


def _docs(rows: list[tuple[int, str, str]]) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(rows, columns=["doc_id", "source", "text"]),
    )
    return con


def _events(rows: list[tuple[int, int, str, float]]):
    """rows: (event_id, user_id, event_type, t_seconds)."""
    con = duckdb.connect()
    df = pd.DataFrame(rows, columns=["event_id", "user_id", "event_type", "t"])
    df["ts"] = pd.to_datetime(df.pop("t"), unit="s")
    con.register("events", df)
    return con


def _ols(xs, ys):
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return slope, (sy - slope * sx) / n


def test_js_divergence_two_point_distributions():
    # A = (3/4, 1/4), B = (1/4, 3/4) over {a, b}:
    # JSD = 0.75*ln(1.5) + 0.25*ln(0.5)  (symmetric terms collapse)
    con = _docs([(1, "srcA", "a a a b"), (2, "srcB", "a b b b")])
    out = con.sql(ORACLES["q377_source_js_divergence"]).df()
    assert len(out) == 1
    r = out.iloc[0]
    jsd = 0.75 * math.log(1.5) + 0.25 * math.log(0.5)
    assert (r["src_a"], r["src_b"]) == ("srcA", "srcB")
    assert r["n_support"] == 2
    assert r["jsd_nats"] == round_away(jsd, 6)
    assert r["jsd_bits"] == round_away(jsd / math.log(2), 6)
    assert 0.0 <= r["jsd_bits"] <= 1.0


def test_js_divergence_identical_sources_is_zero():
    con = _docs([(1, "srcA", "a a b"), (2, "srcB", "a a b")])
    r = con.sql(ORACLES["q377_source_js_divergence"]).df().iloc[0]
    assert r["jsd_nats"] == 0.0


def test_zipf_slope_hand_ols():
    # counts 8, 4, 2, 1 at ranks 1..4
    con = _docs([(1, "s", " ".join(["a"] * 8 + ["b"] * 4 + ["c"] * 2 + ["d"]))])
    r = con.sql(ORACLES["q378_source_zipf_slope"]).df().iloc[0]
    xs = [math.log(k) for k in (1, 2, 3, 4)]
    ys = [math.log(c) for c in (8, 4, 2, 1)]
    slope, intercept = _ols(xs, ys)
    n = 4
    sx, sy = sum(xs), sum(ys)
    cov = n * sum(x * y for x, y in zip(xs, ys)) - sx * sy
    vx = n * sum(x * x for x in xs) - sx * sx
    vy = n * sum(y * y for y in ys) - sy * sy
    assert r["n_top"] == 4
    assert r["zipf_slope"] == round_away(slope, 6)
    assert r["ln_c"] == round_away(intercept, 6)
    assert r["r2"] == round_away(cov * cov / (vx * vy), 6)


def test_heaps_exponent_incremental_vocab():
    # doc k introduces exactly one new term and holds k tokens:
    # N_k = k(k+1)/2, V_k = k at checkpoint k (n=10 -> c_k = k)
    docs = [
        (k, "s", " ".join(f"w{j}" for j in range(1, k + 1)))
        for k in range(1, 11)
    ]
    con = _docs(docs)
    r = con.sql(ORACLES["q379_source_heaps_exponent"]).df().iloc[0]
    xs = [math.log(k * (k + 1) / 2) for k in range(1, 11)]
    ys = [math.log(k) for k in range(1, 11)]
    slope, _ = _ols(xs, ys)
    assert r["n_docs"] == 10
    assert r["n_points"] == 10
    assert r["heaps_beta"] == round_away(slope, 6)


def test_chisq_homogeneity_symmetric_2x2():
    # A: a=30 b=10; B: a=10 b=30 -> e = 20 everywhere,
    # each source contributes (10^2)/20 + (10^2)/20 = 10
    con = _docs([
        (1, "A", " ".join(["a"] * 30 + ["b"] * 10)),
        (2, "B", " ".join(["a"] * 10 + ["b"] * 30)),
    ])
    out = con.sql(ORACLES["q380_source_term_chisq"]).df()
    assert sorted(out["source"]) == ["A", "B"]
    for _, r in out.iterrows():
        assert r["n_obs"] == 40
        assert r["token_share"] == 0.5
        assert r["chi2_contrib"] == 10.0


def test_cross_entropy_add_one_smoothing():
    # global: a=4, b=1, Ng=5, V=2 -> q(a)=5/7, q(b)=2/7
    con = _docs([(1, "A", "a a a"), (2, "B", "a b")])
    out = con.sql(ORACLES["q381_source_cross_entropy"]).df()
    out = out.set_index("source")
    ha = -math.log(5 / 7)
    hb = -(math.log(5 / 7) + math.log(2 / 7)) / 2
    assert out.loc["A", "n_tokens"] == 3
    assert out.loc["A", "xent_nats"] == round_away(ha, 6)
    assert out.loc["A", "ppl"] == round_away(math.exp(ha), 6)
    assert out.loc["B", "xent_nats"] == round_away(hb, 6)
    # the LM models A (all mass on 'a') better than B
    assert out.loc["A", "xent_nats"] < out.loc["B", "xent_nats"]


def test_markov_entropy_two_state_chain():
    # one user, sequence x y x y y:
    # from x: {y:2} -> H=0; from y: {x:1, y:1} -> H=ln 2
    rows = [
        (1, 7, "x", 1.0), (2, 7, "y", 2.0), (3, 7, "x", 3.0),
        (4, 7, "y", 4.0), (5, 7, "y", 5.0),
    ]
    con = _events(rows)
    out = con.sql(ORACLES["q382_event_markov_entropy"]).df().set_index(
        "from_type")
    assert out.loc["x", "n_out"] == 2
    assert out.loc["x", "n_dest"] == 1
    assert out.loc["x", "h_nats"] == 0.0
    assert out.loc["x", "pi"] == 0.5
    assert out.loc["x", "rate_contrib"] == 0.0
    assert out.loc["y", "n_out"] == 2
    assert out.loc["y", "n_dest"] == 2
    assert out.loc["y", "h_nats"] == round_away(math.log(2), 6)
    assert out.loc["y", "rate_contrib"] == round_away(0.5 * math.log(2), 6)


def test_markov_entropy_orders_by_timestamp_not_event_id():
    # event_ids shuffled against ts: sequence by TS is x->y
    rows = [(9, 1, "x", 1.0), (2, 1, "y", 2.0)]
    con = _events(rows)
    out = con.sql(ORACLES["q382_event_markov_entropy"]).df().set_index(
        "from_type")
    assert list(out.index) == ["x"]
    assert out.loc["x", "n_out"] == 1


def test_keyness_logodds_monroe_formula():
    # A: k x25 + c x5; B: c x25 -> candidates k (cg=25), c (cg=30)
    con = _docs([
        (1, "A", " ".join(["k"] * 25 + ["c"] * 5)),
        (2, "B", " ".join(["c"] * 25)),
    ])
    out = con.sql(ORACLES["q383_source_keyness_logodds"]).df()
    ng, a0 = 55, 500.0

    def z(c1, cg, ns):
        a = a0 * (cg / ng)
        c2 = cg - c1
        o1 = (c1 + a) / (ns + a0 - c1 - a)
        o2 = (c2 + a) / (ng - ns + a0 - c2 - a)
        va = 1.0 / (c1 + a) + 1.0 / (c2 + a)
        return (math.log(o1) - math.log(o2)) / math.sqrt(va)

    za_k, za_c = z(25, 25, 30), z(5, 30, 30)
    zb_c = z(25, 30, 25)
    a_rows = out[out["source"] == "A"].set_index("rank")
    assert za_k > za_c  # 'k' is A's distinctive term
    assert a_rows.loc[1, "term"] == "k"
    assert a_rows.loc[1, "z"] == round_away(za_k, 6)
    assert a_rows.loc[2, "term"] == "c"
    assert a_rows.loc[2, "z"] == round_away(za_c, 6)
    b_rows = out[out["source"] == "B"].set_index("rank")
    assert b_rows.loc[1, "term"] == "c"
    assert b_rows.loc[1, "z"] == round_away(zb_c, 6)
    assert (out["rank"] <= 5).all()


def test_oov_rate_mass_cut_boundary_is_strict():
    # global counts a=50 b=30 c=15 d=5 (N=100): cumulative BEFORE c is
    # exactly 80% -> 5*80 < 4*100 is FALSE, c excluded. vocab = {a, b}.
    con = _docs([
        (1, "A", " ".join(["a"] * 50 + ["b"] * 30)),
        (2, "B", " ".join(["c"] * 15 + ["d"] * 5)),
    ])
    out = con.sql(ORACLES["q384_source_oov_rate"]).df().set_index("source")
    assert (out["n_vocab"] == 2).all()
    assert out.loc["A", "oov_tokens"] == 0
    assert out.loc["A", "oov_token_rate"] == 0.0
    assert out.loc["B", "oov_tokens"] == 20
    assert out.loc["B", "oov_token_rate"] == 1.0
    assert out.loc["B", "oov_type_rate"] == 1.0


def test_burstiness_hand_moments():
    # gaps 1s and 2s: mu=1.5e6 us, sd=0.5e6 -> cv=1/3, B=-0.5
    rows = [(1, 1, "e", 0.0), (2, 1, "e", 1.0), (3, 1, "e", 3.0)]
    con = _events(rows)
    r = con.sql(ORACLES["q385_event_interarrival_burstiness"]).df().iloc[0]
    assert r["n_gaps"] == 2
    assert r["mean_gap_s"] == 1.5
    assert r["cv"] == round_away(1 / 3, 6)
    assert r["burstiness"] == -0.5


def test_burstiness_periodic_is_minus_one():
    rows = [(i, 1, "e", float(i)) for i in range(5)]
    con = _events(rows)
    r = con.sql(ORACLES["q385_event_interarrival_burstiness"]).df().iloc[0]
    assert r["burstiness"] == -1.0
    assert r["cv"] == 0.0


def test_lexical_richness_closed_forms():
    con = _docs([(1, "A", "a a a a b")])
    r = con.sql(ORACLES["q386_source_lexical_richness"]).df().iloc[0]
    assert r["n_tokens"] == 5
    assert r["n_types"] == 2
    assert r["n_hapax"] == 1
    assert r["root_ttr"] == round_away(2 / math.sqrt(5), 6)
    assert r["herdan_c"] == round_away(math.log(2) / math.log(5), 6)
    assert r["hapax_frac"] == 0.5


def test_running_prefix_sum_matches_python_cumsum(spark):
    from etl_jetro_spark.operators.frontier import running_prefix_sum

    vals = [(i, (7 * i) % 13 + 1) for i in range(1, 101)]
    df = spark.createDataFrame(vals, "k INT, v INT")
    out = running_prefix_sum(df, "k", "v", num_range_partitions=7)
    got = {r["k"]: r["_runsum"] for r in out.collect()}
    run = 0
    for k, v in vals:
        run += v
        assert got[k] == run
