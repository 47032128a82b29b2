"""Property-based tests (SURVEY §5 plan #4) via hypothesis.

Session-scoped Spark + small example counts keep these fast while still
sweeping messy-cell space far wider than the fixtures do.
"""

from __future__ import annotations

import re

import pyspark.sql.functions as F
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from etl_jetro_spark import functions as EF
from etl_jetro_spark import operators as O

slow_ok = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

cells = st.one_of(
    st.none(),
    st.integers(-1000, 1000).map(str),
    st.floats(-100, 100, allow_nan=False).map(lambda f: f"{f:.2f}"),
    st.sampled_from(["", "na", "N/A", "nah", "x", "$1,234.50", "(7.5)", "3-"]),
)


@slow_ok
@given(st.lists(st.tuples(st.sampled_from("abc"), st.sampled_from("xy"), cells), min_size=1, max_size=12))
def test_sum_invariant_under_row_shuffle(spark, rows):
    """groupBy-sum is row-order independent and equals the pandas oracle."""
    df = spark.createDataFrame(rows, "k string, g string, v string")
    fwd = O.sum_by(df, ["k", "g"], "v", out="s", drop_zero=False)
    rev = O.sum_by(
        spark.createDataFrame(list(reversed(rows)), "k string, g string, v string"),
        ["k", "g"], "v", out="s", drop_zero=False,
    )
    a = {(r["k"], r["g"]): round(r["s"], 9) for r in fwd.collect()}
    b = {(r["k"], r["g"]): round(r["s"], 9) for r in rev.collect()}
    assert a == b


@slow_ok
@given(st.lists(st.text(alphabet=" aA1-.$n/", max_size=12), min_size=1, max_size=8))
def test_normalize_na_idempotent(spark, vals):
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    once = df.select(EF.normalize_na("v").alias("o"))
    twice = once.select(EF.normalize_na("o").alias("o"))
    assert [r["o"] for r in once.collect()] == [r["o"] for r in twice.collect()]


@slow_ok
@given(st.lists(st.integers(0, 9999).map(str), min_size=1, max_size=10))
def test_branch_fix_only_touches_two_digit(spark, vals):
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    got = [r[0] for r in df.select(O.branch_fix("v")).collect()]
    for v, g in zip(vals, got):
        if re.fullmatch(r"\d{2}", v):
            assert g == int("1" + v)
        else:
            assert g == int(v)


@slow_ok
@given(
    st.lists(
        st.tuples(st.sampled_from(["i1", "i2", "i3"]), st.integers(0, 50), st.integers(0, 50)),
        min_size=1,
        max_size=10,
    )
)
def test_melt_groupby_roundtrip(spark, rows):
    """melt ∘ (groupBy.pivot) round-trips the wide table's cell sums."""
    wide = spark.createDataFrame(rows, ["item", "114", "86"])
    long = O.melt(wide, ["item"], var_name="store", value_name="v")
    back = (
        long.groupBy("item")
        .pivot("store", ["114", "86"])
        .agg(F.sum(F.col("v").try_cast("long")))
    )
    want = {}
    for item, a, b in rows:
        w = want.setdefault(item, [0, 0])
        w[0] += a
        w[1] += b
    got = {r["item"]: [r["114"], r["86"]] for r in back.collect()}
    assert got == want


@slow_ok
@given(st.text(alphabet=" abc123.$()-", max_size=20))
def test_parse_money_never_errors_and_sign_rule(spark, s):
    df = spark.createDataFrame([(s,)], "v string")
    out = df.select(EF.parse_money("v").alias("o")).collect()[0]["o"]
    if out is not None:
        stripped = s.strip()
        if stripped.startswith("(") and stripped.endswith(")"):
            assert out <= 0
