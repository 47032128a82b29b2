"""moneylint must hold: no raw-double money SUM in the query catalog.

The 30x oracle gate (round 9) proved raw double sums of money columns
round apart between Spark's partial-agg tree and a sequential fold once
the sum magnitude swamps the display unit; functions/money.py is the
root fix and tools/moneylint.py the guard. These tests pin both the
heuristics and the catalog-wide invariant.
"""

from __future__ import annotations

import pytest

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

import moneylint  # noqa: E402


def test_spark_raw_money_sum_flagged():
    src = (
        "def q999_bad(spark, sf_dir):\n"
        '    return df.agg(F.sum("o_totalprice").alias("rev"))\n'
    )
    hits = moneylint.spark_violations(src)
    assert len(hits) == 1 and hits[0][0] == "q999_bad"


def test_spark_quantized_sum_not_flagged():
    src = (
        "def q999_ok(spark, sf_dir):\n"
        "    return df.agg(\n"
        '        F.sum(F.round(F.col("o_totalprice") * 1000000)'
        '.cast("decimal(20,0)")).alias("um"),\n'
        '        F.sum(M.micro_units("o_totalprice")).alias("um2"),\n'
        '        F.sum(F.round(F.col("o_totalprice") * 100)'
        '.cast("long")).alias("c"),\n'
        "    )\n"
    )
    assert moneylint.spark_violations(src) == []


def test_spark_nonmoney_sum_not_flagged():
    src = 'def q999(s, d):\n    return df.agg(F.sum("l_quantity"))\n'
    assert moneylint.spark_violations(src) == []


def test_sql_sum_spans_balanced():
    spans = moneylint._sum_spans(
        "SELECT sum(CAST(round(o_totalprice * 100) AS BIGINT)), sum(x) FROM t"
    )
    assert spans == ["CAST(round(o_totalprice * 100) AS BIGINT)", "x"]


def test_sql_case_counter_exempt():
    span = "CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END"
    assert moneylint.SQL_CASE_COUNTER.match(span)
    money_span = "CASE WHEN splurge = 1 THEN o_totalprice ELSE 0 END"
    assert not moneylint.SQL_CASE_COUNTER.match(money_span)


@pytest.mark.slow
def test_catalog_is_clean():
    src = moneylint.QUERIES_PATH.read_text()
    spark_bad = [
        v
        for v in moneylint.spark_violations(src)
        if v[0].lstrip("_") not in moneylint.ALLOW and v[0] not in moneylint.ALLOW
    ]
    sql_bad = [
        v for v in moneylint.oracle_violations() if v[0] not in moneylint.ALLOW
    ]
    assert spark_bad == [] and sql_bad == []
