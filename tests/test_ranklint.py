"""ranklint must hold: no rank decision over an unrounded computed float.

Round 10 proved the manual "round to 12 dp before any ranking"
discipline does not self-enforce: the class was root-fixed in
operators/retrieval.py yet the judge falsified it in knn_join_panel the
same round (exact cosine ties broken by pairwise-vs-sequential fold
noise, not the declared id tiebreak). tools/ranklint.py makes the
discipline structural; these tests pin its heuristics and the
catalog-wide invariant.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

import ranklint  # noqa: E402

REPO = Path(__file__).resolve().parents[1]


# -- SQL-side heuristics ----------------------------------------------------

def test_sql_window_unrounded_division_flagged():
    sql = """
    WITH s AS (SELECT id, sum(a*b) / sqrt(sum(b*b)) AS sc FROM t GROUP BY 1)
    SELECT id FROM (SELECT id, row_number() OVER (ORDER BY sc DESC, id) AS rn
                    FROM s) WHERE rn = 1
    """
    defs = ranklint._sql_defs(sql)
    spans = ranklint._order_by_spans(sql)
    keys = [k for sp in spans for k in ranklint._split_keys(sp)]
    assert "sc" in keys
    assert ranklint._sql_key_unsafe("sc", defs) is not None


def test_sql_window_rounded_key_safe():
    sql = """
    WITH s AS (SELECT id, round(sum(a*b) / sqrt(sum(b*b)), 12) AS sc FROM t
               GROUP BY 1)
    SELECT id FROM (SELECT id, row_number() OVER (ORDER BY sc DESC, id) AS rn
                    FROM s) WHERE rn = 1
    """
    defs = ranklint._sql_defs(sql)
    assert ranklint._sql_key_unsafe("sc", defs) is None


def test_sql_integer_and_stored_keys_safe():
    defs = {
        "n": ["CAST(count(*) AS BIGINT)"],
        "rn": ["row_number() OVER (ORDER BY x)"],
    }
    assert ranklint._sql_key_unsafe("n", defs) is None
    assert ranklint._sql_key_unsafe("rn", defs) is None
    # unresolvable bare identifier = stored column = safe
    assert ranklint._sql_key_unsafe("o_totalprice", defs) is None


def test_sql_top_level_order_by_without_limit_not_a_decision():
    # a display sort (no LIMIT) must not be linted — only rank decisions
    sql = "SELECT a / b AS r FROM t ORDER BY r DESC"
    assert ranklint._order_by_spans(sql) == []
    topk = "SELECT a / b AS r FROM t ORDER BY r DESC LIMIT 5"
    assert len(ranklint._order_by_spans(topk)) == 1


def test_wrapped_in_requires_outermost_round():
    assert ranklint._wrapped_in("round(a / b, 12)", "round")
    assert not ranklint._wrapped_in("round(a, 2) / b", "round")
    assert not ranklint._wrapped_in("1 + round(a / b, 12)", "round")


# -- Spark-side heuristics --------------------------------------------------

def _write(tmp_path, body: str) -> Path:
    p = tmp_path / "mod.py"
    p.write_text(body)
    return p


def test_spark_unrounded_alias_provenance_flagged(tmp_path):
    p = _write(
        tmp_path,
        "def q999_bad(spark, sf_dir):\n"
        '    s = df.select((dot(a, b) / n).alias("score"))\n'
        '    w = Window.partitionBy("g").orderBy(F.col("score").desc())\n'
        "    return s.withColumn('r', F.row_number().over(w))\n",
    )
    hits = ranklint.spark_violations(p)
    assert len(hits) == 1 and hits[0][0] == "q999_bad"


def test_spark_rounded_alias_safe(tmp_path):
    p = _write(
        tmp_path,
        "def q999_ok(spark, sf_dir):\n"
        '    s = df.select(F.round(dot(a, b) / n, 12).alias("score"))\n'
        '    w = Window.partitionBy("g").orderBy(F.col("score").desc())\n'
        "    return s.withColumn('r', F.row_number().over(w))\n",
    )
    assert ranklint.spark_violations(p) == []


def test_spark_pragma_escapes(tmp_path):
    p = _write(
        tmp_path,
        "def q999_pragma(spark, sf_dir):\n"
        '    s = df.select((dot(a, b) / n).alias("score"))\n'
        "    # rank-ok: per-row fold, bit-identical cross-engine\n"
        '    w = Window.partitionBy("g").orderBy(F.col("score").desc())\n'
        "    return s.withColumn('r', F.row_number().over(w))\n",
    )
    assert ranklint.spark_violations(p) == []


def test_spark_receiver_chain_aliases_not_keys(tmp_path):
    # q228 regression: aliases in the RECEIVER chain (.select(...).orderBy)
    # must not be treated as rank keys — only orderBy's own arguments
    p = _write(
        tmp_path,
        "def q999_recv(spark, sf_dir):\n"
        "    return (\n"
        '        v.select((F.col("w") / F.col("l")).alias("v"),\n'
        '                 F.round("v", 6).alias("loading"))\n'
        '        .orderBy(F.abs(F.col("loading")).desc())\n'
        "        .limit(5)\n"
        "    )\n",
    )
    assert ranklint.spark_violations(p) == []


def test_numpy_topk_without_round_flagged(tmp_path):
    p = _write(
        tmp_path,
        "def score(batches):\n"
        "    S = Cn @ Pn.T\n"
        "    idx = np.argmax(S, axis=0)\n"
        "    return idx\n",
    )
    hits = ranklint.numpy_violations(p)
    assert len(hits) == 1 and hits[0][0] == "score"


def test_numpy_topk_with_round_safe(tmp_path):
    p = _write(
        tmp_path,
        "def score(batches):\n"
        "    S = Cn @ Pn.T\n"
        "    np.round(S, 12, out=S)\n"
        "    idx = np.argmax(S, axis=0)\n"
        "    return idx\n",
    )
    assert ranklint.numpy_violations(p) == []


# -- the catalog-wide invariant --------------------------------------------

def test_catalog_and_operators_are_clean():
    assert ranklint.main() == 0
