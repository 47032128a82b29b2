#!/usr/bin/env python
"""Lint: no raw-double SUM of a money column may ship in plans/queries.py.

The defect class (round-9 sf3/30x oracle gate, 7 real hits): a raw double
SUM of a money column reaches a magnitude where the displayed round unit
is below fold-order ulp noise, so Spark's partial-agg tree and a
sequential fold round the last digit apart.  The class scales with SUM
MAGNITUDE — each 10x of data converts one more decimal place of every
money total from stable to noise — so the only scale-proof aggregation is
over row-level exact integer units (functions/money.py).

What this lint checks, for every catalog query:

- Spark side (AST): any ``F.sum(...)`` / ``F.try_sum(...)`` whose argument
  references a base money column (l_extendedprice, o_totalprice,
  ps_supplycost, p_retailprice) must quantize inside the sum — a
  ``decimal(``/``DECIMAL(`` cast or a functions.money helper
  (``M.sum_micro``/``M.exact_*``/``M.cents``/``M.micro_units``/
  ``M.net_units4``) must appear inside the call. ``avg``/``min``/``max``
  of money are magnitude-bounded and exempt.
- Oracle side (evaluated SQL): every ``sum( ... )`` span that mentions a
  base money column must contain an integer/decimal quantization marker
  (BIGINT / HUGEINT / DECIMAL) inside the span.

Per-query allowlist below for deliberate raw-double sums; every entry
must say WHY the float fold cannot reach the displayed digits.

Usage: python tools/moneylint.py   (exit 1 on violations)
"""

from __future__ import annotations

import ast
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

QUERIES_PATH = REPO / "etl_jetro_spark" / "plans" / "queries.py"

MONEY_COLS = re.compile(
    r"\b(l_extendedprice|o_totalprice|ps_supplycost|p_retailprice)\b"
)
SPARK_SAFE = re.compile(
    r"decimal\(|M\.sum_micro|M\.exact_|M\.cents|M\.micro_units|M\.net_units4"
)
# row-level F.round(...).cast("long"/"bigint") INSIDE the sum argument is
# integer quantization too (the segment is only the F.sum(...) call, so a
# round appearing in it is per-row, not around the sum)
SPARK_SAFE_ROUNDCAST = re.compile(
    r"F\.round\(.*\.cast\(\"(long|bigint|int)\"\)", re.DOTALL
)
SQL_SAFE = re.compile(r"BIGINT|HUGEINT|DECIMAL", re.IGNORECASE)
# sum(CASE WHEN <cond on money col> THEN <int> ELSE <int> END) is a
# counter, not a money sum
SQL_CASE_COUNTER = re.compile(
    r"^\s*CASE\s+WHEN\s+.*\s+THEN\s+-?\d+\s+(WHEN\s+.*\s+THEN\s+-?\d+\s+)*"
    r"ELSE\s+-?\d+\s+END\s*$",
    re.IGNORECASE | re.DOTALL,
)

# name -> why a raw-double money sum is provably safe for this query
ALLOW: dict[str, str] = {}


def _enclosing_query(funcs: list[tuple[str, int, int]], lineno: int) -> str:
    for name, lo, hi in funcs:
        if lo <= lineno <= hi:
            return name
    return f"<module>:{lineno}"


def spark_violations(src: str) -> list[tuple[str, int, str]]:
    tree = ast.parse(src)
    funcs = [
        (n.name, n.lineno, n.end_lineno or n.lineno)
        for n in ast.walk(tree)
        if isinstance(n, ast.FunctionDef)
    ]
    out = []
    for node in ast.walk(tree):
        if not (
            isinstance(node, ast.Call)
            and isinstance(node.func, ast.Attribute)
            and node.func.attr in ("sum", "try_sum", "sum_distinct")
            and isinstance(node.func.value, ast.Name)
            and node.func.value.id == "F"
        ):
            continue
        seg = ast.get_source_segment(src, node) or ""
        if (
            MONEY_COLS.search(seg)
            and not SPARK_SAFE.search(seg)
            and not SPARK_SAFE_ROUNDCAST.search(seg)
        ):
            out.append(
                (_enclosing_query(funcs, node.lineno), node.lineno, seg[:90])
            )
    return out


def _sum_spans(sql: str) -> list[str]:
    """Balanced-paren extraction of every sum(...) argument span."""
    spans = []
    for m in re.finditer(r"\bsum\s*\(", sql, re.IGNORECASE):
        i, depth = m.end(), 1
        while i < len(sql) and depth:
            if sql[i] == "(":
                depth += 1
            elif sql[i] == ")":
                depth -= 1
            i += 1
        spans.append(sql[m.end() : i - 1])
    return spans


def oracle_violations() -> list[tuple[str, str]]:
    from etl_jetro_spark.plans.queries import ORACLES

    out = []
    for name, sql in ORACLES.items():
        for span in _sum_spans(sql):
            if (
                MONEY_COLS.search(span)
                and not SQL_SAFE.search(span)
                and not SQL_CASE_COUNTER.match(span)
            ):
                out.append((name, re.sub(r"\s+", " ", span.strip())[:90]))
    return out


def main() -> int:
    src = QUERIES_PATH.read_text()
    bad = []
    for qname, lineno, seg in spark_violations(src):
        if qname.lstrip("_") in ALLOW or qname in ALLOW:
            continue
        bad.append(f"SPARK {qname} plans/queries.py:{lineno}  {seg}")
    for qname, span in oracle_violations():
        if qname in ALLOW:
            continue
        bad.append(f"SQL   {qname}  sum({span})")
    for line in bad:
        print(line)
    print(f"== moneylint: {len(bad)} violation(s) ==")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
