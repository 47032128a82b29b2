#!/usr/bin/env python
"""ranklint — every rank decision over a computed float must round first.

The defect class (round-10, judge-caught in knn_join_panel after the
builder root-fixed it in operators/retrieval.py and q359): a rank window
or local top-k ordered by a COMPUTED float (an aggregate fold, a
division of folds, a matmul) breaks exact ties on fold-order ulp noise
instead of the declared id tiebreak — and which side of the tie wins is
engine- and batch-split-dependent, so the property holds at sf0.01 and
falsifies under duplicate-rich data. The manual discipline ("round to
12 dp before any ranking") provably does not self-enforce; this lint
makes it structural, à la tools/moneylint.py for money sums.

What is checked:

- **Oracle SQL** (every catalog oracle): each ORDER BY key inside an
  OVER(...) window and each top-level ``ORDER BY ... LIMIT`` top-k key.
  A key that is (or resolves through one ``AS <name>`` hop to) an
  expression containing float-producing operations (division, sqrt/ln/
  exp/pow, avg, list_dot_product/list_cosine_similarity) must be
  wrapped in ``round(...)`` at its outermost level. Keys that are plain
  (stored) columns, integers (CAST AS BIGINT/INT/HUGEINT, count,
  row_number, epoch arithmetic), or already-rounded are safe: stored
  floats are byte-identical across engines, integers are exact — only
  the computed-float fold carries engine-dependent noise.
- **Spark source** (plans/queries.py + operators/*.py): each
  ``.orderBy(...)`` call (rank windows and top-k sorts). Column-name
  keys resolve through ``.alias("name")`` provenance within the same
  function; the producing expression must be ``F.round(...)`` at its
  top, integer-typed, or free of float-producing ops.
- **Numpy local top-k** (operators/*.py): any function using
  ``np.argmax``/``np.argsort``/``np.lexsort`` on a score matrix must
  also call ``np.round`` (the panel-path lesson verbatim).

Escapes, both deliberate and documented: a ``-- rank-ok: <why>`` pragma
inside the oracle SQL, a ``# rank-ok: <why>`` comment on or just above
the Spark call line, or an ALLOW entry below naming WHY ties are
impossible or harmless for that site.

Usage: python tools/ranklint.py   (exit 1 on violations)
"""

from __future__ import annotations

import ast
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

QUERIES_PATH = REPO / "etl_jetro_spark" / "plans" / "queries.py"
OPERATOR_GLOB = "etl_jetro_spark/operators/*.py"

# float-producing operations whose result carries fold/engine noise
SQL_FLOATY = re.compile(
    r"(/|\bsqrt\s*\(|\bln\s*\(|\blog\s*\(|\bexp\s*\(|\bpow(er)?\s*\(|"
    r"\bavg\s*\(|\bstddev|\blist_dot_product\s*\(|"
    r"\blist_cosine_similarity\s*\()",
    re.IGNORECASE,
)
PY_FLOATY = re.compile(
    r"(/(?!/)|F\.sqrt\(|F\.exp\(|F\.log\(|F\.pow\(|F\.avg\(|F\.mean\(|"
    r"F\.stddev|\bcosine\(|\bdot\()"
)
# integer-exact producers: noise-free by construction
SQL_INTY = re.compile(
    r"^\s*(CAST\s*\(.*AS\s+(BIG|HUGE)?INT(EGER)?\s*\)|count\s*\(|"
    r"row_number\s*\(|rank\s*\(|dense_rank\s*\()",
    re.IGNORECASE | re.DOTALL,
)
PY_INTY = re.compile(
    r"\.cast\(\"(long|int|bigint|short|decimal[^\"]*)\"\)\s*$|"
    r"^F\.(count|row_number|rank|dense_rank|xxhash64|monotonically)"
)


def _wrapped_in(expr: str, fn: str) -> bool:
    """True iff expr is `fn( ... )` with the close paren at the end."""
    e = expr.strip()
    m = re.match(rf"{fn}\s*\(", e, re.IGNORECASE)
    if not m:
        return False
    depth, i = 1, m.end()
    while i < len(e) and depth:
        if e[i] == "(":
            depth += 1
        elif e[i] == ")":
            depth -= 1
        i += 1
    return depth == 0 and e[i:].strip(" ,") == ""


# ---------------------------------------------------------------------------
# Oracle SQL side
# ---------------------------------------------------------------------------

def _split_keys(keylist: str) -> list[str]:
    """Split an ORDER BY key list on top-level commas."""
    keys, depth, cur = [], 0, []
    for ch in keylist:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            keys.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        keys.append("".join(cur))
    return [
        re.sub(
            r"\s+(DESC|ASC|NULLS\s+(FIRST|LAST))\s*$", "",
            k.strip(), flags=re.IGNORECASE,
        )
        for k in keys
        if k.strip()
    ]


def _order_by_spans(sql: str) -> list[str]:
    """Every ORDER BY key list that decides a rank: inside OVER(...) and
    in `ORDER BY ... LIMIT` top-k selects."""
    spans = []
    for m in re.finditer(r"\bORDER\s+BY\b", sql, re.IGNORECASE):
        i = m.end()
        depth = 0
        while i < len(sql):
            ch = sql[i]
            if ch == "(":
                depth += 1
            elif ch == ")":
                if depth == 0:
                    break  # closes the enclosing OVER(...)
                depth -= 1
            elif depth == 0 and sql[i : i + 5].upper() in ("LIMIT", "ROWS "):
                break
            elif depth == 0 and re.match(
                r"(SELECT|FROM|WHERE|GROUP|HAVING|WINDOW|UNION)\b",
                sql[i : i + 8], re.IGNORECASE,
            ):
                # plain output ORDER BY without LIMIT → not a decision
                break
            i += 1
        span = sql[m.end() : i]
        tail = sql[i : i + 160]
        in_over = i < len(sql) and sql[i] == ")"
        topk = re.match(r"\s*LIMIT\b", tail, re.IGNORECASE)
        if in_over or topk:
            spans.append(span)
    return spans


def _sql_defs(sql: str) -> dict[str, list[str]]:
    """name -> list of defining expressions from `<expr> AS name` sites.
    Balanced-paren backward scan from each AS."""
    defs: dict[str, list[str]] = {}
    for m in re.finditer(r"\bAS\s+([a-zA-Z_][a-zA-Z0-9_]*)", sql):
        name = m.group(1)
        if name.upper() in ("BIGINT", "INT", "INTEGER", "HUGEINT", "DOUBLE",
                            "VARCHAR", "BOOLEAN"):
            continue
        j = m.start() - 1
        depth = 0
        start = 0
        while j >= 0:
            ch = sql[j]
            if ch == ")":
                depth += 1
            elif ch == "(":
                if depth == 0:
                    start = j + 1
                    break
                depth -= 1
            elif depth == 0 and ch == ",":
                start = j + 1
                break
            elif depth == 0 and j >= 5 and re.match(
                r"(SELECT|VALUES)\b", sql[j - 5 : j + 2], re.IGNORECASE
            ):
                start = j + 2
                break
            j -= 1
        expr = sql[start : m.start()].strip()
        # strip a leading SELECT/keyword remnant
        expr = re.sub(r"^(SELECT|WHEN|THEN|ELSE)\b", "", expr,
                      flags=re.IGNORECASE).strip()
        defs.setdefault(name, []).append(expr)
    return defs


def _sql_key_unsafe(key: str, defs: dict[str, list[str]]) -> str | None:
    """Return the offending expression if this rank key is noisy."""
    k = key.strip()
    if re.fullmatch(r"[a-zA-Z_][a-zA-Z0-9_.]*", k):
        # bare identifier: resolve one AS-hop; unresolvable → stored col
        base = k.split(".")[-1]
        for expr in defs.get(base, []):
            if (
                SQL_FLOATY.search(expr)
                and not _wrapped_in(expr, "round")
                and not SQL_INTY.match(expr)
            ):
                return expr
        return None
    if _wrapped_in(k, "round") or SQL_INTY.match(k):
        return None
    if SQL_FLOATY.search(k):
        return k
    return None


def oracle_violations() -> list[tuple[str, str]]:
    from etl_jetro_spark.plans.queries import ORACLES

    out = []
    for name, sql in ORACLES.items():
        if "-- rank-ok:" in sql:
            continue
        defs = _sql_defs(sql)
        seen = set()
        for span in _order_by_spans(sql):
            for key in _split_keys(span):
                bad = _sql_key_unsafe(key, defs)
                if bad and (name, key) not in seen:
                    seen.add((name, key))
                    out.append(
                        (name, re.sub(r"\s+", " ", f"{key}  <=  {bad}")[:110])
                    )
    return out


# ---------------------------------------------------------------------------
# Spark side
# ---------------------------------------------------------------------------

def _segmenter(src: str):
    """Fast ast.get_source_segment: one splitlines, O(span) per call
    (the stdlib helper re-splits the whole file per call — quadratic
    over the 24k-line catalog)."""
    lines = src.splitlines(keepends=True)

    def seg(node: ast.AST) -> str:
        try:
            lo, hi = node.lineno - 1, node.end_lineno - 1
            if lo == hi:
                return lines[lo][node.col_offset : node.end_col_offset]
            parts = [lines[lo][node.col_offset :]]
            parts.extend(lines[lo + 1 : hi])
            parts.append(lines[hi][: node.end_col_offset])
            return "".join(parts)
        except (AttributeError, IndexError, TypeError):
            return ""

    return seg


def _fn_ranges(tree: ast.AST) -> list[tuple[str, int, int]]:
    return [
        (n.name, n.lineno, n.end_lineno or n.lineno)
        for n in ast.walk(tree)
        if isinstance(n, ast.FunctionDef)
    ]


def _enclosing(funcs: list[tuple[str, int, int]], lineno: int) -> str:
    best = None
    for name, lo, hi in funcs:
        if lo <= lineno <= hi and (best is None or hi - lo < best[1]):
            best = (name, hi - lo)
    return best[0] if best else f"<module>:{lineno}"


def _alias_defs(src: str, tree: ast.AST) -> dict[tuple[str, str], list[str]]:
    """(enclosing_fn, alias) -> producing expression segments."""
    seg = _segmenter(src)
    funcs = _fn_ranges(tree)
    defs: dict[tuple[str, str], list[str]] = {}
    for node in ast.walk(tree):
        if (
            isinstance(node, ast.Call)
            and isinstance(node.func, ast.Attribute)
            and node.func.attr == "alias"
            and node.args
            and isinstance(node.args[0], ast.Constant)
            and isinstance(node.args[0].value, str)
        ):
            fn = _enclosing(funcs, node.lineno)
            defs.setdefault((fn, node.args[0].value), []).append(
                seg(node.func.value)
            )
    return defs


def _py_key_names(node: ast.Call) -> list[str]:
    """Column names referenced by orderBy ARGUMENTS (F.col("x"), "x",
    desc("x")) — the receiver chain must not contribute names."""
    names = []
    for arg in list(node.args) + [k.value for k in node.keywords]:
        for a in ast.walk(arg):
            if isinstance(a, ast.Constant) and isinstance(a.value, str):
                if re.fullmatch(r"[a-zA-Z_][a-zA-Z0-9_]*", a.value):
                    names.append(a.value)
    return names


def _py_expr_unsafe(expr: str) -> bool:
    e = expr.strip()
    return bool(
        PY_FLOATY.search(e)
        and not e.startswith("F.round(")
        and not PY_INTY.search(e)
    )


def spark_violations(path: Path) -> list[tuple[str, int, str]]:
    src = path.read_text()
    lines = src.splitlines()
    tree = ast.parse(src)
    seg_of = _segmenter(src)
    funcs = _fn_ranges(tree)
    aliases = _alias_defs(src, tree)
    out = []
    for node in ast.walk(tree):
        if not (
            isinstance(node, ast.Call)
            and isinstance(node.func, ast.Attribute)
            and node.func.attr == "orderBy"
        ):
            continue
        # pragma on the call line or the two lines above
        lo = max(0, node.lineno - 3)
        ctx = "\n".join(lines[lo : node.end_lineno or node.lineno])
        if "# rank-ok:" in ctx:
            continue
        fn = _enclosing(funcs, node.lineno)
        seg = seg_of(node)
        arg_seg = seg[seg.index("orderBy") :] if "orderBy" in seg else seg
        # inline computed expression used directly as the key
        inline_bad = _py_expr_unsafe(arg_seg) and "F.col(" not in arg_seg
        bads = []
        if inline_bad:
            bads.append(arg_seg[:80])
        for name in _py_key_names(node):
            for d in aliases.get((fn, name), []):
                if _py_expr_unsafe(d):
                    bads.append(f"{name} <= {d[:70]}")
        for b in bads:
            out.append((fn, node.lineno, re.sub(r"\s+", " ", b)))
    return out


def numpy_violations(path: Path) -> list[tuple[str, int, str]]:
    src = path.read_text()
    tree = ast.parse(src)
    seg_of = _segmenter(src)
    out = []
    for n in ast.walk(tree):
        if not isinstance(n, ast.FunctionDef):
            continue
        seg = seg_of(n)
        uses_topk = re.search(r"np\.(argmax|argsort|lexsort)\(", seg)
        if not uses_topk:
            continue
        if "np.round" in seg or "# rank-ok:" in seg:
            continue
        out.append((n.name, n.lineno, f"np.{uses_topk.group(1)} without np.round"))
    return out


# site key -> why ties are impossible or harmless there.
#
# The load-bearing distinction (why these are NOT the knn_join_panel
# defect): the noise class needs a rank key whose low bits depend on an
# ORDER-VARYING fold — a partial aggregate over shuffled rows, or
# numpy's pairwise summation vs a sequential fold. A per-ROW expression
# (zip_with/aggregate on Spark, list_dot_product/list_sum on DuckDB)
# walks the array left-to-right on both engines: the identical IEEE op
# sequence gives bit-identical doubles, so equal inputs tie EXACTLY and
# the declared id tiebreak decides — on both engines, at any SF.
_PER_ROW_FOLD = (
    "per-row sequential fold (zip_with <-> list_dot_product/list_sum): "
    "identical IEEE op sequence on both engines, duplicate inputs tie "
    "bit-exactly, id tiebreak decides"
)
ALLOW: dict[str, str] = {
    "q33_ann_lsh_bucket": _PER_ROW_FOLD,
    "q57_ann_quality": _PER_ROW_FOLD,
    "q102_ivf_ann": _PER_ROW_FOLD,
    "q146_semantic_dedup": _PER_ROW_FOLD,
    "q256_two_level_assign_recall": _PER_ROW_FOLD,
    "q260_label_cluster_divergence": _PER_ROW_FOLD,
    "q283_embedding_norm_outliers": _PER_ROW_FOLD,
    "similarity.py:ivf_topk": _PER_ROW_FOLD,
    "q68_tfidf_top_terms": (
        "tf * (n/df) is ONE mul + ONE div of exact integers — a single "
        "IEEE expression, bit-identical cross-engine; ties tie exactly"
    ),
    "q168_dedup_gray_zone": (
        "int_sum / 16.0 divides an exact integer by a power of two — the "
        "quotient is EXACT, not noisy"
    ),
    "q191_weighted_reservoir": (
        "ln(u)/n_chars keys are a.s. distinct (u is a distinct md5-derived "
        "real per doc); exact ties cannot occur, and near-ties are stable "
        "because both engines evaluate the same two-op expression"
    ),
    "q232_changepoint_detection": (
        "variance reduction is a fixed +,-,*,/ sequence over exact integer "
        "CASTs (no aggregate float fold) — bit-identical cross-engine"
    ),
    "q281_cheapest_supplier_observed": (
        "stored-column division (l_extendedprice / l_quantity) per row — "
        "both engines divide the same two stored doubles"
    ),
    "q314_length_diversity_spearman": (
        "nd / nt is one division of exact counts — bit-identical; the "
        "Spearman rank tiebreak is the declared id order"
    ),
    "q350_rrf_rank_fusion": (
        "1/(60+ra) + 1/(60+rb) over INTEGER ranks — three exact-input IEEE "
        "ops, bit-identical cross-engine (ranks themselves come from the "
        "12 dp-rounded retrieval scores)"
    ),
    "q369_label_davies_bouldin": (
        "(s_intra + s_intra') / dist where all three inputs are ALREADY "
        "9 dp-rounded — one add + one div of identical doubles"
    ),
}


def main() -> int:
    bad = []
    for name, detail in oracle_violations():
        if name in ALLOW:
            continue
        bad.append(f"SQL   {name}  ORDER BY {detail}")
    for path in sorted(REPO.glob(OPERATOR_GLOB)) + [QUERIES_PATH]:
        rel = path.relative_to(REPO)
        for fn, lineno, detail in spark_violations(path):
            if f"{rel.name}:{fn}" in ALLOW or fn in ALLOW:
                continue
            bad.append(f"SPARK {rel}:{lineno} [{fn}]  {detail}")
        if "operators" in str(rel):
            for fn, lineno, detail in numpy_violations(path):
                if f"{rel.name}:{fn}" in ALLOW or fn in ALLOW:
                    continue
                bad.append(f"NUMPY {rel}:{lineno} [{fn}]  {detail}")
    for line in bad:
        print(line)
    print(f"== ranklint: {len(bad)} violation(s) ==")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
