"""Unpivot / melt operators (SURVEY §2.3 U1–U4) — the reference's signature op.

Spark ≥3.4 has a native ``DataFrame.unpivot`` (Expand physical node): it
GENERATES rows partition-locally with **no shuffle**, so melting a 100 TB wide
scan is embarrassingly parallel — the first shuffle happens only at the
downstream aggregation, exactly where it must.

Reference cites (into /root/reference/):
- U1 1-id melt + header normalize: 247/tools/allocation_tool.py:53-91
- U2 price melt + vendor const: 247/tools/pricesheet_tool.py:57-93
- U3 2-id melt with parsed values: Flips/tools/big_flip_tool.py:194-204
- U4 4-id melt, positional store range, numeric-only store labels:
  Flips/tools/baby_flip_tool.py:163-191
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _is_numeric_name(name: str) -> bool:
    try:
        float(str(name).strip())
        return True
    except ValueError:
        return False


def melt(
    df: DataFrame,
    ids: list[str],
    value_cols: list[str] | None = None,
    var_name: str = "variable",
    value_name: str = "value",
    numeric_vars_only: bool = False,
    clean_var_label: bool = True,
) -> DataFrame:
    """Wide→long unpivot.

    - ``value_cols`` defaults to every non-id column.
    - ``numeric_vars_only``: keep only columns whose *name* is numeric-ish
      (store/branch headers like ``114`` / ``449.0``) — U4 semantics.
    - ``clean_var_label``: strip trailing ``.0`` from the label column
      (``'449.0'`` → ``'449'``) — U1 header normalization.
    """
    vals = value_cols if value_cols is not None else [c for c in df.columns if c not in ids]
    if numeric_vars_only:
        vals = [c for c in vals if _is_numeric_name(c)]
    if not vals:
        raise ValueError("melt: no value columns to unpivot")
    # Wide-sheet headers are arbitrary text ('449.0', 'Lot #') that breaks
    # dotted-name resolution, so unpivot through positional temp names and
    # restore the (optionally cleaned) label via a map literal afterwards.
    import re

    def label(c: str) -> str:
        return re.sub(r"\.0{1,2}$", "", c.strip()) if clean_var_label else c

    tmp = {f"_v{i}": c for i, c in enumerate(vals)}
    # unify value types: unpivot requires a common type; cast to string and
    # let the caller parse (the reference's cells are arbitrarily messy too)
    def q(c: str) -> Column:
        return F.col(f"`{c}`")

    casted = df.select(
        *[q(c) for c in ids],
        *[q(c).cast("string").alias(t) for t, c in tmp.items()],
    )
    out = casted.unpivot(ids, list(tmp), var_name, value_name)
    import itertools

    mapping = F.create_map(
        *itertools.chain.from_iterable(
            (F.lit(t), F.lit(label(c))) for t, c in tmp.items()
        )
    )
    return out.withColumn(var_name, mapping[F.col(var_name)])


def melt_between(
    df: DataFrame,
    ids: list[str],
    after: str,
    before: str,
    var_name: str = "variable",
    value_name: str = "value",
    numeric_vars_only: bool = True,
) -> DataFrame:
    """U4: unpivot only the columns strictly BETWEEN two named columns
    (positional semantics on the schema, e.g. stores between DESC and Lot #)."""
    cols = list(df.columns)
    try:
        lo, hi = cols.index(after), cols.index(before)
    except ValueError as e:
        raise ValueError(f"melt_between: boundary column missing: {e}") from e
    vals = cols[lo + 1 : hi]
    return melt(
        df, ids, vals, var_name, value_name, numeric_vars_only=numeric_vars_only
    )
