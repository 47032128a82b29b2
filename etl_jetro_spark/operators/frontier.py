"""Pareto frontier (skyline) operator.

2-D skyline — rows not dominated under (minimize x, maximize y) — via the
classic sweep decomposition instead of the quadratic NOT-EXISTS self-join:

- one partial-agg pass collapses rows to per-distinct-x maxima (at most
  |distinct x| rows — at 100 TB this is the column's NDV, not the table);
- one window over the x-ordering computes the strictly-before running max;
- the dominance test is then per-row arithmetic on the joined-back frame.

A row (x, y) is dominated iff some row has x' < x with y' >= y (caught by
the running max over strictly-smaller x) or x' = x with y' > y (caught by
the per-x max). Ties on both coordinates are mutually non-dominating and
all kept — matching the NOT-EXISTS definition the oracle runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pareto_frontier(
    df: DataFrame, min_col: str, max_col: str
) -> DataFrame:
    """Rows of ``df`` not dominated under (minimize ``min_col``, maximize
    ``max_col``). Keeps all input columns."""
    per_x = df.groupBy(F.col(min_col).alias("_x")).agg(
        F.max(F.col(max_col)).alias("_xmax")
    )
    w = (
        Window.orderBy("_x")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # per_x is NDV-sized; the unpartitioned window sorts keys, not rows
    bounds = per_x.select(
        "_x",
        "_xmax",
        F.max("_xmax").over(w).alias("_premax"),
    )
    # equi-join back on x; AQE promotes to broadcast when the NDV frame is
    # small (it usually is), and falls back to hash join when x is near-unique
    j = df.join(bounds, df[min_col] == bounds["_x"], "left")
    keep = (
        F.col("_premax").isNull() | (F.col("_premax") < F.col(max_col))
    ) & (F.col("_xmax") <= F.col(max_col))
    return j.filter(keep).select(*df.columns)
