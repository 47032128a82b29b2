"""Bucketed range join: pairs within a numeric/temporal distance.

Spark has no native range join; the naive theta-join (``|a.ts - b.ts| <=
d``) degenerates to a per-key cartesian product. The scalable formulation
bins the range key into buckets of width ``d`` and equi-joins each left row
to its own and neighboring buckets (every qualifying pair shares or abuts a
bucket), then applies the exact predicate — turning an O(n²) theta join
into a hash join with 3× row amplification on one side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def range_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    range_col: str,
    max_distance: int,
    left_suffix: str = "_a",
    right_suffix: str = "_b",
) -> DataFrame:
    """All (left, right) pairs sharing ``keys`` with
    ``|left.range_col - right.range_col| <= max_distance``.

    ``range_col`` must be integral (e.g. epoch ns). Output columns carry
    the suffixes except the join keys.
    """
    # Bucket index via exact integer floor division. Double division +
    # cast loses precision above 2^53 (epoch-ns keys) and truncates toward
    # zero for negatives (double-width bucket 0); subtracting pmod keeps
    # everything in long arithmetic with true floor semantics.
    bucket = F.expr(
        f"(`{range_col}` - pmod(`{range_col}`, {max_distance}))"
        f" div {max_distance}"
    )
    lb = left.withColumn(
        "_bucket", F.explode(F.array(*[bucket + k for k in (-1, 0, 1)]))
    )
    rb = right.withColumn("_bucket", bucket)
    lren = lb.select(
        *[F.col(k) for k in keys],
        "_bucket",
        *[
            F.col(c).alias(c + left_suffix)
            for c in left.columns
            if c not in keys
        ],
    )
    rren = rb.select(
        *[F.col(k) for k in keys],
        "_bucket",
        *[
            F.col(c).alias(c + right_suffix)
            for c in right.columns
            if c not in keys
        ],
    )
    joined = lren.join(rren, keys + ["_bucket"])
    dist = F.abs(
        F.col(range_col + left_suffix) - F.col(range_col + right_suffix)
    )
    return joined.filter(dist <= max_distance).drop("_bucket")
