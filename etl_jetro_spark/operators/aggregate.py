"""Aggregation operators (SURVEY §2.4 A1–A6).

All shapes are plain hash aggregations — Catalyst gives partial (map-side)
+ final aggregation automatically, so at 100 TB the shuffle carries only
per-partition partial sums, not raw rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_jetro_spark.functions.text import parse_money


def sum_by(
    df: DataFrame,
    keys: list[str],
    value: str | Column,
    out: str = "sum_value",
    parse: bool = False,
    ceil: bool = False,
    drop_zero: bool = True,
) -> DataFrame:
    """(keys) → sum(value) with the reference's trimmings:

    - ``parse``: value cells are messy text → ``parse_money`` first
      (A2, big_flip_tool.py:203-207)
    - pre-coerce NULL→0 (A1's ``fillna(0)``, allocation_tool.py:87-91)
    - ``ceil``: ceil the sum to a long (A2)
    - ``drop_zero``: post-filter ``sum != 0`` (P8)
    """
    v = parse_money(value) if parse else F.col(value) if isinstance(value, str) else value
    # try_cast: ANSI mode (Spark 4 default) would throw on messy cells;
    # the reference's fillna(0) semantics want junk -> 0 instead.
    v = F.coalesce(v.try_cast("double"), F.lit(0.0))
    agg = F.sum(v)
    if ceil:
        agg = F.ceil(agg).cast("long")
    res = df.groupBy(*keys).agg(agg.alias(out))
    if drop_zero:
        res = res.filter(F.col(out) != 0)
    return res


def first_per_group(
    df: DataFrame, keys: list[str], order_by: list[Column], cols: list[str]
) -> DataFrame:
    """A6: deterministic first row per group (min_by semantics) — used for
    per-Branch header values in the macro sinks. Single shuffle, no window."""
    # order fields get positional aliases so an output col may also be a key
    # of the ordering without creating duplicate struct fields
    strct = F.struct(
        *[o.alias(f"_o{i}") for i, o in enumerate(order_by)],
        *[F.col(c).alias(c) for c in cols],
    )
    agg = df.groupBy(*keys).agg(F.min(strct).alias("_first"))
    return agg.select(*keys, *[F.col(f"_first.{c}").alias(c) for c in cols])


def partial_sums(
    df: DataFrame,
    keys: list[str],
    value: str | Column,
    sum_col: str = "psum",
    cnt_col: str = "pcnt",
) -> DataFrame:
    """Algebraic partial aggregate (sum, count) per key — the unit of
    incremental materialized-view maintenance: partials from disjoint
    batches merge losslessly (``merge_partials``) without touching the
    already-aggregated history, so a 100 TB rollup absorbs a daily delta
    by re-aggregating ONLY the delta plus one merge over partial rows
    (cardinality = distinct keys, not raw rows)."""
    v = F.col(value) if isinstance(value, str) else value
    return df.groupBy(*keys).agg(
        F.sum(v).alias(sum_col), F.count(v).alias(cnt_col)
    )


def merge_partials(
    partials: list[DataFrame],
    keys: list[str],
    sum_col: str = "psum",
    cnt_col: str = "pcnt",
) -> DataFrame:
    """Merge per-batch partial aggregates: union + re-sum. sum-of-sums and
    sum-of-counts are exact (algebraic); avg/variance derive from them at
    read time. The shuffle carries one row per (batch, key), never raw
    data."""
    merged = partials[0]
    for p in partials[1:]:
        merged = merged.unionByName(p)
    return merged.groupBy(*keys).agg(
        F.sum(sum_col).alias(sum_col), F.sum(cnt_col).alias(cnt_col)
    )


def latest_by(df: DataFrame, order_col: str, cols: list[str] | None = None) -> DataFrame:
    """A5: global argmax — the row with the greatest ``order_col`` (newest
    file by mtime). ``max_by`` aggregates without a sort."""
    cols = cols or [c for c in df.columns if c != order_col]
    agg = df.agg(
        *[F.max_by(F.col(c), F.col(order_col)).alias(c) for c in cols],
        F.max(order_col).alias(order_col),
    )
    return agg.select(*df.columns)


def exact_group_percentiles(
    df: DataFrame,
    keys: list[str],
    value: str | Column,
    ps: dict[str, float],
) -> DataFrame:
    """Distributed EXACT linear-interpolation percentiles per group —
    the scale-safe replacement for Spark's ``percentile`` aggregate,
    which buffers each group's whole value multiset in executor memory
    (ObjectHashAggregate): at raw-row scale a handful of groups means a
    handful of OOMs. Here no task ever holds a group:

    - pass 1 (one shuffle): hash-partition by group, external SORT by
      value; ``row_number`` and the per-group ``count`` come out of the
      same sorted pass (two Window nodes, one Exchange, spill-safe);
    - pass 2: each percentile p needs only ranks floor(r)/ceil(r) where
      r = 1 + (n-1)·p — filter to those ≤2 rows per (group, p) and
      aggregate the interpolation v_lo + frac·(v_hi − v_lo), the same
      formula DuckDB's ``quantile_cont`` and Spark's ``percentile`` use.

    ``ps`` maps output column name → fraction in [0, 1]. NULL values are
    excluded (matching both engines' aggregate semantics). Groups where
    every value is NULL vanish (no rank rows survive) — same as DuckDB
    returning NULL rows only when other aggregates keep the group alive.
    """
    from pyspark.sql import Window

    for name, p in ps.items():
        if not (0.0 <= p <= 1.0):
            raise ValueError(f"percentile {name}={p} outside [0, 1]")
    v = F.col(value) if isinstance(value, str) else value
    d = df.filter(v.isNotNull()).select(*keys, v.alias("_v"))
    w = Window.partitionBy(*keys)
    ranked = d.withColumn(
        "_rn", F.row_number().over(w.orderBy(F.col("_v")))
    ).withColumn("_n", F.count("_v").over(w))

    def bounds(p: float):
        r = F.lit(1.0) + (F.col("_n") - F.lit(1)).cast("double") * F.lit(p)
        lo = F.floor(r)
        frac = r - lo
        hi = F.when(frac > 0, lo + 1).otherwise(lo)
        return lo, hi, frac

    keep = None
    for p in set(ps.values()):
        lo, hi, _ = bounds(p)
        cond = (F.col("_rn") == lo) | (F.col("_rn") == hi)
        keep = cond if keep is None else (keep | cond)
    aggs = []
    for name, p in ps.items():
        lo, hi, frac = bounds(p)
        vlo = F.max(F.when(F.col("_rn") == lo, F.col("_v")))
        vhi = F.max(F.when(F.col("_rn") == hi, F.col("_v")))
        # frac is group-constant (derives from _n); max() lifts it into
        # the aggregate namespace
        aggs.append((vlo + F.max(frac) * (vhi - vlo)).alias(name))
    return ranked.filter(keep).groupBy(*keys).agg(*aggs)
