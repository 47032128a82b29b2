"""Pareto frontier (skyline) operator.

2-D skyline — rows not dominated under (minimize x, maximize y) — via the
classic sweep decomposition instead of the quadratic NOT-EXISTS self-join:

- one partial-agg pass collapses rows to per-distinct-x maxima (at most
  |distinct x| rows — the column's NDV, not the table);
- the strictly-before running max over the x-ordering runs as a
  DISTRIBUTED two-pass sweep (range-partition by x, partition-local
  running max, metadata-sized cross-partition prefix) — no single-task
  global window even when x is near-unique;
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
    df: DataFrame, min_col: str, max_col: str, num_range_partitions: int | None = None
) -> DataFrame:
    """Rows of ``df`` not dominated under (minimize ``min_col``, maximize
    ``max_col``). Keeps all input columns.

    NULL coordinates follow the NOT-EXISTS definition: a row with NULL in
    either coordinate is never dominated (every comparison against NULL is
    non-TRUE) and dominates nothing, so such rows are always kept — they
    bypass the sweep entirely rather than feeding NULLs into it.
    """
    spark = df.sparkSession
    nparts = num_range_partitions or max(
        spark.sparkContext.defaultParallelism, 8
    )
    coords_ok = F.col(min_col).isNotNull() & F.col(max_col).isNotNull()
    null_rows = df.filter(~coords_ok)
    df = df.filter(coords_ok)
    per_x = df.groupBy(F.col(min_col).alias("_x")).agg(
        F.max(F.col(max_col)).alias("_xmax")
    )
    # distributed sweep: equal x values land in one range partition, so a
    # partition-local running max plus the previous partitions' prefix max
    # (metadata-sized: one row per partition) IS the global running max
    parted = (
        per_x.repartitionByRange(nparts, "_x")
        .sortWithinPartitions("_x")
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)  # freeze pid/order for both consumers
    )
    pmax = parted.groupBy("_pid").agg(F.max("_xmax").alias("_pmax"))
    woff = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    # nparts rows — the only unpartitioned window, over metadata
    prefix = pmax.select("_pid", F.max("_pmax").over(woff).alias("_prev"))
    wloc = (
        Window.partitionBy("_pid")
        .orderBy("_x")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bounds = (
        parted.withColumn("_locmax", F.max("_xmax").over(wloc))
        .join(F.broadcast(prefix), "_pid")  # bcast-ok: nparts-row partition metadata
        .select(
            "_x",
            "_xmax",
            # greatest() skips NULLs (null only when both are) — exactly
            # the "no strictly-smaller x yet" semantics
            F.greatest("_locmax", "_prev").alias("_premax"),
        )
    )
    # equi-join back on x; AQE promotes to broadcast when the NDV frame is
    # small (it usually is), and falls back to hash join when x is near-unique
    j = df.join(bounds, df[min_col] == bounds["_x"], "left")
    keep = (
        F.col("_premax").isNull() | (F.col("_premax") < F.col(max_col))
    ) & (F.col("_xmax") <= F.col(max_col))
    return j.filter(keep).select(*df.columns).unionByName(null_rows)


def running_prefix_max(
    df: DataFrame,
    order_col: str,
    value_col: str,
    num_range_partitions: int | None = None,
) -> DataFrame:
    """Inclusive running maximum of ``value_col`` over the global
    ``order_col`` ordering, as a DISTRIBUTED two-pass sweep (the same
    decomposition :func:`pareto_frontier` uses): range-partition by the
    order key, partition-local running max, then a metadata-sized
    cross-partition prefix — no single-task global window at any data
    size. Adds ``_runmax``; all input columns are preserved.

    ``order_col`` must be UNIQUE (an event id, an arrival sequence):
    the local window runs a ROWS frame, so ties would take an
    arbitrary intra-tie order. NULL order or value rows are the
    caller's problem — filter first."""
    spark = df.sparkSession
    nparts = num_range_partitions or max(
        spark.sparkContext.defaultParallelism, 8
    )
    parted = (
        df.repartitionByRange(nparts, order_col)
        .sortWithinPartitions(order_col)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)  # freeze pid/order for both consumers
    )
    pmax = parted.groupBy("_pid").agg(F.max(value_col).alias("_pmax"))
    woff = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    # nparts rows — the only unpartitioned window, over metadata
    prefix = pmax.select("_pid", F.max("_pmax").over(woff).alias("_prev"))
    wloc = (
        Window.partitionBy("_pid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        parted.withColumn("_locmax", F.max(value_col).over(wloc))
        .join(F.broadcast(prefix), "_pid")  # bcast-ok: nparts-row partition metadata
        .withColumn("_runmax", F.greatest("_locmax", "_prev"))
        .drop("_pid", "_locmax", "_prev")
    )


def running_prefix_sum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    num_range_partitions: int | None = None,
) -> DataFrame:
    """Inclusive running SUM of ``value_col`` over the global
    ``order_col`` ordering — the same distributed two-pass sweep as
    :func:`running_prefix_max` (range-partition by the order key,
    partition-local cumsum, metadata-sized cross-partition offsets), so
    no single-task global window at any data size. Adds ``_runsum``;
    all input columns are preserved. Exactness: when ``value_col`` is
    an integer/decimal type the cumsum is exact (sums of exact values
    in a fixed order); double values inherit the usual fold caveat.

    ``order_col`` must be UNIQUE (a rank from
    ``operators.aggregate.group_ranked``, an event id): the local
    window runs a ROWS frame, so ties would take an arbitrary
    intra-tie order."""
    spark = df.sparkSession
    nparts = num_range_partitions or max(
        spark.sparkContext.defaultParallelism, 8
    )
    parted = (
        df.repartitionByRange(nparts, order_col)
        .sortWithinPartitions(order_col)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)  # freeze pid/order for both consumers
    )
    psum = parted.groupBy("_pid").agg(F.sum(value_col).alias("_psum"))
    woff = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    # nparts rows — the only unpartitioned window, over metadata
    prefix = psum.select("_pid", F.sum("_psum").over(woff).alias("_prev"))
    wloc = (
        Window.partitionBy("_pid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        parted.withColumn("_locsum", F.sum(value_col).over(wloc))
        .join(F.broadcast(prefix), "_pid")  # bcast-ok: nparts-row partition metadata
        .withColumn(
            "_runsum",
            F.col("_locsum") + F.coalesce(F.col("_prev"), F.lit(0)),
        )
        .drop("_pid", "_locsum", "_prev")
    )
