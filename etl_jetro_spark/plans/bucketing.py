"""Bucketed-table helpers: co-located joins and aggregations.

At 100 TB the one shuffle the star queries can't broadcast away is the
fact⋈fact equi-join (lineitem⋈orders on orderkey). Bucketing both sides on
the join key at write time removes that Exchange entirely: Spark's
FileSourceScanExec reports the bucket spec as its output partitioning and
SortMergeJoin consumes both sides shuffle-free. The same applies to
repeated group-bys on the bucket key.

These helpers wrap the saveAsTable bucketing API (bucket metadata lives in
the session catalog); ``assert_no_shuffle_join`` is the test hook proving
the plan shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_key: str | list[str],
    num_buckets: int = 64,
    sort_by: str | list[str] | None = None,
) -> None:
    """Persist as a bucketed (optionally sorted) managed table."""
    keys = [bucket_key] if isinstance(bucket_key, str) else list(bucket_key)
    w = df.write.mode("overwrite").bucketBy(num_buckets, *keys)
    if sort_by:
        sorts = [sort_by] if isinstance(sort_by, str) else list(sort_by)
        w = w.sortBy(*sorts)
    w.format("parquet").saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str | list[str], how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables — shuffle-free when bucket specs match."""
    return spark.table(left_table).join(spark.table(right_table), on, how)


def join_shuffle_count(df: DataFrame) -> int:
    """Number of Exchange (shuffle) nodes in the executed plan."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange")
