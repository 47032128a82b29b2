"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Ensure enough partitions for expression-heavy per-row stages.

    Small inputs (one parquet file, one row group) arrive as 1–2 partitions,
    which serializes shingling/hashing/UDF work onto 1–2 cores no matter the
    cluster size. A round-robin repartition of the (small) input is cheap
    and unlocks full parallelism; large multi-split inputs pass through
    untouched — so this is a no-op at 100 TB and a 10–30× win on the
    small-file shapes.
    """
    target = min_parts or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
