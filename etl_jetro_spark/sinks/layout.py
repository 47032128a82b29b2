"""Physical layout management: small-file compaction and clustered export.

The write side of the 100 TB story. Streaming ingest and fine-grained
partitioning both breed small files; a scan over 10M kilobyte-files is
driver-bound (task scheduling, footer reads) long before it is IO-bound.
Compaction rewrites a dataset into size-targeted files; clustered export
adds hive partitioning + within-file ordering so downstream scans prune
partitions AND benefit from parquet min/max row-group skipping on the
sort key.

Both are one `repartition`/`repartitionByRange` write — the shuffle IS
the point (it buys every later scan). Never `coalesce` for compaction:
coalesce(n) caps the write parallelism of the whole upstream stage and
skips the rebalance, producing skewed output files.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def plan_target_files(total_bytes: int, target_mb: int = 256) -> int:
    """File count that lands each output file near ``target_mb``."""
    return max(1, math.ceil(total_bytes / (target_mb * 1024 * 1024)))


def compact_parquet(
    spark: SparkSession,
    src: str,
    dest: str,
    target_mb: int = 256,
) -> int:
    """Rewrite a parquet dataset into ~``target_mb`` files. Returns the
    file count written. Source size comes from the files' actual bytes
    (`inputFiles` + filesystem), so the target adapts to the data.

    Write goes to ``dest`` (never in place): at scale, compaction swaps
    directories/table pointers atomically after a successful write.
    """
    df = spark.read.parquet(src)
    import os

    total = sum(
        os.path.getsize(os.path.join(root, f))
        for root, _, files in os.walk(src)
        for f in files
        if f.endswith(".parquet")
    )
    n = plan_target_files(total, target_mb)
    df.repartition(n).write.mode("overwrite").parquet(dest)
    return n


def write_clustered(
    df: DataFrame,
    dest: str,
    partition_cols: list[str],
    cluster_cols: list[str],
    files_per_partition: int = 1,
) -> None:
    """Hive-partitioned export with within-file clustering:
    ``repartition(partition_cols)`` lines tasks up with output partitions
    (each task writes into few partitions → few files), and
    ``sortWithinPartitions(partition_cols + cluster_cols)`` orders rows so
    parquet row-group min/max statistics make range predicates on the
    cluster key skip row groups — the poor man's z-order, free at write
    time.
    """
    salt = (
        [F.pmod(F.xxhash64(*cluster_cols), F.lit(files_per_partition))]
        if files_per_partition > 1
        else []
    )  # deterministic split (task-retry safe), unlike spark_partition_id()
    keyed = df.repartition(*[F.col(c) for c in partition_cols] + salt)
    ordered = keyed.sortWithinPartitions(*partition_cols, *cluster_cols)
    ordered.write.mode("overwrite").partitionBy(*partition_cols).parquet(dest)
