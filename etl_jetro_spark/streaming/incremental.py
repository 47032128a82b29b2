"""Streaming incremental aggregation: the always-on flavor of the q90
partial-merge pattern (operators/aggregate.partial_sums + merge_partials).

Each micro-batch aggregates ALONE into algebraic (sum, count) partials and
appends them to a batch-partitioned state table; readers merge partials by
key at query time. This is an incrementally-maintained materialized view
with exactly-once semantics on replay:

- the state table is hive-partitioned by ``_batch`` (the foreachBatch
  epoch id) and written with DYNAMIC partition overwrite — a replayed
  epoch (restart after a crash between sink write and checkpoint commit)
  overwrites ITS OWN partition instead of appending duplicate partials;
- the merge shuffle at read time carries one row per (batch, key) —
  distinct-key cardinality × batches, never raw rows;
- periodic ``compact_state`` folds history into a single partition so the
  partial count stays bounded on an unbounded stream.

At 100 TB/day this is the refresh pattern that never rescans history:
ingest aggregates the delta, the view pays one tiny merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_jetro_spark.operators.aggregate import merge_partials, partial_sums
from etl_jetro_spark.streaming.windows import events_stream


def incremental_agg_sink(
    state_dir: str, keys: list[str], value: str
):
    """foreachBatch sink: per-epoch partials, idempotent via dynamic
    partition overwrite of the epoch's own ``_batch`` partition."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        p = partial_sums(batch_df, keys, value)
        (
            p.withColumn("_batch", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch")
            .parquet(state_dir)
        )

    return sink


def run_incremental_agg(
    spark: SparkSession,
    events_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    keys: list[str] | None = None,
    value: str = "value",
    glob: str = "*.parquet",
):
    """Wire the events stream into the incremental-agg state table
    (availableNow: drain what exists, then stop)."""
    ev = events_stream(spark, events_dir, glob)
    return (
        ev.writeStream.foreachBatch(
            incremental_agg_sink(state_dir, keys or ["event_type"], value)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_incremental_agg(
    spark: SparkSession, state_dir: str, keys: list[str] | None = None
) -> DataFrame:
    """The materialized view: merge all per-batch partials by key."""
    state = spark.read.parquet(state_dir).drop("_batch")
    return merge_partials([state], keys or ["event_type"])


def compact_state(
    spark: SparkSession, state_dir: str, keys: list[str] | None = None
) -> DataFrame:
    """Fold all partials into one merged frame, MATERIALIZED
    (localCheckpoint) before returning — the lazy plan would still read
    ``state_dir``, so a caller writing the result back in place would
    otherwise overwrite the very files the plan reads. For the full
    fold-and-swap, use :func:`compact_state_inplace`."""
    return read_incremental_agg(spark, state_dir, keys).localCheckpoint(eager=True)


def compact_state_inplace(
    spark: SparkSession, state_dir: str, keys: list[str] | None = None
) -> None:
    """Fold all partials and swap them in as the new epoch-0 state:
    write the merged frame to a sibling temp dir, then replace
    ``state_dir`` (rename-shuffle — the closest a directory swap gets to
    atomic on a generic filesystem; on restart an orphaned ``.tmp`` /
    ``.old`` sibling is inert and re-compaction is idempotent)."""
    import shutil

    merged = compact_state(spark, state_dir, keys)
    tmp = state_dir.rstrip("/") + ".compact.tmp"
    old = state_dir.rstrip("/") + ".compact.old"
    shutil.rmtree(tmp, ignore_errors=True)
    (
        merged.withColumn("_batch", F.lit(0))
        .write.mode("overwrite")
        .partitionBy("_batch")
        .parquet(tmp)
    )
    shutil.rmtree(old, ignore_errors=True)
    shutil.move(state_dir, old)
    shutil.move(tmp, state_dir)
    shutil.rmtree(old, ignore_errors=True)
