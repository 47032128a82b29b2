"""Event-time windowed aggregation with watermark-based late-data handling.

The reference has no event-time semantics (wall-clock polling only —
SURVEY §2.10), but the engine's streaming surface would be incomplete
without them: this is the streaming counterpart of the batch hourly
rollup (plans.queries.q26_events_hourly), built on the same events schema.

Scale notes: tumbling-window + watermark is Spark's native incremental
aggregation — state is bounded by (watermark horizon × keys), partials
combine map-side per micro-batch, and output mode ``append`` emits each
window exactly once when the watermark passes it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id long, ts timestamp_ntz, user_id long, event_type string, "
    "value double, props string"
)


def events_stream(
    spark: SparkSession, events_dir: str, glob: str = "events.parquet"
) -> DataFrame:
    """Streaming read of events files, normalized to the same contract as
    ``plans.queries.load_events``: ``ts`` = epoch ns (BIGINT, wall clock as
    UTC, tz-free). ``ts_utc`` here is the event-time INSTANT
    (``timestamp_micros`` of that epoch — watermarks reject
    TIMESTAMP_NTZ), so window/session boundaries bucket on the epoch,
    independent of the session tz. ``events_dir`` must be a directory
    (file-stream source constraint); ``glob`` selects the files.
    """
    raw = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .format("parquet")
        .option("pathGlobFilter", glob)
        .load(events_dir)
    )
    return raw.withColumn(
        "ts",
        F.expr(
            "timestampdiff(MICROSECOND,"
            " timestamp_ntz'1970-01-01 00:00:00', ts) * 1000"
        ),
    ).withColumn("ts_utc", F.expr("timestamp_micros(ts div 1000)"))


def hourly_counts_stream(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling 1-hour windows per event_type; rows later than the
    watermark horizon are dropped (T5's late-data rule, event-time flavor).
    """
    return (
        events.withWatermark("ts_utc", watermark)
        .groupBy(F.window("ts_utc", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def session_counts_stream(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Event-time SESSION windows per user (gap-based — the streaming
    counterpart of the batch q44 sessionization): Spark's native
    ``session_window`` merges events closer than ``gap`` into one growing
    window, state bounded by the watermark horizon, append mode emits each
    session once closed. Per-key session state is exactly the 100 TB shape
    (state partitions by user)."""
    return (
        events.withWatermark("ts_utc", watermark)
        .groupBy(F.session_window("ts_utc", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def run_session_rollup(
    spark: SparkSession,
    events_dir: str,
    checkpoint_dir: str,
    queryName: str = "session_rollup",
):
    """Wire the session-window stream into an in-memory sink."""
    agg = session_counts_stream(events_stream(spark, events_dir))
    return (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName(queryName)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def run_hourly_rollup(
    spark: SparkSession,
    events_dir: str,
    checkpoint_dir: str,
    queryName: str = "hourly_rollup",
):
    """Wire the stream into an in-memory sink (append mode — windows emit
    once finalized). Returns the StreamingQuery."""
    agg = hourly_counts_stream(events_stream(spark, events_dir))
    return (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName(queryName)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def deduped_stream(
    events: DataFrame,
    id_cols: list[str],
    time_col: str = "ts_utc",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exact dedup — the ingestion-time counterpart of
    ``operators.dedup.exact_dedup``: drop rows whose ``id_cols`` were
    already seen within the watermark horizon
    (``dropDuplicatesWithinWatermark``). State is bounded by (horizon ×
    distinct keys in the horizon), evicted as the watermark advances —
    unbounded-retention dropDuplicates would leak state forever on a
    100 TB/day feed; the horizon cap is what makes streaming dedup
    deployable. Keys partition across the cluster like any keyed state."""
    return events.withWatermark(time_col, watermark).dropDuplicatesWithinWatermark(
        id_cols
    )


def run_deduped_count(
    spark: SparkSession,
    events_dir: str,
    checkpoint_dir: str,
    queryName: str = "dedup_stream",
    glob: str = "events.parquet",
):
    """Wire the deduped stream into an in-memory sink (append)."""
    out = deduped_stream(events_stream(spark, events_dir, glob), ["event_id"])
    return (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName(queryName)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def correlated_stream_join(
    left: DataFrame,
    right: DataFrame,
    left_type: str = "click",
    right_type: str = "purchase",
    within: str = "1 hour",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream INTERVAL join: pair each ``right_type``
    event with same-user ``left_type`` events in the preceding ``within``
    horizon (click→purchase attribution). Both sides carry watermarks and
    the join condition bounds event-time distance — that pair is what lets
    Spark evict join state: a side's row is dropped once the other side's
    watermark passes its latest possible match. Without the time bound the
    state store grows forever; this is THE constraint that makes
    stream-stream joins deployable on an unbounded feed.
    """
    l = (
        left.filter(F.col("event_type") == left_type)
        .withWatermark("ts_utc", watermark)
        .select(
            F.col("user_id").alias("l_user"),
            F.col("event_id").alias("l_event"),
            F.col("ts_utc").alias("l_ts"),
        )
    )
    r = (
        right.filter(F.col("event_type") == right_type)
        .withWatermark("ts_utc", watermark)
        .select(
            F.col("user_id").alias("r_user"),
            F.col("event_id").alias("r_event"),
            F.col("ts_utc").alias("r_ts"),
        )
    )
    cond = (
        (F.col("l_user") == F.col("r_user"))
        & (F.col("l_ts") <= F.col("r_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {within}"))
    )
    # how="leftOuter": clicks that never attribute emit ONCE, null-padded,
    # when the right watermark passes their last possible match — the
    # state-eviction moment doubles as the no-match decision, so outer
    # results are exactly-once without any reprocessing. (Outer rows
    # surface on the trigger AFTER the watermark advances: a drained
    # availableNow run needs one more run once later data has pushed the
    # watermark — see test_stream_stream_left_outer_join_emits_unmatched.)
    return l.join(r, cond, how).select(
        F.coalesce(F.col("l_user"), F.col("r_user")).alias("user_id"),
        "l_event",
        "r_event",
        "l_ts",
        "r_ts",
    )


def run_attribution_join(
    spark: SparkSession,
    events_dir: str,
    checkpoint_dir: str,
    queryName: str = "attribution",
    glob: str = "events.parquet",
    how: str = "inner",
    within: str = "1 hour",
    watermark: str = "2 hours",
):
    """Wire the click→purchase attribution join into an in-memory sink."""
    ev = events_stream(spark, events_dir, glob)
    out = correlated_stream_join(ev, ev, within=within, watermark=watermark, how=how)
    return (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName(queryName)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
