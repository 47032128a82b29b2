"""Bucketed co-located join: the shuffle disappears from the plan."""

from __future__ import annotations

import pyspark.sql.functions as F

from etl_jetro_spark.plans.bucketing import (
    bucketed_join,
    join_shuffle_count,
    write_bucketed,
)


def test_bucketed_join_is_shuffle_free(spark, sf_dir, tmp_path):
    # warehouse.dir is a static conf; tables land in ./spark-warehouse
    # (gitignored) and are dropped at the end
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ path

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    write_bucketed(li.select("l_orderkey", "l_quantity").withColumnRenamed("l_orderkey", "o_orderkey"),
                   "li_b", "o_orderkey", 8, sort_by="o_orderkey")
    write_bucketed(o.select("o_orderkey", "o_totalprice"), "o_b", "o_orderkey", 8,
                   sort_by="o_orderkey")

    joined = bucketed_join(spark, "li_b", "o_b", "o_orderkey")
    n_rows = joined.count()
    assert n_rows == li.count()  # every lineitem has its order

    # co-located: zero Exchange nodes in the join plan
    assert join_shuffle_count(joined) == 0

    # the unbucketed equivalent of the same join needs shuffles
    plain = li.withColumnRenamed("l_orderkey", "o_orderkey").join(o, "o_orderkey")
    assert join_shuffle_count(plain) >= 1

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS o_b")


def test_partitioned_layout_prunes(spark, sf_dir, tmp_path):
    """Hive-partitioned fact layout: a filter on the partition column
    reaches the scan as a PartitionFilter, so only matching directories
    are read — the data-skipping half of the 100 TB story (bucketing
    co-locates joins; partitioning prunes scans)."""
    from etl_jetro_spark.plans.queries import load_events

    e = load_events(spark, sf_dir).select("event_id", "ts", "user_id", "event_type")
    out = str(tmp_path / "events_by_type")
    e.write.mode("overwrite").partitionBy("event_type").parquet(out)

    back = spark.read.parquet(out)
    one = back.filter(F.col("event_type") == "click")
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "click" in plan
    # pruned scan reads exactly the partition's rows
    want = e.filter(F.col("event_type") == "click").count()
    assert one.count() == want
    # and the non-partition columns are untouched by the layout
    assert set(back.columns) == {"event_id", "ts", "user_id", "event_type"}
