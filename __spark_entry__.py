"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` /
``oracle_sql()`` expose every declared operator query from SURVEY §2 plus the
training-data-pipeline operators (dedup / similarity / text analysis), each
paired with a DuckDB-runnable ANSI-SQL oracle where SQL-expressible.

Implementations live in ``etl_jetro_spark.plans.queries``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (pricing summary, TPC-H Q1 shape) on sf0.001."""
    from etl_jetro_spark.plans.queries import q1_pricing_summary

    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # NEWEST-REGISTERED FIRST: correctness sweeps that stop on a wall-time
    # budget then verify the newest (riskiest, least-soaked) queries before
    # the long-stable early surface, instead of re-verifying q1..q50 every
    # round and never reaching the rest. Full-gate runs cover everything
    # either way (tools/diffcheck.py).
    from etl_jetro_spark.plans.queries import QUERIES

    return dict(reversed(QUERIES.items()))


def oracle_sql() -> dict[str, str]:
    from etl_jetro_spark.plans.queries import ORACLES

    return dict(reversed(ORACLES.items()))
