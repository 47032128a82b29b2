"""Catalog-wide broadcast-hint lint (round-5 verdict ask #1).

A forced ``F.broadcast()`` on a frame that grows with the corpus
disables Catalyst/AQE's size-based join protection — the round-5
finding on the BFS frontier/visited, item supports, and funnel stage
frames (all since de-hinted), and the introduction-time catches on
q247 (full part dim) and q223 (per-user first-view frame). The lint
enforces two rules permanently: no raw ``F.broadcast`` in the query
catalog (every hint declares its growth class via ``plans.hints``),
and every ``bcast_small``-declared frame is MEASURED at two SFs to
verify it does not grow with the data. ``bcast_sized`` frames are
exempt by construction: their hint turns itself off past
``autoBroadcastJoinThreshold``.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo/tools")

from broadcastlint import (  # noqa: E402
    growth_violations,
    hinted_frames,
    source_violations,
)


def test_no_raw_broadcast_in_catalog_source():
    assert source_violations() == []


def test_whole_catalog_small_hints_do_not_grow(spark):
    from etl_jetro_spark.plans.queries import QUERIES

    bad: list[str] = []
    for name, fn in QUERIES.items():
        bad.extend(growth_violations(spark, name, fn))
    assert not bad, f"grow-with-data broadcast hints: {bad}"


def test_growth_rule_catches_data_keyed_frame(spark):
    """A bcast_small on a per-user aggregate (the q223/q202 defect
    shape) must flag: user cardinality is data-scale for events."""
    from pyspark.sql import functions as F

    from etl_jetro_spark.plans.hints import bcast_small

    def bad_query(spark, sf_dir):
        e = spark.read.parquet(f"{sf_dir}/events.parquet")
        per_user = e.groupBy("user_id").agg(F.min("ts").alias("t0"))
        return e.join(bcast_small(per_user), "user_id")

    # the fixture has 15 users at sf0.001 and 150 at sf0.01 — under the
    # production floor; drop the floor to the shape itself
    import broadcastlint as bl

    old = bl.FLOOR_ROWS
    bl.FLOOR_ROWS = 10
    try:
        assert growth_violations(spark, "bad_query", bad_query)
    finally:
        bl.FLOOR_ROWS = old


def test_registry_captures_kinds(spark, sf_dir):
    """hinted_frames must see both helper kinds with the declared tag."""
    from pyspark.sql import functions as F

    from etl_jetro_spark.plans.hints import bcast_sized, bcast_small

    def q(spark, sf):
        n = spark.read.parquet(f"{sf}/nation.parquet")
        c = spark.read.parquet(f"{sf}/customer.parquet")
        tot = n.agg(F.count(F.lit(1)).alias("n"))
        return c.join(bcast_small(n), c.c_nationkey == n.n_nationkey).crossJoin(
            bcast_sized(tot)
        )

    kinds = [k for k, _ in hinted_frames(spark, q, sf_dir)]
    assert kinds == ["small", "sized"]


def test_bcast_sized_gates_on_threshold(spark, sf_dir):
    """bcast_sized must hint under the default threshold and NOT hint
    when the threshold is below the frame's size estimate — the gate
    that lets the same code survive a 100x dim table."""
    from etl_jetro_spark.plans.hints import bcast_sized

    c = spark.read.parquet(f"{sf_dir}/customer.parquet")

    def hinted(df) -> bool:
        return "ResolvedHint" in str(df._jdf.queryExecution().analyzed())

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10MB")
        assert hinted(bcast_sized(c))
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1b")
        assert not hinted(bcast_sized(c))
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        assert not hinted(bcast_sized(c))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
