"""Skew mitigation: salted aggregation and salted broadcast-side join.

AQE's skew-join splitting handles sort-merge joins, but two shapes still
need explicit salting at 100 TB:

- **hot-key aggregation**: a groupBy where one key holds a large share of
  all rows bottlenecks its single reducer. ``salted_sum_by`` does a
  two-phase aggregate — phase 1 over (key, salt) spreads the hot key over
  N reducers, phase 2 combines the N partials. Exact same result, bounded
  reducer size.
- **hot-key broadcast join**: replicating the small side per salt lets a
  skewed fact side hash-join without one task owning the hot key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_sum_by(
    df: DataFrame,
    keys: list[str],
    value: str | Column,
    out: str = "sum_value",
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase salted groupBy-sum — result identical to a plain
    ``groupBy(keys).sum(value)``; the hot key's rows spread over
    ``salt_buckets`` reducers in phase 1."""
    v = F.col(value) if isinstance(value, str) else value
    salted = df.withColumn(
        "_salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    phase1 = salted.groupBy(*keys, "_salt").agg(F.sum(v).alias("_partial"))
    return phase1.groupBy(*keys).agg(F.sum("_partial").alias(out))


def salted_broadcast_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    salt_buckets: int = 8,
    how: str = "left",
) -> DataFrame:
    """Join a (possibly skewed) fact to a small dim: the dim is exploded
    ×salt_buckets and the fact salts uniformly, so no single task owns a
    hot key even without broadcast. Output equals a plain join."""
    from etl_jetro_spark.plans.hints import bcast_sized

    dim_salted = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    fact_salted = fact.withColumn(
        "_salt", (F.rand(seed=7) * salt_buckets).cast("int")
    )
    # size-gated (ADVICE r7): the hint self-disables when dim x salt
    # outgrows autoBroadcastJoinThreshold; the salted shuffle join that
    # remains is still skew-free on [on, _salt].
    return fact_salted.join(
        bcast_sized(dim_salted), [on, "_salt"], how
    ).drop("_salt")
