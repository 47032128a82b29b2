"""Deterministic sampling and dataset splits for training pipelines.

Random `df.sample()` is seed- and partitioning-dependent — useless for
reproducible train/val splits or cross-engine parity. These operators
derive the decision from a content hash (md5, the engine's shared hash):
the same row lands in the same split on any cluster, any partitioning,
any engine, forever. This is how large corpus pipelines actually assign
splits (hash-mod bucketing), and it's embarrassingly parallel — a pure
projection, no shuffle, no state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_bucket(col: str | Column, buckets: int = 10_000, salt: str = "") -> Column:
    """Stable bucket in [0, buckets) from md5 of the key (+ salt). The salt
    decorrelates independent sampling decisions over the same keys."""
    c = F.col(col) if isinstance(col, str) else col
    h = F.md5(F.concat(F.lit(salt), c.cast("string")))
    # first 8 hex digits -> 32-bit int, non-negative
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % buckets


def hash_sample(
    df: DataFrame, id_col: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Deterministic ~``fraction`` sample: keeps rows whose hash bucket
    falls under the rate. Same input → same sample, always."""
    buckets = 10_000
    return df.filter(hash_bucket(id_col, buckets, salt) < int(fraction * buckets))


def stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    fraction: float,
    salt: str = "",
) -> DataFrame:
    """Exact per-stratum quota sample: within each stratum, rank rows by
    (md5(salt||id), id) and keep the first ceil(fraction·|stratum|). Unlike
    ``hash_sample`` (expected fraction), every stratum contributes its exact
    quota — the per-language / per-source rebalancing step of corpus
    curation. Deterministic and engine-portable (md5 ranking).

    One shuffle on the stratum key. Skew note: a window over a stratum puts
    that stratum in one task; strata here are coarse dataset shards
    (languages, sources), whose count is small and sizes are bounded by
    design — for per-key quotas over millions of keys use hash_sample.
    """
    if not (0.0 < fraction <= 1.0):
        raise ValueError(f"fraction must be in (0, 1], got {fraction}")
    from pyspark.sql import Window

    idc = F.col(id_col) if isinstance(id_col, str) else id_col
    h = F.md5(F.concat(F.lit(salt), idc.cast("string")))
    w = Window.partitionBy(strata_col).orderBy(h, idc)
    quota = F.ceil(
        F.count(F.lit(1)).over(Window.partitionBy(strata_col)) * F.lit(fraction)
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .withColumn("_q", quota)
        .filter(F.col("_rk") <= F.col("_q"))
        .drop("_rk", "_q")
    )


def split_assign(
    df: DataFrame,
    id_col: str,
    splits: dict[str, float],
    out: str = "split",
    salt: str = "",
) -> DataFrame:
    """Assign every row to exactly one named split by cumulative hash-mod
    ranges (e.g. {'train': 0.9, 'val': 0.05, 'test': 0.05}). Fractions
    must sum to 1 (±1e-9)."""
    total = sum(splits.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    buckets = 10_000
    b = hash_bucket(id_col, buckets, salt)
    expr = None
    acc = 0.0
    names = list(splits)
    for name in names[:-1]:
        acc += splits[name]
        cond = b < int(acc * buckets)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = (
        F.lit(names[0]) if expr is None else expr.otherwise(names[-1])
    )
    return df.withColumn(out, expr)


def weighted_hash_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str | Column,
    salt: str = "",
) -> DataFrame:
    """Deterministic per-row weighted Bernoulli keep: row survives iff its
    hash bucket falls under ``weight`` (in [0, 1]) — the data-mixing
    primitive (per-source sampling rates) of a training corpus. Unlike
    ``sample()``, same input → same subset on any cluster/partitioning,
    and the weight can vary row-by-row (joined from a mixing table).
    Pure expression filter: embarrassingly parallel, no shuffle."""
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    buckets = 10_000
    # round, don't truncate: 0.3 * 10000 is 2999.9999999999995 in binary
    # floating point; a cast would drop a whole bucket while round-tripping
    # engines (DuckDB CAST rounds) would keep it
    return df.filter(
        hash_bucket(id_col, buckets, salt) < F.round(w * buckets).cast("long")
    )
