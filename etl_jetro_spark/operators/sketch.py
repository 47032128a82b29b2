"""Count-min sketch: sublinear heavy-hitter counting for token streams.

The exact token-count table of a web corpus is vocabulary-sized (billions
of rows); a count-min sketch bounds the counter state at depth x width
REGARDLESS of vocabulary, with the classic one-sided guarantee:
estimate >= true count always, and estimate <= true + eps*N with
probability 1 - (1/2)^depth for width = e/eps.

Engine shape: the sketch IS a DataFrame of (row, bucket, cnt) — built with
ONE shuffle whose payload is depth x width partial counters per task (the
token stream itself never reshuffles), merged by key like any partial
aggregate. Estimation broadcasts the (tiny) sketch to the probe side.
All hashing is the engine's shared md5 (functions like
``operators/sampling.hash_bucket``), so estimates are deterministic and
cross-engine replayable — the q111 oracle rebuilds the identical sketch
in SQL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(col: Column, i: int, width: int, salt: str) -> Column:
    """Row-``i`` counter index: first 8 md5 hex digits of 'salt{i}:token'
    mod width (matches the oracle's digit-walk replay)."""
    h = F.md5(F.concat(F.lit(f"{salt}{i}:"), col.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % width


def cms_build(
    df: DataFrame,
    token_col: str,
    depth: int = 4,
    width: int = 1024,
    salt: str = "cms",
) -> DataFrame:
    """(row, bucket, cnt) counter table from one pass over the tokens.

    posexplode fans each token to ``depth`` (row, bucket) coordinates
    partition-locally (Generate, no shuffle); the single shuffle carries
    partial counters — at most depth x width rows per map task, however
    large the stream."""
    c = F.col(token_col)
    coords = df.select(
        F.posexplode(
            F.array(*[_bucket(c, i, width, salt) for i in range(depth)])
        ).alias("row", "bucket")
    )
    return coords.groupBy("row", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )


def cms_estimate(
    cms: DataFrame,
    probes: DataFrame,
    token_col: str,
    depth: int = 4,
    width: int = 1024,
    salt: str = "cms",
) -> DataFrame:
    """Point estimates for the probe tokens: min over the sketch rows of
    the addressed counters. The sketch (depth x width rows) broadcasts;
    absent counters read 0 (token never seen)."""
    c = F.col(token_col)
    pb = probes.select(
        token_col,
        F.posexplode(
            F.array(*[_bucket(c, i, width, salt) for i in range(depth)])
        ).alias("row", "bucket"),
    )
    j = pb.join(F.broadcast(cms), ["row", "bucket"], "left")
    return j.groupBy(token_col).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("long").alias("est_cnt")
    )
