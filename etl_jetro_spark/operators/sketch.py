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
from etl_jetro_spark.plans.hints import bcast_small


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
    j = pb.join(bcast_small(cms), ["row", "bucket"], "left")  # bound: fixed-width CMS (d x w counters)
    return j.groupBy(token_col).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("long").alias("est_cnt")
    )


def kmv_bottom_k(
    df: DataFrame, group_col: str, item_col: str, k: int = 32
) -> DataFrame:
    """Per-group K-minimum-values sketch (Bar-Yossef et al. 2002): the
    ``k`` smallest DISTINCT md5 hashes of the group's items, as
    ``(group, h)`` rows (k x groups total — sketch-sized, not
    corpus-sized). Distinct is one partial-agg shuffle; the bottom-k cut
    rides the DISTRIBUTED rank frame (aggregate.group_ranked: range
    partition + metadata offsets) — with few groups a per-group window
    would serialize each group's whole distinct hash set into one task,
    exactly the shape the percentile machinery exists to avoid."""
    from etl_jetro_spark.operators.aggregate import group_ranked

    h = (
        df.select(
            F.col(group_col).alias("group"),
            F.md5(F.col(item_col).cast("string")).alias("h"),
        )
        .distinct()
    )
    ranked = group_ranked(h, ["group"], "h")
    return ranked.filter(F.col("_rn") <= k).select(
        "group", F.col("_v").alias("h")
    )


def kmv_pairwise_jaccard(
    df: DataFrame, group_col: str, item_col: str, k: int = 32
) -> DataFrame:
    """Estimated Jaccard similarity between every pair of groups' item
    SETS from their KMV sketches: est = |A_k ∩ B_k ∩ bottom-k(A ∪ B)| /
    |bottom-k(A ∪ B)| (exact when a pair's union carries fewer than k
    distinct hashes). The corpus is touched ONCE (sketch build); the
    pairwise stage runs on sketches (groups x k rows), so the quadratic
    term is in #groups — dataset-overlap triage across sources/dumps
    without a corpus-sized join. Returns (group_a, group_b, n_union_k,
    est_jaccard)."""
    from pyspark.sql import Window

    kmv = kmv_bottom_k(df, group_col, item_col, k)
    gs = kmv.select("group").distinct()
    pairs = (
        gs.withColumnRenamed("group", "group_a")
        .join(
            bcast_small(gs.withColumnRenamed("group", "group_b")),  # bound: distinct groups (sources/dumps) — enum-sized
            F.col("group_a") < F.col("group_b"),
        )
    )
    ka = pairs.join(
        kmv.withColumnRenamed("group", "group_a"), "group_a"
    ).select("group_a", "group_b", "h", F.lit(1).alias("in_a"), F.lit(0).alias("in_b"))
    kb = pairs.join(
        kmv.withColumnRenamed("group", "group_b"), "group_b"
    ).select("group_a", "group_b", "h", F.lit(0).alias("in_a"), F.lit(1).alias("in_b"))
    merged = (
        ka.unionByName(kb)
        .groupBy("group_a", "group_b", "h")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    w = Window.partitionBy("group_a", "group_b").orderBy("h")
    bottom = merged.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= k
    )
    return bottom.groupBy("group_a", "group_b").agg(
        F.count(F.lit(1)).cast("long").alias("n_union_k"),
        F.round(
            F.sum(F.col("in_a") * F.col("in_b")) / F.count(F.lit(1)), 6
        ).alias("est_jaccard"),
    )


# --- Bloom filter: portable bitset membership -----------------------------
#
# The filter IS a DataFrame of (word, bits) — m_words x 32-bit words (32,
# not 64, so the shifted literal stays positive in every engine's BIGINT).
# Build is ONE partial-agg shuffle bounded by m_words rows per task;
# probing broadcasts the (tiny) filter. One-sided like any Bloom filter:
# a 'false' answer is definite absence; 'true' is maybe-present with FPP
# ~ (1 - e^{-kn/m})^k. Same md5 addressing as the CMS above, so the q123
# oracle replays the identical bitset in SQL.


def _bloom_pos(col: Column, i: int, m_bits: int, salt: str) -> Column:
    h = F.md5(F.concat(F.lit(f"{salt}{i}:"), col.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % m_bits


def bloom_build(
    df: DataFrame,
    item_col: str,
    m_words: int = 64,
    k_hashes: int = 4,
    salt: str = "bloom",
) -> DataFrame:
    """(word, bits) bitset table over the items' k hash positions."""
    m_bits = m_words * 32
    c = F.col(item_col)
    pos = df.select(
        F.explode(
            F.array(*[_bloom_pos(c, i, m_bits, salt) for i in range(k_hashes)])
        ).alias("pos")
    )
    return (
        pos.select(
            (F.col("pos") / 32).cast("long").alias("word"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))").alias("bit"),
        )
        .groupBy("word")
        .agg(F.bit_or("bit").cast("long").alias("bits"))
    )


def bloom_contains(
    bloom: DataFrame,
    probes: DataFrame,
    item_col: str,
    m_words: int = 64,
    k_hashes: int = 4,
    salt: str = "bloom",
) -> DataFrame:
    """(item, maybe_present) for each probe row: present iff ALL k
    addressed bits are set. The filter broadcasts (m_words rows)."""
    m_bits = m_words * 32
    c = F.col(item_col)
    pb = probes.select(
        item_col,
        F.explode(
            F.array(*[_bloom_pos(c, i, m_bits, salt) for i in range(k_hashes)])
        ).alias("pos"),
    ).select(
        item_col,
        (F.col("pos") / 32).cast("long").alias("word"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))").alias("bit"),
    )
    j = pb.join(bcast_small(bloom), "word", "left")  # bound: fixed-width Bloom rows
    hit = (
        F.coalesce(F.col("bits"), F.lit(0).cast("long")).bitwiseAND(F.col("bit"))
        != 0
    ).cast("int")
    return j.groupBy(item_col).agg(
        (F.min(hit) == 1).alias("maybe_present")
    )
