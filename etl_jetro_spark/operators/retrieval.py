"""Retrieval-evaluation operators: probe-sliced channel scoring, rank
frames, and reciprocal-rank fusion.

The eval pattern behind q350-q352/q359 (``plans/queries.py``), exposed
as a reusable API: score every corpus vector against a deterministic,
ADAPTIVE probe slice (~``per`` probes at ANY corpus size, so probe x
corpus work stays linear), derive per-probe rankings on the distributed
rank frame, and compose integer-rank metrics (RRF, recall@k, NDCG) on
top. All scoring is expression-only codegen — no UDF, no collect of the
corpus — and scores are rounded to 12 dp before any ranking so EXACT
duplicate vectors tie exactly and the deterministic id tiebreak decides
(fold-order ulp noise otherwise breaks duplicate ties differently per
engine/run; caught by the sf3 oracle gate).

Reference scope note: the reference suite has no retrieval evaluator;
this family belongs to the training-data-platform surface (SURVEY §12).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "probe_channel_scores",
    "rank_channel",
    "rank_channels",
    "rrf",
]


def probe_channel_scores(
    emb: DataFrame,
    mode: str,
    cut: int,
    per: int = 25,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(qid, cid, sa, sb): two cosine channels of every corpus vector
    against the adaptive probe slice (``id % max(5, ceil(n/per)) == 0``).

    ``mode='halves'``: sa = cosine over dims 1..cut, sb over dims
    cut+1..d — two independent retrieval systems from one embedding.
    ``mode='prefix'``: sa = cosine over dims 1..cut (cheap stage-1),
    sb = full-dim cosine (the reranker / ground truth).

    The returned frame carries a localCheckpoint barrier: consumers rank
    it several times (one distributed rank pass per channel), and
    without the barrier Catalyst re-inlines the corpus-sized dim-join
    into every rank plan."""
    if mode not in ("halves", "prefix"):
        raise ValueError(f"mode must be 'halves' or 'prefix', got {mode!r}")
    m = max(5, math.ceil(emb.count() / float(per)))
    e = emb.select(
        F.col(id_col).alias("_vid"), F.posexplode(vec_col).alias("i0", "xf")
    ).select(
        "_vid",
        (F.col("i0") + 1).alias("i"),  # 1-based, matching the SQL oracles
        F.col("xf").cast("double").alias("x"),
    )
    in_a = F.col("i") <= cut
    in_b = (F.col("i") > cut) if mode == "halves" else F.lit(True)
    nrm = e.groupBy("_vid").agg(
        F.sqrt(
            F.sum(F.when(in_a, F.col("x") * F.col("x")).otherwise(0.0))
        ).alias("na"),
        F.sqrt(
            F.sum(F.when(in_b, F.col("x") * F.col("x")).otherwise(0.0))
        ).alias("nb"),
    )
    ok = nrm.filter((F.col("na") > 0) & (F.col("nb") > 0)).select(
        "_vid", "na", "nb"
    )
    from etl_jetro_spark.plans.hints import bcast_sized

    # Zero-norm exclusion rides the INNER norm joins below — the
    # previous pre-join of the exploded (n x d) frame against the ok
    # id set paid one full-frame Exchange only to drop pairs the
    # qna/cna joins drop anyway (r11). The probe side stays a filter
    # on the exploded frame; scores for zero-norm vectors are computed
    # and discarded, which is free unless a corpus is mostly
    # zero-norm.
    q = e.filter(F.col("_vid") % m == 0).select(
        F.col("_vid").alias("_qid"),
        F.col("i").alias("_qi"),
        F.col("x").alias("_qx"),
    )
    dots = (
        e.join(
            bcast_sized(q),
            (F.col("i") == F.col("_qi")) & (F.col("_vid") != F.col("_qid")),
        )
        .groupBy(F.col("_qid").alias("qid"), F.col("_vid").alias("cid"))
        .agg(
            F.sum(
                F.when(in_a, F.col("x") * F.col("_qx")).otherwise(0.0)
            ).alias("da"),
            F.sum(
                F.when(in_b, F.col("x") * F.col("_qx")).otherwise(0.0)
            ).alias("db"),
        )
    )
    nq = ok.select(
        F.col("_vid").alias("qid"),
        F.col("na").alias("qna"),
        F.col("nb").alias("qnb"),
    )
    nc = ok.select(
        F.col("_vid").alias("cid"),
        F.col("na").alias("cna"),
        F.col("nb").alias("cnb"),
    )
    # round-12 before any ranking: exact duplicate vectors must tie
    # EXACTLY so the id tiebreak decides (see module docstring)
    scored = (
        dots.join(bcast_sized(nq), "qid")
        .join(bcast_sized(nc), "cid")
        .select(
            "qid",
            "cid",
            F.round(F.col("da") / (F.col("qna") * F.col("cna")), 12).alias(
                "sa"
            ),
            F.round(F.col("db") / (F.col("qnb") * F.col("cnb")), 12).alias(
                "sb"
            ),
        )
    )
    return scored.localCheckpoint(eager=False)


def rank_channel(scored: DataFrame, col: str, out: str) -> DataFrame:
    """(qid, cid, <out>): per-probe 1-based descending rank of ``col``
    with a cid tiebreak, via the distributed rank machinery — never a
    probe-partitioned window whose partition holds the whole corpus."""
    from etl_jetro_spark.operators.aggregate import group_ranked

    r = group_ranked(
        scored.select("qid", "cid", col),
        ["qid"],
        -F.col(col),
        tiebreak=["cid"],
    )
    return r.select("qid", "cid", F.col("_rn").alias(out))


def rank_channels(scored: DataFrame, cols: dict[str, str]) -> DataFrame:
    """(qid, cid, <out>...): per-probe ranks of SEVERAL score columns in
    ONE distributed rank pass (r11): channels stack under a tag via a
    partition-local explode (rows x|cols|, passes x1), rank once keyed
    by (qid, channel), and pivot back with a min(when) aggregation.
    Each per-channel ranking is identical to :func:`rank_channel` —
    (score DESC, cid) within the probe — but the fixed costs of the
    rank machinery (range exchange, barrier, metadata pass, broadcast)
    and the (qid, cid) re-join of the separate rank frames are paid
    once instead of once per channel.

    ``cols`` maps score column -> output rank column."""
    from etl_jetro_spark.operators.aggregate import group_ranked

    pairs = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(out).alias("_ch"),
                    F.col(sc).cast("double").alias("_s"),
                )
                for sc, out in cols.items()
            ]
        )
    )
    stacked = scored.select("qid", "cid", pairs.alias("_p")).select(
        "qid", "cid", F.col("_p._ch").alias("_ch"), F.col("_p._s").alias("_s")
    )
    r = group_ranked(stacked, ["qid", "_ch"], -F.col("_s"), tiebreak=["cid"])
    return r.groupBy("qid", "cid").agg(
        *[
            F.min(F.when(F.col("_ch") == out, F.col("_rn"))).alias(out)
            for out in cols.values()
        ]
    )


def rrf(*rank_cols: str, k: int = 60) -> Column:
    """Reciprocal-rank-fusion score: sum of 1/(k + rank) over the given
    integer rank columns. A pure function of integer ranks (and float
    addition is commutative), so the fused ordering is exact on any
    engine regardless of fold order."""
    cols = [1.0 / (k + F.col(c)) for c in rank_cols]
    out = cols[0]
    for c in cols[1:]:
        out = out + c
    return out
