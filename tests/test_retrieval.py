"""operators.retrieval: probe channel scoring, rank frames, RRF fusion.

Mirrors the DuckDB-side hand-worked example in test_stat_oracles.py
(test_rrf_fusion_hand_worked) on the Spark side, so both halves of the
q350 family rest on the same first-principles derivation.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from etl_jetro_spark.operators.retrieval import (
    probe_channel_scores,
    rank_channel,
    rrf,
)


def _pad(front, back):
    return front + [0.0] * 30 + back


@pytest.fixture(scope="module")
def emb(spark):
    # probe v0 (m = max(5, ceil(4/25)) = 5 -> only vec_id 0 probes);
    # 34-dim vectors: dims 1-2 = front half (cut=32), dims 33-34 = back
    rows = [
        (0, _pad([1.0, 0.0], [1.0, 0.0])),
        (1, _pad([1.0, 0.0], [0.0, 1.0])),
        (2, _pad([0.0, 1.0], [1.0, 0.0])),
        (3, _pad([1.0, 1.0], [1.0, 1.0])),
    ]
    return spark.createDataFrame(rows, ["vec_id", "embedding"]).select(
        "vec_id", F.col("embedding").cast("array<float>").alias("embedding")
    )


def test_probe_channel_scores_halves_hand_worked(emb):
    scored = probe_channel_scores(emb, "halves", 32)
    got = {r["cid"]: (r["sa"], r["sb"]) for r in scored.collect()}
    inv_sqrt2 = round(1 / math.sqrt(2), 12)
    assert got[1] == (1.0, 0.0)
    assert got[2] == (0.0, 1.0)
    assert got[3] == (inv_sqrt2, inv_sqrt2)


def test_rank_channel_and_rrf_fusion(emb):
    scored = probe_channel_scores(emb, "halves", 32)
    ra = rank_channel(scored, "sa", "ra")
    rb = rank_channel(scored, "sb", "rb")
    r = ra.join(rb, ["qid", "cid"])
    ranks = {x["cid"]: (x["ra"], x["rb"]) for x in r.collect()}
    assert ranks == {1: (1, 3), 3: (2, 2), 2: (3, 1)}
    fused = r.select("qid", "cid", rrf("ra", "rb", k=60).alias("rrf"))
    top = rank_channel(fused, "rrf", "rf").filter(F.col("rf") == 1).collect()
    # rrf(v1) = 1/61 + 1/63 == rrf(v2) exactly (commutative float add);
    # cid tiebreak picks v1
    assert [x["cid"] for x in top] == [1]


def test_prefix_mode_full_channel(emb):
    scored = probe_channel_scores(emb, "prefix", 2)
    got = {r["cid"]: (r["sa"], r["sb"]) for r in scored.collect()}
    # sa = 2-dim prefix cosine; sb = full 34-dim cosine vs v0=(1,0|1,0)
    assert got[1][0] == 1.0 and got[1][1] == 0.5  # (1,0|0,1): dot 1, norms sqrt2*sqrt2
    assert got[2][0] == 0.0 and got[2][1] == 0.5
    assert got[3][0] == round(1 / math.sqrt(2), 12) and got[3][1] == round(
        2 / (math.sqrt(2) * 2), 12
    )


def test_zero_norm_vectors_excluded(spark):
    rows = [
        (0, _pad([1.0, 0.0], [1.0, 0.0])),
        (1, _pad([1.0, 0.0], [0.0, 0.0])),  # zero back half -> excluded
        (2, _pad([0.0, 1.0], [1.0, 0.0])),
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    scored = probe_channel_scores(emb, "halves", 32)
    assert {r["cid"] for r in scored.collect()} == {2}
