"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` /
``oracle_sql()`` expose every declared operator query from SURVEY §2 plus the
training-data-pipeline operators (dedup / similarity / text analysis), each
paired with a DuckDB-runnable ANSI-SQL oracle where SQL-expressible.

Implementations live in ``etl_jetro_spark.plans.queries``.
"""

from __future__ import annotations

import glob
import os
import re
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# The driver's correctness sweep runs on a wall-time budget and has
# historically covered ~50 queries per round. Pure newest-first ordering
# (rounds 3-4) structurally locks the middle of the surface out of the
# window forever once the catalog outgrows it — q49-q124 never got a
# driver-signed row (round-4 verdict, "What's missing" #1). The order is
# now: the NEWEST_N most recently registered queries (riskiest,
# least-soaked) first, then the remaining surface rotated by a
# deterministic per-round offset so every older query cycles back into
# the signed window every few rounds. Full-gate runs cover everything
# regardless (tools/diffcheck.py).
#
# Round 6 (verdict ask #2): the stale band (q76-q230, 105 queries at
# r5 close) clears too slowly at 25/round while the surface grows, so
# the ~50-query budget is re-split — 10 for the newest (rounds now add
# far fewer than 25 queries) and 40 for the rotation. Rounds <= 5
# advanced by 25 (r5 signed q49-q75); the piecewise offset below keeps
# the band contiguous across the policy change, so r6 starts exactly
# where r5 stopped (q76) and nothing is skipped.
NEWEST_N = 10
ROTATE_N = 40
_R5_NEWEST_N = 25
_R5_ROTATE_N = 25


def _round_index() -> int:
    """Current round, inferred from the driver's own artifacts: the
    highest CORRECTNESS_r{N}.json committed so far + 1 (5 when r04 is the
    newest). Deterministic within a round and needs no side-channel."""
    here = os.path.dirname(os.path.abspath(__file__))
    rounds = [
        int(m.group(1))
        for p in glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))
        if (m := re.search(r"CORRECTNESS_r(\d+)\.json$", p))
    ]
    return (max(rounds) + 1) if rounds else 1


def _ordered_names() -> list[str]:
    from etl_jetro_spark.plans.queries import QUERIES

    names = list(QUERIES)
    rnd = _round_index()
    newest_n = _R5_NEWEST_N if rnd <= 5 else NEWEST_N
    newest = names[-newest_n:][::-1]
    older = names[: -newest_n or None]
    if not older:
        return newest
    # Anchor round 5's rotation at the start of the never-signed band
    # (q49 onward). r5 advanced by the old 25-stride; rounds >= 6
    # continue contiguously from where r5 stopped, striding ROTATE_N.
    anchor = next(
        (i for i, n in enumerate(older) if n.startswith("q49")), 0
    )
    if rnd <= 5:
        off = (anchor + (rnd - 5) * _R5_ROTATE_N) % len(older)
    else:
        off = (anchor + _R5_ROTATE_N + (rnd - 6) * ROTATE_N) % len(older)
    return newest + older[off:] + older[:off]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (pricing summary, TPC-H Q1 shape) on sf0.001."""
    from etl_jetro_spark.plans.queries import q1_pricing_summary

    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from etl_jetro_spark.plans.queries import QUERIES

    return {n: QUERIES[n] for n in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    from etl_jetro_spark.plans.queries import ORACLES

    return {n: ORACLES[n] for n in _ordered_names() if n in ORACLES}
