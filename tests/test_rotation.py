"""Driver-window rotation policy (__spark_entry__._ordered_names).

Round-7 verdict asks #3/#7: the newest band must never truncate a
round's own additions (r06 added 11 and NEWEST_N=10 dropped q256, the
recall gate for that round's headline fix), and the rotation window
must spend its slots on never-driver-signed queries before re-signing
already-signed ones (the contiguous stride was about to burn 31 of
r07's 40 slots on q125-q155, signed in r04).
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry  # noqa: E402


def test_ordered_names_is_a_permutation_of_the_catalog():
    from etl_jetro_spark.plans.queries import QUERIES

    names = entry._ordered_names()
    assert sorted(names) == sorted(QUERIES)


def test_newest_band_covers_every_query_added_this_round():
    """Every query registered after the previous round's close (catalog
    size = BENCH_r{N}.json n_queries) must sit in the head of the
    window, even when the round added more than NEWEST_N."""
    from etl_jetro_spark.plans.queries import QUERIES

    prev = entry._prev_close_count()
    assert prev is not None and prev >= 266  # r06 closed at 266
    added = list(QUERIES)[prev:]
    names = entry._ordered_names()
    head = names[: max(entry.NEWEST_N, len(added))]
    assert all(q in head for q in added)


def test_rotation_window_prefers_never_signed_queries():
    """Slots after the newest band go to never-driver-signed queries
    (registration order) before any already-signed query reappears."""
    names = entry._ordered_names()
    signed = entry._signed_names()
    prev = entry._prev_close_count()
    newest_n = max(entry.NEWEST_N, len(names) - (prev or len(names)))
    window = names[newest_n : newest_n + entry.ROTATE_N]
    stale_total = sum(1 for n in names if n not in signed) - (
        len(names) - (prev or len(names))
    )
    # while stale queries remain beyond the window, the window is
    # entirely stale; once they run out the window backfills signed ones
    expect_stale = min(entry.ROTATE_N, max(stale_total, 0))
    assert sum(1 for n in window if n not in signed) >= expect_stale
