"""Vendor-orchestration state machine (SURVEY §2.10 T2–T4).

The reference's control loop (sheet_bot/main.py:336-395): every 60 s, parse
the day's sheet, lock ``Ready`` rows to ``SENDING`` (so a second tick can't
double-pick them), fan vendors out to workers, and finalize each to
``Sent`` or ``ERROR`` with the missing-PO detail. The transitions here are
pure DataFrame functions — deterministic, testable, and usable both from a
batch poll loop and from a foreachBatch micro-batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

READY, SENDING, SENT, ERROR = "Ready", "SENDING", "Sent", "ERROR"


def select_ready(control: DataFrame, active_keys: DataFrame | None = None) -> DataFrame:
    """Rows eligible for pickup: status Ready and not currently active
    (T2 lock precondition). ``active_keys`` is a 1-col (status_a1) set."""
    ready = control.filter(F.col("status") == READY)
    if active_keys is not None:
        ready = ready.join(active_keys, "status_a1", "left_anti")
    return ready


def lock_updates(ready: DataFrame) -> DataFrame:
    """The Ready→SENDING lock batch: (status_a1, new_status) write-back
    rows (reference sheets.py:182-189 batch_update)."""
    return ready.select("status_a1", F.lit(SENDING).alias("new_status"))


def expected_pos_for_vendor(control_row_stores: dict[str, str]) -> list[str]:
    """Order-preserving distinct PO list from a vendor row's stores map
    (D1, reference sheet_bot/sheets.py:227-250)."""
    return list(dict.fromkeys(v for v in control_row_stores.values() if v))


def finalize(
    expected: DataFrame, status: DataFrame
) -> DataFrame:
    """Terminal transition per vendor: Sent iff every expected PO reached
    ``done``; else ERROR with the missing/failed PO detail (anti-join D3,
    reference main.py:309-314).

    ``expected``: (vendor_num, status_a1, po); ``status``: (po, status).
    """
    done = status.filter(F.col("status") == "done").select("po").distinct()
    missing = (
        expected.join(done, "po", "left_anti")
        .groupBy("vendor_num", "status_a1")
        .agg(F.sort_array(F.collect_list("po")).alias("missing_pos"))
    )
    all_vendors = expected.select("vendor_num", "status_a1").distinct()
    out = all_vendors.join(missing, ["vendor_num", "status_a1"], "left")
    return out.select(
        "vendor_num",
        "status_a1",
        F.when(F.col("missing_pos").isNull() | (F.size("missing_pos") == 0), SENT)
        .otherwise(ERROR)
        .alias("new_status"),
        F.when(
            F.col("missing_pos").isNotNull() & (F.size("missing_pos") > 0),
            F.concat(F.lit("missing: "), F.concat_ws(",", "missing_pos")),
        ).alias("detail"),
    )
