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


def orchestrate_tick(
    spark,
    control_grid: list[list[str]],
    watch_dirs: list[str],
    dest_dir: str,
    deadline_polls: int = 600,
    poll_fn=None,
) -> dict:
    """One full control-loop tick — the reference's ``main()`` body
    (sheet_bot/main.py:336-395) as a deterministic function:

    parse sections → select Ready → lock (Ready→SENDING payload) →
    watch/settle/move per expected PO → finalize (Sent/ERROR payload).

    ``poll_fn(state, dest_dir) -> None`` drives the snapshot poller until
    done/deadline; the default polls the real directories with no sleep
    (tests and batch replays). Returns a manifest with both write-back
    payloads and the final per-PO status.
    """
    from etl_jetro_spark.sinks.notify import status_update_payload
    from etl_jetro_spark.sources.sheet import parse_sections
    from etl_jetro_spark.streaming import snapshot as S

    rows = parse_sections(control_grid)
    ready = [r for r in rows if r.status == READY and r.vendor_num]
    lock_payload = [
        {"range": r.status_a1, "values": [[SENDING]]} for r in sorted(
            ready, key=lambda r: r.status_a1
        )
    ]

    expected_rows = []
    status_rows = []
    for r in ready:
        pos = expected_pos_for_vendor(r.stores)
        expected_rows += [(r.vendor_num, r.status_a1, po) for po in pos]
        st = S.new_watch(pos, deadline_polls=deadline_polls)
        S.precheck_dest(st, dest_dir)
        if poll_fn is not None:
            poll_fn(st, dest_dir)
        else:
            while st.pending():
                for d in watch_dirs:
                    S.poll_step(st, S.list_dir(d), dest_dir)
                if st.polls >= st.deadline_polls:
                    break
        status_rows += [(po, s) for po, s in st.status.items()]

    if not expected_rows:
        return {"lock": lock_payload, "final": [], "po_status": {}}

    expected = spark.createDataFrame(
        expected_rows, "vendor_num string, status_a1 string, po string"
    )
    status = spark.createDataFrame(status_rows, "po string, status string")
    final_payload = status_update_payload(
        finalize(expected, status).select("status_a1", "new_status")
    )
    return {
        "lock": lock_payload,
        "final": final_payload,
        "po_status": dict(status_rows),
    }
