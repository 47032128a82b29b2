"""Notification sinks (SURVEY §2.9 K7/K8).

K7: HTML email body from the PO list + signature combiner; the actual MS
Graph send (device-code auth, base64 attachments — reference
sheet_bot/email_sender.py:30-175) is network I/O gated behind msal, which
is not installed here. The body generation is deterministic and tested.

K8: Google Sheet status write-back — the reference batches A1-addressed
updates (sheets.py:182-189). The *planning* of updates is pure (DataFrame →
[{range, values}] payload); the HTTP call is gated behind gspread.

Both are designed as foreachBatch sinks: idempotent per (key, status), so
micro-batch replays are safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

try:  # pragma: no cover
    import msal  # noqa: F401

    HAVE_GRAPH = True
except ImportError:
    HAVE_GRAPH = False

try:  # pragma: no cover
    import gspread  # noqa: F401

    HAVE_SHEETS = True
except ImportError:
    HAVE_SHEETS = False

BODY_TEMPLATE = (
    "Greetings,<br><br>"
    "Please confirm the following POs:<br>{items}<br>"
)


def generate_body(pos: list[str], signature: str = "") -> str:
    """K7: HTML body listing the POs, reference template shape
    (email_generator.py:6-89)."""
    items = "".join(f"&bull; {po}<br>" for po in pos)
    body = BODY_TEMPLATE.format(items=items)
    return body + signature if signature else body


def send_email_graph(
    to: list[str], subject: str, body_html: str, attachments: list[str] | None = None
) -> None:  # pragma: no cover - network sink, msal absent
    if not HAVE_GRAPH:
        raise NotImplementedError(
            "MS Graph send requires msal (absent); body/recipients were "
            "computed deterministically — wire this sink in a connected env"
        )


def status_update_payload(updates: DataFrame) -> list[dict]:
    """K8: (status_a1, new_status) rows → the Sheets batch_update payload.
    Sorted for determinism; safe to re-send (last-write-wins upsert)."""
    rows = sorted(
        (r["status_a1"], r["new_status"]) for r in updates.collect()
    )
    return [{"range": a1, "values": [[status]]} for a1, status in rows]


def write_status_updates(
    updates: DataFrame, worksheet=None
) -> list[dict]:
    """Apply the payload when a Sheets client exists; always returns it."""
    payload = status_update_payload(updates)
    if worksheet is not None:  # pragma: no cover - gspread absent
        worksheet.batch_update(payload)
    return payload
