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

_FONT = "font-family:Segoe UI, Arial, Helvetica, sans-serif; font-size:14px; line-height:1.6;"

BODY_TEMPLATE = """<!doctype html>
<html>
  <head>
    <meta charset="utf-8">
    <title>Email Body</title>
  </head>
  <body style="margin:0;">
    <div style="{font}">
      <p style="margin:0 0 12px 0;">Greetings,</p>
      <p style="margin:0 0 12px 0;">Please confirm the following POs:</p>
      <div style="white-space:normal;">
        {po_lines}
      </div>
    </div>
  </body>
</html>
"""


def generate_body(pos: list[str]) -> str:
    """K7: the reference's full HTML body document — Greetings preamble,
    confirm line, one PO per line (escaped), Segoe-UI styling
    (email_generator.py:6-39)."""
    from html import escape

    items = [escape(str(x).strip()) for x in (pos or []) if str(x).strip()]
    po_lines = "<br>\n        ".join(items)
    return BODY_TEMPLATE.format(font=_FONT, po_lines=po_lines)


def combine_body_signature(body_html: str, signature_html: str, padding_px: int = 24) -> str:
    """K7: merge body and signature documents into one email HTML —
    body first, 24px spacer, signature, single container
    (email_generator.py:42-89)."""
    import re as _re

    def inner(html_text: str) -> str:
        m = _re.search(r"<body[^>]*>(.*?)</body>", html_text, flags=_re.I | _re.S)
        return (m.group(1) if m else html_text).strip()

    return f"""<!doctype html>
<html>
  <head>
    <meta charset="utf-8">
    <title>Email</title>
    <meta http-equiv="x-ua-compatible" content="ie=edge">
    <meta name="viewport" content="width=device-width, initial-scale=1">
  </head>
  <body style="margin:0;">
    <div style="padding:{padding_px}px; {_FONT}">
      {inner(body_html)}
      <div style="height:24px;"></div>
      {inner(signature_html)}
    </div>
  </body>
</html>
"""


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
