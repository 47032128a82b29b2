"""Google Sheets transport adapter (SURVEY §2.1 S6 fetch + §2.9 K8 write).

The reference talks to the control-plane spreadsheet through gspread
(sheet_bot/sheets.py:31-36 auth/open, :38-50 weekday tab pick, :182-189
batch write-back). The engine models the same surface over the public
Sheets REST API with an injectable transport callable
``http(method, url, headers=None, form=None, json_body=None) ->
(status, payload)`` — the grid parsing/write planning is pure and tested
against a fake transport; nothing opens a network connection unless the
caller wires one in.
"""

from __future__ import annotations

from collections.abc import Callable

HttpFn = Callable[..., tuple[int, dict]]

API = "https://sheets.googleapis.com/v4/spreadsheets"


class SheetsClient:
    """Minimal control-plane spreadsheet client: list tabs, fetch a tab's
    2-D values, apply a batch of A1-addressed value updates."""

    def __init__(self, spreadsheet_id: str, http: HttpFn, token: str = ""):
        self.sid = spreadsheet_id
        self.http = http
        self.token = token

    def _headers(self) -> dict:
        return {"Authorization": f"Bearer {self.token}"} if self.token else {}

    def _get(self, url: str) -> dict:
        status, body = self.http("GET", url, headers=self._headers())
        if status != 200:
            raise RuntimeError(f"Sheets GET failed [{status}]: {body}")
        return body

    def list_tabs(self) -> list[str]:
        body = self._get(f"{API}/{self.sid}?fields=sheets.properties.title")
        return [
            s["properties"]["title"] for s in body.get("sheets", [])
        ]

    def get_all_values(self, tab: str) -> list[list[str]]:
        """The tab's 2-D string grid (reference ``get_all_values()``) —
        rows right-padded to equal width (the REST API trims trailing
        blanks; the grid contract is rectangular)."""
        from urllib.parse import quote

        body = self._get(f"{API}/{self.sid}/values/{quote(tab, safe='')}")
        values = body.get("values", [])
        width = max((len(r) for r in values), default=0)
        return [[str(v) for v in r] + [""] * (width - len(r)) for r in values]

    def pick_today_tab(self, base_date) -> str:
        """Weekday-prefix tab match (F12, reference sheets.py:38-50):
        today's Mon/Tues/Wed/Thurs/Fri prefix; error when absent."""
        from etl_jetro_spark.functions.dates import WEEKDAY_PREFIX

        prefix = WEEKDAY_PREFIX.get(base_date.strftime("%a")[:3])
        if prefix is None:
            raise ValueError(f"no weekday tab for {base_date} (weekend)")
        for t in self.list_tabs():
            if t.startswith(prefix):
                return t
        raise ValueError(f"no tab starting with {prefix!r}")

    def batch_update(self, payload: list[dict]) -> dict:
        """Apply [{range, values}] updates in one request (reference
        sheets.py:182-189 ``ws.batch_update``). No-op on empty payload."""
        if not payload:
            return {"totalUpdatedCells": 0}
        status, body = self.http(
            "POST",
            f"{API}/{self.sid}/values:batchUpdate",
            headers=self._headers(),
            json_body={"valueInputOption": "RAW", "data": payload},
        )
        if status != 200:
            raise RuntimeError(f"Sheets batchUpdate failed [{status}]: {body}")
        return body
