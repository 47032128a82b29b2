"""Control-plane sheet source (SURVEY §2.1 S6, §2.7 D4).

The orchestrator's Google Sheet is a 2-D string grid holding N logical
sections, each starting at a row containing ``Note``; the section header
row carries marker columns (``Vendor #``, ``Status``) and integer-named
store columns, possibly compound (``452/490``). Rows become records with a
``stores`` map (reference sheet_bot/sheets.py:38-178, main.py:76-84).

The fetch itself is an API call (gspread — not installed here); this module
takes the raw grid as ``list[list[str]]`` so the parse logic is fully
testable, and ``sections_to_spark`` lands it as a DataFrame with a
MapType stores column. The sheet is also a *sink* (status write-back);
see streaming/ for the transition side.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401

# Weekday → tab-name prefix (reference sheet_bot/utils.py:29-35)
WEEKDAY_TAB_PREFIX = {0: "Mon", 1: "Tues", 2: "Wed", 3: "Thurs", 4: "Fri"}


def strip_dot_zero(s: str) -> str:
    return re.sub(r"\.0{1,2}$", "", s.strip())


def to_a1(row: int, col: int) -> str:
    """0-based (row, col) → A1 notation (reference sheet_bot/utils.py:54-65)."""
    letters = ""
    c = col + 1
    while c:
        c, rem = divmod(c - 1, 26)
        letters = chr(ord("A") + rem) + letters
    return f"{letters}{row + 1}"


@dataclass
class VendorRow:
    section: int
    sheet_row: int
    vendor_num: str
    vendor_name: str
    status: str
    status_a1: str
    stores: dict[str, str] = field(default_factory=dict)


def find_sections(grid: list[list[str]]) -> list[int]:
    """Row indices where a section header ('Note' cell) appears."""
    return [
        i
        for i, row in enumerate(grid)
        if any(str(c).strip().lower() == "note" for c in row)
    ]


def discover_schema(header: list[str]) -> dict[str, object]:
    """Marker-column discovery on a section header row: positions of
    Vendor #/Vendor Name/Status plus the store columns (integer-named,
    compound '452/490' allowed; 'PO count' ignored)."""
    pos: dict[str, object] = {"stores": {}}
    for j, cell in enumerate(header):
        name = str(cell).strip()
        low = name.lower()
        if low == "vendor #":
            pos["vendor_num"] = j
        elif low == "vendor name":
            pos["vendor_name"] = j
        elif low == "status":
            pos["status"] = j
        elif low in ("note", "po count", ""):
            continue
        elif re.fullmatch(r"\d+(\.0)?(\s*/\s*\d+(\.0)?)*", name):
            pos["stores"][j] = [strip_dot_zero(t) for t in re.split(r"\s*/\s*", name)]
    return pos


def parse_sections(grid: list[list[str]]) -> list[VendorRow]:
    """One physical grid → flat vendor records across all sections (D4
    union). Blank vendor numbers are skipped; 'x' store cells mean
    not-expected; '14.0'-style POs are normalized."""
    out: list[VendorRow] = []
    starts = find_sections(grid)
    for sec_idx, start in enumerate(starts):
        end = starts[sec_idx + 1] if sec_idx + 1 < len(starts) else len(grid)
        schema = discover_schema([str(c) for c in grid[start]])
        if "vendor_num" not in schema or "status" not in schema:
            continue
        for r in range(start + 1, end):
            row = [str(c) for c in grid[r]]

            def cell(j: int | None) -> str:
                return row[j].strip() if j is not None and j < len(row) else ""

            vendor = strip_dot_zero(cell(schema.get("vendor_num")))
            if not vendor:
                continue
            stores: dict[str, str] = {}
            for j, store_keys in schema["stores"].items():
                v = strip_dot_zero(cell(j))
                if v and v.lower() != "x":
                    for sk in store_keys:
                        stores[sk] = v
            out.append(
                VendorRow(
                    section=sec_idx,
                    sheet_row=r,
                    vendor_num=vendor,
                    vendor_name=cell(schema.get("vendor_name")),
                    status=cell(schema.get("status")),
                    status_a1=to_a1(r, schema["status"]),
                    stores=stores,
                )
            )
    return out


def sections_to_spark(spark: SparkSession, grid: list[list[str]]) -> DataFrame:
    rows = parse_sections(grid)
    return spark.createDataFrame(
        [
            (v.section, v.sheet_row, v.vendor_num, v.vendor_name, v.status, v.status_a1, v.stores)
            for v in rows
        ],
        "section int, sheet_row int, vendor_num string, vendor_name string, "
        "status string, status_a1 string, stores map<string,string>",
    )


def pick_today_tab(names: list[str], weekday: int) -> str | None:
    """Choose the worksheet whose name starts with today's prefix."""
    prefix = WEEKDAY_TAB_PREFIX.get(weekday)
    if prefix is None:
        return None
    for n in names:
        if n.startswith(prefix):
            return n
    return None
