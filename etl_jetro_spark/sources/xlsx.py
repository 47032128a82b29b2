"""Minimal native .xlsx codec (SURVEY §2.1 S1/S2, §2.9 K1/K2 un-gating).

The container has no openpyxl, but .xlsx is a public format — a zip of
OOXML parts — so the engine carries its own small codec and the Excel
ingest/sink paths run for real:

- **reader**: workbook.xml (sheet names, hidden/veryHidden state, active
  tab) + workbook rels + sharedStrings + the worksheet's ``sheetData``
  → a headerless positional grid, matching ``read_excel(header=None)``
  semantics (reference 247/tools/read_file_tool.py:13-121 reads the
  active-visible sheet and skips hidden/veryHidden;
  SouthernCross/tools/read_file_tool.py:55-60 errors when the named
  sheet 'IBT FORMAT' is absent).
- **writer**: inline-string worksheets, optional hidden/veryHidden sheet
  states and activeTab — enough to exercise every reader behavior in
  tests and to emit the reference's K1/K2 workbooks.

Cell typing mirrors openpyxl: integral numerics → int, others → float,
shared/inline strings → str, booleans → bool. Dates are out of scope
(the reference's sheets carry dates as text the pipelines parse).
"""

from __future__ import annotations

import re
import zipfile
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

import pandas as pd

_NS = {
    "m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main",
    "r": "http://schemas.openxmlformats.org/officeDocument/2006/relationships",
    "rel": "http://schemas.openxmlformats.org/package/2006/relationships",
}


def _col_index(ref: str) -> int:
    """'A'→0, 'Z'→25, 'AA'→26 (A1-codec column part)."""
    n = 0
    for ch in ref:
        n = n * 26 + (ord(ch) - 64)
    return n - 1


def col_letters(idx: int) -> str:
    """0→'A', 25→'Z', 26→'AA'."""
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(65 + rem) + out
    return out


def _cell_value(c: ET.Element, shared: list[str]):
    t = c.get("t", "n")
    if t == "inlineStr":
        return "".join(
            tt.text or "" for tt in c.findall(".//m:t", _NS)
        )
    v = c.find("m:v", _NS)
    if v is None or v.text is None:
        return None
    if t == "s":
        return shared[int(v.text)]
    if t in ("str",):
        return v.text
    if t == "b":
        return v.text == "1"
    txt = v.text
    if re.fullmatch(r"-?\d+", txt):
        return int(txt)
    try:
        return float(txt)
    except ValueError:  # pragma: no cover - malformed numeric cell
        return txt


class WorkbookInfo:
    """Parsed workbook metadata: [(name, state, part_path)], active index."""

    def __init__(self, sheets: list[tuple[str, str, str]], active: int):
        self.sheets = sheets
        self.active = active

    def visible(self) -> list[tuple[str, str]]:
        return [(n, p) for n, s, p in self.sheets if s == "visible"]


def _workbook_info(zf: zipfile.ZipFile) -> WorkbookInfo:
    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
    target_by_rid = {}
    for rel in rels.findall("rel:Relationship", _NS):
        # targets are relative to xl/; some writers emit absolute "/xl/..."
        t = rel.get("Target", "").lstrip("/")
        target_by_rid[rel.get("Id")] = t if t.startswith("xl/") else f"xl/{t}"
    sheets = []
    for sh in wb.findall(".//m:sheets/m:sheet", _NS):
        rid = sh.get(f"{{{_NS['r']}}}id")
        sheets.append(
            (sh.get("name"), sh.get("state", "visible"), target_by_rid[rid])
        )
    view = wb.find(".//m:bookViews/m:workbookView", _NS)
    active = int(view.get("activeTab", "0")) if view is not None else 0
    return WorkbookInfo(sheets, active)


def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    try:
        root = ET.fromstring(zf.read("xl/sharedStrings.xml"))
    except KeyError:
        return []
    out = []
    for si in root.findall("m:si", _NS):
        out.append("".join(t.text or "" for t in si.findall(".//m:t", _NS)))
    return out


def _sheet_grid(zf: zipfile.ZipFile, part: str, shared: list[str]) -> pd.DataFrame:
    root = ET.fromstring(zf.read(part))
    cells: dict[tuple[int, int], object] = {}
    max_r = max_c = -1
    for row in root.findall(".//m:sheetData/m:row", _NS):
        for c in row.findall("m:c", _NS):
            ref = c.get("r", "")
            m = re.fullmatch(r"([A-Z]+)(\d+)", ref)
            if not m:  # pragma: no cover - refless cells unsupported
                continue
            ri, ci = int(m.group(2)) - 1, _col_index(m.group(1))
            val = _cell_value(c, shared)
            if val is not None:
                cells[(ri, ci)] = val
                max_r, max_c = max(max_r, ri), max(max_c, ci)
    if max_r < 0:
        return pd.DataFrame()
    data = [
        [cells.get((r, c)) for c in range(max_c + 1)] for r in range(max_r + 1)
    ]
    return pd.DataFrame(data, dtype=object)


def read_xlsx_grid(path: str, sheet: str | int | None = None) -> pd.DataFrame:
    """Raw positional grid from a worksheet.

    ``sheet`` named → that sheet, error when absent (SouthernCross
    'IBT FORMAT' behavior); integer → that position (visibility ignored,
    like ``read_excel(sheet_name=N)``). Unnamed → the ACTIVE sheet if
    visible, else the first visible sheet; hidden/veryHidden sheets are
    never picked (reference read_file_tool.py:83-101)."""
    with zipfile.ZipFile(path) as zf:
        info = _workbook_info(zf)
        shared = _shared_strings(zf)
        if isinstance(sheet, int):
            if sheet >= len(info.sheets):
                raise ValueError(f"worksheet index {sheet} out of range in {path}")
            return _sheet_grid(zf, info.sheets[sheet][2], shared)
        if sheet is not None:
            for name, _state, part in info.sheets:
                if name == sheet:
                    return _sheet_grid(zf, part, shared)
            raise ValueError(f"worksheet {sheet!r} not found in {path}")
        visible = info.visible()
        if not visible:
            raise ValueError(f"no visible worksheet in {path}")
        act_name, act_state, act_part = info.sheets[info.active] if info.active < len(
            info.sheets
        ) else (None, "hidden", None)
        if act_state == "visible":
            return _sheet_grid(zf, act_part, shared)
        return _sheet_grid(zf, visible[0][1], shared)


def sheet_names(path: str) -> list[tuple[str, str]]:
    """[(name, state)] for every worksheet."""
    with zipfile.ZipFile(path) as zf:
        return [(n, s) for n, s, _p in _workbook_info(zf).sheets]


# --------------------------------------------------------------------------
# writer
# --------------------------------------------------------------------------

def _sheet_xml(rows: list[list[object]]) -> str:
    parts = [
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>',
        f'<worksheet xmlns="{_NS["m"]}"><sheetData>',
    ]
    for ri, row in enumerate(rows):
        cells = []
        for ci, v in enumerate(row):
            if v is None or (isinstance(v, float) and v != v):
                continue
            ref = f"{col_letters(ci)}{ri + 1}"
            if isinstance(v, bool):
                cells.append(f'<c r="{ref}" t="b"><v>{int(v)}</v></c>')
            elif isinstance(v, (int, float)):
                cells.append(f'<c r="{ref}"><v>{v!r}</v></c>')
            else:
                cells.append(
                    f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">'
                    f"{escape(str(v))}</t></is></c>"
                )
        parts.append(f'<row r="{ri + 1}">{"".join(cells)}</row>')
    parts.append("</sheetData></worksheet>")
    return "".join(parts)


def write_xlsx(
    path: str,
    sheets: dict[str, list[list[object]] | pd.DataFrame],
    states: dict[str, str] | None = None,
    active: int = 0,
) -> str:
    """Write a workbook. ``sheets`` maps name → rows (or positional grid);
    ``states`` maps name → visible|hidden|veryHidden (default visible);
    ``active`` is the activeTab index."""
    states = states or {}
    names = list(sheets)
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        overrides = "".join(
            f'<Override PartName="/xl/worksheets/sheet{i + 1}.xml" '
            'ContentType="application/vnd.openxmlformats-officedocument.'
            'spreadsheetml.worksheet+xml"/>'
            for i in range(len(names))
        )
        zf.writestr(
            "[Content_Types].xml",
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
            '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
            '<Default Extension="xml" ContentType="application/xml"/>'
            '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.'
            'openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
            f"{overrides}</Types>",
        )
        zf.writestr(
            "_rels/.rels",
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            f'<Relationships xmlns="{_NS["rel"]}">'
            '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
            'officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
            "</Relationships>",
        )
        sheet_tags = "".join(
            f'<sheet name="{escape(n, {chr(34): "&quot;"})}" sheetId="{i + 1}"'
            + (
                f' state="{states[n]}"'
                if states.get(n, "visible") != "visible"
                else ""
            )
            + f' r:id="rId{i + 1}"/>'
            for i, n in enumerate(names)
        )
        zf.writestr(
            "xl/workbook.xml",
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            f'<workbook xmlns="{_NS["m"]}" xmlns:r="{_NS["r"]}">'
            f'<bookViews><workbookView activeTab="{active}"/></bookViews>'
            f"<sheets>{sheet_tags}</sheets></workbook>",
        )
        rels = "".join(
            f'<Relationship Id="rId{i + 1}" Type="http://schemas.openxmlformats'
            '.org/officeDocument/2006/relationships/worksheet" '
            f'Target="worksheets/sheet{i + 1}.xml"/>'
            for i in range(len(names))
        )
        zf.writestr(
            "xl/_rels/workbook.xml.rels",
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            f'<Relationships xmlns="{_NS["rel"]}">{rels}</Relationships>',
        )
        for i, n in enumerate(names):
            rows = sheets[n]
            if isinstance(rows, pd.DataFrame):
                rows = [
                    [None if (isinstance(v, float) and v != v) else v for v in r]
                    for r in rows.itertuples(index=False)
                ]
            zf.writestr(f"xl/worksheets/sheet{i + 1}.xml", _sheet_xml(rows))
    return path
