"""Keystroke-macro text sinks (SURVEY §2.9 K3–K5) — reference-faithful.

The reference renders deterministic AS/400 keystroke scripts from the final
ordered tables; the byte layout of each template below mirrors the
reference output format exactly (K3 DLPM: 247/tools/pricesheet_tool.py:
106-203; K4 ADPO,X: 247/tools/allocation_tool.py:230-336; K5 ADPO,I:
Flips/tools/adpo_I_tool.py:7-288). The clock is an injected parameter
(the reference stamps wall-clock time — SURVEY §7 hard-part 4).

These are *ordered sinks*: output depends on total row order, so the
engine sorts in Spark (post-agg results are small by construction —
stores × items, not fact volume) and renders driver-side.
"""

from __future__ import annotations

import re
from datetime import date

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_jetro_spark.functions.text import item7
from etl_jetro_spark.operators.sort import numeric_first_key

FREIGHT_ITEM = "0990033"   # reference allocation_tool.py:304
FAXSHARE_UNC = "\\\\10.1.12.12\\faxshare\\DailyPOCount\\POs"


def _mdy2(d: date) -> str:
    return d.strftime("%m/%d/%y")


def _clean_num_str(s: object) -> str:
    """Trailing-zero/point cleanup for XDCK/FOB values ('1.50'→'1.5',
    '10.00'→'10') — reference adpo_I_tool.py:50-71."""
    t = str(s).strip()
    if t in ("", "nan", "NaN", "None"):
        return ""
    try:
        float(t)
    except ValueError:
        return t
    if "." in t:
        t = t.rstrip("0").rstrip(".")
    return t


# --------------------------------------------------------------------------
# K3: DLPM price-update macro
# --------------------------------------------------------------------------

def render_dlpm(
    price_long: DataFrame, initials: str, run_date: date
) -> tuple[str, str]:
    """Per long-price row, the reference's fixed 31-line keystroke block.

    Returns (filename 'MM-DD-YY 247DLPM.txt', text). Input schema:
    (Store#, Item#, Vendor#, Cost). Rows render in numeric-store order
    (W1) — the engine's deterministic ordering of the reference's
    caller-supplied order.
    """
    from etl_jetro_spark.functions.text import money2dp

    rows = (
        price_long.select(
            F.trim(F.col("Store#").cast("string")).alias("store"),
            item7(F.col("Item#")).alias("item"),
            F.trim(F.col("Vendor#").cast("string")).alias("vendor"),
            money2dp(F.col("Cost")).alias("cost"),
        )
        .orderBy(numeric_first_key("store").asc_nulls_last(), "store", "item")
        .collect()
    )
    date_text = _mdy2(run_date)
    out: list[str] = []
    for r in rows:
        cost = (r["cost"] or "0.00").replace(",", "")
        out += [
            "Key Tab",
            f"Type {r['store']}-{r['item']}",
            "Key Tab",
            "Key Delete",
            "Type H",
            "Key Tab",
            "Type A",
            "Key Enter",
            f"Type {date_text}",
            "Key Tab",
            "Key Tab",
            "Key Tab",
            f"Type {initials}",
            "Key Tab",
            "Key Tab",
            "Key Tab",
            "Key Tab",
            f"Type {r['vendor']}",
            "Key Tab",
            "Key Tab",
            "Key Tab",
            "Key Tab",
            "Key Tab",
            f"Type {cost}",
            "Key Enter",
            "Type n",
            "Key Enter",
            "Key Enter",
            "Key Enter",
            "Key Enter",
            "Key Enter",
            "Key Enter",
        ]
    name = f"{run_date.strftime('%m-%d-%y')} 247DLPM.txt"
    return name, "\n".join(out)


# --------------------------------------------------------------------------
# K4: ADPO,X allocation macro
# --------------------------------------------------------------------------

def _clipboard_block(supplier: str, buyer: str, run_date: date) -> list[str]:
    iso = run_date.isoformat()
    return [
        "wait 3000",
        "EditSelect 13,39,13,47",
        "key EditCopy",
        "wait 1000",
        f"FileSpec clipboard,C:\\POs\\VendorNo-{supplier}-{iso}.csv,append",
        "key EditSaveClipboard",
        "wait 1000",
        f"FileSpec clipboard,{FAXSHARE_UNC}\\{iso}_{buyer}.csv,append",
        "key EditSaveClipboard",
        "key PA2",
        'type "adpo,x"',
        "key enter",
    ]


def render_adpo_x(canonical: DataFrame, run_date: date) -> tuple[str, str]:
    """Grouped ordered render per Branch (numeric order): 5-line group
    header, 10-line item block, freight trailer with EDD, and the
    clipboard block appending cut-PO CSVs.

    Supplier and buyer come from the canonical table itself (first row),
    like the reference. Returns
    (filename '{iso}_ADPO_X_Vendor{supplier}.txt', text).
    """
    rows = (
        canonical.select(
            F.col("Branch").cast("string").alias("branch"),
            item7(F.col("Item").cast("string")).alias("item"),
            F.col("Distro Size").try_cast("long").alias("qty"),
            F.date_format(F.col("Expected Delivery Date"), "MM/dd/yy").alias("edd"),
            F.col("Supplier On Record").cast("string").alias("supplier"),
            F.col("WW Buyer").cast("string").alias("buyer"),
        )
        .orderBy(numeric_first_key("branch").asc_nulls_last(), "branch", "item")
        .collect()
    )
    if not rows:
        raise ValueError("canonical output is empty")
    supplier = "".join(ch for ch in rows[0]["supplier"].removesuffix(".0") if ch.isdigit()) or rows[0]["supplier"]
    buyer = (rows[0]["buyer"] or "P20").strip() or "P20"

    lines: list[str] = []
    current = None
    for r in rows:
        if r["branch"] != current:
            if current is not None:
                lines += _group_trailer(current, rows, run_date)
                lines += _clipboard_block(supplier, buyer, run_date)
            current = r["branch"]
            lines += [
                "Key tab",
                f"Type {buyer}",
                f"Type {r['branch']}",
                f"Type {supplier}",
                "Key Enter",
            ]
        lines += [
            f"Type  {r['branch']}-{r['item']}",
            "Key enter",
            "Key tab",
            "Key delete",
            "Key delete",
            "Key delete",
            "Key delete",
            f"Type  {r['qty'] if r['qty'] is not None else 0}",
            "Key Enter",
            "Key PF24",
        ]
    if current is not None:
        lines += _group_trailer(current, rows, run_date)
        lines += _clipboard_block(supplier, buyer, run_date)

    text = "\n".join(str(ln).replace("\r", "") for ln in lines)
    text = re.sub(r"[ \t]+(\n)", r"\1", text)
    text = re.sub(r"\n{2,}", "\n", text)
    name = f"{run_date.isoformat()}_ADPO_X_Vendor{supplier}.txt"
    return name, text


def _group_trailer(branch: str, rows, run_date: date) -> list[str]:
    edd = next(r["edd"] for r in rows if r["branch"] == branch)
    return [
        f"Type  {branch}-{FREIGHT_ITEM}",
        "Key Enter",
        "Key tab",
        "Key delete",
        "Key delete",
        "Key delete",
        "Key delete",
        "Type 0",
        "Key Enter",
        "Key PF13",
        "Key Enter",
        f"Type {edd}",
        "Key Enter",
        "Key Enter",
    ]


# --------------------------------------------------------------------------
# K5: ADPO,I macro (Flips big)
# --------------------------------------------------------------------------

def render_adpo_i(
    canonical: DataFrame,
    run_date: date,
    xdck_letter: str = "M",
    warehouse: str = "498",
    freight_type: str = "W",
    buyer_code: str = "P20",
    file_token: str = "output",
) -> tuple[str, str]:
    """K5: per-branch blocks with warehouse-addressed items, a freight
    trailer whose terminal choreography varies with FOB presence, and
    per-branch XDCK/FOB value injection. Groups iterate in string-sorted
    Branch order (reference groupby sort=True on the string column)."""
    rows = (
        canonical.select(
            F.trim(F.col("Branch").cast("string")).alias("branch"),
            item7(F.col("Item").cast("string")).alias("item"),
            F.col("Distro Size").cast("string").alias("qty"),
            F.date_format(F.col("Expected Delivery Date"), "MM/dd/yy").alias("edd"),
            F.col("XDCK").cast("string").alias("xdck"),
            F.col("FOB").cast("string").alias("fob"),
        )
        .orderBy(F.col("branch").asc(), "item")
        .collect()
    )
    lines: list[str] = []

    def add(s: str) -> None:
        lines.append(s.rstrip())

    def items_of(branch: str):
        return [r for r in rows if r["branch"] == branch]

    seen: list[str] = []
    for r in rows:
        if r["branch"] in seen:
            continue
        seen.append(r["branch"])
        group = items_of(r["branch"])
        first = group[0]
        edd = first["edd"] or ""
        xdck = _clean_num_str(first["xdck"])
        fob = _clean_num_str(first["fob"])

        # outer cycle start
        add("")
        add("Key tab")
        add(f"Type {buyer_code}")
        add(f"Type {r['branch']}")
        add("Type 20000")
        add("Key Enter")
        # item blocks
        for it in group:
            add("")
            add(f"Type {warehouse}-{it['item']}")
            add("Key enter")
            add("Key tab")
            add("Key delete")
            add("Key delete")
            add("Key delete")
            add("Key delete")
            add(f"Type {it['qty']}")
            add("Key Enter")
            add("Key PF24")
        # trailer (shared head)
        add("")
        add(f"Type {warehouse}-{FREIGHT_ITEM}")
        add("Key enter")
        add("Key tab")
        add("Key delete")
        add("Key delete")
        add("Key delete")
        add("Key delete")
        add("Type 0")
        add("Key Enter")
        add("Key PF13")
        add("Key Enter")
        add("wait 500")
        add("wait 500")
        add(f"Type {edd}")
        add("Key PF2")
        add("wait 500")
        add(f"Type {xdck_letter}")
        add("key pf2")
        add("wait 1500")
        add("key cursorup")
        add("key cursorup")
        add("wait 500")
        add("key cursorup")
        add("key cursorup")
        add("key tab")
        add("wait 500")
        add("key cursordown")
        add(f"Type {edd}")
        add("Key Tab")
        if fob:
            add("key delete")
            add("key delete")
            add("key delete")
            add("key delete")
            add(f"type {fob}")
            add("wait 500")
            add("key tab")
            add(f"type {freight_type}")
            add("Key cursordown")
            add("Key tab")
            add("key tab")
        else:
            add("key tab")
            add("key tab")
            add("wait 500")
            add("key tab")
            add("Key cursordown")
            add("Key tab")
        add("")
        add("key delete")
        add("wait 500")
        add("key delete")
        add("key delete")
        add("key delete")
        add(f"Type {xdck}")
        add("wait 500")
        add("key tab")
        add(f"type {freight_type}")
        add("Key tab")
        add("key tab")
        add("wait 500")
        add("key tab")
        add("wait 500")
        add("Key cursordown")
        add("wait 500")
        add("Key cursordown")
        add("key tab")
        add("")
        add("key Enter")
        add("wait 500")
        add("key Enter")
        add("wait 3000")
        add("EditSelect 13,39,13,47")
        add("key EditCopy")
        add("wait 1000")
        iso = run_date.isoformat()
        add(f"FileSpec clipboard,C:\\POs\\{iso}_114544_{buyer_code}.csv,append")
        add("key EditSaveClipboard")
        add("wait 1000")
        add(f"FileSpec clipboard,{FAXSHARE_UNC}\\{iso}_{buyer_code}.csv,append")
        add("key EditSaveClipboard")

    name = f"{run_date.isoformat()}_ADPO_I_{file_token}.txt"
    return name, "\n".join(lines) + "\n"
