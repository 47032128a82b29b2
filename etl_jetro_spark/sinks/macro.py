"""Keystroke-macro text sinks (SURVEY §2.9 K3–K5).

The reference renders deterministic AS/400 keystroke scripts from the final
ordered tables (247/tools/pricesheet_tool.py:106-203 DLPM;
247/tools/allocation_tool.py:230-336 ADPO,X; Flips/tools/adpo_I_tool.py
ADPO,I). These are *ordered sinks*: output depends on total row order, so
the engine sorts in Spark (small post-agg results by construction) and
renders driver-side — byte-exact given an injected clock.

At 100 TB these sinks are unchanged: they consume the *aggregated* order
table (≤ thousands of rows per supplier run), never the raw fact data.
"""

from __future__ import annotations

from datetime import date

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_jetro_spark.functions.text import item7, money2dp
from etl_jetro_spark.operators.sort import numeric_first_key

FREIGHT_ITEM = "0990033"  # reference 247/tools/allocation_tool.py:304


def _mdy2(d: date) -> str:
    return d.strftime("%m/%d/%y")


def _mdy_dash(d: date) -> str:
    return d.strftime("%m-%d-%y")


def render_dlpm(
    price_long: DataFrame, initials: str, run_date: date
) -> tuple[str, str]:
    """K3: per long-price row, the fixed keystroke block; returns
    (filename, text). Input schema: (Store#, Item#, Vendor#, Cost).

    Ordering: Store# numeric-first, then Item# — computed in Spark; the
    collect is the sink boundary.
    """
    rows = (
        price_long.select(
            F.col("Store#").cast("string").alias("store"),
            item7(F.col("Item#")).alias("item"),
            F.col("Vendor#").cast("string").alias("vendor"),
            money2dp(F.col("Cost")).alias("cost"),
        )
        .orderBy(numeric_first_key("store").asc_nulls_last(), "store", "item")
        .collect()
    )
    out: list[str] = []
    for r in rows:
        cost = (r["cost"] or "0.00").replace(",", "")
        out += [
            "Key Home",
            "Type DLPM",
            "Key Enter",
            f"Type {r['store']}-{r['item']}",
            "Key Tab",
            f"Type {r['vendor']}",
            "Key Enter",
            f"Type {cost}",
            "Key Tab",
            f"Type {initials}",
            "Key Enter",
            "Key PF10",
        ]
    name = f"{_mdy_dash(run_date)} 247DLPM.txt"
    return name, "\n".join(out) + ("\n" if out else "")


def render_adpo_x(
    canonical: DataFrame,
    supplier: int,
    run_date: date,
    po_csv_dir: str = "C:\\POs",
) -> tuple[str, str]:
    """K4: grouped ordered render — per Branch (numeric order) a header
    block, per item a line block, per group a trailer with the freight item
    and a clipboard block appending cut POs to the vendor CSV."""
    rows = (
        canonical.select(
            F.col("Branch").cast("string").alias("branch"),
            item7(F.col("Item").cast("string")).alias("item"),
            F.col("Distro Size").cast("string").alias("qty"),
            F.date_format(F.col("Expected Delivery Date"), "MM/dd/yy").alias("edd"),
        )
        .orderBy(numeric_first_key("branch").asc_nulls_last(), "branch", "item")
        .collect()
    )
    out: list[str] = []
    current = None
    for r in rows:
        if r["branch"] != current:
            if current is not None:
                out += _adpo_trailer(supplier, run_date, po_csv_dir)
            current = r["branch"]
            out += [
                "Key Home",
                "Type ADPO,X",
                "Key Enter",
                f"Type {r['branch']}",
                "Key Tab",
                f"Type {supplier}",
                "Key Tab",
                f"Type {r['edd']}",
                "Key Enter",
            ]
        out += [f"Type {r['item']}", "Key Tab", f"Type {r['qty']}", "Key Enter"]
    if current is not None:
        out += _adpo_trailer(supplier, run_date, po_csv_dir)
    name = f"{_mdy_dash(run_date)} ADPOX.txt"
    return name, "\n".join(out) + ("\n" if out else "")


def _adpo_trailer(supplier: int, run_date: date, po_csv_dir: str) -> list[str]:
    csv_name = f"VendorNo-{supplier}-{run_date.isoformat()}.csv"
    return [
        f"Type {FREIGHT_ITEM}",
        "Key Enter",
        "Key PF6",
        "CopyScreen",
        f"AppendClipboard {po_csv_dir}\\{csv_name}",
        "Key PF12",
    ]


def render_adpo_i(
    canonical: DataFrame,
    run_date: date,
    warehouse: str = "498",
    supplier: str = "20000",
) -> tuple[str, str]:
    """K5: like K4 with supplier literal 20000, warehouse 498, and per-branch
    XDCK/FOB injected; trailer varies with FOB presence."""
    rows = (
        canonical.select(
            F.col("Branch").cast("string").alias("branch"),
            item7(F.col("Item").cast("string")).alias("item"),
            F.col("Distro Size").cast("string").alias("qty"),
            F.date_format(F.col("Expected Delivery Date"), "MM/dd/yy").alias("edd"),
            F.col("XDCK").alias("xdck"),
            F.col("FOB").alias("fob"),
        )
        .orderBy(numeric_first_key("branch").asc_nulls_last(), "branch", "item")
        .collect()
    )
    out: list[str] = []
    current = None
    for r in rows:
        if r["branch"] != current:
            current = r["branch"]
            out += [
                "Key Home",
                "Type ADPO,I",
                "Key Enter",
                f"Type {r['branch']}",
                "Key Tab",
                f"Type {supplier}",
                "Key Tab",
                f"Type {warehouse}",
                "Key Tab",
                f"Type {r['edd']}",
            ]
            if r["xdck"] is not None:
                out += ["Key Tab", f"Type {r['xdck']:.2f}"]
            out += ["Key Enter"]
        out += [f"Type {r['item']}", "Key Tab", f"Type {r['qty']}", "Key Enter"]
        if r["fob"] is not None:
            out += [f"Type F{r['fob']:.2f}", "Key Enter"]
    name = f"{_mdy_dash(run_date)} ADPOI.txt"
    return name, "\n".join(out) + ("\n" if out else "")
