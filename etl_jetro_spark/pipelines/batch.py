"""The six supplier batch pipelines re-expressed on the engine.

Each pipeline is (a) a pandas *clean* step on the raw positional grid
(ingest layer — sheets are small; scale = many files via
sources.excel.grids_to_spark) and (b) a Spark *build* step: melt → aggregate
→ join → derive → canonical columns (relational layer — scales).

Reference cites per pipeline are in the docstrings; constants come from
operators.canonical.PIPELINES (code-observed, SURVEY §7 hard-part 6).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_jetro_spark.functions.dates import default_edd, next_mwf
from etl_jetro_spark.functions.dates import fmt_mdy_no_pad as EF_fmt_mdy_no_pad
from etl_jetro_spark.functions.text import parse_money as parse_money_col
from etl_jetro_spark.normalize import grid as G
from etl_jetro_spark import operators as O


def _to_spark(spark: SparkSession, pdf: pd.DataFrame) -> DataFrame:
    """Headered wide pandas grid → all-string Spark DataFrame."""
    return spark.createDataFrame(pdf.astype(object).where(pdf.notna(), None).astype(str).replace({"None": None}))


# --------------------------------------------------------------------------
# 247 / Leavins allocation  (reference 247/tools/allocation_tool.py:7-169,
# Leavins/tools/allocation_tool.py — Leavins requires an explicit EDD)
# --------------------------------------------------------------------------

def clean_allocation(raw: pd.DataFrame) -> pd.DataFrame:
    """Drop junk row 0, promote row 1, slice left of 'Total', drop the
    description column and the grand-total footer row (P1/P2/P3/P4)."""
    wide = G.promote_header(raw, header_row=1)
    wide = G.drop_last_row(wide)
    wide = G.slice_at_marker(wide, "Total", keep="left")
    # only the exact 'Item Description' column — the reference does not
    # touch other description-ish names (allocation_tool.py:43-48)
    return G.drop_columns_ci(wide, ["Item Description"])


def build_allocation(
    spark: SparkSession,
    wide: pd.DataFrame,
    pipeline: str = "247",
    edd: Column | None = None,
    base_date: str | None = None,
) -> DataFrame:
    """Melt (U1) → sum per (Branch, Item) (A1) → ≠0 (P8) → canonical.

    ``edd`` defaults to the today+2-roll-Monday rule (F9) from ``base_date``
    — Leavins passes an explicit one (the reference errors without it).
    """
    if edd is None:
        if base_date is None and pipeline == "leavins":
            raise ValueError("leavins requires an explicit EDD")  # :133-134
        edd = default_edd(F.lit(base_date).cast("date"))
    df = _to_spark(spark, wide)
    item_col = next(c for c in df.columns if c.strip().lower().replace("#", "").strip() in ("item", "item item"))
    long = O.melt(
        df, [item_col], var_name="Branch", value_name="qty", numeric_vars_only=True
    ).withColumnRenamed(item_col, "Item")
    agg = O.sum_by(long, ["Branch", "Item"], "qty", out="Distro Size")
    agg = agg.withColumn("Distro Size", F.col("Distro Size").cast("long"))
    return O.to_canonical(agg, O.PIPELINES[pipeline], edd=edd)


# --------------------------------------------------------------------------
# 247 price sheet  (reference 247/tools/pricesheet_tool.py:8-102)
# --------------------------------------------------------------------------

def clean_pricesheet(raw: pd.DataFrame) -> pd.DataFrame:
    """Drop row 0, promote row 1 (headers deduped with .1 suffixes), drop
    zero/NA Item# rows, drop Item Name / FOB columns."""
    wide = G.promote_header(raw, header_row=1)
    wide = G.drop_columns_ci(wide, ["Item Name", "FOB"])
    item = wide.columns[G.find_column(wide, "Item#")]
    keep = ~wide[item].map(
        lambda v: str(v).strip().lower() in ("", "0", "0.0", "nan", "none")
    )
    return wide[keep].reset_index(drop=True)


STORE_REMAP = {"490": "498"}       # P10, pricesheet_tool.py:91-93
STORE_EXCLUDE = ("457", "453")


def build_pricesheet_long(spark: SparkSession, wide: pd.DataFrame) -> DataFrame:
    """Melt to (Store#, Item#, Vendor#=81214, Cost) (U2) with store remap /
    exclusion (P10) and zero-cost filter (P8)."""
    df = _to_spark(spark, wide)
    item_col = next(c for c in df.columns if G._norm_name(c) == "item")
    long = O.melt(df, [item_col], var_name="Store#", value_name="cost_raw",
                  numeric_vars_only=True)
    store = F.col("Store#")
    for src, dst in STORE_REMAP.items():
        store = F.when(F.col("Store#") == src, dst).otherwise(store)
    cost = parse_money_col(F.col("cost_raw"))
    return (
        long.filter(~F.col("Store#").isin(*STORE_EXCLUDE))
        .select(
            store.alias("Store#"),
            F.col(item_col).alias("Item#"),
            F.lit(81214).alias("Vendor#"),
            cost.alias("Cost"),
        )
        .filter(F.col("Cost").isNotNull() & (F.col("Cost") != 0))
    )


# --------------------------------------------------------------------------
# ACME / Phillips  (reference ACME/tools/acme_tool.py:6-112,
# Phillips/tools/phillips_tool.py:6-123)
# --------------------------------------------------------------------------

def clean_acme_like(raw: pd.DataFrame, leading_junk_cols: int) -> pd.DataFrame:
    """Promote row 0; drop N leading junk columns (ACME 2, Phillips 1);
    keep through 'Distro Size'."""
    wide = G.promote_header(raw, header_row=0)
    wide = wide.iloc[:, leading_junk_cols:]
    return G.slice_at_marker(wide, "Distro Size", keep="through")


def docks_from_token(pipeline: str, token: str) -> tuple[int, ...]:
    """P7: resolve the dock filter from the cleaned filename token;
    ambiguity or no match is an error (reference acme_tool.py:25-41)."""
    cfg = O.PIPELINES[pipeline]
    hits = [d for key, d in cfg.docks_by_token.items() if key in token]
    if len(hits) != 1:
        raise ValueError(
            f"{pipeline}: filename token {token!r} matches {len(hits)} dock sets"
        )
    return hits[0]


def build_acme_like(
    spark: SparkSession,
    wide: pd.DataFrame,
    pipeline: str,
    file_token: str,
    base_date: str,
) -> DataFrame:
    """Dock predicate (P7) → ≠0 distro (P8) → constants + branch fix →
    canonical. Phillips keeps dock as Warehouse and appends XdockCode."""
    cfg = O.PIPELINES[pipeline]
    docks = docks_from_token(pipeline, file_token)
    df = _to_spark(spark, wide)
    # NB: the reference's zero filter is pandas ``ne(0)`` on a coerced
    # numeric — NaN compares True, so non-numeric Distro cells are KEPT
    # (acme_tool.py:53-55); only literal zeros drop.
    df = df.filter(
        F.col("dock").try_cast("int").isin(*[int(d) for d in docks])
    ).filter(
        ~F.coalesce(F.col("Distro Size").try_cast("double") == 0, F.lit(False))
    )
    if cfg.warehouse_from_dock:
        df = df.withColumn("Warehouse", F.col("dock")).withColumn(
            "XdockCode", F.lit(None).cast("double")
        )
    out = O.to_canonical(df, cfg, edd=default_edd(F.lit(base_date).cast("date")))
    return out


# --------------------------------------------------------------------------
# SouthernCross  (reference SouthernCross/tools/southern_cross_tool.py:9-233)
# --------------------------------------------------------------------------

def _coerce_cell(v: object) -> object:
    """The reference's per-cell coercion (southern_cross_tool.py:42-73):
    blanks/NA-words → 0; trailing '.0'/'.00' stripped; numeric → int if
    integral else float; non-numeric text kept as the stripped string
    (commas NOT treated as thousands separators)."""
    import re as _re

    s = str(v).strip() if v is not None else ""
    if s == "" or s.lower() in ("nan", "na", "none"):
        return 0
    s2 = _re.sub(r"(?:\.0{1,2})$", "", s)
    try:
        f = float(s2)
        return int(f) if f.is_integer() else f
    except ValueError:
        return s2


def clean_southern_cross(raw: pd.DataFrame) -> pd.DataFrame:
    """Promote row 0; drop LOT # and right (P3); drop Description; coerce
    the cell matrix; drop Item==0 rows; alphabetical ci column order with
    Item pinned left (P13)."""
    wide = G.promote_header(raw, header_row=0)
    wide = G.slice_at_marker(wide, "LOT #", keep="left")
    wide = G.drop_columns_ci(wide, ["Description"])
    wide = wide.map(_coerce_cell) if hasattr(wide, "map") else wide.applymap(_coerce_cell)
    item = wide.columns[G.find_column(wide, "Item")]
    wide = wide[wide[item].map(lambda v: v != 0)].reset_index(drop=True)
    rest = sorted([c for c in wide.columns if c != item], key=lambda c: str(c).lower())
    return wide[[item] + rest]


def build_southern_cross(
    spark: SparkSession, wide: pd.DataFrame, base_date: str
) -> DataFrame:
    df = _to_spark(spark, wide)
    item_col = next(c for c in df.columns if G._norm_name(c) == "item")
    long = O.melt(df, [item_col], var_name="Branch", value_name="qty",
                  numeric_vars_only=True).withColumnRenamed(item_col, "Item")
    agg = O.sum_by(long, ["Branch", "Item"], "qty", out="Distro Size")
    agg = agg.withColumn("Distro Size", F.col("Distro Size").cast("long"))
    return O.to_canonical(
        agg,
        O.PIPELINES["southern_cross"],
        edd=default_edd(F.lit(base_date).cast("date")),
    )


# --------------------------------------------------------------------------
# Flips big + baby  (reference Flips/tools/big_flip_tool.py:55-297,
# baby_flip_tool.py:7-338)
# --------------------------------------------------------------------------

def split_big_and_baby(raw: pd.DataFrame) -> tuple[pd.DataFrame, pd.DataFrame]:
    """P11: big region = rows above the first 'Total Weight' in col 3;
    baby region = rows from the SECOND 'Item' in col 0."""
    big, _ = G.split_at_sentinel(raw, col=3, sentinel="Total Weight", occurrence=1)
    matches = [
        i for i, v in enumerate(raw.iloc[:, 0]) if G._norm_name(v) == "item"
    ]
    baby = (
        raw.iloc[matches[1]:].reset_index(drop=True)
        if len(matches) >= 2
        else raw.iloc[0:0]
    )
    return big, baby


def build_flips_store_block(big: pd.DataFrame, header_row: int = 4) -> dict[str, dict[str, str]]:
    """P12: the per-store Fob/Xdock block right of column E, stopping at
    Lot #/Total; rows labeled Fob and Xdock (reference :84-129)."""
    block = G.extract_block(
        big, row_range=(0, header_row + 1), col_start=4,
        stop_markers=["Lot #", "Total"], marker_row=header_row,
    )
    stores = [G._clean_header(v) for v in block.iloc[header_row]]
    fob = {s: str(block.iat[1, j]) for j, s in enumerate(stores) if s}
    xdock = {s: str(block.iat[3, j]) for j, s in enumerate(stores) if s}
    return {"fob": fob, "xdock": xdock}


def clean_big_flip(big: pd.DataFrame) -> pd.DataFrame:
    """Reference-faithful clean (big_flip_tool.py:132-177): drop rows 0-3
    and positional columns 1-3, promote the next row, drop empty-header
    columns and empty-item rows, then the 3-way right trim as an
    *elif chain* — strictly left of 'PO #', else through 'Lot #'
    inclusive, else through 'Total' inclusive (P1/P3/P5/P9)."""
    df = big.iloc[4:].reset_index(drop=True)
    keep = [0] + list(range(4, df.shape[1]))
    df = df.iloc[:, [p for p in keep if p < df.shape[1]]]
    wide = G.promote_header(df, header_row=0)
    wide = G.drop_bad_header_columns(wide)
    if wide.shape[1]:
        first = wide.columns[0]
        wide = wide[
            wide[first].map(lambda v: str(v).strip() not in ("", "nan", "None"))
        ].reset_index(drop=True)
    if G.find_column(wide, "PO #") is not None:
        wide = G.slice_at_marker(wide, "PO #", keep="left")
    elif G.find_column(wide, "Lot #") is not None:
        wide = G.slice_at_marker(wide, "Lot #", keep="through")
    elif G.find_column(wide, "Total") is not None:
        wide = G.slice_at_marker(wide, "Total", keep="through")
    return wide


def build_big_flip(
    spark: SparkSession,
    wide: pd.DataFrame,
    store_block: dict[str, dict[str, str]],
    base_date: str,
) -> DataFrame:
    """Melt 2-id (U3, values parsed num-anywhere) → ceil-sum (A2) → XDCK/FOB
    map-join (J3, zero→blank) → next-MWF EDD (F10) → canonical."""
    df = _to_spark(spark, wide)
    item = next(c for c in df.columns if G._norm_name(c) == "item")
    lot = next(c for c in df.columns if G._norm_name(c) == "lot")
    long = O.melt(df, [item, lot], var_name="Branch", value_name="v",
                  numeric_vars_only=True)
    agg = O.sum_by(long, ["Branch", item, lot], "v", out="Distro Size",
                   parse=True, ceil=True)
    agg = (
        agg.withColumnRenamed(item, "Item")
        .withColumnRenamed(lot, "Lot #")
    )
    agg = O.map_join(agg, store_block["xdock"], "Branch", "XDCK")
    agg = O.map_join(agg, store_block["fob"], "Branch", "FOB")
    agg = agg.withColumn("XDCK", parse_money_col("XDCK")).withColumn(
        "FOB", parse_money_col("FOB")
    )
    return O.to_canonical(
        agg, O.PIPELINES["flips_big"], edd=next_mwf(F.lit(base_date).cast("date"))
    )


def clean_baby_flip(baby: pd.DataFrame) -> pd.DataFrame:
    """Reference order (baby_flip_tool.py:7-133): header promotion →
    bad-header column drop (P5) → keep through Lot # inclusive (P3) →
    drop Wgt (P4) → THEN rename the (post-drop) 3rd column to DESC (P16).
    Junk columns in real sheets carry names, so they survive the
    bad-header drop and the desc column is 3rd at rename time."""
    wide = G.promote_header(baby, header_row=0)
    wide = G.drop_bad_header_columns(wide)
    wide = G.slice_at_marker(wide, "Lot #", keep="through")
    wide = G.drop_columns_ci(wide, ["Wgt"])
    cols = list(wide.columns)
    if len(cols) >= 3 and cols[2] != "DESC":
        wide = wide.rename(columns={cols[2]: "DESC"})
    return wide


def build_baby_flip(
    spark: SparkSession,
    wide: pd.DataFrame,
    po_df: DataFrame,
    carrier_df: DataFrame,
    invoice_date: str | None = None,
) -> DataFrame:
    """4-id positional melt (U4) → NA-normalize (P6) → per-cell-ceil 5-key
    sum (A3) → PO join (J1) + carrier join (J2) → the reference's exact
    output schema [Store, PO #, Invoice Date, DESC, Value, LOT#, weight,
    pack size, carrier code] with Store int, weight = Value×pack (long),
    Invoice Date M/d/yyyy, sorted Store then LOT#-last4 (W3)
    (reference baby_flip_tool.py:213-338). ``invoice_date`` is the
    injected clock (ISO string)."""
    from etl_jetro_spark.functions.na import normalize_na_strings

    df = normalize_na_strings(_to_spark(spark, wide))
    item = next(c for c in df.columns if G._norm_name(c) == "item")
    lot = next(c for c in df.columns if G._norm_name(c) == "lot")
    ids = [item, "DESC", "pack size", lot]
    present = [c for c in ids if c in df.columns]
    df = df.filter(
        (F.trim(F.coalesce(F.col(item), F.lit(""))) != "")
        & (F.trim(F.coalesce(F.col(lot), F.lit(""))) != "")
    )
    long = O.melt_between(
        df, present, after=("pack size" if "pack size" in df.columns else "DESC"),
        before=lot, var_name="Store", value_name="v", numeric_vars_only=True,
    )
    # baby flip ceils PER CELL before aggregating (reference
    # baby_flip_tool.py:104-107: clean ceils the between-columns to Int64,
    # the pivot then sums) — unlike big flip, which ceils the SUM (A2)
    long = long.withColumn("v", F.ceil(parse_money_col("v")).cast("long"))
    agg = O.sum_by(long, present + ["Store"], "v", out="Value", ceil=False)
    agg = agg.withColumn("Value", F.col("Value").cast("long"))
    agg = agg.withColumnRenamed(item, "Item").withColumnRenamed(lot, "LOT#")
    out = O.broadcast_lookup(agg, po_df, "Store")
    carrier = carrier_df.withColumnRenamed("carrier_code", "carrier code")
    out = O.broadcast_lookup(out, carrier, "Store")
    pack = (
        F.col("pack size").try_cast("double")
        if "pack size" in present
        else F.lit(None).cast("double")
    )
    inv = (
        EF_fmt_mdy_no_pad(F.lit(invoice_date).cast("date"))
        if invoice_date
        else F.lit(None).cast("string")
    )
    return (
        out.select(
            F.col("Store").try_cast("int").alias("Store"),
            F.col("PO #"),
            inv.alias("Invoice Date"),
            F.col("DESC"),
            F.col("Value"),
            F.col("LOT#"),
            (F.col("Value") * pack).try_cast("long").alias("weight"),
            pack.alias("pack size"),
            F.col("carrier code"),
        )
        .orderBy(F.col("Store").asc(), O.lot_last4_key("LOT#"))
    )


def build_baby_audit_manifest(
    spark: SparkSession,
    wide: pd.DataFrame,
    output: DataFrame,
    po_df: DataFrame,
    carrier_df: DataFrame,
) -> dict[str, DataFrame]:
    """K2: the six audit-workbook tables (reference
    Flips/tools/baby_flip_tool.py:384-512) as a name→DataFrame manifest for
    sinks.excel_sink.write_audit_workbook (or per-table parquet when no
    Excel engine is present).

    - 'Araho Sheet': the output with Store renamed Column (P16)
    - 'RD master' / 'RD clean': the cleaned wide input, raw and
      NA-normalized
    - 'Last Level Master': the aggregated long pivot
    - 'PO#' / 'carriers': the headerless reference lists
    """
    from etl_jetro_spark.functions.na import normalize_na_strings

    rd_master = _to_spark(spark, wide)
    return {
        "Araho Sheet": output.withColumnRenamed("Store", "Column"),
        "RD master": rd_master,
        "RD clean": normalize_na_strings(rd_master),
        "Last Level Master": output.select(
            *[
                c
                for c in output.columns
                if c not in ("PO #", "carrier code", "weight", "Invoice Date")
            ]
        ),
        "PO#": po_df,
        "carriers": carrier_df,
    }
