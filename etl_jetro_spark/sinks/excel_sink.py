"""Canonical order-sheet sinks (SURVEY §2.9 K1/K2).

K1 writes the canonical 13-col table to an Excel workbook with sheets
``Scripting`` + empty ``ANOMALY``/``STORE CLUSTER`` and an m/d/yyyy date
format (reference 247/tools/allocation_tool.py:168-207, dup ×5); K2 is the
6-sheet audit workbook (baby_flip_tool.py:384-512).

The workbook itself is rendered with the engine's native OOXML writer
(``sources/xlsx.py`` — no optional dependencies), so K1/K2 run for real.
The engine-native sink is Parquet (scales; the Excel file is a
*presentation* of the small final table, rendered from its head):
``write_canonical`` writes both.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

from etl_jetro_spark.sources.xlsx import write_xlsx

AUX_SHEETS = ("ANOMALY", "STORE CLUSTER")


def canonical_ordered(df: DataFrame) -> DataFrame:
    return df.orderBy("Branch", "Item", "Distro Size")


def _df_rows(df: DataFrame) -> list[list[object]]:
    """Header + data rows for the workbook render: dates formatted
    m/d/yyyy (the reference's K1 cell format), NaN→blank."""
    import datetime

    out = [list(df.columns)]
    for r in df.collect():
        row = []
        for v in r:
            if isinstance(v, (datetime.date, datetime.datetime)):
                row.append(f"{v.month}/{v.day}/{v.year}")
            else:
                row.append(v)
        out.append(row)
    return out


def write_canonical(df: DataFrame, out_dir: str, name: str = "order_sheet") -> dict:
    """K1: Parquet + the reference's workbook — sheet ``Scripting`` plus
    empty ``ANOMALY``/``STORE CLUSTER`` (247/tools/allocation_tool.py:168-207).

    Returns a manifest {parquet: path, xlsx: path, rows: n}. The ordered
    result executes twice (parquet write + one collect for the render);
    the row count is derived from the collected rows, not a third job.
    """
    ordered = canonical_ordered(df)
    pq_path = os.path.join(out_dir, f"{name}.parquet")
    ordered.write.mode("overwrite").parquet(pq_path)
    xlsx_path = os.path.join(out_dir, f"{name}.xlsx")
    scripting = _df_rows(ordered)
    sheets: dict[str, list[list[object]]] = {"Scripting": scripting}
    for s in AUX_SHEETS:
        sheets[s] = []
    write_xlsx(xlsx_path, sheets)
    return {"parquet": pq_path, "xlsx": xlsx_path, "rows": len(scripting) - 1}


def write_audit_workbook(sheets: dict[str, DataFrame], out_path: str) -> dict:
    """K2: multi-sheet audit workbook from a name→DataFrame manifest
    (baby_flip_tool.py:384-512; sheet names capped at Excel's 31 chars)."""
    write_xlsx(out_path, {name[:31]: _df_rows(df) for name, df in sheets.items()})
    return {"xlsx": out_path, "sheets": list(sheets)}
