"""Canonical order-sheet sinks (SURVEY §2.9 K1/K2).

K1 writes the canonical 13-col table to an Excel workbook with sheets
``Scripting`` + empty ``ANOMALY``/``STORE CLUSTER`` and an m/d/yyyy date
format (reference 247/tools/allocation_tool.py:168-207, dup ×5); K2 is the
6-sheet audit workbook (baby_flip_tool.py:384-512).

openpyxl/xlsxwriter are not installed in this container, so the Excel
renderers are import-gated; the engine-native sink is Parquet (scales, and
the Excel file is a *presentation* of the small final table, rendered from
its head). ``write_canonical`` always writes Parquet; it adds the workbook
when an Excel engine is available.
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import DataFrame

try:  # pragma: no cover
    import openpyxl  # noqa: F401

    HAVE_EXCEL = True
except ImportError:
    HAVE_EXCEL = False

AUX_SHEETS = ("ANOMALY", "STORE CLUSTER")


def canonical_ordered(df: DataFrame) -> DataFrame:
    return df.orderBy("Branch", "Item", "Distro Size")


def write_canonical(df: DataFrame, out_dir: str, name: str = "order_sheet") -> dict:
    """Write the canonical table: Parquet always; .xlsx when possible.

    Returns a manifest {parquet: path, xlsx: path|None, rows: n}.
    """
    ordered = canonical_ordered(df)
    pq_path = os.path.join(out_dir, f"{name}.parquet")
    ordered.write.mode("overwrite").parquet(pq_path)
    n = ordered.count()
    xlsx_path = None
    if HAVE_EXCEL:  # pragma: no cover - excel libs absent here
        xlsx_path = os.path.join(out_dir, f"{name}.xlsx")
        pdf = ordered.toPandas()
        with pd.ExcelWriter(xlsx_path, datetime_format="m/d/yyyy") as xw:
            pdf.to_excel(xw, sheet_name="Scripting", index=False)
            for s in AUX_SHEETS:
                pd.DataFrame().to_excel(xw, sheet_name=s, index=False)
    return {"parquet": pq_path, "xlsx": xlsx_path, "rows": n}


def write_audit_workbook(
    sheets: dict[str, DataFrame], out_path: str
) -> dict:  # pragma: no cover - excel libs absent here
    """K2: multi-sheet audit workbook from a name→DataFrame manifest."""
    if not HAVE_EXCEL:
        raise NotImplementedError(
            "audit workbook needs openpyxl/xlsxwriter; write the manifest "
            "tables with write_canonical (parquet) instead"
        )
    with pd.ExcelWriter(out_path) as xw:
        for name, df in sheets.items():
            df.toPandas().to_excel(xw, sheet_name=name[:31], index=False)
    return {"xlsx": out_path, "sheets": list(sheets)}
