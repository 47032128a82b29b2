"""NA-string normalization (SURVEY §2.2 P6).

The reference treats the string set {"", "na", "n/a", "nan", "none", "null",
"nah"} as missing, case-insensitively after trim
(/root/reference/Flips/tools/baby_flip_tool.py:37-41,
 /root/reference/247/tools/read_file_tool.py:175).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

NA_STRINGS = ("", "na", "n/a", "nan", "none", "null", "nah")


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


def normalize_na(col: str | Column) -> Column:
    """NULL out NA-like strings; other values pass through untouched."""
    c = _c(col)
    return F.when(F.lower(F.trim(c.cast("string"))).isin(*NA_STRINGS), None).otherwise(c)


def is_na_like(col: str | Column) -> Column:
    c = _c(col)
    return c.isNull() | F.lower(F.trim(c.cast("string"))).isin(*NA_STRINGS)


def normalize_na_strings(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Apply :func:`normalize_na` to every (or the given) string column."""
    targets = columns or [f.name for f in df.schema.fields if f.dataType.simpleString() == "string"]
    return df.withColumns({c: normalize_na(c) for c in targets})
