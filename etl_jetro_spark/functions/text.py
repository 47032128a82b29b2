"""Text/string scalar functions (SURVEY §2.8 F1–F8) as native Column exprs.

Every helper here is a pure Catalyst expression — no Python UDFs — so the
whole family stays inside whole-stage codegen and is vectorized JVM-side.

Reference behaviors re-expressed (file:line cites into /root/reference/):
- F1 whitespace/hidden-char normalization: Flips/tools/big_flip_tool.py:10-15,
  Flips/tools/baby_flip_tool.py:357-366, sheet_bot/utils.py:37-45
- F2 trailing ``.0``/``.00`` strip: sheet_bot/utils.py:47-52,
  247/tools/pricesheet_tool.py:222-231
- F3 numeric extraction (leading/anywhere/first-int, paren & trailing-minus
  negatives): Flips/tools/big_flip_tool.py:17-51, baby_flip_tool.py:52-58
- F4 item code zfill(7): 247/tools/allocation_tool.py:209-218
- F5 money 2dp: 247/tools/pricesheet_tool.py:147-155
- F6 split on first dash (-, en, em): 247/tools/read_file_tool.py:181-186
- F7/F8 regex extraction (stores from paths, emails): sheet_bot/main.py:52-84,
  sheet_bot/import_vendor_email.py:10
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# zero-width space, BOM, non-breaking space — the reference strips these from
# headers and cells (big_flip_tool.py:12).
HIDDEN_CHARS = "​﻿\xa0"

# Unicode dash family the reference splits PO lines on (read_file_tool.py:181).
DASH_CLASS = "[-–—]"

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


# --- F1: normalization -------------------------------------------------

def strip_hidden(col: str | Column) -> Column:
    """Remove zero-width/BOM/nbsp characters."""
    return F.translate(_c(col), HIDDEN_CHARS, "")


def norm_ws(col: str | Column) -> Column:
    """Trim + collapse internal whitespace runs to single spaces."""
    return F.trim(F.regexp_replace(strip_hidden(col), r"\s+", " "))


def norm_key(col: str | Column) -> Column:
    """Lowercased, ``#``-less, space-less join/lookup key.

    The reference normalizes header and dict keys this way before matching
    (big_flip_tool.py:29-30, utils.py:37-45).
    """
    return F.regexp_replace(F.lower(norm_ws(col)), r"[#\s]", "")


# --- F2: trailing .0 strip ---------------------------------------------

def strip_dot_zero(col: str | Column) -> Column:
    """``'14.0'``→``'14'``, ``'14.00'``→``'14'``, but ``'14.50'`` unchanged."""
    return F.regexp_replace(_c(col).cast("string"), r"\.0{1,2}$", "")


# --- F3: numbers hidden in text -----------------------------------------

def parse_money(col: str | Column) -> Column:
    """Leading numeric token with ``$``/commas; ``(123.4)`` and ``123-`` are
    negative; non-numeric → NULL.  (big_flip_tool.py:17-31)"""
    s = norm_ws(col)
    is_paren_neg = s.rlike(r"^\(.*\)$")
    is_trail_neg = s.rlike(r"^[^()]*-\s*$")
    cleaned = F.regexp_replace(s, r"[$,()\s]|-$", "")
    num = F.regexp_extract(cleaned, r"^(-?\d*\.?\d+)", 1)
    val = F.nullif(num, F.lit("")).try_cast("double")
    return F.when(is_paren_neg | is_trail_neg, -F.abs(val)).otherwise(val)


def num_anywhere(col: str | Column) -> Column:
    """First numeric token appearing anywhere in the text (``'ship 12.5 lbs'``
    → 12.5); paren-wrapped → negative. (big_flip_tool.py:32-43)"""
    s = F.regexp_replace(norm_ws(col), r"[$,]", "")
    num = F.regexp_extract(s, r"(-?\d*\.?\d+)", 1)
    val = F.nullif(num, F.lit("")).try_cast("double")
    return F.when(s.rlike(r"\(\s*\d*\.?\d+\s*\)"), -F.abs(val)).otherwise(val)


def first_int(col: str | Column) -> Column:
    """First integer chunk in the text, NULL if none. (big_flip_tool.py:44-51)"""
    num = F.regexp_extract(_c(col).cast("string"), r"(\d+)", 1)
    return F.nullif(num, F.lit("")).try_cast("long")


def leading_num(col: str | Column) -> Column:
    """Leading number only — text after it ignored; no leading junk allowed."""
    s = F.regexp_replace(norm_ws(col), r"^[$]", "")
    num = F.regexp_extract(s, r"^(-?\d*\.?\d+)", 1)
    return F.nullif(num, F.lit("")).try_cast("double")


# --- F4: item code ------------------------------------------------------

def item7(col: str | Column) -> Column:
    """Digits only, zero-padded to 7 (``'12345'``→``'0012345'``); NULL/empty
    → NULL. zfill semantics: 8+ digit codes pass through unchanged (Spark's
    lpad would TRUNCATE them). (247/tools/allocation_tool.py:209-218)"""
    digits = F.regexp_replace(strip_dot_zero(col), r"\D", "")
    padded = F.when(F.length(digits) >= 7, digits).otherwise(
        F.lpad(digits, 7, "0")
    )
    return F.when(digits == "", None).otherwise(padded)


# --- F5: money formatting ----------------------------------------------

def money2dp(col: str | Column) -> Column:
    """Format as fixed 2-decimal string (Decimal semantics, no float drift)."""
    return F.format_number(_c(col).cast("decimal(18,2)"), 2)


# --- F6: split on first dash -------------------------------------------

def split_first_dash(col: str | Column) -> Column:
    """Split into [left, right] on the FIRST -, en-dash, or em-dash."""
    return F.split(_c(col), DASH_CLASS, 2)


# --- F7/F8: regex extraction -------------------------------------------

def extract_store_from_pdf_name(col: str | Column) -> Column:
    """``...-<store>-<po>.pdf`` → store. (sheet_bot/main.py:52-84)"""
    return F.regexp_extract(_c(col), r"-(\d+)-\d+\.pdf$", 1)


def extract_emails(col: str | Column) -> Column:
    """All well-formed emails in free text, case-insensitively deduped,
    first-occurrence casing kept. (sheet_bot/import_vendor_email.py:10-26)"""
    arr = F.regexp_extract_all(_c(col), F.lit("(" + EMAIL_RE + ")"), 1)
    # dedupe by lowercase while keeping first-seen original casing
    return F.aggregate(
        arr,
        F.expr("CAST(array() AS array<string>)"),
        lambda acc, x: F.when(
            F.exists(acc, lambda y: F.lower(y) == F.lower(x)), acc
        ).otherwise(F.array_append(acc, x)),
    )


def is_valid_email(col: str | Column) -> Column:
    return _c(col).rlike(r"^" + EMAIL_RE + r"$")
