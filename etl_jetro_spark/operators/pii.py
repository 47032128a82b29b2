"""PII detection and redaction for training-data pipelines.

Regex-based detectors for the PII classes every corpus scrub handles first:
email addresses, phone numbers, IPv4 addresses, and SSN-like ids. All
patterns stay inside the RE2 ∩ Java-regex common subset (no lookarounds, no
backreferences, explicit character classes) so the DuckDB oracle runs the
*same* pattern strings — the parity gate checks the patterns themselves,
not a reimplementation.

Everything is expression-only (`regexp_extract_all` / `regexp_replace` in
whole-stage codegen): a 100 TB scrub runs at parquet-scan speed with zero
shuffles, and redaction composes with chunking/dedup in one stage.

Redaction order matters (an SSN-shaped span can embed in a longer phone
match): patterns apply in a fixed order, most-specific first — the same
order the counts use, and the oracle mirrors it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


# Ordered: EMAIL before PHONE (emails may contain digit runs), IP before
# PHONE (dotted quads would otherwise half-match phone fragments), SSN last
# of the digit shapes. Each pattern is valid and identical in Java regex and
# RE2 (DuckDB).
#
# Phone shape: optional +CC, then 3-3-4 with '-'/'.' group separators or a
# parenthesized area code. The country code is OPTIONAL (local formats like
# 555-123-4567 are the common case), and bare spaces are NOT accepted as
# group separators — '1 999 2000 2001' is a list of years, not a phone.
# SSN (3-2-4) stays disjoint from phone (3-3-4) by group widths.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"),
    (
        "phone",
        r"(\+[0-9]{1,2}[-. ])?(\([0-9]{3}\) ?|\b[0-9]{3}[-.])[0-9]{3}[-.][0-9]{4}\b",
    ),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b"),
)


def pii_counts(col: str | Column) -> dict[str, Column]:
    """Per-class match counts as named Columns (attach with withColumns)."""
    return {
        f"n_{name}": F.size(F.regexp_extract_all(_c(col), F.lit(f"({pat})"), 1))
        for name, pat in PII_PATTERNS
    }


def redact_pii(col: str | Column) -> Column:
    """Replace every PII span with its class placeholder ``[CLASS]``,
    applying the patterns in the canonical order."""
    out = _c(col)
    for name, pat in PII_PATTERNS:
        out = F.regexp_replace(out, pat, f"[{name.upper()}]")
    return out


def pii_scan(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, n_email, n_ipv4, n_phone, n_ssn, redacted) — the standard scrub
    projection: count every class, then redact in canonical order."""
    return df.select(
        _c(id_col).alias(id_col),
        *[expr.alias(name) for name, expr in pii_counts(text_col).items()],
        redact_pii(text_col).alias("redacted"),
    )
