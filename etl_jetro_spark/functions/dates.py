"""Date scalar functions (SURVEY §2.8 F9–F12) as native Column exprs.

The reference stamps ``date.today()`` in ≥8 places; here every function takes
an explicit base-date Column so pipelines are deterministic and testable
(inject the clock — SURVEY §7 hard-part 4).

Reference behaviors (cites into /root/reference/):
- F9  default EDD = today+2, weekend rolls to Monday, ``m/d/YYYY`` no leading
  zeros: 247/tools/allocation_tool.py:115-121
- F10 next Mon/Wed/Fri shipping day, Chicago clock:
  Flips/tools/big_flip_tool.py:247-259
- F11 tolerant reformat ``%m/%d/%Y``→``%m/%d/%y`` (fallback: input unchanged):
  247/tools/allocation_tool.py:220-228
- F12 weekday worksheet prefix Mon/Tues/Wed/Thurs/Fri: sheet_bot/utils.py:25-35
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


def default_edd(base: str | Column) -> Column:
    """base+2 days; if that lands Sat/Sun, roll forward to Monday.

    Spark ``dayofweek``: 1=Sun..7=Sat.
    """
    d = F.date_add(_c(base).cast("date"), 2)
    dow = F.dayofweek(d)
    return (
        F.when(dow == 7, F.date_add(d, 2))   # Sat -> Mon
        .when(dow == 1, F.date_add(d, 1))    # Sun -> Mon
        .otherwise(d)
    )


def next_mwf(base: str | Column) -> Column:
    """Next strictly-later Mon/Wed/Fri after ``base``.

    Mon(2)->Wed(+2), Tue(3)->Wed(+1), Wed(4)->Fri(+2), Thu(5)->Fri(+1),
    Fri(6)->Mon(+3), Sat(7)->Mon(+2), Sun(1)->Mon(+1).
    """
    d = _c(base).cast("date")
    dow = F.dayofweek(d)
    delta = (
        F.when(dow == 2, 2)
        .when(dow == 3, 1)
        .when(dow == 4, 2)
        .when(dow == 5, 1)
        .when(dow == 6, 3)
        .when(dow == 7, 2)
        .otherwise(1)
    )
    return F.date_add(d, delta)


def fmt_mdy_no_pad(col: str | Column) -> Column:
    """``m/d/yyyy`` with no leading zeros (reference EDD display format)."""
    return F.date_format(_c(col).cast("date"), "M/d/yyyy")


def fmt_mdy2(col: str | Column) -> Column:
    """``MM/dd/yy`` (macro-sink date format)."""
    return F.date_format(_c(col).cast("date"), "MM/dd/yy")


def reformat_date_tolerant(col: str | Column) -> Column:
    """Parse ``M/d/yyyy`` (or ISO) and re-emit ``MM/dd/yy``; unparseable
    values pass through unchanged (reference fallback behavior)."""
    s = _c(col).cast("string")
    parsed = F.coalesce(
        F.try_to_timestamp(s, F.lit("M/d/yyyy")),
        F.try_to_timestamp(s, F.lit("M-d-yy")),
        F.try_to_timestamp(s, F.lit("yyyy-MM-dd")),
    )
    return F.when(parsed.isNotNull(), F.date_format(parsed, "MM/dd/yy")).otherwise(s)


# Weekday → worksheet-tab prefix table (sheet_bot/utils.py:29-35).
WEEKDAY_PREFIX = {"Mon": "Mon", "Tue": "Tues", "Wed": "Wed", "Thu": "Thurs", "Fri": "Fri"}


def weekday_prefix(col: str | Column) -> Column:
    """Mon/Tues/Wed/Thurs/Fri prefix for picking the day's worksheet tab."""
    abbrev = F.date_format(_c(col).cast("date"), "E")
    out = None
    for k, v in WEEKDAY_PREFIX.items():
        cond = abbrev == k
        out = F.when(cond, v) if out is None else out.when(cond, v)
    return out.otherwise(None)


def epoch_seconds_ntz(col: str | Column) -> Column:
    """Epoch seconds (BIGINT, floor) of a timestamp WITHOUT timezone,
    treating the wall clock as UTC — engine-portable: matches DuckDB's
    ``floor(epoch(ts))`` on naive timestamps regardless of the Spark
    session timezone (which is pinned to the reference's business tz,
    see session.SESSION_TZ). A plain ``cast("long")`` is rejected for
    TIMESTAMP_NTZ and ``unix_timestamp`` would re-interpret the wall
    clock in the session zone; ``unix_date`` + wall-clock fields are
    tz-free by construction.
    """
    c = _c(col)
    return (
        F.unix_date(c.cast("date")).cast("long") * 86400
        + F.hour(c) * 3600
        + F.minute(c) * 60
        + F.second(c)
    ).cast("long")
