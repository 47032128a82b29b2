"""Exact-integer money arithmetic — the 30x-gate float-fold fix, reusable.

Defect class (found by the sf3/30x oracle gate, round 9): a raw ``double``
SUM of a money column reaches ~1e11 at 30x data, where the 4-dp round unit
sits BELOW the sum's fold-order ulp noise — Spark's partial-aggregation
tree and a sequential fold (DuckDB, or any other engine) then round the
last displayed digit apart.  The class scales with SUM MAGNITUDE: each 10x
of data converts one more decimal place of every money total from stable
to noise, so at petabyte scale only integer-unit aggregation is
deterministic.

Root fix, applied uniformly here: quantize money to an EXACT integer unit
at the ROW level (order-free), sum in decimal (HUGEINT on the oracle
side), and assemble the output double from the exact integer with ONE
identical expression per engine.  Two unit systems:

- ``cents`` / 1e-4-dollar net units for columns that are 2-dp-exact by
  construction (``l_extendedprice``; ``l_discount`` is 2-dp-exact too, so
  ``price * (1 - disc)`` is exact in 1e-4 dollars);
- micro-dollars for columns that are NOT 2-dp-exact (``o_totalprice`` is
  a sum of per-line doubles in the generator) — ``round(x * 1e6)`` is
  order-free per row and loses nothing visible at 4-dp output.

Every Spark helper has an ``sql_*`` twin producing the byte-equivalent
DuckDB fragment so a query and its oracle share one definition.  The
pairings are gate-verified by the seven round-9 fixed queries
(q1/q163/q174/q201/q232/q245/q252) at sf0.01, sf0.1 and sf3.

``tools/moneylint.py`` enforces the discipline: any ``F.sum`` over a raw
money column in ``plans/queries.py`` must route through these helpers (or
carry an explicit pragma naming why the raw-double sum is safe).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MICRO = 1_000_000

__all__ = [
    "MICRO",
    "micro_units",
    "cents",
    "disc100",
    "net_units4",
    "sum_micro",
    "sum_net4",
    "exact_money_sum",
    "exact_net_sum",
    "sql_micro_units",
    "sql_cents",
    "sql_disc100",
    "sql_net_units4",
    "sql_sum_micro",
    "sql_sum_net4",
    "sql_exact_money_sum",
    "sql_exact_net_sum",
]


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


# -- row-level quantization (order-free, exact) ----------------------------


def micro_units(c: Column | str) -> Column:
    """Micro-dollar integer units for money columns that are not 2-dp-exact
    (o_totalprice).  decimal(20,0) so the downstream SUM stays exact."""
    return F.round(_col(c) * MICRO).cast("decimal(20,0)")


def cents(c: Column | str) -> Column:
    """Exact cents for 2-dp-exact money columns (l_extendedprice): the
    decimal(18,2) cast reads the printed value, *100 is then exact."""
    return (_col(c).cast("decimal(18,2)") * 100).cast("long")


def disc100(c: Column | str) -> Column:
    """A 2-dp-exact fraction (l_discount, l_tax) as an exact 0..100 int."""
    return F.round(_col(c) * 100).cast("long")


def net_units4(price: Column | str, disc: Column | str) -> Column:
    """price*(1-disc) in EXACT 1e-4-dollar units: cents x (100 - disc100)."""
    return cents(price).cast("decimal(20,0)") * (100 - disc100(disc))


# -- exact integer sums -----------------------------------------------------


def sum_micro(c: Column | str) -> Column:
    """SUM of micro-dollar units as an exact decimal integer."""
    return F.sum(micro_units(c))


def sum_net4(price: Column | str, disc: Column | str) -> Column:
    """SUM of net 1e-4-dollar units as an exact decimal integer."""
    return F.sum(net_units4(price, disc))


# -- assembled doubles (the common output shape) ----------------------------


def exact_money_sum(c: Column | str, dp: int = 4) -> Column:
    """round(sum(money), dp) with the sum running in exact micro-dollars."""
    return F.round(sum_micro(c).cast("double") / MICRO, dp)


def exact_net_sum(price: Column | str, disc: Column | str, dp: int = 4) -> Column:
    """round(sum(price*(1-disc)), dp) with the sum exact in 1e-4 dollars."""
    return F.round(sum_net4(price, disc).cast("double") / 10000, dp)


# -- DuckDB oracle twins (byte-equivalent arithmetic) ------------------------


def sql_micro_units(expr: str) -> str:
    return f"CAST(round(({expr}) * 1000000) AS BIGINT)"


def sql_cents(expr: str) -> str:
    return f"CAST(CAST(({expr}) AS DECIMAL(18,2)) * 100 AS BIGINT)"


def sql_disc100(expr: str) -> str:
    return f"CAST(round(({expr}) * 100) AS BIGINT)"


def sql_net_units4(price: str, disc: str) -> str:
    return f"CAST({sql_cents(price)} AS HUGEINT) * (100 - {sql_disc100(disc)})"


def sql_sum_micro(expr: str) -> str:
    return f"CAST(sum({sql_micro_units(expr)}) AS HUGEINT)"


def sql_sum_net4(price: str, disc: str) -> str:
    return f"CAST(sum({sql_net_units4(price, disc)}) AS HUGEINT)"


def sql_exact_money_sum(expr: str, dp: int = 4) -> str:
    return f"round(CAST({sql_sum_micro(expr)} AS DOUBLE) / 1000000, {dp})"


def sql_exact_net_sum(price: str, disc: str, dp: int = 4) -> str:
    return f"round(CAST({sql_sum_net4(price, disc)} AS DOUBLE) / 10000, {dp})"
