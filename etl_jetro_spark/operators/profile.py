"""Data profiling and constraint validation.

The pre-flight checks of a 100 TB ingest: per-column statistics (nulls,
cardinality, bounds) and declarative quality rules (not-null, primary-key
uniqueness, referential integrity, range predicates) with violation
counts, each reduced to a tiny result from a bounded number of scans.

Scale shapes:
- ``profile_table`` — ONE aggregation pass. Exact multi-column distinct
  counts use Spark's Expand (one input row fans to one row per distinct
  column before partial aggregation): a single shuffle whose volume is
  ncols × (distinct partials), not ncols scans of the table. For
  trillion-row profiling swap ``approx_count_distinct`` in the same
  shape (documented tradeoff, same API).
- row-predicate rules — one conditional-sum scan for ALL rules at once.
- uniqueness — one groupBy on the key, counting excess rows.
- referential integrity — left-anti join, broadcast when the parent key
  set fits, shuffle-hash otherwise.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from etl_jetro_spark.plans.hints import bcast_small


def profile_table(
    df: DataFrame,
    numeric_cols: list[str] | None = None,
    string_cols: list[str] | None = None,
    epoch_cols: list[str] | None = None,
) -> DataFrame:
    """Long-form per-column profile: one row per column with row count,
    null count, exact distinct count, and min/max (numeric columns and
    epoch-seconds of timestamp columns in ``min_num``/``max_num``
    rounded to 4 dp; string columns in ``min_str``/``max_str``).

    Single aggregation over one scan; the long form is produced by
    exploding a literal struct array over the 1-row aggregate (no extra
    shuffle, no driver round-trip).
    """
    from etl_jetro_spark.operators.util import spread

    numeric_cols = numeric_cols or []
    string_cols = string_cols or []
    epoch_cols = epoch_cols or []
    # the Expand for multi-column exact distincts fans every input row
    # out x(ncols+1) BEFORE the partial agg — on a single-file input that
    # whole blow-up runs in one task; spread() is a no-op on real
    # multi-split inputs
    df = spread(df)

    def num(c: str) -> Column:
        if c in epoch_cols:
            from etl_jetro_spark.functions.dates import epoch_seconds_ntz

            return epoch_seconds_ntz(c).cast("double")
        return F.col(c).cast("double")

    aggs: list[Column] = [F.count(F.lit(1)).alias("_rows")]
    for c in [*numeric_cols, *epoch_cols, *string_cols]:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"_null_{c}"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"_nd_{c}"))
    for c in [*numeric_cols, *epoch_cols]:
        aggs.append(F.round(F.min(num(c)), 4).alias(f"_min_{c}"))
        aggs.append(F.round(F.max(num(c)), 4).alias(f"_max_{c}"))
    for c in string_cols:
        aggs.append(F.min(F.col(c)).alias(f"_smin_{c}"))
        aggs.append(F.max(F.col(c)).alias(f"_smax_{c}"))
    one = df.agg(*aggs)

    null_str = F.lit(None).cast("string")
    null_num = F.lit(None).cast("double")
    rows = []
    for c in [*numeric_cols, *epoch_cols, *string_cols]:
        is_num = c not in string_cols
        rows.append(
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("_rows").cast("bigint").alias("n_rows"),
                F.col(f"_null_{c}").cast("bigint").alias("n_null"),
                F.col(f"_nd_{c}").cast("bigint").alias("n_distinct"),
                (F.col(f"_min_{c}") if is_num else null_num).alias("min_num"),
                (F.col(f"_max_{c}") if is_num else null_num).alias("max_num"),
                (F.col(f"_smin_{c}") if not is_num else null_str).alias("min_str"),
                (F.col(f"_smax_{c}") if not is_num else null_str).alias("max_str"),
            )
        )
    return one.select(F.explode(F.array(*rows)).alias("_r")).select("_r.*")


@dataclass(frozen=True)
class RowRule:
    """A row-level predicate rule: ``violation`` counts rows where the
    predicate is TRUE (i.e. express the rule as its violation)."""

    name: str
    violation: Column


def check_rows(df: DataFrame, rules: list[RowRule]) -> DataFrame:
    """ALL row rules in one conditional-sum scan → (rule, violations)."""
    agg = df.agg(
        *[
            F.sum(r.violation.cast("long")).alias(f"_v{i}")
            for i, r in enumerate(rules)
        ]
    )
    rows = [
        F.struct(
            F.lit(r.name).alias("rule"),
            F.coalesce(F.col(f"_v{i}"), F.lit(0)).cast("bigint").alias("violations"),
        )
        for i, r in enumerate(rules)
    ]
    return agg.select(F.explode(F.array(*rows)).alias("_r")).select("_r.*")


def check_unique(df: DataFrame, key_cols: list[str], name: str) -> DataFrame:
    """Primary-key rule: violations = rows in excess of one per key
    (0 when the key is unique). One groupBy on the key; the sum of
    excesses collapses map-side."""
    return (
        df.groupBy(*key_cols)
        .agg((F.count(F.lit(1)) - 1).alias("_x"))
        .agg(F.coalesce(F.sum("_x"), F.lit(0)).cast("bigint").alias("violations"))
        .select(F.lit(name).alias("rule"), "violations")
    )


def check_foreign_key(
    child: DataFrame,
    child_cols: list[str],
    parent: DataFrame,
    parent_cols: list[str],
    name: str,
    broadcast_parent: bool = True,
) -> DataFrame:
    """Referential rule: violations = child rows whose non-null key has
    no parent. Left-anti join (broadcast the parent key set when it
    fits; pass ``broadcast_parent=False`` for fact⋈fact FK checks)."""
    pk = parent.select(
        *[F.col(p).alias(c) for c, p in zip(child_cols, parent_cols)]
    ).dropDuplicates()
    if broadcast_parent:
        pk = bcast_small(pk)  # bound: caller-gated via broadcast_parent flag
    nonnull = child.dropna(subset=child_cols).select(*child_cols)
    orphans = nonnull.join(pk, child_cols, "left_anti")
    return orphans.agg(
        F.count(F.lit(1)).cast("bigint").alias("violations")
    ).select(F.lit(name).alias("rule"), "violations")


def run_checks(*checks: DataFrame) -> DataFrame:
    """Union rule results into one (rule, violations) report."""
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out


def distribution_drift_tvd(
    df: DataFrame,
    group_col: str,
    value_col: str,
    split_col: str,
    bins: int = 10,
    ndp: int = 6,
) -> DataFrame:
    """Per-group distribution drift between the two time halves of a
    stream — the PSI-style data-quality monitor, scored as TOTAL
    VARIATION DISTANCE (0.5·Σ|p_i − q_i| over equi-width value bins)
    instead of PSI's log-ratio so every term is count arithmetic and
    exactly-rounded IEEE division (deterministic cross-engine; PSI's ln
    is libm-dependent). TVD ∈ [0, 1]: 0 = identical histograms, 1 =
    disjoint support.

    The split point is the midpoint of ``split_col``'s global [min, max];
    bin edges are equi-width over ``value_col``'s global [min, max] (one
    metadata-sized bounds row, broadcast). Groups present in only one
    half are dropped (their TVD is trivially 1 and their appearance /
    disappearance is a volume alarm, not a drift score). Returns
    (group, n_first, n_second, tvd) — ONE wide shuffle (group × half ×
    bin partial agg), then group-sized frames only.
    """
    v = F.col(value_col)
    t = F.col(split_col)
    bounds = df.agg(
        F.min(t).alias("_tmin"),
        F.max(t).alias("_tmax"),
        F.min(v).alias("_vmin"),
        F.max(v).alias("_vmax"),
    )
    d = df.crossJoin(bcast_small(bounds))  # bound: 1-row scalar aggregate
    # integer arithmetic, no doubles: epoch-ns split values exceed double's
    # 2^53 integer range, and a lossy cast could classify boundary rows
    # differently per engine
    half = (
        ((t - F.col("_tmin")) * 2) >= (F.col("_tmax") - F.col("_tmin"))
    ).cast("int")
    span = F.col("_vmax") - F.col("_vmin")
    bin_ = F.when(span == 0, F.lit(0)).otherwise(
        F.least(
            F.lit(bins - 1),
            F.floor((v - F.col("_vmin")) * bins / span).cast("int"),
        )
    )
    cells = (
        d.filter(v.isNotNull())
        .groupBy(
            F.col(group_col).alias("_g"), half.alias("_h"), bin_.alias("_b")
        )
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    totals = cells.groupBy("_g", "_h").agg(F.sum("_c").alias("_n"))
    # groups-sized from here on: pivot the two halves side by side per bin
    p0 = cells.filter(F.col("_h") == 0).select(
        "_g", "_b", F.col("_c").alias("_c0")
    )
    p1 = cells.filter(F.col("_h") == 1).select(
        "_g", "_b", F.col("_c").alias("_c1")
    )
    n0 = totals.filter(F.col("_h") == 0).select("_g", F.col("_n").alias("_n0"))
    n1 = totals.filter(F.col("_h") == 1).select("_g", F.col("_n").alias("_n1"))
    joined = (
        p0.join(p1, ["_g", "_b"], "full")
        .join(n0, "_g")
        .join(n1, "_g")
        .select(
            "_g",
            "_n0",
            "_n1",
            (
                F.abs(
                    F.coalesce("_c0", F.lit(0)) / F.col("_n0")
                    - F.coalesce("_c1", F.lit(0)) / F.col("_n1")
                )
            ).alias("_d"),
        )
    )
    return joined.groupBy(F.col("_g").alias(group_col)).agg(
        F.any_value("_n0").cast("long").alias("n_first"),
        F.any_value("_n1").cast("long").alias("n_second"),
        F.round(F.sum("_d") / 2, ndp).alias("tvd"),
    )
