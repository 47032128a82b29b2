"""Change-data-capture shapes: SCD type-2 history and changelog apply.

Warehouse maintenance primitives for a 100 TB lakehouse: turning an
append-only change log into (a) a type-2 dimension history with effective
ranges, and (b) the current snapshot under upsert/delete semantics.

Both are single-shuffle window shapes on the business key. No MERGE
statement is needed: the log is reduced declaratively, which Catalyst can
pipeline with up/downstream stages (a MERGE would force a write barrier).

Scale: the windows partition by business key — per-key state is O(1)
(lag/lead cursors) or one argmax struct. Key-skew (one entity with
millions of changes) is the AQE skew-split case; the compress step's
output is bounded by the number of VALUE CHANGES, usually orders below
the log row count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_from_log(
    log: DataFrame,
    key_cols: list[str],
    attr_col: str,
    order_cols: list[str],
    eff_col: str,
) -> DataFrame:
    """Compress an attribute change log into SCD type-2 history rows.

    Consecutive rows (in ``order_cols`` order, per key) with an unchanged
    ``attr_col`` collapse into one version; each version carries
    ``eff_from`` (its first ``eff_col``), ``eff_to`` (the next version's
    ``eff_from``, null for the open version) and ``is_current``.

    Two window passes over the SAME (key, order) sort — lag to detect
    changes, lead over the compressed rows for the closing bound — so
    Catalyst reuses a single shuffle+sort.
    """
    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    changed = (
        log.withColumn("_prev", F.lag(attr_col).over(w))
        .filter(F.col("_prev").isNull() | (F.col("_prev") != F.col(attr_col)))
        .drop("_prev")
    )
    w2 = Window.partitionBy(*key_cols).orderBy(*order_cols)
    return changed.select(
        *key_cols,
        F.col(attr_col),
        F.col(eff_col).alias("eff_from"),
        F.lead(eff_col).over(w2).alias("eff_to"),
        F.lead(eff_col).over(w2).isNull().cast("int").alias("is_current"),
        # deterministic version ordinal per key: same-instant versions
        # (two changes sharing one eff value) stay totally ordered, which
        # point_in_time_join needs for an unambiguous as-of pick
        F.row_number().over(w2).alias("version_seq"),
    )


def point_in_time_join(
    facts: DataFrame,
    versions: DataFrame,
    keys: list[str],
    fact_time: str,
    version_time: str,
    version_seq: str,
    attrs: list[str],
) -> DataFrame:
    """Point-in-time (as-of validity) enrichment — the feature-store /
    warehouse temporal-correctness join: each fact row receives the
    LATEST dimension version with ``version_time`` <= ``fact_time``
    (same-instant versions resolved by ``version_seq``; facts before the
    first version get NULL attrs).

    Union-sweep shape instead of a range join: version rows and fact
    rows union into one stream, ONE shuffle+sort per key on
    (t, is_fact, seq), and ``last(attr, ignoreNulls)`` over the running
    frame assigns the in-effect version. No interval theta-join, no
    per-fact probe; sweep state is one attr row. NULL attr values inside
    a version are not representable (they read as 'no version yet') —
    encode them with a sentinel if needed.
    """
    # the output selects *facts.columns plus the attrs and `version_from`
    # under bare names — a collision would surface only later as an
    # ambiguous-column error (or worse, a silent duplicate), so fail fast
    clash = sorted((set(attrs) | {"version_from"}) & set(facts.columns))
    if clash:
        raise ValueError(
            "point_in_time_join output columns collide with fact columns: "
            f"{clash}; rename the fact column(s) or the enrichment attrs"
        )
    fcols = [c for c in facts.columns]
    f = facts.select(
        *fcols,
        F.col(fact_time).cast("long").alias("_t"),
        F.lit(1).alias("_isf"),
        F.lit(None).cast("long").alias("_seq"),
        *[F.lit(None).cast(dict(versions.dtypes)[a]).alias(f"_a_{a}") for a in attrs],
        F.lit(None).cast("long").alias("_a__vt"),
    )
    v = versions.select(
        *[F.lit(None).cast(dict(facts.dtypes).get(c, "string")).alias(c) for c in fcols if c not in keys],
        *keys,
        F.col(version_time).cast("long").alias("_t"),
        F.lit(0).alias("_isf"),
        F.col(version_seq).cast("long").alias("_seq"),
        *[F.col(a).alias(f"_a_{a}") for a in attrs],
        F.col(version_time).cast("long").alias("_a__vt"),
    ).select(*f.columns)
    u = f.unionByName(v)
    w = (
        Window.partitionBy(*keys)
        .orderBy("_t", "_isf", "_seq")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = u.select(
        *fcols,
        "_isf",
        *[
            F.last(f"_a_{a}", ignorenulls=True).over(w).alias(a)
            for a in attrs
        ],
        F.last("_a__vt", ignorenulls=True).over(w).alias("version_from"),
    )
    return filled.filter(F.col("_isf") == 1).drop("_isf")


def apply_changelog(
    changes: DataFrame,
    key_cols: list[str],
    op_col: str,
    order_cols: list[str],
    payload_cols: list[str],
    delete_op: str = "D",
    snapshot: DataFrame | None = None,
) -> DataFrame:
    """Reduce an upsert/delete changelog to the current snapshot:
    latest-wins per key (by ``order_cols``), keys whose latest op is a
    delete drop out. With a base ``snapshot``, its rows participate as
    the oldest upserts (classic compaction of snapshot + incremental).

    One shuffle: ``max_by`` argmax on a struct order key — no window
    sort, partial aggregation runs map-side.
    """
    cols = [*key_cols, op_col, *order_cols, *payload_cols]
    log = changes.select(*cols)
    if snapshot is not None:
        base = snapshot.select(
            *key_cols,
            F.lit("U").alias(op_col),
            *[F.lit(None).cast(changes.schema[c].dataType).alias(c) for c in order_cols],
            *payload_cols,
        )
        # nulls-first struct ordering makes snapshot rows the oldest
        log = base.unionByName(log)
    ordk = F.struct(*[F.col(c) for c in order_cols])
    latest = log.groupBy(*key_cols).agg(
        F.max_by(F.struct(op_col, *payload_cols), ordk).alias("_last")
    )
    return latest.filter(F.col(f"_last.{op_col}") != delete_op).select(
        *key_cols, *[F.col(f"_last.{c}").alias(c) for c in payload_cols]
    )
