"""Connected components over candidate-pair edges (dedup clustering).

A real dedup pipeline doesn't stop at pairs: near-dup pairs chain
(A~B, B~C but A≁C), so the keep/drop decision needs the CLUSTER — the
connected component — and a canonical representative per cluster. This is
the one genuinely iterative algorithm in the engine: label propagation to
the minimum reachable id, a driver-side loop over pure DataFrame steps.

Scale design: each iteration is one join + one aggregation (shuffle on
node id), converging in O(graph diameter) rounds — near-dup graphs are
shallow (dup clusters are dense, diameters of 2-4), so a handful of
rounds suffices at any corpus size. Lineage is truncated per round with
``localCheckpoint`` (an iterative loop would otherwise stack analysis
cost and replay risk). For adversarial long-chain graphs at extreme
scale, the known remedy is the large-star/small-star algorithm
(alternating grafting — same join/agg primitives, O(log n) rounds);
min-propagation is the right default for dedup-shaped graphs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 50,
) -> DataFrame:
    """(id, component) for every node in ``edges``; ``component`` is the
    minimum node id reachable from it (a canonical cluster label).

    Converges when a full round changes no label; raises if ``max_iter``
    rounds aren't enough (pathological diameter)."""
    und = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    comp = (
        und.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("comp", F.col("id"))
        .localCheckpoint(eager=False)
    )
    for _ in range(max_iter):
        nbr_min = (
            und.join(comp.withColumnRenamed("id", "b"), "b")
            .groupBy("a")
            .agg(F.min("comp").alias("nbr_comp"))
            .withColumnRenamed("a", "id")
        )
        new_comp = (
            comp.join(nbr_min, "id", "left")
            .select(
                "id",
                F.least(
                    F.col("comp"), F.coalesce("nbr_comp", F.col("comp"))
                ).alias("comp"),
            )
            .localCheckpoint(eager=False)
        )
        changed = (
            new_comp.alias("n")
            .join(comp.alias("o"), "id")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .count()
        )
        comp = new_comp
        if changed == 0:
            return comp.select("id", F.col("comp").alias("component"))
    raise RuntimeError(f"connected_components: no convergence in {max_iter} rounds")


def dedup_keep_canonical(
    df: DataFrame, pairs: DataFrame, id_col: str
) -> DataFrame:
    """Cluster the near-dup ``pairs`` and keep one row per cluster: the
    minimum id (the component label) survives; isolated rows (no pair)
    pass through untouched."""
    comp = connected_components(pairs)
    drop = comp.filter(F.col("id") != F.col("component")).select(
        F.col("id").alias(id_col)
    )
    # no broadcast hint: the drop set scales with dup volume — AQE picks
    # the strategy from runtime size
    return df.join(drop, id_col, "left_anti")
