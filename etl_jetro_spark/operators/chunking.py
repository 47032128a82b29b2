"""Document chunking and sequence packing for LLM training pipelines.

Long documents must be cut into context-window-sized chunks (with overlap so
no span is ever split across a boundary without context), and short chunks
are then *packed* into fixed token budgets to avoid wasting sequence slots.
Both are pure-relational here:

- ``chunk_tokens`` is expression-only per row (split → sequence of starts →
  slice → explode): no shuffle at all, scales at parquet-scan speed on any
  corpus size.
- ``pack_offsets`` is the offset-based packing used by concat-and-chunk
  training pipelines: lay all chunks of a shard end-to-end and assign each
  chunk to the budget-sized bin its first token falls in. Packing is
  inherently per-shard (a global order would serialize the cluster), so the
  window partitions by a shard column — at 100 TB each shard's cumsum runs
  independently, one shuffle on the shard key.

Reference has no chunking (its sheets are small); this is part of the
training-data surface the engine adds beyond the reference.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from etl_jetro_spark.functions.hashing import norm_text


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


def chunk_tokens(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_size: int = 50,
    stride: int | None = None,
    normalize: bool = True,
) -> DataFrame:
    """Split each document into token-window chunks of ``chunk_size`` tokens
    taken every ``stride`` tokens (stride < chunk_size ⇒ overlap). The last
    chunk may be shorter; empty docs yield no chunks.

    Returns (id, chunk_id, chunk_text, n_tokens). Expression-only until the
    explode — no shuffle, no UDF; a 100 TB corpus chunks at scan speed.
    """
    if stride is None:
        stride = chunk_size
    if chunk_size <= 0 or stride <= 0:
        raise ValueError("chunk_size and stride must be positive")
    toks = F.split(norm_text(text_col) if normalize else F.trim(_c(text_col)), " ")
    toks = F.filter(toks, lambda w: w != "")
    # every later expression references the BOUND COLUMN _toks, never the
    # python expression tree (reusing `toks` inlined the norm+split+filter
    # work at 8 sites = 16 regexp_replace nodes in the plan, re-run per
    # exploded chunk — the q117 lesson). A select boundary alone is NOT
    # enough here: the column feeds consumers on both sides of the
    # Generate and CollapseProject re-inlines it into each, so the barrier
    # is physical — localCheckpoint materializes (doc, tokens) once,
    # partition-local, zero shuffle (measured 26 s -> 3.4 s at 50 k docs).
    base = df.select(*df.columns, toks.alias("_toks")).localCheckpoint(
        eager=False
    )
    n = F.size(F.col("_toks"))
    # chunk start offsets 0, stride, 2*stride, ... < n  (sequence is
    # inclusive and yields a DESCENDING range when stop < start, so guard
    # the empty-document case explicitly).
    starts = F.when(n <= 0, F.expr("CAST(array() AS array<int>)")).otherwise(
        F.sequence(F.lit(0), n - 1, F.lit(stride))
    )
    base = base.withColumn("_starts", starts)
    out = (
        base.select(
            _c(id_col).alias(id_col),
            F.col("_toks"),
            F.posexplode(F.col("_starts")).alias("chunk_id", "_start"),
        )
        .select(
            id_col,
            "chunk_id",
            F.array_join(
                F.slice(F.col("_toks"), F.col("_start") + 1, chunk_size), " "
            ).alias("chunk_text"),
            F.least(
                F.lit(chunk_size), F.size(F.col("_toks")) - F.col("_start")
            ).cast("int").alias("n_tokens"),
        )
    )
    return out


def pack_offsets(
    chunks: DataFrame,
    shard_col: str,
    order_cols: list[str],
    ntokens_col: str = "n_tokens",
    budget: int = 2048,
    out: str = "pack_id",
) -> DataFrame:
    """Assign each chunk to a fixed-token-budget pack: concatenate the
    shard's chunks in ``order_cols`` order and give each chunk the bin index
    ``floor(start_offset / budget)`` of its first token. Deterministic,
    integer-only, one window per shard (cumulative sum) — the shard column
    bounds state so no single task ever sees the whole corpus.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    w = (
        Window.partitionBy(shard_col)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offset = (F.sum(_c(ntokens_col)).over(w) - _c(ntokens_col)).cast("long")
    # exact integer division (DIV) — double division + cast truncates, loses
    # exactness past 2^53 and can round x.99999999999999 up before the cast
    return chunks.withColumn("_pack_off", offset).withColumn(
        out, F.expr(f"_pack_off DIV {int(budget)}")
    ).drop("_pack_off")
