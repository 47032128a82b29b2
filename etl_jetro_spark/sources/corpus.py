"""Document-corpus ingestion and layout — the entry/exit of an LLM data
pipeline (beyond the reference surface, which is spreadsheet-centric).

Ingest: JSONL (one JSON document per line) is the lingua franca of corpus
distribution. The reader enforces an explicit schema (schema inference
would scan the corpus twice and silently widen types), normalizes the
standard column names, and can mint DETERMINISTIC document ids from the
content fingerprint — never ``monotonically_increasing_id`` (partition-
layout-dependent: re-running on a different split count renumbers every
doc and breaks joins/dedup against previous runs).

Layout: the writer lays the corpus out hive-partitioned (lang/source) so
downstream per-language jobs prune partitions at the scan, with a bounded
file count per partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_jetro_spark.functions.hashing import doc_fingerprint

CORPUS_SCHEMA = "text string, lang string, source string"


def read_jsonl_corpus(
    spark: SparkSession,
    path: str,
    schema: str = CORPUS_SCHEMA,
    id_col: str | None = None,
) -> DataFrame:
    """Read a JSONL document corpus with an enforced schema.

    If ``id_col`` names a column present in the files, it is kept as the
    document id; otherwise a deterministic ``doc_id`` is minted as the
    first 16 hex digits of the content fingerprint (stable across runs,
    partitionings, and engines; exact dups collide by design — they are
    the same document to every dedup operator downstream).

    Corrupt lines land in ``_corrupt_record`` (PERMISSIVE mode) and are
    split out, not dropped silently: the reader returns only clean rows,
    and ``corrupt_jsonl_lines`` exposes the rejects for a quarantine sink.
    """
    full_schema = schema + ", _corrupt_record string"
    if id_col:
        full_schema = f"{id_col} long, " + full_schema
    raw = (
        spark.read.schema(full_schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )
    clean = raw.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    if not id_col:
        clean = clean.select(
            F.conv(F.substring(doc_fingerprint("text"), 1, 15), 16, 10)
            .cast("long")
            .alias("doc_id"),
            "*",
        )
    return clean


def corrupt_jsonl_lines(
    spark: SparkSession, path: str, schema: str = CORPUS_SCHEMA
) -> DataFrame:
    """The quarantine view: raw lines that failed to parse. Reads the files
    as text and re-attempts the parse with ``from_json`` (Spark disallows a
    JSON scan that references only the corrupt-record column)."""
    raw = spark.read.text(path)
    parsed = F.from_json(
        F.col("value"),
        schema + ", _corrupt_record string",
        {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt_record"},
    )
    return raw.filter(
        parsed["_corrupt_record"].isNotNull() & (F.trim(F.col("value")) != "")
    ).select(F.col("value").alias("_corrupt_record"))


def write_partitioned_corpus(
    df: DataFrame,
    path: str,
    partition_cols: tuple[str, ...] = ("lang",),
    files_per_partition: int = 4,
) -> None:
    """Write the corpus hive-partitioned for downstream partition pruning.

    ``repartition(partition_cols)`` routes each output partition's rows to
    ``files_per_partition`` tasks (hash on the partition key + a bounded
    salt) so a 1000-executor write neither creates one giant file per
    partition nor explodes into executors×partitions tiny files."""
    salt = (F.crc32(F.col(df.columns[0]).cast("string")) % files_per_partition).alias(
        "_fsalt"
    )
    (
        df.withColumn("_fsalt", salt)
        .repartition(*[F.col(c) for c in partition_cols], F.col("_fsalt"))
        .drop("_fsalt")
        .write.mode("overwrite")
        .partitionBy(*partition_cols)
        .parquet(path)
    )
