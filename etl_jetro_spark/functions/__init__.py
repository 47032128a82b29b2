"""Engine scalar-function library (SURVEY §2.8) — pure Column expressions.

``register_sql_functions(spark)`` additionally exposes the core set to SQL
(``SELECT item7(col) ...``) so spark.sql users get the same surface.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from etl_jetro_spark.functions.dates import (  # noqa: F401
    default_edd,
    epoch_seconds_ntz,
    fmt_mdy2,
    fmt_mdy_no_pad,
    next_mwf,
    reformat_date_tolerant,
    weekday_prefix,
)
from etl_jetro_spark.functions.hashing import (  # noqa: F401
    char_shingles,
    doc_fingerprint,
    hamming_distance_bits,
    lsh_band_keys,
    minhash_signature,
    norm_text,
    simhash_bits,
    word_shingles,
    word_shingles_normed,
)
from etl_jetro_spark.functions.money import (  # noqa: F401
    MICRO,
    cents,
    disc100,
    exact_money_sum,
    exact_net_sum,
    micro_units,
    net_units4,
    sql_cents,
    sql_disc100,
    sql_exact_money_sum,
    sql_exact_net_sum,
    sql_micro_units,
    sql_net_units4,
    sql_sum_micro,
    sql_sum_net4,
    sum_micro,
    sum_net4,
)
from etl_jetro_spark.functions.na import (  # noqa: F401
    NA_STRINGS,
    is_na_like,
    normalize_na,
    normalize_na_strings,
)
from etl_jetro_spark.functions.text import (  # noqa: F401
    DASH_CLASS,
    EMAIL_RE,
    extract_emails,
    extract_store_from_pdf_name,
    first_int,
    is_valid_email,
    item7,
    leading_num,
    money2dp,
    norm_key,
    norm_ws,
    num_anywhere,
    parse_money,
    split_first_dash,
    strip_dot_zero,
    strip_hidden,
)

# Declarative SQL UDFs (Spark ≥3.5 `CREATE TEMPORARY FUNCTION ... RETURN expr`)
# — these compile to Catalyst expressions, NOT Python UDFs, so spark.sql users
# get the same zero-overhead surface as the Column builders above.
_SQL_FUNC_DEFS = {
    "strip_dot_zero": (
        "(s STRING) RETURNS STRING RETURN regexp_replace(s, '\\\\.0{1,2}$', '')"
    ),
    "item7": (
        "(s STRING) RETURNS STRING RETURN "
        "CASE WHEN regexp_replace(regexp_replace(s, '\\\\.0{1,2}$', ''), '\\\\D', '') = '' "
        "THEN NULL ELSE lpad(regexp_replace(regexp_replace(s, '\\\\.0{1,2}$', ''), '\\\\D', ''), 7, '0') END"
    ),
    "first_int": (
        "(s STRING) RETURNS BIGINT RETURN "
        "try_cast(nullif(regexp_extract(s, '(\\\\d+)', 1), '') AS BIGINT)"
    ),
    "normalize_na": (
        "(s STRING) RETURNS STRING RETURN "
        "CASE WHEN lower(trim(s)) IN ('', 'na', 'n/a', 'nan', 'none', 'null', 'nah') "
        "THEN NULL ELSE s END"
    ),
    "norm_ws": (
        "(s STRING) RETURNS STRING RETURN trim(regexp_replace(s, '\\\\s+', ' '))"
    ),
    "norm_key": (
        "(s STRING) RETURNS STRING RETURN "
        "regexp_replace(lower(trim(regexp_replace(s, '\\\\s+', ' '))), '[#\\\\s]', '')"
    ),
}


def register_sql_functions(spark: SparkSession) -> None:
    """Expose the core scalar set to spark.sql() as expression-based SQL UDFs."""
    for name, defn in _SQL_FUNC_DEFS.items():
        spark.sql(f"CREATE OR REPLACE TEMPORARY FUNCTION {name}{defn}")
