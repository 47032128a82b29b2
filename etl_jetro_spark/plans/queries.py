"""The engine's declared query surface — driver contract (SURVEY §2 coverage).

Each entry pairs a Spark DataFrame program (built from the engine's operator
library) with an ANSI-SQL oracle that DuckDB runs on the same parquet tables.
The driver hash-compares them at sf0.01; every operator family in SURVEY §2
is represented here on the TPC-H-ish testdata tables.

Portability rules used throughout (Spark ⇄ DuckDB):
- float aggregates rounded on BOTH sides (sum order is engine-dependent);
- counts/sums of ints cast to BIGINT explicitly (DuckDB sums to HUGEINT);
- truncation via floor() (DuckDB CAST double→int rounds, Spark truncates);
- regexp_replace in DuckDB needs the 'g' flag to match Spark's
  replace-all default;
- md5() is the shared hash for all dedup/LSH parity (see functions.hashing).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_jetro_spark import functions as EF
from etl_jetro_spark import operators as O
from etl_jetro_spark.functions import money as M
from etl_jetro_spark.functions.money import (
    sql_cents,
    sql_disc100,
    sql_exact_money_sum,
    sql_exact_net_sum,
    sql_micro_units,
    sql_sum_micro,
    sql_sum_net4,
)
from etl_jetro_spark.plans.hints import bcast_sized, bcast_small

# --------------------------------------------------------------------------
# helpers
# --------------------------------------------------------------------------

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

# Small-SF fast path (driver correctness sweeps at sf0.01/sf0.001): the whole
# dataset is a few MB, so per-query cost is pure constant overhead — shuffle
# task count and repeated parquet scans. Tune the session once (8 shuffle
# partitions instead of a cluster-sized default) and memory-cache each table
# per session so 107 back-to-back queries pay the scan once. At real scale
# neither kicks in: the path is keyed on the sf dir name.
_SMALL_SF_MARKERS = ("sf0.01", "sf0.001")
_SMALL_TUNED: set[str] = set()
_TABLE_CACHE: dict[tuple[str, str, str], DataFrame] = {}

# Relation-object reuse for the NON-small path (r11): building a parquet
# DataFrame costs ~0.1 s per call (py4j roundtrips + file listing + footer
# schema read) — pure per-query constant that a 401-query sweep pays
# hundreds of times over. The cached object is an unexecuted logical plan:
# NO data is cached (every action still scans parquet — this is the same
# metadata reuse a catalog table gets), it is keyed per session, and the
# small-SF branch below keeps its own (additionally memory-cached) map.
_RELATION_CACHE: dict[tuple[str, str, str], DataFrame] = {}
_NANOS_TUNED: set[str] = set()


def _is_small_sf(sf_dir: str) -> bool:
    tail = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    return tail in _SMALL_SF_MARKERS


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if not _is_small_sf(sf_dir):
        key = (spark.sparkContext.applicationId, sf_dir, name)
        df = _RELATION_CACHE.get(key)
        if df is None:
            df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
            _RELATION_CACHE[key] = df
        return df
    app = spark.sparkContext.applicationId
    if app not in _SMALL_TUNED:
        try:  # runtime confs; harmless if the session disallows them
            spark.conf.set("spark.sql.shuffle.partitions", "8")
            # AQE materializes every shuffle stage as its own job — pure
            # fixed overhead on KB inputs (measured 2.2x per-query cost at
            # sf0.01). It stays ON for every non-small path.
            spark.conf.set("spark.sql.adaptive.enabled", "false")
        except Exception:
            pass
        _SMALL_TUNED.add(app)
    key = (app, sf_dir, name)
    df = _TABLE_CACHE.get(key)
    if df is None:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet").cache()
        _TABLE_CACHE[key] = df
    return df


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalize ``events.ts`` to the engine contract: ``ts`` = epoch
    nanoseconds (BIGINT, wall clock treated as UTC — tz-free, matching
    DuckDB's ``epoch_ns`` on naive timestamps), ``ts_utc`` = the timestamp
    column as TIMESTAMP_NTZ wall clock in BOTH branches (a tz-typed
    instant here would shift wall-clock bucketing by the session offset).
    Handles both generations of the driver's parquet: legacy
    TIMESTAMP(NANOS) (readable only ns-as-long) and the current
    ``timestamp[us]`` (arrives as TIMESTAMP_NTZ). ``timestampdiff`` on two
    NTZ operands is pure wall-clock arithmetic, immune to the session tz."""
    # conf.set is a py4j roundtrip paid on EVERY events query; set it once
    # per session (r11 — the session factory also sets it at build time)
    app = spark.sparkContext.applicationId
    if app not in _NANOS_TUNED:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        _NANOS_TUNED.add(app)
    e = load(spark, sf_dir, "events")
    if dict(e.dtypes)["ts"] == "bigint":  # pragma: no cover - legacy data
        e = e.withColumn(
            "ts_utc",
            F.expr(
                "timestampadd(MICROSECOND, ts div 1000,"
                " timestamp_ntz'1970-01-01 00:00:00')"
            ),
        )
    else:
        e = e.withColumn("ts_utc", F.col("ts")).withColumn(
            "ts",
            F.expr(
                "timestampdiff(MICROSECOND,"
                " timestamp_ntz'1970-01-01 00:00:00', ts) * 1000"
            ),
        )
    return e


# DuckDB-side normalized text (mirror of functions.hashing.norm_text)
DK_NORM = (
    "trim(regexp_replace(regexp_replace(lower({c}), '[^a-z0-9\\s]', ' ', 'g'),"
    " '\\s+', ' ', 'g'))"
)

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _SQL_PCTL(p: str, v: str = "v") -> str:
    """Exact linear-interpolation percentile as an aggregate expression
    over a ranked CTE with columns (v, rn, n) — rn = 1-based ascending
    rank, n = group count, NULLs pre-filtered.

    Mirrors operators.aggregate.exact_group_percentiles BIT-FOR-BIT:
    r = 1.0 + (n-1)*p, frac = r - floor(r), bound = vlo + frac*(vhi-vlo)
    — the SAME IEEE ops in the same order, so both engines produce the
    identical double. DuckDB's quantile_cont must NOT be used where the
    quantile feeds a comparison: it lerps as (1-f)*a + f*b, which is
    1-2 ulp off the data value EVEN WHEN a == b (e.g. 2.52 ->
    2.5200000000000005), and a strict comparison against that bound
    flips entire tie blocks — the q133 sf3 (30x oracle gate) defect."""
    r_row = f"(1.0 + CAST(n - 1 AS DOUBLE) * {p})"
    lo_rank = f"CAST(floor({r_row}) AS BIGINT)"
    r_agg = f"(1.0 + CAST(any_value(n) - 1 AS DOUBLE) * {p})"
    vlo = f"min(CASE WHEN rn = {lo_rank} THEN {v} END)"
    vhi = f"coalesce(min(CASE WHEN rn = {lo_rank} + 1 THEN {v} END), {vlo})"
    frac = f"({r_agg} - floor({r_agg}))"
    return f"({vlo} + {frac} * ({vhi} - {vlo}))"


# --------------------------------------------------------------------------
# 1. Aggregation core (A1, P8, W2) — flagship
# --------------------------------------------------------------------------

@query(
    "q1_pricing_summary",
    f"""
    WITH x AS (
      SELECT l_returnflag, l_linestatus,
             CAST(l_quantity AS BIGINT) AS qty,
             {sql_cents('l_extendedprice')} AS cents,
             {sql_disc100('l_discount')} AS d100
      FROM lineitem WHERE l_shipdate <= DATE '1998-09-02'
    ),
    g AS (
      SELECT l_returnflag, l_linestatus,
             CAST(sum(qty) AS HUGEINT)                  AS sq,
             CAST(sum(cents) AS HUGEINT)                AS sc,
             sum(CAST(cents AS HUGEINT) * (100 - d100)) AS sd,
             CAST(sum(d100) AS HUGEINT)                 AS sdisc,
             CAST(count(*) AS BIGINT)                   AS n
      FROM x GROUP BY 1, 2
    )
    SELECT l_returnflag, l_linestatus,
           round(CAST(sq AS DOUBLE), 4)                    AS sum_qty,
           round(CAST(sc AS DOUBLE) / 100, 4)              AS sum_base_price,
           round(CAST(sd AS DOUBLE) / 10000, 4)            AS sum_disc_price,
           round(CAST(sq AS DOUBLE) / n, 6)                AS avg_qty,
           round(CAST(sc AS DOUBLE) / 100 / n, 6)          AS avg_price,
           round(CAST(sdisc AS DOUBLE) / 100 / n, 6)       AS avg_disc,
           n                                               AS count_order
    FROM g
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: the reference's groupBy-sum core (A1) with partial
    aggregation pushed map-side by Catalyst; one shuffle total.

    All money aggregates run in EXACT integer units (cents; disc-price
    in cents-of-cents, since price and discount are both 2-dp-exact) and
    the output doubles are assembled from those integers with one
    identical expression per engine. The original raw-double sums held
    to 10x but flipped the last representable digit of an 8e10-magnitude
    sum at THIRTY-x (sum order differs between Spark's partial-agg tree
    and DuckDB's sequential fold) — the q195 rounding-boundary class,
    caught by the round-9 30x spot-gate."""
    li = load(spark, sf_dir, "lineitem")
    x = li.filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("date")
    ).select(
        "l_returnflag",
        "l_linestatus",
        F.col("l_quantity").cast("long").alias("qty"),
        M.cents("l_extendedprice").alias("cents"),
        M.disc100("l_discount").alias("d100"),
    )
    g = x.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("qty").cast("decimal(20,0)")).alias("sq"),
        F.sum(F.col("cents").cast("decimal(20,0)")).alias("sc"),
        F.sum(
            F.col("cents").cast("decimal(20,0)") * (100 - F.col("d100"))
        ).alias("sd"),
        F.sum(F.col("d100").cast("decimal(20,0)")).alias("sdisc"),
        F.count(F.lit(1)).alias("n"),
    )
    n = F.col("n")
    return g.select(
        "l_returnflag",
        "l_linestatus",
        F.round(F.col("sq").cast("double"), 4).alias("sum_qty"),
        F.round(F.col("sc").cast("double") / 100, 4).alias("sum_base_price"),
        F.round(F.col("sd").cast("double") / 10000, 4).alias("sum_disc_price"),
        F.round(F.col("sq").cast("double") / n, 6).alias("avg_qty"),
        F.round(F.col("sc").cast("double") / 100 / n, 6).alias("avg_price"),
        F.round(F.col("sdisc").cast("double") / 100 / n, 6).alias("avg_disc"),
        n.alias("count_order"),
    ).orderBy("l_returnflag", "l_linestatus")


# --------------------------------------------------------------------------
# 2. The 247 allocation pipeline re-expressed (A1+P8+P14+P15+W1+canonical)
# --------------------------------------------------------------------------

@query(
    "q2_allocation_canonical",
    """
    WITH fact AS (
      SELECT CAST(l_suppkey AS VARCHAR) AS branch_raw,
             l_partkey                  AS item,
             floor(l_quantity)          AS qty
      FROM lineitem
    ),
    agg AS (
      SELECT branch_raw, item, CAST(sum(qty) AS BIGINT) AS distro
      FROM fact GROUP BY branch_raw, item
      HAVING sum(qty) <> 0
    )
    SELECT CAST(CASE WHEN regexp_matches(branch_raw, '^\\d{2}$')
                     THEN '1' || branch_raw ELSE branch_raw END AS INT) AS "Branch",
           CAST(item AS BIGINT)        AS "Item",
           ''                          AS "Description",
           distro                      AS "Distro Size",
           44602                       AS "Supplier On Record",
           DATE '2026-01-05'           AS "Expected Delivery Date",
           'P20'                       AS "WW Buyer",
           ''                          AS "Warehouse",
           ''                          AS "AdditionalXDCK",
           ''                          AS "AmountCode",
           CAST(NULL AS DOUBLE)        AS "XDCK",
           ''                          AS "POSTXDCK",
           CAST(NULL AS DOUBLE)        AS "FOB"
    FROM agg
    """,
)
def q2_allocation_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's allocation pipeline on the star schema: long fact →
    group-sum (A1) → zero-filter (P8) → branch fix (P15) → constants (P14)
    → canonical 13-col select (reference 247/tools/allocation_tool.py:53-169).
    """
    li = load(spark, sf_dir, "lineitem")
    fact = li.select(
        F.col("l_suppkey").cast("string").alias("Branch"),
        F.col("l_partkey").alias("Item"),
        F.floor("l_quantity").alias("qty"),
    )
    agg = O.sum_by(fact, ["Branch", "Item"], "qty", out="Distro Size")
    agg = agg.withColumn("Distro Size", F.col("Distro Size").cast("long"))
    return O.to_canonical(
        agg, O.PIPELINES["acme"], edd=F.lit("2026-01-05").cast("date")
    )


# --------------------------------------------------------------------------
# 3. Joins (J1/J2 broadcast, D3 anti, J5 semi)
# --------------------------------------------------------------------------

@query(
    "q3_top_customers",
    f"""
    SELECT c.c_custkey, c.c_name,
           {sql_exact_money_sum('o.o_totalprice')} AS revenue,
           CAST(count(*) AS BIGINT)      AS n_orders
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 10
    """,
)
def q3_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact⋈dim broadcast join + agg + deterministic top-k (TakeOrdered —
    only k rows per partition cross the wire)."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    return (
        o.join(bcast_sized(c), o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            M.exact_money_sum("o_totalprice").alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(10)
    )


@query(
    "q4_regional_revenue",
    f"""
    SELECT r.r_name AS region,
           {sql_exact_net_sum('l.l_extendedprice', 'l.l_discount', dp=2)} AS revenue,
           CAST(count(*) AS BIGINT) AS n_lineitems
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def q4_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-table star join: dims broadcast, single fact shuffle for the
    lineitem⋈orders equi-join (AQE handles size-based strategy)."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(bcast_sized(c), o.o_custkey == c.c_custkey)
        .join(bcast_small(n), c.c_nationkey == n.n_nationkey)
        .join(bcast_small(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"))
        .agg(
            M.exact_net_sum("l_extendedprice", "l_discount", dp=2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


@query(
    "q5_customers_without_orders",
    """
    SELECT c.c_custkey, c.c_name, c.c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def q5_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D3 set-difference as a left-anti join (the reference's
    `missing = needed - got`, sheet_bot/main.py:310-312)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return O.anti_join(
        c.select("c_custkey", "c_name", "c_mktsegment"),
        o.select(F.col("o_custkey").alias("c_custkey")),
        "c_custkey",
    )


@query(
    "q6_suppliers_with_returns",
    """
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_suppkey = s.s_suppkey AND l.l_returnflag = 'R'
    )
    """,
)
def q6_suppliers_with_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 stream-static-shaped semi join (matched keys only)."""
    s = load(spark, sf_dir, "supplier")
    li = load(spark, sf_dir, "lineitem")
    return O.semi_join(
        s.select("s_suppkey", "s_name"),
        li.filter(F.col("l_returnflag") == "R").select(
            F.col("l_suppkey").alias("s_suppkey")
        ),
        "s_suppkey",
    )


# --------------------------------------------------------------------------
# 4. Unpivot (U1) and window/sort (W1/W5, A5/A6)
# --------------------------------------------------------------------------

@query(
    "q7_melt_part_metrics",
    """
    SELECT p_partkey, metric, value FROM (
      SELECT p_partkey,
             CAST(p_size AS DOUBLE)        AS size,
             CAST(p_retailprice AS DOUBLE) AS retailprice
      FROM part
    ) UNPIVOT (value FOR metric IN (size, retailprice))
    """,
)
def q7_melt_part_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 wide→long unpivot: Expand node, zero shuffle."""
    p = load(spark, sf_dir, "part")
    wide = p.select(
        "p_partkey",
        F.col("p_size").cast("double").alias("size"),
        F.col("p_retailprice").cast("double").alias("retailprice"),
    )
    out = wide.unpivot(["p_partkey"], ["size", "retailprice"], "metric", "value")
    return out


@query(
    "q8_first_order_per_customer",
    """
    SELECT o_custkey, o_orderkey AS first_orderkey, CAST(o_orderdate AS DATE) AS first_orderdate
    FROM (
      SELECT o_custkey, o_orderkey, o_orderdate,
             row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
      FROM orders
    ) WHERE rn = 1
    """,
)
def q8_first_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 first-per-group via min(struct) — one shuffle, no window sort."""
    o = load(spark, sf_dir, "orders")
    firsts = O.first_per_group(
        o,
        ["o_custkey"],
        [F.col("o_orderdate"), F.col("o_orderkey")],
        ["o_orderkey", "o_orderdate"],
    )
    return firsts.select(
        "o_custkey",
        F.col("o_orderkey").alias("first_orderkey"),
        F.col("o_orderdate").cast("date").alias("first_orderdate"),
    )


@query(
    "q9_second_order_per_customer",
    """
    SELECT o_custkey, o_orderkey AS second_orderkey
    FROM (
      SELECT o_custkey, o_orderkey,
             row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
      FROM orders
    ) WHERE rn = 2
    """,
)
def q9_second_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W5 second-occurrence rank (the reference's 2nd-'Item'-marker scan)."""
    from pyspark.sql import Window

    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 2)
        .select("o_custkey", F.col("o_orderkey").alias("second_orderkey"))
    )


@query(
    "q10_latest_event_per_user",
    """
    SELECT user_id, event_id AS last_event_id, event_type AS last_event_type
    FROM (
      SELECT user_id, event_id, event_type,
             row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def q10_latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5/T5 dedup-keep-latest via max(struct) — the streaming dedup rule
    as a batch operator."""
    e = load_events(spark, sf_dir)
    agg = e.groupBy("user_id").agg(
        F.max(F.struct("ts", "event_id", "event_type")).alias("_last")
    )
    return agg.select(
        "user_id",
        F.col("_last.event_id").alias("last_event_id"),
        F.col("_last.event_type").alias("last_event_type"),
    )


# --------------------------------------------------------------------------
# 5. Scalar-function queries (F-family parity)
# --------------------------------------------------------------------------

@query(
    "q11_item7_codes",
    """
    WITH d AS (
      SELECT p_partkey,
             regexp_replace(CAST(p_partkey AS VARCHAR), '\\D', '', 'g') AS digits
      FROM part
    )
    SELECT p_partkey,
           CASE WHEN length(digits) >= 7 THEN digits
                ELSE lpad(digits, 7, '0') END AS item7
    FROM d
    """,
)
def q11_item7_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4 item-code normalization over a key column."""
    p = load(spark, sf_dir, "part")
    return p.select("p_partkey", EF.item7(F.col("p_partkey").cast("string")).alias("item7"))


@query(
    "q12_parse_money_roundtrip",
    """
    SELECT l_orderkey, l_linenumber,
           CAST(regexp_extract(regexp_replace(printf('$%.2f', l_extendedprice), '[$,]', '', 'g'),
                               '^(-?\\d*\\.?\\d+)', 1) AS DOUBLE) AS parsed
    FROM lineitem
    """,
)
def q12_parse_money_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3/F5 round-trip: format a price as '$1234.56' text, parse it back
    with the engine's parse_money. printf semantics are engine-identical."""
    li = load(spark, sf_dir, "lineitem")
    money = F.format_string("$%.2f", F.col("l_extendedprice"))
    return li.select(
        "l_orderkey", "l_linenumber", EF.parse_money(money).alias("parsed")
    )


@query(
    "q13_branch_fix",
    """
    SELECT n_nationkey,
           CAST(CASE WHEN regexp_matches(CAST(n_nationkey AS VARCHAR), '^\\d{2}$')
                     THEN '1' || CAST(n_nationkey AS VARCHAR)
                     ELSE CAST(n_nationkey AS VARCHAR) END AS INT) AS branch_fixed
    FROM nation
    """,
)
def q13_branch_fix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P15 two-digit branch prefix rule."""
    n = load(spark, sf_dir, "nation")
    return n.select(
        "n_nationkey", O.branch_fix(F.col("n_nationkey").cast("string")).alias("branch_fixed")
    )


@query(
    "q14_shipping_dates",
    """
    SELECT o_orderkey,
           CAST(o_orderdate AS DATE) AS base,
           CASE dayofweek(CAST(o_orderdate AS DATE) + INTERVAL 2 DAY)
             WHEN 6 THEN CAST(o_orderdate AS DATE) + INTERVAL 4 DAY
             WHEN 0 THEN CAST(o_orderdate AS DATE) + INTERVAL 3 DAY
             ELSE CAST(o_orderdate AS DATE) + INTERVAL 2 DAY
           END AS edd,
           CAST(o_orderdate AS DATE) + to_days(CAST(
             CASE dayofweek(CAST(o_orderdate AS DATE))
               WHEN 1 THEN 2 WHEN 2 THEN 1 WHEN 3 THEN 2 WHEN 4 THEN 1
               WHEN 5 THEN 3 WHEN 6 THEN 2 ELSE 1
             END AS INT)) AS next_mwf
    FROM orders
    """,
)
def q14_shipping_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9/F10 business-date rules. DuckDB dayofweek is 0=Sun..6=Sat vs
    Spark 1=Sun..7=Sat — the oracle encodes the offset explicitly."""
    o = load(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        d.alias("base"),
        EF.default_edd(d).alias("edd"),
        EF.next_mwf(d).alias("next_mwf"),
    )


@query(
    "q15_na_normalize_props",
    """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
    FROM events
    GROUP BY event_type
    """,
)
def q15_na_normalize_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F-JSON + P6 path: extract a JSON field, aggregate per type."""
    e = load_events(spark, sf_dir)
    k = F.get_json_object("props", "$.k").try_cast("long")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum(k).cast("long").alias("sum_k")
    )


@query(
    "q16_store_item_split",
    """
    WITH lines AS (
      SELECT source || '—' || CAST(doc_id AS VARCHAR) AS po
      FROM documents
    )
    SELECT DISTINCT po,
           regexp_extract(po, '^([^-–—]*)', 1)       AS store,
           regexp_replace(po, '^[^-–—]*[-–—]', '')    AS item
    FROM lines
    WHERE regexp_matches(po, '[-–—]')
    """,
)
def q16_store_item_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3/F6: PO-line split on the first dash of any unicode width, with
    the has-dash filter and order-preserving dedup (D1)."""
    d = load(spark, sf_dir, "documents")
    po = F.concat(F.col("source"), F.lit("—"), F.col("doc_id").cast("string"))
    parts = EF.split_first_dash(F.col("po"))
    return (
        d.select(po.alias("po"))
        .filter(F.col("po").rlike("[-–—]"))
        .select("po", parts[0].alias("store"), parts[1].alias("item"))
        .dropDuplicates(["po"])
    )


# --------------------------------------------------------------------------
# 6. Training-data pipeline: deduplication
# --------------------------------------------------------------------------

# DuckDB mirrors of the shingle builders in functions.hashing
DK_NORM_TEXT = DK_NORM.format(c="text")
DK_WORDS = f"string_split({DK_NORM_TEXT}, ' ')"


def _dk_shingles_cte(n_words: int = 3) -> str:
    """CTE producing (doc_id, sh): word n-gram shingles of documents.text."""
    return f"""
    wrds AS (SELECT doc_id, {DK_WORDS} AS w FROM documents),
    sh AS (
      SELECT doc_id, array_to_string(w[i:i+{n_words - 1}], ' ') AS sh
      FROM wrds, UNNEST(generate_series(1, greatest(len(w) - {n_words - 1}, 0))) AS t(i)
    )"""


@query(
    "q17_dedup_exact",
    f"""
    WITH fp AS (SELECT doc_id, md5({DK_NORM_TEXT}) AS fingerprint FROM documents)
    SELECT CAST(min(doc_id) AS BIGINT) AS doc_id, fingerprint,
           CAST(count(*) AS BIGINT)    AS dup_count
    FROM fp GROUP BY fingerprint
    """,
)
def q17_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by normalized-text md5: one shuffle, min-id winner."""
    d = load(spark, sf_dir, "documents")
    return O.exact_dedup(d, "doc_id", "text")


_MINHASHES, _BANDS = 16, 4
_RPB = _MINHASHES // _BANDS


@query(
    "q18_minhash_lsh_pairs",
    f"""
    WITH {_dk_shingles_cte(3)},
    mh AS (
      SELECT d.doc_id, s.seed,
             coalesce(min(md5(CAST(s.seed AS VARCHAR) || ':' || sh.sh)),
                      md5(CAST(s.seed AS VARCHAR) || ':')) AS mh
      FROM documents d
      CROSS JOIN (SELECT unnest(generate_series(0, {_MINHASHES - 1})) AS seed) s
      LEFT JOIN sh ON sh.doc_id = d.doc_id
      GROUP BY d.doc_id, s.seed
    ),
    bandkeys AS (
      SELECT doc_id,
             md5(CAST(seed // {_RPB} AS VARCHAR) || ',' ||
                 string_agg(mh, ',' ORDER BY seed)) AS bk
      FROM mh GROUP BY doc_id, seed // {_RPB}
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bandkeys a JOIN bandkeys b ON a.bk = b.bk AND a.doc_id < b.doc_id
    )
    SELECT c.id_a, c.id_b,
           sum(CASE WHEN x.mh = y.mh THEN 1 ELSE 0 END) / {_MINHASHES}.0 AS est_jaccard
    FROM cand c
    JOIN mh x ON x.doc_id = c.id_a
    JOIN mh y ON y.doc_id = c.id_b AND y.seed = x.seed
    GROUP BY c.id_a, c.id_b
    """,
)
def q18_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup candidates (16 hashes, 4 bands) with the
    agreeing-component Jaccard estimate. No cartesian join anywhere."""
    d = load(spark, sf_dir, "documents")
    return O.minhash_lsh_candidates(
        d, "doc_id", "text", num_hashes=_MINHASHES, bands=_BANDS, shingle_words=3
    )


@query(
    "q19_ngram_jaccard_pairs",
    f"""
    WITH {_dk_shingles_cte(3)},
    dsh AS (SELECT DISTINCT doc_id, sh FROM sh),
    sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM dsh GROUP BY doc_id),
    freq AS (SELECT sh, count(*) AS df FROM dsh GROUP BY sh),
    capped AS (SELECT dsh.doc_id, dsh.sh FROM dsh JOIN freq USING (sh) WHERE freq.df <= 100),
    common AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(count(*) AS BIGINT) AS c
      FROM capped a JOIN capped b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT id_a, id_b,
           c / CAST(na.n + nb.n - c AS DOUBLE) AS jaccard
    FROM common
    JOIN sizes na ON na.doc_id = id_a
    JOIN sizes nb ON nb.doc_id = id_b
    WHERE c / CAST(na.n + nb.n - c AS DOUBLE) >= 0.5
    """,
)
def q19_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard via shingle inverted index, threshold 0.5, with
    the document-frequency skew guard ON (max_doc_freq=100): shingles in
    >100 docs are dropped from the inverted index before the self-join —
    at web scale one boilerplate shingle shared by 10^6 docs would make the
    Σbucket² join explode, and hot shingles carry no dedup evidence. Sizes
    (the Jaccard denominator) stay uncapped; the oracle mirrors both."""
    d = load(spark, sf_dir, "documents")
    return O.ngram_jaccard_pairs(
        d, "doc_id", "text", n=3, threshold=0.5, max_doc_freq=100
    )


@query(
    "q20_simhash_fingerprints",
    f"""
    WITH {_dk_shingles_cte(2)},
    hx AS (SELECT doc_id, substr(md5(sh), 1, 16) AS h FROM sh),
    bits AS (
      SELECT doc_id, p.p,
             CASE WHEN CAST(floor(
                    (strpos('0123456789abcdef', substr(h, 1 + (p.p // 4), 1)) - 1)
                    / power(2, 3 - (p.p % 4))) AS BIGINT) % 2 = 1
                  THEN 1 ELSE -1 END AS v
      FROM hx, (SELECT unnest(generate_series(0, 63)) AS p) p
    ),
    votes AS (SELECT doc_id, p, sum(v) AS sv FROM bits GROUP BY doc_id, p),
    fps AS (
      SELECT doc_id,
             string_agg(CASE WHEN sv > 0 THEN '1' ELSE '0' END, '' ORDER BY p) AS fp
      FROM votes GROUP BY doc_id
    )
    SELECT d.doc_id, coalesce(f.fp, repeat('0', 64)) AS simhash
    FROM documents d LEFT JOIN fps f ON f.doc_id = d.doc_id
    """,
)
def q20_simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash fingerprints (as bit strings) per document."""
    from etl_jetro_spark.operators.dedup import simhash_fingerprints

    d = load(spark, sf_dir, "documents")
    return simhash_fingerprints(d, "doc_id", "text", shingle_words=2)


# --------------------------------------------------------------------------
# 7. Training-data pipeline: similarity search
# --------------------------------------------------------------------------

@query(
    "q21_cosine_topk",
    """
    WITH q AS (
      SELECT generate_subscripts(embedding, 1) AS i,
             CAST(unnest(embedding) AS DOUBLE)  AS v
      FROM embeddings WHERE vec_id = 0
    ),
    e AS (
      SELECT vec_id, generate_subscripts(embedding, 1) AS i,
             CAST(unnest(embedding) AS DOUBLE) AS v
      FROM embeddings
    ),
    s AS (
      SELECT e.vec_id,
             round(sum(e.v * q.v)
                   / (sqrt(sum(e.v * e.v)) * sqrt(sum(q.v * q.v))), 12) AS sc
      FROM e JOIN q USING (i) GROUP BY e.vec_id
    )
    SELECT vec_id, round(sc, 4) AS score
    FROM s ORDER BY sc DESC, vec_id LIMIT 10
    """,
)
def q21_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 against the vec_id=0 query vector.
    Expression-only scoring; TakeOrdered top-k (no global sort). The query
    vector stays IN-PLAN — a broadcast join against the 1-row probe
    selection — so building the plan launches no driver job (the engine
    API `cosine_topk` also accepts an explicit vector parameter)."""
    from etl_jetro_spark.operators.similarity import cosine, _vec

    emb = load(spark, sf_dir, "embeddings")
    probe = emb.filter(F.col("vec_id") == 0).select(_vec("embedding").alias("_qv"))
    scored = emb.crossJoin(bcast_small(probe)).select(
        "vec_id",
        # 12 dp round-before-rank (similarity module docstring): exact
        # ties must break by vec_id, not fold noise — mirrored in the
        # oracle's round(..., 12)
        F.round(cosine(_vec("embedding"), F.col("_qv")), 12).alias("score"),
    )
    top = scored.orderBy(F.col("score").desc(), F.col("vec_id").asc()).limit(10)
    return top.select("vec_id", F.round("score", 4).alias("score"))


@query(
    "q22_embedding_label_stats",
    """
    WITH norms AS (
      SELECT vec_id, label,
             sqrt(sum(CAST(v AS DOUBLE) * v)) AS nrm
      FROM (SELECT vec_id, label, unnest(embedding) AS v FROM embeddings)
      GROUP BY vec_id, label
    )
    SELECT label, CAST(count(*) AS BIGINT) AS n, round(avg(nrm), 6) AS avg_norm
    FROM norms GROUP BY label
    """,
)
def q22_embedding_label_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label corpus stats over the vector column (norm distribution)."""
    from etl_jetro_spark.operators.similarity import norm as vnorm

    emb = load(spark, sf_dir, "embeddings")
    v = F.transform("embedding", lambda x: x.cast("double"))
    return (
        emb.select("label", vnorm(v).alias("nrm"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("nrm"), 6).alias("avg_norm"),
        )
    )


# --------------------------------------------------------------------------
# 8. Training-data pipeline: text analysis
# --------------------------------------------------------------------------

@query(
    "q23_token_stats",
    r"""
    SELECT doc_id,
           CAST(CASE WHEN trim(text) = '' THEN 0
                ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS INT) AS n_tokens,
           CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS INT) AS n_bpe_ish,
           CAST(len(text) AS BIGINT) AS n_chars
    FROM documents
    """,
)
def q23_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + BPE-ish subword segments."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        O.token_count("text").alias("n_tokens"),
        O.bpe_ish_token_count("text").alias("n_bpe_ish"),
        F.length("text").cast("long").alias("n_chars"),
    )


def _dk_stop_list(lang: str) -> str:
    from etl_jetro_spark.operators.textstats import STOPWORD_SETS

    return "[" + ", ".join(f"'{w}'" for w in STOPWORD_SETS[lang]) + "]"


@query(
    "q24_quality_scores",
    f"""
    WITH feat AS (
      SELECT doc_id,
             CAST(len(text) AS BIGINT) AS n_chars,
             CAST(CASE WHEN trim(text) = '' THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS INT) AS n_tokens,
             len(regexp_replace(text, '[^.,;:!?''"()\\[\\]-]', '', 'g')) AS n_punct,
             len(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digit,
             len(list_filter(string_split({DK_NORM_TEXT}, ' '),
                             x -> list_contains({_dk_stop_list('en')}, x))) AS n_stop
      FROM documents
    )
    SELECT doc_id, n_chars, n_tokens,
           round(least(n_tokens / 20.0, 1.0) * 0.4
                 + (1 - least(CAST(n_punct AS DOUBLE) / n_chars * 2
                              + CAST(n_digit AS DOUBLE) / n_chars * 2, 1.0)) * 0.3
                 + least(CAST(n_stop AS DOUBLE) / n_tokens * 4, 1.0) * 0.3, 6) AS quality_score
    FROM feat
    WHERE n_chars > 0 AND n_tokens > 0
    """,
)
def q24_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite quality score (length sweet-spot, punct/digit noise,
    stopword density)."""
    d = load(spark, sf_dir, "documents")
    scored = O.quality_score(d, "text")
    return scored.filter(
        (F.col("q_n_chars") > 0) & (F.col("q_n_tokens") > 0)
    ).select(
        "doc_id",
        F.col("q_n_chars").cast("long").alias("n_chars"),
        F.col("q_n_tokens").alias("n_tokens"),
        "quality_score",
    )


@query(
    "q25_lang_id",
    f"""
    WITH hits AS (
      SELECT doc_id,
             len(list_filter(string_split({DK_NORM_TEXT}, ' '),
                             x -> list_contains({_dk_stop_list('en')}, x))) AS h_en,
             len(list_filter(string_split({DK_NORM_TEXT}, ' '),
                             x -> list_contains({_dk_stop_list('es')}, x))) AS h_es,
             len(list_filter(string_split({DK_NORM_TEXT}, ' '),
                             x -> list_contains({_dk_stop_list('de')}, x))) AS h_de,
             len(list_filter(string_split({DK_NORM_TEXT}, ' '),
                             x -> list_contains({_dk_stop_list('fr')}, x))) AS h_fr
      FROM documents
    ),
    pred AS (
      SELECT doc_id,
             CASE
               WHEN greatest(h_en, h_es, h_de, h_fr) = 0 THEN 'und'
               WHEN h_en = greatest(h_en, h_es, h_de, h_fr) THEN 'en'
               WHEN h_es = greatest(h_en, h_es, h_de, h_fr) THEN 'es'
               WHEN h_de = greatest(h_en, h_es, h_de, h_fr) THEN 'de'
               ELSE 'fr'
             END AS predicted_lang
      FROM hits
    )
    SELECT predicted_lang, CAST(count(*) AS BIGINT) AS n_docs
    FROM pred GROUP BY predicted_lang
    """,
)
def q25_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-heuristic language ID distribution over the corpus."""
    d = load(spark, sf_dir, "documents")
    return (
        d.select(O.lang_id("text").alias("predicted_lang"))
        .groupBy("predicted_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


# --------------------------------------------------------------------------
# 9. Events: time-bucketed aggregation, set ops, remaining scalar parity
# --------------------------------------------------------------------------

@query(
    "q26_events_hourly",
    """
    SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 3600) * 3600 AS hour_epoch,
           event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 4)     AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q26_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window aggregation, tz-free (integer epoch bucketing
    — the batch shape of the streaming windowed agg)."""
    e = load_events(spark, sf_dir)
    bucket = F.expr("(ts div 1000000000) div 3600") * 3600
    return e.groupBy(
        bucket.alias("hour_epoch"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )


@query(
    "q27_union_priorities",
    """
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n FROM (
      SELECT o_orderpriority FROM orders WHERE o_orderpriority = '1-URGENT'
      UNION ALL
      SELECT o_orderpriority FROM orders WHERE o_orderpriority = '2-HIGH'
    ) GROUP BY o_orderpriority
    """,
)
def q27_union_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4 unionByName of section scans."""
    o = load(spark, sf_dir, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_orderpriority")
    high = o.filter(F.col("o_orderpriority") == "2-HIGH").select("o_orderpriority")
    return urgent.unionByName(high).groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n")
    )


@query(
    "q28_pricesheet_long",
    """
    WITH remapped AS (
      SELECT CASE WHEN CAST(l_suppkey AS VARCHAR) = '4' THEN '498'
                  ELSE CAST(l_suppkey AS VARCHAR) END AS store,
             l_partkey AS item,
             l_extendedprice AS price
      FROM lineitem
      WHERE CAST(l_suppkey AS VARCHAR) NOT IN ('7', '9')
    )
    SELECT store, CAST(item AS BIGINT) AS item,
           81214 AS vendor,
           round(min(price), 4) AS cost
    FROM remapped
    GROUP BY store, item
    HAVING min(price) <> 0
    """,
)
def q28_pricesheet_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 247 price-sheet pipeline shape: store remap (P10), store
    exclusion, long price table with vendor constant (U2), zero-cost filter
    (reference 247/tools/pricesheet_tool.py:57-102)."""
    li = load(spark, sf_dir, "lineitem")
    store = F.col("l_suppkey").cast("string")
    remapped = (
        li.filter(~store.isin("7", "9"))
        .select(
            F.when(store == "4", "498").otherwise(store).alias("store"),
            F.col("l_partkey").alias("item"),
            F.col("l_extendedprice").alias("price"),
        )
    )
    return (
        remapped.groupBy("store", "item")
        .agg(F.min("price").alias("_min_price"))
        .filter(F.col("_min_price") != 0)
        .select(
            "store",
            F.col("item").cast("long").alias("item"),
            F.lit(81214).alias("vendor"),
            F.round("_min_price", 4).alias("cost"),
        )
    )


@query(
    "q29_numeric_first_rank",
    """
    SELECT source,
           CAST(row_number() OVER (
             ORDER BY (CASE WHEN regexp_matches(source, '\\d')
                            THEN CAST(regexp_extract(source, '(\\d+)', 1) AS BIGINT)
                       END) NULLS LAST,
                      source
           ) AS INT) AS rnk
    FROM (SELECT DISTINCT source FROM documents)
    """,
)
def q29_numeric_first_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 numeric-first ordering as an explicit rank column (src9 < src10),
    via the distributed rank frame (:func:`aggregate.group_ranked`) — the
    NULLS-LAST leg rides a +inf sentinel so non-numeric sources sort after
    every parsed value, tie-broken by the raw text. No SinglePartition
    window even though the frame is NDV-sized (tools/planlint.py keeps
    the catalog allowlist-free)."""
    from etl_jetro_spark.operators.aggregate import group_ranked

    d = load(spark, sf_dir, "documents").select("source").distinct()
    key = F.coalesce(
        EF.first_int("source").cast("double"), F.lit(float("inf"))
    )
    r = group_ranked(d, [], key, tiebreak=["source"])
    return r.select("source", F.col("_rn").cast("int").alias("rnk"))


@query(
    "q30_lot_last4_keys",
    """
    SELECT event_id,
           CAST(coalesce(
             try_cast(CASE WHEN regexp_extract(CAST(props AS VARCHAR), '(\\d+)\\D*$', 1) = ''
                           THEN NULL
                           ELSE right(regexp_extract(CAST(props AS VARCHAR), '(\\d+)\\D*$', 1), 4)
                      END AS INT),
             1000000000) AS INT) AS lot_key
    FROM events
    """,
)
def q30_lot_last4_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3 custom sort key: last-4-digits-of-last-number with NULL sentinel."""
    e = load_events(spark, sf_dir)
    return e.select("event_id", O.lot_last4_key("props").alias("lot_key"))


@query(
    "q31_strip_dot_zero",
    """
    SELECT l_orderkey, l_linenumber,
           regexp_replace(printf('%.1f', l_quantity), '\\.0{1,2}$', '') AS qty_text
    FROM lineitem
    """,
)
def q31_strip_dot_zero(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2 trailing-.0 strip over printf-rendered quantities."""
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        EF.strip_dot_zero(F.format_string("%.1f", F.col("l_quantity"))).alias("qty_text"),
    )


# --------------------------------------------------------------------------
# 10. ANN, multimodal plumbing, exact kNN join
# --------------------------------------------------------------------------

@query(
    "q32_knn_join_exact",
    """
    WITH p AS (
      SELECT vec_id AS probe_id, embedding FROM embeddings WHERE vec_id < 3
    ),
    e AS (
      SELECT vec_id, generate_subscripts(embedding, 1) AS i,
             CAST(unnest(embedding) AS DOUBLE) AS v
      FROM embeddings
    ),
    pe AS (
      SELECT probe_id, generate_subscripts(embedding, 1) AS i,
             CAST(unnest(embedding) AS DOUBLE) AS v
      FROM p
    ),
    s AS (
      SELECT pe.probe_id, e.vec_id AS neighbor_id,
             round(sum(e.v * pe.v)
                   / (sqrt(sum(e.v * e.v)) * sqrt(sum(pe.v * pe.v))), 12) AS sc
      FROM e JOIN pe USING (i)
      WHERE e.vec_id <> pe.probe_id
      GROUP BY pe.probe_id, e.vec_id
    ),
    ranked AS (
      SELECT probe_id, neighbor_id, sc,
             row_number() OVER (PARTITION BY probe_id ORDER BY sc DESC, neighbor_id) AS rank
      FROM s
    )
    SELECT probe_id, neighbor_id, round(sc, 4) AS score, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= 3
    """,
)
def q32_knn_join_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force kNN join (3 probes × corpus, top-3 each) — the
    similarity-search baseline; probe side broadcast, corpus streams."""
    emb = load(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 3)
    out = O.knn_join(probes, emb, "vec_id", "embedding", k=3)
    return out.select(
        "probe_id", "neighbor_id", F.round("score", 4).alias("score"), "rank"
    )


def _dk_sig_sql(vec: str, dims: int, bits: int) -> str:
    """DuckDB mirror of similarity.signature_bits: the md5-derived
    hyperplane components are computed ONCE in Python and embedded as
    float literals in both engines' plans, so signatures match bit-exactly
    (repr round-trips doubles; products/negation are exact; sum-order
    drift only matters for dots within float-eps of 0)."""
    from etl_jetro_spark.operators.similarity import _hyperplane

    parts = []
    for b in range(bits):
        plane = "[" + ", ".join(repr(_hyperplane(b, d)) for d in range(dims)) + "]"
        parts.append(
            f"CASE WHEN list_dot_product({vec}, {plane}) > 0 THEN '1' ELSE '0' END"
        )
    return " || ".join(parts)


def _dk_band_keys_sql(
    sig_expr: str, bits: int, band_bits: int, multiprobe: bool = False
) -> str:
    """DuckDB mirror of similarity.band_key_exprs as a list literal for
    unnest(): per-band '<i>:<chunk>' keys, plus Hamming-1 chunk variants
    under multiprobe."""
    keys = []
    for i in range(bits // band_bits):
        start = i * band_bits + 1
        variants = [f"substr({sig_expr}, {start}, {band_bits})"]
        if multiprobe:
            for b in range(band_bits):
                flip = (
                    f"(CASE WHEN substr({sig_expr}, {start + b}, 1) = '1' "
                    "THEN '0' ELSE '1' END)"
                )
                variants.append(
                    f"substr({sig_expr}, {start}, {b}) || {flip} || "
                    f"substr({sig_expr}, {start + b + 1}, {band_bits - b - 1})"
                )
        keys += [f"'{i}:' || {v}" for v in variants]
    return "[" + ", ".join(keys) + "]"


_Q33_BITS, _Q33_BAND_BITS = 12, 3


def _q33_sig_cte() -> str:
    return f"""e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    sig AS (SELECT vec_id, v, {_dk_sig_sql('v', 64, _Q33_BITS)} AS s FROM e)"""


@query(
    "q33_ann_lsh_bucket",
    f"""
    WITH {_q33_sig_cte()},
    corpus_b AS (
      SELECT vec_id, unnest({_dk_band_keys_sql('s', _Q33_BITS, _Q33_BAND_BITS)}) AS band
      FROM sig),
    probe_b AS (
      SELECT vec_id AS probe_id,
             unnest({_dk_band_keys_sql('s', _Q33_BITS, _Q33_BAND_BITS, multiprobe=True)}) AS band
      FROM sig WHERE vec_id < 3),
    cand AS (
      SELECT DISTINCT probe_id, c.vec_id AS neighbor_id
      FROM probe_b p JOIN corpus_b c USING (band)
      WHERE c.vec_id <> p.probe_id),
    scored AS (
      SELECT probe_id, neighbor_id,
             list_dot_product(x.v, y.v)
               / (sqrt(list_dot_product(x.v, x.v)) * sqrt(list_dot_product(y.v, y.v))) AS sc
      FROM cand JOIN sig x ON x.vec_id = probe_id JOIN sig y ON y.vec_id = neighbor_id),
    ranked AS (
      SELECT probe_id, neighbor_id, sc,
             row_number() OVER (PARTITION BY probe_id ORDER BY sc DESC, neighbor_id) AS rank
      FROM scored)
    SELECT probe_id, neighbor_id, round(sc, 4) AS score, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= 3
    """,
)
def q33_ann_lsh_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH bucketed ANN with multi-probe (Hamming-1 buckets on the
    probe side), exact-cosine re-rank — now under the FULL oracle: the
    DuckDB side mirrors the md5-hyperplane signatures and banding
    bit-exactly (same literals), so the approximate candidate set itself
    is verified, not just row counts."""
    emb = load(spark, sf_dir, "embeddings")
    # probes ⊆ corpus: probe_pred shares ONE checkpointed signature frame
    # between the probe and corpus branches (the signature expressions are
    # the dominant per-row cost of this query)
    out = O.lsh_bucket_knn(
        None, emb, "vec_id", "embedding", dims=64, k=3,
        bits=_Q33_BITS, band_bits=_Q33_BAND_BITS, multiprobe=True,
        probe_pred=F.col("vec_id") < 3,
    )
    return out.select(
        "probe_id", "neighbor_id", F.round("score", 4).alias("score"), "rank"
    )


@query(
    "q57_ann_quality",
    f"""
    WITH {_q33_sig_cte()},
    exact_s AS (
      SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
             list_dot_product(p.v, c.v)
               / (sqrt(list_dot_product(p.v, p.v)) * sqrt(list_dot_product(c.v, c.v))) AS sc
      FROM sig p, sig c
      WHERE p.vec_id < 3 AND c.vec_id <> p.vec_id),
    exact_k AS (
      SELECT probe_id, neighbor_id FROM (
        SELECT probe_id, neighbor_id,
               row_number() OVER (PARTITION BY probe_id ORDER BY sc DESC, neighbor_id) AS rank
        FROM exact_s) WHERE rank <= 3),
    corpus_b AS (
      SELECT vec_id, unnest({_dk_band_keys_sql('s', _Q33_BITS, _Q33_BAND_BITS)}) AS band
      FROM sig),
    probe_b AS (
      SELECT vec_id AS probe_id,
             unnest({_dk_band_keys_sql('s', _Q33_BITS, _Q33_BAND_BITS, multiprobe=True)}) AS band
      FROM sig WHERE vec_id < 3),
    cand AS (
      SELECT DISTINCT probe_id, c.vec_id AS neighbor_id
      FROM probe_b p JOIN corpus_b c USING (band)
      WHERE c.vec_id <> p.probe_id),
    approx_k AS (
      SELECT probe_id, neighbor_id FROM (
        SELECT probe_id, neighbor_id,
               row_number() OVER (PARTITION BY probe_id ORDER BY
                 list_dot_product(x.v, y.v)
                   / (sqrt(list_dot_product(x.v, x.v)) * sqrt(list_dot_product(y.v, y.v))) DESC,
                 neighbor_id) AS rank
        FROM cand JOIN sig x ON x.vec_id = probe_id JOIN sig y ON y.vec_id = neighbor_id)
      WHERE rank <= 3),
    n_cand AS (SELECT probe_id, CAST(count(*) AS BIGINT) AS n_candidates
               FROM cand GROUP BY probe_id),
    hits AS (
      SELECT a.probe_id, CAST(count(*) AS BIGINT) AS n_hit
      FROM approx_k a JOIN exact_k e USING (probe_id, neighbor_id)
      GROUP BY a.probe_id)
    SELECT p.vec_id AS probe_id,
           CAST(coalesce(n_candidates, 0) AS BIGINT) AS n_candidates,
           CAST(coalesce(n_hit, 0) AS BIGINT)        AS n_hit,
           coalesce(n_hit, 0) / 3.0                  AS recall
    FROM (SELECT vec_id FROM sig WHERE vec_id < 3) p
    LEFT JOIN n_cand ON n_cand.probe_id = p.vec_id
    LEFT JOIN hits ON hits.probe_id = p.vec_id
    """,
)
def q57_ann_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN quality telemetry: per-probe candidate count (the sublinearity
    evidence) and recall@3 vs the exact kNN baseline — oracle-verified via
    the mirrored signature/banding literals."""
    emb = load(spark, sf_dir, "embeddings")
    # probes ⊆ corpus: one checkpointed signature frame serves the exact
    # baseline, both banded sides, and the probe id list
    return O.ann_quality(
        None, emb, "vec_id", "embedding", dims=64, k=3,
        bits=_Q33_BITS, band_bits=_Q33_BAND_BITS, multiprobe=True,
        probe_pred=F.col("vec_id") < 3,
    )


@query(
    "q58_lsh_bucket_histogram",
    f"""
    WITH {_q33_sig_cte()},
    b AS (SELECT vec_id, unnest({_dk_band_keys_sql('s', _Q33_BITS, _Q33_BAND_BITS)}) AS band
          FROM sig),
    sizes AS (SELECT band, CAST(count(*) AS BIGINT) AS bucket_size FROM b GROUP BY band)
    SELECT bucket_size, CAST(count(*) AS BIGINT) AS n_buckets
    FROM sizes GROUP BY bucket_size
    """,
)
def q58_lsh_bucket_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH bucket-size distribution over the corpus banding — the Σbucket²
    cost telemetry for the ANN scale path."""
    emb = load(spark, sf_dir, "embeddings")
    return O.lsh_bucket_histogram(
        emb, "vec_id", "embedding", dims=64,
        bits=_Q33_BITS, band_bits=_Q33_BAND_BITS,
    )


@query(
    "q34_multimodal_features",
    """
    WITH h AS (
      SELECT doc_id AS media_id, md5(text) AS hx,
             CAST(strlen(text) AS BIGINT) AS n
      FROM documents
    ),
    d AS (
      SELECT media_id, hx, n,
             (strpos('0123456789abcdef', substr(hx, 1, 1)) - 1) * 16
               + (strpos('0123456789abcdef', substr(hx, 2, 1)) - 1) AS b0,
             (strpos('0123456789abcdef', substr(hx, 3, 1)) - 1) * 16
               + (strpos('0123456789abcdef', substr(hx, 4, 1)) - 1) AS b1
      FROM h
    )
    SELECT media_id, hx AS feature, n AS n_bytes,
           CAST(64 + b0 % 192 AS INT) AS thumb_w,
           CAST(64 + b1 % 192 AS INT) AS thumb_h
    FROM d
    """,
)
def q34_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing on real data: documents.text bytes as an opaque
    binary 'media' column → typed metadata struct → Arrow mapInPandas
    feature extraction. The decode stub derives thumb dims from the md5
    digest's first two bytes, so the WHOLE Pandas-UDF path — Arrow batch
    shapes included — is verifiable in SQL: the oracle recomputes
    feature/dims from md5(text) (DuckDB hashes the same utf-8 bytes the
    Python worker sees). codec="fake" is the EXPLICIT opt-in: these blobs
    are utf-8 text, not media — the real decode path is q108/q109."""
    from etl_jetro_spark.operators import multimodal as MM
    from etl_jetro_spark.operators.util import spread

    d = spread(load(spark, sf_dir, "documents"))
    media = d.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("content"),
    )
    return MM.extract_features(MM.attach_meta(media), codec="fake")


@query(
    "q35_frame_sample_plan",
    """
    SELECT doc_id AS media_id,
           unnest(generate_series(0, CAST(n_chars AS BIGINT) - 1, 100)) AS frame_ts_ms
    FROM documents WHERE n_chars > 0
    """,
)
def q35_frame_sample_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plan rows from synthetic duration metadata
    (duration := n_chars ms — deterministic stand-in); one row per
    (media_id, frame_ts) at a 100 ms cadence, generated partition-locally
    (Expand, no shuffle)."""
    from etl_jetro_spark.operators import multimodal as MM

    d = load(spark, sf_dir, "documents")
    media = d.select(
        F.col("doc_id").alias("media_id"),
        F.struct(
            F.lit("video").alias("media_type"),
            F.lit("mp4").alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.col("n_chars").cast("long").alias("duration_ms"),
            F.col("n_chars").cast("long").alias("size_bytes"),
        ).alias("meta"),
    )
    return MM.frame_sample_plan(media, every_ms=100)


# --------------------------------------------------------------------------
# 11. Remaining scalar parity: normalization, NA rules, email extraction
# --------------------------------------------------------------------------

@query(
    "q36_norm_keys",
    """
    SELECT p_partkey,
           trim(regexp_replace(p_name, '\\s+', ' ', 'g'))  AS name_ws,
           regexp_replace(lower(trim(regexp_replace(p_name, '\\s+', ' ', 'g'))),
                          '[#\\s]', '', 'g')               AS name_key
    FROM part
    """,
)
def q36_norm_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 whitespace collapse + lookup-key normalization."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        EF.norm_ws("p_name").alias("name_ws"),
        EF.norm_key("p_name").alias("name_key"),
    )


@query(
    "q37_na_normalization",
    """
    WITH cells AS (
      SELECT l_orderkey, l_linenumber,
             CASE l_linestatus WHEN 'O' THEN 'n/a'
                               WHEN 'F' THEN CAST(l_quantity AS VARCHAR)
             END AS cell
      FROM lineitem
    )
    SELECT l_orderkey, l_linenumber,
           CASE WHEN lower(trim(cell)) IN ('', 'na', 'n/a', 'nan', 'none', 'null', 'nah')
                THEN NULL ELSE cell END AS cleaned
    FROM cells
    """,
)
def q37_na_normalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6 NA-string rule firing on synthesized messy cells: every 'O'-status
    line renders 'n/a' and must null out."""
    li = load(spark, sf_dir, "lineitem")
    cell = F.when(F.col("l_linestatus") == "O", "n/a").when(
        F.col("l_linestatus") == "F", F.col("l_quantity").cast("string")
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        EF.normalize_na(cell).alias("cleaned"),
    )


@query(
    "q38_email_extraction",
    """
    SELECT c_custkey,
           array_to_string(
             regexp_extract_all(
               'contact ' || lower(replace(c_name, ' ', '')) || '@example.com; backup '
                 || lower(replace(c_name, ' ', '')) || '@EXAMPLE.com invalid@@x',
               '([A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,})', 1
             )[1:1], ';'
           ) AS emails
    FROM customer
    """,
)
def q38_email_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8 email extraction with ci-dedup: the two synthesized addresses
    differ only by domain case, so exactly one survives. Emitted as a
    ';'-joined scalar so the result is hashable by the correctness gate."""
    c = load(spark, sf_dir, "customer")
    text = F.concat(
        F.lit("contact "),
        F.lower(F.replace(F.col("c_name"), F.lit(" "), F.lit(""))),
        F.lit("@example.com; backup "),
        F.lower(F.replace(F.col("c_name"), F.lit(" "), F.lit(""))),
        F.lit("@EXAMPLE.com invalid@@x"),
    )
    return c.select(
        "c_custkey", F.concat_ws(";", EF.extract_emails(text)).alias("emails")
    )


# --------------------------------------------------------------------------
# 12. Embedding near-dup + distinct aggregation
# --------------------------------------------------------------------------

_Q39_BITS, _Q39_BAND_BITS, _Q39_DIMS = 32, 8, 64

@query(
    "q39_embedding_near_dup",
    f"""
    WITH base AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    u AS (
      SELECT vec_id, v FROM base
      UNION ALL
      SELECT vec_id + 100000, list_prepend(-v[1], v[2:]) FROM base
    ),
    sig AS (SELECT vec_id, v, {_dk_sig_sql('v', _Q39_DIMS, _Q39_BITS)} AS s FROM u),
    banded AS (
      SELECT vec_id,
             CAST(i.i AS VARCHAR) || ':' || substr(s, i.i * {_Q39_BAND_BITS} + 1, {_Q39_BAND_BITS}) AS band
      FROM sig, (SELECT unnest(generate_series(0, {_Q39_BITS // _Q39_BAND_BITS - 1})) AS i) i
    ),
    cand AS (
      SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
      FROM banded a JOIN banded b ON a.band = b.band AND a.vec_id < b.vec_id
    ),
    scored AS (
      SELECT id_a, id_b,
             round(list_dot_product(x.v, y.v)
               / (sqrt(list_dot_product(x.v, x.v)) * sqrt(list_dot_product(y.v, y.v))), 4) AS score
      FROM cand JOIN sig x ON x.vec_id = id_a JOIN sig y ON y.vec_id = id_b
    )
    SELECT id_a, id_b, score FROM scored WHERE score >= 0.95
    """,
)
def q39_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup at corpus scale: sign-LSH banded candidate
    generation + exact-cosine verify (operators/similarity.embedding_near_dup)
    — an equi-join on (band, 8-bit chunk) keys, never an all-pairs join on a
    coarse block key. The corpus is unioned with deterministically perturbed
    copies (first component negated, id+100000 → cosine ≈ 1 - 2·v₀²/|v|²) so
    true near-dups exist to find; the oracle mirrors the banding with the
    same md5-derived hyperplane literals, so recall < 1 cancels out in the
    comparison. Threshold applied on the ROUNDED score on both sides."""
    from etl_jetro_spark.operators.similarity import embedding_near_dup
    from etl_jetro_spark.operators.util import spread

    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    pert = emb.select(
        (F.col("vec_id") + F.lit(100000)).alias("vec_id"),
        F.concat(
            F.array(-F.element_at(F.col("embedding"), 1)),
            F.slice(F.col("embedding"), 2, _Q39_DIMS - 1),
        ).alias("embedding"),
    )
    u = spread(emb.unionByName(pert))
    return embedding_near_dup(
        u,
        "vec_id",
        "embedding",
        dims=_Q39_DIMS,
        threshold=0.95,
        bits=_Q39_BITS,
        band_bits=_Q39_BAND_BITS,
        score_round=4,
    )


@query(
    "q40_distinct_users",
    """
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(count(*) AS BIGINT)                AS n_events
    FROM events
    GROUP BY event_type
    """,
)
def q40_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregation (two-phase: partial distinct then final)."""
    e = load_events(spark, sf_dir)
    return e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


# --------------------------------------------------------------------------
# 13. Multi-level aggregation and classic shipping-priority join
# --------------------------------------------------------------------------

@query(
    "q41_rollup_revenue",
    """
    SELECT coalesce(r.r_name, 'ALL')  AS region,
           coalesce(n.n_name, 'ALL')  AS nation,
           round(sum(c.c_acctbal), 4) AS total_acctbal,
           CAST(count(*) AS BIGINT)   AS n_customers
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r.r_name, n.n_name)
    """,
)
def q41_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical ROLLUP aggregation (region → nation → grand total) —
    multi-level aggregates beyond the reference's flat group-bys; one
    Expand + one shuffle in Spark."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    joined = c.join(bcast_small(n), c.c_nationkey == n.n_nationkey).join(
        bcast_small(r), n.n_regionkey == r.r_regionkey
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            F.round(F.sum("c_acctbal"), 4).alias("total_acctbal"),
            F.count(F.lit(1)).alias("n_customers"),
        )
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation"),
            "total_acctbal",
            "n_customers",
        )
    )


@query(
    "q42_shipping_priority",
    f"""
    SELECT l.l_orderkey,
           {sql_exact_net_sum('l.l_extendedprice', 'l.l_discount')} AS revenue,
           CAST(o.o_orderdate AS DATE)                           AS orderdate,
           o.o_orderpriority                                     AS priority
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < DATE '1997-01-01'
      AND l.l_shipdate  > DATE '1997-01-01'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 20
    """,
)
def q42_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective predicates on three tables (all pushed to
    the scans), join, agg, deterministic top-k."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-01-01").cast("date")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-01-01").cast("date")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            M.exact_net_sum("l_extendedprice", "l_discount").alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            F.col("o_orderdate").cast("date").alias("orderdate"),
            F.col("o_orderpriority").alias("priority"),
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(20)
    )


# --------------------------------------------------------------------------
# 14. Time-series operators Spark lacks natively: as-of join,
#     sessionization, exact percentiles
# --------------------------------------------------------------------------

@query(
    "q43_asof_join",
    """
    WITH clicks AS (
      SELECT user_id, event_id, ts FROM events WHERE event_type = 'click'
    ),
    purchases AS (
      SELECT user_id, event_id AS purchase_id, ts FROM events
      WHERE event_type = 'purchase'
    )
    SELECT c.user_id, c.event_id AS click_id, p.purchase_id AS last_purchase_id
    FROM clicks c
    ASOF LEFT JOIN purchases p
      ON c.user_id = p.user_id AND c.ts >= p.ts
    """,
)
def q43_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (per click, the latest purchase at-or-before it, by
    user) — an operator Spark lacks natively, composed as a union-tag +
    running last_value window: one shuffle on the key, no range explosion.
    DuckDB expresses the same thing with ASOF JOIN."""
    from pyspark.sql import Window

    e = load_events(spark, sf_dir)
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.lit(None).cast("long").alias("purchase_id"),
        "ts",
        F.lit(1).alias("_is_click"),
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.lit(None).cast("long").alias("click_id"),
        F.col("event_id").alias("purchase_id"),
        "ts",
        F.lit(0).alias("_is_click"),
    )
    tagged = clicks.unionByName(purchases)
    # purchases sort before clicks at equal ts so same-instant purchases match
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "_is_click")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged.withColumn(
        "last_purchase_id", F.last("purchase_id", ignorenulls=True).over(w)
    )
    return carried.filter(F.col("_is_click") == 1).select(
        "user_id", "click_id", "last_purchase_id"
    )


@query(
    "q44_sessionization",
    """
    WITH gaps AS (
      SELECT user_id, ts,
             CASE WHEN epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
                       > 1800 OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    sessions AS (
      SELECT user_id,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_no
      FROM gaps
    ),
    per_session AS (
      SELECT user_id, session_no, CAST(count(*) AS BIGINT) AS n_events
      FROM sessions GROUP BY user_id, session_no
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT)       AS n_sessions,
           CAST(max(n_events) AS BIGINT)  AS max_session_events,
           round(avg(n_events), 6)        AS avg_session_events
    FROM per_session GROUP BY user_id
    """,
)
def q44_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity closes a session): lag →
    new-session flag → running sum — the standard scalable formulation, one
    shuffle on user_id shared by both windows."""
    from pyspark.sql import Window

    e = load_events(spark, sf_dir)
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_ns = F.col("ts") - F.lag("ts").over(wo)
    new_session = F.when(
        gap_ns.isNull() | (gap_ns > 1800 * 1_000_000_000), 1
    ).otherwise(0)
    wrun = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sessions = e.select(
        "user_id", F.sum(new_session).over(wrun).alias("session_no")
    )
    per_session = sessions.groupBy("user_id", "session_no").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    return per_session.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.max("n_events").alias("max_session_events"),
        F.round(F.avg("n_events"), 6).alias("avg_session_events"),
    )


@query(
    "q45_value_percentiles",
    """
    SELECT event_type,
           round(quantile_cont(value, 0.50), 6) AS p50,
           round(quantile_cont(value, 0.95), 6) AS p95,
           round(min(value), 6) AS vmin,
           round(max(value), 6) AS vmax
    FROM events GROUP BY event_type
    """,
)
def q45_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group via the DISTRIBUTED
    two-pass rank formulation (operators/aggregate.exact_group_percentiles):
    external sort + rank lookup, no per-group value buffering — Spark's
    ``percentile`` aggregate would hold each group's whole multiset in one
    task's memory (OOM with 5 groups at raw-row scale). min/max are the
    p=0/p=1 rank lookups of the same sorted pass. Matches DuckDB's
    quantile_cont (same linear interpolation)."""
    from etl_jetro_spark.operators.aggregate import exact_group_percentiles

    e = load_events(spark, sf_dir)
    pct = exact_group_percentiles(
        e,
        ["event_type"],
        "value",
        {"p50": 0.5, "p95": 0.95, "vmin": 0.0, "vmax": 1.0},
    )
    return pct.select(
        "event_type",
        F.round("p50", 6).alias("p50"),
        F.round("p95", 6).alias("p95"),
        F.round("vmin", 6).alias("vmin"),
        F.round("vmax", 6).alias("vmax"),
    )


@query(
    "q46_range_join",
    """
    WITH e AS (SELECT user_id, event_id, ts, event_type FROM events)
    SELECT a.user_id, a.event_id AS id_a, b.event_id AS id_b,
           CAST((epoch_ns(b.ts) - epoch_ns(a.ts)) // 1000000000 AS BIGINT) AS gap_s
    FROM e a JOIN e b
      ON a.user_id = b.user_id
     AND a.event_id < b.event_id
     AND abs(epoch_ns(a.ts) - epoch_ns(b.ts)) <= 60000000000
    """,
)
def q46_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal range join: same-user event pairs within 60 s, via the
    bucketed formulation (hash join + 3x amplification, never a per-key
    cartesian)."""
    from etl_jetro_spark.operators.rangejoin import range_join

    e = load_events(spark, sf_dir).select("user_id", "event_id", "ts")
    pairs = range_join(e, e, ["user_id"], "ts", 60 * 1_000_000_000)
    return (
        pairs.filter(F.col("event_id_a") < F.col("event_id_b"))
        .dropDuplicates(["event_id_a", "event_id_b"])
        .select(
            "user_id",
            F.col("event_id_a").alias("id_a"),
            F.col("event_id_b").alias("id_b"),
            ((F.col("ts_b") - F.col("ts_a")) / F.lit(1_000_000_000))
            .cast("long")
            .alias("gap_s"),
        )
    )


# --------------------------------------------------------------------------
# 13. The six supplier pipelines under the oracle gate (q47–q53)
#
# Each query builds a deterministic raw grid from the parquet tables
# (plans/fixtures.py), runs the REAL pipeline code — the pandas clean layer
# plus the Spark relational build — and the oracle recomputes the expected
# result straight from the same tables. The grids carry junk rows/columns
# on purpose: the pipeline must strip them to match.
# --------------------------------------------------------------------------

from etl_jetro_spark.plans import fixtures as FX  # noqa: E402
from etl_jetro_spark.pipelines import batch as B  # noqa: E402

_PIPE_BASE_DATE = "2026-01-05"  # Monday: default_edd -> Wed 2026-01-07, next_mwf -> Wed


@query("q47_pipeline_247_allocation", FX.ALLOCATION_ORACLE)
def q47_pipeline_247_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """247 allocation end-to-end (reference 247/tools/allocation_tool.py:7-169):
    junk-row drop + header promotion (P1/P2) → Total slice (P3) → desc drop
    (P4) → melt (U1) → group-sum (A1) → ≠0 (P8) → branch fix (P15) →
    constants + default EDD (P14/F9) → canonical 13 columns."""
    wide = B.clean_allocation(FX.allocation_grid(sf_dir))
    return B.build_allocation(spark, wide, "247", base_date=_PIPE_BASE_DATE)


@query("q48_pipeline_247_pricesheet", FX.PRICESHEET_ORACLE)
def q48_pipeline_247_pricesheet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """247 price sheet end-to-end (reference 247/tools/pricesheet_tool.py:8-102):
    zero/NA item drop → Item Name/FOB drop → melt (U2) → store remap 490→498
    + 457/453 exclusion (P10) → parse_money with paren negatives (F3) →
    zero-cost filter (P8) → long (Store#, Item#, Vendor#, Cost)."""
    wide = B.clean_pricesheet(FX.pricesheet_grid(sf_dir))
    return B.build_pricesheet_long(spark, wide)


@query("q49_pipeline_acme", FX.ACME_ORACLE)
def q49_pipeline_acme(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ACME end-to-end (reference ACME/tools/acme_tool.py:6-112): 2 junk
    cols dropped, Distro-Size slice, filename-token dock filter 'il'→{189,436}
    (P7), the ne(0) zero-filter quirk (non-numeric Distro KEPT), ACME
    constants + branch fix."""
    wide = B.clean_acme_like(FX.acme_grid(sf_dir), leading_junk_cols=2)
    return B.build_acme_like(
        spark, wide, "acme", "il allocation file", _PIPE_BASE_DATE
    )


@query("q50_pipeline_phillips", FX.PHILLIPS_ORACLE)
def q50_pipeline_phillips(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phillips end-to-end (reference Phillips/tools/phillips_tool.py:6-123):
    1 junk col, literal dock token '407' (P7), Warehouse kept = dock,
    XdockCode appended → 14-column canonical."""
    wide = B.clean_acme_like(FX.phillips_grid(sf_dir), leading_junk_cols=1)
    return B.build_acme_like(
        spark, wide, "phillips", "phillips 407 sheet", _PIPE_BASE_DATE
    )


@query("q51_pipeline_southern_cross", FX.SOUTHERN_CROSS_ORACLE)
def q51_pipeline_southern_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SouthernCross end-to-end (reference
    SouthernCross/tools/southern_cross_tool.py:9-233): LOT# slice, per-cell
    coercion ('na'→0, '9.0'→9, '5.50'→5.5, Item==0 drop), melt → sum →
    truncating long cast, SC constants (80104/P2M)."""
    wide = B.clean_southern_cross(FX.southern_cross_grid(sf_dir))
    return B.build_southern_cross(spark, wide, _PIPE_BASE_DATE)


@query("q52_pipeline_big_flip", FX.BIG_FLIP_ORACLE)
def q52_pipeline_big_flip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flips big end-to-end (reference Flips/tools/big_flip_tool.py:84-297):
    store Fob/Xdock block extraction (P12), positional clean + elif-chain
    trim at PO # (P3), 2-id melt with parse_money values (U3), ceil-of-sum
    (A2), XDCK/FOB map-join with zero→blank (J3), next-MWF EDD (F10)."""
    grid = FX.big_flip_grid(sf_dir)
    store_block = B.build_flips_store_block(grid, header_row=4)
    wide = B.clean_big_flip(grid)
    return B.build_big_flip(spark, wide, store_block, _PIPE_BASE_DATE)


@query("q53_pipeline_baby_flip", FX.BABY_FLIP_ORACLE)
def q53_pipeline_baby_flip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flips baby end-to-end (reference Flips/tools/baby_flip_tool.py:7-338):
    Wgt drop + DESC rename-by-position (P16), NA normalization (P6),
    positional 4-id melt between pack size and Lot # (U4), per-cell ceil
    then 5-key sum (A3/F13), PO + carrier broadcast joins (J1/J2), weight =
    Value×pack, injected invoice date, the reference's exact 9-col schema."""
    po_rows = [(s, f"PO-{7000 + k}") for k, s in enumerate(FX.BABY_STORES)]
    po_df = spark.createDataFrame(po_rows, ["Store", "PO #"])
    carrier_rows = [(s, f"C{k}") for k, s in enumerate(FX.BABY_STORES)]
    carrier_df = spark.createDataFrame(carrier_rows, ["Store", "carrier_code"])
    wide = B.clean_baby_flip(FX.baby_flip_grid(sf_dir))
    return B.build_baby_flip(
        spark, wide, po_df, carrier_df, invoice_date="2026-01-06"
    )


# --------------------------------------------------------------------------
# 14. Remaining scalar-function parity (F11/F12/F7) — q54–q56
# --------------------------------------------------------------------------

@query(
    "q54_tolerant_date_reformat",
    """
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 7 = 0 THEN 'not a date'
                ELSE strftime(o_orderdate, '%m/%d/%y') END AS reformatted
    FROM orders
    """,
)
def q54_tolerant_date_reformat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F11 tolerant reformat: parseable M/d/yyyy text → MM/dd/yy;
    unparseable text passes through unchanged (reference
    247/tools/allocation_tool.py:220-228 fallback)."""
    from etl_jetro_spark.functions.dates import fmt_mdy_no_pad, reformat_date_tolerant

    o = load(spark, sf_dir, "orders")
    messy = F.when(F.col("o_orderkey") % 7 == 0, F.lit("not a date")).otherwise(
        fmt_mdy_no_pad(F.col("o_orderdate"))
    )
    return o.select(
        "o_orderkey", reformat_date_tolerant(messy).alias("reformatted")
    )


@query(
    "q55_weekday_prefix",
    """
    SELECT o_orderkey,
           CASE strftime(o_orderdate, '%a')
                WHEN 'Mon' THEN 'Mon' WHEN 'Tue' THEN 'Tues' WHEN 'Wed' THEN 'Wed'
                WHEN 'Thu' THEN 'Thurs' WHEN 'Fri' THEN 'Fri'
                ELSE NULL END AS tab_prefix
    FROM orders
    """,
)
def q55_weekday_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F12 weekday worksheet-tab prefix (Mon/Tues/Wed/Thurs/Fri; weekends
    have no tab — NULL). (reference sheet_bot/utils.py:25-35)"""
    from etl_jetro_spark.functions.dates import weekday_prefix

    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey", weekday_prefix(F.col("o_orderdate")).alias("tab_prefix")
    )


@query(
    "q56_store_from_pdf_path",
    """
    SELECT c_custkey,
           regexp_extract('/share/P2E/vendor-' || CAST(c_nationkey AS VARCHAR)
                            || '-' || CAST(c_custkey AS VARCHAR) || '.pdf',
                          '-(\\d+)-\\d+\\.pdf$', 1) AS store
    FROM customer
    """,
)
def q56_store_from_pdf_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7 store extraction from PO-PDF paths, ``...-<store>-<po>.pdf``
    (reference sheet_bot/main.py:52-84)."""
    c = load(spark, sf_dir, "customer")
    path = F.concat(
        F.lit("/share/P2E/vendor-"),
        F.col("c_nationkey").cast("string"),
        F.lit("-"),
        F.col("c_custkey").cast("string"),
        F.lit(".pdf"),
    )
    return c.select(
        "c_custkey", EF.extract_store_from_pdf_name(path).alias("store")
    )


@query(
    "q59_pipeline_leavins",
    FX.ALLOCATION_ORACLE.replace("81214", "79906")
    .replace("'P2E'", "'P2M'")
    .replace("DATE '2026-01-07'", "DATE '2026-01-09'"),
)
def q59_pipeline_leavins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leavins allocation end-to-end: the 247 clone that REQUIRES an
    explicit EDD (no today+2 default — reference
    Leavins/tools/allocation_tool.py:133-134) with its own constants
    (79906/P2M). Same grid shape as q47; EDD passed explicitly."""
    wide = B.clean_allocation(FX.allocation_grid(sf_dir))
    return B.build_allocation(
        spark, wide, "leavins", edd=F.lit("2026-01-09").cast("date")
    )


@query(
    "q60_dedup_components",
    """
    WITH RECURSIVE e AS (
      SELECT l_orderkey AS a, l_partkey + 1000000000 AS b
      FROM lineitem WHERE l_orderkey < 200 AND l_partkey < 100
    ),
    und AS (SELECT a, b FROM e UNION SELECT b, a FROM e),
    nodes AS (SELECT a AS id FROM und UNION SELECT b FROM und),
    reach(s, t) AS (
      SELECT id, id FROM nodes
      UNION
      SELECT r.s, u.b FROM reach r JOIN und u ON u.a = r.t
    )
    SELECT s AS id, min(t) AS component
    FROM reach GROUP BY s
    """,
)
def q60_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over a real multi-hop graph (orders↔parts
    bipartite edges from lineitem — parts shared across orders chain
    components together), by iterative min-label propagation
    (operators/graph.py). The oracle computes the same min-reachable
    labels with a recursive CTE — an iterative DataFrame algorithm under
    the full hash gate."""
    from etl_jetro_spark.operators.graph import connected_components

    li = load(spark, sf_dir, "lineitem")
    edges = li.filter(
        (F.col("l_orderkey") < 200) & (F.col("l_partkey") < 100)
    ).select(
        F.col("l_orderkey").alias("id_a"),
        (F.col("l_partkey") + F.lit(1000000000)).alias("id_b"),
    )
    return connected_components(edges)


@query(
    "q61_salted_hot_key_sum",
    """
    SELECT l_returnflag,
           CAST(sum(floor(l_quantity)) AS BIGINT) AS sum_qty,
           CAST(count(*) AS BIGINT)               AS n
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q61_salted_hot_key_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key aggregation through the two-phase salted path
    (operators/skew.salted_sum_by): 3 distinct keys over the whole fact
    table is the worst reducer skew possible — the salt spreads each key
    over 16 reducers in phase 1, the final combine sees 16 partials per
    key. The oracle is the PLAIN group-sum: salting must be
    result-identical (integral values, so sums are order-exact)."""
    from etl_jetro_spark.operators.skew import salted_sum_by

    li = load(spark, sf_dir, "lineitem").withColumn(
        "q", F.floor("l_quantity")
    )
    sums = salted_sum_by(li, ["l_returnflag"], "q", out="sum_qty")
    counts = li.groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("n"))
    return sums.join(counts, "l_returnflag").select(
        "l_returnflag", F.col("sum_qty").cast("long").alias("sum_qty"), "n"
    )


@query(
    "q62_split_assignment",
    """
    WITH h AS (
      SELECT doc_id, md5('split:' || CAST(doc_id AS VARCHAR)) AS hx
      FROM documents
    ),
    b AS (
      SELECT doc_id,
             ((strpos('0123456789abcdef', substr(hx, 1, 1)) - 1) * 268435456
            + (strpos('0123456789abcdef', substr(hx, 2, 1)) - 1) * 16777216
            + (strpos('0123456789abcdef', substr(hx, 3, 1)) - 1) * 1048576
            + (strpos('0123456789abcdef', substr(hx, 4, 1)) - 1) * 65536
            + (strpos('0123456789abcdef', substr(hx, 5, 1)) - 1) * 4096
            + (strpos('0123456789abcdef', substr(hx, 6, 1)) - 1) * 256
            + (strpos('0123456789abcdef', substr(hx, 7, 1)) - 1) * 16
            + (strpos('0123456789abcdef', substr(hx, 8, 1)) - 1)) % 10000 AS bkt
      FROM h
    )
    SELECT doc_id,
           CASE WHEN bkt < 9000 THEN 'train'
                WHEN bkt < 9500 THEN 'val'
                ELSE 'test' END AS split
    FROM b
    """,
)
def q62_split_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment by md5 hash-mod bucketing
    (operators/sampling.split_assign) — the reproducible-split primitive a
    training pipeline needs instead of seed-dependent sample(). The oracle
    recomputes the same md5 buckets digit-by-digit; same row → same split
    on any engine, any partitioning."""
    from etl_jetro_spark.operators.sampling import split_assign

    d = load(spark, sf_dir, "documents").select("doc_id")
    return split_assign(
        d, "doc_id", {"train": 0.9, "val": 0.05, "test": 0.05}, salt="split:"
    )


@query(
    "q63_vocab_doc_freq",
    f"""
    WITH toks AS (
      SELECT DISTINCT doc_id,
             unnest(string_split({DK_NORM.format(c='text')}, ' ')) AS token
      FROM documents
    )
    SELECT token, CAST(count(*) AS BIGINT) AS doc_freq
    FROM toks WHERE token <> ''
    GROUP BY token HAVING count(*) >= 30
    """,
)
def q63_vocab_doc_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary with document frequencies (min_df=30, matching
    the oracle's HAVING bound exactly — a looser Spark-side cut stayed
    latent until the round-3 testdata grew a token in the gap) — vocab /
    stopword-list construction over the same normalized tokenization the
    dedup shingles use."""
    from etl_jetro_spark.operators.textstats import vocab_doc_freq

    d = load(spark, sf_dir, "documents")
    return vocab_doc_freq(d, "doc_id", "text", min_df=30)


# --------------------------------------------------------------------------
# 13. Training-data surface, round 2 extension: chunking, packing, PII,
#     repetition filters, TF-IDF, LM scoring, stratified sampling,
#     embedding quantization
# --------------------------------------------------------------------------

_CHUNK, _STRIDE = 40, 30


@query(
    "q64_doc_chunks",
    f"""
    WITH wrds AS (
      SELECT doc_id, {{dk_words}} AS w FROM documents WHERE {{dk_norm}} <> ''
    ),
    st AS (
      SELECT doc_id, w, unnest(generate_series(0, len(w) - 1, {_STRIDE})) AS s
      FROM wrds
    )
    SELECT doc_id,
           CAST(s // {_STRIDE} AS INTEGER)                    AS chunk_id,
           array_to_string(w[s + 1 : s + {_CHUNK}], ' ')      AS chunk_text,
           CAST(least({_CHUNK}, len(w) - s) AS INTEGER)       AS n_tokens
    FROM st
    """,
)
def q64_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-window chunking (size 40, stride 30 → 10-token overlap) — the
    context-window splitter of an LLM training pipeline. Expression-only
    until the explode: zero shuffles, chunks at parquet-scan speed."""
    from etl_jetro_spark.operators.chunking import chunk_tokens

    d = load(spark, sf_dir, "documents")
    return chunk_tokens(d, "doc_id", "text", chunk_size=_CHUNK, stride=_STRIDE)


@query(
    "q65_chunk_packing",
    f"""
    WITH wrds AS (
      SELECT doc_id, {{dk_words}} AS w FROM documents WHERE {{dk_norm}} <> ''
    ),
    st AS (
      SELECT doc_id, w, unnest(generate_series(0, len(w) - 1, {_STRIDE})) AS s
      FROM wrds
    ),
    ch AS (
      SELECT doc_id,
             CAST(s // {_STRIDE} AS INTEGER)              AS chunk_id,
             CAST(least({_CHUNK}, len(w) - s) AS INTEGER) AS n_tokens,
             doc_id % 8                                   AS shard
      FROM st
    )
    SELECT doc_id, chunk_id, shard, n_tokens,
           CAST((sum(n_tokens) OVER (
                    PARTITION BY shard ORDER BY doc_id, chunk_id
                    ROWS UNBOUNDED PRECEDING) - n_tokens) // 256 AS BIGINT)
             AS pack_id
    FROM ch
    """,
)
def q65_chunk_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: lay each shard's chunks end-to-end and assign every
    chunk the 256-token bin its first token falls in (offset packing, the
    concat-and-chunk strategy). Packing is per-shard by design — the window
    partitions on the shard key, so no task ever holds a global order."""
    from etl_jetro_spark.operators.chunking import chunk_tokens, pack_offsets

    d = load(spark, sf_dir, "documents")
    ch = chunk_tokens(
        d, "doc_id", "text", chunk_size=_CHUNK, stride=_STRIDE
    ).withColumn("shard", F.col("doc_id") % 8)
    out = pack_offsets(
        ch, "shard", ["doc_id", "chunk_id"], "n_tokens", budget=256
    )
    return out.select("doc_id", "chunk_id", "shard", "n_tokens", "pack_id")


def _pii_raw_spark(c: DataFrame) -> DataFrame:
    """Deterministic PII-bearing text derived from the customer table (the
    testdata has no natural PII): every customer gets an email, 1-in-3 get
    a +CC phone, 1-in-3 a bare local 3-3-4, 1-in-3 a parenthesized
    one; 1-in-4 an IPv4, 1-in-5 an SSN-shaped id."""
    k = F.col("c_custkey")
    email = F.concat(F.lit("user"), k.cast("string"), F.lit("@example.com"))
    area = F.lpad((k % 900 + 100).cast("string"), 3, "0")
    last4 = F.lpad((k % 10000).cast("string"), 4, "0")
    # three real-world phone shapes: +CC, bare local 3-3-4, parenthesized
    phone = (
        F.when(k % 3 == 0, F.concat(F.lit("+1-"), area, F.lit("-555-"), last4))
        .when(k % 3 == 1, F.concat(area, F.lit("-555-"), last4))
        .otherwise(F.concat(F.lit("("), area, F.lit(") 555-"), last4))
    )
    ip = F.when(
        k % 4 == 0,
        F.concat(
            F.lit("10.0."),
            (k % 256).cast("string"),
            F.lit("."),
            ((k * 7) % 256).cast("string"),
        ),
    ).otherwise(F.lit("none"))
    ssn = F.when(
        k % 5 == 0,
        F.concat(
            F.lpad((k % 900 + 100).cast("string"), 3, "0"),
            F.lit("-"),
            F.lpad((k % 90 + 10).cast("string"), 2, "0"),
            F.lit("-"),
            F.lpad((k % 10000).cast("string"), 4, "0"),
        ),
    ).otherwise(F.lit("none"))
    return c.select(
        "c_custkey",
        F.concat_ws(
            " ", F.col("c_name"), F.lit("contact"), email,
            F.lit("tel"), phone, F.lit("host"), ip, F.lit("id"), ssn,
        ).alias("raw"),
    )


def _pii_oracle_sql() -> str:
    from etl_jetro_spark.operators.pii import PII_PATTERNS

    counts = ",\n           ".join(
        "CAST(len(regexp_extract_all(raw, '(" + pat + ")', 1)) AS BIGINT)"
        f" AS n_{name}"
        for name, pat in PII_PATTERNS
    )
    red = "raw"
    for name, pat in PII_PATTERNS:
        red = f"regexp_replace({red}, '{pat}', '[{name.upper()}]', 'g')"
    return f"""
    WITH src AS (
      SELECT c_custkey,
             concat_ws(' ', c_name, 'contact',
               'user' || CAST(c_custkey AS VARCHAR) || '@example.com',
               'tel',
               CASE c_custkey % 3
                 WHEN 0 THEN
                   '+1-' || lpad(CAST(c_custkey % 900 + 100 AS VARCHAR), 3, '0')
                   || '-555-' || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')
                 WHEN 1 THEN
                   lpad(CAST(c_custkey % 900 + 100 AS VARCHAR), 3, '0')
                   || '-555-' || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')
                 ELSE
                   '(' || lpad(CAST(c_custkey % 900 + 100 AS VARCHAR), 3, '0')
                   || ') 555-' || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')
               END,
               'host',
               CASE WHEN c_custkey % 4 = 0 THEN
                 '10.0.' || CAST(c_custkey % 256 AS VARCHAR) || '.'
                 || CAST((c_custkey * 7) % 256 AS VARCHAR)
               ELSE 'none' END,
               'id',
               CASE WHEN c_custkey % 5 = 0 THEN
                 lpad(CAST(c_custkey % 900 + 100 AS VARCHAR), 3, '0') || '-'
                 || lpad(CAST(c_custkey % 90 + 10 AS VARCHAR), 2, '0') || '-'
                 || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')
               ELSE 'none' END) AS raw
      FROM customer
    )
    SELECT c_custkey,
           {counts},
           {red} AS redacted
    FROM src
    """


@query("q66_pii_scan", None)  # oracle attached below (built from PII_PATTERNS)
def q66_pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub over customer-derived text: per-class counts (email, ipv4,
    phone, ssn) + canonical-order redaction. The oracle runs the SAME
    pattern strings through DuckDB's RE2 — the patterns themselves are
    parity-checked, not a reimplementation. Expression-only scan."""
    from etl_jetro_spark.operators.pii import pii_scan

    c = load(spark, sf_dir, "customer")
    return pii_scan(_pii_raw_spark(c), "c_custkey", "raw")


ORACLES["q66_pii_scan"] = _pii_oracle_sql()


@query(
    "q67_ngram_repetition",
    f"""
    WITH {{sh2}},
    agg AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_ngrams,
             CAST(count(DISTINCT sh) AS BIGINT) AS n_distinct
      FROM sh GROUP BY doc_id
    )
    SELECT d.doc_id,
           coalesce(agg.n_ngrams, 0)   AS n_ngrams,
           coalesce(agg.n_distinct, 0) AS n_distinct,
           round(CASE WHEN coalesce(agg.n_ngrams, 0) > 0
                 THEN 1.0 - agg.n_distinct / CAST(agg.n_ngrams AS DOUBLE)
                 ELSE 0.0 END, 6)      AS dup_frac
    FROM documents d LEFT JOIN agg ON agg.doc_id = d.doc_id
    """,
)
def q67_ngram_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filter features: per-doc bigram dup fraction
    (1 - distinct/total). Counts on the exploded codegen shingle path —
    the HOF array walk is CodegenFallback and measured 51 s vs 1.4 s at
    sf0.1; shuffles carry (id, ints) only, never text."""
    from etl_jetro_spark.operators.textstats import ngram_repetition

    d = load(spark, sf_dir, "documents")
    return ngram_repetition(d, "doc_id", "text", n=2)


@query(
    "q68_tfidf_top_terms",
    f"""
    WITH toks AS (
      SELECT doc_id, unnest({{dk_words}}) AS token FROM documents
    ),
    tf AS (
      SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
      FROM toks WHERE token <> '' GROUP BY doc_id, token
    ),
    dfq AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY token),
    nd AS (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS n FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.token, tf.tf * (nd.n / dfq.df) AS score
      FROM tf JOIN dfq USING (token) CROSS JOIN nd
    ),
    rk AS (
      SELECT doc_id, token,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, token) AS rank
      FROM scored
    )
    SELECT doc_id, CAST(rank AS INTEGER) AS rank, token
    FROM rk WHERE rank <= 3
    """,
)
def q68_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 characteristic terms per doc by tf·idf with LINEAR idf (N/df):
    the score stays a product/quotient of exact integers, so the ranking is
    bit-deterministic cross-engine (log-idf would hang parity on libm).
    Integer/string output only — hash-safe."""
    from etl_jetro_spark.operators.textstats import tfidf_top_terms

    d = load(spark, sf_dir, "documents")
    # doc_id is the table primary key -> plain count for N, no distinct
    return tfidf_top_terms(d, "doc_id", "text", k=3, ids_unique=True)


@query(
    "q69_unigram_lm_score",
    f"""
    WITH toks AS (
      SELECT doc_id, unnest({{dk_words}}) AS token FROM documents
    ),
    t2 AS (SELECT * FROM toks WHERE token <> ''),
    cnt AS (SELECT token, CAST(count(*) AS BIGINT) AS cnt FROM t2 GROUP BY token),
    tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS total FROM cnt)
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
           round(avg(tot.total / cnt.cnt), 4) AS mean_inv_prob
    FROM t2 JOIN cnt USING (token) CROSS JOIN tot
    GROUP BY doc_id
    """,
)
def q69_unigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM fluency proxy: mean inverse corpus probability per doc
    (the perplexity stand-in without libm — every term is an exact IEEE
    division; only the per-doc mean is order-sensitive, rounded 4dp both
    sides). Corpus counts broadcast back to the token stream."""
    from etl_jetro_spark.operators.textstats import unigram_lm_scores

    d = load(spark, sf_dir, "documents")
    return unigram_lm_scores(d, "doc_id", "text", ndp=4)


@query(
    "q70_stratified_sample",
    """
    WITH r AS (
      SELECT doc_id, lang,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY md5('strat:' || CAST(doc_id AS VARCHAR)), doc_id
             ) AS rk,
             count(*) OVER (PARTITION BY lang) AS n
      FROM documents
    )
    SELECT doc_id, lang FROM r WHERE rk <= ceil(n * 0.2)
    """,
)
def q70_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-stratum 20% quota sample by md5 rank within language — the
    per-language rebalancing step of corpus curation. Same rows selected on
    any engine/partitioning (md5 ranking, doc_id tiebreak)."""
    from etl_jetro_spark.operators.sampling import stratified_sample

    d = load(spark, sf_dir, "documents")
    out = stratified_sample(d, "doc_id", "lang", 0.2, salt="strat:")
    return out.select("doc_id", "lang")


@query(
    "q71_quantize_embeddings",
    """
    WITH e AS (
      SELECT vec_id, generate_subscripts(embedding, 1) AS i,
             CAST(unnest(embedding) AS DOUBLE) AS x
      FROM embeddings
    ),
    sc AS (SELECT vec_id, max(abs(x)) / 127.0 AS scale FROM e GROUP BY vec_id),
    q AS (
      SELECT e.vec_id, e.i, e.x, sc.scale,
             CAST(round(CASE WHEN sc.scale > 0 THEN e.x / sc.scale
                             ELSE 0 END) AS INTEGER) AS qi
      FROM e JOIN sc USING (vec_id)
    )
    SELECT vec_id,
           any_value(scale)                                  AS scale,
           array_to_string(list(qi ORDER BY i), ',')         AS q_csv,
           round(sum((x - qi * scale) * (x - qi * scale)) / count(*), 9)
                                                             AS mse
    FROM q GROUP BY vec_id
    """,
)
def q71_quantize_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization of the embedding column (scale =
    max|v|/127) with reconstruction MSE — the compression step before an
    ANN index ships. Pure per-row expressions, no shuffle; the int8 vector
    is emitted as CSV so the parity gate hashes it exactly."""
    from etl_jetro_spark.operators.similarity import quantize_int8

    e = load(spark, sf_dir, "embeddings")
    return quantize_int8(e, "vec_id", "embedding", ndp=9)


# Substitute the shared SQL fragments into the round-2-extension oracles
# (kept as placeholders above so the query bodies stay readable).
for _qn in list(ORACLES):
    _sql = ORACLES[_qn]
    if "{dk_words}" in _sql or "{dk_norm}" in _sql or "{sh2}" in _sql:
        ORACLES[_qn] = (
            _sql.replace("{dk_words}", DK_WORDS)
            .replace("{dk_norm}", DK_NORM_TEXT)
            .replace("{sh2}", _dk_shingles_cte(2))
        )
del _qn, _sql


@query(
    "q72_decontamination",
    f"""
    WITH {_dk_shingles_cte(5)},
    ev AS (SELECT DISTINCT sh FROM sh WHERE doc_id < 10),
    tr AS (SELECT DISTINCT doc_id, sh FROM sh WHERE doc_id >= 10)
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shared
    FROM tr JOIN ev USING (sh)
    GROUP BY doc_id
    """,
)
def q72_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: training docs (doc_id >= 10) sharing any
    word 5-gram with the eval set (doc_id < 10). The eval shingle set is
    broadcast — the corpus side never shuffles; at 100 TB this is a pure
    scan + broadcast semi-join."""
    from etl_jetro_spark.operators.dedup import decontaminate

    d = load(spark, sf_dir, "documents")
    return decontaminate(
        d.filter(F.col("doc_id") >= 10), d.filter(F.col("doc_id") < 10),
        "doc_id", "text", n=5,
    )


@query(
    "q73_top_ngrams",
    f"""
    WITH {_dk_shingles_cte(2)}
    SELECT sh AS ngram, CAST(count(*) AS BIGINT) AS cnt
    FROM sh GROUP BY sh
    ORDER BY cnt DESC, ngram LIMIT 20
    """,
)
def q73_top_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 corpus bigrams (count desc, ngram asc tiebreak) — the corpus
    boilerplate-list builder. Map-side partial agg + TakeOrdered top-k."""
    from etl_jetro_spark.operators.dedup import top_ngrams

    d = load(spark, sf_dir, "documents")
    return top_ngrams(d, "doc_id", "text", n=2, k=20)


@query(
    "q74_incremental_dedup",
    f"""
    WITH fp AS (SELECT doc_id, md5({DK_NORM_TEXT}) AS f FROM documents),
    batch AS (
      SELECT doc_id, f FROM fp WHERE doc_id >= 400
      UNION ALL SELECT doc_id + 1000, f FROM fp WHERE doc_id < 50
      UNION ALL SELECT doc_id + 2000, f FROM fp
        WHERE doc_id >= 450 AND doc_id < 460
    ),
    seen AS (SELECT DISTINCT f FROM fp WHERE doc_id < 400),
    mins AS (SELECT f, CAST(min(doc_id) AS BIGINT) AS doc_id
             FROM batch GROUP BY f)
    SELECT doc_id, f AS fingerprint
    FROM mins WHERE NOT EXISTS (SELECT 1 FROM seen WHERE seen.f = mins.f)
    """,
)
def q74_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingestion dedup — the production corpus-update shape:
    a new batch (fresh docs + 50 re-crawled copies of already-seen docs +
    10 in-batch duplicate pairs, all planted deterministically) is deduped
    against ITSELF (min-id per fingerprint) and against the seen-corpus
    fingerprint INDEX (anti-join on 32-byte keys — the corpus text is
    never rescanned)."""
    from etl_jetro_spark.operators.dedup import exact_dedup, incremental_dedup

    d = load(spark, sf_dir, "documents")
    k = F.col("doc_id")
    fresh = d.filter(k >= 400).select("doc_id", "text")
    leaked = d.filter(k < 50).select((k + 1000).alias("doc_id"), "text")
    indup = d.filter((k >= 450) & (k < 460)).select(
        (k + 2000).alias("doc_id"), "text"
    )
    batch = fresh.unionByName(leaked).unionByName(indup)
    seen = exact_dedup(d.filter(k < 400), "doc_id", "text").select("fingerprint")
    return incremental_dedup(batch, seen, "doc_id", "text")


@query(
    "q75_keep_best_quality",
    f"""
    WITH feat AS (
      SELECT doc_id, lang, source,
             CAST(len(text) AS BIGINT) AS n_chars,
             CAST(CASE WHEN trim(text) = '' THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS INT) AS n_tokens,
             len(regexp_replace(text, '[^.,;:!?''"()\\[\\]-]', '', 'g')) AS n_punct,
             len(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digit,
             len(list_filter(string_split({DK_NORM_TEXT}, ' '),
                             x -> list_contains({_dk_stop_list('en')}, x))) AS n_stop
      FROM documents
    ),
    scored AS (
      SELECT doc_id, lang, source,
             round(least(n_tokens / 20.0, 1.0) * 0.4
                   + (1 - least(CAST(n_punct AS DOUBLE) / n_chars * 2
                                + CAST(n_digit AS DOUBLE) / n_chars * 2, 1.0)) * 0.3
                   + least(CAST(n_stop AS DOUBLE) / n_tokens * 4, 1.0) * 0.3, 6)
               AS quality_score
      FROM feat WHERE n_chars > 0 AND n_tokens > 0
    ),
    rk AS (
      SELECT lang, source, doc_id, quality_score,
             row_number() OVER (PARTITION BY lang, source
                                ORDER BY quality_score DESC, doc_id) AS r
      FROM scored
    )
    SELECT lang, source, doc_id, quality_score FROM rk WHERE r = 1
    """,
)
def q75_keep_best_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation representative pick: the single best-quality document per
    (lang, source) cell, arg-max via min-struct aggregation (one shuffle
    with map-side partials — no window sort touches the corpus). Ranking
    uses the ROUNDED quality score (deterministic cross-engine) with
    doc_id as total-order tiebreak."""
    from etl_jetro_spark.operators.dedup import keep_best_by

    d = load(spark, sf_dir, "documents")
    scored = O.quality_score(d, "text").filter(
        (F.col("q_n_chars") > 0) & (F.col("q_n_tokens") > 0)
    ).select("doc_id", "lang", "source", "quality_score")
    return keep_best_by(
        scored,
        ["lang", "source"],
        [(-F.col("quality_score")).alias("_negq"), F.col("doc_id").alias("_tid")],
        ["doc_id", "quality_score"],
    )


@query(
    "q76_pivot_returnflag",
    """
    SELECT l_suppkey,
           CAST(coalesce(sum(l_quantity) FILTER (WHERE l_returnflag = 'A'), 0)
                AS BIGINT) AS qty_A,
           CAST(coalesce(sum(l_quantity) FILTER (WHERE l_returnflag = 'N'), 0)
                AS BIGINT) AS qty_N,
           CAST(coalesce(sum(l_quantity) FILTER (WHERE l_returnflag = 'R'), 0)
                AS BIGINT) AS qty_R
    FROM lineitem GROUP BY l_suppkey
    """,
)
def q76_pivot_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long→wide pivot (the inverse of the engine's melt): per-supplier
    quantity by return flag through Spark's native ``groupBy().pivot()``
    with EXPLICIT pivot values — without them Spark runs an extra
    distinct-values job and the output schema becomes data-dependent, both
    wrong at scale. One shuffle (partial aggs per flag map-side)."""
    li = load(spark, sf_dir, "lineitem")
    out = (
        li.groupBy("l_suppkey")
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(F.sum("l_quantity"))
    )
    return out.select(
        "l_suppkey",
        *[
            F.coalesce(F.col(flag), F.lit(0)).cast("bigint").alias(f"qty_{flag}")
            for flag in ("A", "N", "R")
        ],
    )


@query(
    "q77_grouping_sets",
    """
    SELECT coalesce(r_name, '(all)') AS region,
           coalesce(n_name, '(all)') AS nation,
           CAST(count(*) AS BIGINT)  AS n_customers
    FROM customer
    JOIN nation ON n_nationkey = c_nationkey
    JOIN region ON r_regionkey = n_regionkey
    GROUP BY GROUPING SETS ((r_name, n_name), (r_name), ())
    """,
)
def q77_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-level aggregate in ONE pass (GROUPING SETS / rollup): customer
    counts by (region, nation), by region, and grand total — Spark's Expand
    emits one row per grouping set per input row before a single shuffle;
    three separate aggregations would scan and shuffle three times."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    j = c.join(
        bcast_small(n), n.n_nationkey == c.c_nationkey
    ).join(bcast_small(r), F.col("r_regionkey") == F.col("n_regionkey"))
    out = j.rollup("r_name", "n_name").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers")
    )
    return out.select(
        F.coalesce(F.col("r_name"), F.lit("(all)")).alias("region"),
        F.coalesce(F.col("n_name"), F.lit("(all)")).alias("nation"),
        "n_customers",
    )


@query(
    "q78_moving_average",
    """
    SELECT o_custkey, o_orderkey,
           round(avg(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS ma3
    FROM orders
    """,
)
def q78_moving_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-order trailing moving average of spend per customer — the windowed
    analytics shape (bounded ROWS frame; state is 3 rows per partition
    cursor). One shuffle on the partition key; the frame bound keeps
    memory O(frame), not O(partition)."""
    o = load(spark, sf_dir, "orders")
    from pyspark.sql import Window

    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, 0)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.avg("o_totalprice").over(w), 4).alias("ma3"),
    )


@query(
    "q79_fuzzy_name_match",
    """
    SELECT s_suppkey, s_name,
           CAST(levenshtein(lower(s_name), 'supplier#000000001') AS BIGINT)
             AS dist
    FROM supplier
    WHERE levenshtein(lower(s_name), 'supplier#000000001') <= 3
    """,
)
def q79_fuzzy_name_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy entity matching by edit distance (native ``levenshtein`` in
    both engines — JVM codegen, no UDF): suppliers within distance 3 of a
    probe name. The classic record-linkage primitive; at scale the probe
    side is a broadcast dim and the distance is a post-join filter."""
    s = load(spark, sf_dir, "supplier")
    d = F.levenshtein(F.lower(F.col("s_name")), F.lit("supplier#000000001"))
    return (
        s.select("s_suppkey", "s_name", d.cast("bigint").alias("dist"))
        .filter(F.col("dist") <= 3)
    )


# --------------------------------------------------------------------------
# 12. Time-series regularization, CDC, data quality, event analytics
#     (round 2 extension: operators/timeseries.py, cdc.py, profile.py)
# --------------------------------------------------------------------------

_HOURLY_CTE = """
    WITH hourly AS (
      SELECT user_id,
             (CAST(floor(epoch(ts)) AS BIGINT) // 3600) * 3600 AS hour_epoch,
             round(sum(value), 4) AS v
      FROM events GROUP BY 1, 2),
    bounds AS (
      SELECT user_id, min(hour_epoch) AS mn, max(hour_epoch) AS mx
      FROM hourly GROUP BY 1),
    spine AS (
      SELECT user_id, unnest(generate_series(mn, mx, 3600)) AS hour_epoch
      FROM bounds),
    j AS (
      SELECT s.user_id, s.hour_epoch, h.v
      FROM spine s LEFT JOIN hourly h USING (user_id, hour_epoch))
"""


def _hourly_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_jetro_spark.operators.timeseries import time_bucket

    e = load_events(spark, sf_dir)
    sec = F.expr("ts div 1000000000")
    return e.groupBy(
        "user_id", time_bucket(sec, 3600).alias("hour_epoch")
    ).agg(F.round(F.sum("value"), 4).alias("v"))


@query(
    "q80_gap_fill_locf",
    _HOURLY_CTE
    + """
    SELECT user_id, hour_epoch,
           last_value(v IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY hour_epoch
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled
    FROM j
    """,
)
def q80_gap_fill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense hourly series per user with last-observation-carried-forward
    fill (operators/timeseries.gap_fill_locf): sequence+explode spine
    (partition-local generation), one window pass with O(1) running
    state. The regularization step ahead of any rolling feature."""
    from etl_jetro_spark.operators.timeseries import gap_fill_locf

    hourly = _hourly_buckets(spark, sf_dir)
    return gap_fill_locf(
        hourly, ["user_id"], "hour_epoch", "v", 3600, out_col="v_filled"
    )


@query(
    "q81_gap_fill_linear",
    _HOURLY_CTE
    + """
    , w AS (
      SELECT user_id, hour_epoch, v,
             last_value(CAST(round(v * 10000) AS BIGINT) IGNORE NULLS)
               OVER wpre AS pv,
             last_value(CASE WHEN v IS NOT NULL THEN hour_epoch END IGNORE NULLS)
               OVER wpre AS pb,
             first_value(CAST(round(v * 10000) AS BIGINT) IGNORE NULLS)
               OVER wfol AS nv,
             first_value(CASE WHEN v IS NOT NULL THEN hour_epoch END IGNORE NULLS)
               OVER wfol AS nb
      FROM j
      WINDOW wpre AS (PARTITION BY user_id ORDER BY hour_epoch
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wfol AS (PARTITION BY user_id ORDER BY hour_epoch
                      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
    SELECT user_id, hour_epoch,
           CASE WHEN v IS NOT NULL
                  THEN CAST(CAST(round(v * 10000) AS BIGINT) AS DOUBLE) / 10000.0
                WHEN nv IS NULL THEN CAST(pv AS DOUBLE) / 10000.0
                WHEN pv IS NULL THEN CAST(nv AS DOUBLE) / 10000.0
                ELSE CAST(pv * (nb - hour_epoch) + nv * (hour_epoch - pb)
                          AS DOUBLE)
                     / CAST(nb - pb AS DOUBLE) / 10000.0 END AS v_interp
    FROM w
    """,
)
def q81_gap_fill_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation over the same dense spine
    (operators/timeseries.gap_fill_linear): both directions are RUNNING
    window frames sharing one exchange (asc + desc sorts) — never an
    unbounded-FOLLOWING frame, which Spark executes O(n²) per key.
    Fixed-point mode (scale=10000) keeps the interpolated doubles
    bit-identical across engines — plain double math can land on decimal
    rounding boundaries where Spark's and DuckDB's round() disagree."""
    from etl_jetro_spark.operators.timeseries import gap_fill_linear

    hourly = _hourly_buckets(spark, sf_dir)
    return gap_fill_linear(
        hourly,
        ["user_id"],
        "hour_epoch",
        "v",
        3600,
        out_col="v_interp",
        scale=10_000,
    )


@query(
    "q82_scd2_history",
    """
    WITH log AS (
      SELECT o_custkey, o_orderstatus,
             CAST(floor(epoch(o_orderdate)) AS BIGINT) AS eff, o_orderkey
      FROM orders),
    marked AS (
      SELECT *, lag(o_orderstatus) OVER w AS prev FROM log
      WINDOW w AS (PARTITION BY o_custkey ORDER BY eff, o_orderkey)),
    changes AS (
      SELECT * FROM marked WHERE prev IS NULL OR prev <> o_orderstatus)
    SELECT o_custkey, o_orderstatus AS status, eff AS eff_from,
           lead(eff) OVER w AS eff_to,
           CAST(lead(eff) OVER w IS NULL AS INT) AS is_current
    FROM changes
    WINDOW w AS (PARTITION BY o_custkey ORDER BY eff, o_orderkey)
    """,
)
def q82_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 dimension history from an append-only change log
    (operators/cdc.scd2_from_log): consecutive same-status orders per
    customer collapse into versions with [eff_from, eff_to) ranges and an
    is_current flag. Lag + lead share one (key, order) shuffle+sort."""
    from etl_jetro_spark.functions.dates import epoch_seconds_ntz
    from etl_jetro_spark.operators.cdc import scd2_from_log

    o = load(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderstatus",
        epoch_seconds_ntz("o_orderdate").alias("eff"),
        "o_orderkey",
    )
    hist = scd2_from_log(
        o, ["o_custkey"], "o_orderstatus", ["eff", "o_orderkey"], "eff"
    )
    return hist.select(
        "o_custkey",
        F.col("o_orderstatus").alias("status"),
        "eff_from",
        "eff_to",
        "is_current",
    )


@query(
    "q83_cdc_apply",
    """
    WITH ranked AS (
      SELECT user_id,
             CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
             value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY epoch_ns(ts) DESC, event_id DESC) AS rn
      FROM events)
    SELECT user_id, round(value, 4) AS cur_value
    FROM ranked WHERE rn = 1 AND op <> 'D'
    """,
)
def q83_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog→snapshot compaction (operators/cdc.apply_changelog):
    latest-wins upsert per key, delete-wins when the final op is a
    delete ('error' events model deletes). One max_by argmax shuffle —
    no window sort, partials combine map-side."""
    from etl_jetro_spark.operators.cdc import apply_changelog

    e = load_events(spark, sf_dir).select(
        "user_id",
        F.when(F.col("event_type") == "error", "D").otherwise("U").alias("op"),
        "ts",
        "event_id",
        "value",
    )
    cur = apply_changelog(
        e, ["user_id"], "op", ["ts", "event_id"], ["value"]
    )
    return cur.select("user_id", F.round("value", 4).alias("cur_value"))


@query(
    "q84_table_profile",
    """
    SELECT 'o_orderkey' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
           CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
           round(min(CAST(o_orderkey AS DOUBLE)), 4) AS min_num,
           round(max(CAST(o_orderkey AS DOUBLE)), 4) AS max_num,
           CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
    FROM orders
    UNION ALL
    SELECT 'o_custkey', CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(count(DISTINCT o_custkey) AS BIGINT),
           round(min(CAST(o_custkey AS DOUBLE)), 4),
           round(max(CAST(o_custkey AS DOUBLE)), 4),
           NULL, NULL
    FROM orders
    UNION ALL
    SELECT 'o_totalprice', CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(count(DISTINCT o_totalprice) AS BIGINT),
           round(min(o_totalprice), 4), round(max(o_totalprice), 4),
           NULL, NULL
    FROM orders
    UNION ALL
    SELECT 'o_orderdate', CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(count(DISTINCT o_orderdate) AS BIGINT),
           round(min(CAST(floor(epoch(o_orderdate)) AS DOUBLE)), 4),
           round(max(CAST(floor(epoch(o_orderdate)) AS DOUBLE)), 4),
           NULL, NULL
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(count(DISTINCT o_orderstatus) AS BIGINT),
           CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
           min(o_orderstatus), max(o_orderstatus)
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority', CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(count(DISTINCT o_orderpriority) AS BIGINT),
           CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
           min(o_orderpriority), max(o_orderpriority)
    FROM orders
    """,
)
def q84_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass per-column table profile (operators/profile.profile_table):
    nulls, exact distinct cardinality, bounds — a single aggregation whose
    multi-column distincts ride Spark's Expand (one shuffle), long form
    via a literal-struct explode over the 1-row aggregate."""
    from etl_jetro_spark.operators.profile import profile_table

    o = load(spark, sf_dir, "orders")
    return profile_table(
        o,
        numeric_cols=["o_orderkey", "o_custkey", "o_totalprice"],
        string_cols=["o_orderstatus", "o_orderpriority"],
        epoch_cols=["o_orderdate"],
    )


@query(
    "q85_constraint_checks",
    """
    SELECT 'li_qty_nonpositive' AS rule,
           CAST(sum(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS violations
    FROM lineitem
    UNION ALL
    SELECT 'li_price_negative',
           CAST(sum(CASE WHEN l_extendedprice < 0 THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'li_null_orderkey',
           CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'li_discount_range',
           CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 ELSE 0 END)
                AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'li_pk_dup_rows', CAST(coalesce(sum(c - 1), 0) AS BIGINT)
    FROM (SELECT count(*) AS c FROM lineitem GROUP BY l_orderkey, l_linenumber)
    UNION ALL
    SELECT 'li_orphan_orderkey', CAST(count(*) AS BIGINT)
    FROM lineitem l
    WHERE l_orderkey IS NOT NULL
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
    """,
)
def q85_constraint_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality rules with violation counts
    (operators/profile.check_rows/check_unique/check_foreign_key): all
    row predicates share ONE conditional-sum scan; PK uniqueness is one
    groupBy counting excess rows; referential integrity is a left-anti
    join (unbroadcast here — fact⋈fact shape at 100 TB)."""
    from etl_jetro_spark.operators.profile import (
        RowRule,
        check_foreign_key,
        check_rows,
        check_unique,
        run_checks,
    )

    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    rows = check_rows(
        li,
        [
            RowRule("li_qty_nonpositive", F.col("l_quantity") <= 0),
            RowRule("li_price_negative", F.col("l_extendedprice") < 0),
            RowRule("li_null_orderkey", F.col("l_orderkey").isNull()),
            RowRule(
                "li_discount_range",
                (F.col("l_discount") < 0) | (F.col("l_discount") > 1),
            ),
        ],
    )
    uniq = check_unique(li, ["l_orderkey", "l_linenumber"], "li_pk_dup_rows")
    fk = check_foreign_key(
        li,
        ["l_orderkey"],
        o,
        ["o_orderkey"],
        "li_orphan_orderkey",
        broadcast_parent=False,
    )
    return run_checks(rows, uniq, fk)


@query(
    "q86_cohort_retention",
    """
    WITH e AS (
      SELECT user_id,
             (CAST(floor(epoch(ts)) AS BIGINT) // 86400) * 86400 AS p
      FROM events),
    f AS (SELECT user_id, min(p) AS cohort FROM e GROUP BY 1)
    SELECT cohort AS cohort_period, (e.p - cohort) // 86400 AS periods_since,
           CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
    FROM e JOIN f USING (user_id)
    GROUP BY 1, 2
    """,
)
def q86_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily retention triangle (operators/timeseries.cohort_retention):
    first-seen min-agg per user, cohort join (user→cohort is a compact
    dim at any scale), count-distinct per (cohort, offset)."""
    from etl_jetro_spark.operators.timeseries import cohort_retention

    e = load_events(spark, sf_dir)
    sec = F.expr("ts div 1000000000")
    out = cohort_retention(e, "user_id", sec, 86400)
    return out.select(
        "cohort_period",
        "periods_since",
        F.col("n_users").cast("bigint").alias("n_users"),
    )


@query(
    "q87_funnel",
    """
    WITH s1 AS (
      SELECT user_id, min(epoch_ns(ts)) AS t FROM events
      WHERE event_type = 'signup' GROUP BY 1),
    s2 AS (
      SELECT e.user_id, min(epoch_ns(e.ts)) AS t
      FROM events e JOIN s1 USING (user_id)
      WHERE e.event_type = 'click' AND epoch_ns(e.ts) > s1.t GROUP BY 1),
    s3 AS (
      SELECT e.user_id, min(epoch_ns(e.ts)) AS t
      FROM events e JOIN s2 USING (user_id)
      WHERE e.event_type = 'purchase' AND epoch_ns(e.ts) > s2.t GROUP BY 1)
    SELECT 1 AS step, 'signup' AS event_type,
           CAST(count(*) AS BIGINT) AS n_users FROM s1
    UNION ALL
    SELECT 2, 'click', CAST(count(*) AS BIGINT) FROM s2
    UNION ALL
    SELECT 3, 'purchase', CAST(count(*) AS BIGINT) FROM s3
    """,
)
def q87_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered signup→click→purchase funnel in ONE lazy plan
    (operators/timeseries.funnel_df): per-user time-sorted fold resolves
    each step's earliest strictly-after reach time; the event stream is
    filtered to funnel types BEFORE the user shuffle."""
    from etl_jetro_spark.operators.timeseries import funnel_df

    e = load_events(spark, sf_dir)
    return funnel_df(
        e, "user_id", "ts", "event_type", ["signup", "click", "purchase"]
    )


@query(
    "q88_value_histogram",
    """
    SELECT CAST(floor((value - 0.0) / 25.0) AS BIGINT) AS bucket,
           round(CAST(floor((value - 0.0) / 25.0) AS BIGINT) * 25.0, 4) AS lo,
           CAST(count(*) AS BIGINT) AS n
    FROM events WHERE value IS NOT NULL
    GROUP BY 1
    """,
)
def q88_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width value histogram (operators/timeseries.value_histogram):
    pure projection + partial-agg count; output cardinality is
    range/width regardless of row count."""
    from etl_jetro_spark.operators.timeseries import value_histogram

    e = load_events(spark, sf_dir)
    return value_histogram(e, "value", 25.0)


@query(
    "q89_snapshot_diff",
    """
    WITH a AS (SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders),
    b AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 89 = 0 THEN o_totalprice + 1
                  ELSE o_totalprice END AS o_totalprice,
             o_orderstatus
      FROM orders WHERE o_orderkey % 97 <> 0
      UNION ALL
      SELECT o_orderkey + 100000000, o_totalprice, o_orderstatus
      FROM orders WHERE o_orderkey % 101 = 0),
    d AS (
      SELECT CASE WHEN a.o_orderkey IS NULL THEN 'added'
                  WHEN b.o_orderkey IS NULL THEN 'removed'
                  WHEN a.o_totalprice IS NOT DISTINCT FROM b.o_totalprice
                   AND a.o_orderstatus IS NOT DISTINCT FROM b.o_orderstatus
                    THEN 'unchanged'
                  ELSE 'changed' END AS diff_status
      FROM a FULL OUTER JOIN b ON a.o_orderkey = b.o_orderkey)
    SELECT diff_status, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY 1
    """,
)
def q89_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation (operators/reconcile.diff_summary): classify
    every key of a mutated snapshot (deterministic synthetic deletes %97,
    updates %89, inserts %101) as added/removed/changed/unchanged via ONE
    full-outer join with null-safe column comparison; at 100 TB pass
    hash_compare=True so the shuffle carries 8-byte digests, not rows."""
    from etl_jetro_spark.operators.reconcile import diff_summary

    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    k = F.col("o_orderkey")
    b = (
        o.filter(k % 97 != 0)
        .withColumn(
            "o_totalprice",
            F.when(k % 89 == 0, F.col("o_totalprice") + 1).otherwise(
                F.col("o_totalprice")
            ),
        )
        .unionByName(
            o.filter(k % 101 == 0).select(
                (k + 100000000).alias("o_orderkey"),
                "o_totalprice",
                "o_orderstatus",
            )
        )
    )
    return diff_summary(
        o, b, ["o_orderkey"], ["o_totalprice", "o_orderstatus"]
    )


# --------------------------------------------------------------------------
# 15. Incremental maintenance, interval analytics, rank surface, JSON
# --------------------------------------------------------------------------

@query(
    "q90_incremental_agg_merge",
    """
    SELECT o_custkey,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 4)
             AS total_spend,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
                * 100 // count(*) AS BIGINT) AS avg_spend_e4
    FROM orders GROUP BY 1
    """,
)
def q90_incremental_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance
    (operators/aggregate.partial_sums + merge_partials): history (orders
    before 1997) is aggregated ONCE into algebraic partials; the delta
    batch re-aggregates alone and merges by key. The oracle recomputes
    from scratch — proving merge-of-partials is lossless. At 100 TB the
    daily refresh touches only the delta plus one merge over
    distinct-key-cardinality partial rows."""
    from etl_jetro_spark.operators.aggregate import merge_partials, partial_sums

    o = load(spark, sf_dir, "orders")
    cut = F.lit("1997-01-01").cast("date")
    # decimal partials: sum is EXACT, so merge-of-partials is bit-identical
    # to from-scratch on any engine; the fixed-point avg (1e-4 units,
    # integer floor division) dodges double-rounding boundary disagreements
    v = F.col("o_totalprice").cast("decimal(18,2)")
    base = partial_sums(o.filter(F.col("o_orderdate") < cut), ["o_custkey"], v)
    delta = partial_sums(o.filter(F.col("o_orderdate") >= cut), ["o_custkey"], v)
    m = merge_partials([base, delta], ["o_custkey"])
    return m.select(
        "o_custkey",
        F.round(F.col("psum").cast("double"), 4).alias("total_spend"),
        F.col("pcnt").alias("n_orders"),
        F.expr("CAST(psum * 100 AS BIGINT) * 100 div pcnt").alias("avg_spend_e4"),
    )


@query(
    "q91_interval_overlap",
    """
    WITH iv AS (
      SELECT o_custkey, o_orderkey,
             CAST(floor(epoch(o_orderdate)) AS BIGINT) AS s,
             CAST(floor(epoch(o_orderdate)) AS BIGINT)
               + CAST(substr(o_orderpriority, 1, 1) AS BIGINT) * 604800 AS e
      FROM orders)
    SELECT a.o_custkey,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(least(a.e, b.e) - greatest(a.s, b.s)) AS BIGINT)
             AS overlap_s
    FROM iv a JOIN iv b
      ON a.o_custkey = b.o_custkey AND a.o_orderkey < b.o_orderkey
     AND a.s <= b.e AND b.s <= a.e
    GROUP BY 1
    """,
)
def q91_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal-overlap self-join (operators/rangejoin.interval_overlap_join):
    per-customer order-activity intervals ([orderdate, +priority weeks])
    that overlap in time, aggregated to pair count + total overlap
    seconds. Intervals explode to the 5-week buckets they span, pairs
    equi-join on (key, bucket), and each pair is kept only in the bucket
    of greatest(start) — exact, no distinct, never per-key cartesian.
    The oracle is the naive theta join DuckDB can afford at sf0.01."""
    from etl_jetro_spark.functions.dates import epoch_seconds_ntz
    from etl_jetro_spark.operators.rangejoin import interval_overlap_join

    WEEK = 604_800
    o = load(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        epoch_seconds_ntz(F.col("o_orderdate").cast("timestamp_ntz")).alias("s"),
        (
            epoch_seconds_ntz(F.col("o_orderdate").cast("timestamp_ntz"))
            + F.substring("o_orderpriority", 1, 1).cast("long") * WEEK
        ).alias("e"),
    )
    pairs = interval_overlap_join(
        o, o, ["o_custkey"], "s", "e", bucket_width=5 * WEEK
    ).filter(F.col("o_orderkey_a") < F.col("o_orderkey_b"))
    return pairs.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(
            F.least("e_a", "e_b") - F.greatest("s_a", "s_b")
        ).alias("overlap_s"),
    )


@query(
    "q92_revenue_deciles",
    f"""
    WITH rev AS (
      SELECT o_custkey, {sql_exact_money_sum('o_totalprice')} AS revenue
      FROM orders GROUP BY 1)
    SELECT o_custkey, revenue,
           CAST(ntile(10) OVER w AS BIGINT)      AS decile,
           round(percent_rank() OVER w, 6)       AS pct_rank,
           round(cume_dist() OVER w, 6)          AS cume
    FROM rev
    WINDOW w AS (ORDER BY revenue DESC, o_custkey)
    """,
)
def q92_revenue_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-rank surface: ntile / percent_rank / cume_dist over
    per-customer revenue, computed from the distributed rank frame
    (:func:`operators.aggregate.group_ranked` — range-partitioned
    parallel sort, metadata-sized offsets broadcast; round-4 verdict ask
    #7: no SinglePartition window anywhere in the plan). The total order
    is (revenue DESC, o_custkey ASC) — tie-free, so ``percent_rank =
    (rn-1)/(n-1)``, ``cume_dist = rn/n``, and ``ntile(10)`` is the exact
    SQL bucketing: the first ``n mod 10`` buckets take ``n div 10 + 1``
    rows, the rest ``n div 10``."""
    from etl_jetro_spark.operators.aggregate import group_ranked

    o = load(spark, sf_dir, "orders")
    rev = o.groupBy("o_custkey").agg(
        M.exact_money_sum("o_totalprice").alias("revenue")
    )
    r = group_ranked(rev, [], -F.col("revenue"), tiebreak=["o_custkey"])
    n, rn = F.col("_n"), F.col("_rn")
    decile = _ntile_from_rank(rn, n, 10)
    return r.select(
        "o_custkey",
        (-F.col("_v")).alias("revenue"),
        decile.alias("decile"),
        F.round(
            F.when(n > 1, (rn - 1) / (n - 1)).otherwise(F.lit(0.0)), 6
        ).alias("pct_rank"),
        F.round(rn / n, 6).alias("cume"),
    )


@query(
    "q93_json_props",
    """
    SELECT event_type,
           CAST(count(*) AS BIGINT)                          AS n,
           CAST(sum(CAST(props->>'k' AS BIGINT)) AS BIGINT)  AS sum_k,
           round(avg(CAST(props->>'k' AS BIGINT)), 4)        AS avg_k
    FROM events
    GROUP BY 1
    """,
)
def q93_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured JSON extraction: pull a typed field out of the
    events.props JSON string and aggregate. ``get_json_object`` runs
    JVM-side inside codegen (no Python boundary); at 100 TB prefer
    parsing ONCE into a struct column (``from_json`` at ingest) over
    repeated per-query path extraction."""
    e = load_events(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("long")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(k).alias("sum_k"),
        F.round(F.avg(k), 4).alias("avg_k"),
    )


@query(
    "q94_approx_distinct_check",
    """
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact,
           CAST(1 AS BOOLEAN) AS within_5pct
    FROM events GROUP BY 1
    """,
)
def q94_approx_distinct_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ cardinality under the oracle gate: the sketch value
    itself isn't engine-portable, so the DECLARED output is the exact
    count plus a boolean asserting the sketch landed within 5% (2.5x the
    configured 2% rsd) — DuckDB recomputes the exact side and expects the
    bound to hold. At 100 TB approx_count_distinct is the only affordable
    distinct: register merges are tiny, order-insensitive, and exact
    count-distinct's Expand shuffle disappears."""
    e = load_events(spark, sf_dir)
    agg = e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_exact"),
        F.approx_count_distinct("user_id", rsd=0.02).alias("n_approx"),
    )
    return agg.select(
        "event_type",
        "n_exact",
        (
            F.abs(F.col("n_approx") - F.col("n_exact"))
            <= 0.05 * F.col("n_exact")
        ).alias("within_5pct"),
    )


@query(
    "q95_salted_dim_join",
    """
    SELECT c.c_nationkey,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100
                          AS BIGINT)) AS BIGINT) AS revenue_cents
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY 1
    """,
)
def q95_salted_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-proof fact⋈dim join (operators/skew.salted_broadcast_join):
    the dim replicates x8 salts, the fact salts uniformly, so no task
    owns a hot customer even when one key is half the fact table. The
    oracle is the PLAIN join — salting must not change a single row.
    Revenue in exact integer cents (decimal, not float-sum)."""
    from etl_jetro_spark.operators.skew import salted_broadcast_join

    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    j = salted_broadcast_join(
        o.withColumnRenamed("o_custkey", "c_custkey"), c, "c_custkey"
    )
    return j.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(
            (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
        ).cast("long").alias("revenue_cents"),
    )


_Q96_ORACLE = """
    WITH k AS (
      SELECT (((((xb) >> 0) & 1) << 0) | ((((yb) >> 0) & 1) << 1) | ((((xb) >> 1) & 1) << 2) | ((((yb) >> 1) & 1) << 3) | ((((xb) >> 2) & 1) << 4) | ((((yb) >> 2) & 1) << 5) | ((((xb) >> 3) & 1) << 6) | ((((yb) >> 3) & 1) << 7) | ((((xb) >> 4) & 1) << 8) | ((((yb) >> 4) & 1) << 9) | ((((xb) >> 5) & 1) << 10) | ((((yb) >> 5) & 1) << 11) | ((((xb) >> 6) & 1) << 12) | ((((yb) >> 6) & 1) << 13) | ((((xb) >> 7) & 1) << 14) | ((((yb) >> 7) & 1) << 15) | ((((xb) >> 8) & 1) << 16) | ((((yb) >> 8) & 1) << 17) | ((((xb) >> 9) & 1) << 18) | ((((yb) >> 9) & 1) << 19)) AS zkey
      FROM (SELECT o_custkey % 1024 AS xb,
                   (CAST(floor(epoch(o_orderdate)) AS BIGINT) // 86400) % 1024
                     AS yb
            FROM orders))
    SELECT CAST(zkey >> 12 AS BIGINT) AS tile, CAST(count(*) AS BIGINT) AS n
    FROM k GROUP BY 1
"""


@query("q96_zorder_tiles", _Q96_ORACLE)
def q96_zorder_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustering key (operators/layout.morton_key): interleave
    customer and order-day bits, count rows per 64-key Z-tile. The oracle
    evaluates the IDENTICAL generated bit-interleave SQL in DuckDB —
    bit-for-bit key parity. zorder_repartition uses this key to give
    every parquet file a tight 2-D bounding box (see
    test_zorder_layout_bounding_boxes for the min/max-stat pruning
    evidence); pure projection + one partial agg here."""
    from etl_jetro_spark.operators.layout import morton_key

    o = load(spark, sf_dir, "orders").select(
        (F.col("o_custkey") % 1024).alias("xb"),
        (F.unix_date(F.col("o_orderdate").cast("date")) % 1024)
        .cast("long")
        .alias("yb"),
    )
    k = o.select(morton_key("xb", "yb", 10).alias("zkey"))
    return k.groupBy(
        F.shiftright("zkey", 12).cast("long").alias("tile")
    ).agg(F.count(F.lit(1)).alias("n"))


_Q97_ORACLE = """
    WITH h AS (
      SELECT doc_id, source,
             CAST(substr(source, 4) AS BIGINT) AS src_num,
             md5('mix:' || CAST(doc_id AS VARCHAR)) AS hx
      FROM documents),
    b AS (
      SELECT source, src_num,
             ((strpos('0123456789abcdef', substr(hx, 1, 1)) - 1) * 268435456
            + (strpos('0123456789abcdef', substr(hx, 2, 1)) - 1) * 16777216
            + (strpos('0123456789abcdef', substr(hx, 3, 1)) - 1) * 1048576
            + (strpos('0123456789abcdef', substr(hx, 4, 1)) - 1) * 65536
            + (strpos('0123456789abcdef', substr(hx, 5, 1)) - 1) * 4096
            + (strpos('0123456789abcdef', substr(hx, 6, 1)) - 1) * 256
            + (strpos('0123456789abcdef', substr(hx, 7, 1)) - 1) * 16
            + (strpos('0123456789abcdef', substr(hx, 8, 1)) - 1) * 1) % 10000 AS bkt
      FROM h),
    k AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS n_total,
             CAST(sum(CASE WHEN bkt < CAST(((src_num % 5) + 1) * 0.2 * 10000
                                      AS BIGINT)
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
      FROM b GROUP BY 1)
    SELECT source, n_total, n_kept FROM k
"""


@query("q97_weighted_mixing_sample", _Q97_ORACLE)
def q97_weighted_mixing_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixing weighted sample (operators/sampling.weighted_hash_sample):
    each source keeps a deterministic hash-Bernoulli fraction given by its
    mixing weight ((src_num % 5 + 1) x 0.2) — reproducible on any
    cluster/partitioning, pure expression filter, no shuffle before the
    count. The oracle recomputes the md5 buckets digit-by-digit and the
    same weight rule."""
    from etl_jetro_spark.operators.sampling import weighted_hash_sample

    d = load(spark, sf_dir, "documents").withColumn(
        "w",
        ((F.substring("source", 4, 10).cast("long") % 5) + 1) * 0.2,
    )
    kept = weighted_hash_sample(d, "doc_id", "w", salt="mix:").groupBy(
        "source"
    ).agg(F.count(F.lit(1)).alias("n_kept"))
    totals = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_total"))
    return totals.join(kept, "source", "left").select(
        "source",
        "n_total",
        F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
    )


@query(
    "q98_small_qty_revenue",
    """
    SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
                      AS DOUBLE) / 7.0, 2) AS avg_yearly,
           CAST(count(*) AS BIGINT) AS n_small
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_size <= 5
      AND l.l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
                          FROM lineitem l2
                          WHERE l2.l_partkey = p.p_partkey)
    """,
)
def q98_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape — CORRELATED SCALAR SUBQUERY (small-quantity order
    revenue): revenue from line items below 20% of their part's average
    quantity. Declared in SQL so Catalyst's decorrelation rewrites the
    per-row subquery into one per-part aggregate + join — the plan shows
    a single lineitem re-scan aggregated by partkey, never a per-row
    lookup. Exact decimal sum; /7 at the end (the TPC-H convention)."""
    for t in ("lineitem", "part"):
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(
        """
        SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
                          AS DOUBLE) / 7.0, 2) AS avg_yearly,
               CAST(count(*) AS BIGINT) AS n_small
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_size <= 5
          AND l.l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
                              FROM lineitem l2
                              WHERE l2.l_partkey = p.p_partkey)
        """
    )


@query(
    "q99_hierarchy_rollup",
    """
    WITH RECURSIVE walk(node, root, depth, val) AS (
      SELECT p_partkey, p_partkey, 0,
             CAST(p_retailprice AS DECIMAL(18,2))
      FROM part WHERE p_partkey = 1
      UNION ALL
      SELECT p.p_partkey, w.root, w.depth + 1,
             CAST(p.p_retailprice AS DECIMAL(18,2))
      FROM part p JOIN walk w ON (p.p_partkey // 2) = w.node
      WHERE p.p_partkey > 1)
    SELECT depth,
           CAST(count(*) AS BIGINT) AS n_nodes,
           round(CAST(sum(val) AS DOUBLE), 2) AS sum_price
    FROM walk GROUP BY 1
    """,
)
def q99_hierarchy_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RECURSIVE CTE — hierarchy walk over the implicit binary tree
    parent(k) = k div 2 on part keys, rolling up node count and price
    per depth. Spark 4's WITH RECURSIVE executes as iterative joins
    (one shuffle per level, ~log2(N) levels); each level's frontier is
    the only state carried forward, so the pattern scales to deep
    hierarchies without a driver loop. DuckDB runs the same recursion
    (`//` for `div`)."""
    for t in ("part",):
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(
        """
        WITH RECURSIVE walk(node, root, depth, val) AS (
          SELECT p_partkey, p_partkey, 0,
                 CAST(p_retailprice AS DECIMAL(18,2))
          FROM part WHERE p_partkey = 1
          UNION ALL
          SELECT p.p_partkey, w.root, w.depth + 1,
                 CAST(p.p_retailprice AS DECIMAL(18,2))
          FROM part p JOIN walk w ON (p.p_partkey div 2) = w.node
          WHERE p.p_partkey > 1)
        SELECT depth,
               CAST(count(*) AS BIGINT) AS n_nodes,
               round(CAST(sum(val) AS DOUBLE), 2) AS sum_price
        FROM walk GROUP BY 1
        """
    )


_Q100_SQL = """
    SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM supplier s JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    WHERE l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > l1.l_shipdate)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 10
"""


@query("q100_waiting_suppliers", _Q100_SQL)
def q100_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape — EXISTS + NOT EXISTS decorrelation: suppliers
    whose returned line was the LAST to ship on a multi-supplier order.
    Catalyst rewrites the correlated EXISTS into a left-semi and the NOT
    EXISTS into a left-anti join on l_orderkey — set-joins over the
    shared order key, never a per-row probe. The top-10 carries a full
    deterministic tiebreak (numwait DESC, s_name) so LIMIT is
    engine-stable."""
    for t in ("supplier", "lineitem"):
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_Q100_SQL)


@query(
    "q101_group_percentiles",
    """
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.5), 4)  AS p50,
           round(quantile_cont(l_extendedprice, 0.95), 4) AS p95,
           CAST(1 AS BOOLEAN) AS approx_within_2pct
    FROM lineitem GROUP BY 1
    """,
)
def q101_group_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group percentiles via the distributed two-pass rank
    formulation (external sort + rank lookup — NO per-group multiset
    buffering; linear interpolation matches DuckDB's quantile_cont),
    PLUS the approx_percentile sketch's 2% relative-error bound asserted
    under the oracle, q94 style. The sketch agg joins back on the group
    key (3 groups — broadcast)."""
    from etl_jetro_spark.operators.aggregate import exact_group_percentiles

    li = load(spark, sf_dir, "lineitem")
    exact = exact_group_percentiles(
        li, ["l_returnflag"], "l_extendedprice", {"e50": 0.5, "e95": 0.95}
    )
    sketch = li.groupBy("l_returnflag").agg(
        F.expr("approx_percentile(l_extendedprice, 0.5, 1000)").alias("a50")
    )
    return exact.join(bcast_small(sketch), "l_returnflag").select(
        "l_returnflag",
        F.round("e50", 4).alias("p50"),
        F.round("e95", 4).alias("p95"),
        (
            F.abs(F.col("a50") - F.col("e50")) <= 0.02 * F.col("e50")
        ).alias("approx_within_2pct"),
    )


@query(
    "q102_ivf_ann",
    """
    WITH emb AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings),
    c AS (SELECT vec_id AS cid, v AS cv FROM emb WHERE vec_id < 16),
    q AS (SELECT v AS qv FROM emb WHERE vec_id = 1),
    assign AS (
      SELECT vec_id, v, cid,
             row_number() OVER (
               PARTITION BY vec_id
               ORDER BY list_cosine_similarity(v, cv) DESC, cid) AS rn
      FROM emb CROSS JOIN c),
    inv AS (SELECT vec_id, v, cid FROM assign WHERE rn = 1),
    probed AS (
      SELECT cid FROM c CROSS JOIN q
      ORDER BY list_cosine_similarity(qv, cv) DESC, cid LIMIT 4),
    scored AS (
      SELECT i.vec_id, i.cid,
             list_cosine_similarity(i.v, q.qv) AS score
      FROM inv i JOIN probed p ON i.cid = p.cid CROSS JOIN q)
    SELECT vec_id, cid, round(score, 4) AS score
    FROM scored ORDER BY score DESC, vec_id LIMIT 5
    """,
)
def q102_ivf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-flat ANN (operators/similarity.ivf_assign + ivf_topk) — the
    second approximate scale path beside sign-LSH (q33): deterministic
    'trained' centroids (vec_id < 16), coarse assignment whose shuffle
    carries one row per vector, top-4-list probe, exact re-rank inside
    the probed lists only. The oracle replays assignment, probing, and
    re-rank with DuckDB's list_cosine_similarity — same argmax
    tie-breaks, same top-k order."""
    from etl_jetro_spark.operators.similarity import ivf_assign, ivf_topk

    emb = load(spark, sf_dir, "embeddings")
    cents = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")
    )
    probe = emb.filter(F.col("vec_id") == 1).select("embedding")
    inv = ivf_assign(emb, "vec_id", "embedding", cents)
    top = ivf_topk(
        inv, "vec_id", "embedding", cents, probe, "embedding", nprobe=4, k=5
    )
    return top.select(
        "vec_id", "cid", F.round("score", 4).alias("score")
    )


@query(
    "q103_corr_matrix",
    """
    SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b,
           round(corr(l_quantity, l_extendedprice), 6) AS pearson_r
    FROM lineitem
    UNION ALL
    SELECT 'l_quantity', 'l_discount',
           round(corr(l_quantity, l_discount), 6)
    FROM lineitem
    UNION ALL
    SELECT 'l_extendedprice', 'l_discount',
           round(corr(l_extendedprice, l_discount), 6)
    FROM lineitem
    """,
)
def q103_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation matrix (long form) in ONE aggregation
    pass — all three corr aggregates share a single scan + partial-agg
    shuffle (the oracle's UNION of scans is the naive form); the 1-row
    wide aggregate unpivots via a literal-struct explode, q84-style, so
    no extra shuffle. Feature-screening primitive for training-data
    curation."""
    li = load(spark, sf_dir, "lineitem")
    pairs = [
        ("l_quantity", "l_extendedprice"),
        ("l_quantity", "l_discount"),
        ("l_extendedprice", "l_discount"),
    ]
    one = li.agg(
        *[
            F.round(F.corr(a, b), 6).alias(f"_r_{i}")
            for i, (a, b) in enumerate(pairs)
        ]
    )
    structs = F.array(
        *[
            F.struct(
                F.lit(a).alias("col_a"),
                F.lit(b).alias("col_b"),
                F.col(f"_r_{i}").alias("pearson_r"),
            )
            for i, (a, b) in enumerate(pairs)
        ]
    )
    return one.select(F.explode(structs).alias("p")).select(
        "p.col_a", "p.col_b", "p.pearson_r"
    )


@query(
    "q104_trailing_window",
    """
    SELECT o_orderkey, o_custkey,
           CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
                OVER (PARTITION BY o_custkey
                      ORDER BY CAST(floor(epoch(o_orderdate)) AS BIGINT)
                      RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW)
                AS BIGINT) AS trailing_7d_cents
    FROM orders
    """,
)
def q104_trailing_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window over event time: each order's trailing-7-day
    spend per customer — the frame is VALUE-bounded (epoch seconds), not
    row-bounded, so irregular order spacing is handled exactly (q78's
    moving average is the ROWS flavor). One (customer, time) sort serves
    every frame; exact integer cents keep the running sums
    engine-identical. RANGE frames evaluate incrementally (sliding two
    pointers), never O(n_frame) per row."""
    from pyspark.sql import Window

    from etl_jetro_spark.functions.dates import epoch_seconds_ntz

    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        epoch_seconds_ntz(F.col("o_orderdate").cast("timestamp_ntz")).alias(
            "_t"
        ),
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("_cents"),
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("_t")
        .rangeBetween(-604_800, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.sum("_cents").over(w).cast("long").alias("trailing_7d_cents"),
    )


@query(
    "q105_user_set_ops",
    """
    SELECT 'both' AS cohort, CAST(count(*) AS BIGINT) AS n FROM (
      SELECT user_id FROM events WHERE event_type = 'click'
      INTERSECT
      SELECT user_id FROM events WHERE event_type = 'purchase')
    UNION ALL
    SELECT 'click_only', CAST(count(*) AS BIGINT) FROM (
      SELECT user_id FROM events WHERE event_type = 'click'
      EXCEPT
      SELECT user_id FROM events WHERE event_type = 'purchase')
    """,
)
def q105_user_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT through the DataFrame set operators
    (``intersect``/``subtract`` — both EXCEPT-DISTINCT semantics,
    matching the SQL set operators): clickers who also purchased
    vs clickers who never did. Catalyst plans both as aggregated
    semi/anti joins on the user key — one shuffle each, no distinct
    pre-pass needed."""
    e = load_events(spark, sf_dir)
    clicks = e.filter(F.col("event_type") == "click").select("user_id")
    buys = e.filter(F.col("event_type") == "purchase").select("user_id")
    both = clicks.intersect(buys).agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("both").alias("cohort"), "n"
    )
    only = clicks.subtract(buys).agg(
        F.count(F.lit(1)).alias("n")
    ).select(F.lit("click_only").alias("cohort"), "n")
    return both.unionByName(only)


@query(
    "q106_ordered_string_agg",
    """
    SELECT r_name AS region,
           string_agg(n_name, '|' ORDER BY n_name) AS nations
    FROM nation JOIN region ON n_regionkey = r_regionkey
    GROUP BY 1
    """,
)
def q106_ordered_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (report-building primitive): nations
    per region as a deterministic '|'-joined sorted list —
    ``array_join(array_sort(collect_list(...)))``; collect_list is
    partial-aggregated map-side, the sort runs on the tiny per-group
    array, never as a row sort. Broadcast the 5-row region dim."""
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    j = n.join(
        bcast_small(r), n["n_regionkey"] == r["r_regionkey"]
    )
    return j.groupBy(F.col("r_name").alias("region")).agg(
        F.array_join(
            F.array_sort(F.collect_list("n_name")), "|"
        ).alias("nations")
    )


@query(
    "q107_topk_per_group",
    """
    WITH rev AS (
      SELECT c.c_nationkey, o.o_custkey,
             CAST(sum(CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100
                           AS BIGINT)) AS BIGINT) AS cents
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2),
    rk AS (
      SELECT *, row_number() OVER (PARTITION BY c_nationkey
                                   ORDER BY cents DESC, o_custkey) AS rn
      FROM rev)
    SELECT c_nationkey, o_custkey, cents,
           CAST(rn AS BIGINT) AS rank
    FROM rk WHERE rn <= 2
    """,
)
def q107_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group (every nation's top-2 customers by spend): one
    revenue aggregation, then a rank window over the POST-AGG cardinality
    (one row per customer) partitioned by nation — the window never sees
    raw orders. Full tiebreak (cents DESC, custkey) keeps the cut
    deterministic; exact integer cents. At extreme per-group cardinality
    swap the window for a bounded per-partition heap (TakeOrdered per
    key via min-struct aggregation of k slots)."""
    from pyspark.sql import Window

    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    rev = (
        o.join(bcast_sized(c), o["o_custkey"] == c["c_custkey"])
        .groupBy("c_nationkey", "o_custkey")
        .agg(
            F.sum(
                (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast(
                    "long"
                )
            )
            .cast("long")
            .alias("cents")
        )
    )
    w = Window.partitionBy("c_nationkey").orderBy(
        F.desc("cents"), F.asc("o_custkey")
    )
    return (
        rev.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 2)
        .select("c_nationkey", "o_custkey", "cents", "rank")
    )


# --------------------------------------------------------------------------
# 30. Real media decode under the oracle gate (q108 PNG, q109 WAV)
# --------------------------------------------------------------------------

@query(
    "q108_png_decode",
    """
    WITH dims AS (
      SELECT doc_id AS media_id,
             4 + doc_id % 13 AS w,
             3 + doc_id % 11 AS h,
             (doc_id * 31) % 256 AS a
      FROM documents
    ),
    ex AS (
      SELECT media_id, w, h,
             (a + unnest(generate_series(0, w * h - 1))) % 256 AS v
      FROM dims
    )
    SELECT media_id,
           CAST(max(w) AS INT)    AS width,
           CAST(max(h) AS INT)    AS height,
           CAST(1 AS INT)         AS channels,
           CAST(count(*) AS BIGINT) AS value_count,
           CAST(sum(v) AS BIGINT) AS value_sum,
           CAST(min(v) AS INT)    AS value_min,
           CAST(max(v) AS INT)    AS value_max
    FROM ex GROUP BY media_id
    """,
)
def q108_png_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL PNG decode end-to-end: the fixture encodes one grayscale PNG
    per document row (dims and raster are pure functions of doc_id —
    plans/fixtures.media_png_frame), and extract_media_features decodes
    the actual bytes (signature, IHDR, CRC, inflate, unfilter) inside
    Arrow mapInPandas. The oracle recomputes width/height and the exact
    pixel statistics analytically — a wrong byte anywhere in the codec
    path breaks the hash match. Scale: one Python codec call per blob
    inside a streaming Arrow batch iterator; partition sizing is governed
    by maxPartitionBytes over the binary column."""
    from etl_jetro_spark.operators.multimodal import extract_media_features
    from etl_jetro_spark.operators.util import spread
    from etl_jetro_spark.plans.fixtures import media_png_frame

    docs = spread(load(spark, sf_dir, "documents").select("doc_id"))
    media = media_png_frame(docs)
    return extract_media_features(media).select(
        "media_id",
        "width",
        "height",
        "channels",
        "value_count",
        "value_sum",
        "value_min",
        "value_max",
    )


@query(
    "q109_wav_decode",
    """
    WITH dims AS (
      SELECT doc_id AS media_id,
             50 + doc_id % 100 AS n,
             doc_id * 7919     AS c
      FROM documents
    ),
    ex AS (
      SELECT media_id, n,
             ((c + unnest(generate_series(0, n - 1)) * 104729) % 65536)
               - 32768 AS v
      FROM dims
    )
    SELECT media_id,
           CAST(1 AS INT)            AS channels,
           CAST(8000 AS INT)         AS sample_rate,
           CAST(max(n) // 8 AS BIGINT) AS duration_ms,
           CAST(count(*) AS BIGINT)  AS value_count,
           CAST(sum(v) AS BIGINT)    AS value_sum,
           CAST(min(v) AS INT)       AS value_min,
           CAST(max(v) AS INT)       AS value_max
    FROM ex GROUP BY media_id
    """,
)
def q109_wav_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL WAV decode end-to-end: fixture encodes one 8 kHz 16-bit PCM
    mono WAV per document (samples are a pure function of doc_id), the
    codec parses RIFF/fmt/data chunks and unpacks PCM, and the oracle
    recomputes sample rate, duration, and exact sample statistics.
    duration_ms = frames*1000/rate with both engines flooring (n // 8 at
    8 kHz)."""
    from etl_jetro_spark.operators.multimodal import extract_media_features
    from etl_jetro_spark.operators.util import spread
    from etl_jetro_spark.plans.fixtures import media_wav_frame

    docs = spread(load(spark, sf_dir, "documents").select("doc_id"))
    media = media_wav_frame(docs)
    return extract_media_features(media).select(
        "media_id",
        "channels",
        "sample_rate",
        "duration_ms",
        "value_count",
        "value_sum",
        "value_min",
        "value_max",
    )


# --------------------------------------------------------------------------
# 31. Round-3 extensions: containment dedup, CMS heavy hitters,
#     feature standardization, equi-depth histogram (q110-q113)
# --------------------------------------------------------------------------

def _dk_hex8(hx: str) -> str:
    """DuckDB digit-walk: integer value of the first 8 hex chars of ``hx``
    (mirror of Spark's conv(substring(md5, 1, 8), 16, 10))."""
    return "(" + " + ".join(
        f"(strpos('0123456789abcdef', substr({hx}, {k + 1}, 1)) - 1)"
        + (f" * {16 ** (7 - k)}" if k < 7 else "")
        for k in range(8)
    ) + ")"


@query(
    "q110_containment_pairs",
    f"""
    WITH {_dk_shingles_cte(3)},
    dsh AS (SELECT DISTINCT doc_id, sh FROM sh),
    sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM dsh GROUP BY doc_id),
    freq AS (SELECT sh, count(*) AS df FROM dsh GROUP BY sh),
    capped AS (SELECT dsh.doc_id, dsh.sh FROM dsh JOIN freq USING (sh) WHERE freq.df <= 100),
    common AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(count(*) AS BIGINT) AS c
      FROM capped a JOIN capped b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT id_a, id_b,
           round(c / CAST(least(na.n, nb.n) AS DOUBLE), 6) AS containment
    FROM common
    JOIN sizes na ON na.doc_id = id_a
    JOIN sizes nb ON nb.doc_id = id_b
    WHERE c / CAST(least(na.n, nb.n) AS DOUBLE) >= 0.8
    """,
)
def q110_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shingle-set CONTAINMENT pairs (Broder's containment measure):
    C = common / min(|A|,|B|) >= 0.8 — catches near-subset duplication
    (a doc quoted wholesale inside a longer one) that Jaccard's
    union-denominator dilutes. Same inverted-index shape as q19, same
    hot-shingle ANTI-join cap."""
    from etl_jetro_spark.operators.dedup import containment_pairs

    d = load(spark, sf_dir, "documents")
    out = containment_pairs(
        d, "doc_id", "text", n=3, threshold=0.8, max_doc_freq=100
    )
    return out.select(
        "id_a", "id_b", F.round("containment", 6).alias("containment")
    )


@query(
    "q111_cms_heavy_hitters",
    f"""
    WITH toks AS (
      SELECT unnest({DK_WORDS}) AS token FROM documents
    ),
    t2 AS (SELECT token FROM toks WHERE token <> ''),
    exact AS (
      SELECT token, CAST(count(*) AS BIGINT) AS exact_cnt
      FROM t2 GROUP BY token
      ORDER BY exact_cnt DESC, token LIMIT 10
    ),
    coords AS (
      SELECT token, r.i AS row,
             md5('cms' || r.i || ':' || token) AS hx
      FROM t2, (SELECT unnest(generate_series(0, 3)) AS i) r
    ),
    cnt AS (
      SELECT row, {_dk_hex8('hx')} % 1024 AS bucket,
             CAST(count(*) AS BIGINT) AS c
      FROM coords GROUP BY 1, 2
    ),
    probe AS (
      SELECT e.token, e.exact_cnt, r.i AS row,
             {_dk_hex8("md5('cms' || r.i || ':' || e.token)")} % 1024 AS bucket
      FROM exact e, (SELECT unnest(generate_series(0, 3)) AS i) r
    )
    SELECT p.token, p.exact_cnt,
           CAST(min(coalesce(cnt.c, 0)) AS BIGINT) AS est_cnt,
           CAST(min(coalesce(cnt.c, 0)) >= p.exact_cnt AS BOOLEAN) AS est_ge_exact
    FROM probe p LEFT JOIN cnt ON cnt.row = p.row AND cnt.bucket = p.bucket
    GROUP BY p.token, p.exact_cnt
    """,
)
def q111_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch (depth 4 x width 1024) vs the exact top-10 token
    counts: the sketch builds in ONE partial-agg shuffle bounded by
    depth x width per task (the vocabulary-sized exact table is the thing
    the sketch replaces at web scale), and the one-sided guarantee
    est >= exact is ASSERTED per row under the oracle, which rebuilds the
    identical md5-addressed sketch digit-by-digit in SQL."""
    from etl_jetro_spark.functions.hashing import norm_text
    from etl_jetro_spark.operators.sketch import cms_build, cms_estimate
    from etl_jetro_spark.operators.util import spread

    d = spread(load(spark, sf_dir, "documents"))
    toks = (
        d.select(F.explode(F.split(norm_text("text"), " ")).alias("token"))
        .filter(F.col("token") != "")
        .localCheckpoint(eager=False)  # feeds sketch build AND exact counts
    )
    cms = cms_build(toks, "token", depth=4, width=1024)
    exact = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("exact_cnt"))
        .orderBy(F.desc("exact_cnt"), F.asc("token"))
        .limit(10)
    )
    est = cms_estimate(cms, exact.select("token"), "token", depth=4, width=1024)
    return exact.join(bcast_small(est), "token").select(
        "token",
        "exact_cnt",
        "est_cnt",
        (F.col("est_cnt") >= F.col("exact_cnt")).alias("est_ge_exact"),
    )


@query(
    "q112_group_zscore",
    """
    WITH stats AS (
      SELECT lang,
             avg(CAST(n_chars AS DOUBLE))    AS mu,
             stddev_samp(CAST(n_chars AS DOUBLE)) AS sigma
      FROM documents GROUP BY lang
    )
    SELECT d.doc_id, d.lang,
           round((d.n_chars - s.mu) / s.sigma, 4) AS z
    FROM documents d JOIN stats s ON d.lang = s.lang
    WHERE s.sigma > 0
    """,
)
def q112_group_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group feature standardization (z-score by language) — the
    normalize-before-training primitive. Group stats are a partial-agg
    shuffle over group cardinality; the fact side joins them via
    broadcast and never reshuffles. stddev_samp matches DuckDB's;
    z rounded 4dp (one subtraction + division past the agg)."""
    d = load(spark, sf_dir, "documents")
    stats = d.groupBy("lang").agg(
        F.avg(F.col("n_chars").cast("double")).alias("mu"),
        F.stddev_samp(F.col("n_chars").cast("double")).alias("sigma"),
    )
    return (
        d.join(bcast_small(stats.filter(F.col("sigma") > 0)), "lang")
        .select(
            "doc_id",
            "lang",
            F.round((F.col("n_chars") - F.col("mu")) / F.col("sigma"), 4).alias("z"),
        )
    )


@query(
    "q113_equidepth_histogram",
    f"""
    WITH r AS (
      SELECT l_extendedprice AS v,
             row_number() OVER (ORDER BY l_extendedprice) AS rn,
             count(*) OVER () AS n
      FROM lineitem WHERE l_extendedprice IS NOT NULL
    ),
    b AS (
      SELECT {_SQL_PCTL('0.25')} AS p25,
             {_SQL_PCTL('0.5')}  AS p50,
             {_SQL_PCTL('0.75')} AS p75
      FROM r
    )
    SELECT CASE WHEN l_extendedprice < p25 THEN 0
                WHEN l_extendedprice < p50 THEN 1
                WHEN l_extendedprice < p75 THEN 2
                ELSE 3 END AS bucket,
           CAST(count(*) AS BIGINT) AS cnt,
           round(min(l_extendedprice), 4) AS lo,
           round(max(l_extendedprice), 4) AS hi
    FROM lineitem CROSS JOIN b
    GROUP BY 1
    """,
)
def q113_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (quartile) histogram: boundaries from the DISTRIBUTED
    exact percentile operator (two-pass rank lookup — no per-group
    buffering, q45's machinery reused groupless), broadcast back as a
    1-row frame; bucket assignment + counts are one partial-agg pass.
    Exact interpolation parity with quantile_cont makes the boundaries —
    and therefore every bucket count — bit-stable cross-engine."""
    from etl_jetro_spark.operators.aggregate import exact_group_percentiles

    li = load(spark, sf_dir, "lineitem").withColumn("_g", F.lit(1))
    bounds = exact_group_percentiles(
        li, ["_g"], "l_extendedprice", {"p25": 0.25, "p50": 0.5, "p75": 0.75}
    ).drop("_g")
    v = F.col("l_extendedprice")
    bucket = (
        F.when(v < F.col("p25"), 0)
        .when(v < F.col("p50"), 1)
        .when(v < F.col("p75"), 2)
        .otherwise(3)
    )
    return (
        li.crossJoin(bcast_small(bounds))
        .groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("cnt"),
            F.round(F.min(v), 4).alias("lo"),
            F.round(F.max(v), 4).alias("hi"),
        )
    )


# --------------------------------------------------------------------------
# 32. End-to-end dedup pipeline, compaction planning, skew diagnosis
#     (q114-q116)
# --------------------------------------------------------------------------

@query(
    "q114_dedup_pipeline",
    f"""
    WITH RECURSIVE {_dk_shingles_cte(3)},
    mh AS (
      SELECT d.doc_id, s.seed,
             coalesce(min(md5(CAST(s.seed AS VARCHAR) || ':' || sh.sh)),
                      md5(CAST(s.seed AS VARCHAR) || ':')) AS mh
      FROM documents d
      CROSS JOIN (SELECT unnest(generate_series(0, {_MINHASHES - 1})) AS seed) s
      LEFT JOIN sh ON sh.doc_id = d.doc_id
      GROUP BY d.doc_id, s.seed
    ),
    bandkeys AS (
      SELECT doc_id,
             md5(CAST(seed // {_RPB} AS VARCHAR) || ',' ||
                 string_agg(mh, ',' ORDER BY seed)) AS bk
      FROM mh GROUP BY doc_id, seed // {_RPB}
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bandkeys a JOIN bandkeys b ON a.bk = b.bk AND a.doc_id < b.doc_id
    ),
    edges AS (
      SELECT c.id_a, c.id_b
      FROM cand c
      JOIN mh x ON x.doc_id = c.id_a
      JOIN mh y ON y.doc_id = c.id_b AND y.seed = x.seed
      GROUP BY c.id_a, c.id_b
      HAVING sum(CASE WHEN x.mh = y.mh THEN 1 ELSE 0 END) / {_MINHASHES}.0 >= 0.5
    ),
    und AS (SELECT id_a AS a, id_b AS b FROM edges
            UNION SELECT id_b, id_a FROM edges),
    nodes AS (SELECT a AS id FROM und UNION SELECT b FROM und),
    reach(s, t) AS (
      SELECT id, id FROM nodes
      UNION
      SELECT r.s, u.b FROM reach r JOIN und u ON u.a = r.t
    ),
    comp AS (SELECT s AS id, min(t) AS component FROM reach GROUP BY s)
    SELECT d.doc_id,
           CAST(coalesce(c.component, d.doc_id) AS BIGINT) AS component,
           CAST(coalesce(c.component, d.doc_id) = d.doc_id AS BOOLEAN) AS kept
    FROM documents d LEFT JOIN comp c ON c.id = d.doc_id
    """,
)
def q114_dedup_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WHOLE near-dup pipeline in one declared query: MinHash+LSH
    candidates (q18 machinery) -> est-Jaccard >= 0.5 edge filter ->
    connected-components clustering (q60 machinery) -> canonical keep
    (cluster-min id survives; isolated docs keep themselves). The oracle
    replays every stage — signatures, banding, candidate join, edge
    threshold, recursive min-label reachability, keep decision — so the
    COMPOSITION is hash-verified, not just each part. Scale: each stage
    is the operator already proven individually; the composition adds
    only the CC rounds (O(cluster diameter), dedup clusters are
    shallow)."""
    from etl_jetro_spark.operators.dedup import minhash_lsh_candidates
    from etl_jetro_spark.operators.graph import connected_components

    d = load(spark, sf_dir, "documents")
    edges = minhash_lsh_candidates(
        d, "doc_id", "text", num_hashes=_MINHASHES, bands=_BANDS, shingle_words=3
    ).filter(F.col("est_jaccard") >= 0.5)
    comp = connected_components(edges)
    return (
        d.select("doc_id")
        .join(comp.withColumnRenamed("id", "doc_id"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("component", F.col("doc_id")).cast("long").alias("component"),
            (
                F.coalesce("component", F.col("doc_id")) == F.col("doc_id")
            ).alias("kept"),
        )
    )


@query(
    "q115_compaction_plan",
    """
    WITH files AS (
      SELECT o_orderpriority AS part_dir,
             'part-' || CAST(o_orderkey AS VARCHAR) || '.parquet' AS file,
             CAST(floor(o_totalprice) AS BIGINT) AS size
      FROM orders
    ),
    planned AS (
      SELECT part_dir, file, size,
             CAST((sum(size) OVER (PARTITION BY part_dir ORDER BY file
                    ROWS UNBOUNDED PRECEDING) - size) // 1000000 AS BIGINT) AS bin
      FROM files
    )
    SELECT part_dir, CAST(sum(cnt) AS BIGINT) AS n_files,
           CAST(count(*) AS BIGINT) AS n_bins,
           CAST(max(bin_total) AS BIGINT) AS max_bin_bytes
    FROM (
      SELECT part_dir, bin, sum(size) AS bin_total, count(*) AS cnt
      FROM planned GROUP BY part_dir, bin
    ) b
    GROUP BY part_dir
    """,
)
def q115_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction planning (operators/layout.compaction_plan):
    a synthetic file listing (one 'file' per order, sized by total
    price) is binned per partition dir by running-cumsum fill to a 1 MB
    target; the query reports per-dir file count, bin count, and the
    largest planned bin. The window cumsum runs over the METADATA
    listing — at 100 TB that is millions of rows, not data. Integer
    `div` binning (a real cumulative byte count can pass 2^53)."""
    from etl_jetro_spark.operators.layout import compaction_plan

    o = load(spark, sf_dir, "orders")
    files = o.select(
        F.col("o_orderpriority").alias("part_dir"),
        F.concat(
            F.lit("part-"), F.col("o_orderkey").cast("string"), F.lit(".parquet")
        ).alias("file"),
        F.floor("o_totalprice").cast("long").alias("size"),
    )
    plan = compaction_plan(files, ["part_dir"], "file", "size", 1_000_000)
    bins = plan.groupBy("part_dir", "bin").agg(
        F.sum("size").alias("bin_total"), F.count(F.lit(1)).alias("cnt")
    )
    return bins.groupBy("part_dir").agg(
        F.sum("cnt").cast("long").alias("n_files"),
        F.countDistinct("bin").cast("long").alias("n_bins"),
        F.max("bin_total").cast("long").alias("max_bin_bytes"),
    )


@query(
    "q116_heavy_keys",
    """
    WITH c AS (
      SELECT l_partkey, CAST(count(*) AS BIGINT) AS cnt
      FROM lineitem GROUP BY l_partkey
    ),
    t AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(count(DISTINCT l_partkey) AS BIGINT) AS k
          FROM lineitem)
    SELECT l_partkey, cnt,
           round(cnt * k / CAST(n AS DOUBLE), 4) AS skew_ratio
    FROM c CROSS JOIN t
    WHERE cnt * k > 1.5 * n
    """,
)
def q116_heavy_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew diagnosis: join/agg keys whose row count exceeds 1.5x the
    mean per-key load — the detector that decides when to salt
    (operators/skew.py) or let AQE split. One partial-agg pass for
    per-key counts; totals ride a broadcast 1-row frame; the predicate
    is integer arithmetic (cnt*k > 1.5n as 2*cnt*k > 3n exact) with the
    reported ratio rounded."""
    li = load(spark, sf_dir, "lineitem")
    c = li.groupBy("l_partkey").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    t = li.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.countDistinct("l_partkey").cast("long").alias("k"),
    )
    return (
        c.crossJoin(bcast_small(t))
        .filter(F.col("cnt") * F.col("k") * 2 > F.col("n") * 3)
        .select(
            "l_partkey",
            "cnt",
            F.round(
                F.col("cnt") * F.col("k") / F.col("n").cast("double"), 4
            ).alias("skew_ratio"),
        )
    )


# --------------------------------------------------------------------------
# 10. Round-3 widening: fingerprinting, corpus-line dedup, sketch surfaces,
#     skyline/overlap/robust-outlier analytics
# --------------------------------------------------------------------------


@query(
    "q117_winnow_fingerprints",
    f"""
    WITH t AS (SELECT doc_id, {DK_NORM_TEXT} AS t FROM documents),
    g AS (
      SELECT doc_id, i.i AS pos, md5(substr(t, CAST(i.i AS INT), 8)) AS h
      FROM t, UNNEST(generate_series(1, greatest(length(t) - 7, 0))) AS i(i)
    ),
    w AS (
      SELECT doc_id, pos,
             min(h) OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS fingerprint
      FROM g
    )
    SELECT DISTINCT doc_id, fingerprint FROM w WHERE pos >= 4
    """,
)
def q117_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing rolling-hash fingerprints (operators/dedup.
    winnow_fingerprints — the MOSS algorithm, Schleimer et al. SIGMOD'03):
    char 8-gram hashes, window-of-4 minima, distinct per doc. Guarantees
    any >= 11-char shared substring leaves a shared fingerprint at ~2/5
    k-gram density. k-gram hashing is expression-only; ONE shuffle
    (partition by doc) feeds both the sliding min and the distinct."""
    from etl_jetro_spark.operators.dedup import winnow_fingerprints

    d = load(spark, sf_dir, "documents")
    return winnow_fingerprints(d, "doc_id", "text", k=8, w=4)


@query(
    "q118_line_dedup",
    f"""
    WITH t AS (SELECT doc_id, {DK_NORM_TEXT} AS t FROM documents),
    wds AS (SELECT doc_id, list_filter(string_split(t, ' '), x -> x <> '') AS ws
            FROM t),
    idx AS (
      SELECT doc_id, ws, i.i AS idx
      FROM wds,
           UNNEST(generate_series(0, CAST(ceil(len(ws) / 10.0) AS BIGINT) - 1)) AS i(i)
      WHERE len(ws) > 0
    ),
    ln AS (SELECT doc_id, idx,
                  array_to_string(list_slice(ws, idx * 10 + 1, idx * 10 + 10), ' ') AS line
           FROM idx),
    k AS (SELECT doc_id, idx, line,
                 row_number() OVER (PARTITION BY md5(line) ORDER BY doc_id, idx) AS rn
          FROM ln),
    agg AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines,
             CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
             coalesce(string_agg(CASE WHEN rn = 1 THEN line END, ' ' ORDER BY idx),
                      '') AS text_kept
      FROM k GROUP BY doc_id
    )
    SELECT d.doc_id, coalesce(a.n_lines, 0) AS n_lines,
           coalesce(a.n_kept, 0) AS n_kept,
           coalesce(a.text_kept, '') AS text_kept
    FROM documents d LEFT JOIN agg a USING (doc_id)
    """,
)
def q118_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level line dedup (operators/dedup.line_dedup — the CCNet
    paragraph-hash shape): 10-word lines, first occurrence by (doc, idx)
    survives, documents reassemble in order. Two line-row shuffles total
    (hash-partition for first-occurrence, doc-partition for reassembly)."""
    from etl_jetro_spark.operators.dedup import line_dedup

    d = load(spark, sf_dir, "documents")
    return line_dedup(d, "doc_id", "text", line_words=10)


@query(
    "q119_kmv_source_jaccard",
    f"""
    WITH {_dk_shingles_cte(3)},
    ssh AS (
      SELECT d.source AS grp, md5(s.sh) AS h
      FROM sh s JOIN documents d USING (doc_id)
      GROUP BY d.source, md5(s.sh)
    ),
    kmv AS (
      SELECT grp, h FROM (
        SELECT grp, h, row_number() OVER (PARTITION BY grp ORDER BY h) AS rn
        FROM ssh) WHERE rn <= 32
    ),
    pairs AS (
      SELECT a.grp AS group_a, b.grp AS group_b
      FROM (SELECT DISTINCT grp FROM kmv) a
      JOIN (SELECT DISTINCT grp FROM kmv) b ON a.grp < b.grp
    ),
    m AS (
      SELECT p.group_a, p.group_b, k.h,
             max(CASE WHEN k.grp = p.group_a THEN 1 ELSE 0 END) AS in_a,
             max(CASE WHEN k.grp = p.group_b THEN 1 ELSE 0 END) AS in_b
      FROM pairs p JOIN kmv k ON k.grp = p.group_a OR k.grp = p.group_b
      GROUP BY 1, 2, 3
    ),
    bot AS (
      SELECT * FROM (
        SELECT m.*, row_number() OVER (PARTITION BY group_a, group_b
                                       ORDER BY h) AS rn FROM m)
      WHERE rn <= 32
    )
    SELECT group_a, group_b, CAST(count(*) AS BIGINT) AS n_union_k,
           round(sum(in_a * in_b) / CAST(count(*) AS DOUBLE), 6) AS est_jaccard
    FROM bot GROUP BY 1, 2
    """,
)
def q119_kmv_source_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source overlap triage from K-minimum-values sketches
    (operators/sketch.kmv_bottom_k / kmv_pairwise_jaccard): the corpus is
    shingled ONCE; every pairwise estimate runs on k=32-hash sketches, so
    the quadratic term is #sources², never corpus-sized. The oracle
    replays sketch build, union-bottom-k, and the estimator exactly."""
    from etl_jetro_spark.operators.dedup import shingle_rows
    from etl_jetro_spark.operators.sketch import kmv_pairwise_jaccard

    d = load(spark, sf_dir, "documents")
    sh = shingle_rows(d, "source", "text", 3, distinct=False).select(
        F.col("_id").alias("source"), F.col("_sh").alias("sh")
    )
    return kmv_pairwise_jaccard(sh, "source", "sh", k=32)


@query(
    "q120_pareto_parts",
    """
    SELECT x.p_partkey, x.p_retailprice, x.p_size
    FROM part x
    WHERE NOT EXISTS (
      SELECT 1 FROM part y
      WHERE y.p_retailprice <= x.p_retailprice AND y.p_size >= x.p_size
        AND (y.p_retailprice < x.p_retailprice OR y.p_size > x.p_size)
    )
    """,
)
def q120_pareto_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto frontier / skyline (operators/frontier.pareto_frontier):
    parts where no other part is cheaper-and-bigger. The oracle runs the
    quadratic NOT EXISTS definition; the engine runs the sweep
    decomposition — per-distinct-price maxima (partial agg), one
    NDV-sized window for the strictly-cheaper running max, then per-row
    arithmetic. No self-join of the table against itself."""
    from etl_jetro_spark.operators.frontier import pareto_frontier

    p = load(spark, sf_dir, "part").select(
        "p_partkey", "p_retailprice", "p_size"
    )
    return pareto_frontier(p, "p_retailprice", "p_size")


@query(
    "q121_audience_overlap",
    """
    WITH m AS (SELECT DISTINCT event_type AS seg, user_id AS member FROM events),
    s AS (SELECT seg, CAST(count(*) AS BIGINT) AS n FROM m GROUP BY 1),
    i AS (
      SELECT a.seg AS seg_a, b.seg AS seg_b, CAST(count(*) AS BIGINT) AS n_both
      FROM m a JOIN m b ON a.member = b.member AND a.seg < b.seg
      GROUP BY 1, 2
    )
    SELECT seg_a, seg_b, sa.n AS n_a, sb.n AS n_b, n_both,
           round(n_both / CAST(sa.n + sb.n - n_both AS DOUBLE), 6) AS jaccard
    FROM i JOIN s sa ON sa.seg = i.seg_a JOIN s sb ON sb.seg = i.seg_b
    """,
)
def q121_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact pairwise audience overlap between event-type segments
    (operators/similarity.segment_overlap): distinct membership pass, then
    a member-keyed self-join whose fan-out is #segments² PER MEMBER (a
    constant), never |members|²; sizes ride a broadcast dim."""
    from etl_jetro_spark.operators.similarity import segment_overlap

    e = load_events(spark, sf_dir)
    return segment_overlap(e, "event_type", "user_id")


@query(
    "q122_mad_outliers",
    f"""
    WITH ev AS (SELECT event_type, value FROM events
                WHERE value IS NOT NULL),
    r1 AS (SELECT event_type, value AS v,
                  row_number() OVER (PARTITION BY event_type
                                     ORDER BY value) AS rn,
                  count(*) OVER (PARTITION BY event_type) AS n
           FROM ev),
    med AS (SELECT event_type, {_SQL_PCTL('0.5')} AS med
            FROM r1 GROUP BY event_type),
    dev AS (SELECT e.event_type, e.value, m.med, abs(e.value - m.med) AS d
            FROM ev e JOIN med m USING (event_type)),
    r2 AS (SELECT event_type, d AS v,
                  row_number() OVER (PARTITION BY event_type
                                     ORDER BY d) AS rn,
                  count(*) OVER (PARTITION BY event_type) AS n
           FROM dev),
    madt AS (SELECT event_type, {_SQL_PCTL('0.5')} AS mad
             FROM r2 GROUP BY event_type)
    SELECT d.event_type, CAST(count(*) AS BIGINT) AS n,
           round(any_value(d.med), 6) AS med,
           round(any_value(t.mad), 6) AS mad,
           CAST(sum(CASE WHEN d.d > 3.0 * t.mad THEN 1 ELSE 0 END) AS BIGINT)
             AS n_outliers
    FROM dev d JOIN madt t USING (event_type)
    GROUP BY d.event_type
    """,
)
def q122_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier census per event type via Median Absolute Deviation
    (operators/aggregate.mad_outliers): BOTH medians run through the
    distributed exact-percentile operator (range-partitioned parallel
    sort — no per-group multiset buffering), so the robust statistic
    survives raw-row scale; the group-sized median frames broadcast."""
    from etl_jetro_spark.operators.aggregate import mad_outliers

    e = load_events(spark, sf_dir)
    out = mad_outliers(e, ["event_type"], "value", z=3.0)
    return out.select(
        "event_type",
        "n",
        F.round("med", 6).alias("med"),
        F.round("mad", 6).alias("mad"),
        "n_outliers",
    )


_BLOOM_WORDS = 1024
_BLOOM_BITS = _BLOOM_WORDS * 32


@query(
    "q123_bloom_membership",
    f"""
    WITH coords AS (
      SELECT {_dk_hex8("md5('bloom' || i.i || ':' || CAST(l_partkey AS VARCHAR))")}
               % {_BLOOM_BITS} AS pos
      FROM lineitem, (SELECT unnest(generate_series(0, 3)) AS i) i
    ),
    bloom AS (
      SELECT pos // 32 AS word,
             bit_or(CAST(1 AS BIGINT) << CAST(pos % 32 AS INT)) AS bits
      FROM coords GROUP BY 1
    ),
    probes AS (
      SELECT p_partkey AS probe_key FROM part
      UNION ALL SELECT p_partkey + 1000000000 FROM part
    ),
    pc AS (
      SELECT probe_key,
             {_dk_hex8("md5('bloom' || i.i || ':' || CAST(probe_key AS VARCHAR))")}
               % {_BLOOM_BITS} AS pos
      FROM probes, (SELECT unnest(generate_series(0, 3)) AS i) i
    ),
    hits AS (
      SELECT probe_key,
             min(CASE WHEN (coalesce(b.bits, 0) &
                    (CAST(1 AS BIGINT) << CAST(pc.pos % 32 AS INT))) <> 0
                 THEN 1 ELSE 0 END) AS hit
      FROM pc LEFT JOIN bloom b ON b.word = pc.pos // 32
      GROUP BY 1
    ),
    tru AS (SELECT DISTINCT l_partkey AS probe_key FROM lineitem)
    SELECT h.probe_key, (t.probe_key IS NOT NULL) AS truly_present,
           (h.hit = 1) AS maybe_present,
           ((t.probe_key IS NULL) OR h.hit = 1) AS one_sided_ok
    FROM hits h LEFT JOIN tru t USING (probe_key)
    """,
)
def q123_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable Bloom-filter membership (operators/sketch.bloom_build /
    bloom_contains): the filter is a (word, bits) table built in ONE
    partial-agg shuffle bounded by 1024 rows per task regardless
    of fact size, then broadcast to probes — the engine-level primitive
    behind runtime join pruning. The oracle rebuilds the identical md5-
    addressed bitset in SQL and ASSERTS the one-sided guarantee (present
    keys are never reported absent) per row."""
    from etl_jetro_spark.operators.sketch import bloom_build, bloom_contains

    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    probes = p.select(F.col("p_partkey").alias("probe_key")).unionByName(
        p.select((F.col("p_partkey") + F.lit(1000000000)).alias("probe_key"))
    )
    bloom = bloom_build(li, "l_partkey", m_words=_BLOOM_WORDS, k_hashes=4)
    maybe = bloom_contains(
        bloom, probes, "probe_key", m_words=_BLOOM_WORDS, k_hashes=4
    )
    tru = li.select(F.col("l_partkey").alias("probe_key")).distinct()
    return (
        maybe.join(tru.withColumn("_t", F.lit(1)), "probe_key", "left")
        .select(
            "probe_key",
            F.col("_t").isNotNull().alias("truly_present"),
            "maybe_present",
            (F.col("_t").isNull() | F.col("maybe_present")).alias("one_sided_ok"),
        )
    )


@query(
    "q124_prefix_filter_jaccard",
    f"""
    WITH {_dk_shingles_cte(3)},
    dsh AS (SELECT DISTINCT doc_id, sh FROM sh),
    sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM dsh GROUP BY doc_id),
    common AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(count(*) AS BIGINT) AS c
      FROM dsh a JOIN dsh b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT id_a, id_b,
           c / CAST(na.n + nb.n - c AS DOUBLE) AS jaccard
    FROM common
    JOIN sizes na ON na.doc_id = id_a
    JOIN sizes nb ON nb.doc_id = id_b
    WHERE c / CAST(na.n + nb.n - c AS DOUBLE) >= 0.5
    """,
)
def q124_prefix_filter_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Jaccard >= 0.5 via PREFIX FILTERING (operators/dedup.
    prefix_filter_jaccard_pairs): only each set's first
    |S|-ceil(0.5|S|)+1 shingles — under the (df asc, shingle asc) global
    order — enter the inverted-index join, so hot boilerplate shingles
    never join and candidates shrink ~(1-t)². LOSSLESS, unlike q19's df
    cap: the oracle is the UNCAPPED brute-force inverted index, and the
    hash match proves the filter drops no qualifying pair. Verification
    is per-candidate array intersection on doc-bounded shingle arrays."""
    from etl_jetro_spark.operators.dedup import prefix_filter_jaccard_pairs

    d = load(spark, sf_dir, "documents")
    return prefix_filter_jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.5)


_BM25_TERMS = ("spark", "window", "hash")


@query(
    "q125_bm25_retrieval",
    f"""
    WITH base AS (
      SELECT doc_id,
             list_filter(string_split({DK_NORM_TEXT}, ' '), x -> x <> '') AS w
      FROM documents
    ),
    stats AS (SELECT CAST(count(*) AS BIGINT) AS N, avg(len(w)) AS avgdl FROM base),
    toks AS (
      SELECT doc_id, len(w) AS dl, t.t AS t
      FROM base, UNNEST(w) AS t(t)
      WHERE t.t IN {_BM25_TERMS!r}
    ),
    tf AS (SELECT doc_id, t, CAST(count(*) AS BIGINT) AS tf, any_value(dl) AS dl
           FROM toks GROUP BY 1, 2),
    dfq AS (SELECT t, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
    s AS (
      SELECT tf.doc_id,
             ln((stats.N - dfq.df + 0.5) / (dfq.df + 0.5) + 1.0)
               * (tf.tf * 2.2)
               / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * tf.dl / stats.avgdl)) AS s
      FROM tf JOIN dfq USING (t) CROSS JOIN stats
    )
    SELECT doc_id, round(sum(s), 6) AS score FROM s GROUP BY doc_id
    """,
)
def q125_bm25_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 retrieval (operators/textstats.bm25_scores, Lucene-style
    non-negative idf; k1=1.2, b=0.75) for a fixed 3-term query. Tokens
    filter to the query terms BEFORE any aggregation, so post-scan state
    is per-(term, doc); corpus-wide frames are the |q|-row df vector and
    the 1-row (N, avgdl) aggregate, both broadcast. The oracle replays
    the formula term-by-term in SQL."""
    from etl_jetro_spark.operators.textstats import bm25_scores

    d = load(spark, sf_dir, "documents")
    out = bm25_scores(d, "doc_id", "text", list(_BM25_TERMS))
    return out.select("doc_id", F.round("score", 6).alias("score"))


@query(
    "q126_sliding_distinct_users",
    """
    WITH du AS (SELECT DISTINCT CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
                       user_id
                FROM events),
    days AS (SELECT DISTINCT day FROM du)
    SELECT d.day AS wday, CAST(count(DISTINCT u.user_id) AS BIGINT) AS n_users_7d
    FROM days d JOIN du u ON u.day BETWEEN d.day - 6 AND d.day
    GROUP BY 1
    """,
)
def q126_sliding_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT 7-day sliding distinct users per active day — the rolling-MAU
    shape, distributed: distinct (day,user) first (one partial-agg shuffle
    over day-granular rows, not raw events), each contribution EXPLODES to
    the <=7 window-days it serves, second distinct + count. No per-day
    self-join over the event log, no window holding user sets in memory;
    row volume after the first distinct is active-days x users x 7 max.
    The oracle runs the quadratic day x range join definition."""
    e = load_events(spark, sf_dir)
    day = F.expr("(ts div 1000000000) div 86400")
    du = e.select(day.alias("day"), "user_id").distinct()
    contrib = du.select(
        F.explode(F.sequence(F.col("day"), F.col("day") + 6)).alias("wday"),
        "user_id",
    ).distinct()
    days = du.select("day").distinct().withColumnRenamed("day", "wday")
    return (
        contrib.join(days, "wday")
        .groupBy("wday")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users_7d"))
    )


@query(
    "q127_winnow_overlap_pairs",
    f"""
    WITH t AS (SELECT doc_id, {DK_NORM_TEXT} AS t FROM documents),
    g AS (
      SELECT doc_id, i.i AS pos, md5(substr(t, CAST(i.i AS INT), 8)) AS h
      FROM t, UNNEST(generate_series(1, greatest(length(t) - 7, 0))) AS i(i)
    ),
    w AS (
      SELECT doc_id, pos,
             min(h) OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS fingerprint
      FROM g
    ),
    fp AS (SELECT DISTINCT doc_id, fingerprint FROM w WHERE pos >= 4),
    hot AS (SELECT fingerprint FROM fp GROUP BY 1 HAVING count(*) > 20),
    fc AS (SELECT * FROM fp ANTI JOIN hot USING (fingerprint))
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(count(*) AS BIGINT) AS n_shared
    FROM fc a JOIN fc b ON a.fingerprint = b.fingerprint AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    HAVING count(*) >= 10
    """,
)
def q127_winnow_overlap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MOSS-style copy detection on winnowed fingerprints
    (operators/dedup.winnow_overlap_pairs): pairs sharing >= 10
    fingerprints with df <= 20, with the shared count. The inverted-index
    self-join runs on the WINNOWED set (~2/(w+1) of the k-grams — the
    density bound that makes corpus-scale substring-match detection
    affordable) AFTER the hot-fingerprint cap: winnowing bounds total
    index volume but not per-key skew, and at this corpus the over-cap
    fingerprints carried 99.8% of the candidate-pair volume at sf0.1
    (188.8M of 190.4M df² pairs) while contributing zero copy-detection
    signal. The oracle replays the identical cap."""
    from etl_jetro_spark.operators.dedup import winnow_overlap_pairs

    d = load(spark, sf_dir, "documents")
    return winnow_overlap_pairs(
        d, "doc_id", "text", k=8, w=4, min_shared=10, max_doc_freq=20
    )


@query(
    "q128_image_sniff",
    """
    WITH base AS (SELECT doc_id, doc_id % 3 AS m FROM documents),
    png AS (SELECT doc_id, 4 + doc_id % 13 AS w, 3 + doc_id % 11 AS h,
                   (doc_id * 31) % 256 AS a
            FROM base WHERE m = 0),
    pngex AS (SELECT doc_id, w, h,
                     (a + unnest(generate_series(0, w * h - 1))) % 256 AS v
              FROM png),
    pngagg AS (
      SELECT doc_id, 'png' AS format, max(w) AS w, max(h) AS h,
             1 AS channels, CAST(count(*) AS BIGINT) AS value_count,
             CAST(sum(v) AS BIGINT) AS value_sum,
             CAST(min(v) AS INT) AS value_min, CAST(max(v) AS INT) AS value_max
      FROM pngex GROUP BY doc_id
    ),
    bmp AS (SELECT doc_id, 2 + doc_id % 9 AS w, 2 + doc_id % 7 AS h,
                   (doc_id * 17) % 256 AS a
            FROM base WHERE m = 1),
    bmpex AS (SELECT doc_id, w, h,
                     (a + unnest(generate_series(0, w * h * 3 - 1))) % 256 AS v
              FROM bmp),
    bmpagg AS (
      SELECT doc_id, 'bmp' AS format, max(w) AS w, max(h) AS h,
             3 AS channels, CAST(count(*) AS BIGINT) AS value_count,
             CAST(sum(v) AS BIGINT) AS value_sum,
             CAST(min(v) AS INT) AS value_min, CAST(max(v) AS INT) AS value_max
      FROM bmpex GROUP BY doc_id
    ),
    gifagg AS (
      SELECT doc_id, 'gif' AS format, 1 + doc_id % 200 AS w,
             1 + doc_id % 100 AS h, CAST(NULL AS INT) AS channels,
             CAST(0 AS BIGINT) AS value_count, CAST(0 AS BIGINT) AS value_sum,
             CAST(NULL AS INT) AS value_min, CAST(NULL AS INT) AS value_max
      FROM base WHERE m = 2
    ),
    u AS (SELECT * FROM pngagg UNION ALL SELECT * FROM bmpagg
          UNION ALL SELECT * FROM gifagg)
    SELECT doc_id AS media_id, format, CAST(w AS INT) AS width,
           CAST(h AS INT) AS height, channels, value_count, value_sum,
           value_min, value_max
    FROM u
    """,
)
def q128_image_sniff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixed-format image metadata extraction: one Arrow mapInPandas pass
    magic-byte-dispatches PNG (full decode incl. raster stats), 24-bpp
    BMP (full decode: padded bottom-up raster re-ordered, stats over BGR
    samples), and GIF (header-only logical-screen dims — stats honestly
    empty, never fabricated). The oracle derives format, dims, and exact
    value statistics analytically per blob. The corpus-scan shape is the
    production one: sniff+decode in one pass, no per-format re-read."""
    from etl_jetro_spark.operators.multimodal import extract_media_features
    from etl_jetro_spark.operators.util import spread
    from etl_jetro_spark.plans.fixtures import media_image_frame

    docs = spread(load(spark, sf_dir, "documents").select("doc_id"))
    media = media_image_frame(docs)
    return extract_media_features(media).select(
        "media_id",
        "format",
        "width",
        "height",
        "channels",
        "value_count",
        "value_sum",
        "value_min",
        "value_max",
    )


@query(
    "q129_point_in_time_join",
    """
    WITH log AS (
      SELECT o_custkey, o_orderstatus,
             CAST(floor(epoch(o_orderdate)) AS BIGINT) AS eff, o_orderkey
      FROM orders),
    marked AS (
      SELECT *, lag(o_orderstatus) OVER w AS prev FROM log
      WINDOW w AS (PARTITION BY o_custkey ORDER BY eff, o_orderkey)),
    changes AS (
      SELECT * FROM marked WHERE prev IS NULL OR prev <> o_orderstatus),
    hist AS (
      SELECT o_custkey, o_orderstatus AS status, eff AS eff_from,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY eff, o_orderkey) AS seq
      FROM changes)
    SELECT o.o_orderkey, o.o_custkey,
           v.status AS status_asof,
           CAST(v.eff_from AS BIGINT) AS version_from
    FROM orders o
    LEFT JOIN LATERAL (
      SELECT h.status, h.eff_from FROM hist h
      WHERE h.o_custkey = o.o_custkey
        AND h.eff_from <= CAST(floor(epoch(o.o_orderdate)) AS BIGINT)
      ORDER BY h.eff_from DESC, h.seq DESC LIMIT 1
    ) v ON TRUE
    """,
)
def q129_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time correctness join (operators/cdc.point_in_time_join):
    every order is enriched with the customer-status SCD2 version in
    effect AS OF its order date (latest version_time <= fact time,
    same-instant versions by version_seq). The engine runs the
    union-sweep — one (key, time) shuffle+sort, last-non-null carry — vs
    the oracle's per-fact LATERAL top-1 probe, the semantics the
    feature-store pattern demands with no interval theta-join."""
    from etl_jetro_spark.functions.dates import epoch_seconds_ntz
    from etl_jetro_spark.operators.cdc import point_in_time_join, scd2_from_log

    o = load(spark, sf_dir, "orders")
    log = o.select(
        "o_custkey",
        "o_orderstatus",
        epoch_seconds_ntz("o_orderdate").alias("eff"),
        "o_orderkey",
    )
    hist = scd2_from_log(
        log, ["o_custkey"], "o_orderstatus", ["eff", "o_orderkey"], "eff"
    ).withColumnRenamed("o_orderstatus", "status")
    facts = o.select(
        "o_orderkey", "o_custkey", epoch_seconds_ntz("o_orderdate").alias("_ft")
    )
    out = point_in_time_join(
        facts,
        hist,
        ["o_custkey"],
        "_ft",
        "eff_from",
        "version_seq",
        ["status"],
    )
    return out.select(
        "o_orderkey",
        "o_custkey",
        F.col("status").alias("status_asof"),
        F.col("version_from").cast("long").alias("version_from"),
    )


@query(
    "q130_random_projection",
    """
    SELECT vec_id,
           round(0.0 + CAST(embedding[1] AS DOUBLE) * 1.0 + CAST(embedding[2] AS DOUBLE) * 1.0 + CAST(embedding[3] AS DOUBLE) * 1.0 + CAST(embedding[4] AS DOUBLE) * -1.0 + CAST(embedding[5] AS DOUBLE) * 1.0 + CAST(embedding[6] AS DOUBLE) * 1.0 + CAST(embedding[7] AS DOUBLE) * 1.0 + CAST(embedding[8] AS DOUBLE) * -1.0 + CAST(embedding[9] AS DOUBLE) * -1.0 + CAST(embedding[10] AS DOUBLE) * -1.0 + CAST(embedding[11] AS DOUBLE) * -1.0 + CAST(embedding[12] AS DOUBLE) * 1.0 + CAST(embedding[13] AS DOUBLE) * 1.0 + CAST(embedding[14] AS DOUBLE) * 1.0 + CAST(embedding[15] AS DOUBLE) * -1.0 + CAST(embedding[16] AS DOUBLE) * -1.0 + CAST(embedding[17] AS DOUBLE) * -1.0 + CAST(embedding[18] AS DOUBLE) * -1.0 + CAST(embedding[19] AS DOUBLE) * -1.0 + CAST(embedding[20] AS DOUBLE) * -1.0 + CAST(embedding[21] AS DOUBLE) * 1.0 + CAST(embedding[22] AS DOUBLE) * -1.0 + CAST(embedding[23] AS DOUBLE) * 1.0 + CAST(embedding[24] AS DOUBLE) * 1.0 + CAST(embedding[25] AS DOUBLE) * 1.0 + CAST(embedding[26] AS DOUBLE) * -1.0 + CAST(embedding[27] AS DOUBLE) * 1.0 + CAST(embedding[28] AS DOUBLE) * 1.0 + CAST(embedding[29] AS DOUBLE) * 1.0 + CAST(embedding[30] AS DOUBLE) * -1.0 + CAST(embedding[31] AS DOUBLE) * 1.0 + CAST(embedding[32] AS DOUBLE) * 1.0 + CAST(embedding[33] AS DOUBLE) * 1.0 + CAST(embedding[34] AS DOUBLE) * -1.0 + CAST(embedding[35] AS DOUBLE) * 1.0 + CAST(embedding[36] AS DOUBLE) * -1.0 + CAST(embedding[37] AS DOUBLE) * 1.0 + CAST(embedding[38] AS DOUBLE) * -1.0 + CAST(embedding[39] AS DOUBLE) * -1.0 + CAST(embedding[40] AS DOUBLE) * 1.0 + CAST(embedding[41] AS DOUBLE) * -1.0 + CAST(embedding[42] AS DOUBLE) * 1.0 + CAST(embedding[43] AS DOUBLE) * 1.0 + CAST(embedding[44] AS DOUBLE) * 1.0 + CAST(embedding[45] AS DOUBLE) * -1.0 + CAST(embedding[46] AS DOUBLE) * 1.0 + CAST(embedding[47] AS DOUBLE) * -1.0 + CAST(embedding[48] AS DOUBLE) * 1.0 + CAST(embedding[49] AS DOUBLE) * -1.0 + CAST(embedding[50] AS DOUBLE) * -1.0 + CAST(embedding[51] AS DOUBLE) * -1.0 + CAST(embedding[52] AS DOUBLE) * -1.0 + CAST(embedding[53] AS DOUBLE) * -1.0 + CAST(embedding[54] AS DOUBLE) * -1.0 + CAST(embedding[55] AS DOUBLE) * -1.0 + CAST(embedding[56] AS DOUBLE) * 1.0 + CAST(embedding[57] AS DOUBLE) * 1.0 + CAST(embedding[58] AS DOUBLE) * 1.0 + CAST(embedding[59] AS DOUBLE) * 1.0 + CAST(embedding[60] AS DOUBLE) * 1.0 + CAST(embedding[61] AS DOUBLE) * 1.0 + CAST(embedding[62] AS DOUBLE) * -1.0 + CAST(embedding[63] AS DOUBLE) * -1.0 + CAST(embedding[64] AS DOUBLE) * 1.0, 4) + 0.0 AS p0,
           round(0.0 + CAST(embedding[1] AS DOUBLE) * 1.0 + CAST(embedding[2] AS DOUBLE) * -1.0 + CAST(embedding[3] AS DOUBLE) * 1.0 + CAST(embedding[4] AS DOUBLE) * -1.0 + CAST(embedding[5] AS DOUBLE) * 1.0 + CAST(embedding[6] AS DOUBLE) * -1.0 + CAST(embedding[7] AS DOUBLE) * -1.0 + CAST(embedding[8] AS DOUBLE) * -1.0 + CAST(embedding[9] AS DOUBLE) * -1.0 + CAST(embedding[10] AS DOUBLE) * 1.0 + CAST(embedding[11] AS DOUBLE) * -1.0 + CAST(embedding[12] AS DOUBLE) * 1.0 + CAST(embedding[13] AS DOUBLE) * -1.0 + CAST(embedding[14] AS DOUBLE) * 1.0 + CAST(embedding[15] AS DOUBLE) * 1.0 + CAST(embedding[16] AS DOUBLE) * 1.0 + CAST(embedding[17] AS DOUBLE) * 1.0 + CAST(embedding[18] AS DOUBLE) * 1.0 + CAST(embedding[19] AS DOUBLE) * 1.0 + CAST(embedding[20] AS DOUBLE) * 1.0 + CAST(embedding[21] AS DOUBLE) * -1.0 + CAST(embedding[22] AS DOUBLE) * -1.0 + CAST(embedding[23] AS DOUBLE) * 1.0 + CAST(embedding[24] AS DOUBLE) * -1.0 + CAST(embedding[25] AS DOUBLE) * -1.0 + CAST(embedding[26] AS DOUBLE) * -1.0 + CAST(embedding[27] AS DOUBLE) * -1.0 + CAST(embedding[28] AS DOUBLE) * 1.0 + CAST(embedding[29] AS DOUBLE) * 1.0 + CAST(embedding[30] AS DOUBLE) * -1.0 + CAST(embedding[31] AS DOUBLE) * -1.0 + CAST(embedding[32] AS DOUBLE) * -1.0 + CAST(embedding[33] AS DOUBLE) * -1.0 + CAST(embedding[34] AS DOUBLE) * -1.0 + CAST(embedding[35] AS DOUBLE) * -1.0 + CAST(embedding[36] AS DOUBLE) * 1.0 + CAST(embedding[37] AS DOUBLE) * 1.0 + CAST(embedding[38] AS DOUBLE) * 1.0 + CAST(embedding[39] AS DOUBLE) * -1.0 + CAST(embedding[40] AS DOUBLE) * -1.0 + CAST(embedding[41] AS DOUBLE) * -1.0 + CAST(embedding[42] AS DOUBLE) * 1.0 + CAST(embedding[43] AS DOUBLE) * -1.0 + CAST(embedding[44] AS DOUBLE) * 1.0 + CAST(embedding[45] AS DOUBLE) * 1.0 + CAST(embedding[46] AS DOUBLE) * -1.0 + CAST(embedding[47] AS DOUBLE) * -1.0 + CAST(embedding[48] AS DOUBLE) * -1.0 + CAST(embedding[49] AS DOUBLE) * -1.0 + CAST(embedding[50] AS DOUBLE) * -1.0 + CAST(embedding[51] AS DOUBLE) * -1.0 + CAST(embedding[52] AS DOUBLE) * -1.0 + CAST(embedding[53] AS DOUBLE) * -1.0 + CAST(embedding[54] AS DOUBLE) * 1.0 + CAST(embedding[55] AS DOUBLE) * -1.0 + CAST(embedding[56] AS DOUBLE) * -1.0 + CAST(embedding[57] AS DOUBLE) * 1.0 + CAST(embedding[58] AS DOUBLE) * 1.0 + CAST(embedding[59] AS DOUBLE) * -1.0 + CAST(embedding[60] AS DOUBLE) * -1.0 + CAST(embedding[61] AS DOUBLE) * 1.0 + CAST(embedding[62] AS DOUBLE) * -1.0 + CAST(embedding[63] AS DOUBLE) * -1.0 + CAST(embedding[64] AS DOUBLE) * -1.0, 4) + 0.0 AS p1,
           round(0.0 + CAST(embedding[1] AS DOUBLE) * 1.0 + CAST(embedding[2] AS DOUBLE) * -1.0 + CAST(embedding[3] AS DOUBLE) * -1.0 + CAST(embedding[4] AS DOUBLE) * -1.0 + CAST(embedding[5] AS DOUBLE) * 1.0 + CAST(embedding[6] AS DOUBLE) * -1.0 + CAST(embedding[7] AS DOUBLE) * -1.0 + CAST(embedding[8] AS DOUBLE) * -1.0 + CAST(embedding[9] AS DOUBLE) * 1.0 + CAST(embedding[10] AS DOUBLE) * -1.0 + CAST(embedding[11] AS DOUBLE) * -1.0 + CAST(embedding[12] AS DOUBLE) * 1.0 + CAST(embedding[13] AS DOUBLE) * 1.0 + CAST(embedding[14] AS DOUBLE) * 1.0 + CAST(embedding[15] AS DOUBLE) * 1.0 + CAST(embedding[16] AS DOUBLE) * 1.0 + CAST(embedding[17] AS DOUBLE) * -1.0 + CAST(embedding[18] AS DOUBLE) * -1.0 + CAST(embedding[19] AS DOUBLE) * 1.0 + CAST(embedding[20] AS DOUBLE) * 1.0 + CAST(embedding[21] AS DOUBLE) * -1.0 + CAST(embedding[22] AS DOUBLE) * -1.0 + CAST(embedding[23] AS DOUBLE) * 1.0 + CAST(embedding[24] AS DOUBLE) * -1.0 + CAST(embedding[25] AS DOUBLE) * -1.0 + CAST(embedding[26] AS DOUBLE) * -1.0 + CAST(embedding[27] AS DOUBLE) * -1.0 + CAST(embedding[28] AS DOUBLE) * 1.0 + CAST(embedding[29] AS DOUBLE) * -1.0 + CAST(embedding[30] AS DOUBLE) * -1.0 + CAST(embedding[31] AS DOUBLE) * -1.0 + CAST(embedding[32] AS DOUBLE) * -1.0 + CAST(embedding[33] AS DOUBLE) * 1.0 + CAST(embedding[34] AS DOUBLE) * -1.0 + CAST(embedding[35] AS DOUBLE) * 1.0 + CAST(embedding[36] AS DOUBLE) * 1.0 + CAST(embedding[37] AS DOUBLE) * -1.0 + CAST(embedding[38] AS DOUBLE) * 1.0 + CAST(embedding[39] AS DOUBLE) * 1.0 + CAST(embedding[40] AS DOUBLE) * -1.0 + CAST(embedding[41] AS DOUBLE) * 1.0 + CAST(embedding[42] AS DOUBLE) * -1.0 + CAST(embedding[43] AS DOUBLE) * -1.0 + CAST(embedding[44] AS DOUBLE) * 1.0 + CAST(embedding[45] AS DOUBLE) * 1.0 + CAST(embedding[46] AS DOUBLE) * -1.0 + CAST(embedding[47] AS DOUBLE) * -1.0 + CAST(embedding[48] AS DOUBLE) * -1.0 + CAST(embedding[49] AS DOUBLE) * 1.0 + CAST(embedding[50] AS DOUBLE) * 1.0 + CAST(embedding[51] AS DOUBLE) * -1.0 + CAST(embedding[52] AS DOUBLE) * 1.0 + CAST(embedding[53] AS DOUBLE) * -1.0 + CAST(embedding[54] AS DOUBLE) * -1.0 + CAST(embedding[55] AS DOUBLE) * 1.0 + CAST(embedding[56] AS DOUBLE) * 1.0 + CAST(embedding[57] AS DOUBLE) * -1.0 + CAST(embedding[58] AS DOUBLE) * -1.0 + CAST(embedding[59] AS DOUBLE) * -1.0 + CAST(embedding[60] AS DOUBLE) * -1.0 + CAST(embedding[61] AS DOUBLE) * -1.0 + CAST(embedding[62] AS DOUBLE) * 1.0 + CAST(embedding[63] AS DOUBLE) * -1.0 + CAST(embedding[64] AS DOUBLE) * -1.0, 4) + 0.0 AS p2,
           round(0.0 + CAST(embedding[1] AS DOUBLE) * 1.0 + CAST(embedding[2] AS DOUBLE) * -1.0 + CAST(embedding[3] AS DOUBLE) * -1.0 + CAST(embedding[4] AS DOUBLE) * 1.0 + CAST(embedding[5] AS DOUBLE) * -1.0 + CAST(embedding[6] AS DOUBLE) * 1.0 + CAST(embedding[7] AS DOUBLE) * 1.0 + CAST(embedding[8] AS DOUBLE) * -1.0 + CAST(embedding[9] AS DOUBLE) * 1.0 + CAST(embedding[10] AS DOUBLE) * 1.0 + CAST(embedding[11] AS DOUBLE) * -1.0 + CAST(embedding[12] AS DOUBLE) * 1.0 + CAST(embedding[13] AS DOUBLE) * -1.0 + CAST(embedding[14] AS DOUBLE) * -1.0 + CAST(embedding[15] AS DOUBLE) * 1.0 + CAST(embedding[16] AS DOUBLE) * -1.0 + CAST(embedding[17] AS DOUBLE) * -1.0 + CAST(embedding[18] AS DOUBLE) * 1.0 + CAST(embedding[19] AS DOUBLE) * -1.0 + CAST(embedding[20] AS DOUBLE) * -1.0 + CAST(embedding[21] AS DOUBLE) * 1.0 + CAST(embedding[22] AS DOUBLE) * 1.0 + CAST(embedding[23] AS DOUBLE) * -1.0 + CAST(embedding[24] AS DOUBLE) * -1.0 + CAST(embedding[25] AS DOUBLE) * 1.0 + CAST(embedding[26] AS DOUBLE) * 1.0 + CAST(embedding[27] AS DOUBLE) * -1.0 + CAST(embedding[28] AS DOUBLE) * -1.0 + CAST(embedding[29] AS DOUBLE) * 1.0 + CAST(embedding[30] AS DOUBLE) * 1.0 + CAST(embedding[31] AS DOUBLE) * 1.0 + CAST(embedding[32] AS DOUBLE) * -1.0 + CAST(embedding[33] AS DOUBLE) * 1.0 + CAST(embedding[34] AS DOUBLE) * -1.0 + CAST(embedding[35] AS DOUBLE) * -1.0 + CAST(embedding[36] AS DOUBLE) * -1.0 + CAST(embedding[37] AS DOUBLE) * -1.0 + CAST(embedding[38] AS DOUBLE) * 1.0 + CAST(embedding[39] AS DOUBLE) * 1.0 + CAST(embedding[40] AS DOUBLE) * 1.0 + CAST(embedding[41] AS DOUBLE) * 1.0 + CAST(embedding[42] AS DOUBLE) * -1.0 + CAST(embedding[43] AS DOUBLE) * 1.0 + CAST(embedding[44] AS DOUBLE) * 1.0 + CAST(embedding[45] AS DOUBLE) * -1.0 + CAST(embedding[46] AS DOUBLE) * 1.0 + CAST(embedding[47] AS DOUBLE) * -1.0 + CAST(embedding[48] AS DOUBLE) * -1.0 + CAST(embedding[49] AS DOUBLE) * -1.0 + CAST(embedding[50] AS DOUBLE) * -1.0 + CAST(embedding[51] AS DOUBLE) * 1.0 + CAST(embedding[52] AS DOUBLE) * 1.0 + CAST(embedding[53] AS DOUBLE) * 1.0 + CAST(embedding[54] AS DOUBLE) * 1.0 + CAST(embedding[55] AS DOUBLE) * 1.0 + CAST(embedding[56] AS DOUBLE) * 1.0 + CAST(embedding[57] AS DOUBLE) * 1.0 + CAST(embedding[58] AS DOUBLE) * -1.0 + CAST(embedding[59] AS DOUBLE) * -1.0 + CAST(embedding[60] AS DOUBLE) * -1.0 + CAST(embedding[61] AS DOUBLE) * -1.0 + CAST(embedding[62] AS DOUBLE) * 1.0 + CAST(embedding[63] AS DOUBLE) * -1.0 + CAST(embedding[64] AS DOUBLE) * 1.0, 4) + 0.0 AS p3,
           round(0.0 + CAST(embedding[1] AS DOUBLE) * 1.0 + CAST(embedding[2] AS DOUBLE) * -1.0 + CAST(embedding[3] AS DOUBLE) * -1.0 + CAST(embedding[4] AS DOUBLE) * -1.0 + CAST(embedding[5] AS DOUBLE) * -1.0 + CAST(embedding[6] AS DOUBLE) * 1.0 + CAST(embedding[7] AS DOUBLE) * -1.0 + CAST(embedding[8] AS DOUBLE) * -1.0 + CAST(embedding[9] AS DOUBLE) * -1.0 + CAST(embedding[10] AS DOUBLE) * 1.0 + CAST(embedding[11] AS DOUBLE) * -1.0 + CAST(embedding[12] AS DOUBLE) * 1.0 + CAST(embedding[13] AS DOUBLE) * 1.0 + CAST(embedding[14] AS DOUBLE) * 1.0 + CAST(embedding[15] AS DOUBLE) * -1.0 + CAST(embedding[16] AS DOUBLE) * -1.0 + CAST(embedding[17] AS DOUBLE) * 1.0 + CAST(embedding[18] AS DOUBLE) * 1.0 + CAST(embedding[19] AS DOUBLE) * 1.0 + CAST(embedding[20] AS DOUBLE) * -1.0 + CAST(embedding[21] AS DOUBLE) * 1.0 + CAST(embedding[22] AS DOUBLE) * -1.0 + CAST(embedding[23] AS DOUBLE) * 1.0 + CAST(embedding[24] AS DOUBLE) * -1.0 + CAST(embedding[25] AS DOUBLE) * 1.0 + CAST(embedding[26] AS DOUBLE) * -1.0 + CAST(embedding[27] AS DOUBLE) * -1.0 + CAST(embedding[28] AS DOUBLE) * 1.0 + CAST(embedding[29] AS DOUBLE) * -1.0 + CAST(embedding[30] AS DOUBLE) * -1.0 + CAST(embedding[31] AS DOUBLE) * 1.0 + CAST(embedding[32] AS DOUBLE) * 1.0 + CAST(embedding[33] AS DOUBLE) * 1.0 + CAST(embedding[34] AS DOUBLE) * 1.0 + CAST(embedding[35] AS DOUBLE) * 1.0 + CAST(embedding[36] AS DOUBLE) * 1.0 + CAST(embedding[37] AS DOUBLE) * 1.0 + CAST(embedding[38] AS DOUBLE) * 1.0 + CAST(embedding[39] AS DOUBLE) * 1.0 + CAST(embedding[40] AS DOUBLE) * -1.0 + CAST(embedding[41] AS DOUBLE) * 1.0 + CAST(embedding[42] AS DOUBLE) * -1.0 + CAST(embedding[43] AS DOUBLE) * 1.0 + CAST(embedding[44] AS DOUBLE) * -1.0 + CAST(embedding[45] AS DOUBLE) * -1.0 + CAST(embedding[46] AS DOUBLE) * 1.0 + CAST(embedding[47] AS DOUBLE) * -1.0 + CAST(embedding[48] AS DOUBLE) * 1.0 + CAST(embedding[49] AS DOUBLE) * -1.0 + CAST(embedding[50] AS DOUBLE) * -1.0 + CAST(embedding[51] AS DOUBLE) * 1.0 + CAST(embedding[52] AS DOUBLE) * -1.0 + CAST(embedding[53] AS DOUBLE) * 1.0 + CAST(embedding[54] AS DOUBLE) * -1.0 + CAST(embedding[55] AS DOUBLE) * 1.0 + CAST(embedding[56] AS DOUBLE) * -1.0 + CAST(embedding[57] AS DOUBLE) * -1.0 + CAST(embedding[58] AS DOUBLE) * 1.0 + CAST(embedding[59] AS DOUBLE) * 1.0 + CAST(embedding[60] AS DOUBLE) * 1.0 + CAST(embedding[61] AS DOUBLE) * -1.0 + CAST(embedding[62] AS DOUBLE) * 1.0 + CAST(embedding[63] AS DOUBLE) * 1.0 + CAST(embedding[64] AS DOUBLE) * 1.0, 4) + 0.0 AS p4,
           round(0.0 + CAST(embedding[1] AS DOUBLE) * 1.0 + CAST(embedding[2] AS DOUBLE) * 1.0 + CAST(embedding[3] AS DOUBLE) * -1.0 + CAST(embedding[4] AS DOUBLE) * -1.0 + CAST(embedding[5] AS DOUBLE) * -1.0 + CAST(embedding[6] AS DOUBLE) * 1.0 + CAST(embedding[7] AS DOUBLE) * -1.0 + CAST(embedding[8] AS DOUBLE) * -1.0 + CAST(embedding[9] AS DOUBLE) * 1.0 + CAST(embedding[10] AS DOUBLE) * 1.0 + CAST(embedding[11] AS DOUBLE) * 1.0 + CAST(embedding[12] AS DOUBLE) * -1.0 + CAST(embedding[13] AS DOUBLE) * 1.0 + CAST(embedding[14] AS DOUBLE) * 1.0 + CAST(embedding[15] AS DOUBLE) * 1.0 + CAST(embedding[16] AS DOUBLE) * 1.0 + CAST(embedding[17] AS DOUBLE) * 1.0 + CAST(embedding[18] AS DOUBLE) * 1.0 + CAST(embedding[19] AS DOUBLE) * 1.0 + CAST(embedding[20] AS DOUBLE) * 1.0 + CAST(embedding[21] AS DOUBLE) * 1.0 + CAST(embedding[22] AS DOUBLE) * -1.0 + CAST(embedding[23] AS DOUBLE) * 1.0 + CAST(embedding[24] AS DOUBLE) * -1.0 + CAST(embedding[25] AS DOUBLE) * -1.0 + CAST(embedding[26] AS DOUBLE) * -1.0 + CAST(embedding[27] AS DOUBLE) * -1.0 + CAST(embedding[28] AS DOUBLE) * -1.0 + CAST(embedding[29] AS DOUBLE) * -1.0 + CAST(embedding[30] AS DOUBLE) * 1.0 + CAST(embedding[31] AS DOUBLE) * 1.0 + CAST(embedding[32] AS DOUBLE) * 1.0 + CAST(embedding[33] AS DOUBLE) * -1.0 + CAST(embedding[34] AS DOUBLE) * 1.0 + CAST(embedding[35] AS DOUBLE) * 1.0 + CAST(embedding[36] AS DOUBLE) * -1.0 + CAST(embedding[37] AS DOUBLE) * -1.0 + CAST(embedding[38] AS DOUBLE) * 1.0 + CAST(embedding[39] AS DOUBLE) * -1.0 + CAST(embedding[40] AS DOUBLE) * -1.0 + CAST(embedding[41] AS DOUBLE) * 1.0 + CAST(embedding[42] AS DOUBLE) * -1.0 + CAST(embedding[43] AS DOUBLE) * 1.0 + CAST(embedding[44] AS DOUBLE) * -1.0 + CAST(embedding[45] AS DOUBLE) * 1.0 + CAST(embedding[46] AS DOUBLE) * -1.0 + CAST(embedding[47] AS DOUBLE) * 1.0 + CAST(embedding[48] AS DOUBLE) * 1.0 + CAST(embedding[49] AS DOUBLE) * -1.0 + CAST(embedding[50] AS DOUBLE) * 1.0 + CAST(embedding[51] AS DOUBLE) * 1.0 + CAST(embedding[52] AS DOUBLE) * -1.0 + CAST(embedding[53] AS DOUBLE) * 1.0 + CAST(embedding[54] AS DOUBLE) * -1.0 + CAST(embedding[55] AS DOUBLE) * 1.0 + CAST(embedding[56] AS DOUBLE) * -1.0 + CAST(embedding[57] AS DOUBLE) * -1.0 + CAST(embedding[58] AS DOUBLE) * -1.0 + CAST(embedding[59] AS DOUBLE) * 1.0 + CAST(embedding[60] AS DOUBLE) * 1.0 + CAST(embedding[61] AS DOUBLE) * -1.0 + CAST(embedding[62] AS DOUBLE) * -1.0 + CAST(embedding[63] AS DOUBLE) * 1.0 + CAST(embedding[64] AS DOUBLE) * -1.0, 4) + 0.0 AS p5,
           round(0.0 + CAST(embedding[1] AS DOUBLE) * -1.0 + CAST(embedding[2] AS DOUBLE) * -1.0 + CAST(embedding[3] AS DOUBLE) * 1.0 + CAST(embedding[4] AS DOUBLE) * -1.0 + CAST(embedding[5] AS DOUBLE) * -1.0 + CAST(embedding[6] AS DOUBLE) * -1.0 + CAST(embedding[7] AS DOUBLE) * 1.0 + CAST(embedding[8] AS DOUBLE) * -1.0 + CAST(embedding[9] AS DOUBLE) * -1.0 + CAST(embedding[10] AS DOUBLE) * 1.0 + CAST(embedding[11] AS DOUBLE) * -1.0 + CAST(embedding[12] AS DOUBLE) * 1.0 + CAST(embedding[13] AS DOUBLE) * -1.0 + CAST(embedding[14] AS DOUBLE) * -1.0 + CAST(embedding[15] AS DOUBLE) * 1.0 + CAST(embedding[16] AS DOUBLE) * -1.0 + CAST(embedding[17] AS DOUBLE) * 1.0 + CAST(embedding[18] AS DOUBLE) * 1.0 + CAST(embedding[19] AS DOUBLE) * -1.0 + CAST(embedding[20] AS DOUBLE) * 1.0 + CAST(embedding[21] AS DOUBLE) * -1.0 + CAST(embedding[22] AS DOUBLE) * 1.0 + CAST(embedding[23] AS DOUBLE) * 1.0 + CAST(embedding[24] AS DOUBLE) * 1.0 + CAST(embedding[25] AS DOUBLE) * 1.0 + CAST(embedding[26] AS DOUBLE) * 1.0 + CAST(embedding[27] AS DOUBLE) * 1.0 + CAST(embedding[28] AS DOUBLE) * 1.0 + CAST(embedding[29] AS DOUBLE) * -1.0 + CAST(embedding[30] AS DOUBLE) * -1.0 + CAST(embedding[31] AS DOUBLE) * 1.0 + CAST(embedding[32] AS DOUBLE) * -1.0 + CAST(embedding[33] AS DOUBLE) * -1.0 + CAST(embedding[34] AS DOUBLE) * -1.0 + CAST(embedding[35] AS DOUBLE) * 1.0 + CAST(embedding[36] AS DOUBLE) * -1.0 + CAST(embedding[37] AS DOUBLE) * -1.0 + CAST(embedding[38] AS DOUBLE) * -1.0 + CAST(embedding[39] AS DOUBLE) * 1.0 + CAST(embedding[40] AS DOUBLE) * -1.0 + CAST(embedding[41] AS DOUBLE) * 1.0 + CAST(embedding[42] AS DOUBLE) * -1.0 + CAST(embedding[43] AS DOUBLE) * -1.0 + CAST(embedding[44] AS DOUBLE) * 1.0 + CAST(embedding[45] AS DOUBLE) * 1.0 + CAST(embedding[46] AS DOUBLE) * 1.0 + CAST(embedding[47] AS DOUBLE) * 1.0 + CAST(embedding[48] AS DOUBLE) * -1.0 + CAST(embedding[49] AS DOUBLE) * 1.0 + CAST(embedding[50] AS DOUBLE) * 1.0 + CAST(embedding[51] AS DOUBLE) * 1.0 + CAST(embedding[52] AS DOUBLE) * 1.0 + CAST(embedding[53] AS DOUBLE) * 1.0 + CAST(embedding[54] AS DOUBLE) * -1.0 + CAST(embedding[55] AS DOUBLE) * -1.0 + CAST(embedding[56] AS DOUBLE) * 1.0 + CAST(embedding[57] AS DOUBLE) * -1.0 + CAST(embedding[58] AS DOUBLE) * 1.0 + CAST(embedding[59] AS DOUBLE) * -1.0 + CAST(embedding[60] AS DOUBLE) * -1.0 + CAST(embedding[61] AS DOUBLE) * 1.0 + CAST(embedding[62] AS DOUBLE) * 1.0 + CAST(embedding[63] AS DOUBLE) * 1.0 + CAST(embedding[64] AS DOUBLE) * 1.0, 4) + 0.0 AS p6,
           round(0.0 + CAST(embedding[1] AS DOUBLE) * -1.0 + CAST(embedding[2] AS DOUBLE) * -1.0 + CAST(embedding[3] AS DOUBLE) * -1.0 + CAST(embedding[4] AS DOUBLE) * 1.0 + CAST(embedding[5] AS DOUBLE) * -1.0 + CAST(embedding[6] AS DOUBLE) * 1.0 + CAST(embedding[7] AS DOUBLE) * 1.0 + CAST(embedding[8] AS DOUBLE) * 1.0 + CAST(embedding[9] AS DOUBLE) * 1.0 + CAST(embedding[10] AS DOUBLE) * 1.0 + CAST(embedding[11] AS DOUBLE) * 1.0 + CAST(embedding[12] AS DOUBLE) * 1.0 + CAST(embedding[13] AS DOUBLE) * 1.0 + CAST(embedding[14] AS DOUBLE) * 1.0 + CAST(embedding[15] AS DOUBLE) * 1.0 + CAST(embedding[16] AS DOUBLE) * 1.0 + CAST(embedding[17] AS DOUBLE) * -1.0 + CAST(embedding[18] AS DOUBLE) * 1.0 + CAST(embedding[19] AS DOUBLE) * -1.0 + CAST(embedding[20] AS DOUBLE) * -1.0 + CAST(embedding[21] AS DOUBLE) * -1.0 + CAST(embedding[22] AS DOUBLE) * 1.0 + CAST(embedding[23] AS DOUBLE) * 1.0 + CAST(embedding[24] AS DOUBLE) * -1.0 + CAST(embedding[25] AS DOUBLE) * -1.0 + CAST(embedding[26] AS DOUBLE) * 1.0 + CAST(embedding[27] AS DOUBLE) * 1.0 + CAST(embedding[28] AS DOUBLE) * 1.0 + CAST(embedding[29] AS DOUBLE) * 1.0 + CAST(embedding[30] AS DOUBLE) * -1.0 + CAST(embedding[31] AS DOUBLE) * -1.0 + CAST(embedding[32] AS DOUBLE) * 1.0 + CAST(embedding[33] AS DOUBLE) * -1.0 + CAST(embedding[34] AS DOUBLE) * -1.0 + CAST(embedding[35] AS DOUBLE) * 1.0 + CAST(embedding[36] AS DOUBLE) * 1.0 + CAST(embedding[37] AS DOUBLE) * -1.0 + CAST(embedding[38] AS DOUBLE) * 1.0 + CAST(embedding[39] AS DOUBLE) * 1.0 + CAST(embedding[40] AS DOUBLE) * -1.0 + CAST(embedding[41] AS DOUBLE) * 1.0 + CAST(embedding[42] AS DOUBLE) * 1.0 + CAST(embedding[43] AS DOUBLE) * 1.0 + CAST(embedding[44] AS DOUBLE) * 1.0 + CAST(embedding[45] AS DOUBLE) * -1.0 + CAST(embedding[46] AS DOUBLE) * 1.0 + CAST(embedding[47] AS DOUBLE) * 1.0 + CAST(embedding[48] AS DOUBLE) * 1.0 + CAST(embedding[49] AS DOUBLE) * 1.0 + CAST(embedding[50] AS DOUBLE) * 1.0 + CAST(embedding[51] AS DOUBLE) * 1.0 + CAST(embedding[52] AS DOUBLE) * -1.0 + CAST(embedding[53] AS DOUBLE) * -1.0 + CAST(embedding[54] AS DOUBLE) * -1.0 + CAST(embedding[55] AS DOUBLE) * -1.0 + CAST(embedding[56] AS DOUBLE) * -1.0 + CAST(embedding[57] AS DOUBLE) * 1.0 + CAST(embedding[58] AS DOUBLE) * -1.0 + CAST(embedding[59] AS DOUBLE) * -1.0 + CAST(embedding[60] AS DOUBLE) * 1.0 + CAST(embedding[61] AS DOUBLE) * 1.0 + CAST(embedding[62] AS DOUBLE) * 1.0 + CAST(embedding[63] AS DOUBLE) * 1.0 + CAST(embedding[64] AS DOUBLE) * -1.0, 4) + 0.0 AS p7
    FROM embeddings
    """,
)
def q130_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign random projection 64 -> 8 (operators/similarity.
    random_projection, Achlioptas/JL): the +-1 matrix is md5-derived and
    constant-folded into the plan; zero shuffle, pure codegen row work —
    the distance-preserving shrink step ahead of LSH/ANN at corpus
    scale. The oracle carries the identical literal matrix with the same
    left-fold addition order, so values match to the bit before the
    4 dp round."""
    from etl_jetro_spark.operators.similarity import random_projection

    e = load(spark, sf_dir, "embeddings")
    out = random_projection(e, "vec_id", "embedding", out_dims=8, in_dims=64)
    return out.select(
        "vec_id",
        # + 0.0 after the round: a projection in (-5e-5, 0)
        # rounds to -0.0 and the sign is engine-dependent print
        # luck (negzerolint sf3 catch, round 11)
        *[(F.round(f"p{j}", 4) + F.lit(0.0)).alias(f"p{j}") for j in range(8)]
    )


@query(
    "q131_group_regression",
    """
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT)                            AS n,
           round(regr_slope(l_extendedprice, l_quantity), 4)   AS slope,
           round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
           round(regr_r2(l_extendedprice, l_quantity), 6)      AS r2
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q131_group_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group OLS regression line (price vs quantity) via the
    algebraic regr_* aggregates — slope/intercept/R² from one partial-agg
    pass (sums and cross-moments combine associatively; no per-group
    matrix, no second scan). The canonical distributed-regression shape
    at any scale."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(F.regr_slope("l_extendedprice", "l_quantity"), 4).alias("slope"),
        F.round(
            F.regr_intercept("l_extendedprice", "l_quantity"), 4
        ).alias("intercept"),
        F.round(F.regr_r2("l_extendedprice", "l_quantity"), 6).alias("r2"),
    )


@query(
    "q132_group_mode",
    """
    WITH c AS (
      SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS cnt
      FROM events GROUP BY 1, 2
    ),
    r AS (
      SELECT *, row_number() OVER (PARTITION BY user_id
                                   ORDER BY cnt DESC, event_type) AS rn
      FROM c
    )
    SELECT user_id, event_type AS mode_event, cnt FROM r WHERE rn = 1
    """,
)
def q132_group_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DETERMINISTIC per-group mode (most frequent event type per user,
    ties by smallest type): count partial-agg, then a min-struct argmax —
    one candidate per map task, NO window sort and no reliance on the
    engines' tie-arbitrary ``mode()`` aggregates."""
    e = load_events(spark, sf_dir)
    c = e.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    best = c.groupBy("user_id").agg(
        F.min(F.struct((-F.col("cnt")).alias("_negc"), F.col("event_type").alias("_t"))).alias("_b")
    )
    return best.select(
        "user_id",
        F.col("_b._t").alias("mode_event"),
        (-F.col("_b._negc")).cast("long").alias("cnt"),
    )


@query(
    "q133_winsorized_stats",
    f"""
    WITH r AS (
      SELECT event_type, value AS v,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY value) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM events WHERE value IS NOT NULL
    ),
    b AS (
      SELECT event_type,
             {_SQL_PCTL('0.05')} AS lo,
             {_SQL_PCTL('0.95')} AS hi
      FROM r GROUP BY event_type
    )
    SELECT e.event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN e.value < b.lo OR e.value > b.hi
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped,
           round(avg(least(greatest(e.value, b.lo), b.hi)), 6) AS winsor_mean,
           round(avg(e.value), 6) AS raw_mean
    FROM events e JOIN b USING (event_type)
    GROUP BY e.event_type
    """,
)
def q133_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized per-group statistics: values clip to the group's exact
    [p05, p95] before the mean — the robust-stats companion to q122's
    MAD. Bounds come from the DISTRIBUTED exact-percentile operator
    (range-partitioned parallel sort, no per-group multiset buffering)
    and broadcast back as a groups-sized dim; the clip+mean is one
    partial-agg pass."""
    from etl_jetro_spark.operators.aggregate import exact_group_percentiles

    e = load_events(spark, sf_dir)
    b = exact_group_percentiles(
        e, ["event_type"], "value", {"lo": 0.05, "hi": 0.95}
    )
    j = e.join(bcast_small(b), "event_type")
    clipped = F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi"))
    return j.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(
            ((F.col("value") < F.col("lo")) | (F.col("value") > F.col("hi"))).cast("long")
        ).cast("long").alias("n_clipped"),
        F.round(F.avg(clipped), 6).alias("winsor_mean"),
        F.round(F.avg("value"), 6).alias("raw_mean"),
    )


@query(
    "q134_token_entropy",
    f"""
    WITH toks AS (
      SELECT doc_id, t.t AS token
      FROM (SELECT doc_id, {DK_WORDS} AS w FROM documents) d,
           UNNEST(w) AS t(t)
      WHERE t.t <> ''
    ),
    c AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS c
          FROM toks GROUP BY 1, 2)
    SELECT doc_id,
           CAST(sum(c) AS BIGINT)   AS n_tokens,
           CAST(count(*) AS BIGINT) AS n_distinct,
           round(ln(sum(c)) - sum(c * ln(c)) / sum(c), 6) AS entropy
    FROM c GROUP BY doc_id
    """,
)
def q134_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Shannon entropy of the token distribution
    (H = ln n − Σ c·ln c / n) — the repetition/diversity quality signal
    next to q24/q67. Two partial-agg shuffles over (doc, token) counts;
    nothing vocabulary-wide is ever held."""
    from etl_jetro_spark.functions.hashing import norm_text

    d = load(spark, sf_dir, "documents")
    toks = (
        d.select(
            "doc_id",
            F.explode(F.split(norm_text("text"), " ")).alias("token"),
        )
        .filter(F.col("token") != "")
    )
    c = toks.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("c"))
    return c.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
        F.round(
            F.log(F.sum("c")) - F.sum(F.col("c") * F.log("c")) / F.sum("c"), 6
        ).alias("entropy"),
    )


@query(
    "q135_sorted_neighborhood",
    f"""
    WITH t AS (SELECT doc_id, lang, substr({DK_NORM_TEXT}, 1, 20) AS sk
               FROM documents),
    r AS (SELECT doc_id, lang,
                 row_number() OVER (PARTITION BY lang ORDER BY sk, doc_id) AS rk
          FROM t),
    cand AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST(b.rk - a.rk AS BIGINT) AS rank_dist
      FROM r a JOIN r b ON a.lang = b.lang AND b.rk - a.rk BETWEEN 1 AND 3
    ),
    {_dk_shingles_cte(3)},
    dsh AS (SELECT DISTINCT doc_id, sh FROM sh),
    sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM dsh GROUP BY 1),
    common AS (
      SELECT c.id_a, c.id_b, CAST(count(*) AS BIGINT) AS c
      FROM cand c
      JOIN dsh x ON x.doc_id = c.id_a
      JOIN dsh y ON y.doc_id = c.id_b AND y.sh = x.sh
      GROUP BY 1, 2
    )
    SELECT c.id_a, c.id_b, c.rank_dist,
           round(coalesce(cm.c, 0) / CAST(na.n + nb.n - coalesce(cm.c, 0)
                 AS DOUBLE), 6) AS jaccard
    FROM cand c
    LEFT JOIN common cm ON cm.id_a = c.id_a AND cm.id_b = c.id_b
    JOIN sizes na ON na.doc_id = c.id_a
    JOIN sizes nb ON nb.doc_id = c.id_b
    """,
)
def q135_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked sorted-neighborhood candidate generation (Hernández/Stolfo
    1995, the entity-resolution classic): within each lang block, docs
    sort by a 20-char normalized prefix key; each doc pairs with its <=3
    sort neighbors (lead over the per-block window — a PARTITIONED sort,
    never a single-task global one), then exact word-3-gram Jaccard is
    verified on doc-bounded hashed shingle arrays. The complementary
    candidate family to LSH (q18) and prefix filtering (q124): O(n·w)
    candidates from one sort, catching prefix-similar pairs that banding
    can miss."""
    from etl_jetro_spark.functions.hashing import norm_text
    from etl_jetro_spark.operators.aggregate import group_ranked

    d = load(spark, sf_dir, "documents")
    keyed = d.select(
        "doc_id", "lang", F.substring(norm_text("text"), 1, 20).alias("sk")
    )
    # ranks from the DISTRIBUTED rank frame (range partition + metadata
    # offsets): a per-lang window would serialize each block — with a
    # handful of langs that is a handful of tasks however big the corpus.
    # Neighbor pairs come from rank-equi-joins (rk+d = rk), hash-
    # distributed on (lang, rk), not window lead()s.
    ranked = group_ranked(
        keyed, ["lang"], "sk", tiebreak=["doc_id"]
    ).select("lang", "doc_id", "_rn").localCheckpoint(eager=False)
    cands = None
    for k in (1, 2, 3):
        a = ranked.select(
            "lang",
            F.col("doc_id").alias("id_a"),
            (F.col("_rn") + k).alias("_rn"),
        )
        b = ranked.select("lang", F.col("doc_id").alias("id_b"), "_rn")
        c = a.join(b, ["lang", "_rn"]).select(
            "id_a", "id_b", F.lit(k).cast("long").alias("rank_dist")
        )
        cands = c if cands is None else cands.unionByName(c)
    # Per-doc hashed shingle sets: explode -> distinct -> groupBy/
    # collect_list. Two r11 alternatives MEASURED SLOWER, do not redo:
    # (a) building the per-doc array with the word_shingles HOF
    # (CodegenFallback, 15.1 s vs 2.9 s); (b) collect_set over the raw
    # exploded rows to save the distinct Exchange (ObjectHashAggregate
    # set-union cost exceeds the saved shuffle, 4.4 s vs 2.9 s).
    from etl_jetro_spark.operators.dedup import shingle_rows

    sh = shingle_rows(d, "doc_id", "text", 3, distinct=True)
    sh_h = F.conv(F.substring(F.md5("_sh"), 1, 15), 16, 10).cast("long")
    sets = sh.groupBy("_id").agg(
        F.sort_array(F.collect_list(sh_h)).alias("_set"),
        F.count(F.lit(1)).alias("_n"),
    )
    a = sets.select(
        F.col("_id").alias("id_a"), F.col("_set").alias("_sa"), F.col("_n").alias("_na")
    )
    b = sets.select(
        F.col("_id").alias("id_b"), F.col("_set").alias("_sb"), F.col("_n").alias("_nb")
    )
    common = F.size(F.array_intersect("_sa", "_sb"))
    return (
        cands.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            "rank_dist",
            F.round(
                common / (F.col("_na") + F.col("_nb") - common), 6
            ).alias("jaccard"),
        )
    )


@query(
    "q136_topk_orders_ranked",
    """
    WITH r AS (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rk
      FROM orders
    )
    SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS totalprice,
           CAST(rk AS BIGINT) AS rk
    FROM r WHERE rk <= 3
    """,
)
def q136_topk_orders_ranked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer through the DISTRIBUTED rank frame
    (aggregate.group_ranked on descending-encoded price, orderkey
    tiebreak) — the raw-row-scale form of q107's window top-k: a group
    whose rows dwarf one executor still ranks, because range
    partitioning spreads it and only metadata offsets cross tasks."""
    from etl_jetro_spark.operators.aggregate import group_ranked

    o = load(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        (-F.col("o_totalprice")).alias("_negp"),
    )
    ranked = group_ranked(o, ["o_custkey"], "_negp", tiebreak=["o_orderkey"])
    return (
        ranked.filter(F.col("_rn") <= 3)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round((-F.col("_v")), 2).alias("totalprice"),
            F.col("_rn").cast("long").alias("rk"),
        )
    )


@query(
    "q137_shingle_novelty",
    f"""
    WITH {_dk_shingles_cte(3)},
    dsh AS (SELECT DISTINCT doc_id, sh FROM sh),
    firsts AS (SELECT sh, min(doc_id) AS first_doc FROM dsh GROUP BY sh)
    SELECT d.doc_id,
           CAST(count(*) AS BIGINT) AS n_shingles,
           CAST(sum(CASE WHEN f.first_doc = d.doc_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_novel,
           round(sum(CASE WHEN f.first_doc = d.doc_id THEN 1 ELSE 0 END)
                 / CAST(count(*) AS DOUBLE), 6) AS novelty
    FROM dsh d JOIN firsts f USING (sh)
    GROUP BY d.doc_id
    """,
)
def q137_shingle_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document novelty — the fraction of a doc's distinct shingles
    appearing for the FIRST time in corpus order (min doc id as the
    deterministic ingest-order stand-in): the curation signal that
    separates fresh content from recombined boilerplate.

    Restructured r11: a novel shingle is attributed to exactly ONE doc
    (its min-id first seer), so n_novel per doc is a count over the
    first-seen frame itself — the old shape shuffled the full distinct
    index (distinct), shuffled it again for the first-seen agg, then
    joined the VOCABULARY-sized firsts frame back onto the index and
    re-aggregated every posting. Now both outputs come from ONE shared
    barriered exploded index (the codegen arrays_zip explode — the
    array-building HOF alternative is CodegenFallback and measured 8x
    slower): n_shingles is a per-doc distinct count, and n_novel is
    min per shingle (distinct-insensitive, so no explicit distinct
    pass) followed by an NDV-bounded count of firsts per winning doc.
    No vocabulary-sized frame is joined back onto the full index."""
    from etl_jetro_spark.operators.dedup import shingle_rows

    d = load(spark, sf_dir, "documents")
    # The DISTINCT index is barriered and shared (its dedup Exchange
    # shrinks it enough that caching beats recomputing — the raw
    # unbarriered index + countDistinct measured 3.2 s vs 1.7 s);
    # n_shingles is then a plain count per doc.
    dsh = shingle_rows(d, "doc_id", "text", 3, distinct=True).localCheckpoint(
        eager=False
    )
    nsh = dsh.groupBy(F.col("_id").alias("doc_id")).agg(
        F.count(F.lit(1)).cast("long").alias("n_shingles")
    )
    # first-seen counts: min per shingle (dup rows cannot change a min),
    # then count of firsts per winning doc — both NDV-bounded outputs
    novel = (
        dsh.groupBy("_sh")
        .agg(F.min("_id").alias("_first"))
        .groupBy(F.col("_first").alias("doc_id"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_novel"))
    )
    return nsh.join(novel, "doc_id", "left").select(
        "doc_id",
        "n_shingles",
        F.coalesce(F.col("n_novel"), F.lit(0)).cast("long").alias("n_novel"),
        F.round(
            F.coalesce(F.col("n_novel"), F.lit(0)) / F.col("n_shingles"), 6
        ).alias("novelty"),
    )


@query(
    "q138_event_runs",
    """
    WITH o AS (
      SELECT user_id, event_type,
             CAST(floor(epoch(ts)) AS BIGINT) AS t, event_id
      FROM events
    ),
    m AS (
      SELECT *, lag(event_type) OVER w AS prev FROM o
      WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)
    ),
    s AS (
      SELECT *, sum(CASE WHEN prev IS NULL OR prev <> event_type
                    THEN 1 ELSE 0 END)
                  OVER (PARTITION BY user_id ORDER BY t, event_id
                        ROWS UNBOUNDED PRECEDING) AS run_id
      FROM m
    )
    SELECT user_id, CAST(run_id AS BIGINT) AS run_id, event_type,
           CAST(count(*) AS BIGINT) AS run_len,
           CAST(min(t) AS BIGINT) AS run_start
    FROM s GROUP BY user_id, run_id, event_type
    """,
)
def q138_event_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run-length encoding of consecutive same-type events per user (the
    lag-mark-cumsum idiom shared with sessionization/SCD2): per-user
    windows over (time, id) — one shuffle+sort reused by both window
    passes, group cardinality = users, no serialization hotspot."""
    from pyspark.sql import Window

    e = load_events(spark, sf_dir)
    t = F.expr("ts div 1000000000")
    o = e.select("user_id", "event_type", t.alias("t"), "event_id")
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    marked = o.withColumn("_prev", F.lag("event_type").over(w))
    runs = marked.withColumn(
        "run_id",
        F.sum(
            (F.col("_prev").isNull() | (F.col("_prev") != F.col("event_type"))).cast("long")
        ).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return runs.groupBy("user_id", "run_id", "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("run_len"),
        F.min("t").cast("long").alias("run_start"),
    )


@query(
    "q139_revenue_share",
    f"""
    WITH rev AS (
      SELECT r_name AS region, n_name AS nation,
             {sql_exact_money_sum('o_totalprice', dp=2)} AS revenue
      FROM orders
      JOIN customer ON c_custkey = o_custkey
      JOIN nation ON n_nationkey = c_nationkey
      JOIN region ON r_regionkey = n_regionkey
      GROUP BY 1, 2
    )
    SELECT region, nation, revenue,
           round(revenue / sum(revenue) OVER (PARTITION BY region), 6)
             AS region_share,
           round(revenue / sum(revenue) OVER (), 6) AS global_share
    FROM rev
    """,
)
def q139_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-total contribution analysis: nation revenue with its
    share of region and of the world. The denominators are re-aggregates
    of the post-agg frame joined back broadcast (region totals) /
    crossJoin broadcast (the one-row global total) — no empty-partition-
    spec window anywhere (round-4 verdict: Spark never prunes those, and
    even a "25-row" global window poisons every window stacked above it
    into the same SinglePartition exchange). Joins ride broadcast dims."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    rev = (
        o.join(bcast_sized(c), o.o_custkey == c.c_custkey)
        .join(bcast_small(n), c.c_nationkey == n.n_nationkey)
        .join(bcast_small(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(M.exact_money_sum("o_totalprice", dp=2).alias("revenue"))
    )
    rtot = rev.groupBy("region").agg(F.sum("revenue").alias("_rt"))
    gtot = rev.agg(F.sum("revenue").alias("_gt"))
    return (
        rev.join(bcast_small(rtot), "region")
        .crossJoin(bcast_small(gtot))
        .select(
            "region",
            "nation",
            "revenue",
            F.round(F.col("revenue") / F.col("_rt"), 6).alias("region_share"),
            F.round(F.col("revenue") / F.col("_gt"), 6).alias("global_share"),
        )
    )


@query(
    "q140_priority_transitions",
    """
    WITH o AS (
      SELECT o_custkey, o_orderpriority,
             CAST(floor(epoch(o_orderdate)) AS BIGINT) AS t, o_orderkey
      FROM orders
    ),
    m AS (
      SELECT o_custkey, o_orderpriority AS to_p,
             lag(o_orderpriority) OVER (PARTITION BY o_custkey
                                        ORDER BY t, o_orderkey) AS from_p
      FROM o
    )
    SELECT from_p, to_p, CAST(count(*) AS BIGINT) AS n
    FROM m WHERE from_p IS NOT NULL
    GROUP BY 1, 2
    """,
)
def q140_priority_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-priority transition matrix (the Markov-count shape behind
    behavioral next-step models): per-customer lag over (date, key),
    then a 25-cell aggregate. One (key, time) shuffle+sort; the matrix
    is alphabet², never data-sized."""
    from pyspark.sql import Window

    from etl_jetro_spark.functions.dates import epoch_seconds_ntz

    o = load(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderpriority",
        epoch_seconds_ntz("o_orderdate").alias("t"),
        "o_orderkey",
    )
    w = Window.partitionBy("o_custkey").orderBy("t", "o_orderkey")
    m = o.select(
        F.col("o_orderpriority").alias("to_p"),
        F.lag("o_orderpriority").over(w).alias("from_p"),
    ).filter(F.col("from_p").isNotNull())
    return m.groupBy("from_p", "to_p").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )


@query(
    "q141_pmi_collocations",
    f"""
    WITH wrds AS (SELECT doc_id, string_split({DK_NORM_TEXT}, ' ') AS w
                  FROM documents),
    uni AS (
      SELECT w[i] AS t, count(*) AS n1
      FROM wrds, UNNEST(generate_series(1, len(w))) AS s(i)
      WHERE w[i] <> ''
      GROUP BY 1
    ),
    tot AS (SELECT CAST(sum(n1) AS BIGINT) AS N FROM uni),
    bi AS (
      SELECT w[i] || ' ' || w[i+1] AS bigram, w[i] AS w1, w[i+1] AS w2,
             count(*) AS n_ab
      FROM wrds, UNNEST(generate_series(1, greatest(len(w) - 1, 0))) AS s(i)
      WHERE w[i] <> ''
      GROUP BY 1, 2, 3
      HAVING count(*) >= 5
    )
    SELECT bigram, CAST(n_ab AS BIGINT) AS n_ab,
           CAST(a.n1 AS BIGINT) AS n_a, CAST(b.n1 AS BIGINT) AS n_b,
           round((n_ab * N) / (a.n1 * b.n1), 6) AS lift
    FROM bi JOIN uni a ON a.t = bi.w1 JOIN uni b ON b.t = bi.w2 CROSS JOIN tot
    ORDER BY lift DESC, bigram LIMIT 25
    """,
)
def q141_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-25 bigram collocations by PMI lift (textstats.pmi_collocations)
    — tokenizer-merge / boilerplate-phrase mining over the corpus. Counts
    partial-agg on partition-local shingles; vocabulary-sized frames only
    join, never broadcast; the lift is log-free so it hashes identically
    cross-engine."""
    from etl_jetro_spark.operators.textstats import pmi_collocations

    d = load(spark, sf_dir, "documents")
    return pmi_collocations(d, "doc_id", "text", min_count=5, k=25)


@query(
    "q142_distribution_drift",
    """
    WITH b AS (SELECT CAST(min(epoch_ns(ts)) AS BIGINT) AS tmin,
                      CAST(max(epoch_ns(ts)) AS BIGINT) AS tmax,
                      min(value) AS vmin, max(value) AS vmax
               FROM events),
    cells AS (
      SELECT event_type AS g,
             CASE WHEN (CAST(epoch_ns(ts) AS BIGINT) - tmin) * 2
                       >= (tmax - tmin) THEN 1 ELSE 0 END AS h,
             CASE WHEN vmax = vmin THEN 0
                  ELSE least(9, CAST(floor(((value - vmin) * 10) / (vmax - vmin))
                                     AS INT)) END AS bin,
             count(*) AS c
      FROM events CROSS JOIN b
      WHERE value IS NOT NULL
      GROUP BY 1, 2, 3
    ),
    tt AS (SELECT g, h, sum(c) AS n FROM cells GROUP BY 1, 2),
    p0 AS (SELECT g, bin, c AS c0 FROM cells WHERE h = 0),
    p1 AS (SELECT g, bin, c AS c1 FROM cells WHERE h = 1),
    n0 AS (SELECT g, n AS n0 FROM tt WHERE h = 0),
    n1 AS (SELECT g, n AS n1 FROM tt WHERE h = 1),
    j AS (
      SELECT coalesce(p0.g, p1.g) AS g, coalesce(p0.bin, p1.bin) AS bin,
             coalesce(c0, 0) AS c0, coalesce(c1, 0) AS c1
      FROM p0 FULL JOIN p1 ON p0.g = p1.g AND p0.bin = p1.bin
    )
    SELECT j.g AS event_type, CAST(any_value(n0.n0) AS BIGINT) AS n_first,
           CAST(any_value(n1.n1) AS BIGINT) AS n_second,
           round(sum(abs(c0 / n0.n0 - c1 / n1.n1)) / 2, 6) AS tvd
    FROM j JOIN n0 ON n0.g = j.g JOIN n1 ON n1.g = j.g
    GROUP BY 1
    """,
)
def q142_distribution_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type distribution drift between the stream's two time
    halves (profile.distribution_drift_tvd): equi-width 10-bin histograms
    compared by total variation distance — the PSI-style monitor with
    log-free (hash-stable) arithmetic. One wide shuffle (type × half ×
    bin partials); everything after is groups-sized. Integer split
    arithmetic: epoch-ns values exceed double's exact range."""
    from etl_jetro_spark.operators.profile import distribution_drift_tvd

    e = load_events(spark, sf_dir)
    return distribution_drift_tvd(e, "event_type", "value", "ts", bins=10)


@query(
    "q143_quality_gate",
    f"""
    WITH base AS (SELECT doc_id, {DK_NORM_TEXT} AS t FROM documents),
    f AS (
      SELECT doc_id, t,
             list_filter(string_split(t, ' '), x -> x <> '') AS w
      FROM base
    ),
    feat AS (
      SELECT doc_id,
             CAST(len(w) AS INT) AS n_tokens,
             CASE WHEN len(w) > 0 THEN
               round((len(t) - (len(w) - 1)) / CAST(len(w) AS DOUBLE), 6)
             END AS mean_word_len,
             CASE WHEN len(w) > 0 THEN
               round(len(list_filter(w, x -> list_contains({_dk_stop_list('en')}, x)))
                     / CAST(len(w) AS DOUBLE), 6)
             END AS stop_frac,
             CASE WHEN len(w) > 0 THEN
               round(len(list_distinct(w)) / CAST(len(w) AS DOUBLE), 6)
             END AS distinct_frac
      FROM f
    ),
    v AS (
      SELECT *,
        CASE WHEN n_tokens < 10 THEN 'too_short'
             WHEN n_tokens > 100000 THEN 'too_long'
             WHEN mean_word_len < 2.5 OR mean_word_len > 12.0 THEN 'word_length'
             WHEN stop_frac < 0.05 THEN 'low_stopword'
             WHEN distinct_frac < 0.3 THEN 'repetitive'
        END AS first_violation
      FROM feat
    )
    SELECT doc_id, n_tokens, mean_word_len, stop_frac, distinct_frac,
           first_violation IS NULL AS keep, first_violation
    FROM v
    """,
)
def q143_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style composite quality gate (textstats.quality_gate):
    keep/drop verdict + first failing rule per document — the pretraining
    filter pass with curation telemetry. Entirely partition-local
    expressions over the normalized token array (distinct-token ratio via
    array_distinct, no shuffle); runs at parquet-scan speed."""
    from etl_jetro_spark.operators.textstats import quality_gate

    d = load(spark, sf_dir, "documents")
    return quality_gate(d, "doc_id", "text")


@query(
    "q144_minhash_estimator_error",
    f"""
    WITH {_dk_shingles_cte(3)},
    mh AS (
      SELECT d.doc_id, s.seed,
             coalesce(min(md5(CAST(s.seed AS VARCHAR) || ':' || sh.sh)),
                      md5(CAST(s.seed AS VARCHAR) || ':')) AS mh
      FROM documents d
      CROSS JOIN (SELECT unnest(generate_series(0, {_MINHASHES - 1})) AS seed) s
      LEFT JOIN sh ON sh.doc_id = d.doc_id
      GROUP BY d.doc_id, s.seed
    ),
    bandkeys AS (
      SELECT doc_id,
             md5(CAST(seed // {_RPB} AS VARCHAR) || ',' ||
                 string_agg(mh, ',' ORDER BY seed)) AS bk
      FROM mh GROUP BY doc_id, seed // {_RPB}
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bandkeys a JOIN bandkeys b ON a.bk = b.bk AND a.doc_id < b.doc_id
    ),
    est AS (
      SELECT c.id_a, c.id_b,
             sum(CASE WHEN x.mh = y.mh THEN 1 ELSE 0 END) / {_MINHASHES}.0 AS est_jaccard
      FROM cand c
      JOIN mh x ON x.doc_id = c.id_a
      JOIN mh y ON y.doc_id = c.id_b AND y.seed = x.seed
      GROUP BY c.id_a, c.id_b
    ),
    dsh AS (SELECT DISTINCT doc_id, sh FROM sh),
    sizes AS (SELECT doc_id, count(*) AS n FROM dsh GROUP BY doc_id),
    common AS (
      SELECT c.id_a, c.id_b, count(*) AS cm
      FROM cand c
      JOIN dsh x ON x.doc_id = c.id_a
      JOIN dsh y ON y.doc_id = c.id_b AND y.sh = x.sh
      GROUP BY 1, 2
    )
    SELECT e.id_a, e.id_b,
           round(e.est_jaccard, 6) AS est_jaccard,
           round(CASE WHEN coalesce(na.n, 0) + coalesce(nb.n, 0)
                           - coalesce(cm, 0) = 0 THEN 1.0
                 ELSE coalesce(cm, 0) / CAST(coalesce(na.n, 0) + coalesce(nb.n, 0)
                                             - coalesce(cm, 0) AS DOUBLE)
                 END, 6) AS exact_jaccard,
           round(abs(e.est_jaccard
                     - CASE WHEN coalesce(na.n, 0) + coalesce(nb.n, 0)
                                 - coalesce(cm, 0) = 0 THEN 1.0
                       ELSE coalesce(cm, 0) / CAST(coalesce(na.n, 0)
                            + coalesce(nb.n, 0) - coalesce(cm, 0) AS DOUBLE)
                       END), 6) AS abs_error
    FROM est e
    LEFT JOIN sizes na ON na.doc_id = e.id_a
    LEFT JOIN sizes nb ON nb.doc_id = e.id_b
    LEFT JOIN common c ON c.id_a = e.id_a AND c.id_b = e.id_b
    """,
)
def q144_minhash_estimator_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash estimator-quality telemetry: for every LSH candidate pair,
    the agreeing-component Jaccard ESTIMATE next to the EXACT shingle-set
    Jaccard and the absolute error — the sketch-accuracy audit a dedup
    pipeline runs before trusting thresholds (q57's recall audit, for
    MinHash). Exact verification joins doc-bounded sorted 60-bit shingle
    arrays to the (sparse) candidate list — the q124 verify shape — so
    nothing corpus-quadratic runs; the candidate set itself is the q18
    banding (ReuseExchange-shared self-join). The doc-shingle stream is
    tokenized ONCE (checkpointed) and shared by the banding and the
    exact-Jaccard branch (round-4 follow-up: it used to be derived
    twice)."""
    from etl_jetro_spark.operators.dedup import (
        minhash_lsh_candidates,
        shingle_rows,
    )

    d = load(spark, sf_dir, "documents")
    sh_all = shingle_rows(d, "doc_id", "text", 3, distinct=False).localCheckpoint(
        eager=False
    )
    cand = minhash_lsh_candidates(
        d,
        "doc_id",
        "text",
        num_hashes=_MINHASHES,
        bands=_BANDS,
        shingle_words=3,
        shingles=sh_all,
    )
    sh = sh_all.distinct()
    sh_h = F.conv(F.substring(F.md5("_sh"), 1, 15), 16, 10).cast("long")
    sets = sh.groupBy("_id").agg(
        F.sort_array(F.collect_list(sh_h)).alias("_set"),
        F.count(F.lit(1)).alias("_n"),
    )
    a = sets.select(
        F.col("_id").alias("id_a"), F.col("_set").alias("_sa"), F.col("_n").alias("_na")
    )
    b = sets.select(
        F.col("_id").alias("id_b"), F.col("_set").alias("_sb"), F.col("_n").alias("_nb")
    )
    joined = (
        cand.join(a, "id_a", "left")
        .join(b, "id_b", "left")
        .select(
            "id_a",
            "id_b",
            "est_jaccard",
            F.coalesce(F.size(F.array_intersect("_sa", "_sb")), F.lit(0)).alias("_cm"),
            F.coalesce("_na", F.lit(0)).alias("_va"),
            F.coalesce("_nb", F.lit(0)).alias("_vb"),
        )
    )
    union = F.col("_va") + F.col("_vb") - F.col("_cm")
    exact = F.when(union == 0, F.lit(1.0)).otherwise(F.col("_cm") / union)
    return joined.select(
        "id_a",
        "id_b",
        F.round("est_jaccard", 6).alias("est_jaccard"),
        F.round(exact, 6).alias("exact_jaccard"),
        F.round(F.abs(F.col("est_jaccard") - exact), 6).alias("abs_error"),
    )


@query(
    "q145_source_composition",
    f"""
    WITH base AS (SELECT doc_id, source, {DK_NORM_TEXT} AS t FROM documents),
    f AS (
      SELECT doc_id, source,
             list_filter(string_split(t, ' '), x -> x <> '') AS w, t
      FROM base
    ),
    feat AS (
      SELECT doc_id, source,
             CAST(len(w) AS INT) AS n_tokens,
             CASE WHEN len(w) > 0 THEN
               round((len(t) - (len(w) - 1)) / CAST(len(w) AS DOUBLE), 6)
             END AS mwl,
             CASE WHEN len(w) > 0 THEN
               round(len(list_filter(w, x -> list_contains({_dk_stop_list('en')}, x)))
                     / CAST(len(w) AS DOUBLE), 6)
             END AS stop_frac,
             CASE WHEN len(w) > 0 THEN
               round(len(list_distinct(w)) / CAST(len(w) AS DOUBLE), 6)
             END AS dfrac
      FROM f
    ),
    v AS (
      SELECT doc_id, source, n_tokens,
        CASE WHEN n_tokens < 10 THEN 'too_short'
             WHEN n_tokens > 100000 THEN 'too_long'
             WHEN mwl < 2.5 OR mwl > 12.0 THEN 'word_length'
             WHEN stop_frac < 0.05 THEN 'low_stopword'
             WHEN dfrac < 0.3 THEN 'repetitive'
        END AS viol
      FROM feat
    ),
    vc AS (
      SELECT source, viol, count(*) AS c FROM v WHERE viol IS NOT NULL
      GROUP BY 1, 2
    ),
    topv AS (
      SELECT source, viol FROM (
        SELECT source, viol,
               row_number() OVER (PARTITION BY source ORDER BY c DESC, viol) AS rn
        FROM vc) WHERE rn = 1
    )
    SELECT v.source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
           round(avg(CASE WHEN v.viol IS NULL THEN 1.0 ELSE 0.0 END), 6) AS keep_rate,
           any_value(topv.viol) AS top_violation
    FROM v LEFT JOIN topv ON topv.source = v.source
    GROUP BY v.source
    """,
)
def q145_source_composition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus composition report — the dataset-card aggregate a
    curation pipeline publishes: document/token volume, quality-gate keep
    rate, and the dominant violation per source.

    ONE corpus pass (round 8; was 15.4 s at sf1, see SCALE.md): the gate
    carries ``source`` through via its ``passthrough`` param — no doc_id
    re-join of the corpus against its own gate output — and everything
    collapses in a single (source, first_violation) partial agg (a
    sources x <=6-rules frame). Totals, keep rate, and the deterministic
    min-struct argmax for the top violation all re-reduce from that
    NDV-bounded frame (the q326 collapse-first lesson); keep_rate =
    sum(kept)/sum(n) reproduces avg() exactly (0/1 double sums are
    exact).

    The lazy checkpoint below is load-bearing: CollapseProject inlines
    the gate's projection into the aggregate's key/update expressions,
    duplicating the norm_text regex chain ~31x per row (62
    regexp_replace nodes in the collapsed plan vs 2 in q143's; WSCG
    subexpression elimination does not cross the aggregate boundary —
    measured 61.8 s at sf1, 4x WORSE than the join shape this replaced).
    Freezing the narrow verdict frame (id, source, 4 doubles, bool,
    rule) evaluates the gate exactly once — the same corpus-scale-narrow
    freeze embedding_near_dup uses for its signature frame; at cluster
    scale MEMORY_AND_DISK spills, never OOMs."""
    from etl_jetro_spark.operators.textstats import quality_gate

    d = load(spark, sf_dir, "documents")
    g = quality_gate(
        d, "doc_id", "text", passthrough=("source",)
    ).localCheckpoint(eager=False)
    cells = g.groupBy("source", "first_violation").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("n_tokens").alias("_tok"),
        F.sum(F.col("keep").cast("double")).alias("_kept"),
    )
    stats = cells.groupBy("source").agg(
        F.sum("_n").cast("long").alias("n_docs"),
        F.sum("_tok").cast("long").alias("n_tokens"),
        F.round(F.sum("_kept") / F.sum("_n"), 6).alias("keep_rate"),
    )
    topv = (
        cells.filter(F.col("first_violation").isNotNull())
        .groupBy("source")
        .agg(
            F.min_by(
                F.col("first_violation"),
                F.struct(-F.col("_n"), F.col("first_violation")),
            ).alias("top_violation")
        )
    )
    return stats.join(topv, "source", "left").select(
        "source", "n_docs", "n_tokens", "keep_rate", "top_violation"
    )


_Q146_COS = (
    "list_dot_product({a}, {b}) / (sqrt(list_dot_product({a}, {a}))"
    " * sqrt(list_dot_product({b}, {b})))"
)


@query(
    "q146_semantic_dedup",
    f"""
    WITH RECURSIVE emb AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings),
    u AS (
      SELECT vec_id, v FROM emb
      UNION ALL
      SELECT vec_id + 100000, list_prepend(-v[1], v[2:]) FROM emb
    ),
    c AS (SELECT vec_id AS cid, v AS cv FROM emb
          WHERE vec_id < (SELECT greatest(32, CAST(floor(sqrt(count(*))) AS BIGINT))
                          FROM embeddings)),
    g AS (SELECT vec_id AS gid, v AS gv FROM emb
          WHERE vec_id < (SELECT greatest(8, CAST(floor(sqrt(
                            greatest(32, CAST(floor(sqrt(count(*))) AS BIGINT))
                          )) AS BIGINT)) FROM embeddings)),
    cg AS (
      SELECT cid, cv, gid FROM (
        SELECT c.cid, c.cv, g.gid,
               row_number() OVER (
                 PARTITION BY c.cid
                 ORDER BY {_Q146_COS.format(a='c.cv', b='g.gv')} DESC, g.gid
               ) AS rn
        FROM c CROSS JOIN g) WHERE rn = 1),
    vg AS (
      SELECT vec_id, v, gid FROM (
        SELECT u.vec_id, u.v, g.gid,
               row_number() OVER (
                 PARTITION BY u.vec_id
                 ORDER BY {_Q146_COS.format(a='u.v', b='g.gv')} DESC, g.gid
               ) AS rn
        FROM u CROSS JOIN g) WHERE rn <= 3),
    assign AS (
      SELECT vg.vec_id, vg.v, cg.cid,
             row_number() OVER (
               PARTITION BY vg.vec_id
               ORDER BY {_Q146_COS.format(a='vg.v', b='cg.cv')} DESC, cg.cid
             ) AS rn
      FROM vg JOIN cg ON vg.gid = cg.gid),
    inv AS (SELECT vec_id, v, cid FROM assign WHERE rn = 1),
    un AS (
      SELECT vec_id, cid,
             list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS uv
      FROM inv
    ),
    edges AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM un a JOIN un b ON a.cid = b.cid AND a.vec_id < b.vec_id
      WHERE round(list_dot_product(a.uv, b.uv), 6) >= 0.985
    ),
    und AS (SELECT id_a AS a, id_b AS b FROM edges
            UNION SELECT id_b, id_a FROM edges),
    nodes AS (SELECT a AS id FROM und UNION SELECT b FROM und),
    reach(s, t) AS (
      SELECT id, id FROM nodes
      UNION
      SELECT r.s, u2.b FROM reach r JOIN und u2 ON u2.a = r.t
    ),
    comp AS (SELECT s AS id, min(t) AS component FROM reach GROUP BY s)
    SELECT u.vec_id,
           CAST(coalesce(cm.component, u.vec_id) AS BIGINT) AS component,
           CAST(coalesce(cm.component, u.vec_id) = u.vec_id AS BOOLEAN) AS kept
    FROM u LEFT JOIN comp cm ON cm.id = u.vec_id
    """,
)
def q146_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic deduplication
    (operators/similarity.semantic_dedup): TWO-LEVEL IVF assignment
    blocks the corpus (coarse sqrt(K) super-centroids, then the nearest
    fine centroid within the winning coarse cell — ~2n*sqrt(K) dots vs
    the flat n*K argmax, the production SemDeDup shape, round-5 verdict
    ask #3), exact cosine inside each cluster (key-only self-join,
    vectors fetched back per id), connected components collapse
    near-dup groups, min id kept. The corpus is unioned with
    deterministically perturbed copies (q39's flipped-first-component
    trick) so true semantic dups exist; the oracle replays BOTH
    assignment levels (same ties->lowest-id rule), blocking, the
    rounded-score threshold, and the transitive closure. The
    approximation cost of two-level assignment is gated separately by
    q256's recall row."""
    from etl_jetro_spark.operators.similarity import semantic_dedup

    emb = load(spark, sf_dir, "embeddings")
    pert = emb.select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.concat(
            F.array(-F.element_at("embedding", 1)),
            F.slice("embedding", 2, 1_000_000),
        ).alias("embedding"),
    )
    u = emb.select("vec_id", "embedding").unionByName(pert)
    # K = max(32, isqrt(n)) — the operator's own scale rule made real
    # (round-5 sf1 rehearsal: K pinned at 32 sent cluster occupancy
    # linear and the pair join quadratic, 5.7 s -> 162 s for 10x data).
    # sqrt scaling balances assignment and pair volume (~n^2/K); the
    # coarse level NC = max(8, isqrt(K)) cuts assignment from n*K to
    # ~n*(NC + K/NC) ~ 2n*sqrt(K). isqrt == floor(sqrt) exactly for any
    # count below 2^52, so both engines pick the same K and NC.
    import math

    k = max(32, math.isqrt(emb.count()))
    nc = max(8, math.isqrt(k))
    cents = emb.filter(F.col("vec_id") < k).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")
    )
    coarse = emb.filter(F.col("vec_id") < nc).select(
        F.col("vec_id").alias("gid"), F.col("embedding").alias("gv")
    )
    return semantic_dedup(
        u,
        "vec_id",
        "embedding",
        cents,
        threshold=0.985,
        coarse=coarse,
        n_probe_cells=3,
    )


@query(
    "q147_asof_forward_tolerance",
    """
    WITH e AS (SELECT event_id, user_id, event_type,
                      CAST(epoch_ns(ts) AS BIGINT) AS t FROM events),
    c AS (SELECT event_id AS click_id, user_id, t FROM e
          WHERE event_type = 'click'),
    p AS (SELECT user_id, t, CAST(min(event_id) AS BIGINT) AS purchase_id
          FROM e WHERE event_type = 'purchase' GROUP BY 1, 2)
    SELECT c.click_id, c.user_id,
           pm.purchase_id,
           pm.t AS matched_time,
           CAST((pm.t - c.t) // 1000000000 AS BIGINT) AS gap_s
    FROM c LEFT JOIN LATERAL (
      SELECT purchase_id, t FROM p
      WHERE p.user_id = c.user_id AND p.t >= c.t
        AND p.t <= c.t + 3600000000000
      ORDER BY t LIMIT 1
    ) pm ON true
    """,
)
def q147_asof_forward_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join with a staleness bound
    (operators/timeseries.asof_join): per click, the EARLIEST purchase
    at-or-after it by the same user within one hour — the conversion-
    attribution mirror of q43's backward as-of, on the same union-sweep
    shape (one key shuffle, running first-non-null window, no range
    explosion). Purchases sharing a (user, ts) collapse to min event_id
    first so the pick is deterministic; the oracle runs the LATERAL
    top-1 probe definition."""
    from etl_jetro_spark.operators.timeseries import asof_join

    e = load_events(spark, sf_dir)
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("t")
    )
    purchases = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", F.col("ts").alias("rt"))
        .agg(F.min("event_id").cast("long").alias("purchase_id"))
    )
    out = asof_join(
        clicks,
        purchases,
        ["user_id"],
        "t",
        "rt",
        ["purchase_id"],
        direction="forward",
        tolerance=3_600_000_000_000,
    )
    return out.select(
        "click_id",
        "user_id",
        "purchase_id",
        "matched_time",
        F.expr("(matched_time - t) DIV 1000000000").alias("gap_s"),
    )


@query(
    "q148_rolling_median",
    """
    WITH e AS (
      SELECT event_id, user_id, value, CAST(epoch_ns(ts) AS BIGINT) AS t
      FROM events WHERE value IS NOT NULL
    )
    SELECT event_id, user_id,
           round(median(value) OVER (
             PARTITION BY user_id ORDER BY t, event_id
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6) AS med7
    FROM e
    """,
)
def q148_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT trailing 7-row median per user — the robust rolling
    statistic (windowed median) Spark has no native aggregate for,
    composed as collect_list over the row frame + array_sort +
    interpolated middle, all expression-level: per-row state is bounded
    by the FRAME (7 values), so the operator scales with stream length,
    not group size — no per-group multiset, no UDAF. One (user, time)
    shuffle+sort, the same exchange every trailing-window family rides.
    DuckDB's windowed median (quantile_cont interpolation) is the
    oracle; even-count frames average the two middle values."""
    from pyspark.sql import Window

    e = load_events(spark, sf_dir).filter(F.col("value").isNotNull())
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-6, 0)
    )
    arr = F.array_sort(F.collect_list("value").over(w))
    n = F.size(arr)
    lo = F.element_at(arr, ((n + 1) / 2).cast("int"))
    hi = F.element_at(arr, (n / 2 + 1).cast("int"))
    return e.select(
        "event_id",
        "user_id",
        F.round((lo + hi) / 2, 6).alias("med7"),
    )


@query(
    "q149_click_to_purchase_runs",
    """
    WITH e AS (
      SELECT event_id, user_id, event_type, CAST(epoch_ns(ts) AS BIGINT) AS t
      FROM events WHERE event_type IN ('click', 'purchase')
    ),
    nxt AS (
      SELECT user_id, event_type, t,
             lead(event_type) OVER w AS n_type,
             lead(t) OVER w AS n_t
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_direct_conversions,
           CAST(min(n_t - t) AS BIGINT) AS fastest_ns
    FROM nxt
    WHERE event_type = 'click' AND n_type = 'purchase'
      AND n_t - t <= 1800000000000
    GROUP BY user_id
    """,
)
def q149_click_to_purchase_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-style sequence detection: click IMMEDIATELY
    followed by purchase (no intervening click/purchase) within 30
    minutes, counted per user with the fastest gap — the adjacency
    pattern funnels can't express (funnel allows intervening events).
    One (user, time) shuffle+sort; lead() is O(1) sweep state; the
    pattern test is per-row arithmetic after the sort."""
    from pyspark.sql import Window

    e = load_events(spark, sf_dir).filter(
        F.col("event_type").isin("click", "purchase")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = e.select(
        "user_id",
        "event_type",
        "ts",
        F.lead("event_type").over(w).alias("n_type"),
        F.lead("ts").over(w).alias("n_t"),
    )
    hit = nxt.filter(
        (F.col("event_type") == "click")
        & (F.col("n_type") == "purchase")
        & ((F.col("n_t") - F.col("ts")) <= 1_800_000_000_000)
    )
    return hit.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_direct_conversions"),
        F.min(F.col("n_t") - F.col("ts")).cast("long").alias("fastest_ns"),
    )


@query(
    "q150_rank_normalize",
    """
    WITH e AS (
      SELECT event_id, event_type, value FROM events WHERE value IS NOT NULL
    ),
    r AS (
      SELECT event_id, event_type,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY value, event_id) AS rk,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM e
    )
    SELECT event_id, event_type,
           round((rk - 0.5) / n, 6) AS rank_norm
    FROM r
    """,
)
def q150_rank_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank (quantile) normalization per group — the robust twin of
    q112's z-score: value → (rank − 0.5)/n ∈ (0,1), invariant to any
    monotone distortion of the feature. Runs on the DISTRIBUTED rank
    frame (aggregate.group_ranked — range-partitioned, no single-task
    per-group window even when one group dominates), with event_id as
    the deterministic duplicate tiebreak."""
    from etl_jetro_spark.operators.aggregate import group_ranked

    e = load_events(spark, sf_dir).filter(F.col("value").isNotNull())
    ranked = group_ranked(
        e.select("event_id", "event_type", "value"),
        ["event_type"],
        "value",
        tiebreak=["event_id"],
    )
    return ranked.select(
        "event_id",
        "event_type",
        F.round((F.col("_rn") - 0.5) / F.col("_n"), 6).alias("rank_norm"),
    )


def _baskets(li: DataFrame) -> DataFrame:
    """The co-purchase basket frame as ONE orderkey-keyed collect_set
    aggregation (r11): ``(l_orderkey, _ps sorted-part-set)``. Replaces the
    old ``distinct(l_orderkey, l_partkey)`` + orderkey re-exchange that
    every basket self-join paid — collect_set dedups in the map-side
    partials, so the single shuffle here subsumes BOTH of those, and the
    Σ basket² pair stream is then generated basket-locally by explode
    (``_basket_pairs``), never through a join. Basket sizes are bounded
    (TPC-H ≤ 7 lines; real carts are small — the q151 argument), so the
    per-row array and the explode fan-out are O(k)/O(k²) constants; a
    catalog with unbounded baskets would cap them upstream exactly as
    the old self-join would have needed."""
    return li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("_ps")
    )


def _basket_pairs(li: DataFrame, directed: bool = False) -> DataFrame:
    """Per-basket item-pair incidence stream ``(u, v)`` — one row per
    (order, pair), exactly the row multiset of the old distinct-basket
    self-join. ``directed=False`` emits only u < v via posexplode +
    tail-slice over the sorted part-set (half the generated rows);
    ``directed=True`` emits both orientations (u != v). Consumers
    aggregate or dedup across orders as before."""
    g = _baskets(li)
    if directed:
        return (
            g.select(F.explode("_ps").alias("u"), "_ps")
            .select("u", F.explode("_ps").alias("v"))
            .filter(F.col("u") != F.col("v"))
        )
    return g.select(F.posexplode("_ps").alias("_i", "u"), "_ps").select(
        "u",
        F.explode(
            F.slice("_ps", F.col("_i") + F.lit(2), F.size("_ps"))
        ).alias("v"),
    )


def _pair_support(li: DataFrame, min_support: int = 2) -> DataFrame:
    """q151/q156/q158/q178's support-filtered undirected edge frame:
    (u, v) with u < v co-purchased in >= min_support orders. Map-side
    partial agg collapses the per-order pair stream."""
    return (
        _basket_pairs(li)
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("s"))
        .filter(F.col("s") >= min_support)
    )


@query(
    "q151_item_pair_support",
    """
    WITH b AS (SELECT l_orderkey, l_partkey FROM lineitem
               GROUP BY l_orderkey, l_partkey)
    SELECT a.l_partkey AS item_a, c.l_partkey AS item_b,
           CAST(count(*) AS BIGINT) AS support
    FROM b a JOIN b c
      ON a.l_orderkey = c.l_orderkey AND a.l_partkey < c.l_partkey
    GROUP BY 1, 2
    HAVING count(*) >= 2
    """,
)
def q151_item_pair_support(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket pair support (the A-priori candidate count): item
    pairs co-occurring in >= 2 orders. The self-join runs per BASKET
    (order) after a distinct — candidate volume is Σ basket², and
    baskets are bounded (TPC-H <= 7 lines; real carts are small), so
    the pair stream is ~k²/2 per order regardless of corpus size —
    the same bounded-block argument as the SNM window. Map-side partial
    agg collapses the pair counts. Pair generation is the basket-local
    explode of ``_basket_pairs`` (r11) — one shuffle, no join."""
    li = load(spark, sf_dir, "lineitem")
    return _pair_support(li).select(
        F.col("u").alias("item_a"),
        F.col("v").alias("item_b"),
        F.col("s").cast("long").alias("support"),
    )


@query(
    "q152_association_rules",
    """
    WITH b AS (SELECT l_orderkey, l_partkey FROM lineitem
               GROUP BY l_orderkey, l_partkey),
    nb AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_baskets FROM b),
    item AS (SELECT l_partkey, count(*) AS s FROM b GROUP BY 1),
    pair AS (
      SELECT a.l_partkey AS item_a, c.l_partkey AS item_b, count(*) AS s_ab
      FROM b a JOIN b c
        ON a.l_orderkey = c.l_orderkey AND a.l_partkey < c.l_partkey
      GROUP BY 1, 2 HAVING count(*) >= 2
    )
    SELECT item_a, item_b, CAST(s_ab AS BIGINT) AS support,
           round(s_ab / CAST(ia.s AS DOUBLE), 6) AS conf_a_to_b,
           round(s_ab / CAST(ib.s AS DOUBLE), 6) AS conf_b_to_a,
           round((s_ab * n_baskets) / CAST(ia.s * ib.s AS DOUBLE), 6) AS lift
    FROM pair
    JOIN item ia ON ia.l_partkey = item_a
    JOIN item ib ON ib.l_partkey = item_b
    CROSS JOIN nb
    """,
)
def q152_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules over the q151 pair stream: confidence in both
    directions and lift — the A-priori rule stage. Item supports join to
    the (already support-pruned) pair frame, never to baskets; the
    basket total is one broadcast row; everything is count arithmetic +
    exactly-rounded division, hash-stable cross-engine."""
    li = load(spark, sf_dir, "lineitem")
    # the basket frame feeds baskets-total, item supports, and the pair
    # stream — checkpoint so the collect_set shuffle runs once (r11)
    g = _baskets(li).localCheckpoint(eager=False)
    nb = g.agg(F.count(F.lit(1)).cast("long").alias("n_baskets"))
    item = g.select(F.explode("_ps").alias("l_partkey")).groupBy(
        "l_partkey"
    ).agg(F.count(F.lit(1)).alias("s"))
    pairs = (
        g.select(F.posexplode("_ps").alias("_i", "item_a"), "_ps")
        .select(
            "item_a",
            F.explode(
                F.slice("_ps", F.col("_i") + F.lit(2), F.size("_ps"))
            ).alias("item_b"),
        )
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("s_ab"))
        .filter(F.col("s_ab") >= 2)
    )
    ia = item.select(F.col("l_partkey").alias("item_a"), F.col("s").alias("_sa"))
    ib = item.select(F.col("l_partkey").alias("item_b"), F.col("s").alias("_sb"))
    return (
        pairs.join(ia, "item_a")
        .join(ib, "item_b")
        .crossJoin(bcast_small(nb))
        .select(
            "item_a",
            "item_b",
            F.col("s_ab").cast("long").alias("support"),
            F.round(F.col("s_ab") / F.col("_sa"), 6).alias("conf_a_to_b"),
            F.round(F.col("s_ab") / F.col("_sb"), 6).alias("conf_b_to_a"),
            F.round(
                (F.col("s_ab") * F.col("n_baskets"))
                / (F.col("_sa") * F.col("_sb")),
                6,
            ).alias("lift"),
        )
    )


@query(
    "q153_vocab_coverage",
    f"""
    WITH wrds AS (SELECT string_split({DK_NORM_TEXT}, ' ') AS w FROM documents),
    tok AS (
      SELECT w[i] AS t FROM wrds,
             UNNEST(generate_series(1, len(w))) AS s(i)
      WHERE w[i] <> ''
    ),
    cnt AS (SELECT t, count(*) AS c FROM tok GROUP BY 1),
    tot AS (SELECT CAST(sum(c) AS BIGINT) AS total FROM cnt),
    ks AS (SELECT unnest([10, 100, 1000]) AS k),
    ranked AS (
      SELECT c, row_number() OVER (ORDER BY c DESC, t) AS rn FROM cnt
    )
    SELECT ks.k, cov.covered, tot.total,
           round(cov.covered / CAST(tot.total AS DOUBLE), 6) AS share
    FROM ks
    JOIN LATERAL (
      SELECT CAST(sum(c) AS BIGINT) AS covered FROM ranked WHERE rn <= ks.k
    ) cov ON true
    CROSS JOIN tot
    """,
)
def q153_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve: the share of all token OCCURRENCES
    covered by the top-k most frequent tokens, for k ∈ {{10, 100, 1000}}
    — the tokenizer-budget / OOV-rate telemetry of a training pipeline.
    Each k is a TakeOrdered top-k over the (vocabulary-sized, already
    partial-agged) count frame + one scalar sum — no global vocabulary
    sort, no single-task window over the vocab."""
    from etl_jetro_spark.operators.dedup import shingle_rows

    d = load(spark, sf_dir, "documents")
    cnt = (
        shingle_rows(d, "doc_id", "text", 1, distinct=False)
        .groupBy("_sh")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=False)  # feeds the total + three top-k passes
    )
    total = cnt.agg(F.sum("c").cast("long").alias("total"))
    outs = []
    for k in (10, 100, 1000):
        topk = cnt.orderBy(F.desc("c"), F.asc("_sh")).limit(k)
        outs.append(
            topk.agg(F.sum("c").cast("long").alias("covered")).select(
                F.lit(k).cast("int").alias("k"), "covered"
            )
        )
    u = outs[0]
    for o in outs[1:]:
        u = u.unionByName(o)
    return u.crossJoin(bcast_small(total)).select(
        "k",
        "covered",
        "total",
        F.round(F.col("covered") / F.col("total"), 6).alias("share"),
    )


@query(
    "q154_touch_attribution",
    """
    WITH e AS (
      SELECT event_id, user_id, event_type, CAST(epoch_ns(ts) AS BIGINT) AS t
      FROM events WHERE event_type IN ('click', 'purchase')
    ),
    w AS (
      SELECT event_id, user_id, event_type, t,
             count(*) FILTER (event_type = 'click') OVER (
               PARTITION BY user_id ORDER BY t
               RANGE BETWEEN 1800000000000 PRECEDING AND CURRENT ROW
             ) AS n_touches
      FROM e
    )
    SELECT event_id AS purchase_id, user_id,
           CAST(n_touches AS BIGINT) AS n_touches,
           CASE WHEN n_touches > 0
                THEN round(1.0 / n_touches, 6) END AS credit_each
    FROM w WHERE event_type = 'purchase'
    """,
)
def q154_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution: per purchase, the number of clicks
    by the same user in the trailing 30 minutes (RANGE frame over the
    event-time ns column — value-based, so equal-time rows are all in
    frame regardless of tie order) and the per-click credit 1/n. One
    (user, time) shuffle+sort; the range frame keeps sweep state bounded
    by the horizon, never the user's history."""
    from pyspark.sql import Window

    e = load_events(spark, sf_dir).filter(
        F.col("event_type").isin("click", "purchase")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rangeBetween(-1_800_000_000_000, 0)
    )
    n = F.sum((F.col("event_type") == "click").cast("long")).over(w)
    out = e.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        "event_type",
        n.alias("n_touches"),
    ).filter(F.col("event_type") == "purchase")
    return out.select(
        "purchase_id",
        "user_id",
        F.col("n_touches").cast("long").alias("n_touches"),
        F.when(
            F.col("n_touches") > 0, F.round(F.lit(1.0) / F.col("n_touches"), 6)
        ).alias("credit_each"),
    )


@query(
    "q155_weighted_percentiles",
    """
    WITH s AS (
      SELECT l_returnflag AS flag, l_quantity AS v, l_extendedprice AS w,
             l_orderkey, l_linenumber
      FROM lineitem WHERE l_quantity IS NOT NULL AND l_extendedprice > 0
    ),
    c AS (
      SELECT flag, v,
             sum(w) OVER (PARTITION BY flag ORDER BY v, l_orderkey, l_linenumber
                          ROWS UNBOUNDED PRECEDING) AS cw,
             sum(w) OVER (PARTITION BY flag) AS tw
      FROM s
    )
    SELECT flag,
           min(v) FILTER (cw >= 0.25 * tw) AS wq25,
           min(v) FILTER (cw >= 0.5 * tw)  AS wmedian,
           min(v) FILTER (cw >= 0.9 * tw)  AS wq90
    FROM c GROUP BY flag
    """,
)
def q155_weighted_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-WEIGHTED quantity percentiles per return flag
    (operators/aggregate.weighted_group_percentiles): the smallest
    quantity whose cumulative extended-price reaches p of the flag's
    total — neither Spark nor DuckDB has a weighted-quantile aggregate,
    so both sides replay the cumulative definition. Distributed: one
    range-partition shuffle; the running-weight window is keyed by
    (physical partition, group), bounded by the range split — never a
    single-task group window (the oracle's PARTITION BY flag window is
    exactly the shape the operator avoids)."""
    from etl_jetro_spark.operators.aggregate import weighted_group_percentiles

    li = load(spark, sf_dir, "lineitem")
    out = weighted_group_percentiles(
        li,
        ["l_returnflag"],
        "l_quantity",
        "l_extendedprice",
        {"wq25": 0.25, "wmedian": 0.5, "wq90": 0.9},
        tiebreak=["l_orderkey", "l_linenumber"],
    )
    return out.select(
        F.col("l_returnflag").alias("flag"), "wq25", "wmedian", "wq90"
    )


@query(
    "q156_triangle_count",
    """
    WITH bsk AS (SELECT l_orderkey, l_partkey FROM lineitem
                 GROUP BY l_orderkey, l_partkey),
    e AS (
      SELECT x.l_partkey AS a, y.l_partkey AS b
      FROM bsk x JOIN bsk y
        ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
      GROUP BY 1, 2 HAVING count(*) >= 2
    ),
    deg AS (
      SELECT v, count(*) AS d FROM (
        SELECT a AS v FROM e UNION ALL SELECT b FROM e) GROUP BY v
    ),
    o AS (
      SELECT CASE WHEN da.d < db.d OR (da.d = db.d AND e.a < e.b)
                  THEN e.a ELSE e.b END AS u,
             CASE WHEN da.d < db.d OR (da.d = db.d AND e.a < e.b)
                  THEN e.b ELSE e.a END AS w
      FROM e JOIN deg da ON da.v = e.a JOIN deg db ON db.v = e.b
    ),
    wedge AS (
      SELECT least(x.w, y.w) AS a, greatest(x.w, y.w) AS b
      FROM o x JOIN o y ON x.u = y.u AND x.w < y.w
    )
    SELECT CAST(count(*) AS BIGINT) AS n_triangles
    FROM wedge JOIN e ON e.a = wedge.a AND e.b = wedge.b
    """,
)
def q156_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count of the co-purchase graph (q151's support>=2 edges)
    via degree-oriented node-iterator (operators/graph.triangle_count):
    orientation bounds wedge volume at O(m^1.5) instead of Σdeg² — the
    hub-survival mechanism — with one degree aggregation and two edge
    joins. Complements connected components (q60) on the graph surface."""
    from etl_jetro_spark.operators.graph import triangle_count

    li = load(spark, sf_dir, "lineitem")
    edges = _pair_support(li).select(
        F.col("u").alias("id_a"), F.col("v").alias("id_b")
    )
    return triangle_count(edges)


def _q157_qvec() -> list[float]:
    from etl_jetro_spark.operators.similarity import _hyperplane

    return [_hyperplane(0, d) for d in range(64)]


def _q157_qvec_sql() -> str:
    return "[" + ", ".join(repr(x) for x in _q157_qvec()) + "]"


@query(
    "q157_hybrid_rrf",
    f"""
    WITH base AS (
      SELECT doc_id,
             list_filter(string_split({DK_NORM_TEXT}, ' '), x -> x <> '') AS w
      FROM documents
    ),
    stats AS (SELECT CAST(count(*) AS BIGINT) AS N, avg(len(w)) AS avgdl FROM base),
    toks AS (
      SELECT doc_id, len(w) AS dl, t.t AS t
      FROM base, UNNEST(w) AS t(t)
      WHERE t.t IN {{terms}}
    ),
    tf AS (SELECT doc_id, t, CAST(count(*) AS BIGINT) AS tf, any_value(dl) AS dl
           FROM toks GROUP BY 1, 2),
    dfq AS (SELECT t, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
    bm AS (
      SELECT tf.doc_id, round(sum(
               ln((stats.N - dfq.df + 0.5) / (dfq.df + 0.5) + 1.0)
               * (tf.tf * 2.2)
               / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * tf.dl / stats.avgdl))), 6) AS s
      FROM tf JOIN dfq USING (t) CROSS JOIN stats GROUP BY tf.doc_id
    ),
    bmr AS (
      SELECT doc_id, row_number() OVER (ORDER BY s DESC, doc_id) AS r
      FROM bm QUALIFY r <= 50
    ),
    q AS (SELECT CAST({{qvec}} AS DOUBLE[]) AS qv),
    emb AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
            FROM embeddings),
    es AS (
      SELECT vec_id,
             round(list_dot_product(v, qv)
               / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))), 6) AS s
      FROM emb CROSS JOIN q
    ),
    emr AS (
      SELECT vec_id AS doc_id, row_number() OVER (ORDER BY s DESC, vec_id) AS r
      FROM es QUALIFY r <= 50
    ),
    fused AS (
      SELECT coalesce(bmr.doc_id, emr.doc_id) AS doc_id,
             round(coalesce(1.0 / (60 + bmr.r), 0)
                   + coalesce(1.0 / (60 + emr.r), 0), 6) AS rrf,
             bmr.r AS bm25_rank, emr.r AS emb_rank
      FROM bmr FULL JOIN emr ON bmr.doc_id = emr.doc_id
    )
    SELECT doc_id, rrf, bm25_rank, emb_rank
    FROM fused ORDER BY rrf DESC, doc_id LIMIT 20
    """.replace("{terms}", repr(("shipping", "invoice", "order"))).replace(
        "{qvec}", "[-0.5290508184251612, -0.7421059239386143, -0.14685448824747205, 0.423268784500318, 0.47001825993415824, 0.318812301530881, -0.23781379742446063, -0.20110499821654748, -0.3819671945562434, -0.880582212880525, -0.44427894775023635, 0.45199808499403216, -0.76793215087053, -0.032561220243834565, -0.8968256599720688, 0.5009024112955212, -0.980297603635256, -0.42347508828317515, 0.06273382811934392, -0.42473653397743427, 0.8599654998909521, -0.057608267784867606, -0.037430871761138906, -0.9714705156960853, 0.7565686152114386, -0.4190988593823737, 0.949875062308216, -0.3688201980520134, -0.00142965093321612, 0.5688298994530132, 0.4771778464676708, -0.7156807937266682, 0.32735029157593387, -0.112021975271414, 0.9453940060666735, 0.6259941247412908, -0.643544788306367, -0.6722292120904798, -0.9735103202860385, 0.5192952200394567, 0.9445891114625098, -0.32040787596274534, 0.654750331144198, -0.9911672566044923, -0.02338065627188457, -0.6739785744221781, 0.24336513515718528, -0.3278884349055069, 0.29695215974792477, 0.30661518653231457, -0.5499385546659765, 0.7904443195045201, 0.2986431016114741, 0.5152758660331722, 0.28690035701119365, -0.1023629364102906, 0.8532609580332697, 0.6544959608719201, 0.3370759367649796, -0.38004795945251735, -0.9758893451541147, -0.8527668555512871, 0.28745730700318584, 0.20474557960626938]"
    ),
)
def q157_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval via Reciprocal Rank Fusion (Cormack et al.):
    BM25 lexical ranking (q125's operator) and embedding-cosine ranking
    against a fixed deterministic query vector fuse as
    Σ 1/(60 + rank) — the standard hybrid-search combiner, pure rational
    arithmetic over ROUNDED scores so ranks (and the fusion) are
    hash-stable cross-engine. Both rank lists are genuine top-50
    TakeOrderedAndProject frames — ``orderBy(...).limit(50)`` compiles to
    a distributed partial top-k (each task keeps its 50 best, the driver
    merges 50·tasks rows), and ``row_number`` runs only over the already
    50-row result. Round-4 verdict: the previous ``row_number over
    Window.orderBy`` shape was NOT pruned — Spark 4.1.2's
    InferWindowGroupLimit never fires on an empty partition spec, so the
    whole scored corpus funneled through one task. The fusion is a full
    outer join of two 50-row frames — nothing corpus-scale past the two
    scoring passes."""
    from pyspark.sql import Window

    from etl_jetro_spark.operators.similarity import _vec, cosine
    from etl_jetro_spark.operators.textstats import bm25_scores

    d = load(spark, sf_dir, "documents")
    bm = bm25_scores(d, "doc_id", "text", ["shipping", "invoice", "order"])
    wb = Window.orderBy(F.desc("s"), F.asc("doc_id"))
    bmr = (
        bm.select("doc_id", F.round("score", 6).alias("s"))
        .orderBy(F.desc("s"), F.asc("doc_id"))
        .limit(50)
        .withColumn("r", F.row_number().over(wb))
        .select("doc_id", F.col("r").alias("bm25_rank"))
    )
    emb = load(spark, sf_dir, "embeddings")
    qv = F.array(*[F.lit(float(x)) for x in _q157_qvec()])
    es = emb.select("vec_id", cosine(_vec("embedding"), qv).alias("score"))
    we = Window.orderBy(F.desc("s"), F.asc("vec_id"))
    emr = (
        es.select("vec_id", F.round("score", 6).alias("s"))
        .orderBy(F.desc("s"), F.asc("vec_id"))
        .limit(50)
        .withColumn("r", F.row_number().over(we))
        .select(F.col("vec_id").alias("doc_id"), F.col("r").alias("emb_rank"))
    )
    fused = bmr.join(emr, "doc_id", "full").select(
        "doc_id",
        F.round(
            F.coalesce(1.0 / (60 + F.col("bm25_rank")), F.lit(0.0))
            + F.coalesce(1.0 / (60 + F.col("emb_rank")), F.lit(0.0)),
            6,
        ).alias("rrf"),
        "bm25_rank",
        "emb_rank",
    )
    return fused.orderBy(F.desc("rrf"), F.asc("doc_id")).limit(20)


@query(
    "q158_clustering_coefficients",
    """
    WITH bsk AS (SELECT l_orderkey, l_partkey FROM lineitem
                 GROUP BY l_orderkey, l_partkey),
    e AS (
      SELECT x.l_partkey AS a, y.l_partkey AS b
      FROM bsk x JOIN bsk y
        ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
      GROUP BY 1, 2 HAVING count(*) >= 2
    ),
    deg AS (
      SELECT v, count(*) AS d FROM (
        SELECT a AS v FROM e UNION ALL SELECT b FROM e) GROUP BY v
    ),
    o AS (
      SELECT CASE WHEN da.d < db.d OR (da.d = db.d AND e.a < e.b)
                  THEN e.a ELSE e.b END AS u,
             CASE WHEN da.d < db.d OR (da.d = db.d AND e.a < e.b)
                  THEN e.b ELSE e.a END AS w
      FROM e JOIN deg da ON da.v = e.a JOIN deg db ON db.v = e.b
    ),
    tri AS (
      SELECT x.u, x.w AS p, y.w AS q
      FROM o x JOIN o y ON x.u = y.u AND x.w < y.w
      WHERE EXISTS (SELECT 1 FROM e WHERE e.a = x.w AND e.b = y.w)
    ),
    perv AS (
      SELECT v, CAST(count(*) AS BIGINT) AS nt FROM (
        SELECT u AS v FROM tri UNION ALL SELECT p FROM tri
        UNION ALL SELECT q FROM tri) GROUP BY v
    )
    SELECT deg.v AS id, CAST(deg.d AS BIGINT) AS degree,
           coalesce(perv.nt, 0) AS n_triangles,
           round(CASE WHEN deg.d >= 2
                 THEN coalesce(perv.nt, 0) / (deg.d * (deg.d - 1) / 2.0)
                 ELSE 0.0 END, 6) AS coeff
    FROM deg LEFT JOIN perv ON perv.v = deg.v
    """,
)
def q158_clustering_coefficients(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vertex local clustering coefficients of the co-purchase graph
    (operators/graph.clustering_coefficients): the degree-oriented wedge
    machinery of q156, with each closed wedge crediting its three
    vertices through one explode — the per-vertex credit stream is
    triangle-count sized, tiny next to edges."""
    from etl_jetro_spark.operators.graph import clustering_coefficients

    li = load(spark, sf_dir, "lineitem")
    edges = _pair_support(li).select(
        F.col("u").alias("id_a"), F.col("v").alias("id_b")
    )
    return clustering_coefficients(edges)


@query(
    "q159_ewma",
    """
    WITH e AS (
      SELECT event_id, user_id, value, CAST(epoch_ns(ts) AS BIGINT) AS t
      FROM events WHERE value IS NOT NULL
    ),
    l AS (
      SELECT event_id, user_id,
             lag(value, 0) OVER w AS v0, lag(value, 1) OVER w AS v1,
             lag(value, 2) OVER w AS v2, lag(value, 3) OVER w AS v3,
             lag(value, 4) OVER w AS v4, lag(value, 5) OVER w AS v5,
             lag(value, 6) OVER w AS v6
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)
    )
    SELECT event_id, user_id,
           round((coalesce(v0, 0) * 1.0 + coalesce(v1, 0) * 0.5
                  + coalesce(v2, 0) * 0.25 + coalesce(v3, 0) * 0.125
                  + coalesce(v4, 0) * 0.0625 + coalesce(v5, 0) * 0.03125
                  + coalesce(v6, 0) * 0.015625)
                 / (CASE WHEN v0 IS NULL THEN 0 ELSE 1.0 END
                    + CASE WHEN v1 IS NULL THEN 0 ELSE 0.5 END
                    + CASE WHEN v2 IS NULL THEN 0 ELSE 0.25 END
                    + CASE WHEN v3 IS NULL THEN 0 ELSE 0.125 END
                    + CASE WHEN v4 IS NULL THEN 0 ELSE 0.0625 END
                    + CASE WHEN v5 IS NULL THEN 0 ELSE 0.03125 END
                    + CASE WHEN v6 IS NULL THEN 0 ELSE 0.015625 END), 6)
             AS ewma7
    FROM l
    """,
)
def q159_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncated EWMA (α = 1/2, 7 taps) per user — the smoothing pass of
    a monitoring pipeline, expressed as seven lag() terms over ONE
    (user, time) sort: every weight is a power of two, so the weighted
    sum is EXACT binary arithmetic and hashes identically cross-engine
    (a recursive EWMA would need a true fold; the truncated form's tail
    error is bounded by 2^-7 of the oldest weight and keeps the whole
    operator inside the window sweep). Normalized over the present
    taps so early rows aren't biased toward zero."""
    from pyspark.sql import Window

    e = load_events(spark, sf_dir).filter(F.col("value").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    num = F.lit(0.0)
    den = F.lit(0.0)
    for j in range(7):
        v = F.lag("value", j).over(w)
        wt = F.lit(0.5 ** j)
        num = num + F.coalesce(v, F.lit(0.0)) * wt
        den = den + F.when(v.isNull(), F.lit(0.0)).otherwise(wt)
    return e.select(
        "event_id", "user_id", F.round(num / den, 6).alias("ewma7")
    )


@query(
    "q160_ab_test",
    """
    WITH e AS (
      SELECT event_type, value,
             CASE WHEN (strpos('0123456789abcdef',
                               substr(md5('ab:' || CAST(user_id AS VARCHAR)), 1, 1))
                        - 1) % 2 = 0 THEN 'A' ELSE 'B' END AS arm
      FROM events WHERE value IS NOT NULL
    ),
    s AS (
      SELECT event_type, arm, CAST(count(*) AS BIGINT) AS n,
             avg(value) AS mean, var_samp(value) AS var
      FROM e GROUP BY 1, 2
    ),
    p AS (
      SELECT a.event_type,
             a.n AS n_a, b.n AS n_b,
             round(a.mean, 6) AS mean_a, round(b.mean, 6) AS mean_b,
             round(b.mean - a.mean, 6) AS diff,
             round((b.mean - a.mean)
                   / sqrt(a.var / a.n + b.var / b.n), 6) AS z
      FROM s a JOIN s b ON a.event_type = b.event_type
       AND a.arm = 'A' AND b.arm = 'B'
    )
    SELECT * FROM p
    """,
)
def q160_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout: users assign to arms by md5 hash bucket
    (deterministic, reproducible on any partitioning — the q62 split
    mechanism), per-arm mean/variance aggregate in one partial-agg pass,
    and the Welch z-statistic per metric. Every step is
    exactly-rounded IEEE arithmetic (sqrt included), so the readout
    hashes identically cross-engine; the per-arm frames are
    metric-count sized."""
    e = load_events(spark, sf_dir).filter(F.col("value").isNotNull())
    nib = (
        F.instr(
            F.lit("0123456789abcdef"),
            F.substring(F.md5(F.concat(F.lit("ab:"), F.col("user_id").cast("string"))), 1, 1),
        )
        - 1
    )
    arm = F.when(nib % 2 == 0, "A").otherwise("B")
    s = (
        e.select("event_type", "value", arm.alias("arm"))
        .groupBy("event_type", "arm")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.avg("value").alias("mean"),
            F.var_samp("value").alias("var"),
        )
    )
    a = s.filter(F.col("arm") == "A").select(
        "event_type",
        F.col("n").alias("n_a"),
        F.col("mean").alias("_ma"),
        F.col("var").alias("_va"),
    )
    b = s.filter(F.col("arm") == "B").select(
        "event_type",
        F.col("n").alias("n_b"),
        F.col("mean").alias("_mb"),
        F.col("var").alias("_vb"),
    )
    se = F.sqrt(F.col("_va") / F.col("n_a") + F.col("_vb") / F.col("n_b"))
    return (
        a.join(b, "event_type")
        .select(
            "event_type",
            "n_a",
            "n_b",
            F.round("_ma", 6).alias("mean_a"),
            F.round("_mb", 6).alias("mean_b"),
            F.round(F.col("_mb") - F.col("_ma"), 6).alias("diff"),
            F.round((F.col("_mb") - F.col("_ma")) / se, 6).alias("z"),
        )
    )


@query(
    "q161_cuped_adjustment",
    """
    WITH b AS (SELECT CAST(min(epoch_ns(ts)) AS BIGINT) AS tmin,
                      CAST(max(epoch_ns(ts)) AS BIGINT) AS tmax
               FROM events),
    e AS (
      SELECT user_id, value,
             CASE WHEN (CAST(epoch_ns(ts) AS BIGINT) - tmin) * 2
                       >= (tmax - tmin) THEN 1 ELSE 0 END AS h
      FROM events CROSS JOIN b WHERE value IS NOT NULL
    ),
    u AS (
      SELECT user_id,
             sum(CASE WHEN h = 0 THEN value ELSE 0 END) AS pre,
             sum(CASE WHEN h = 1 THEN value ELSE 0 END) AS post
      FROM e GROUP BY user_id
    ),
    th AS (
      SELECT covar_samp(pre, post) / var_samp(pre) AS theta,
             avg(pre) AS mean_pre
      FROM u
    )
    SELECT u.user_id,
           round(u.pre, 6) AS pre,
           round(u.post, 6) AS post,
           round(u.post - th.theta * (u.pre - th.mean_pre), 6) AS post_cuped
    FROM u CROSS JOIN th
    """,
)
def q161_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction (Deng et al., WSDM'13): each user's
    post-period metric is adjusted by θ·(pre − mean_pre) where
    θ = cov(pre, post)/var(pre) from the pre-period covariate — the
    standard experimentation trick that shrinks metric variance without
    biasing the mean. Per-user pre/post sums aggregate in one pass
    (integer time-midpoint split, the q142 arithmetic); θ and mean_pre
    are ONE broadcast row; the adjustment is a map-side expression."""
    e = load_events(spark, sf_dir).filter(F.col("value").isNotNull())
    bounds = e.agg(F.min("ts").alias("_tmin"), F.max("ts").alias("_tmax"))
    d = e.crossJoin(bcast_small(bounds))
    h = (
        ((F.col("ts") - F.col("_tmin")) * 2) >= (F.col("_tmax") - F.col("_tmin"))
    ).cast("int")
    u = (
        d.select("user_id", "value", h.alias("_h"))
        .groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("_h") == 0, F.col("value")).otherwise(0.0)).alias("pre"),
            F.sum(F.when(F.col("_h") == 1, F.col("value")).otherwise(0.0)).alias("post"),
        )
    )
    th = u.agg(
        (F.covar_samp("pre", "post") / F.var_samp("pre")).alias("_theta"),
        F.avg("pre").alias("_mp"),
    )
    return u.crossJoin(bcast_small(th)).select(
        "user_id",
        F.round("pre", 6).alias("pre"),
        F.round("post", 6).alias("post"),
        F.round(
            F.col("post") - F.col("_theta") * (F.col("pre") - F.col("_mp")), 6
        ).alias("post_cuped"),
    )


@query(
    "q162_seasonal_anomalies",
    """
    WITH e AS (
      SELECT event_id, event_type, value,
             CAST((CAST(epoch_ns(ts) AS BIGINT) // 3600000000000) % 24 AS INT) AS hod
      FROM events WHERE value IS NOT NULL
    ),
    prof AS (
      SELECT event_type, hod, avg(value) AS mu, stddev_samp(value) AS sd,
             CAST(count(*) AS BIGINT) AS n
      FROM e GROUP BY 1, 2
    )
    SELECT e.event_type, e.hod,
           any_value(prof.n) AS n,
           round(any_value(prof.mu), 6) AS mu,
           CAST(sum(CASE WHEN abs(e.value - prof.mu) > 3 * prof.sd
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies
    FROM e JOIN prof ON prof.event_type = e.event_type AND prof.hod = e.hod
    GROUP BY 1, 2
    """,
)
def q162_seasonal_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal (hour-of-day) profile anomaly census: per (event_type,
    hour) mean/σ profile — a 24×|types| metadata frame, broadcast back —
    and the count of events beyond 3σ of THEIR OWN hour's profile. The
    profile pass and the flag pass are each one partial-agg shuffle;
    nothing holds raw history. Epoch-hour arithmetic is integer, so the
    bucketing is exact cross-engine."""
    e = load_events(spark, sf_dir).filter(F.col("value").isNotNull())
    # integer div, not /: epoch-ns exceeds double's 2^53 exact range
    # (ulp ~256 ns at 2026 magnitudes), so float division can bucket an
    # event within ~128 ns of an hour boundary off-by-one vs the
    # oracle's exact // (ADVICE r4)
    hod = ((F.expr("ts div 3600000000000")) % 24).cast("int")
    d = e.select("event_id", "event_type", "value", hod.alias("hod"))
    prof = d.groupBy("event_type", "hod").agg(
        F.avg("value").alias("_mu"),
        F.stddev_samp("value").alias("_sd"),
        F.count(F.lit(1)).cast("long").alias("_n"),
    )
    j = d.join(bcast_small(prof), ["event_type", "hod"])
    return j.groupBy("event_type", "hod").agg(
        F.any_value("_n").alias("n"),
        F.round(F.any_value("_mu"), 6).alias("mu"),
        F.sum(
            (F.abs(F.col("value") - F.col("_mu")) > 3 * F.col("_sd")).cast("long")
        ).cast("long").alias("n_anomalies"),
    )


@query(
    "q163_revenue_gini",
    f"""
    WITH cust AS (
      SELECT c.c_nationkey AS nation, o.o_custkey AS cust,
             CAST(sum({sql_micro_units('o.o_totalprice')})
                  AS BIGINT) AS rev
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY 1, 2
    ),
    r AS (
      SELECT nation, rev,
             row_number() OVER (PARTITION BY nation ORDER BY rev, cust) AS i,
             count(*) OVER (PARTITION BY nation) AS n,
             CAST(sum(rev) OVER (PARTITION BY nation) AS HUGEINT) AS tot
      FROM cust
    )
    SELECT nation,
           CAST(any_value(n) AS BIGINT) AS n_customers,
           round(CAST(any_value(tot) AS DOUBLE) / 1000000, 4) AS revenue,
           round(2.0 * CAST(sum(CAST(i AS HUGEINT) * rev) AS DOUBLE)
                 / (any_value(n) * CAST(any_value(tot) AS DOUBLE))
                 - (any_value(n) + 1.0) / any_value(n), 6) AS gini
    FROM r GROUP BY nation
    """,
)
def q163_revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration per nation as the GINI coefficient —
    G = 2·Σ i·x_(i) / (n·Σx) − (n+1)/n over rank-ordered customer
    revenues. Ranks come from the DISTRIBUTED rank frame
    (aggregate.group_ranked, cust as tiebreak): no per-nation window
    sort in one task even when one nation dominates; the Σ i·x_i /
    totals collapse in one partial-agg pass."""
    from etl_jetro_spark.operators.aggregate import group_ranked

    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    # row-level micro-dollar quantization BEFORE any sum: o_totalprice
    # is a raw double, and a float SUM's last ulps depend on fold order
    # — at 30x the 4-dp round of a ~4e10 total flipped between engines
    # (round-9 30x gate). Per-row round is order-free; every aggregate
    # after it is an exact integer.
    cust = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy(
            F.col("c_nationkey").alias("nation"),
            F.col("o_custkey").alias("cust"),
        )
        .agg(M.sum_micro("o_totalprice").cast("long").alias("rev"))
    )
    ranked = group_ranked(cust, ["nation"], "rev", tiebreak=["cust"])
    tot = F.sum(F.col("_v").cast("decimal(38,0)"))
    return ranked.groupBy("nation").agg(
        F.any_value("_n").cast("long").alias("n_customers"),
        F.round(tot.cast("double") / 1000000, 4).alias("revenue"),
        F.round(
            F.lit(2.0)
            * F.sum(
                F.col("_rn").cast("decimal(19,0)")
                * F.col("_v").cast("decimal(19,0)")
            ).cast("double")
            / (F.any_value("_n") * tot.cast("double"))
            - (F.any_value("_n") + F.lit(1.0)) / F.any_value("_n"),
            6,
        ).alias("gini"),
    )


@query(
    "q164_knn_large_probes",
    """
    WITH emb AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings),
    p AS (SELECT vec_id AS probe_id, v AS pv FROM emb WHERE vec_id < 50),
    s AS (
      SELECT p.probe_id, c.vec_id AS neighbor_id,
             round(list_dot_product(p.pv, c.v)
                   / (sqrt(list_dot_product(p.pv, p.pv))
                      * sqrt(list_dot_product(c.v, c.v))), 12) AS sc
      FROM p JOIN emb c ON c.vec_id <> p.probe_id
    ),
    r AS (
      SELECT probe_id, neighbor_id, sc,
             row_number() OVER (PARTITION BY probe_id
                                ORDER BY sc DESC, neighbor_id) AS rank
      FROM s
    )
    SELECT probe_id, neighbor_id, round(sc, 4) AS score, CAST(rank AS INT) AS rank
    FROM r WHERE rank <= 3
    """,
)
def q164_knn_large_probes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact k-NN join with a LARGE probe set
    (operators/similarity.knn_join_blocked): probes hash into blocks and
    the corpus replicates once per block — no broadcast of either side,
    so the exact path survives probe sets that would OOM q32's broadcast
    form. The |P|·|C| score volume is inherent to exactness; blocking
    spreads it evenly and WindowGroupLimit prunes the top-k shuffle to
    ~k rows per (partition, probe)."""
    from etl_jetro_spark.operators.similarity import knn_join_blocked

    emb = load(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 50)
    out = knn_join_blocked(
        probes, emb, "vec_id", "embedding", k=3, num_probe_blocks=8
    )
    return out.select(
        "probe_id", "neighbor_id", F.round("score", 4).alias("score"), "rank"
    )


@query(
    "q165_dedup_cluster_audit",
    f"""
    WITH RECURSIVE {_dk_shingles_cte(3)},
    mh AS (
      SELECT d.doc_id, s.seed,
             coalesce(min(md5(CAST(s.seed AS VARCHAR) || ':' || sh.sh)),
                      md5(CAST(s.seed AS VARCHAR) || ':')) AS mh
      FROM documents d
      CROSS JOIN (SELECT unnest(generate_series(0, {_MINHASHES - 1})) AS seed) s
      LEFT JOIN sh ON sh.doc_id = d.doc_id
      GROUP BY d.doc_id, s.seed
    ),
    bandkeys AS (
      SELECT doc_id,
             md5(CAST(seed // {_RPB} AS VARCHAR) || ',' ||
                 string_agg(mh, ',' ORDER BY seed)) AS bk
      FROM mh GROUP BY doc_id, seed // {_RPB}
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bandkeys a JOIN bandkeys b ON a.bk = b.bk AND a.doc_id < b.doc_id
    ),
    edges AS (
      SELECT c.id_a, c.id_b
      FROM cand c
      JOIN mh x ON x.doc_id = c.id_a
      JOIN mh y ON y.doc_id = c.id_b AND y.seed = x.seed
      GROUP BY c.id_a, c.id_b
      HAVING sum(CASE WHEN x.mh = y.mh THEN 1 ELSE 0 END) / {_MINHASHES}.0 >= 0.5
    ),
    und AS (SELECT id_a AS a, id_b AS b FROM edges
            UNION SELECT id_b, id_a FROM edges),
    nodes AS (SELECT a AS id FROM und UNION SELECT b FROM und),
    reach(s, t) AS (
      SELECT id, id FROM nodes
      UNION
      SELECT r.s, u.b FROM reach r JOIN und u ON u.a = r.t
    ),
    comp AS (SELECT s AS id, min(t) AS component FROM reach GROUP BY s)
    SELECT CAST(c.component AS BIGINT) AS component,
           CAST(count(*) AS BIGINT) AS cluster_size,
           CAST(min(d.doc_id) AS BIGINT) AS kept_id,
           CAST(count(DISTINCT d.source) AS BIGINT) AS n_sources,
           CAST(min(d.n_chars) AS BIGINT) AS min_chars,
           CAST(max(d.n_chars) AS BIGINT) AS max_chars
    FROM comp c JOIN documents d ON d.doc_id = c.id
    GROUP BY c.component
    HAVING count(*) > 1
    """,
)
def q165_dedup_cluster_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-cluster AUDIT report — the inspect-before-you-delete pass a
    production dedup runs: per multi-member near-dup cluster (the q114
    pipeline's components), its size, surviving id, distinct-source
    span (cross-source clusters signal syndication, not crawl error),
    and length range. All stats are one partial-agg pass over the
    component assignment joined to document metadata."""
    from etl_jetro_spark.operators.dedup import minhash_lsh_candidates
    from etl_jetro_spark.operators.graph import connected_components

    d = load(spark, sf_dir, "documents")
    edges = minhash_lsh_candidates(
        d, "doc_id", "text", num_hashes=_MINHASHES, bands=_BANDS, shingle_words=3
    ).filter(F.col("est_jaccard") >= 0.5)
    comp = connected_components(edges)
    j = comp.withColumnRenamed("id", "doc_id").join(
        d.select("doc_id", "source", "n_chars"), "doc_id"
    )
    return (
        j.groupBy("component")
        .agg(
            F.count(F.lit(1)).cast("long").alias("cluster_size"),
            F.min("doc_id").cast("long").alias("kept_id"),
            F.countDistinct("source").cast("long").alias("n_sources"),
            F.min("n_chars").cast("long").alias("min_chars"),
            F.max("n_chars").cast("long").alias("max_chars"),
        )
        .filter(F.col("cluster_size") > 1)
        .select(
            F.col("component").cast("long").alias("component"),
            "cluster_size",
            "kept_id",
            "n_sources",
            "min_chars",
            "max_chars",
        )
    )


@query(
    "q166_dedup_threshold_sensitivity",
    f"""
    WITH RECURSIVE {_dk_shingles_cte(3)},
    mh AS (
      SELECT d.doc_id, s.seed,
             coalesce(min(md5(CAST(s.seed AS VARCHAR) || ':' || sh.sh)),
                      md5(CAST(s.seed AS VARCHAR) || ':')) AS mh
      FROM documents d
      CROSS JOIN (SELECT unnest(generate_series(0, {_MINHASHES - 1})) AS seed) s
      LEFT JOIN sh ON sh.doc_id = d.doc_id
      GROUP BY d.doc_id, s.seed
    ),
    bandkeys AS (
      SELECT doc_id,
             md5(CAST(seed // {_RPB} AS VARCHAR) || ',' ||
                 string_agg(mh, ',' ORDER BY seed)) AS bk
      FROM mh GROUP BY doc_id, seed // {_RPB}
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bandkeys a JOIN bandkeys b ON a.bk = b.bk AND a.doc_id < b.doc_id
    ),
    est AS (
      SELECT c.id_a, c.id_b,
             sum(CASE WHEN x.mh = y.mh THEN 1 ELSE 0 END) / {_MINHASHES}.0 AS e
      FROM cand c
      JOIN mh x ON x.doc_id = c.id_a
      JOIN mh y ON y.doc_id = c.id_b AND y.seed = x.seed
      GROUP BY c.id_a, c.id_b
    ),
    ts(th) AS (SELECT unnest([0.25, 0.5, 0.75])),
    ed AS (SELECT th, id_a, id_b FROM est CROSS JOIN ts WHERE e >= th),
    und AS (SELECT th, id_a AS a, id_b AS b FROM ed
            UNION SELECT th, id_b, id_a FROM ed),
    nodes AS (SELECT DISTINCT th, a AS id FROM und),
    reach(th, s, t) AS (
      SELECT th, id, id FROM nodes
      UNION
      SELECT r.th, r.s, u.b FROM reach r
      JOIN und u ON u.th = r.th AND u.a = r.t
    ),
    comp AS (SELECT th, s AS id, min(t) AS c FROM reach GROUP BY th, s)
    SELECT th AS threshold,
           CAST(count(DISTINCT c) AS BIGINT) AS n_clusters,
           CAST(count(*) AS BIGINT) AS n_clustered_docs,
           CAST(count(*) - count(DISTINCT c) AS BIGINT) AS n_removable
    FROM comp GROUP BY th
    """,
)
def q166_dedup_threshold_sensitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup threshold-sensitivity report: cluster count, clustered-doc
    count, and removable-doc count of the MinHash pipeline at est-Jaccard
    thresholds {{0.25, 0.5, 0.75}} — the knob-tuning table a curation
    team reads before committing a threshold (removable = docs - one
    survivor per cluster). Candidates and estimates compute ONCE
    (checkpointed); each threshold reruns only the edge filter + the
    component rounds on its (smaller) edge set."""
    from etl_jetro_spark.operators.dedup import minhash_lsh_candidates
    from etl_jetro_spark.operators.graph import connected_components

    d = load(spark, sf_dir, "documents")
    est = minhash_lsh_candidates(
        d, "doc_id", "text", num_hashes=_MINHASHES, bands=_BANDS, shingle_words=3
    ).localCheckpoint(eager=False)
    outs = []
    for th in (0.25, 0.5, 0.75):
        comp = connected_components(
            est.filter(F.col("est_jaccard") >= th)
        )
        outs.append(
            comp.agg(
                F.countDistinct("component").cast("long").alias("n_clusters"),
                F.count(F.lit(1)).cast("long").alias("n_clustered_docs"),
            ).select(
                F.lit(th).alias("threshold"),
                "n_clusters",
                "n_clustered_docs",
                (F.col("n_clustered_docs") - F.col("n_clusters"))
                .cast("long")
                .alias("n_removable"),
            )
        )
    u = outs[0]
    for o in outs[1:]:
        u = u.unionByName(o)
    return u


@query(
    "q167_fulfillment_latency",
    """
    WITH g AS (
      SELECT o.o_orderpriority AS priority,
             CAST(date_diff('day', o.o_orderdate, l.l_shipdate) AS DOUBLE) AS lat
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE l.l_shipdate IS NOT NULL AND o.o_orderdate IS NOT NULL
    )
    SELECT priority,
           CAST(count(*) AS BIGINT) AS n,
           round(quantile_cont(lat, 0.5), 6) AS p50,
           round(quantile_cont(lat, 0.9), 6) AS p90,
           round(quantile_cont(lat, 0.99), 6) AS p99
    FROM g GROUP BY priority
    """,
)
def q167_fulfillment_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order→ship latency SLA distribution per priority: exact
    p50/p90/p99 of day gaps through the DISTRIBUTED percentile operator
    over the orders⋈lineitem join — the raw-row-scale percentile path
    (no per-group multiset) applied to a join result rather than a base
    table; the date arithmetic is integer days, exact cross-engine."""
    from etl_jetro_spark.operators.aggregate import exact_group_percentiles

    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    g = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .filter(F.col("l_shipdate").isNotNull() & F.col("o_orderdate").isNotNull())
        .select(
            F.col("o_orderpriority").alias("priority"),
            F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
            .cast("double")
            .alias("lat"),
        )
    )
    counts = g.groupBy("priority").agg(F.count(F.lit(1)).cast("long").alias("n"))
    pct = exact_group_percentiles(
        g, ["priority"], "lat", {"p50": 0.5, "p90": 0.9, "p99": 0.99}
    )
    return counts.join(pct, "priority").select(
        "priority",
        "n",
        F.round("p50", 6).alias("p50"),
        F.round("p90", 6).alias("p90"),
        F.round("p99", 6).alias("p99"),
    )


@query(
    "q168_dedup_gray_zone",
    f"""
    WITH {_dk_shingles_cte(3)},
    mh AS (
      SELECT d.doc_id, s.seed,
             coalesce(min(md5(CAST(s.seed AS VARCHAR) || ':' || sh.sh)),
                      md5(CAST(s.seed AS VARCHAR) || ':')) AS mh
      FROM documents d
      CROSS JOIN (SELECT unnest(generate_series(0, {_MINHASHES - 1})) AS seed) s
      LEFT JOIN sh ON sh.doc_id = d.doc_id
      GROUP BY d.doc_id, s.seed
    ),
    bandkeys AS (
      SELECT doc_id,
             md5(CAST(seed // {_RPB} AS VARCHAR) || ',' ||
                 string_agg(mh, ',' ORDER BY seed)) AS bk
      FROM mh GROUP BY doc_id, seed // {_RPB}
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bandkeys a JOIN bandkeys b ON a.bk = b.bk AND a.doc_id < b.doc_id
    ),
    est AS (
      SELECT c.id_a, c.id_b,
             sum(CASE WHEN x.mh = y.mh THEN 1 ELSE 0 END) / {_MINHASHES}.0 AS e
      FROM cand c
      JOIN mh x ON x.doc_id = c.id_a
      JOIN mh y ON y.doc_id = c.id_b AND y.seed = x.seed
      GROUP BY c.id_a, c.id_b
    )
    SELECT id_a, id_b, round(e, 6) AS est_jaccard
    FROM est WHERE e >= 0.5 AND e < 1.0
    ORDER BY e DESC, id_a, id_b LIMIT 25
    """,
)
def q168_dedup_gray_zone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup GRAY-ZONE audit: candidate pairs that band-matched but are
    NOT estimated identical (0.5 ≤ est < 1) — the near-miss band a human
    or a stronger verifier reviews before committing deletions (exact
    dups are safe; these are the judgment calls). One filter + top-k
    over the already-computed candidate frame; result-set sized."""
    from etl_jetro_spark.operators.dedup import minhash_lsh_candidates

    d = load(spark, sf_dir, "documents")
    est = minhash_lsh_candidates(
        d, "doc_id", "text", num_hashes=_MINHASHES, bands=_BANDS, shingle_words=3
    )
    return (
        est.filter(
            (F.col("est_jaccard") >= 0.5) & (F.col("est_jaccard") < 1.0)
        )
        .select("id_a", "id_b", F.round("est_jaccard", 6).alias("est_jaccard"))
        .orderBy(F.desc("est_jaccard"), F.asc("id_a"), F.asc("id_b"))
        .limit(25)
    )


@query(
    "q169_syndication_matrix",
    f"""
    WITH RECURSIVE {_dk_shingles_cte(3)},
    mh AS (
      SELECT d.doc_id, s.seed,
             coalesce(min(md5(CAST(s.seed AS VARCHAR) || ':' || sh.sh)),
                      md5(CAST(s.seed AS VARCHAR) || ':')) AS mh
      FROM documents d
      CROSS JOIN (SELECT unnest(generate_series(0, {_MINHASHES - 1})) AS seed) s
      LEFT JOIN sh ON sh.doc_id = d.doc_id
      GROUP BY d.doc_id, s.seed
    ),
    bandkeys AS (
      SELECT doc_id,
             md5(CAST(seed // {_RPB} AS VARCHAR) || ',' ||
                 string_agg(mh, ',' ORDER BY seed)) AS bk
      FROM mh GROUP BY doc_id, seed // {_RPB}
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bandkeys a JOIN bandkeys b ON a.bk = b.bk AND a.doc_id < b.doc_id
    ),
    edges AS (
      SELECT c.id_a, c.id_b
      FROM cand c
      JOIN mh x ON x.doc_id = c.id_a
      JOIN mh y ON y.doc_id = c.id_b AND y.seed = x.seed
      GROUP BY c.id_a, c.id_b
      HAVING sum(CASE WHEN x.mh = y.mh THEN 1 ELSE 0 END) / {_MINHASHES}.0 >= 0.5
    ),
    und AS (SELECT id_a AS a, id_b AS b FROM edges
            UNION SELECT id_b, id_a FROM edges),
    nodes AS (SELECT a AS id FROM und UNION SELECT b FROM und),
    reach(s, t) AS (
      SELECT id, id FROM nodes
      UNION
      SELECT r.s, u.b FROM reach r JOIN und u ON u.a = r.t
    ),
    comp AS (SELECT s AS id, min(t) AS component FROM reach GROUP BY s),
    cs AS (
      SELECT DISTINCT c.component, d.source
      FROM comp c JOIN documents d ON d.doc_id = c.id
    )
    SELECT a.source AS source_a, b.source AS source_b,
           CAST(count(*) AS BIGINT) AS n_shared_clusters
    FROM cs a JOIN cs b
      ON a.component = b.component AND a.source < b.source
    GROUP BY 1, 2
    """,
)
def q169_syndication_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source SYNDICATION matrix: for every near-dup cluster
    spanning multiple sources, which source pairs co-occur and how often
    — the copied-content flow map (boilerplate syndication vs original
    content). Per-cluster distinct sources explode to source pairs —
    bounded by (#sources per cluster)², never documents² — then one
    partial-agg count."""
    from etl_jetro_spark.operators.dedup import minhash_lsh_candidates
    from etl_jetro_spark.operators.graph import connected_components

    d = load(spark, sf_dir, "documents")
    edges = minhash_lsh_candidates(
        d, "doc_id", "text", num_hashes=_MINHASHES, bands=_BANDS, shingle_words=3
    ).filter(F.col("est_jaccard") >= 0.5)
    comp = connected_components(edges)
    cs = (
        comp.withColumnRenamed("id", "doc_id")
        .join(d.select("doc_id", "source"), "doc_id")
        .select("component", "source")
        .distinct()
    )
    return (
        cs.alias("a")
        .join(cs.alias("b"), "component")
        .select(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared_clusters"))
    )


@query(
    "q170_conversion_survival",
    """
    WITH e AS (
      SELECT user_id, event_type, CAST(epoch_ns(ts) AS BIGINT) AS t
      FROM events WHERE event_type IN ('click', 'purchase')
    ),
    fc AS (SELECT user_id, min(t) AS t0 FROM e
           WHERE event_type = 'click' GROUP BY user_id),
    fp AS (
      SELECT fc.user_id, min(e.t) AS tp
      FROM fc JOIN e ON e.user_id = fc.user_id
       AND e.event_type = 'purchase' AND e.t >= fc.t0
      GROUP BY fc.user_id
    )
    SELECT CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(CASE WHEN tp IS NOT NULL
                         AND tp - t0 <= 3600000000000 THEN 1 ELSE 0 END)
                AS BIGINT) AS conv_1h,
           CAST(sum(CASE WHEN tp IS NOT NULL
                         AND tp - t0 <= 86400000000000 THEN 1 ELSE 0 END)
                AS BIGINT) AS conv_24h,
           CAST(sum(CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS conv_ever
    FROM fc LEFT JOIN fp ON fp.user_id = fc.user_id
    """,
)
def q170_conversion_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-conversion survival steps: of users with a first click,
    how many purchased within 1 hour / 24 hours / ever (at-or-after the
    click) — the funnel-latency summary. Two keyed min-aggregations and
    one counts row; integer ns arithmetic throughout."""
    e = load_events(spark, sf_dir).filter(
        F.col("event_type").isin("click", "purchase")
    )
    fc = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )
    fp = (
        fc.join(
            e.filter(F.col("event_type") == "purchase").select(
                "user_id", F.col("ts").alias("tp")
            ),
            "user_id",
        )
        .filter(F.col("tp") >= F.col("t0"))
        .groupBy("user_id")
        .agg(F.min("tp").alias("tp"))
    )
    j = fc.join(fp, "user_id", "left")
    hour = 3_600_000_000_000
    return j.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum(
            (F.col("tp").isNotNull() & ((F.col("tp") - F.col("t0")) <= hour))
            .cast("long")
        ).cast("long").alias("conv_1h"),
        F.sum(
            (F.col("tp").isNotNull() & ((F.col("tp") - F.col("t0")) <= 24 * hour))
            .cast("long")
        ).cast("long").alias("conv_24h"),
        F.sum(F.col("tp").isNotNull().cast("long")).cast("long").alias("conv_ever"),
    )


@query(
    "q171_basket_diversity",
    """
    WITH b AS (
      SELECT o.o_orderpriority AS priority, l.l_orderkey,
             p.p_type AS ptype, count(*) AS c
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY 1, 2, 3
    ),
    tot AS (SELECT priority, l_orderkey, sum(c) AS n FROM b GROUP BY 1, 2),
    h AS (
      SELECT b.priority, b.l_orderkey,
             ln(tot.n) - sum(b.c * ln(b.c)) / tot.n AS ent
      FROM b JOIN tot USING (priority, l_orderkey)
      GROUP BY b.priority, b.l_orderkey, tot.n
    )
    SELECT priority,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(avg(ent), 6) AS avg_entropy,
           round(max(ent), 6) AS max_entropy
    FROM h GROUP BY priority
    """,
)
def q171_basket_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Basket diversity per order priority: Shannon entropy of part
    types within each order (H = ln n − Σ c·ln c / n — the q134 per-doc
    formulation applied to baskets), averaged per priority. Per-basket
    state is type-count sized; two partial-agg shuffles plus the dim
    join (part broadcast by AQE)."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    p = load(spark, sf_dir, "part")
    b = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(p, li["l_partkey"] == p["p_partkey"])
        .groupBy(
            F.col("o_orderpriority").alias("priority"),
            F.col("l_orderkey").alias("ok"),
            F.col("p_type").alias("ptype"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    h = b.groupBy("priority", "ok").agg(
        (
            F.log(F.sum("c"))
            - F.sum(F.col("c") * F.log("c")) / F.sum("c")
        ).alias("ent")
    )
    return h.groupBy("priority").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.round(F.avg("ent"), 6).alias("avg_entropy"),
        F.round(F.max("ent"), 6).alias("max_entropy"),
    )


@query(
    "q172_repurchase_intervals",
    """
    WITH p AS (
      SELECT user_id, CAST(epoch_ns(ts) AS BIGINT) AS t, event_id
      FROM events WHERE event_type = 'purchase'
    ),
    g AS (
      SELECT CAST((t - lag(t) OVER (PARTITION BY user_id
                                    ORDER BY t, event_id)) // 1000000000
                  AS DOUBLE) AS gap_s
      FROM p
    )
    SELECT CAST(count(*) AS BIGINT) AS n_gaps,
           round(quantile_cont(gap_s, 0.5), 6) AS p50_s,
           round(quantile_cont(gap_s, 0.9), 6) AS p90_s
    FROM g WHERE gap_s IS NOT NULL
    """,
)
def q172_repurchase_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeat-purchase interval distribution: per-user consecutive
    purchase gaps (one (user, time) sort + lag), then global exact
    p50/p90 through the distributed percentile operator — purchase
    cadence for retention modeling, with integer ns gap arithmetic."""
    from etl_jetro_spark.operators.aggregate import exact_group_percentiles
    from pyspark.sql import Window

    e = load_events(spark, sf_dir).filter(F.col("event_type") == "purchase")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    g = e.select(
        (
            (F.col("ts") - F.lag("ts").over(w))
            / F.lit(1_000_000_000)
        ).cast("long").cast("double").alias("gap_s")
    ).filter(F.col("gap_s").isNotNull())
    cnt = g.agg(F.count(F.lit(1)).cast("long").alias("n_gaps"))
    pct = exact_group_percentiles(g, [], "gap_s", {"p50_s": 0.5, "p90_s": 0.9})
    return cnt.crossJoin(bcast_small(pct)).select(
        "n_gaps",
        F.round("p50_s", 6).alias("p50_s"),
        F.round("p90_s", 6).alias("p90_s"),
    )


@query(
    "q173_monthly_status_mix",
    """
    SELECT CAST(strftime(o_orderdate, '%Y-%m') AS VARCHAR) AS month,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(avg(CASE WHEN o_orderstatus = 'F' THEN 1.0 ELSE 0.0 END), 6)
             AS share_f,
           round(avg(CASE WHEN o_orderstatus = 'O' THEN 1.0 ELSE 0.0 END), 6)
             AS share_o,
           round(avg(CASE WHEN o_orderstatus = 'P' THEN 1.0 ELSE 0.0 END), 6)
             AS share_p
    FROM orders GROUP BY 1
    """,
)
def q173_monthly_status_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly order-status mix — the operational trend report: one
    partial-agg pass bucketed by calendar month (date_format is pure
    expression; month count bounds the output)."""
    o = load(spark, sf_dir, "orders")
    month = F.date_format("o_orderdate", "yyyy-MM")
    return o.groupBy(month.alias("month")).agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.round(F.avg((F.col("o_orderstatus") == "F").cast("double")), 6).alias("share_f"),
        F.round(F.avg((F.col("o_orderstatus") == "O").cast("double")), 6).alias("share_o"),
        F.round(F.avg((F.col("o_orderstatus") == "P").cast("double")), 6).alias("share_p"),
    )


@query(
    "q174_segment_priority_matrix",
    f"""
    WITH g AS (
      SELECT c.c_mktsegment AS segment, o.o_orderpriority AS priority,
             CAST(count(*) AS BIGINT) AS n_orders,
             {sql_sum_micro('o.o_totalprice')} AS um
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY 1, 2
    )
    SELECT segment, priority, n_orders,
           round(CAST(um AS DOUBLE) / 1000000, 4) AS revenue,
           round(CAST(um AS DOUBLE)
                 / CAST(sum(um) OVER (PARTITION BY segment) AS DOUBLE),
                 6) AS share_in_segment
    FROM g
    """,
)
def q174_segment_priority_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-segment × order-priority revenue matrix with within-segment
    shares — the q139 percent-of-total pattern over a two-dim grouping:
    the share window runs over the POST-AGG 25-row frame, never raw
    orders; the customer dim joins broadcast."""
    from pyspark.sql import Window

    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    g = (
        o.join(bcast_sized(c), o["o_custkey"] == c["c_custkey"])
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.col("o_orderpriority").alias("priority"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            # row-level micro-dollar quantization: order-free, so the
            # revenue column survives any sum order (30x-gate class)
            M.sum_micro("o_totalprice").alias("_um"),
        )
    )
    w = Window.partitionBy("segment")
    return g.select(
        "segment",
        "priority",
        "n_orders",
        F.round(F.col("_um").cast("double") / 1000000, 4).alias("revenue"),
        F.round(
            F.col("_um").cast("double")
            / F.sum("_um").over(w).cast("double"),
            6,
        ).alias("share_in_segment"),
    )


# --------------------------------------------------------------------------
# 14. Round-5 wave: corpus curation (domain caps, mixture rebalancing,
#     vocabulary drift, dedup-aware weights) + PageRank + OHLC bars
# --------------------------------------------------------------------------



def _ntile_from_rank(rn, n, k: int):
    """Exact SQL ntile(k) derived from a 1-based total-order rank and the
    group size (both Columns): the first n mod k tiles take n div k + 1
    rows, the rest n div k. The distributed-rank-frame replacement for an
    ntile window (q92 pattern)."""
    q = F.floor(n / k).cast("long")
    rem = (n % k).cast("long")
    return (
        F.when(rn <= rem * (q + 1), F.ceil(rn / (q + 1)))
        .otherwise(rem + F.ceil((rn - rem * (q + 1)) / q))
        .cast("long")
    )


def _hexb_sql(salt: str, col: str, buckets: int) -> str:
    """DuckDB mirror of sampling.hash_bucket: first 8 md5 hex digits as a
    32-bit int mod buckets (the q62 construction, parameterized)."""
    hx = f"md5('{salt}' || CAST({col} AS VARCHAR))"
    digits = " + ".join(
        f"(strpos('0123456789abcdef', substr({hx}, {i + 1}, 1)) - 1) * {16 ** (7 - i)}"
        for i in range(8)
    )
    return f"(({digits}) % {buckets})"


@query(
    "q175_source_quota_cap",
    """
    WITH r AS (
      SELECT source, n_chars,
             row_number() OVER (
               PARTITION BY source
               ORDER BY substr(md5('cap:' || CAST(doc_id AS VARCHAR)), 1, 15),
                        doc_id
             ) AS rk,
             count(*) OVER (PARTITION BY source) AS n
      FROM documents)
    SELECT source,
           CAST(max(n) AS BIGINT)                               AS n_total,
           CAST(count(*) FILTER (rk <= 10) AS BIGINT)           AS n_kept,
           CAST(sum(n_chars) FILTER (rk <= 10) AS BIGINT)       AS chars_kept
    FROM r GROUP BY source
    """,
)
def q175_source_quota_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document cap (operators/sampling.quota_cap) — the
    per-domain cap of web-corpus curation (C4/RefinedWeb keep ≤N pages
    per host): within each source keep the 10 docs with the smallest
    (md5, id) and report kept volume per source. The operator is EXACT
    without a domain-sized sort task: per-key counts join back, rows
    prefilter to hash fraction ≤ 4·cap/n (cap-sized window partitions at
    any domain size), and the e^{-cap}-rare under-quota key falls back to
    ranking its full list. The oracle is the plain rank definition."""
    from etl_jetro_spark.operators.sampling import quota_cap

    d = load(spark, sf_dir, "documents")
    kept = quota_cap(d, "doc_id", "source", cap=10, salt="cap:")
    tot = d.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("n_total"))
    k = kept.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.sum("n_chars").cast("long").alias("chars_kept"),
    )
    return tot.join(k, "source")


_MIX_LANGS = ("de", "en", "es", "fr", "zh")

@query(
    "q176_target_mix_resample",
    f"""
    WITH tg AS (SELECT * FROM (VALUES {", ".join(f"('{g}', 0.2)" for g in _MIX_LANGS)})
                t(lang, t)),
    g AS (SELECT lang, CAST(count(*) AS DOUBLE) AS gn,
                 CAST(count(*) AS BIGINT) AS n_before
          FROM documents GROUP BY 1),
    wc AS (SELECT g.lang, g.gn, g.n_before, tg.t, g.gn / tg.t AS ratio
           FROM g JOIN tg USING (lang)),
    c AS (SELECT min(ratio) AS c FROM wc),
    rates AS (SELECT lang, n_before,
                     least(1.0, t * c.c / gn) AS rate
              FROM wc CROSS JOIN c),
    kept AS (
      SELECT d.lang, d.n_chars, r.n_before, r.rate
      FROM documents d JOIN rates r USING (lang)
      WHERE {_hexb_sql("mix:", "d.doc_id", 10_000)}
            < CAST(round(r.rate * 10000) AS BIGINT))
    SELECT lang,
           any_value(n_before)                                  AS n_before,
           CAST(count(*) AS BIGINT)                             AS n_after,
           CAST(round(any_value(rate) * 10000) AS BIGINT)       AS rate_bp,
           CAST(sum(n_chars) AS BIGINT)                         AS chars_after
    FROM kept GROUP BY lang
    """,
)
def q176_target_mix_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Downsample-only importance resampling to a uniform language mix
    (operators/sampling.target_mix_resample) — the data-mixture
    rebalancing step of corpus curation: per-group keep rate
    min(1, target/actual · c) with c pinned so the rarest language keeps
    everything; rates quantize to 1/10000 hash buckets so the accept
    decision is boundary-ulp-proof cross-engine. Group shares are a
    5-row aggregate broadcast back; the accept filter is a pure
    projection — no data-scale shuffle."""
    from etl_jetro_spark.operators.sampling import target_mix_resample

    d = load(spark, sf_dir, "documents")
    targets = {g: 0.2 for g in _MIX_LANGS}
    out = target_mix_resample(d, "doc_id", "lang", targets, salt="mix:")
    tot = d.groupBy("lang").agg(F.count(F.lit(1)).cast("long").alias("n_before"))
    agg = out.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_after"),
        F.round(F.any_value("_keep_rate") * 10000).cast("long").alias("rate_bp"),
        F.sum("n_chars").cast("long").alias("chars_after"),
    )
    return tot.join(agg, "lang")


@query(
    "q177_vocab_kl_drift",
    f"""
    WITH wr AS (SELECT doc_id, string_split({DK_NORM_TEXT}, ' ') AS w
                FROM documents),
    tok AS (
      SELECT doc_id, w[i] AS t FROM wr,
             UNNEST(generate_series(1, len(w))) AS s(i)
      WHERE w[i] <> ''
    ),
    hl AS (SELECT t,
                  CASE WHEN {_hexb_sql("half:", "doc_id", 2)} = 0
                       THEN 1 ELSE 0 END AS isa
           FROM tok),
    cnt AS (SELECT t, CAST(sum(isa) AS DOUBLE) AS ca,
                   CAST(sum(1 - isa) AS DOUBLE) AS cb
            FROM hl GROUP BY t),
    tots AS (SELECT sum(ca) AS na, sum(cb) AS nb,
                    CAST(count(*) AS DOUBLE) AS v
             FROM cnt),
    pq AS (SELECT (ca + 1) / (na + v) AS p, (cb + 1) / (nb + v) AS q,
                  na, nb, v
           FROM cnt CROSS JOIN tots)
    SELECT CAST(any_value(v) AS BIGINT)                          AS vocab,
           CAST(any_value(na) AS BIGINT)                         AS tokens_a,
           CAST(any_value(nb) AS BIGINT)                         AS tokens_b,
           round(sum(p * ln(p / q)), 6)                          AS kl_ab,
           round(sum(q * ln(q / p)), 6)                          AS kl_ba,
           round(0.5 * sum(p * ln(2 * p / (p + q)))
               + 0.5 * sum(q * ln(2 * q / (p + q))), 6)          AS js
    FROM pq
    """,
)
def q177_vocab_kl_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary drift between two deterministic corpus halves (md5
    parity of doc_id): add-1-smoothed unigram distributions compared by
    KL both ways and Jensen-Shannon divergence — the train/holdout (or
    snapshot-over-snapshot) distribution-shift monitor of a data
    pipeline, at token level (q142 is the numeric-histogram twin). One
    token-count shuffle; the totals are a one-row aggregate broadcast
    back; the final reduction is vocab-sized with map-side partials."""
    from etl_jetro_spark.functions.hashing import norm_text
    from etl_jetro_spark.operators.sampling import hash_bucket

    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.explode(F.split(norm_text("text"), " ")).alias("t"),
    ).filter(F.col("t") != "")
    isa = (hash_bucket("doc_id", 2, "half:") == 0).cast("int")
    cnt = toks.withColumn("_isa", isa).groupBy("t").agg(
        F.sum("_isa").cast("double").alias("ca"),
        F.sum(1 - F.col("_isa")).cast("double").alias("cb"),
    )
    tots = cnt.agg(
        F.sum("ca").alias("na"),
        F.sum("cb").alias("nb"),
        F.count(F.lit(1)).cast("double").alias("v"),
    )
    p = (F.col("ca") + 1) / (F.col("na") + F.col("v"))
    q = (F.col("cb") + 1) / (F.col("nb") + F.col("v"))
    pq = cnt.crossJoin(bcast_small(tots)).select(
        p.alias("p"), q.alias("q"), "na", "nb", "v"
    )
    return pq.agg(
        F.any_value("v").cast("long").alias("vocab"),
        F.any_value("na").cast("long").alias("tokens_a"),
        F.any_value("nb").cast("long").alias("tokens_b"),
        F.round(F.sum(F.col("p") * F.log(F.col("p") / F.col("q"))), 6).alias("kl_ab"),
        F.round(F.sum(F.col("q") * F.log(F.col("q") / F.col("p"))), 6).alias("kl_ba"),
        F.round(
            0.5 * F.sum(F.col("p") * F.log(2 * F.col("p") / (F.col("p") + F.col("q"))))
            + 0.5 * F.sum(F.col("q") * F.log(2 * F.col("q") / (F.col("p") + F.col("q")))),
            6,
        ).alias("js"),
    )


def _pagerank_oracle_sql(iters: int = 5) -> str:
    steps = []
    prev = "r0"
    for i in range(1, iters + 1):
        steps.append(
            f"""r{i} AS (
      SELECT deg.u, (1 - 0.85) / nn.c + 0.85 * coalesce(t.s, 0) AS r
      FROM deg CROSS JOIN nn
      LEFT JOIN (SELECT und.v AS u, sum({prev}.r / deg.d) AS s
                 FROM und JOIN {prev} ON {prev}.u = und.u
                 JOIN deg ON deg.u = und.u GROUP BY und.v) t ON t.u = deg.u)"""
        )
        prev = f"r{i}"
    joined = ",\n    ".join(steps)
    return f"""
    WITH bsk AS (SELECT l_orderkey, l_partkey FROM lineitem
                 GROUP BY l_orderkey, l_partkey),
    e AS (
      SELECT x.l_partkey AS a, y.l_partkey AS b
      FROM bsk x JOIN bsk y
        ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
      GROUP BY 1, 2 HAVING count(*) >= 2
    ),
    und AS (SELECT a AS u, b AS v FROM e UNION SELECT b, a FROM e),
    deg AS (SELECT u, CAST(count(*) AS DOUBLE) AS d FROM und GROUP BY u),
    nn AS (SELECT CAST(count(*) AS DOUBLE) AS c FROM deg),
    r0 AS (SELECT u, 1.0 / nn.c AS r FROM deg CROSS JOIN nn),
    {joined}
    SELECT u AS id, round(r{iters}.r, 6) AS rank FROM r{iters}
    """


@query("q178_copurchase_pagerank", _pagerank_oracle_sql(5))
def q178_copurchase_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-iteration PageRank (operators/graph.pagerank, 5 rounds,
    β=0.85) over the q156/q158 co-purchase part graph — the canonical
    iterative graph centrality every distributed engine ships
    (Pregel/GraphX semantics as join + map-side-combined sum; rank frame
    node-sized, per-round work one edges⋈ranks hash join, lineage
    checkpoint-bounded per round). The oracle unrolls the same five
    synchronous iterations as CTEs."""
    from etl_jetro_spark.operators.graph import pagerank

    li = load(spark, sf_dir, "lineitem")
    edges = _pair_support(li).select(
        F.col("u").alias("id_a"), F.col("v").alias("id_b")
    )
    pr = pagerank(edges, iterations=5, damping=0.85)
    return pr.select("id", F.round("rank", 6).alias("rank"))


@query(
    "q179_dedup_effective_size",
    f"""
    WITH fp AS (SELECT doc_id, lang, md5({DK_NORM_TEXT}) AS f FROM documents),
    gs AS (SELECT f, count(*) AS sz FROM fp GROUP BY f)
    SELECT lang,
           CAST(count(*) AS BIGINT)                              AS n_docs,
           CAST(count(DISTINCT fp.f) AS BIGINT)                  AS n_unique,
           round(sum(1.0 / gs.sz), 6)                            AS effective_size,
           round(1 - count(DISTINCT fp.f) / CAST(count(*) AS DOUBLE), 6)
                                                                 AS dup_fraction
    FROM fp JOIN gs USING (f) GROUP BY lang
    """,
)
def q179_dedup_effective_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-aware sampling weights: each document weighs 1/|its exact-dup
    group| (multi-epoch-safe mixture accounting — a doc syndicated 40×
    contributes one doc's worth of training mass), rolled up per language
    to effective dataset size and duplicate fraction. The fingerprint
    group sizes are one hash-partition agg joined back on the
    fingerprint — the exact_duplicates shuffle shape, nothing
    broadcast-unbounded."""
    from etl_jetro_spark.functions.hashing import doc_fingerprint

    d = load(spark, sf_dir, "documents")
    fp = d.select("doc_id", "lang", doc_fingerprint("text").alias("f"))
    gs = fp.groupBy("f").agg(F.count(F.lit(1)).alias("sz"))
    j = fp.join(gs, "f")
    return j.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.countDistinct("f").cast("long").alias("n_unique"),
        F.round(F.sum(1.0 / F.col("sz")), 6).alias("effective_size"),
        F.round(
            1 - F.countDistinct("f") / F.count(F.lit(1)).cast("double"), 6
        ).alias("dup_fraction"),
    )


@query(
    "q180_hourly_ohlc",
    """
    WITH e AS (
      SELECT event_type,
             (CAST(floor(epoch(ts)) AS BIGINT) // 3600) * 3600 AS hour_epoch,
             ts, event_id, value
      FROM events WHERE value IS NOT NULL),
    r AS (
      SELECT *,
             row_number() OVER (PARTITION BY event_type, hour_epoch
                                ORDER BY ts, event_id)            AS ra,
             row_number() OVER (PARTITION BY event_type, hour_epoch
                                ORDER BY ts DESC, event_id DESC)  AS rd
      FROM e)
    SELECT event_type, hour_epoch,
           round(max(CASE WHEN ra = 1 THEN value END), 6) AS open,
           round(max(value), 6)                           AS high,
           round(min(value), 6)                           AS low,
           round(max(CASE WHEN rd = 1 THEN value END), 6) AS close,
           CAST(count(*) AS BIGINT)                       AS volume
    FROM r GROUP BY 1, 2
    """,
)
def q180_hourly_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC bars per event type — the time-series downsampling
    shape of every metrics store. ONE partial-aggregable pass: open/close
    via min_by/max_by on the (ts, event_id) struct order (no window, no
    per-group sort — each task keeps one candidate per group and partials
    merge), high/low/volume plain aggregates. The oracle uses the
    rank-window definition; (ts, event_id) is unique so both orders are
    total."""
    e = load_events(spark, sf_dir).filter(F.col("value").isNotNull())
    hour = F.expr("(ts div 1000000000) div 3600") * 3600
    ordk = F.struct(F.col("ts"), F.col("event_id"))
    return e.groupBy("event_type", hour.alias("hour_epoch")).agg(
        F.round(F.min_by("value", ordk), 6).alias("open"),
        F.round(F.max("value"), 6).alias("high"),
        F.round(F.min("value"), 6).alias("low"),
        F.round(F.max_by("value", ordk), 6).alias("close"),
        F.count(F.lit(1)).cast("long").alias("volume"),
    )


@query(
    "q181_curriculum_decile_weights",
    f"""
    WITH t AS (SELECT doc_id, list_filter({DK_WORDS}, x -> x <> '') AS w
               FROM documents),
    sc AS (SELECT doc_id,
                  round(len(list_distinct(w))
                        / CAST(greatest(len(w), 1) AS DOUBLE), 6) AS score
           FROM t),
    r AS (SELECT doc_id, score,
                 ntile(10) OVER (ORDER BY score, doc_id) AS dec
          FROM sc)
    SELECT CAST(dec AS BIGINT)                          AS decile,
           CAST(count(*) AS BIGINT)                     AS n_docs,
           round(min(score), 6)                         AS lo_score,
           round(max(score), 6)                         AS hi_score,
           round(dec / 10.0, 1)                         AS weight,
           round(count(*) * dec / 10.0, 4)              AS effective_docs
    FROM r GROUP BY dec
    """,
)
def q181_curriculum_decile_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum sampling weights by lexical-diversity decile: score =
    distinct-token ratio (partition-local array expressions), deciles via
    the distributed rank frame (q92's exact ntile derivation from
    group_ranked — no SinglePartition window), weight ∝ decile — the
    quality-curriculum mixing table of a training pipeline (cleaner
    deciles sampled more often). Effective docs = n·weight per decile."""
    from etl_jetro_spark.functions.hashing import norm_text
    from etl_jetro_spark.operators.aggregate import group_ranked

    d = load(spark, sf_dir, "documents")
    w = F.filter(F.split(norm_text("text"), " "), lambda x: x != "")
    score = F.round(
        F.size(F.array_distinct(w))
        / F.greatest(F.size(w), F.lit(1)).cast("double"),
        6,
    )
    sc = d.select("doc_id", score.alias("score"))
    r = group_ranked(sc, [], F.col("score"), tiebreak=["doc_id"])
    n, rn = F.col("_n"), F.col("_rn")
    dec = _ntile_from_rank(rn, n, 10)
    per = r.select(F.col("_v").alias("score"), dec.alias("decile"))
    return per.groupBy("decile").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.round(F.min("score"), 6).alias("lo_score"),
        F.round(F.max("score"), 6).alias("hi_score"),
        F.round(F.col("decile") / 10.0, 1).alias("weight"),
        F.round(F.count(F.lit(1)) * F.col("decile") / 10.0, 4).alias(
            "effective_docs"
        ),
    )


@query(
    "q182_referential_conformance",
    """
    SELECT 'lineitem->orders' AS relation,
           (SELECT CAST(count(*) AS BIGINT) FROM lineitem) AS n_child,
           (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_orderkey = l.l_orderkey)) AS n_orphans
    UNION ALL
    SELECT 'lineitem->part',
           (SELECT CAST(count(*) AS BIGINT) FROM lineitem),
           (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM part p
                              WHERE p.p_partkey = l.l_partkey))
    UNION ALL
    SELECT 'lineitem->supplier',
           (SELECT CAST(count(*) AS BIGINT) FROM lineitem),
           (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM supplier s
                              WHERE s.s_suppkey = l.l_suppkey))
    UNION ALL
    SELECT 'orders->customer',
           (SELECT CAST(count(*) AS BIGINT) FROM orders),
           (SELECT CAST(count(*) AS BIGINT) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o.o_custkey))
    UNION ALL
    SELECT 'customer->nation',
           (SELECT CAST(count(*) AS BIGINT) FROM customer),
           (SELECT CAST(count(*) AS BIGINT) FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM nation n
                              WHERE n.n_nationkey = c.c_nationkey))
    """,
)
def q182_referential_conformance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit across the star schema: orphan counts
    for every FK edge (the data-contract check an ingest pipeline runs
    before publishing a snapshot). Each relation is a LEFT ANTI join
    (dims broadcast under AQE, facts never collected) + two scalar
    counts cross-joined into one row; five relation rows union. Healthy
    TPC-H data reports zero orphans — the audit's value is the plan, not
    the number."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    p = load(spark, sf_dir, "part")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")

    def rel(name, child, ckey, parent, pkey):
        total = child.agg(F.count(F.lit(1)).cast("long").alias("n_child"))
        orphans = (
            child.join(
                parent.select(pkey).distinct(),
                child[ckey] == parent[pkey],
                "left_anti",
            )
            .agg(F.count(F.lit(1)).cast("long").alias("n_orphans"))
        )
        return (
            total.crossJoin(orphans)
            .select(F.lit(name).alias("relation"), "n_child", "n_orphans")
        )

    return (
        rel("lineitem->orders", li, "l_orderkey", o, "o_orderkey")
        .unionByName(rel("lineitem->part", li, "l_partkey", p, "p_partkey"))
        .unionByName(rel("lineitem->supplier", li, "l_suppkey", s, "s_suppkey"))
        .unionByName(rel("orders->customer", o, "o_custkey", c, "c_custkey"))
        .unionByName(rel("customer->nation", c, "c_nationkey", n, "n_nationkey"))
    )


@query(
    "q183_sample_diversity",
    f"""
    WITH ids AS (
      SELECT doc_id FROM (
        SELECT doc_id, row_number() OVER (
          ORDER BY md5('div:' || CAST(doc_id AS VARCHAR)), doc_id) AS rk
        FROM documents) WHERE rk <= 50),
    {_dk_shingles_cte(3)},
    ds AS (SELECT sh.doc_id,
                  list_sort(list_distinct(list(sh.sh))) AS s,
                  count(DISTINCT sh.sh) AS n
           FROM sh JOIN ids ON ids.doc_id = sh.doc_id
           GROUP BY sh.doc_id),
    pr AS (
      SELECT a.n + b.n - len(list_intersect(a.s, b.s)) AS un,
             len(list_intersect(a.s, b.s)) AS cm
      FROM ds a JOIN ds b ON a.doc_id < b.doc_id)
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM ds)       AS n_docs,
           CAST(count(*) AS BIGINT)                        AS n_pairs,
           round(avg(CASE WHEN un = 0 THEN 1.0
                          ELSE cm / CAST(un AS DOUBLE) END), 6) AS mean_jaccard,
           round(max(CASE WHEN un = 0 THEN 1.0
                          ELSE cm / CAST(un AS DOUBLE) END), 6) AS max_jaccard
    FROM pr
    """,
)
def q183_sample_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus diversity telemetry on a deterministic 50-doc sample
    (self-BLEU's set-overlap cousin): mean and max pairwise 3-gram
    Jaccard across the sample — high mean = templated/redundant corpus.
    The sample is a TakeOrdered md5 top-50 (never a global window); the
    pair join is 50×49/2 rows of doc-bounded shingle sets — constant
    work at ANY corpus scale, which is the point of sampling it."""
    from etl_jetro_spark.operators.dedup import shingle_rows

    d = load(spark, sf_dir, "documents")
    ids = (
        d.select(
            "doc_id",
            F.md5(F.concat(F.lit("div:"), F.col("doc_id").cast("string"))).alias("_h"),
        )
        .orderBy("_h", "doc_id")
        .limit(50)
        .select("doc_id")
    )
    sample = d.join(bcast_small(ids), "doc_id")
    sh = shingle_rows(sample, "doc_id", "text", 3, distinct=True)
    ds = sh.groupBy("_id").agg(
        F.sort_array(F.collect_set("_sh")).alias("s"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    a = ds.select(F.col("_id").alias("ia"), F.col("s").alias("sa"), F.col("n").alias("na"))
    b = ds.select(F.col("_id").alias("ib"), F.col("s").alias("sb"), F.col("n").alias("nb"))
    cm = F.size(F.array_intersect("sa", "sb"))
    un = F.col("na") + F.col("nb") - cm
    jac = F.when(un == 0, F.lit(1.0)).otherwise(cm / un.cast("double"))
    pr = (
        a.crossJoin(bcast_small(b))
        .filter(F.col("ia") < F.col("ib"))
        .select(jac.alias("j"))
    )
    nd = ds.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    return nd.crossJoin(
        pr.agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.round(F.avg("j"), 6).alias("mean_jaccard"),
            F.round(F.max("j"), 6).alias("max_jaccard"),
        )
    )


@query(
    "q184_length_power_law",
    """
    WITH b AS (
      SELECT CAST(length(bin(n_chars)) - 1 AS BIGINT) AS bucket
      FROM documents WHERE n_chars > 0),
    h AS (SELECT bucket, CAST(count(*) AS BIGINT) AS c FROM b GROUP BY bucket),
    xy AS (SELECT CAST(bucket AS DOUBLE) AS x, ln(CAST(c AS DOUBLE)) AS y FROM h),
    s AS (SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
                 sum(x * x) AS sxx, sum(x * y) AS sxy, sum(y * y) AS syy
          FROM xy)
    SELECT CAST(n AS BIGINT) AS n_buckets,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
           round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6)
             AS intercept,
           round(CASE WHEN (n * sxx - sx * sx) * (n * syy - sy * sy) = 0 THEN 1.0
                 ELSE (n * sxy - sx * sy) * (n * sxy - sx * sy)
                      / ((n * sxx - sx * sx) * (n * syy - sy * sy)) END, 6) AS r2
    FROM s
    """,
)
def q184_length_power_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-length power-law telemetry: log2-bucketed length
    histogram (bucket = ⌊log2 n⌋ via the binary-string length — EXACT on
    both engines, no libm boundary risk at powers of two) and the OLS
    slope/intercept/R² of ln(count) vs bucket — the heavy-tail exponent
    a corpus dashboard tracks (truncation/boilerplate shifts it). One
    partial-agg histogram pass; the regression runs on the ~30-row
    bucket frame via sufficient statistics (Σx, Σy, Σxx, Σxy, Σyy)."""
    d = load(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    bucket = (F.length(F.bin("n_chars")) - 1).cast("long")
    h = d.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    xy = h.select(
        F.col("bucket").cast("double").alias("x"),
        F.log(F.col("c").cast("double")).alias("y"),
    )
    s = xy.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, sxy, syy = F.col("sxx"), F.col("sxy"), F.col("syy")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return s.select(
        n.cast("long").alias("n_buckets"),
        F.round(slope, 6).alias("slope"),
        F.round((sy - slope * sx) / n, 6).alias("intercept"),
        F.round(
            F.when((n * sxx - sx * sx) * (n * syy - sy * sy) == 0, F.lit(1.0)).otherwise(
                (n * sxy - sx * sy)
                * (n * sxy - sx * sy)
                / ((n * sxx - sx * sx) * (n * syy - sy * sy))
            ),
            6,
        ).alias("r2"),
    )


@query(
    "q185_bigram_next_token",
    f"""
    WITH wrds AS (SELECT doc_id, {DK_WORDS} AS w FROM documents),
    bg AS (
      SELECT w[i] AS ctx, w[i + 1] AS nxt
      FROM wrds, UNNEST(generate_series(1, greatest(len(w) - 1, 0))) AS t(i)
      WHERE w[i] <> '' AND w[i + 1] <> ''
    ),
    cc AS (SELECT ctx, nxt, CAST(count(*) AS BIGINT) AS c FROM bg GROUP BY 1, 2),
    ct AS (SELECT ctx, CAST(sum(c) AS BIGINT) AS total FROM cc GROUP BY ctx),
    top AS (SELECT ctx, total FROM ct
            ORDER BY total DESC, ctx LIMIT 20),
    rk AS (
      SELECT cc.ctx, cc.nxt, cc.c, top.total,
             row_number() OVER (PARTITION BY cc.ctx
                                ORDER BY cc.c DESC, cc.nxt) AS r
      FROM cc JOIN top ON top.ctx = cc.ctx)
    SELECT ctx, nxt, c, CAST(r AS BIGINT) AS rank,
           round(c / CAST(total AS DOUBLE), 6) AS prob
    FROM rk WHERE r <= 3
    """,
)
def q185_bigram_next_token(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional next-token model over the corpus (the bigram-LM lookup
    table, q141's directional cousin): for the 20 highest-mass context
    words, the top-3 continuations with P(next|ctx). Bigrams come from
    the partition-local shingle walk (zero shuffle to generate); the
    context total frame is vocabulary-sized with map-side partials; the
    top-20 context filter is a TakeOrdered broadcast; the per-context
    top-3 is a PARTITIONED rank window (WindowGroupLimit prunes it —
    verified distinct from the global-window antipattern)."""
    from etl_jetro_spark.operators.dedup import shingle_rows
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    sh = shingle_rows(d, "doc_id", "text", 2, distinct=False)
    parts = F.split("_sh", " ")
    bg = sh.select(parts[0].alias("ctx"), parts[1].alias("nxt"))
    cc = bg.groupBy("ctx", "nxt").agg(F.count(F.lit(1)).cast("long").alias("c"))
    ct = cc.groupBy("ctx").agg(F.sum("c").cast("long").alias("total"))
    top = ct.orderBy(F.desc("total"), F.asc("ctx")).limit(20)
    w = Window.partitionBy("ctx").orderBy(F.desc("c"), F.asc("nxt"))
    rk = (
        cc.join(bcast_small(top), "ctx")
        .withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= 3)
    )
    return rk.select(
        "ctx",
        "nxt",
        "c",
        F.col("r").cast("long").alias("rank"),
        F.round(F.col("c") / F.col("total").cast("double"), 6).alias("prob"),
    )


@query(
    "q186_tokenizer_fertility",
    f"""
    WITH t AS (SELECT lang, n_chars,
                      len(list_filter({DK_WORDS}, x -> x <> '')) AS nt
               FROM documents)
    SELECT lang,
           CAST(count(*) AS BIGINT)        AS n_docs,
           CAST(sum(n_chars) AS BIGINT)    AS total_chars,
           CAST(sum(nt) AS BIGINT)         AS total_tokens,
           round(sum(n_chars) / CAST(greatest(sum(nt), 1) AS DOUBLE), 4)
                                           AS chars_per_token
    FROM t GROUP BY lang
    """,
)
def q186_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-cost telemetry per language: bytes-per-token fertility
    proxy (the budget number that decides how much corpus fits a token
    budget, and the classic symptom dashboard for languages a tokenizer
    segments poorly). Token counts are partition-local array
    expressions; one language-sized partial-agg shuffle."""
    from etl_jetro_spark.functions.hashing import norm_text

    d = load(spark, sf_dir, "documents")
    nt = F.size(F.filter(F.split(norm_text("text"), " "), lambda x: x != ""))
    t = d.select("lang", "n_chars", nt.alias("nt"))
    return t.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.sum("nt").cast("long").alias("total_tokens"),
        F.round(
            F.sum("n_chars")
            / F.greatest(F.sum("nt"), F.lit(1)).cast("double"),
            4,
        ).alias("chars_per_token"),
    )


@query(
    "q187_join_skew_audit",
    """
    WITH k AS (SELECT l_orderkey AS k, CAST(count(*) AS BIGINT) AS cnt
               FROM lineitem GROUP BY 1),
    s AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_rows,
                 CAST(count(*) AS BIGINT) AS n_keys,
                 CAST(max(cnt) AS BIGINT) AS max_per_key
          FROM k),
    t AS (SELECT k AS top_key FROM k ORDER BY cnt DESC, k LIMIT 1)
    SELECT n_rows, n_keys,
           round(n_rows / CAST(n_keys AS DOUBLE), 4)      AS avg_per_key,
           max_per_key,
           round(max_per_key / (n_rows / CAST(n_keys AS DOUBLE)), 4)
                                                          AS skew_ratio,
           top_key
    FROM s CROSS JOIN t
    """,
)
def q187_join_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew audit for lineitem.l_orderkey — the pre-flight check
    before a big shuffle join (a skew_ratio in the hundreds says salt or
    AQE-skew-split this key). One partial-agg count per key, then a
    one-row stats aggregate and a TakeOrdered top-1 hot key — nothing
    beyond the key-cardinality frame ever exists."""
    li = load(spark, sf_dir, "lineitem")
    k = li.groupBy(F.col("l_orderkey").alias("k")).agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    s = k.agg(
        F.sum("cnt").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.max("cnt").cast("long").alias("max_per_key"),
    )
    t = k.orderBy(F.desc("cnt"), F.asc("k")).limit(1).select(
        F.col("k").alias("top_key")
    )
    avg = F.col("n_rows") / F.col("n_keys").cast("double")
    return s.crossJoin(t).select(
        "n_rows",
        "n_keys",
        F.round(avg, 4).alias("avg_per_key"),
        "max_per_key",
        F.round(F.col("max_per_key") / avg, 4).alias("skew_ratio"),
        "top_key",
    )


@query(
    "q188_approx_quantile_audit",
    """
    SELECT event_type,
           CAST(count(*) AS BIGINT)  AS n,
           CAST(1 AS BOOLEAN)        AS p50_within_bound,
           CAST(1 AS BOOLEAN)        AS p90_within_bound
    FROM events WHERE value IS NOT NULL
    GROUP BY event_type
    """,
)
def q188_approx_quantile_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-accuracy audit for approx_percentile (the q94/q111 one-sided
    -bound pattern, applied to Greenwald-Khanna quantiles): per event
    type, Spark computes the approximate p50/p90 at accuracy 1000, then
    VERIFIES the GK contract — the approximate value's true rank must be
    within 2·n/1000 of the target rank (2ε: Spark's partial-aggregate
    QuantileSummaries MERGE can exceed the single-pass ε=1/accuracy
    bound — measured 1.018ε on this very fixture) — by counting values
    strictly below / at-or-below the approximation (one conditional-agg
    pass against the broadcast approx frame). The booleans are TRUE iff
    the bound holds; the oracle pins them TRUE, so a sketch regression
    fails the gate. Values themselves are never compared (sketches are
    not hash-portable)."""
    e = load_events(spark, sf_dir).filter(F.col("value").isNotNull())
    acc = 1000
    ap = e.groupBy("event_type").agg(
        F.percentile_approx("value", [0.5, 0.9], acc).alias("aq"),
        F.count(F.lit(1)).cast("long").alias("n"),
    ).select(
        "event_type", "n",
        F.col("aq")[0].alias("a50"), F.col("aq")[1].alias("a90"),
    )
    j = e.join(bcast_small(ap), "event_type")
    chk = j.groupBy("event_type").agg(
        F.any_value("n").alias("n"),
        F.sum((F.col("value") < F.col("a50")).cast("long")).alias("lt50"),
        F.sum((F.col("value") <= F.col("a50")).cast("long")).alias("le50"),
        F.sum((F.col("value") < F.col("a90")).cast("long")).alias("lt90"),
        F.sum((F.col("value") <= F.col("a90")).cast("long")).alias("le90"),
    )
    err = 2.0 * F.col("n").cast("double") / acc

    def ok(p, lt, le):
        # GK: some value with rank in [target-err, target+err] equals the
        # approximation; its rank interval is [lt+1, le]
        target = F.lit(p) * F.col("n")
        return (F.col(le) >= target - err) & (F.col(lt) + 1 <= target + err)

    return chk.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        ok(0.5, "lt50", "le50").alias("p50_within_bound"),
        ok(0.9, "lt90", "le90").alias("p90_within_bound"),
    )


@query(
    "q189_orderkey_islands",
    """
    WITH k AS (SELECT DISTINCT o_orderkey AS k FROM orders),
    r AS (SELECT k, k - row_number() OVER (ORDER BY k) AS grp FROM k),
    isl AS (SELECT grp, CAST(count(*) AS BIGINT) AS len FROM r GROUP BY grp)
    SELECT CAST(count(*) AS BIGINT)      AS n_islands,
           CAST(sum(len) AS BIGINT)      AS total_keys,
           CAST(max(len) AS BIGINT)      AS max_island,
           round(avg(len), 4)            AS avg_island
    FROM isl
    """,
)
def q189_orderkey_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands census over the orderkey space (TPC-H keys are
    deliberately sparse) — the contiguity audit behind range-partition
    planning and id-compaction decisions. The classic k − row_number()
    grouping runs on the DISTRIBUTED rank frame (group_ranked, no
    single-task sort); islands aggregate by the constant difference."""
    from etl_jetro_spark.operators.aggregate import group_ranked

    o = load(spark, sf_dir, "orders").select("o_orderkey").distinct()
    r = group_ranked(o, [], F.col("o_orderkey").cast("double"))
    isl = r.select(
        (F.col("_v").cast("long") - F.col("_rn")).alias("grp")
    ).groupBy("grp").agg(F.count(F.lit(1)).cast("long").alias("len"))
    return isl.agg(
        F.count(F.lit(1)).cast("long").alias("n_islands"),
        F.sum("len").cast("long").alias("total_keys"),
        F.max("len").cast("long").alias("max_island"),
        F.round(F.avg("len"), 4).alias("avg_island"),
    )


@query(
    "q190_visit_bitmask",
    """
    WITH d AS (SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day
               FROM events GROUP BY 1, 2),
    m AS (SELECT min(day) AS d0 FROM d),
    rel AS (SELECT user_id, day - d0 AS rd FROM d CROSS JOIN m
            WHERE day - d0 <= 62),
    msk AS (SELECT user_id,
                   CAST(sum(CAST(1 AS BIGINT) << CAST(rd AS INT)) AS BIGINT)
                     AS mask
            FROM rel GROUP BY user_id)
    SELECT CAST(bit_count(mask) AS BIGINT) AS active_days,
           CAST(count(*) AS BIGINT)        AS n_users
    FROM msk GROUP BY 1
    """,
)
def q190_visit_bitmask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engagement bitmaps: each user's first-63-day visit pattern packed
    into ONE bigint (bit d = active on day d — the roaring-bitmap-style
    encoding analytics stores use for audience math), histogrammed by
    popcount. Distinct (user, day) is the only data-sized shuffle; the
    dataset start day is a one-row broadcast; masks are 8 bytes/user —
    set algebra on them (AND/OR for cohort intersections) is then pure
    CPU. Bit arithmetic is exact on both engines (sum of distinct powers
    of two below 2^63)."""
    e = load_events(spark, sf_dir)
    d = e.select(
        "user_id", F.expr("(ts div 1000000000) div 86400").alias("day")
    ).distinct()
    m = d.agg(F.min("day").alias("d0"))
    rel = (
        d.crossJoin(bcast_small(m))
        .select("user_id", (F.col("day") - F.col("d0")).alias("rd"))
        .filter(F.col("rd") <= 62)
    )
    msk = rel.groupBy("user_id").agg(
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), CAST(rd AS INT))"))
        .cast("long")
        .alias("mask")
    )
    return msk.groupBy(
        F.bit_count("mask").cast("long").alias("active_days")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_users"))


def _hexv_sql(salt: str, col: str, ndigits: int = 15) -> str:
    """DuckDB mirror of conv(substring(md5(salt||col), 1, ndigits), 16, 10)
    as exact BIGINT arithmetic (powers up to 16^(ndigits-1) stay under
    2^63 for ndigits <= 15)."""
    hx = f"md5('{salt}' || CAST({col} AS VARCHAR))"
    terms = " + ".join(
        f"(strpos('0123456789abcdef', substr({hx}, {i + 1}, 1)) - 1)"
        f" * CAST({16 ** (ndigits - 1 - i)} AS BIGINT)"
        for i in range(ndigits)
    )
    return f"({terms})"


@query(
    "q191_weighted_reservoir",
    f"""
    WITH h AS (
      SELECT doc_id, lang, n_chars,
             ({_hexv_sql("res:", "doc_id")} + 1)
               / CAST({1 << 60} AS DOUBLE) AS u
      FROM documents),
    k AS (SELECT doc_id, lang, n_chars,
                 ln(u) / n_chars AS key
          FROM h WHERE n_chars > 0),
    r AS (SELECT doc_id, lang, n_chars, key,
                 row_number() OVER (ORDER BY key DESC, doc_id) AS rk
          FROM k)
    SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars,
           round(key, 9) AS sel_key
    FROM r WHERE rk <= 25
    """,
)
def q191_weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis–Spirakis A-ES):
    each doc draws a deterministic uniform u from md5 and ranks by
    ln(u)/weight — the top-k ARE a weighted sample without replacement,
    and the same k items are chosen on any engine/partitioning/cluster.
    The distributed-sampling primitive behind "pick 25 docs ∝ length".
    Spark side is a TakeOrderedAndProject top-25 (no global window); the
    only libm call is one ln per row, and selection flips only if two
    keys collide within an ulp (disjoint md5 draws — never observed)."""
    d = load(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("res:"), F.col("doc_id").cast("string"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        + 1
    ) / F.lit(float(1 << 60))
    key = F.log(u) / F.col("n_chars")
    return (
        d.select("doc_id", "lang", F.col("n_chars").cast("long"), key.alias("key"))
        .orderBy(F.desc("key"), F.asc("doc_id"))
        .limit(25)
        .select("doc_id", "lang", "n_chars", F.round("key", 9).alias("sel_key"))
    )


@query(
    "q192_categorical_mi",
    """
    WITH jt AS (SELECT lang, source, CAST(count(*) AS DOUBLE) AS nij
                FROM documents GROUP BY 1, 2),
    tot AS (SELECT sum(nij) AS n FROM jt),
    ml AS (SELECT lang, sum(nij) AS ni FROM jt GROUP BY lang),
    ms AS (SELECT source, sum(nij) AS nj FROM jt GROUP BY source),
    terms AS (
      SELECT jt.nij, ml.ni, ms.nj, tot.n
      FROM jt JOIN ml USING (lang) JOIN ms USING (source) CROSS JOIN tot)
    SELECT CAST(any_value(n) AS BIGINT)                             AS n_docs,
           round(sum((nij / n) * ln(nij * n / (ni * nj))), 6)       AS mi,
           round((SELECT -sum((ni / t.n) * ln(ni / t.n))
                  FROM ml CROSS JOIN tot t), 6)                     AS h_lang,
           round((SELECT -sum((nj / t.n) * ln(nj / t.n))
                  FROM ms CROSS JOIN tot t), 6)                     AS h_source,
           round(sum((nij / n) * ln(nij * n / (ni * nj)))
                 / sqrt((SELECT -sum((ni / t.n) * ln(ni / t.n))
                         FROM ml CROSS JOIN tot t)
                        * (SELECT -sum((nj / t.n) * ln(nj / t.n))
                           FROM ms CROSS JOIN tot t)), 6)           AS nmi
    FROM terms
    """,
)
def q192_categorical_mi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between two categorical columns (lang ×
    source) with marginal entropies and normalized MI — the dependence
    audit a data profiler runs before treating columns as independent
    strata. One |lang×source|-sized contingency aggregate; marginals and
    totals are re-aggregates of that tiny frame; everything after is
    metadata-sized."""
    d = load(spark, sf_dir, "documents")
    jt = d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("double").alias("nij")
    )
    tot = jt.agg(F.sum("nij").alias("n"))
    ml = jt.groupBy("lang").agg(F.sum("nij").alias("ni"))
    ms = jt.groupBy("source").agg(F.sum("nij").alias("nj"))
    terms = (
        jt.join(bcast_small(ml), "lang")
        .join(bcast_small(ms), "source")
        .crossJoin(bcast_small(tot))
    )
    mi = F.sum(
        (F.col("nij") / F.col("n"))
        * F.log(F.col("nij") * F.col("n") / (F.col("ni") * F.col("nj")))
    )
    hl = ml.crossJoin(bcast_small(tot)).agg(
        (-F.sum((F.col("ni") / F.col("n")) * F.log(F.col("ni") / F.col("n"))))
        .alias("h_lang")
    )
    hs = ms.crossJoin(bcast_small(tot)).agg(
        (-F.sum((F.col("nj") / F.col("n")) * F.log(F.col("nj") / F.col("n"))))
        .alias("h_source")
    )
    agg = terms.agg(
        F.any_value("n").cast("long").alias("n_docs"), mi.alias("_mi")
    )
    return (
        agg.crossJoin(bcast_small(hl))
        .crossJoin(bcast_small(hs))
        .select(
            "n_docs",
            F.round("_mi", 6).alias("mi"),
            F.round("h_lang", 6).alias("h_lang"),
            F.round("h_source", 6).alias("h_source"),
            F.round(
                F.col("_mi") / F.sqrt(F.col("h_lang") * F.col("h_source")), 6
            ).alias("nmi"),
        )
    )


@query(
    "q193_benford_audit",
    """
    WITH fd AS (
      SELECT CAST(floor(o_totalprice
                        / power(10, floor(log10(o_totalprice)))) AS BIGINT)
               AS digit
      FROM orders WHERE o_totalprice > 0),
    obs AS (SELECT digit, CAST(count(*) AS BIGINT) AS n_obs FROM fd GROUP BY 1),
    tot AS (SELECT CAST(sum(n_obs) AS DOUBLE) AS n FROM obs)
    SELECT digit, n_obs,
           round(n_obs / n, 6)                          AS obs_share,
           round(ln(1 + 1.0 / digit) / ln(10), 6)       AS benford_share,
           round((n_obs - n * (ln(1 + 1.0 / digit) / ln(10)))
                 * (n_obs - n * (ln(1 + 1.0 / digit) / ln(10)))
                 / (n * (ln(1 + 1.0 / digit) / ln(10))), 6) AS chi2_term
    FROM obs CROSS JOIN tot
    """,
)
def q193_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of order totals — the fraud /
    synthetic-data smell test: observed first-digit shares vs the
    log-law expectation with per-digit χ² contributions. The digit
    extraction is arithmetic (floor(x/10^⌊log10 x⌋) — no locale-
    dependent string formatting), one 9-row aggregate, everything else
    metadata-sized."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    digit = F.floor(
        F.col("o_totalprice")
        / F.pow(F.lit(10.0), F.floor(F.log10("o_totalprice")))
    ).cast("long")
    obs = o.groupBy(digit.alias("digit")).agg(
        F.count(F.lit(1)).cast("long").alias("n_obs")
    )
    tot = obs.agg(F.sum("n_obs").cast("double").alias("n"))
    p = F.log(1 + 1.0 / F.col("digit")) / F.log(F.lit(10.0))
    dev = F.col("n_obs") - F.col("n") * p
    return obs.crossJoin(bcast_small(tot)).select(
        "digit",
        "n_obs",
        F.round(F.col("n_obs") / F.col("n"), 6).alias("obs_share"),
        F.round(p, 6).alias("benford_share"),
        F.round(dev * dev / (F.col("n") * p), 6).alias("chi2_term"),
    )


@query(
    "q194_frequent_triples",
    """
    WITH bsk AS (SELECT l_orderkey, l_partkey FROM lineitem
                 GROUP BY l_orderkey, l_partkey),
    tri AS (
      -- pure equi-joins + WHERE: a mixed (equi AND inequality) ON
      -- clause referencing the middle table sent DuckDB into a
      -- nested-loop plan (457 s at sf0.01; this form runs in ~6 s)
      SELECT a.l_partkey AS p1, b.l_partkey AS p2, c.l_partkey AS p3
      FROM bsk a
      JOIN bsk b ON a.l_orderkey = b.l_orderkey
      JOIN bsk c ON b.l_orderkey = c.l_orderkey
      WHERE a.l_partkey < b.l_partkey AND b.l_partkey < c.l_partkey
    ),
    cnt AS (SELECT p1, p2, p3, CAST(count(*) AS BIGINT) AS support
            FROM tri GROUP BY 1, 2, 3 HAVING count(*) >= 2)
    SELECT p1, p2, p3, support
    FROM cnt ORDER BY support DESC, p1, p2, p3 LIMIT 10
    """,
)
def q194_frequent_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent 3-itemsets over order baskets (the Apriori step past
    q151's pairs): per-basket ordered triples via a double self-join on
    the distinct basket frame — C(basket,3) rows per basket, bounded by
    TPC-H's ~7-line orders (cap baskets or pre-prune by frequent pairs
    when baskets are unbounded); map-side-combined support counts and a
    TakeOrdered top-10."""
    li = load(spark, sf_dir, "lineitem")
    # C(basket, 3) ordered triples basket-locally (r11): posexplode picks
    # p1, a positional tail-slice + posexplode picks p2 past it, a second
    # tail-slice explodes p3 past BOTH — the sorted set makes position
    # order = value order, so p1 < p2 < p3 with no join and no filter.
    g = _baskets(li)
    tri = (
        g.select(F.posexplode("_ps").alias("_i", "p1"), "_ps")
        .select(
            "p1",
            "_i",
            "_ps",
            F.posexplode(
                F.slice("_ps", F.col("_i") + F.lit(2), F.size("_ps"))
            ).alias("_j", "p2"),
        )
        .select(
            "p1",
            "p2",
            F.explode(
                F.slice(
                    "_ps",
                    F.col("_i") + F.col("_j") + F.lit(3),
                    F.size("_ps"),
                )
            ).alias("p3"),
        )
    )
    cnt = (
        tri.groupBy("p1", "p2", "p3")
        .agg(F.count(F.lit(1)).cast("long").alias("support"))
        .filter(F.col("support") >= 2)
    )
    return cnt.orderBy(
        F.desc("support"), F.asc("p1"), F.asc("p2"), F.asc("p3")
    ).limit(10)


@query(
    "q195_rfm_segments",
    f"""
    WITH rfm AS (
      SELECT o_custkey,
             max(o_orderdate)                         AS r_raw,
             CAST(count(*) AS BIGINT)                 AS f_raw,
             {sql_exact_money_sum('o_totalprice')}    AS m_raw
      FROM orders GROUP BY 1),
    t AS (
      SELECT o_custkey, m_raw,
             ntile(5) OVER (ORDER BY r_raw, o_custkey)  AS r,
             ntile(5) OVER (ORDER BY f_raw, o_custkey)  AS f,
             ntile(5) OVER (ORDER BY m_raw, o_custkey)  AS m
      FROM rfm)
    SELECT CAST(r * 100 + f * 10 + m AS BIGINT)  AS segment,
           CAST(count(*) AS BIGINT)              AS n_customers,
           round(CAST(sum(CAST(round(m_raw * 100) AS BIGINT)) AS DOUBLE)
                 / (100.0 * count(*)), 4)        AS avg_monetary
    FROM t GROUP BY 1
    """,
)
def q195_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: recency/frequency/monetary quintiles
    (1 = worst, 5 = best) composed into the classic 111–555 segment
    code, with size and average monetary value per segment. Each
    quintile is the exact ntile(5) derived from the DISTRIBUTED rank
    frame (three group_ranked passes over the customer-sized RFM frame,
    joined back by key — no SinglePartition window; ties broken by
    custkey so both engines bucket identically)."""
    from etl_jetro_spark.operators.aggregate import group_ranked

    o = load(spark, sf_dir, "orders")
    rfm = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("r_raw"),
        F.count(F.lit(1)).cast("long").alias("f_raw"),
        M.exact_money_sum("o_totalprice").alias("m_raw"),
    )

    def quint(col, out):
        r = group_ranked(
            rfm.select("o_custkey", col),
            [],
            F.col(col).cast("double")
            if col != "r_raw"
            else F.col(col).cast("timestamp").cast("double"),
            tiebreak=["o_custkey"],
        )
        return r.select(
            "o_custkey", _ntile_from_rank(F.col("_rn"), F.col("_n"), 5).alias(out)
        )

    t = (
        rfm.join(quint("r_raw", "r"), "o_custkey")
        .join(quint("f_raw", "f"), "o_custkey")
        .join(quint("m_raw", "m"), "o_custkey")
    )
    # avg in EXACT integer cents: a float avg of ~1.5M-magnitude values
    # across a segment sits close enough to the 4-dp rounding boundary
    # for partial-agg sum order to flip the last digit (caught by the
    # sf0.1 full gate: 1577931.3013 vs .3012). m_raw is 2-dp-quantized,
    # so round(m_raw*100) is exact; BIGINT sums are order-free.
    return t.groupBy(
        (F.col("r") * 100 + F.col("f") * 10 + F.col("m")).alias("segment")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.round(
            F.sum(F.round(F.col("m_raw") * 100).cast("long"))
            / (F.lit(100.0) * F.count(F.lit(1))),
            4,
        ).alias("avg_monetary"),
    )


@query(
    "q196_decayed_engagement",
    """
    WITH mx AS (SELECT max(CAST(floor(epoch(ts)) AS BIGINT) // 86400) AS d0
                FROM events),
    e AS (SELECT event_type,
                 value,
                 d0 - (CAST(floor(epoch(ts)) AS BIGINT) // 86400) AS age_d
          FROM events CROSS JOIN mx WHERE value IS NOT NULL)
    SELECT event_type,
           CAST(count(*) AS BIGINT)                            AS n,
           round(sum(value), 4)                                AS raw_sum,
           round(sum(value * power(2.0, -age_d / 7.0)), 4)     AS decayed_sum,
           round(sum(value * power(2.0, -age_d / 7.0))
                 / sum(value), 6)                              AS freshness
    FROM e GROUP BY event_type
    """,
)
def q196_decayed_engagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-decayed aggregation (half-life 7 days, anchored at the
    dataset's max day so the result is reproducible): decayed engagement
    per event type plus a freshness ratio — the recency weighting every
    ranking/trending feature store computes. Age is integer day
    arithmetic; the anchor is a one-row broadcast; the decay is a single
    pow per row inside codegen — one partial-agg pass."""
    e = load_events(spark, sf_dir).filter(F.col("value").isNotNull())
    day = F.expr("(ts div 1000000000) div 86400")
    mx = e.agg(F.max(day).alias("d0"))
    j = e.crossJoin(bcast_small(mx)).select(
        "event_type",
        "value",
        (F.col("d0") - day).alias("age_d"),
    )
    w = F.pow(F.lit(2.0), -F.col("age_d") / F.lit(7.0))
    return j.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(F.sum("value"), 4).alias("raw_sum"),
        F.round(F.sum(F.col("value") * w), 4).alias("decayed_sum"),
        F.round(F.sum(F.col("value") * w) / F.sum("value"), 6).alias(
            "freshness"
        ),
    )


@query(
    "q197_dau_mau_stickiness",
    """
    WITH d AS (SELECT DISTINCT user_id,
                      CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day
               FROM events),
    w AS (SELECT user_id, day, day // 7 AS week FROM d),
    dau AS (SELECT week, day, CAST(count(*) AS BIGINT) AS n_day
            FROM w GROUP BY 1, 2),
    avg_dau AS (SELECT week, avg(n_day) AS a FROM dau GROUP BY week),
    mau AS (SELECT week, CAST(count(DISTINCT user_id) AS BIGINT) AS n_week
            FROM w GROUP BY week)
    SELECT mau.week AS week,
           round(avg_dau.a, 4)          AS avg_dau,
           mau.n_week                   AS wau,
           round(avg_dau.a / mau.n_week, 6) AS stickiness
    FROM mau JOIN avg_dau ON avg_dau.week = mau.week
    """,
)
def q197_dau_mau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/WAU stickiness per week — the engagement-intensity ratio
    (avg daily actives over weekly actives) every growth dashboard
    tracks. Distinct (user, day) is the only data-sized shuffle; daily
    and weekly rollups are re-aggregates of that frame; integer epoch
    arithmetic end to end."""
    e = load_events(spark, sf_dir)
    d = e.select(
        "user_id", F.expr("(ts div 1000000000) div 86400").alias("day")
    ).distinct()
    w = d.withColumn("week", F.expr("day div 7"))
    dau = w.groupBy("week", "day").agg(
        F.count(F.lit(1)).cast("long").alias("n_day")
    )
    avg_dau = dau.groupBy("week").agg(F.avg("n_day").alias("a"))
    mau = w.groupBy("week").agg(
        F.countDistinct("user_id").cast("long").alias("wau")
    )
    return mau.join(avg_dau, "week").select(
        "week",
        F.round("a", 4).alias("avg_dau"),
        "wau",
        F.round(F.col("a") / F.col("wau"), 6).alias("stickiness"),
    )


@query(
    "q198_churn_gap_outliers",
    """
    WITH o AS (
      SELECT o_custkey,
             CAST(floor(epoch(o_orderdate)) AS BIGINT) // 86400 AS day
      FROM orders),
    g AS (
      SELECT o_custkey,
             day - lag(day) OVER (PARTITION BY o_custkey ORDER BY day) AS gap
      FROM (SELECT DISTINCT o_custkey, day FROM o)),
    gg AS (SELECT o_custkey, gap FROM g WHERE gap IS NOT NULL),
    st AS (SELECT o_custkey,
                  CAST(count(*) AS BIGINT) AS n_gaps,
                  max(gap) AS max_gap,
                  avg(gap) AS avg_gap
           FROM gg GROUP BY 1 HAVING count(*) >= 5)
    SELECT CAST(count(*) AS BIGINT)                            AS n_customers,
           CAST(sum(CASE WHEN max_gap > 2 * avg_gap
                         THEN 1 ELSE 0 END) AS BIGINT)          AS n_irregular,
           round(avg(max_gap / avg_gap), 6)                     AS avg_burstiness
    FROM st
    """,
)
def q198_churn_gap_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchase-cadence irregularity census (the churn-risk screen): per
    customer with ≥5 inter-order gaps, flag those whose longest silence
    exceeds 2× their own average — plus the mean burstiness ratio. One
    (key, time) sort for the lag, then customer-sized aggregates; no
    cross-customer state."""
    from pyspark.sql import Window

    o = load(spark, sf_dir, "orders").select(
        "o_custkey",
        F.expr(
            "(CAST(floor(unix_timestamp(o_orderdate)) AS BIGINT)) div 86400"
        ).alias("day"),
    ).distinct()
    w = Window.partitionBy("o_custkey").orderBy("day")
    g = o.select(
        "o_custkey", (F.col("day") - F.lag("day").over(w)).alias("gap")
    ).filter(F.col("gap").isNotNull())
    st = g.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        F.max("gap").alias("max_gap"),
        F.avg("gap").alias("avg_gap"),
    ).filter(F.col("n_gaps") >= 5)
    return st.agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum((F.col("max_gap") > 2 * F.col("avg_gap")).cast("long"))
        .cast("long")
        .alias("n_irregular"),
        F.round(F.avg(F.col("max_gap") / F.col("avg_gap")), 6).alias(
            "avg_burstiness"
        ),
    )


@query(
    "q199_doc_keywords",
    f"""
    WITH wr AS (SELECT doc_id, list_filter({DK_WORDS}, x -> x <> '') AS w
                FROM documents),
    tok AS (SELECT doc_id, w[i] AS t
            FROM wr, UNNEST(generate_series(1, len(w))) AS s(i)),
    tf AS (SELECT doc_id, t, CAST(count(*) AS BIGINT) AS tf
           FROM tok GROUP BY 1, 2),
    df AS (SELECT t, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
           FROM tf GROUP BY t),
    nd AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
    sc AS (
      SELECT tf.doc_id, tf.t,
             round(tf.tf * ln((nd.n + 1) / (df.df + 1)), 6) AS tfidf
      FROM tf JOIN df USING (t) CROSS JOIN nd),
    r AS (SELECT doc_id, t, tfidf,
                 row_number() OVER (PARTITION BY doc_id
                                    ORDER BY tfidf DESC, t) AS rk
          FROM sc)
    SELECT doc_id, t AS keyword, tfidf, CAST(rk AS BIGINT) AS rank
    FROM r WHERE rk <= 3 AND doc_id % 20 = 0
    """,
)
def q199_doc_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document keyword extraction: top-3 terms by smoothed TF-IDF
    (tf · ln((N+1)/(df+1)) — the q68 weighting applied as an extractor),
    reported for the doc_id % 20 == 0 slice to keep the result
    result-set-sized. Term/doc frequencies are the standard two count
    shuffles; the per-doc top-3 is a PARTITIONED rank window
    (WindowGroupLimit-pruned)."""
    from pyspark.sql import Window

    from etl_jetro_spark.functions.hashing import norm_text

    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split(norm_text("text"), " ")).alias("t")
    ).filter(F.col("t") != "")
    tf = toks.groupBy("doc_id", "t").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    dfreq = tf.groupBy("t").agg(
        F.countDistinct("doc_id").cast("long").alias("df")
    )
    nd = d.agg(F.count(F.lit(1)).cast("double").alias("n"))
    sc = (
        tf.join(dfreq, "t")
        .crossJoin(bcast_small(nd))
        .select(
            "doc_id",
            "t",
            F.round(
                F.col("tf") * F.log((F.col("n") + 1) / (F.col("df") + 1)), 6
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("t"))
    r = sc.withColumn("rk", F.row_number().over(w)).filter(
        (F.col("rk") <= 3) & (F.col("doc_id") % 20 == 0)
    )
    return r.select(
        "doc_id",
        F.col("t").alias("keyword"),
        "tfidf",
        F.col("rk").cast("long").alias("rank"),
    )


@query(
    "q200_multimodal_coverage",
    """
    SELECT
      (SELECT CAST(count(*) AS BIGINT) FROM documents)   AS n_docs,
      (SELECT CAST(count(*) AS BIGINT) FROM embeddings)  AS n_vecs,
      (SELECT CAST(count(*) AS BIGINT) FROM documents d
       JOIN embeddings e ON e.vec_id = d.doc_id)         AS n_matched,
      (SELECT CAST(count(*) AS BIGINT) FROM documents d
       WHERE NOT EXISTS (SELECT 1 FROM embeddings e
                         WHERE e.vec_id = d.doc_id))     AS docs_unembedded,
      (SELECT CAST(count(*) AS BIGINT) FROM embeddings e
       WHERE NOT EXISTS (SELECT 1 FROM documents d
                         WHERE d.doc_id = e.vec_id))     AS vecs_orphaned,
      round((SELECT count(*) FROM documents d
             JOIN embeddings e ON e.vec_id = d.doc_id)
            / (SELECT CAST(count(*) AS DOUBLE) FROM documents), 6)
                                                         AS coverage
    """,
)
def q200_multimodal_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal completeness audit between the text and vector
    tables: matched pairs, docs without an embedding, orphaned vectors,
    and embedding coverage — the consistency gate a multimodal pipeline
    runs before training (a doc↔vector drift here silently starves the
    contrastive loss). Two anti-join counts + one semi-join count, all
    key-only projections."""
    d = load(spark, sf_dir, "documents").select("doc_id")
    e = load(spark, sf_dir, "embeddings").select("vec_id")
    nd = d.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    ne = e.agg(F.count(F.lit(1)).cast("long").alias("n_vecs"))
    nm = d.join(e, d["doc_id"] == e["vec_id"]).agg(
        F.count(F.lit(1)).cast("long").alias("n_matched")
    )
    du = d.join(e, d["doc_id"] == e["vec_id"], "left_anti").agg(
        F.count(F.lit(1)).cast("long").alias("docs_unembedded")
    )
    vo = e.join(d, d["doc_id"] == e["vec_id"], "left_anti").agg(
        F.count(F.lit(1)).cast("long").alias("vecs_orphaned")
    )
    return (
        nd.crossJoin(ne)
        .crossJoin(nm)
        .crossJoin(du)
        .crossJoin(vo)
        .select(
            "*",
            F.round(
                F.col("n_matched") / F.col("n_docs").cast("double"), 6
            ).alias("coverage"),
        )
    )


# --------------------------------------------------------------------------
# 18. Round-5 wave 5: OLAP rollup, funnel, HLL, fuzzy join, interval overlap
# --------------------------------------------------------------------------

@query(
    "q201_revenue_rollup",
    f"""
    SELECT coalesce(r_name, 'ALL') AS region,
           coalesce(n_name, 'ALL') AS nation,
           CAST(2 * GROUPING(r_name) + GROUPING(n_name) AS BIGINT) AS lvl,
           {sql_exact_money_sum('o_totalprice')} AS revenue,
           CAST(count(*) AS BIGINT)    AS n_orders
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    JOIN region r   ON r.r_regionkey = n.n_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def q201_revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical revenue cube: region -> nation -> grand total in ONE
    pass via ``rollup`` (Spark expands grouping sets inside a single
    Expand+partial-agg — no per-level rescans). Dimension tables are
    broadcast (region 5 / nation 25 rows); the only shuffle is the
    post-Expand aggregation keyed on (r_name, n_name, gid). ``lvl`` is
    derived from explicit GROUPING() bits so the bitmask convention
    can't drift between engines."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    j = (
        o.join(bcast_sized(c), o["o_custkey"] == c["c_custkey"])
        .join(bcast_small(n), c["c_nationkey"] == n["n_nationkey"])
        .join(bcast_small(r), n["n_regionkey"] == r["r_regionkey"])
    )
    return (
        j.rollup("r_name", "n_name")
        .agg(
            (2 * F.grouping("r_name") + F.grouping("n_name"))
            .cast("long")
            .alias("lvl"),
            # micro-dollar row quantization before the sum (30x-gate
            # float-fold class; the grand-total row is the whole table)
            M.exact_money_sum("o_totalprice").alias("revenue"),
            F.count(F.lit(1)).cast("long").alias("n_orders"),
        )
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation"),
            "lvl",
            "revenue",
            "n_orders",
        )
    )


@query(
    "q202_funnel_conversion",
    """
    WITH v AS (SELECT user_id, min(ts) AS v_ts FROM events
               WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT e.user_id, min(e.ts) AS c_ts FROM events e
          JOIN v ON v.user_id = e.user_id AND e.ts > v.v_ts
          WHERE e.event_type = 'click' GROUP BY e.user_id),
    p AS (SELECT e.user_id, min(e.ts) AS p_ts FROM events e
          JOIN c ON c.user_id = e.user_id AND e.ts > c.c_ts
          WHERE e.event_type = 'purchase' GROUP BY e.user_id)
    SELECT (SELECT CAST(count(DISTINCT user_id) AS BIGINT) FROM events) AS n_users,
           (SELECT CAST(count(*) AS BIGINT) FROM v) AS n_view,
           (SELECT CAST(count(*) AS BIGINT) FROM c) AS n_view_click,
           (SELECT CAST(count(*) AS BIGINT) FROM p) AS n_full_funnel,
           round((SELECT count(*) FROM c)
                 / (SELECT CAST(count(*) AS DOUBLE) FROM v), 6) AS click_rate,
           round((SELECT count(*) FROM p)
                 / (SELECT CAST(count(*) AS DOUBLE) FROM c), 6) AS purchase_rate
    """,
)
def q202_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered three-stage funnel (view -> click -> purchase): a user
    advances a stage only with a strictly LATER event of the next type —
    the sequential constraint that separates funnels from mere type
    counts. Each stage is a per-user min-aggregate joined to the prior
    stage's frame; stage frames shrink monotonically and are
    user-cardinality-sized — data-scale for an events table, so they
    are plain hash-joined with no forced broadcast (AQE still picks a
    broadcast join when a stage frame measures small at runtime, and
    falls back to shuffle join when it doesn't — round-5 verdict). The
    corpus-scale events table is scanned with a type filter and never
    self-joined row-to-row."""
    e = load_events(spark, sf_dir).select("user_id", "event_type", "ts")
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ts"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("v_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("c_ts"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("c_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    nu = e.agg(F.countDistinct("user_id").cast("long").alias("n_users"))
    nv = v.agg(F.count(F.lit(1)).cast("long").alias("n_view"))
    nc = c.agg(F.count(F.lit(1)).cast("long").alias("n_view_click"))
    np_ = p.agg(F.count(F.lit(1)).cast("long").alias("n_full_funnel"))
    return (
        nu.crossJoin(nv)
        .crossJoin(nc)
        .crossJoin(np_)
        .select(
            "*",
            F.round(
                F.col("n_view_click") / F.col("n_view").cast("double"), 6
            ).alias("click_rate"),
            F.round(
                F.col("n_full_funnel") / F.col("n_view_click").cast("double"),
                6,
            ).alias("purchase_rate"),
        )
    )


# HLL constants shared by q203 and its oracle: p=8 -> m=256 registers,
# 32-bit md5-prefix hash (bottom 8 bits bucket, top 24 bits rho source),
# alpha_256 = 0.7213 / (1 + 1.079/256).
_HLL_ALPHA = 0.7213 / (1 + 1.079 / 256)


@query(
    "q203_hll_distinct",
    f"""
    WITH h AS (
      SELECT event_type,
             {_dk_hex8("md5('hll:' || CAST(user_id AS VARCHAR))")} AS hv
      FROM events
    ),
    bw AS (SELECT event_type, hv % 256 AS bucket, hv // 256 AS w FROM h),
    regs AS (
      SELECT event_type, bucket,
             max(CASE WHEN w = 0 THEN 25 ELSE 25 - length(bin(w)) END) AS m
      FROM bw GROUP BY event_type, bucket
    ),
    s AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT)     AS n_occupied,
             sum(power(2.0, -m))          AS s_occ
      FROM regs GROUP BY event_type
    ),
    est AS (
      SELECT event_type, n_occupied,
             256 - n_occupied AS v,
             CAST({_HLL_ALPHA!r} AS DOUBLE) * 65536.0
               / (s_occ + (256 - n_occupied)) AS e_raw
      FROM s
    ),
    fin AS (
      SELECT event_type, n_occupied,
             CASE WHEN e_raw <= 640.0 AND v > 0
                  THEN 256.0 * ln(256.0 / v) ELSE e_raw END AS e
      FROM est
    ),
    ex AS (SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS exact_ndv
           FROM events GROUP BY event_type)
    SELECT f.event_type, ex.exact_ndv, f.n_occupied,
           round(f.e, 4) AS hll_estimate,
           (abs(f.e - ex.exact_ndv) / ex.exact_ndv) <= 0.15 AS within_bound
    FROM fin f JOIN ex ON ex.event_type = f.event_type
    """,
)
def q203_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-user sketch per event type (p=8, m=256
    registers, Flajolet et al. 2007 with the small-range linear-counting
    correction), checked against the exact NDV with a 15%% accuracy
    gate. The sketch is ONE partial-aggregable shuffle on
    (event_type, bucket) — at 100 TB the max-merge combines map-side, so
    the reduce moves at most groups x 256 rows — versus the full
    key-shuffle an exact countDistinct costs. Hash = first 8 md5 hex
    digits (the repo's engine-portable 32-bit hash); rho via binary
    digit length, no floats until the final estimate."""
    e = load(spark, sf_dir, "events").select("event_type", "user_id")
    hv = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("hll:"), F.col("user_id").cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    bw = e.select(
        "event_type",
        (hv % 256).alias("bucket"),
        (hv / F.lit(256)).cast("long").alias("w"),
    )
    regs = bw.groupBy("event_type", "bucket").agg(
        F.max(
            F.when(F.col("w") == 0, F.lit(25)).otherwise(
                25 - F.length(F.bin(F.col("w")))
            )
        ).alias("m")
    )
    s = regs.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_occupied"),
        F.sum(F.pow(F.lit(2.0), -F.col("m"))).alias("s_occ"),
    )
    est = s.select(
        "event_type",
        "n_occupied",
        (256 - F.col("n_occupied")).alias("v"),
        (
            F.lit(_HLL_ALPHA)
            * 65536.0
            / (F.col("s_occ") + (256 - F.col("n_occupied")))
        ).alias("e_raw"),
    )
    fin = est.select(
        "event_type",
        "n_occupied",
        F.when(
            (F.col("e_raw") <= 640.0) & (F.col("v") > 0),
            256.0 * F.log(256.0 / F.col("v")),
        )
        .otherwise(F.col("e_raw"))
        .alias("e"),
    )
    ex = e.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("exact_ndv")
    )
    return fin.join(ex, "event_type").select(
        "event_type",
        "exact_ndv",
        "n_occupied",
        F.round(F.col("e"), 4).alias("hll_estimate"),
        (
            F.abs(F.col("e") - F.col("exact_ndv")) / F.col("exact_ndv")
            <= 0.15
        ).alias("within_bound"),
    )


@query(
    "q204_fuzzy_token_join",
    f"""
    WITH toks AS (
      SELECT DISTINCT t FROM (
        SELECT unnest({DK_WORDS}) AS t FROM documents
        UNION ALL
        SELECT unnest(string_split(lower(p_name), ' ')) FROM part
        UNION ALL
        SELECT unnest(string_split(lower(p_type), ' ')) FROM part
        UNION ALL
        SELECT lower(p_brand) FROM part
      ) WHERE len(t) >= 3
    ),
    vars AS (
      SELECT t, unnest(list_distinct(list_prepend(t,
               list_transform(generate_series(1, len(t)),
                 i -> substr(t, 1, i - 1) || substr(t, i + 1, len(t) - i))
             ))) AS v
      FROM toks
    )
    SELECT DISTINCT a.t AS tok_a, b.t AS tok_b
    FROM vars a JOIN vars b ON a.v = b.v AND a.t < b.t
    WHERE levenshtein(a.t, b.t) = 1
    """,
)
def q204_fuzzy_token_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance-1 fuzzy self-join over the corpus vocabulary via
    SymSpell deletion-neighborhood blocking: each token joins on
    {{token}} ∪ {{all length-1 deletions}}, which provably covers every
    insert/delete/substitute pair, then exact ``levenshtein`` verifies.
    Candidates are O(n·len) instead of the O(n²) all-pairs a naive
    fuzzy join costs — the only join is a hash equi-join on the variant
    string. At 100 TB vocab scale a hot variant (shared prefix family)
    caps via the same ``dedup.capped_index`` route the shingle joins
    use; at this vocabulary it is unnecessary."""
    from etl_jetro_spark.functions.hashing import norm_text

    d = load(spark, sf_dir, "documents")
    p = load(spark, sf_dir, "part")
    toks = (
        d.select(F.explode(F.split(norm_text("text"), " ")).alias("t"))
        .unionAll(
            p.select(F.explode(F.split(F.lower("p_name"), " ")).alias("t"))
        )
        .unionAll(
            p.select(F.explode(F.split(F.lower("p_type"), " ")).alias("t"))
        )
        .unionAll(p.select(F.lower("p_brand").alias("t")))
        .filter(F.length("t") >= 3)
        .distinct()
    )
    variants = toks.select(
        "t",
        F.explode(
            F.expr(
                "array_distinct(concat(array(t),"
                " transform(sequence(1, length(t)),"
                " i -> concat(substring(t, 1, i - 1),"
                " substring(t, i + 1, length(t) - i)))))"
            )
        ).alias("v"),
    )
    a = variants.alias("a")
    b = variants.alias("b")
    return (
        a.join(b, F.col("a.v") == F.col("b.v"))
        .filter(F.col("a.t") < F.col("b.t"))
        .select(F.col("a.t").alias("tok_a"), F.col("b.t").alias("tok_b"))
        .distinct()
        .filter(F.levenshtein("tok_a", "tok_b") == 1)
    )


@query(
    "q205_event_concurrency",
    """
    WITH e AS (SELECT CAST(floor(epoch(ts)) AS BIGINT) AS s FROM events),
    b AS (SELECT unnest(generate_series(s // 600, (s + 3599) // 600)) AS bk
          FROM e),
    c AS (SELECT bk, CAST(count(*) AS BIGINT) AS conc FROM b GROUP BY bk)
    SELECT DATE '1970-01-01' + CAST((bk * 600) // 86400 AS INTEGER) AS day,
           CAST(max(conc) AS BIGINT)    AS peak_concurrency,
           round(avg(conc), 4)          AS avg_concurrency,
           CAST(count(*) AS BIGINT)     AS n_buckets
    FROM c GROUP BY 1
    """,
)
def q205_event_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concurrent-session profile: every event is active for a fixed
    1-hour window; per 10-minute grid bucket, how many events overlap,
    rolled up to daily peak/mean concurrency. Interval overlap against a
    fixed-length window needs NO range theta-join: each event expands to
    its ≤7 covered buckets (bounded fanout — pure integer arithmetic on
    epoch seconds), and overlap counting becomes one equi-shuffle on the
    bucket id. This is the scale-correct plan shape for any
    bounded-length interval join; an unbounded interval would instead
    bucket by interval END with per-bucket start replication."""
    e = load_events(spark, sf_dir).select(
        (F.col("ts") / F.lit(1_000_000_000)).cast("long").alias("s")
    )
    b = e.select(
        F.explode(
            F.sequence(
                F.expr("s div 600"), F.expr("(s + 3599) div 600")
            )
        ).alias("bk")
    )
    c = b.groupBy("bk").agg(F.count(F.lit(1)).cast("long").alias("conc"))
    return (
        c.groupBy(
            F.date_add(
                F.lit("1970-01-01").cast("date"),
                F.expr("cast((bk * 600) div 86400 as int)"),
            ).alias("day")
        )
        .agg(
            F.max("conc").cast("long").alias("peak_concurrency"),
            F.round(F.avg("conc"), 4).alias("avg_concurrency"),
            F.count(F.lit(1)).cast("long").alias("n_buckets"),
        )
    )


@query(
    "q206_trigram_search",
    f"""
    WITH pats(pattern) AS (VALUES ('fast merge'), ('slow scan'),
                                  ('hash join'), ('sort merge'), ('spark sql')),
    ptri AS (
      SELECT pattern, unnest(list_distinct(list_transform(
               generate_series(1, len(pattern) - 2),
               i -> substr(pattern, i, 3)))) AS tri
      FROM pats
    ),
    pn AS (SELECT pattern, CAST(count(*) AS BIGINT) AS n_tri
           FROM ptri GROUP BY pattern),
    d AS (SELECT doc_id, {DK_NORM_TEXT} AS nt FROM documents),
    dtri AS (
      SELECT doc_id, unnest(list_distinct(list_transform(
               generate_series(1, len(nt) - 2),
               i -> substr(nt, i, 3)))) AS tri
      FROM d WHERE len(nt) >= 3
    ),
    cand AS (
      SELECT p.pattern, t.doc_id, count(*) AS c
      FROM dtri t JOIN ptri p ON p.tri = t.tri
      GROUP BY p.pattern, t.doc_id
    ),
    covered AS (
      SELECT c.pattern, c.doc_id
      FROM cand c JOIN pn ON pn.pattern = c.pattern
      WHERE c.c = pn.n_tri
    ),
    ver AS (
      SELECT f.pattern,
             CAST(count(*) AS BIGINT) AS n_candidates,
             CAST(sum(CASE WHEN contains(d.nt, f.pattern)
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_matched
      FROM covered f JOIN d ON d.doc_id = f.doc_id
      GROUP BY f.pattern
    )
    SELECT p.pattern,
           coalesce(v.n_candidates, CAST(0 AS BIGINT)) AS n_candidates,
           coalesce(v.n_matched, CAST(0 AS BIGINT))    AS n_matched
    FROM pats p LEFT JOIN ver v ON v.pattern = p.pattern
    """,
)
def q206_trigram_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Literal substring search served from a TRIGRAM INDEX (the
    pg_trgm / code-search design): a doc is a candidate only if its
    distinct-trigram set covers every trigram of the pattern, then the
    survivors are verified with one exact ``contains``. At 100 TB the
    posting list (trigram -> doc) is the only corpus-scale frame, the
    pattern side is broadcast, and verification touches candidate docs
    only — a LIKE '%pat%' full scan never happens. Includes a zero-hit
    pattern to pin the empty-posting edge."""
    from etl_jetro_spark.functions.hashing import norm_text

    _PATS = ["fast merge", "slow scan", "hash join", "sort merge",
             "spark sql"]
    pats = spark.createDataFrame([(p,) for p in _PATS], ["pattern"])
    tri = (
        "array_distinct(transform(sequence(1, length({c}) - 2),"
        " i -> substring({c}, i, 3)))"
    )
    ptri = pats.select(
        "pattern", F.explode(F.expr(tri.format(c="pattern"))).alias("tri")
    )
    pn = ptri.groupBy("pattern").agg(
        F.count(F.lit(1)).cast("long").alias("n_tri")
    )
    d = load(spark, sf_dir, "documents").select(
        "doc_id", norm_text("text").alias("nt")
    )
    # r11: the pattern trigram universe is a STATIC literal (the
    # patterns are constants), so each doc's trigram array is cut to
    # the ≤40 trigrams any pattern could use BEFORE the explode —
    # previously every trigram of every doc exploded into the join
    # (rows ~ total characters; guide §3.3 "explode before a join
    # multiplies"). The posting join itself is unchanged.
    plit = sorted(
        {p[i:i + 3] for p in _PATS for i in range(len(p) - 2)}
    )
    dtri = d.filter(F.length("nt") >= 3).select(
        "doc_id",
        F.explode(
            F.array_intersect(
                F.expr(tri.format(c="nt")),
                F.array(*[F.lit(t) for t in plit]),
            )
        ).alias("tri"),
    )
    cand = (
        dtri.join(bcast_small(ptri), "tri")
        .groupBy("pattern", "doc_id")
        .agg(F.count(F.lit(1)).alias("c"))
        .join(bcast_small(pn), "pattern")
        .filter(F.col("c") == F.col("n_tri"))
    )
    # verification re-derives nt for CANDIDATE docs only (a second
    # corpus-wide norm_text pass bought nothing — covered is tiny)
    ver = (
        cand.select("pattern", "doc_id")
        .join(load(spark, sf_dir, "documents").select("doc_id", "text"),
              "doc_id")
        .select("pattern", "doc_id", norm_text("text").alias("nt"))
        .groupBy("pattern")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_candidates"),
            F.sum(
                F.when(F.col("nt").contains(F.col("pattern")), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_matched"),
        )
    )
    return pats.join(ver, "pattern", "left").select(
        "pattern",
        F.coalesce("n_candidates", F.lit(0).cast("long")).alias(
            "n_candidates"
        ),
        F.coalesce("n_matched", F.lit(0).cast("long")).alias("n_matched"),
    )


@query(
    "q207_sparse_cosine_pairs",
    f"""
    WITH toks AS (
      SELECT doc_id, t.t AS term
      FROM (SELECT doc_id, {DK_WORDS} AS w FROM documents) d,
           UNNEST(w) AS t(t)
      WHERE t.t <> ''
    ),
    tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
           FROM toks GROUP BY doc_id, term),
    dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df
              FROM tf GROUP BY term),
    nd AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
    w AS (
      SELECT tf.doc_id, tf.term, dfreq.df,
             tf.tf * ln((nd.n + 1) / (dfreq.df + 1)) AS wt
      FROM tf JOIN dfreq USING (term) CROSS JOIN nd
    ),
    nrm AS (SELECT doc_id, sqrt(sum(wt * wt)) AS nn FROM w GROUP BY doc_id),
    u AS (
      SELECT w.doc_id, w.term, w.wt / nrm.nn AS uw
      FROM w JOIN nrm USING (doc_id)
      WHERE w.df <= 100 AND nrm.nn > 0
    ),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             round(sum(a.uw * b.uw), 4) AS cosine
      FROM u a JOIN u b ON a.term = b.term AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT id_a, id_b, cosine FROM pairs WHERE cosine >= 0.5
    """,
)
def q207_sparse_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse TF-IDF cosine similarity pairs through an inverted-index
    join: per-doc L2-normalized smoothed tf-idf vectors, pair partial
    products generated ONLY for docs sharing a term, with the q110-style
    document-frequency cap (df <= 100) keeping hot terms out of the
    pair join — stopword-ish terms contribute ~0 cosine mass but
    quadratic pair volume, so the cap is both a speed and a relevance
    filter. Norms are computed over the FULL vector before capping, so
    reported cosines are true upper-bounded partial cosines. The
    threshold compares the ROUNDED sum so engine-order float noise
    cannot flip boundary pairs."""
    from etl_jetro_spark.functions.hashing import norm_text

    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split(norm_text("text"), " ")).alias("term")
    ).filter(F.col("term") != "")
    tf = toks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    dfreq = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    )
    nd = d.agg(F.count(F.lit(1)).cast("double").alias("n"))
    w = (
        tf.join(dfreq, "term")
        .crossJoin(bcast_small(nd))
        .select(
            "doc_id",
            "term",
            "df",
            (
                F.col("tf") * F.log((F.col("n") + 1) / (F.col("df") + 1))
            ).alias("wt"),
        )
    )
    nrm = w.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("wt") * F.col("wt"))).alias("nn")
    )
    u = (
        w.join(nrm, "doc_id")
        .filter((F.col("df") <= 100) & (F.col("nn") > 0))
        .select("doc_id", "term", (F.col("wt") / F.col("nn")).alias("uw"))
    )
    a = u.alias("a")
    b = u.alias("b")
    return (
        a.join(
            b,
            (F.col("a.term") == F.col("b.term"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .agg(F.round(F.sum(F.col("a.uw") * F.col("b.uw")), 4).alias("cosine"))
        .filter(F.col("cosine") >= 0.5)
    )


@query(
    "q208_sessionization",
    """
    WITH e AS (
      SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS s
      FROM events
    ),
    g AS (
      SELECT user_id, event_id, s,
             CASE WHEN lag(s) OVER w IS NULL
                       OR s - lag(s) OVER w > 1800 THEN 1 ELSE 0 END AS brk
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY s, event_id)
    ),
    sid AS (
      SELECT user_id, s,
             sum(brk) OVER (PARTITION BY user_id ORDER BY s, event_id
                            ROWS UNBOUNDED PRECEDING) AS sess
      FROM g
    ),
    per_sess AS (
      SELECT user_id, sess,
             CAST(count(*) AS BIGINT) AS n_events,
             max(s) - min(s)          AS dur_s
      FROM sid GROUP BY user_id, sess
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT)  AS n_sessions,
           CAST(sum(n_events) AS BIGINT) AS n_events,
           round(avg(n_events), 4)   AS avg_session_events,
           round(avg(dur_s), 4)      AS avg_session_dur_s,
           CAST(max(dur_s) AS BIGINT) AS max_session_dur_s
    FROM per_sess GROUP BY user_id
    """,
)
def q208_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inactivity-gap sessionization (30-minute rule): a session breaks
    where the per-user gap exceeds 1800 s; session ids are the running
    sum of break flags. Both windows are PARTITIONED by user (never
    global, WGL-safe ordering with an event_id tiebreak for determinism
    on same-second events), so the shuffle is one hash exchange on
    user_id and each user's timeline sorts locally — the batch mirror of
    the streaming session-window operator. Timestamps are floored to
    whole epoch seconds on both engines before any arithmetic."""
    from pyspark.sql import Window

    e = load_events(spark, sf_dir).select(
        "user_id",
        "event_id",
        (F.col("ts") / F.lit(1_000_000_000)).cast("long").alias("s"),
    )
    w = Window.partitionBy("user_id").orderBy("s", "event_id")
    g = e.withColumn(
        "brk",
        F.when(
            F.lag("s").over(w).isNull()
            | ((F.col("s") - F.lag("s").over(w)) > 1800),
            1,
        ).otherwise(0),
    )
    sid = g.withColumn(
        "sess", F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    per_sess = sid.groupBy("user_id", "sess").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        (F.max("s") - F.min("s")).alias("dur_s"),
    )
    return per_sess.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.sum("n_events").cast("long").alias("n_events"),
        F.round(F.avg("n_events"), 4).alias("avg_session_events"),
        F.round(F.avg("dur_s"), 4).alias("avg_session_dur_s"),
        F.max("dur_s").cast("long").alias("max_session_dur_s"),
    )


@query(
    "q209_jackknife_ci",
    f"""
    WITH b AS (
      SELECT {_hexb_sql("jk:", "o_orderkey", 50)} AS bucket,
             CAST(count(*) AS BIGINT) AS n_b,
             {sql_sum_micro('o_totalprice')} AS s_b
      FROM orders GROUP BY 1
    ),
    tot AS (SELECT CAST(sum(n_b) AS BIGINT) AS n,
                   CAST(sum(s_b) AS HUGEINT) AS s,
                   CAST(count(*) AS BIGINT) AS nb
            FROM b),
    loo AS (
      SELECT CAST(tot.s - b.s_b AS DOUBLE) / 1000000 / (tot.n - b.n_b) AS m_i
      FROM b CROSS JOIN tot
    ),
    jk AS (
      SELECT avg(m_i) AS m_bar,
             sum((m_i - (SELECT avg(m_i) FROM loo))
                 * (m_i - (SELECT avg(m_i) FROM loo))) AS ss
      FROM loo
    )
    SELECT tot.n,
           CAST(tot.nb AS BIGINT)                          AS n_buckets,
           round(CAST(tot.s AS DOUBLE) / 1000000 / tot.n, 4) AS mean,
           round(sqrt((tot.nb - 1.0) / tot.nb * jk.ss), 4) AS jackknife_se,
           round(CAST(tot.s AS DOUBLE) / 1000000 / tot.n
                 - 1.96 * sqrt((tot.nb - 1.0) / tot.nb * jk.ss), 4) AS ci_lo,
           round(CAST(tot.s AS DOUBLE) / 1000000 / tot.n
                 + 1.96 * sqrt((tot.nb - 1.0) / tot.nb * jk.ss), 4) AS ci_hi
    FROM tot CROSS JOIN jk
    """,
)
def q209_jackknife_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delete-one-group jackknife standard error and 95% CI for mean
    order value over 50 deterministic md5 hash buckets — the
    resampling-free way to put an error bar on a 100 TB mean: one
    partial-agg pass builds the 50 (count, sum) bucket moments, and
    everything after is arithmetic on a 50-row frame. No bootstrap
    replicate ever rescans the data, and the hash bucketing makes the
    CI bit-reproducible across engines and partitionings."""
    from etl_jetro_spark.operators.sampling import hash_bucket

    o = load(spark, sf_dir, "orders")
    b = o.groupBy(
        hash_bucket("o_orderkey", 50, "jk:").alias("bucket")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_b"),
        # exact micro-dollar bucket sums (moneylint: raw double money
        # sums are fold-order-dependent at scale)
        M.sum_micro("o_totalprice").alias("s_b"),
    )
    tot = b.agg(
        F.sum("n_b").cast("long").alias("n"),
        F.sum(F.col("s_b").cast("decimal(38,0)")).alias("s"),
        F.count(F.lit(1)).cast("long").alias("nb"),
    )
    loo = b.crossJoin(bcast_small(tot)).select(
        (
            (F.col("s") - F.col("s_b")).cast("double")
            / M.MICRO
            / (F.col("n") - F.col("n_b"))
        ).alias("m_i")
    )
    mbar = loo.agg(F.avg("m_i").alias("m_bar"))
    jk = (
        loo.crossJoin(bcast_small(mbar))
        .agg(
            F.sum(
                (F.col("m_i") - F.col("m_bar"))
                * (F.col("m_i") - F.col("m_bar"))
            ).alias("ss")
        )
    )
    se = F.sqrt((F.col("nb") - 1.0) / F.col("nb") * F.col("ss"))
    return (
        tot.crossJoin(jk)
        .select(
            "n",
            F.col("nb").alias("n_buckets"),
            F.round(F.col("s").cast("double") / M.MICRO / F.col("n"), 4).alias(
                "mean"
            ),
            F.round(se, 4).alias("jackknife_se"),
            F.round(
                F.col("s").cast("double") / M.MICRO / F.col("n") - 1.96 * se, 4
            ).alias("ci_lo"),
            F.round(
                F.col("s").cast("double") / M.MICRO / F.col("n") + 1.96 * se, 4
            ).alias("ci_hi"),
        )
    )


@query(
    "q210_table_digest",
    f"""
    WITH oh AS (
      SELECT {_dk_hex8("md5('dig:' || CAST(o_orderkey AS VARCHAR))")} AS h,
             o_orderkey AS k
      FROM orders
    ),
    od AS (
      SELECT h % 32 AS bucket,
             CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum(h) AS BIGINT)   AS orders_checksum,
             CAST(min(k) AS BIGINT)   AS min_key,
             CAST(max(k) AS BIGINT)   AS max_key
      FROM oh GROUP BY 1
    ),
    lh AS (
      SELECT {_dk_hex8("md5('dig:' || CAST(k AS VARCHAR))")} AS h
      FROM (SELECT DISTINCT l_orderkey AS k FROM lineitem)
    ),
    ld AS (
      SELECT h % 32 AS bucket,
             CAST(count(*) AS BIGINT) AS n_line_orders,
             CAST(sum(h) AS BIGINT)   AS line_checksum
      FROM lh GROUP BY 1
    )
    SELECT CAST(od.bucket AS BIGINT) AS bucket,
           od.n_orders, od.orders_checksum, od.min_key, od.max_key,
           coalesce(ld.n_line_orders, CAST(0 AS BIGINT)) AS n_line_orders,
           coalesce(ld.line_checksum, CAST(0 AS BIGINT)) AS line_checksum,
           od.orders_checksum = coalesce(ld.line_checksum, CAST(0 AS BIGINT))
             AS consistent
    FROM od LEFT JOIN ld ON ld.bucket = od.bucket
    """,
)
def q210_table_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merkle-leaf table digest for cross-replica verification: each key
    hashes to a 32-bit value, buckets carry (count, additive checksum,
    key range), and two independent derivations of the same key set —
    the orders table vs the DISTINCT orderkeys observed in lineitem —
    are compared bucket-by-bucket. A mismatched bucket localizes drift
    to 1/32 of the keyspace without ever moving keys: the digest is one
    partial-aggregable shuffle per side (sum/count/min/max all combine
    map-side), which is how 100 TB replicas are reconciled in practice.
    Buckets where the key sets differ (orders with no lineitems) show
    as consistent=false with the count delta."""
    from etl_jetro_spark.functions.hashing import norm_text  # noqa: F401

    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")

    def h32(c):
        return F.conv(
            F.substring(
                F.md5(F.concat(F.lit("dig:"), c.cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("long")

    oh = o.select(
        h32(F.col("o_orderkey")).alias("h"), F.col("o_orderkey").alias("k")
    )
    od = oh.groupBy((F.col("h") % 32).alias("bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("h").cast("long").alias("orders_checksum"),
        F.min("k").cast("long").alias("min_key"),
        F.max("k").cast("long").alias("max_key"),
    )
    lh = (
        li.select(F.col("l_orderkey").alias("k"))
        .distinct()
        .select(h32(F.col("k")).alias("h"))
    )
    ld = lh.groupBy((F.col("h") % 32).alias("bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("n_line_orders"),
        F.sum("h").cast("long").alias("line_checksum"),
    )
    return (
        od.join(ld, "bucket", "left")
        .select(
            F.col("bucket").cast("long").alias("bucket"),
            "n_orders",
            "orders_checksum",
            "min_key",
            "max_key",
            F.coalesce("n_line_orders", F.lit(0).cast("long")).alias(
                "n_line_orders"
            ),
            F.coalesce("line_checksum", F.lit(0).cast("long")).alias(
                "line_checksum"
            ),
            (
                F.col("orders_checksum")
                == F.coalesce("line_checksum", F.lit(0).cast("long"))
            ).alias("consistent"),
        )
    )


@query(
    "q211_item2item_recs",
    """
    WITH b AS (SELECT l_orderkey, l_partkey FROM lineitem
               GROUP BY l_orderkey, l_partkey),
    supp AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS s
             FROM b GROUP BY l_partkey),
    pair AS (
      SELECT a.l_partkey AS ia, c.l_partkey AS ib,
             CAST(count(*) AS BIGINT) AS co
      FROM b a JOIN b c
        ON a.l_orderkey = c.l_orderkey AND a.l_partkey < c.l_partkey
      GROUP BY 1, 2 HAVING count(*) >= 2
    ),
    sym AS (
      SELECT ia AS item, ib AS rec, co FROM pair
      UNION ALL
      SELECT ib AS item, ia AS rec, co FROM pair
    ),
    scored AS (
      SELECT s.item, s.rec,
             round(s.co / sqrt(sa.s * sb.s), 6) AS score
      FROM sym s
      JOIN supp sa ON sa.l_partkey = s.item
      JOIN supp sb ON sb.l_partkey = s.rec
    ),
    ranked AS (
      SELECT item, rec, score,
             row_number() OVER (PARTITION BY item
                                ORDER BY score DESC, rec) AS rk
      FROM scored
    )
    SELECT CAST(item AS BIGINT) AS item, CAST(rec AS BIGINT) AS rec,
           score, CAST(rk AS BIGINT) AS rank
    FROM ranked WHERE rk <= 3
    """,
)
def q211_item2item_recs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-to-item collaborative filtering (the classic Amazon i2i
    shape): basket co-occurrence counts normalized to cosine
    co / sqrt(supp_a * supp_b), symmetrized, top-3 neighbors per item
    via a PARTITIONED rank window (WindowGroupLimit-pruned). Pair
    generation is per-basket (bounded carts — Σk² per order, corpus-
    size-linear); supports are broadcast-joinable item-cardinality
    frames. Ranking ties break on the rounded score + item id so both
    engines pick identical neighbors."""
    from pyspark.sql import Window

    li = load(spark, sf_dir, "lineitem")
    # basket frame feeds item supports AND the pair stream — checkpoint
    # so the collect_set shuffle runs once (r11)
    g = _baskets(li).localCheckpoint(eager=False)
    supp = g.select(F.explode("_ps").alias("l_partkey")).groupBy(
        "l_partkey"
    ).agg(F.count(F.lit(1)).cast("long").alias("s"))
    pair = (
        g.select(F.posexplode("_ps").alias("_i", "ia"), "_ps")
        .select(
            "ia",
            F.explode(
                F.slice("_ps", F.col("_i") + F.lit(2), F.size("_ps"))
            ).alias("ib"),
        )
        .groupBy("ia", "ib")
        .agg(F.count(F.lit(1)).cast("long").alias("co"))
        .filter(F.col("co") >= 2)
    )
    sym = pair.select(
        F.col("ia").alias("item"), F.col("ib").alias("rec"), "co"
    ).unionAll(
        pair.select(F.col("ib").alias("item"), F.col("ia").alias("rec"), "co")
    )
    sa = supp.select(F.col("l_partkey").alias("item"), F.col("s").alias("sa"))
    sb = supp.select(F.col("l_partkey").alias("rec"), F.col("s").alias("sb"))
    # support frames are part-keyed — data-scale — so NO forced
    # broadcast: the pair frame is already shuffled on item/rec and AQE
    # picks broadcast only when the supports measure small (r5 verdict)
    scored = (
        sym.join(sa, "item")
        .join(sb, "rec")
        .select(
            "item",
            "rec",
            F.round(
                F.col("co") / F.sqrt(F.col("sa") * F.col("sb")), 6
            ).alias("score"),
        )
    )
    w = Window.partitionBy("item").orderBy(F.desc("score"), F.asc("rec"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select(
            F.col("item").cast("long"),
            F.col("rec").cast("long"),
            "score",
            F.col("rank").cast("long"),
        )
    )


@query(
    "q212_autocorrelation",
    f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST({sql_sum_micro('o_totalprice')} AS DOUBLE) / 1000000 AS rev
      FROM orders GROUP BY 1
    ),
    lags(lag_d) AS (VALUES (1), (7), (30))
    SELECT CAST(l.lag_d AS BIGINT) AS lag_days,
           CAST(count(*) AS BIGINT) AS n_pairs,
           round(corr(a.rev, b.rev), 6) AS autocorr
    FROM lags l
    JOIN daily a ON TRUE
    JOIN daily b ON b.d = a.d + CAST(l.lag_d AS INTEGER)
    GROUP BY l.lag_d
    """,
)
def q212_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-k autocorrelation of the daily revenue series (k = 1, 7, 30
    days — persistence, weekly and monthly seasonality): the series is
    paired with its shifted self by an equi-join on the shifted DATE
    (gap-robust — calendar holes pair nothing, unlike a row-offset lag
    which silently spans gaps), and Pearson r comes from the engines'
    corr aggregate. The daily frame is date-NDV-sized, so the 3-lag
    expansion and joins are metadata-scale regardless of corpus size."""
    o = load(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        # exact micro-dollar day sum, one double conversion (moneylint)
        (M.sum_micro("o_totalprice").cast("double") / M.MICRO).alias("rev")
    )
    lags = spark.createDataFrame([(1,), (7,), (30,)], ["lag_d"])
    a = daily.alias("a")
    b = daily.alias("b")
    return (
        lags.crossJoin(a)
        .join(
            b,
            F.col("b.d")
            == F.expr("date_add(a.d, cast(lag_d as int))"),
        )
        .groupBy(F.col("lag_d").cast("long").alias("lag_days"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.round(F.corr("a.rev", "b.rev"), 6).alias("autocorr"),
        )
    )


@query(
    "q213_ks_test",
    """
    WITH t AS (
      SELECT o_totalprice AS v,
             CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 ELSE 0 END AS hi
      FROM orders
    ),
    c AS (
      SELECT v,
             CAST(sum(hi) AS BIGINT)     AS c_a,
             CAST(sum(1 - hi) AS BIGINT) AS c_b
      FROM t GROUP BY v
    ),
    cum AS (
      SELECT sum(c_a) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS ca,
             sum(c_b) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cb
      FROM c
    ),
    tot AS (SELECT CAST(sum(c_a) AS BIGINT) AS na,
                   CAST(sum(c_b) AS BIGINT) AS nb FROM c)
    SELECT tot.na AS n_high, tot.nb AS n_low,
           round(max(abs(cum.ca / CAST(tot.na AS DOUBLE)
                         - cum.cb / CAST(tot.nb AS DOUBLE))), 6) AS ks_stat,
           round(1.36 * sqrt((tot.na + tot.nb)
                             / (CAST(tot.na AS DOUBLE) * tot.nb)), 6)
             AS critical_05,
           max(abs(cum.ca / CAST(tot.na AS DOUBLE)
                   - cum.cb / CAST(tot.nb AS DOUBLE)))
             > 1.36 * sqrt((tot.na + tot.nb)
                           / (CAST(tot.na AS DOUBLE) * tot.nb)) AS reject_05
    FROM cum CROSS JOIN tot
    GROUP BY tot.na, tot.nb
    """,
)
def q213_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov test between high- and low-priority
    order values: D = max |F_hi(v) - F_lo(v)| over the pooled support,
    against the 5% asymptotic critical value. The cumulative counts are
    a DISTRIBUTED prefix sum (the group_ranked idiom): per-value counts
    range-partition by value, each partition cumsums locally, and
    per-partition totals — a bounded nparts-row frame — provide the
    offsets, so no global window ever sees a data-scale frame. All
    cumulative quantities are exact integers; floats appear only in the
    final ratio, making D bit-identical across engines."""
    from pyspark.sql import Window

    o = load(spark, sf_dir, "orders")
    t = o.select(
        F.col("o_totalprice").alias("v"),
        F.when(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
        )
        .otherwise(0)
        .alias("hi"),
    )
    c = t.groupBy("v").agg(
        F.sum("hi").cast("long").alias("c_a"),
        F.sum(1 - F.col("hi")).cast("long").alias("c_b"),
    )
    nparts = max(spark.sparkContext.defaultParallelism, 8)
    base = (
        c.repartitionByRange(nparts, "v")
        .sortWithinPartitions("v")
        .withColumn("_pid", F.spark_partition_id())
    )
    wl = (
        Window.partitionBy("_pid")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    loc = base.select(
        "_pid",
        F.sum("c_a").over(wl).alias("la"),
        F.sum("c_b").over(wl).alias("lb"),
    )
    pidtot = base.groupBy("_pid").agg(
        F.sum("c_a").alias("ta"), F.sum("c_b").alias("tb")
    )
    woff = Window.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, 0
    )
    off = pidtot.select(
        "_pid",
        (F.sum("ta").over(woff) - F.col("ta")).alias("oa"),
        (F.sum("tb").over(woff) - F.col("tb")).alias("ob"),
    )
    tot = c.agg(
        F.sum("c_a").cast("long").alias("na"),
        F.sum("c_b").cast("long").alias("nb"),
    )
    cum = loc.join(bcast_small(off), "_pid").select(
        (F.col("la") + F.col("oa")).alias("ca"),
        (F.col("lb") + F.col("ob")).alias("cb"),
    )
    d = cum.crossJoin(bcast_small(tot)).select(
        "na",
        "nb",
        F.abs(
            F.col("ca") / F.col("na").cast("double")
            - F.col("cb") / F.col("nb").cast("double")
        ).alias("d"),
    )
    crit = 1.36 * F.sqrt(
        (F.col("na") + F.col("nb"))
        / (F.col("na").cast("double") * F.col("nb"))
    )
    return d.groupBy(
        F.col("na").alias("n_high"), F.col("nb").alias("n_low")
    ).agg(
        F.round(F.max("d"), 6).alias("ks_stat"),
        F.round(
            F.max(
                1.36
                * F.sqrt(
                    (F.col("na") + F.col("nb"))
                    / (F.col("na").cast("double") * F.col("nb"))
                )
            ),
            6,
        ).alias("critical_05"),
        (
            F.max("d")
            > F.max(
                1.36
                * F.sqrt(
                    (F.col("na") + F.col("nb"))
                    / (F.col("na").cast("double") * F.col("nb"))
                )
            )
        ).alias("reject_05"),
    )


@query(
    "q214_doc_perplexity",
    f"""
    WITH toks AS (
      SELECT doc_id, t.t AS term
      FROM (SELECT doc_id, {DK_WORDS} AS w FROM documents) d,
           UNNEST(w) AS t(t)
      WHERE t.t <> ''
    ),
    lm AS (SELECT term, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY term),
    consts AS (SELECT CAST(sum(c) AS DOUBLE) AS big_c,
                      CAST(count(*) AS DOUBLE) AS v
               FROM lm),
    scored AS (
      SELECT t.doc_id,
             CAST(count(*) AS BIGINT) AS n_tokens,
             sum(-ln((lm.c + 1) / (consts.big_c + consts.v))) / count(*) AS h
      FROM toks t JOIN lm USING (term) CROSS JOIN consts
      GROUP BY t.doc_id
    )
    SELECT doc_id, n_tokens, round(h, 6) AS cross_entropy,
           round(exp(h), 4) AS perplexity
    FROM scored WHERE doc_id % 20 = 0
    """,
)
def q214_doc_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document perplexity under the corpus add-1-smoothed unigram
    LM — the cheap LM-quality filter (CCNet-style) that flags
    out-of-distribution documents before expensive model scoring. The
    LM is one term-count shuffle; scoring re-joins tokens to term probs
    (term-cardinality frame) and reduces per doc. Reported for the
    doc_id %% 20 == 0 slice (q199's result-sizing convention)."""
    from etl_jetro_spark.functions.hashing import norm_text

    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split(norm_text("text"), " ")).alias("term")
    ).filter(F.col("term") != "")
    lm = toks.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("c"))
    consts = lm.agg(
        F.sum("c").cast("double").alias("big_c"),
        F.count(F.lit(1)).cast("double").alias("v"),
    )
    scored = (
        toks.join(lm, "term")
        .crossJoin(bcast_small(consts))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            (
                F.sum(
                    -F.log(
                        (F.col("c") + 1) / (F.col("big_c") + F.col("v"))
                    )
                )
                / F.count(F.lit(1))
            ).alias("h"),
        )
    )
    return scored.filter(F.col("doc_id") % 20 == 0).select(
        "doc_id",
        "n_tokens",
        F.round(F.col("h"), 6).alias("cross_entropy"),
        F.round(F.exp(F.col("h")), 4).alias("perplexity"),
    )


@query(
    "q215_label_coherence",
    """
    WITH e AS (
      SELECT vec_id, label, generate_subscripts(embedding, 1) AS i,
             CAST(unnest(embedding) AS DOUBLE) AS x
      FROM embeddings
    ),
    cent AS (SELECT label, i, avg(x) AS c FROM e GROUP BY label, i),
    cnorm AS (SELECT label, sqrt(sum(c * c)) AS cn FROM cent GROUP BY label),
    dots AS (
      SELECT e.vec_id, e.label,
             sum(e.x * cent.c) AS dot,
             sqrt(sum(e.x * e.x)) AS vn
      FROM e JOIN cent ON cent.label = e.label AND cent.i = e.i
      GROUP BY e.vec_id, e.label
    ),
    coh AS (
      SELECT d.label,
             CAST(count(*) AS BIGINT) AS n,
             avg(d.dot / (d.vn * cn.cn)) AS coherence
      FROM dots d JOIN cnorm cn ON cn.label = d.label
      GROUP BY d.label
    ),
    cpairs AS (
      SELECT a.label AS la, b.label AS lb,
             sum(a.c * b.c) AS cdot
      FROM cent a JOIN cent b ON a.i = b.i AND a.label <> b.label
      GROUP BY a.label, b.label
    ),
    sep AS (
      SELECT p.la AS label,
             max(p.cdot / (na.cn * nb.cn)) AS max_other_cos
      FROM cpairs p
      JOIN cnorm na ON na.label = p.la
      JOIN cnorm nb ON nb.label = p.lb
      GROUP BY p.la
    )
    SELECT coh.label, coh.n,
           round(coh.coherence, 6)    AS coherence,
           round(sep.max_other_cos, 6) AS max_other_cos,
           coh.coherence > sep.max_other_cos AS separable
    FROM coh JOIN sep ON sep.label = coh.label
    """,
)
def q215_label_coherence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space cluster health per label: intra-label coherence
    (mean cosine of members to their label centroid) vs the worst
    inter-centroid cosine — the silhouette-style audit run before
    trusting labels for contrastive training. Centroids reduce via one
    (label, dim) partial-agg shuffle; members re-join the
    label-cardinality centroid frame (broadcast); the centroid-pair
    block is labels², metadata-scale. Vectors never pair with vectors."""
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.posexplode("embedding").alias("i", "xf"),
    ).select("vec_id", "label", "i", F.col("xf").cast("double").alias("x"))
    cent = e.groupBy("label", "i").agg(F.avg("x").alias("c"))
    cnorm = cent.groupBy("label").agg(
        F.sqrt(F.sum(F.col("c") * F.col("c"))).alias("cn")
    )
    dots = (
        e.join(bcast_small(cent), ["label", "i"])
        .groupBy("vec_id", "label")
        .agg(
            F.sum(F.col("x") * F.col("c")).alias("dot"),
            F.sqrt(F.sum(F.col("x") * F.col("x"))).alias("vn"),
        )
    )
    coh = (
        dots.join(bcast_small(cnorm), "label")
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.avg(F.col("dot") / (F.col("vn") * F.col("cn"))).alias(
                "coherence"
            ),
        )
    )
    a = cent.alias("a")
    b = cent.alias("b")
    cpairs = (
        a.join(
            b,
            (F.col("a.i") == F.col("b.i"))
            & (F.col("a.label") != F.col("b.label")),
        )
        .groupBy(
            F.col("a.label").alias("la"), F.col("b.label").alias("lb")
        )
        .agg(F.sum(F.col("a.c") * F.col("b.c")).alias("cdot"))
    )
    na = cnorm.select(F.col("label").alias("la"), F.col("cn").alias("cna"))
    nb = cnorm.select(F.col("label").alias("lb"), F.col("cn").alias("cnb"))
    sep = (
        cpairs.join(bcast_small(na), "la")
        .join(bcast_small(nb), "lb")
        .groupBy(F.col("la").alias("label"))
        .agg(
            F.max(F.col("cdot") / (F.col("cna") * F.col("cnb"))).alias(
                "max_other_cos"
            )
        )
    )
    return coh.join(sep, "label").select(
        "label",
        "n",
        F.round("coherence", 6).alias("coherence"),
        F.round("max_other_cos", 6).alias("max_other_cos"),
        (F.col("coherence") > F.col("max_other_cos")).alias("separable"),
    )


@query(
    "q216_burstiness",
    """
    WITH m AS (
      SELECT event_type,
             CAST(floor(epoch(ts)) AS BIGINT) // 60 AS minute,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    fano AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_minutes,
             avg(c)                   AS mean_rate,
             CASE WHEN count(*) > 1
                  THEN (sum(c * c) - sum(c) * sum(c) / CAST(count(*) AS DOUBLE))
                       / (count(*) - 1) / avg(c)
                  ELSE 0 END AS fano
      FROM m GROUP BY event_type
    )
    SELECT event_type, n_minutes,
           round(mean_rate, 6) AS mean_per_min,
           round(fano, 6)      AS fano_factor,
           fano > 1.5          AS bursty
    FROM fano
    """,
)
def q216_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Traffic burstiness per event type: the Fano factor
    (variance / mean of per-minute arrival counts; 1 = Poisson,
    > 1 = bursty) computed from closed-form moment sums so the variance
    needs no second pass and no engine-specific sample/population
    convention — (Σc² − (Σc)²/n)/(n−1) is written out explicitly on
    both engines. One (type, minute) pre-agg shuffle, then a
    type-cardinality reduce; minutes with zero events are absent on
    both sides by construction."""
    e = load_events(spark, sf_dir).select(
        "event_type",
        F.expr("(ts div 1000000000) div 60").alias("minute"),
    )
    m = e.groupBy("event_type", "minute").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    fano_expr = F.when(
        F.count(F.lit(1)) > 1,
        (
            F.sum(F.col("c") * F.col("c"))
            - F.sum("c") * F.sum("c") / F.count(F.lit(1)).cast("double")
        )
        / (F.count(F.lit(1)) - 1)
        / F.avg("c"),
    ).otherwise(F.lit(0.0))
    return m.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_minutes"),
        F.round(F.avg("c"), 6).alias("mean_per_min"),
        F.round(fano_expr, 6).alias("fano_factor"),
        (fano_expr > 1.5).alias("bursty"),
    )


@query(
    "q217_event_cube",
    """
    SELECT coalesce(event_type, 'ALL') AS event_type,
           coalesce(CAST(dow AS VARCHAR), 'ALL') AS day_of_week,
           CAST(2 * GROUPING(event_type) + GROUPING(dow) AS BIGINT) AS lvl,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(coalesce(value, 0)), 4) AS total_value
    FROM (SELECT event_type, dayofweek(ts) AS dow, value FROM events)
    GROUP BY CUBE (event_type, dow)
    """,
)
def q217_event_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full CUBE over (event_type, day-of-week): all four grouping sets
    — cell, type margin, weekday margin, grand total — in ONE Expand +
    partial-agg pass (Spark's ``cube``), the OLAP companion to q201's
    ROLLUP. DuckDB's ``dayofweek`` is 0-based Sunday; Spark's
    ``dayofweek`` is 1-based — bridged with an explicit -1 so the cube
    cells match. GROUPING() bits pin the level encoding on both
    engines."""
    e = load_events(spark, sf_dir).select(
        "event_type",
        (F.dayofweek("ts_utc") - 1).alias("dow"),
        "value",
    )
    return (
        e.cube("event_type", "dow")
        .agg(
            (2 * F.grouping("event_type") + F.grouping("dow"))
            .cast("long")
            .alias("lvl"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.round(F.sum(F.coalesce("value", F.lit(0))), 4).alias(
                "total_value"
            ),
        )
        .select(
            F.coalesce("event_type", F.lit("ALL")).alias("event_type"),
            F.coalesce(F.col("dow").cast("string"), F.lit("ALL")).alias(
                "day_of_week"
            ),
            "lvl",
            "n_events",
            "total_value",
        )
    )


@query(
    "q218_wow_growth",
    f"""
    WITH wk AS (
      SELECT o_orderpriority AS pri,
             CAST(floor(epoch(o_orderdate)) AS BIGINT) // 604800 AS week,
             {sql_sum_micro('o_totalprice')} AS um,
             CAST(count(*) AS BIGINT) AS n
      FROM orders GROUP BY 1, 2
    )
    SELECT a.pri, CAST(a.week AS BIGINT) AS week, a.n,
           round(CAST(a.um AS DOUBLE) / 1000000, 4) AS revenue,
           round(CAST(b.um AS DOUBLE) / 1000000, 4) AS prev_revenue,
           round(CAST(a.um - b.um AS DOUBLE) / CAST(b.um AS DOUBLE), 6)
             AS wow_growth
    FROM wk a JOIN wk b ON b.pri = a.pri AND b.week = a.week - 1
    WHERE a.week % 20 = 0
    """,
)
def q218_wow_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week revenue growth per order priority: weekly epoch
    buckets (integer division — calendar-free and engine-identical),
    self-joined on the PREVIOUS week so calendar gaps pair nothing
    instead of silently spanning (the q212 join-not-lag rule). The
    weekly frame is (priority x week) — metadata-scale — so the
    self-join is trivially broadcastable; the corpus is touched once.
    Reported for every 20th week to keep the result result-set-sized."""
    from etl_jetro_spark.functions.dates import epoch_seconds_ntz

    o = load(spark, sf_dir, "orders")
    wk = o.groupBy(
        F.col("o_orderpriority").alias("pri"),
        (epoch_seconds_ntz(F.col("o_orderdate").cast("timestamp_ntz")) / 604800)
        .cast("long")
        .alias("week"),
    ).agg(
        # exact micro-dollar week sums (moneylint)
        M.sum_micro("o_totalprice").alias("um"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    a = wk.alias("a")
    b = wk.alias("b")
    return (
        a.join(
            b,
            (F.col("b.pri") == F.col("a.pri"))
            & (F.col("b.week") == F.col("a.week") - 1),
        )
        .filter(F.col("a.week") % 20 == 0)
        .select(
            F.col("a.pri").alias("pri"),
            F.col("a.week").cast("long").alias("week"),
            F.col("a.n").alias("n"),
            F.round(F.col("a.um").cast("double") / M.MICRO, 4).alias(
                "revenue"
            ),
            F.round(F.col("b.um").cast("double") / M.MICRO, 4).alias(
                "prev_revenue"
            ),
            F.round(
                (F.col("a.um") - F.col("b.um")).cast("double")
                / F.col("b.um").cast("double"),
                6,
            ).alias("wow_growth"),
        )
    )


@query(
    "q219_consistent_hash_shards",
    f"""
    WITH vn AS (
      SELECT s.s AS shard, v.v AS vnode,
             {_dk_hex8("md5('ring:' || CAST(s.s AS VARCHAR) || ':' || CAST(v.v AS VARCHAR))")}
               AS pos
      FROM generate_series(0, 7) AS s(s),
           generate_series(0, 15) AS v(v)
    ),
    keys AS (
      SELECT doc_id,
             {_dk_hex8("md5('key:' || CAST(doc_id AS VARCHAR))")} AS kpos
      FROM documents
    ),
    assign AS (
      SELECT k.doc_id,
             coalesce(
               (SELECT vn.shard FROM vn WHERE vn.pos >= k.kpos
                ORDER BY vn.pos, vn.shard LIMIT 1),
               (SELECT vn.shard FROM vn
                ORDER BY vn.pos, vn.shard LIMIT 1)) AS shard
      FROM keys k
    )
    SELECT CAST(shard AS BIGINT) AS shard,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(count(*) * 8.0 / (SELECT count(*) FROM documents), 4)
             AS load_factor
    FROM assign GROUP BY shard
    """,
)
def q219_consistent_hash_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consistent-hash ring sharding (8 shards x 16 virtual nodes):
    every key routes to the first vnode clockwise from its hash, and
    the per-shard load factor (1.0 = perfectly even) quantifies how
    well vnodes smooth the ring — the assignment that moves only
    ~1/(shards+1) of keys when a shard joins, vs rehash-everything for
    ``hash % n``. The ring is 128 rows and BROADCAST; each key finds
    its successor via a min-aggregate over matching ring positions
    (no per-key sort), so the corpus-scale side is one projection +
    one partial-agg shuffle on doc_id."""
    ring = (
        spark.range(8)
        .select(F.col("id").alias("shard"))
        .crossJoin(spark.range(16).select(F.col("id").alias("vnode")))
        .select(
            "shard",
            "vnode",
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("ring:"),
                            F.col("shard").cast("string"),
                            F.lit(":"),
                            F.col("vnode").cast("string"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            )
            .cast("long")
            .alias("pos"),
        )
    )
    d = load(spark, sf_dir, "documents")
    keys = d.select(
        "doc_id",
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("key:"), F.col("doc_id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        )
        .cast("long")
        .alias("kpos"),
    )
    # successor struct: min (pos, shard) among vnodes clockwise of kpos;
    # wrap-around falls back to the ring's global minimum (broadcast twice,
    # both ring-sized)
    succ = (
        keys.join(bcast_small(ring), F.col("pos") >= F.col("kpos"), "left")
        .groupBy("doc_id")
        .agg(
            F.min(F.struct("pos", "shard")).alias("nxt"),
        )
    )
    wrap = ring.agg(F.min(F.struct("pos", "shard")).alias("w0"))
    assign = succ.crossJoin(bcast_small(wrap)).select(
        "doc_id",
        F.coalesce(F.col("nxt.shard"), F.col("w0.shard")).alias("shard"),
    )
    nd = d.agg(F.count(F.lit(1)).alias("n"))
    return (
        assign.groupBy(F.col("shard").cast("long").alias("shard"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .crossJoin(bcast_small(nd))
        .select(
            "shard",
            "n_docs",
            F.round(F.col("n_docs") * 8.0 / F.col("n"), 4).alias(
                "load_factor"
            ),
        )
    )


@query(
    "q220_degree_assortativity",
    """
    WITH b AS (SELECT l_orderkey, l_partkey FROM lineitem
               GROUP BY l_orderkey, l_partkey),
    edges AS (
      SELECT a.l_partkey AS u, c.l_partkey AS v
      FROM b a JOIN b c
        ON a.l_orderkey = c.l_orderkey AND a.l_partkey < c.l_partkey
      GROUP BY 1, 2
    ),
    deg AS (
      SELECT node, CAST(count(*) AS BIGINT) AS d
      FROM (SELECT u AS node FROM edges
            UNION ALL SELECT v AS node FROM edges)
      GROUP BY node
    ),
    ends AS (
      SELECT du.d AS da, dv.d AS db FROM edges e
      JOIN deg du ON du.node = e.u
      JOIN deg dv ON dv.node = e.v
      UNION ALL
      SELECT dv.d AS da, du.d AS db FROM edges e
      JOIN deg du ON du.node = e.u
      JOIN deg dv ON dv.node = e.v
    )
    SELECT CAST((SELECT count(*) FROM edges) AS BIGINT) AS n_edges,
           CAST((SELECT count(*) FROM deg) AS BIGINT)   AS n_nodes,
           round(corr(da, db), 6) AS assortativity
    FROM ends
    """,
)
def q220_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the co-purchase graph (Newman r: Pearson
    correlation of endpoint degrees over the symmetrized edge list) —
    negative r means hubs attach to leaves (retail catalogs typically
    disassortative). Edges come from the bounded per-basket pair
    expansion (q151's argument); degrees are one count shuffle; the
    edge-degree join is two hash joins against a node-cardinality frame
    and the correlation is a single-pass moment aggregate. Symmetrizing
    via UNION ALL makes r orientation-independent without a second
    correlation pass."""
    li = load(spark, sf_dir, "lineitem")
    edges = (
        _basket_pairs(li)
        .distinct()
        # edges feeds SIX consumers (deg twice via the union, ej, ne,
        # and deg's two projections re-derive it again); Catalyst does
        # not share common subtrees, so without a barrier the basket
        # pair expansion + distinct re-ran for each — 13 lineitem scans
        # in the before-plan (r11). Same for deg (3 consumers) and ej
        # (the symmetrizing union reads it twice).
        .localCheckpoint(eager=False)
    )
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
        .localCheckpoint(eager=False)
    )
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    ej = edges.join(du, "u").join(dv, "v").localCheckpoint(eager=False)
    ends = ej.select(
        F.col("du").alias("da"), F.col("dv").alias("db")
    ).unionAll(ej.select(F.col("dv").alias("da"), F.col("du").alias("db")))
    ne = edges.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    nn = deg.agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
    r = ends.agg(F.round(F.corr("da", "db"), 6).alias("assortativity"))
    return ne.crossJoin(nn).crossJoin(r)


@query(
    "q221_contrastive_pair_audit",
    """
    WITH md AS (
      SELECT greatest(5, CAST(ceil(count(*) / 250.0) AS BIGINT)) AS m
      FROM embeddings
    ),
    m AS (
      SELECT vec_id, label, generate_subscripts(embedding, 1) AS i,
             CAST(unnest(embedding) AS DOUBLE) AS x
      FROM embeddings CROSS JOIN md WHERE vec_id % md.m = 0
    ),
    nrm AS (SELECT vec_id, sqrt(sum(x * x)) AS nn FROM m GROUP BY vec_id),
    u AS (SELECT m.vec_id, m.label, m.i, m.x / nrm.nn AS x
          FROM m JOIN nrm ON nrm.vec_id = m.vec_id WHERE nrm.nn > 0),
    pairs AS (
      SELECT a.vec_id AS va, a.label AS la, b.label AS lb,
             sum(a.x * b.x) AS cos
      FROM u a JOIN u b ON a.i = b.i AND a.vec_id < b.vec_id
      GROUP BY a.vec_id, a.label, b.vec_id, b.label
    )
    SELECT la AS label,
           CAST(sum(CASE WHEN la = lb THEN 1 ELSE 0 END) AS BIGINT)
             AS n_pos_pairs,
           CAST(sum(CASE WHEN la <> lb THEN 1 ELSE 0 END) AS BIGINT)
             AS n_neg_pairs,
           round(avg(CASE WHEN la = lb THEN cos END), 6)  AS avg_pos_cos,
           round(avg(CASE WHEN la <> lb THEN cos END), 6) AS avg_neg_cos,
           CAST(sum(CASE WHEN la <> lb AND cos > 0.5 THEN 1 ELSE 0 END)
                AS BIGINT) AS hard_negatives
    FROM pairs GROUP BY la
    """,
)
def q221_contrastive_pair_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive-training pair audit on a deterministic bounded probe
    slice (vec_id %% m == 0 with m = max(5, ceil(n/250)) — ~250 probes
    at ANY corpus size, the q146 adaptive-parameter pattern mirrored as
    an oracle scalar subquery): per anchor label, mean cosine of
    positive (same-label) vs negative (cross-label) pairs and the count
    of HARD negatives (cross-label cos > 0.5) — the numbers that decide
    temperature and negative-mining strategy before a contrastive run.
    Pair cosines are computed dim-wise through the (i)-join so the
    probe never materializes a vectors² x dim crossJoin, and the probe
    cap keeps the all-pairs audit CONSTANT-work as the corpus grows."""
    import math

    emb = load(spark, sf_dir, "embeddings")
    m = max(5, math.ceil(emb.count() / 250.0))
    e = (
        emb.filter(F.col("vec_id") % m == 0)
        .select(
            "vec_id", "label", F.posexplode("embedding").alias("i", "xf")
        )
        .select(
            "vec_id", "label", "i", F.col("xf").cast("double").alias("x")
        )
    )
    nrm = e.groupBy("vec_id").agg(
        F.sqrt(F.sum(F.col("x") * F.col("x"))).alias("nn")
    )
    u = (
        e.join(nrm, "vec_id")
        .filter(F.col("nn") > 0)
        .select("vec_id", "label", "i", (F.col("x") / F.col("nn")).alias("x"))
    )
    a = u.alias("a")
    b = u.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.i") == F.col("b.i"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .groupBy(
            F.col("a.vec_id").alias("va"),
            F.col("a.label").alias("la"),
            F.col("b.vec_id").alias("vb"),
            F.col("b.label").alias("lb"),
        )
        .agg(F.sum(F.col("a.x") * F.col("b.x")).alias("cos"))
    )
    pos = F.col("la") == F.col("lb")
    return pairs.groupBy(F.col("la").alias("label")).agg(
        F.sum(F.when(pos, 1).otherwise(0)).cast("long").alias("n_pos_pairs"),
        F.sum(F.when(~pos, 1).otherwise(0)).cast("long").alias("n_neg_pairs"),
        F.round(F.avg(F.when(pos, F.col("cos"))), 6).alias("avg_pos_cos"),
        F.round(F.avg(F.when(~pos, F.col("cos"))), 6).alias("avg_neg_cos"),
        F.sum(F.when((~pos) & (F.col("cos") > 0.5), 1).otherwise(0))
        .cast("long")
        .alias("hard_negatives"),
    )


@query(
    "q222_woe_iv",
    """
    WITH t AS (
      SELECT o_totalprice AS v,
             CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 ELSE 0 END AS y
      FROM orders
    ),
    r AS (
      SELECT v, y,
             row_number() OVER (ORDER BY v, y) AS rn,
             count(*) OVER () AS n
      FROM t
    ),
    binned AS (
      SELECT least(9, CAST(floor(((rn - 1) * 10.0) / n) AS BIGINT)) AS bin, y
      FROM r
    ),
    cells AS (
      SELECT bin,
             CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(y) AS BIGINT)   AS n_pos,
             CAST(sum(1 - y) AS BIGINT) AS n_neg
      FROM binned GROUP BY bin
    ),
    tot AS (SELECT CAST(sum(n_pos) AS DOUBLE) AS tp,
                   CAST(sum(n_neg) AS DOUBLE) AS tn FROM cells)
    SELECT bin, n_rows, n_pos, n_neg,
           round(ln((n_pos / tot.tp) / (n_neg / tot.tn)), 6) AS woe,
           round((n_pos / tot.tp - n_neg / tot.tn)
                 * ln((n_pos / tot.tp) / (n_neg / tot.tn)), 6) AS iv_term
    FROM cells CROSS JOIN tot
    """,
)
def q222_woe_iv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-evidence / information-value profile of order value
    against the high-priority target (the credit-scoring feature
    screen): equal-frequency decile bins from the DISTRIBUTED rank
    frame (``group_ranked`` — range-partitioned, no global window; bin
    = floor(10·(rank−1)/n) exactly as the oracle's row_number
    formulation), then WOE = ln(pos%%/neg%%) and the per-bin IV terms
    from exact integer cell counts. The only data-scale shuffle is the
    range partitioning; everything after the cell reduce is a 10-row
    frame."""
    from etl_jetro_spark.operators.aggregate import group_ranked

    o = load(spark, sf_dir, "orders")
    t = o.select(
        F.col("o_totalprice").alias("v"),
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)
        .otherwise(0)
        .alias("y"),
    )
    r = group_ranked(t, [], "v", tiebreak=["y"])
    binned = r.select(
        F.least(
            F.lit(9),
            F.floor((F.col("_rn") - 1) * 10 / F.col("_n")).cast("long"),
        ).alias("bin"),
        F.col("y"),
    )
    cells = binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("y").cast("long").alias("n_pos"),
        F.sum(1 - F.col("y")).cast("long").alias("n_neg"),
    )
    tot = cells.agg(
        F.sum("n_pos").cast("double").alias("tp"),
        F.sum("n_neg").cast("double").alias("tn"),
    )
    pr = F.col("n_pos") / F.col("tp")
    nr = F.col("n_neg") / F.col("tn")
    return cells.crossJoin(bcast_small(tot)).select(
        "bin",
        "n_rows",
        "n_pos",
        "n_neg",
        F.round(F.log(pr / nr), 6).alias("woe"),
        F.round((pr - nr) * F.log(pr / nr), 6).alias("iv_term"),
    )


@query(
    "q223_conversion_latency",
    """
    WITH v AS (SELECT user_id, min(ts) AS v_ts FROM events
               WHERE event_type = 'view' GROUP BY user_id),
    p AS (
      SELECT e.user_id,
             CAST(floor(epoch(min(e.ts))) AS BIGINT)
               - CAST(floor(epoch(v.v_ts)) AS BIGINT) AS lat_s
      FROM events e JOIN v ON v.user_id = e.user_id AND e.ts > v.v_ts
      WHERE e.event_type = 'purchase'
      GROUP BY e.user_id, v.v_ts
    )
    SELECT CAST(count(*) AS BIGINT) AS n_converted,
           round(quantile_cont(lat_s, 0.50), 6) AS p50_s,
           round(quantile_cont(lat_s, 0.90), 6) AS p90_s,
           round(quantile_cont(lat_s, 0.99), 6) AS p99_s,
           CAST(max(lat_s) AS BIGINT) AS max_s
    FROM p
    """,
)
def q223_conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """View-to-purchase conversion latency SLA: per user, seconds from
    first view to the first STRICTLY LATER purchase, summarized as
    exact p50/p90/p99 through the distributed range-partitioned
    percentile frame (``exact_group_percentiles`` — no value multiset
    ever collects in one task; linear interpolation matches DuckDB's
    quantile_cont bit-for-bit on integer-second latencies). The
    latency frame is user-cardinality-sized, but the operator is the
    same one that serves raw-row scale."""
    from etl_jetro_spark.functions.dates import epoch_seconds_ntz
    from etl_jetro_spark.operators.aggregate import exact_group_percentiles

    e = load_events(spark, sf_dir).select("user_id", "event_type", "ts", "ts_utc")
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(
            F.min("ts").alias("v_ts"),
            F.min(F.struct("ts", "ts_utc")).alias("vs"),
        )
        .select(
            "user_id", "v_ts", F.col("vs.ts_utc").alias("v_utc")
        )
    )
    p = (
        # first-view frame is user-keyed — data-scale — so plain join
        # (AQE broadcasts it only when it measures small; caught by the
        # broadcastlint growth rule at floor=50)
        e.filter(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("v_ts"))
        .groupBy("user_id", "v_utc")
        .agg(F.min(F.struct("ts", "ts_utc")).alias("ps"))
        .select(
            (
                epoch_seconds_ntz(F.col("ps.ts_utc"))
                - epoch_seconds_ntz(F.col("v_utc"))
            ).alias("lat_s")
        )
    )
    pct = exact_group_percentiles(
        p, [], "lat_s", {"p50_s": 0.50, "p90_s": 0.90, "p99_s": 0.99}
    ).select(
        F.round("p50_s", 6).alias("p50_s"),
        F.round("p90_s", 6).alias("p90_s"),
        F.round("p99_s", 6).alias("p99_s"),
    )
    stats = p.agg(
        F.count(F.lit(1)).cast("long").alias("n_converted"),
        F.max("lat_s").cast("long").alias("max_s"),
    )
    return stats.crossJoin(pct).select(
        "n_converted", "p50_s", "p90_s", "p99_s", "max_s"
    )


@query(
    "q224_hll_precision_sweep",
    f"""
    WITH ps(p, m) AS (VALUES (6, 64), (8, 256), (10, 1024)),
    h AS (
      SELECT {_dk_hex8("md5('hll:' || CAST(user_id AS VARCHAR))")} AS hv
      FROM (SELECT DISTINCT user_id FROM events)
    ),
    bw AS (
      SELECT ps.p, ps.m, h.hv % ps.m AS bucket, h.hv // ps.m AS w,
             CASE WHEN ps.p = 6 THEN 27 WHEN ps.p = 8 THEN 25 ELSE 23 END
               AS maxrho
      FROM h CROSS JOIN ps
    ),
    regs AS (
      SELECT p, m, bucket,
             max(CASE WHEN w = 0 THEN maxrho
                      ELSE maxrho - length(bin(w)) END) AS mm
      FROM bw GROUP BY p, m, bucket
    ),
    s AS (
      SELECT p, m,
             CAST(count(*) AS BIGINT) AS occ,
             sum(power(2.0, -mm))     AS s_occ
      FROM regs GROUP BY p, m
    ),
    est AS (
      SELECT p, m, m - occ AS v,
             (0.7213 / (1 + 1.079 / m)) * m * CAST(m AS DOUBLE)
               / (s_occ + (m - occ)) AS e_raw
      FROM s
    ),
    fin AS (
      SELECT p, m, v,
             CASE WHEN e_raw <= 2.5 * m AND v > 0
                  THEN m * ln(m / CAST(v AS DOUBLE)) ELSE e_raw END AS e
      FROM est
    ),
    ex AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS nd FROM events)
    SELECT CAST(fin.p AS BIGINT) AS p, CAST(fin.m AS BIGINT) AS m,
           ex.nd AS exact_ndv,
           round(fin.e, 4) AS estimate,
           round(abs(fin.e - ex.nd) / ex.nd, 6) AS rel_error,
           round(1.04 / sqrt(fin.m), 6) AS theoretical_rse
    FROM fin CROSS JOIN ex
    """,
)
def q224_hll_precision_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL precision sweep (p = 6/8/10 — 64/256/1024 registers) over
    the global distinct-user count, reporting each estimate's relative
    error against exact NDV next to the theoretical 1.04/sqrt(m) RSE —
    the table that justifies a register-budget choice before sketching
    a 100 TB keyspace. One hash pass fans out x3 via a broadcast
    parameter frame; each sketch is a (p, bucket) partial-agg — the
    whole sweep costs one shuffle of at most 3 x 1024 register rows
    past the map side. Rho uses the remaining 32-p hash bits via
    binary digit length (integer-exact on both engines); the
    small-range linear-counting branch applies per precision."""
    e = load(spark, sf_dir, "events").select("user_id").distinct()
    ps = spark.createDataFrame(
        [(6, 64, 27), (8, 256, 25), (10, 1024, 23)], ["p", "m", "maxrho"]
    )
    hv = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("hll:"), F.col("user_id").cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    bw = (
        e.select(hv.alias("hv"))
        .crossJoin(bcast_small(ps))
        .select(
            "p",
            "m",
            "maxrho",
            (F.col("hv") % F.col("m")).alias("bucket"),
            (F.col("hv") / F.col("m")).cast("long").alias("w"),
        )
    )
    regs = bw.groupBy("p", "m", "bucket").agg(
        F.max(
            F.when(F.col("w") == 0, F.col("maxrho")).otherwise(
                F.col("maxrho") - F.length(F.bin(F.col("w")))
            )
        ).alias("mm")
    )
    s = regs.groupBy("p", "m").agg(
        F.count(F.lit(1)).cast("long").alias("occ"),
        F.sum(F.pow(F.lit(2.0), -F.col("mm"))).alias("s_occ"),
    )
    est = s.select(
        "p",
        "m",
        (F.col("m") - F.col("occ")).alias("v"),
        (
            (0.7213 / (1 + 1.079 / F.col("m")))
            * F.col("m")
            * F.col("m").cast("double")
            / (F.col("s_occ") + (F.col("m") - F.col("occ")))
        ).alias("e_raw"),
    )
    fin = est.select(
        "p",
        "m",
        "v",
        F.when(
            (F.col("e_raw") <= 2.5 * F.col("m")) & (F.col("v") > 0),
            F.col("m") * F.log(F.col("m") / F.col("v").cast("double")),
        )
        .otherwise(F.col("e_raw"))
        .alias("e"),
    )
    ex = load(spark, sf_dir, "events").agg(
        F.countDistinct("user_id").cast("long").alias("nd")
    )
    return fin.crossJoin(bcast_small(ex)).select(
        F.col("p").cast("long").alias("p"),
        F.col("m").cast("long").alias("m"),
        F.col("nd").alias("exact_ndv"),
        F.round(F.col("e"), 4).alias("estimate"),
        F.round(F.abs(F.col("e") - F.col("nd")) / F.col("nd"), 6).alias(
            "rel_error"
        ),
        F.round(1.04 / F.sqrt(F.col("m")), 6).alias("theoretical_rse"),
    )


@query(
    "q225_two_hop_reach",
    """
    WITH b AS (SELECT l_orderkey, l_partkey FROM lineitem
               GROUP BY l_orderkey, l_partkey),
    e1 AS (
      SELECT a.l_partkey AS u, c.l_partkey AS v
      FROM b a JOIN b c
        ON a.l_orderkey = c.l_orderkey AND a.l_partkey <> c.l_partkey
      GROUP BY 1, 2
    ),
    d1 AS (SELECT u, CAST(count(*) AS BIGINT) AS direct FROM e1 GROUP BY u),
    seeds AS (SELECT u, direct FROM d1 ORDER BY direct DESC, u LIMIT 20),
    es AS (SELECT e1.u, e1.v FROM e1 JOIN seeds ON seeds.u = e1.u),
    hop2 AS (
      SELECT x.u, y.v AS w
      FROM es x JOIN e1 y ON y.u = x.v
      WHERE y.v <> x.u
      GROUP BY x.u, y.v
    ),
    r2 AS (
      SELECT h.u, CAST(count(*) AS BIGINT) AS reach2
      FROM (SELECT u, w FROM hop2
            EXCEPT SELECT u, v FROM es) h
      GROUP BY h.u
    )
    SELECT CAST(seeds.u AS BIGINT) AS item, seeds.direct,
           coalesce(r2.reach2, CAST(0 AS BIGINT)) AS new_at_2_hops,
           round(coalesce(r2.reach2, 0)
                 / CAST(seeds.direct AS DOUBLE), 6) AS expansion
    FROM seeds LEFT JOIN r2 ON r2.u = seeds.u
    ORDER BY seeds.direct DESC, seeds.u
    """,
)
def q225_two_hop_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-hop neighborhood expansion on the co-purchase graph for the
    top-20 highest-degree items: new items reachable at exactly 2 hops
    (friends-of-friends minus direct neighbors minus self) — the
    recommender-coverage number a 1-hop i2i table misses. CRITICAL
    scale shape: the seed set is chosen FIRST (TakeOrdered on the
    degree frame), so the hop join is seed-edges x edges — O(k·d·d)
    rows — never the full edge-list self-join, whose Σdeg² blowup this
    query's first draft hit at sf0.1 (72 s; 298 M intermediate rows on
    a dense co-purchase graph) and OOMed at sf1. Dedup is a key-only
    distinct; reach-for-everyone would instead cap intermediates via
    ``capped_index``."""
    li = load(spark, sf_dir, "lineitem")
    e1 = _basket_pairs(li, directed=True).distinct().localCheckpoint(
        eager=False
    )
    d1 = e1.groupBy("u").agg(F.count(F.lit(1)).cast("long").alias("direct"))
    seeds = d1.orderBy(F.desc("direct"), F.asc("u")).limit(20)
    es = e1.join(bcast_small(seeds.select("u")), "u").localCheckpoint(
        eager=False
    )
    g = es.alias("g")
    h = e1.alias("h")
    hop2 = (
        g.join(h, F.col("h.u") == F.col("g.v"))
        .filter(F.col("h.v") != F.col("g.u"))
        .select(F.col("g.u").alias("u"), F.col("h.v").alias("w"))
        .distinct()
    )
    new2 = hop2.join(
        es.select("u", F.col("v").alias("w")), ["u", "w"], "left_anti"
    )
    r2 = new2.groupBy("u").agg(
        F.count(F.lit(1)).cast("long").alias("reach2")
    )
    return (
        seeds.join(r2, "u", "left")
        .select(
            F.col("u").cast("long").alias("item"),
            "direct",
            F.coalesce("reach2", F.lit(0).cast("long")).alias(
                "new_at_2_hops"
            ),
            F.round(
                F.coalesce("reach2", F.lit(0))
                / F.col("direct").cast("double"),
                6,
            ).alias("expansion"),
        )
        .orderBy(F.desc("direct"), F.asc("item"))
    )


@query(
    "q226_cart_abandonment",
    """
    WITH c AS (
      SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS s,
             hour(ts) AS hr
      FROM events WHERE event_type = 'click'
    ),
    p AS (
      SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS s
      FROM events WHERE event_type = 'purchase'
    ),
    flagged AS (
      SELECT c.event_id, c.hr,
             max(CASE WHEN p.s > c.s AND p.s <= c.s + 3600
                      THEN 1 ELSE 0 END) AS converted
      FROM c LEFT JOIN p ON p.user_id = c.user_id
      GROUP BY c.event_id, c.hr
    )
    SELECT CAST(hr AS BIGINT) AS hour_of_day,
           CAST(count(*) AS BIGINT) AS n_clicks,
           CAST(sum(1 - coalesce(converted, 0)) AS BIGINT) AS n_abandoned,
           round(sum(1 - coalesce(converted, 0))
                 / CAST(count(*) AS DOUBLE), 6) AS abandonment_rate
    FROM flagged GROUP BY hr
    """,
)
def q226_cart_abandonment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cart abandonment by hour of day: a click converts only if the
    SAME user purchases within the following hour; everything else is
    abandoned. The click-purchase pairing is a per-user join (bounded
    per-user event counts; at 100 TB the same fixed 1 h window makes it
    a q205-style bucket equi-join with ±1-bucket replication instead of
    a user-wide theta join), reduced per click with a max-flag so
    multiple qualifying purchases count once. Hours use the wall-clock
    NTZ field on both engines."""
    e = load_events(spark, sf_dir)
    c = e.filter(F.col("event_type") == "click").select(
        "event_id",
        "user_id",
        (F.col("ts") / F.lit(1_000_000_000)).cast("long").alias("s"),
        F.hour("ts_utc").alias("hr"),
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id"),
        (F.col("ts") / F.lit(1_000_000_000)).cast("long").alias("ps"),
    )
    flagged = (
        c.join(p, "user_id", "left")
        .groupBy("event_id", "hr")
        .agg(
            F.max(
                F.when(
                    (F.col("ps") > F.col("s"))
                    & (F.col("ps") <= F.col("s") + 3600),
                    1,
                ).otherwise(0)
            ).alias("converted")
        )
    )
    return flagged.groupBy(
        F.col("hr").cast("long").alias("hour_of_day")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_clicks"),
        F.sum(1 - F.coalesce("converted", F.lit(0)))
        .cast("long")
        .alias("n_abandoned"),
        F.round(
            F.sum(1 - F.coalesce("converted", F.lit(0)))
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("abandonment_rate"),
    )


@query(
    "q227_binning_sse",
    """
    WITH t AS (SELECT o_totalprice AS v FROM orders),
    bounds AS (SELECT min(v) AS vmin, max(v) AS vmax,
                      CAST(count(*) AS BIGINT) AS n FROM t),
    width AS (
      SELECT least(9, CAST(floor((v - vmin) * 10.0
                                 / (vmax - vmin)) AS BIGINT)) AS bin, v
      FROM t CROSS JOIN bounds
    ),
    depth AS (
      SELECT least(9, CAST(floor(((row_number() OVER (ORDER BY v) - 1)
                                  * 10.0) / n) AS BIGINT)) AS bin, v
      FROM t CROSS JOIN bounds
    ),
    tss AS (
      SELECT sum(v * v) - sum(v) * sum(v) / CAST(count(*) AS DOUBLE) AS ss
      FROM t
    ),
    sw AS (
      SELECT sum(ssb) AS sse FROM (
        SELECT sum(v * v) - sum(v) * sum(v) / CAST(count(*) AS DOUBLE) AS ssb
        FROM width GROUP BY bin)
    ),
    sd AS (
      SELECT sum(ssb) AS sse FROM (
        SELECT sum(v * v) - sum(v) * sum(v) / CAST(count(*) AS DOUBLE) AS ssb
        FROM depth GROUP BY bin)
    )
    SELECT s.scheme, CAST(10 AS BIGINT) AS n_bins,
           round(s.r2, 6) AS variance_explained
    FROM (
      SELECT 'equi_width' AS scheme, 1 - sw.sse / tss.ss AS r2
      FROM sw CROSS JOIN tss
      UNION ALL
      SELECT 'equi_depth' AS scheme, 1 - sd.sse / tss.ss AS r2
      FROM sd CROSS JOIN tss
    ) s
    """,
)
def q227_binning_sse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram-quality duel: variance explained (1 − SSE/TSS) of
    10-bin equi-width vs equi-depth binning of order value — the number
    that tells an optimizer which bucketing serves range predicates
    better on a skewed column. All sums are closed-form moment
    aggregates (Σv, Σv², n per bin — fully map-side combinable);
    equi-depth bins come from the distributed rank frame (no global
    window); the output is a ratio of same-engine sums, so cross-engine
    float association cannot flip the 6-dp rounding."""
    from etl_jetro_spark.operators.aggregate import group_ranked

    o = load(spark, sf_dir, "orders")
    t = o.select(F.col("o_totalprice").alias("v"))
    bounds = t.agg(
        F.min("v").alias("vmin"),
        F.max("v").alias("vmax"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    width = t.crossJoin(bcast_small(bounds)).select(
        F.least(
            F.lit(9),
            F.floor(
                (F.col("v") - F.col("vmin"))
                * 10.0
                / (F.col("vmax") - F.col("vmin"))
            ).cast("long"),
        ).alias("bin"),
        "v",
    )
    r = group_ranked(t, [], "v")
    depth = r.select(
        F.least(
            F.lit(9),
            F.floor((F.col("_rn") - 1) * 10.0 / F.col("_n")).cast("long"),
        ).alias("bin"),
        F.col("_v").alias("v"),
    )

    def sse(df):
        per = df.groupBy("bin").agg(
            (
                F.sum(F.col("v") * F.col("v"))
                - F.sum("v") * F.sum("v") / F.count(F.lit(1)).cast("double")
            ).alias("ssb")
        )
        return per.agg(F.sum("ssb").alias("sse"))

    tss = t.agg(
        (
            F.sum(F.col("v") * F.col("v"))
            - F.sum("v") * F.sum("v") / F.count(F.lit(1)).cast("double")
        ).alias("ss")
    )
    sw = sse(width).crossJoin(tss).select(
        F.lit("equi_width").alias("scheme"),
        (1 - F.col("sse") / F.col("ss")).alias("r2"),
    )
    sd = sse(depth).crossJoin(tss).select(
        F.lit("equi_depth").alias("scheme"),
        (1 - F.col("sse") / F.col("ss")).alias("r2"),
    )
    return sw.unionAll(sd).select(
        "scheme",
        F.lit(10).cast("long").alias("n_bins"),
        F.round("r2", 6).alias("variance_explained"),
    )


@query(
    "q228_top_principal_component",
    """
    WITH e AS (
      SELECT vec_id, generate_subscripts(embedding, 1) AS i,
             CAST(unnest(embedding) AS DOUBLE) AS x
      FROM embeddings
    ),
    n AS (SELECT CAST(count(DISTINCT vec_id) AS DOUBLE) AS n FROM e),
    mu AS (SELECT i, avg(x) AS m FROM e GROUP BY i),
    cov AS (
      SELECT a.i AS i, b.i AS j,
             sum(a.x * b.x) / n.n - ma.m * mb.m AS c
      FROM e a
      JOIN e b ON b.vec_id = a.vec_id
      CROSS JOIN n
      JOIN mu ma ON ma.i = a.i
      JOIN mu mb ON mb.i = b.i
      GROUP BY a.i, b.i, n.n, ma.m, mb.m
    ),
    v0 AS (SELECT i, 0.125 AS v FROM mu),
    w1 AS (SELECT cov.i, sum(cov.c * v0.v) AS w
           FROM cov JOIN v0 ON v0.i = cov.j GROUP BY cov.i),
    v1 AS (SELECT i, w / (SELECT sqrt(sum(w * w)) FROM w1) AS v FROM w1),
    w2 AS (SELECT cov.i, sum(cov.c * v1.v) AS w
           FROM cov JOIN v1 ON v1.i = cov.j GROUP BY cov.i),
    v2 AS (SELECT i, w / (SELECT sqrt(sum(w * w)) FROM w2) AS v FROM w2),
    w3 AS (SELECT cov.i, sum(cov.c * v2.v) AS w
           FROM cov JOIN v2 ON v2.i = cov.j GROUP BY cov.i),
    lam AS (SELECT sqrt(sum(w * w)) AS l FROM w3),
    v3 AS (SELECT i, w / lam.l AS v FROM w3 CROSS JOIN lam)
    SELECT CAST(v3.i AS BIGINT) AS dim,
           round(v3.v, 6)       AS loading,
           round(lam.l, 6)      AS eigenvalue
    FROM v3 CROSS JOIN lam
    ORDER BY abs(v3.v) DESC, v3.i
    LIMIT 5
    """,
)
def q228_top_principal_component(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal component of the embedding cloud by THREE power
    iterations on the covariance matrix — distributed PCA without any
    linear-algebra library: C is a (dim x dim) moment aggregate (the
    only corpus-scale work — one self-join on vec_id bounded by dim²
    per vector), and each iteration is a C·v broadcast join over the
    4096-row matrix frame. Deterministic start (uniform 1/sqrt(64))
    pins the sign; top-5 |loading| dims + the Rayleigh eigenvalue
    estimate. At 100 TB the covariance pass dominates and is fully
    map-side combinable; iterations are metadata-scale."""
    e = (
        load(spark, sf_dir, "embeddings")
        .select("vec_id", F.posexplode("embedding").alias("i0", "xf"))
        .select(
            "vec_id",
            (F.col("i0") + 1).alias("i"),
            F.col("xf").cast("double").alias("x"),
        )
    )
    n = e.agg(F.countDistinct("vec_id").cast("double").alias("n"))
    mu = e.groupBy("i").agg(F.avg("x").alias("m"))
    a = e.alias("a")
    b = e.alias("b")
    raw = (
        a.join(b, F.col("b.vec_id") == F.col("a.vec_id"))
        .groupBy(F.col("a.i").alias("i"), F.col("b.i").alias("j"))
        .agg(F.sum(F.col("a.x") * F.col("b.x")).alias("sxx"))
    )
    ma = mu.select(F.col("i"), F.col("m").alias("ma"))
    mb = mu.select(F.col("i").alias("j"), F.col("m").alias("mb"))
    cov = (
        raw.crossJoin(bcast_small(n))
        .join(bcast_small(ma), "i")
        .join(bcast_small(mb), "j")
        .select(
            "i",
            "j",
            (F.col("sxx") / F.col("n") - F.col("ma") * F.col("mb")).alias(
                "c"
            ),
        )
        .localCheckpoint(eager=False)
    )
    v = mu.select("i", F.lit(0.125).alias("v"))
    lam = None
    for _ in range(3):
        w = (
            cov.join(
                bcast_small(v.select(F.col("i").alias("j"), "v")), "j"
            )
            .groupBy("i")
            .agg(F.sum(F.col("c") * F.col("v")).alias("w"))
        )
        nrm = w.agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("l"))
        v = w.crossJoin(bcast_small(nrm)).select(
            "i", (F.col("w") / F.col("l")).alias("v")
        )
        lam = nrm
    return (
        v.crossJoin(bcast_small(lam))
        .select(
            F.col("i").cast("long").alias("dim"),
            F.round("v", 6).alias("loading"),
            F.round("l", 6).alias("eigenvalue"),
        )
        .orderBy(F.abs(F.col("loading")).desc(), F.asc("dim"))
        .limit(5)
    )


@query(
    "q229_session_paths",
    """
    WITH e AS (
      SELECT user_id, event_id, event_type,
             CAST(floor(epoch(ts)) AS BIGINT) AS s
      FROM events
    ),
    g AS (
      SELECT user_id, event_id, event_type, s,
             CASE WHEN lag(s) OVER w IS NULL
                       OR s - lag(s) OVER w > 1800 THEN 1 ELSE 0 END AS brk
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY s, event_id)
    ),
    sid AS (
      SELECT user_id, event_id, event_type, s,
             sum(brk) OVER (PARTITION BY user_id ORDER BY s, event_id
                            ROWS UNBOUNDED PRECEDING) AS sess
      FROM g
    ),
    rn AS (
      SELECT user_id, sess, event_type,
             row_number() OVER (PARTITION BY user_id, sess
                                ORDER BY s, event_id) AS r
      FROM sid
    ),
    paths AS (
      SELECT user_id, sess,
             string_agg(event_type, '>' ORDER BY r) AS path
      FROM rn WHERE r <= 3 GROUP BY user_id, sess
    ),
    top AS (
      SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
      FROM paths GROUP BY path
    )
    SELECT path, n_sessions,
           round(n_sessions / CAST((SELECT count(*) FROM paths) AS DOUBLE), 6)
             AS share
    FROM top ORDER BY n_sessions DESC, path LIMIT 10
    """,
)
def q229_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top session-opening paths: the first three event types of every
    q208 session joined as 'a>b>c', ranked by frequency — the sequence-
    mining readout that shows how journeys actually start. Session
    assembly is the q208 partitioned-window machinery; path strings
    come from an order-pinned aggregate (rank-struct sort, no
    collect_list order luck); top-10 is a TakeOrdered over the
    path-cardinality frame."""
    from pyspark.sql import Window

    e = load_events(spark, sf_dir).select(
        "user_id",
        "event_id",
        "event_type",
        (F.col("ts") / F.lit(1_000_000_000)).cast("long").alias("s"),
    )
    w = Window.partitionBy("user_id").orderBy("s", "event_id")
    g = e.withColumn(
        "brk",
        F.when(
            F.lag("s").over(w).isNull()
            | ((F.col("s") - F.lag("s").over(w)) > 1800),
            1,
        ).otherwise(0),
    )
    sid = g.withColumn(
        "sess", F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    ws = Window.partitionBy("user_id", "sess").orderBy("s", "event_id")
    rn = sid.withColumn("r", F.row_number().over(ws)).filter(F.col("r") <= 3)
    paths = rn.groupBy("user_id", "sess").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("r", "event_type"))
                ),
                lambda x: x["event_type"],
            ),
            ">",
        ).alias("path")
    )
    npaths = paths.agg(F.count(F.lit(1)).cast("double").alias("np"))
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).cast("long").alias("n_sessions"))
        .crossJoin(bcast_small(npaths))
        .select(
            "path",
            "n_sessions",
            F.round(F.col("n_sessions") / F.col("np"), 6).alias("share"),
        )
        .orderBy(F.desc("n_sessions"), F.asc("path"))
        .limit(10)
    )


@query(
    "q230_median_imputation",
    """
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events WHERE value IS NOT NULL GROUP BY event_type
    ),
    stats AS (
      SELECT e.event_type,
             CAST(count(*) AS BIGINT) AS n_total,
             CAST(sum(CASE WHEN e.value IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_null,
             sum(coalesce(e.value, 0))  AS s,
             max(med.med)               AS med
      FROM events e JOIN med ON med.event_type = e.event_type
      GROUP BY e.event_type
    )
    SELECT event_type, n_total, n_null,
           round(med, 6) AS imputed_value,
           round(s / (n_total - n_null), 6)       AS mean_before,
           round((s + n_null * med) / n_total, 6) AS mean_after
    FROM stats
    """,
)
def q230_median_imputation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median imputation audit for the nullable value column: per event
    type, the exact median of non-null values (distributed
    range-partitioned percentile — no per-group multiset ever
    collects), null counts, and the mean before/after filling nulls
    with the median — the drift report a feature pipeline emits before
    committing an imputation rule. The medians frame is
    type-cardinality-sized and broadcast back; the corpus is scanned
    once for moments."""
    from etl_jetro_spark.operators.aggregate import exact_group_percentiles

    e = load_events(spark, sf_dir).select("event_type", "value")
    med = exact_group_percentiles(
        e.filter(F.col("value").isNotNull()),
        ["event_type"],
        "value",
        {"med": 0.5},
    )
    stats = (
        e.join(bcast_small(med), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_total"),
            F.sum(F.when(F.col("value").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_null"),
            F.sum(F.coalesce("value", F.lit(0))).alias("s"),
            F.max("med").alias("med"),
        )
    )
    return stats.select(
        "event_type",
        "n_total",
        "n_null",
        F.round("med", 6).alias("imputed_value"),
        F.round(
            F.col("s") / (F.col("n_total") - F.col("n_null")), 6
        ).alias("mean_before"),
        F.round(
            (F.col("s") + F.col("n_null") * F.col("med")) / F.col("n_total"),
            6,
        ).alias("mean_after"),
    )


@query(
    "q231_langid_confusion",
    f"""
    WITH hits AS (
      SELECT doc_id, lang,
             len(list_filter(string_split({DK_NORM_TEXT}, ' '),
                             x -> list_contains({_dk_stop_list('en')}, x))) AS h_en,
             len(list_filter(string_split({DK_NORM_TEXT}, ' '),
                             x -> list_contains({_dk_stop_list('es')}, x))) AS h_es,
             len(list_filter(string_split({DK_NORM_TEXT}, ' '),
                             x -> list_contains({_dk_stop_list('de')}, x))) AS h_de,
             len(list_filter(string_split({DK_NORM_TEXT}, ' '),
                             x -> list_contains({_dk_stop_list('fr')}, x))) AS h_fr
      FROM documents
    ),
    pred AS (
      SELECT doc_id, lang,
             CASE
               WHEN greatest(h_en, h_es, h_de, h_fr) = 0 THEN 'und'
               WHEN h_en = greatest(h_en, h_es, h_de, h_fr) THEN 'en'
               WHEN h_es = greatest(h_en, h_es, h_de, h_fr) THEN 'es'
               WHEN h_de = greatest(h_en, h_es, h_de, h_fr) THEN 'de'
               ELSE 'fr'
             END AS predicted
      FROM hits
    ),
    decl AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_decl
             FROM pred GROUP BY lang)
    SELECT p.lang AS declared, p.predicted,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(count(*) / CAST(d.n_decl AS DOUBLE), 6) AS recall_share
    FROM pred p JOIN decl d ON d.lang = p.lang
    GROUP BY p.lang, p.predicted, d.n_decl
    """,
)
def q231_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID confusion matrix: the declared ``lang`` column vs
    the stopword-heuristic detector (q25's ``lang_id``), with per-cell
    recall share of the declared language — the audit that decides
    whether declared labels or the detector gate the training mix.
    Detection is partition-local expression work (no shuffle); the
    matrix reduce is |langs|²-bounded; declared totals broadcast
    back."""
    d = load(spark, sf_dir, "documents")
    pred = d.select(
        F.col("lang").alias("declared"),
        O.lang_id("text").alias("predicted"),
    )
    decl = pred.groupBy("declared").agg(
        F.count(F.lit(1)).cast("long").alias("n_decl")
    )
    return (
        pred.groupBy("declared", "predicted")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .join(bcast_small(decl), "declared")
        .select(
            "declared",
            "predicted",
            "n_docs",
            F.round(
                F.col("n_docs") / F.col("n_decl").cast("double"), 6
            ).alias("recall_share"),
        )
    )


@query(
    "q232_changepoint_detection",
    f"""
    WITH daily AS (
      SELECT CAST(floor(epoch(o_orderdate)) AS BIGINT) // 86400 AS day,
             CAST({sql_exact_money_sum('o_totalprice', dp=0)}
                  AS BIGINT) AS x
      FROM orders GROUP BY 1
    ),
    cum AS (
      SELECT day, x,
             row_number() OVER w                      AS k,
             sum(x)     OVER w                        AS sx,
             sum(CAST(x AS HUGEINT) * x) OVER w       AS sxx,
             (SELECT CAST(count(*) AS BIGINT) FROM daily)  AS n,
             (SELECT CAST(sum(x) AS BIGINT) FROM daily)    AS tx,
             (SELECT sum(CAST(x AS HUGEINT) * x) FROM daily) AS txx
      FROM daily WINDOW w AS (ORDER BY day ROWS UNBOUNDED PRECEDING)
    ),
    cand AS (
      SELECT day, k, n,
             (CAST(txx AS DOUBLE) - CAST(tx AS DOUBLE) * tx / n)
               - ((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / k)
                  + (CAST(txx - sxx AS DOUBLE)
                     - CAST(tx - sx AS DOUBLE) * (tx - sx)
                     / (n - k))) AS reduction,
             CAST(sx AS DOUBLE) / k                   AS mean_left,
             CAST(tx - sx AS DOUBLE) / (n - k)        AS mean_right,
             CAST(txx AS DOUBLE) - CAST(tx AS DOUBLE) * tx / n AS tss
      FROM cum WHERE k < n
    )
    SELECT DATE '1970-01-01' + CAST(day AS INTEGER) AS split_day,
           CAST(k AS BIGINT)       AS n_days_left,
           CAST(n - k AS BIGINT)   AS n_days_right,
           round(mean_left, 4)     AS mean_left,
           round(mean_right, 4)    AS mean_right,
           round(reduction / tss, 6) AS variance_reduction
    FROM cand ORDER BY reduction DESC, day LIMIT 1
    """,
)
def q232_changepoint_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single best change-point in the daily revenue series: the split
    day maximizing the between-segment SSE reduction, from EXACT
    wide-integer prefix moments (daily revenue rounds to whole units;
    squared sums ride decimal(38)/HUGEINT — Σx² overflows int64 at sf1,
    caught by the rehearsal — so no float-association drift or overflow
    can flip the argmax between near-tied candidates; doubles appear
    only in the final SSE arithmetic, identically on both engines). Prefix
    sums run through the q213 distributed-cumsum idiom (range
    partition + local window + bounded pid-offset frame); the argmax
    is a TakeOrdered over the day-NDV candidate frame."""
    from pyspark.sql import Window

    o = load(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.expr(
            "cast(unix_date(cast(o_orderdate as date)) as bigint)"
        ).alias("day")
    ).agg(
        # micro-dollar row quantization: a raw float day-sum can land
        # within ulps of a .5 whole-dollar boundary and round apart
        # between engines (30x gate); the exact integer sum cannot
        F.round(M.sum_micro("o_totalprice").cast("double") / M.MICRO)
        .cast("long")
        .alias("x")
    )
    nparts = max(spark.sparkContext.defaultParallelism, 8)
    base = (
        daily.repartitionByRange(nparts, "day")
        .sortWithinPartitions("day")
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    wl = (
        Window.partitionBy("_pid")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    loc = base.select(
        "_pid",
        "day",
        F.count(F.lit(1)).over(wl).alias("lk"),
        F.sum("x").over(wl).alias("lsx"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x"))
        .over(wl)
        .alias("lsxx"),
    )
    pidtot = base.groupBy("_pid").agg(
        F.count(F.lit(1)).alias("tk"),
        F.sum("x").alias("tsx"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x")).alias("tsxx"),
    )
    woff = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, 0)
    off = pidtot.select(
        "_pid",
        (F.sum("tk").over(woff) - F.col("tk")).alias("ok"),
        (F.sum("tsx").over(woff) - F.col("tsx")).alias("osx"),
        (F.sum("tsxx").over(woff) - F.col("tsxx")).alias("osxx"),
    )
    tot = daily.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("tx"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x")).alias("txx"),
    )
    cum = (
        loc.join(bcast_small(off), "_pid")
        .select(
            "day",
            (F.col("lk") + F.col("ok")).alias("k"),
            (F.col("lsx") + F.col("osx")).alias("sx"),
            (F.col("lsxx") + F.col("osxx")).alias("sxx"),
        )
        .crossJoin(bcast_small(tot))
        .filter(F.col("k") < F.col("n"))
    )
    tss = F.col("txx").cast("double") - F.col("tx").cast("double") * F.col(
        "tx"
    ) / F.col("n")
    lss = F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col(
        "sx"
    ) / F.col("k")
    rss = (F.col("txx") - F.col("sxx")).cast("double") - (
        F.col("tx") - F.col("sx")
    ).cast("double") * (F.col("tx") - F.col("sx")) / (F.col("n") - F.col("k"))
    cand = cum.select(
        "day",
        "k",
        "n",
        (tss - (lss + rss)).alias("reduction"),
        (F.col("sx").cast("double") / F.col("k")).alias("mean_left"),
        (
            (F.col("tx") - F.col("sx")).cast("double")
            / (F.col("n") - F.col("k"))
        ).alias("mean_right"),
        tss.alias("tss"),
    )
    return (
        cand.orderBy(F.desc("reduction"), F.asc("day"))
        .limit(1)
        .select(
            F.date_add(
                F.lit("1970-01-01").cast("date"),
                F.col("day").cast("int"),
            ).alias("split_day"),
            F.col("k").cast("long").alias("n_days_left"),
            (F.col("n") - F.col("k")).cast("long").alias("n_days_right"),
            F.round("mean_left", 4).alias("mean_left"),
            F.round("mean_right", 4).alias("mean_right"),
            F.round(F.col("reduction") / F.col("tss"), 6).alias(
                "variance_reduction"
            ),
        )
    )


@query(
    "q233_ab_power_analysis",
    """
    WITH m AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             sum(value)               AS s,
             sum(value * value)       AS ss
      FROM events WHERE value IS NOT NULL GROUP BY event_type
    ),
    v AS (
      SELECT event_type, n,
             s / n AS mean,
             (ss - s * s / CAST(n AS DOUBLE)) / (n - 1) AS var
      FROM m WHERE n > 1
    )
    SELECT event_type, n,
           round(mean, 6) AS mean,
           round(var, 6)  AS variance,
           round(0.05 * mean, 6) AS mde,
           CAST(ceil(16.0 * var / (0.05 * mean * 0.05 * mean)) AS BIGINT)
             AS n_per_arm,
           ceil(16.0 * var / (0.05 * mean * 0.05 * mean)) * 2 <= n
             AS feasible_now
    FROM v
    """,
)
def q233_ab_power_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B sample-size calculator per event type: n per arm =
    16·σ²/MDE² (the standard α=0.05 / 80%-power rule of thumb) for a
    minimum detectable effect of 5% of the metric mean, plus whether
    the CURRENT traffic could already power that test. One moment
    aggregate per type — the variance comes from closed-form sums, so
    the whole calculator is a single partial-agg pass at any scale —
    the planning step that belongs next to the q160 Welch readout and
    q161 CUPED."""
    e = load_events(spark, sf_dir).filter(F.col("value").isNotNull())
    m = e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("value").alias("s"),
        F.sum(F.col("value") * F.col("value")).alias("ss"),
    )
    v = m.filter(F.col("n") > 1).select(
        "event_type",
        "n",
        (F.col("s") / F.col("n")).alias("mean"),
        (
            (F.col("ss") - F.col("s") * F.col("s") / F.col("n").cast("double"))
            / (F.col("n") - 1)
        ).alias("var"),
    )
    npa = F.ceil(
        16.0 * F.col("var") / (0.05 * F.col("mean") * 0.05 * F.col("mean"))
    )
    return v.select(
        "event_type",
        "n",
        F.round("mean", 6).alias("mean"),
        F.round("var", 6).alias("variance"),
        F.round(0.05 * F.col("mean"), 6).alias("mde"),
        npa.cast("long").alias("n_per_arm"),
        (npa * 2 <= F.col("n")).alias("feasible_now"),
    )


@query(
    "q234_template_dedup",
    f"""
    WITH t AS (
      SELECT doc_id,
             md5(regexp_replace({DK_NORM_TEXT}, '[0-9]+', '#', 'g')) AS fp
      FROM documents
    ),
    g AS (SELECT fp, CAST(count(*) AS BIGINT) AS n FROM t GROUP BY fp)
    SELECT CAST((SELECT count(*) FROM t) AS BIGINT)  AS n_docs,
           CAST(count(*) AS BIGINT)                  AS n_templates,
           CAST(sum(CASE WHEN n >= 2 THEN n ELSE 0 END) AS BIGINT)
             AS boilerplate_docs,
           round(sum(CASE WHEN n >= 2 THEN n ELSE 0 END)
                 / CAST((SELECT count(*) FROM t) AS DOUBLE), 6)
             AS boilerplate_frac,
           CAST(max(n) AS BIGINT)                    AS max_template_group
    FROM g
    """,
)
def q234_template_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Template-level (boilerplate) duplication audit: documents
    collapse to a fingerprint of their normalized text with digit runs
    masked to '#' — catching near-identical form letters / generated
    pages that exact dedup (q17) misses because only the numbers
    differ. One fingerprint shuffle; the summary reduce reports how
    much of the corpus is template-cloned and the largest clone family
    — the CCNet/C4-style boilerplate gate before training."""
    from etl_jetro_spark.functions.hashing import norm_text

    d = load(spark, sf_dir, "documents")
    t = d.select(
        F.md5(
            F.regexp_replace(norm_text("text"), "[0-9]+", "#")
        ).alias("fp")
    )
    g = t.groupBy("fp").agg(F.count(F.lit(1)).cast("long").alias("n"))
    nd = t.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    return (
        g.agg(
            F.count(F.lit(1)).cast("long").alias("n_templates"),
            F.sum(F.when(F.col("n") >= 2, F.col("n")).otherwise(0))
            .cast("long")
            .alias("boilerplate_docs"),
            F.max("n").cast("long").alias("max_template_group"),
        )
        .crossJoin(bcast_small(nd))
        .select(
            "n_docs",
            "n_templates",
            "boilerplate_docs",
            F.round(
                F.col("boilerplate_docs") / F.col("n_docs").cast("double"), 6
            ).alias("boilerplate_frac"),
            "max_template_group",
        )
    )


@query(
    "q235_join_size_estimate",
    """
    WITH kc AS (
      SELECT l_partkey, CAST(count(*) AS BIGINT) AS c
      FROM lineitem GROUP BY l_partkey
    ),
    tot AS (
      SELECT CAST(sum(c) AS BIGINT)   AS n_rows,
             CAST(count(*) AS BIGINT) AS ndv,
             CAST(sum(c * c) AS BIGINT) AS actual
      FROM kc
    ),
    top AS (
      SELECT c FROM kc ORDER BY c DESC, l_partkey LIMIT 100
    ),
    hyb AS (
      SELECT CAST(sum(c * c) AS BIGINT) AS top_exact,
             CAST(sum(c) AS BIGINT)     AS top_rows,
             CAST(count(*) AS BIGINT)   AS top_k
      FROM top
    )
    SELECT tot.n_rows, tot.ndv, tot.actual,
           round(CAST(tot.n_rows AS DOUBLE) * tot.n_rows / tot.ndv, 4)
             AS uniform_est,
           round(hyb.top_exact
                 + CASE WHEN tot.ndv > hyb.top_k
                        THEN CAST(tot.n_rows - hyb.top_rows AS DOUBLE)
                             * (tot.n_rows - hyb.top_rows)
                             / (tot.ndv - hyb.top_k)
                        ELSE 0 END, 4) AS hybrid_est,
           round(CAST(tot.n_rows AS DOUBLE) * tot.n_rows / tot.ndv
                 / tot.actual, 6) AS uniform_err_ratio,
           round((hyb.top_exact
                  + CASE WHEN tot.ndv > hyb.top_k
                         THEN CAST(tot.n_rows - hyb.top_rows AS DOUBLE)
                              * (tot.n_rows - hyb.top_rows)
                              / (tot.ndv - hyb.top_k)
                         ELSE 0 END) / tot.actual, 6) AS hybrid_err_ratio
    FROM tot CROSS JOIN hyb
    """,
)
def q235_join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-cardinality estimation audit for the part-key self-join:
    exact output size Σc² (what the join WOULD produce) vs the
    uniform-NDV estimate n²/ndv every naive optimizer uses vs a
    heavy-hitter hybrid (top-100 keys exact + uniform remainder — the
    end-biased-histogram design). Everything derives from ONE per-key
    count frame: totals are a partial agg, the top-100 is a
    TakeOrdered, and no join ever executes — which is the point: this
    is the pre-flight that decides whether q187's skew mitigation is
    needed before shuffling 100 TB."""
    li = load(spark, sf_dir, "lineitem")
    kc = li.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    tot = kc.agg(
        F.sum("c").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("ndv"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("actual"),
    )
    top = kc.orderBy(F.desc("c"), F.asc("l_partkey")).limit(100)
    hyb = top.agg(
        F.sum(F.col("c") * F.col("c")).cast("long").alias("top_exact"),
        F.sum("c").cast("long").alias("top_rows"),
        F.count(F.lit(1)).cast("long").alias("top_k"),
    )
    rem = F.when(
        F.col("ndv") > F.col("top_k"),
        (F.col("n_rows") - F.col("top_rows")).cast("double")
        * (F.col("n_rows") - F.col("top_rows"))
        / (F.col("ndv") - F.col("top_k")),
    ).otherwise(F.lit(0.0))
    uni = F.col("n_rows").cast("double") * F.col("n_rows") / F.col("ndv")
    return tot.crossJoin(hyb).select(
        "n_rows",
        "ndv",
        "actual",
        F.round(uni, 4).alias("uniform_est"),
        F.round(F.col("top_exact") + rem, 4).alias("hybrid_est"),
        F.round(uni / F.col("actual"), 6).alias("uniform_err_ratio"),
        F.round(
            (F.col("top_exact") + rem) / F.col("actual"), 6
        ).alias("hybrid_err_ratio"),
    )


@query(
    "q236_bfs_frontier",
    """
    WITH b AS (SELECT l_orderkey, l_partkey FROM lineitem
               GROUP BY l_orderkey, l_partkey),
    e1 AS (
      SELECT a.l_partkey AS u, c.l_partkey AS v
      FROM b a JOIN b c
        ON a.l_orderkey = c.l_orderkey AND a.l_partkey <> c.l_partkey
      GROUP BY 1, 2
    ),
    deg AS (SELECT u, CAST(count(*) AS BIGINT) AS d FROM e1 GROUP BY u),
    seed AS (SELECT u FROM deg ORDER BY d DESC, u LIMIT 1),
    f1 AS (SELECT DISTINCT e1.v FROM e1 JOIN seed ON seed.u = e1.u
           WHERE e1.v NOT IN (SELECT u FROM seed)),
    vis1 AS (SELECT u FROM seed UNION SELECT v FROM f1),
    f2 AS (SELECT DISTINCT e1.v FROM e1 JOIN f1 ON f1.v = e1.u
           WHERE e1.v NOT IN (SELECT u FROM vis1)),
    vis2 AS (SELECT u FROM vis1 UNION SELECT v FROM f2),
    f3 AS (SELECT DISTINCT e1.v FROM e1 JOIN f2 ON f2.v = e1.u
           WHERE e1.v NOT IN (SELECT u FROM vis2))
    SELECT r.round,
           CASE r.round
             WHEN 1 THEN (SELECT CAST(count(*) AS BIGINT) FROM f1)
             WHEN 2 THEN (SELECT CAST(count(*) AS BIGINT) FROM f2)
             ELSE (SELECT CAST(count(*) AS BIGINT) FROM f3) END AS frontier,
           CASE r.round
             WHEN 1 THEN (SELECT CAST(count(*) AS BIGINT) FROM vis1)
             WHEN 2 THEN (SELECT CAST(count(*) AS BIGINT) FROM vis2)
             ELSE (SELECT CAST(count(*) AS BIGINT) FROM vis2)
                  + (SELECT CAST(count(*) AS BIGINT) FROM f3) END AS visited
    FROM (SELECT 1 AS round UNION ALL SELECT 2 UNION ALL SELECT 3) r
    """,
)
def q236_bfs_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three synchronous BFS rounds from the highest-degree item of the
    co-purchase graph — the Pregel frontier-expansion shape (next to
    PageRank q178 and connected components q60): each round is ONE hash
    join frontier⋈edges plus an anti-join against the visited set; the
    frontier/visited frames are node-keyed and checkpointed per round
    to bound lineage. Frontier sizes per round quantify graph
    expansion (the 'how fast does a recommendation crawl saturate'
    number)."""
    li = load(spark, sf_dir, "lineitem")
    return _bfs3_frontier_counts(li)


def _bfs3_frontier_counts(li: DataFrame) -> DataFrame:
    """q236's three synchronous BFS rounds over the co-purchase graph of
    whatever lineitem slice is passed in — shared by the full-graph
    q236 and the sliced 30x gate q389 so the sliced oracle verifies the
    IDENTICAL engine path."""
    e1 = _basket_pairs(li, directed=True).distinct().localCheckpoint(
        eager=False
    )
    deg = e1.groupBy("u").agg(F.count(F.lit(1)).cast("long").alias("d"))
    seed = (
        deg.orderBy(F.desc("d"), F.asc("u")).limit(1).select("u")
    )
    # Frontiers are DISJOINT by construction (each round anti-joins the
    # running visited set), so visited counts are prefix sums of
    # frontier counts — no per-round visited materialization or count
    # jobs; each round costs one checkpointed join job.
    frontier = seed
    visited = seed
    fcounts = []
    for _ in range(3):
        # frontier/visited grow with the reachable set — toward the
        # whole vertex universe from a high-degree seed — so NO forced
        # broadcast: both joins hash-partition on u (edges are already
        # keyed on u, so the exchange is reused across rounds) and AQE
        # still broadcasts a frontier that measures small (r5 verdict)
        nxt = (
            e1.join(frontier, "u")
            .select(F.col("v").alias("u"))
            .distinct()
            .join(visited, "u", "left_anti")
            .localCheckpoint(eager=False)
        )
        visited = visited.unionAll(nxt)
        frontier = nxt
        fcounts.append(
            nxt.agg(F.count(F.lit(1)).cast("long").alias("f"))
        )
    j = (
        fcounts[0]
        .crossJoin(fcounts[1].select(F.col("f").alias("f2")))
        .crossJoin(fcounts[2].select(F.col("f").alias("f3")))
        .localCheckpoint(eager=False)
    )
    rows = [
        j.select(
            F.lit(1).cast("long").alias("round"),
            F.col("f").alias("frontier"),
            (F.col("f") + 1).cast("long").alias("visited"),
        ),
        j.select(
            F.lit(2).cast("long").alias("round"),
            F.col("f2").alias("frontier"),
            (F.col("f") + F.col("f2") + 1).cast("long").alias("visited"),
        ),
        j.select(
            F.lit(3).cast("long").alias("round"),
            F.col("f3").alias("frontier"),
            (F.col("f") + F.col("f2") + F.col("f3") + 1)
            .cast("long")
            .alias("visited"),
        ),
    ]
    return rows[0].unionAll(rows[1]).unionAll(rows[2])


@query(
    "q237_srm_check",
    """
    WITH arms AS (
      SELECT event_type, user_id,
             CASE WHEN (strpos('0123456789abcdef',
                               substr(md5('ab:' || CAST(user_id AS VARCHAR)),
                                      1, 1)) - 1) % 2 = 0
                  THEN 'A' ELSE 'B' END AS arm
      FROM events GROUP BY event_type, user_id
    ),
    c AS (
      SELECT event_type,
             CAST(sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS na,
             CAST(sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS nb
      FROM arms GROUP BY event_type
    )
    SELECT event_type, na, nb,
           round(CAST((na - nb) AS DOUBLE) * (na - nb) / (na + nb), 6)
             AS chi2,
           CAST((na - nb) AS DOUBLE) * (na - nb) / (na + nb) > 3.841
             AS srm_detected
    FROM c
    """,
)
def q237_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch guardrail for the q160 experiment: per
    event surface, distinct users per arm under the SAME md5 assignment
    q160 uses, with the 1-df chi-square against the expected 50/50
    split (3.841 = alpha 0.05 critical value) — the first check any
    experiment readout must pass before its p-values mean anything.
    One distinct-user shuffle; the chi-square is arithmetic on a
    type-sized frame."""
    e = load(spark, sf_dir, "events")
    arm = F.when(
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("ab:"), F.col("user_id").cast("string")
                        )
                    ),
                    1,
                    1,
                ),
                16,
                10,
            ).cast("long")
            % 2
        )
        == 0,
        "A",
    ).otherwise("B")
    arms = e.select("event_type", "user_id", arm.alias("arm")).distinct()
    c = arms.groupBy("event_type").agg(
        F.sum(F.when(F.col("arm") == "A", 1).otherwise(0))
        .cast("long")
        .alias("na"),
        F.sum(F.when(F.col("arm") == "B", 1).otherwise(0))
        .cast("long")
        .alias("nb"),
    )
    chi2 = (
        (F.col("na") - F.col("nb")).cast("double")
        * (F.col("na") - F.col("nb"))
        / (F.col("na") + F.col("nb"))
    )
    return c.select(
        "event_type",
        "na",
        "nb",
        F.round(chi2, 6).alias("chi2"),
        (chi2 > 3.841).alias("srm_detected"),
    )


@query(
    "q238_cov_isotropy",
    """
    WITH e AS (
      SELECT vec_id, generate_subscripts(embedding, 1) AS i,
             CAST(unnest(embedding) AS DOUBLE) AS x
      FROM embeddings
    ),
    n AS (SELECT CAST(count(DISTINCT vec_id) AS DOUBLE) AS n FROM e),
    mu AS (SELECT i, avg(x) AS m FROM e GROUP BY i),
    cov AS (
      SELECT a.i AS i, b.i AS j,
             sum(a.x * b.x) / n.n - ma.m * mb.m AS c
      FROM e a
      JOIN e b ON b.vec_id = a.vec_id
      CROSS JOIN n
      JOIN mu ma ON ma.i = a.i
      JOIN mu mb ON mb.i = b.i
      GROUP BY a.i, b.i, n.n, ma.m, mb.m
    )
    SELECT CAST(64 AS BIGINT) AS dim,
           round(sum(CASE WHEN i = j THEN c ELSE 0 END), 6) AS trace,
           round(sum(CASE WHEN i = j THEN c ELSE 0 END) / 64, 6)
             AS mean_variance,
           round(sqrt(sum(CASE WHEN i <> j THEN c * c ELSE 0 END)), 6)
             AS offdiag_frobenius,
           round(sum(CASE WHEN i <> j THEN c * c ELSE 0 END)
                 / sum(c * c), 6) AS offdiag_energy_frac,
           round(max(CASE WHEN i = j THEN c END)
                 / (sum(CASE WHEN i = j THEN c ELSE 0 END) / 64), 6)
             AS max_var_ratio
    FROM cov
    """,
)
def q238_cov_isotropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space isotropy audit: trace, off-diagonal covariance
    energy, and the max-variance/mean-variance ratio of the dim×dim
    covariance — the whitening-need diagnostic (anisotropic embeddings
    degrade cosine retrieval; Ethayarajh'19). Same bounded covariance
    pass as q228 (dim²-per-vector moment aggregate, fully map-side
    combinable); the readout reduces the 4096-row matrix frame to one
    row."""
    e = (
        load(spark, sf_dir, "embeddings")
        .select("vec_id", F.posexplode("embedding").alias("i0", "xf"))
        .select(
            "vec_id",
            (F.col("i0") + 1).alias("i"),
            F.col("xf").cast("double").alias("x"),
        )
    )
    n = e.agg(F.countDistinct("vec_id").cast("double").alias("n"))
    mu = e.groupBy("i").agg(F.avg("x").alias("m"))
    a = e.alias("a")
    b = e.alias("b")
    raw = (
        a.join(b, F.col("b.vec_id") == F.col("a.vec_id"))
        .groupBy(F.col("a.i").alias("i"), F.col("b.i").alias("j"))
        .agg(F.sum(F.col("a.x") * F.col("b.x")).alias("sxx"))
    )
    ma = mu.select(F.col("i"), F.col("m").alias("ma"))
    mb = mu.select(F.col("i").alias("j"), F.col("m").alias("mb"))
    cov = (
        raw.crossJoin(bcast_small(n))
        .join(bcast_small(ma), "i")
        .join(bcast_small(mb), "j")
        .select(
            "i",
            "j",
            (F.col("sxx") / F.col("n") - F.col("ma") * F.col("mb")).alias(
                "c"
            ),
        )
    )
    diag = F.when(F.col("i") == F.col("j"), F.col("c")).otherwise(0.0)
    offsq = F.when(
        F.col("i") != F.col("j"), F.col("c") * F.col("c")
    ).otherwise(0.0)
    return cov.agg(
        F.lit(64).cast("long").alias("dim"),
        F.round(F.sum(diag), 6).alias("trace"),
        F.round(F.sum(diag) / 64, 6).alias("mean_variance"),
        F.round(F.sqrt(F.sum(offsq)), 6).alias("offdiag_frobenius"),
        F.round(
            F.sum(offsq) / F.sum(F.col("c") * F.col("c")), 6
        ).alias("offdiag_energy_frac"),
        F.round(
            F.max(F.when(F.col("i") == F.col("j"), F.col("c")))
            / (F.sum(diag) / 64),
            6,
        ).alias("max_var_ratio"),
    )


@query(
    "q239_source_log_odds",
    f"""
    WITH toks AS (
      SELECT source, t.t AS term
      FROM (SELECT source, {DK_WORDS} AS w FROM documents) d,
           UNNEST(w) AS t(t)
      WHERE t.t <> ''
    ),
    cts AS (SELECT source, term, CAST(count(*) AS BIGINT) AS c
            FROM toks GROUP BY source, term),
    per_s AS (SELECT source, CAST(sum(c) AS BIGINT) AS ns FROM cts GROUP BY source),
    per_t AS (SELECT term, CAST(sum(c) AS BIGINT) AS ct FROM cts GROUP BY term),
    vocab AS (SELECT CAST(count(*) AS BIGINT) AS v,
                     CAST(sum(ct) AS BIGINT) AS ntot FROM per_t),
    scored AS (
      SELECT cts.source, cts.term,
             ln(((cts.c + 1) / CAST(per_s.ns + vocab.v AS DOUBLE))
                / ((per_t.ct - cts.c + 1)
                   / CAST(vocab.ntot - per_s.ns + vocab.v AS DOUBLE)))
               AS score
      FROM cts
      JOIN per_s USING (source)
      JOIN per_t USING (term)
      CROSS JOIN vocab
    ),
    ranked AS (
      SELECT source, term, round(score, 6) AS score,
             row_number() OVER (PARTITION BY source
                                ORDER BY round(score, 6) DESC, term) AS rk
      FROM scored
    )
    SELECT source, term, score, CAST(rk AS BIGINT) AS rank
    FROM ranked WHERE rk <= 3
    """,
)
def q239_source_log_odds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Characteristic vocabulary per source: smoothed log-odds of each
    term in the source vs the REST of the corpus (the Monroe et al.
    'fightin' words' readout with add-1 smoothing), top-3 per source by
    a PARTITIONED rank window (WGL-pruned, ties on rounded score +
    term). Two count shuffles (source-term, term) and a broadcast
    one-row vocab frame — the corpus-profiling step that catches a
    source drifting off-topic before it pollutes the training mix."""
    from etl_jetro_spark.functions.hashing import norm_text
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "source", F.explode(F.split(norm_text("text"), " ")).alias("term")
    ).filter(F.col("term") != "")
    cts = toks.groupBy("source", "term").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    per_s = cts.groupBy("source").agg(F.sum("c").cast("long").alias("ns"))
    per_t = cts.groupBy("term").agg(F.sum("c").cast("long").alias("ct"))
    vocab = per_t.agg(
        F.count(F.lit(1)).cast("long").alias("v"),
        F.sum("ct").cast("long").alias("ntot"),
    )
    scored = (
        cts.join(bcast_small(per_s), "source")
        .join(per_t, "term")
        .crossJoin(bcast_small(vocab))
        .select(
            "source",
            "term",
            F.round(
                F.log(
                    (
                        (F.col("c") + 1)
                        / (F.col("ns") + F.col("v")).cast("double")
                    )
                    / (
                        (F.col("ct") - F.col("c") + 1)
                        / (
                            F.col("ntot") - F.col("ns") + F.col("v")
                        ).cast("double")
                    )
                ),
                6,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("source").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("source", "term", "score", F.col("rank").cast("long"))
    )


@query(
    "q240_layout_runs",
    """
    WITH r1 AS (
      SELECT CASE WHEN lag(l_partkey) OVER w IS NULL
                       OR lag(l_partkey) OVER w <> l_partkey
                  THEN 1 ELSE 0 END AS brk
      FROM lineitem
      WINDOW w AS (ORDER BY l_shipdate, l_orderkey, l_linenumber)
    ),
    r2 AS (
      SELECT CASE WHEN lag(l_shipdate) OVER w IS NULL
                       OR lag(l_shipdate) OVER w <> l_shipdate
                  THEN 1 ELSE 0 END AS brk
      FROM lineitem
      WINDOW w AS (ORDER BY l_partkey, l_orderkey, l_linenumber)
    )
    SELECT s.ordering, s.runs,
           CAST((SELECT count(*) FROM lineitem) AS BIGINT) AS n_rows,
           round((SELECT count(*) FROM lineitem)
                 / CAST(s.runs AS DOUBLE), 4) AS avg_run_len
    FROM (
      SELECT 'by_shipdate_runs_of_partkey' AS ordering,
             CAST(sum(brk) AS BIGINT) AS runs FROM r1
      UNION ALL
      SELECT 'by_partkey_runs_of_shipdate' AS ordering,
             CAST(sum(brk) AS BIGINT) AS runs FROM r2
    ) s
    """,
)
def q240_layout_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sort-layout evaluation for encoding/compression planning: the
    number of RLE runs a secondary column exhibits under each candidate
    sort order (sort by ship date → runs of partkey, and vice versa) —
    long runs mean dictionary/RLE-friendly parquet pages and better
    min-max pruning. The run count is computed DISTRIBUTED-exactly:
    range-partition on the sort key, count local run breaks per
    partition, then subtract the boundary seams where a partition's
    first value continues its predecessor's last (a bounded pid-frame
    window — the q213 offset idiom applied to run-length instead of
    prefix sums). No global window ever sees the data-scale frame."""
    from pyspark.sql import Window

    li = load(spark, sf_dir, "lineitem")
    nparts = max(spark.sparkContext.defaultParallelism, 8)

    def runs(sort_cols: list[str], b: str, label: str) -> DataFrame:
        base = (
            li.select(*sort_cols, F.col(b).alias("_b"))
            .repartitionByRange(nparts, *sort_cols)
            .sortWithinPartitions(*sort_cols)
            .select(
                "_b",
                F.spark_partition_id().alias("_pid"),
                (F.monotonically_increasing_id() % F.lit(1 << 33)).alias(
                    "_lidx"
                ),
            )
            .localCheckpoint(eager=False)
        )
        wl = Window.partitionBy("_pid").orderBy("_lidx")
        brk = F.when(
            F.lag("_b").over(wl).isNull()
            | (F.lag("_b").over(wl) != F.col("_b")),
            1,
        ).otherwise(0)
        local = (
            base.withColumn("_brk", brk)
            .groupBy("_pid")
            .agg(
                F.sum("_brk").alias("lruns"),
                F.min(F.struct("_lidx", "_b")).alias("_fst"),
                F.max(F.struct("_lidx", "_b")).alias("_lst"),
            )
            .select(
                "_pid",
                "lruns",
                F.col("_fst._b").alias("first_b"),
                F.col("_lst._b").alias("last_b"),
            )
        )
        wp = Window.orderBy("_pid")
        seams = local.select(
            "lruns",
            F.when(
                F.lag("last_b").over(wp) == F.col("first_b"), 1
            )
            .otherwise(0)
            .alias("seam"),
        )
        return seams.agg(
            F.lit(label).alias("ordering"),
            (F.sum("lruns") - F.sum("seam")).cast("long").alias("runs"),
        )

    r1 = runs(
        ["l_shipdate", "l_orderkey", "l_linenumber"],
        "l_partkey",
        "by_shipdate_runs_of_partkey",
    )
    r2 = runs(
        ["l_partkey", "l_orderkey", "l_linenumber"],
        "l_shipdate",
        "by_partkey_runs_of_shipdate",
    )
    nr = li.agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
    return (
        r1.unionAll(r2)
        .crossJoin(bcast_small(nr))
        .select(
            "ordering",
            "runs",
            "n_rows",
            F.round(
                F.col("n_rows") / F.col("runs").cast("double"), 4
            ).alias("avg_run_len"),
        )
    )


@query(
    "q241_freshness_lag",
    """
    WITH mx AS (SELECT max(ts) AS gmax FROM events),
    per AS (SELECT event_type, max(ts) AS tmax,
                   CAST(count(*) AS BIGINT) AS n
            FROM events GROUP BY event_type)
    SELECT per.event_type, per.n,
           CAST(floor(epoch(mx.gmax)) AS BIGINT)
             - CAST(floor(epoch(per.tmax)) AS BIGINT) AS lag_s,
           (CAST(floor(epoch(mx.gmax)) AS BIGINT)
            - CAST(floor(epoch(per.tmax)) AS BIGINT)) > 3600 AS stale
    FROM per CROSS JOIN mx
    """,
)
def q241_freshness_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source freshness audit: each event type's newest record vs
    the global watermark, in whole seconds, with a 1-hour staleness
    flag — the ingestion-health check a streaming pipeline runs before
    trusting a batch cut. Two max-aggregates (fully map-side
    combinable); the comparison is a broadcast one-row join."""
    e = load_events(spark, sf_dir)
    mx = e.agg(F.max("ts").alias("gmax"))
    per = e.groupBy("event_type").agg(
        F.max("ts").alias("tmax"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    lag = F.expr("gmax div 1000000000") - F.expr("tmax div 1000000000")
    return per.crossJoin(bcast_small(mx)).select(
        "event_type",
        "n",
        lag.alias("lag_s"),
        (lag > 3600).alias("stale"),
    )


@query(
    "q242_null_profile",
    """
    SELECT c.col,
           CAST(c.n AS BIGINT) AS n_rows,
           CAST(c.n_null AS BIGINT) AS n_null,
           round(c.n_null / CAST(c.n AS DOUBLE), 6) AS null_frac
    FROM (
      SELECT 'events.value' AS col, count(*) AS n,
             sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS n_null
      FROM events
      UNION ALL
      SELECT 'events.props', count(*),
             sum(CASE WHEN props IS NULL OR props = '' THEN 1 ELSE 0 END)
      FROM events
      UNION ALL
      SELECT 'orders.o_totalprice', count(*),
             sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END)
      FROM orders
      UNION ALL
      SELECT 'documents.text', count(*),
             sum(CASE WHEN text IS NULL OR text = '' THEN 1 ELSE 0 END)
      FROM documents
    ) c
    """,
)
def q242_null_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table null/blank profile for the nullable columns a
    pipeline depends on — the data-contract check that runs before any
    transformation trusts a field. Each table contributes one
    single-pass conditional aggregate; the union is 4 rows."""
    e = load_events(spark, sf_dir)
    o = load(spark, sf_dir, "orders")
    d = load(spark, sf_dir, "documents")

    def prof(df, col, cond, label):
        return df.agg(
            F.lit(label).alias("col"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias("n_null"),
        )

    rows = [
        prof(e, "value", F.col("value").isNull(), "events.value"),
        prof(
            e,
            "props",
            F.col("props").isNull() | (F.col("props") == ""),
            "events.props",
        ),
        prof(
            o,
            "o_totalprice",
            F.col("o_totalprice").isNull(),
            "orders.o_totalprice",
        ),
        prof(
            d,
            "text",
            F.col("text").isNull() | (F.col("text") == ""),
            "documents.text",
        ),
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out.select(
        "col",
        "n_rows",
        "n_null",
        F.round(F.col("n_null") / F.col("n_rows").cast("double"), 6).alias(
            "null_frac"
        ),
    )


@query(
    "q243_key_integrity",
    """
    WITH pk AS (
      SELECT CAST(count(*) AS BIGINT) AS n_orders,
             CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_keys
      FROM orders
    ),
    ck AS (
      SELECT CAST(count(*) AS BIGINT) AS n_lines,
             CAST(count(*) FILTER (WHERE c > 1) AS BIGINT) AS dup_compound
      FROM (SELECT count(*) AS c FROM lineitem
            GROUP BY l_orderkey, l_linenumber)
    ),
    fan AS (
      SELECT CAST(min(c) AS BIGINT) AS min_fan,
             CAST(max(c) AS BIGINT) AS max_fan,
             round(avg(c), 6)       AS avg_fan
      FROM (SELECT count(*) AS c FROM lineitem GROUP BY l_orderkey)
    )
    SELECT pk.n_orders, pk.n_keys,
           pk.n_orders = pk.n_keys AS pk_unique,
           ck.dup_compound, fan.min_fan, fan.max_fan, fan.avg_fan
    FROM pk CROSS JOIN ck CROSS JOIN fan
    """,
)
def q243_key_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-integrity audit: orders primary-key uniqueness, compound-key
    (orderkey, linenumber) duplicate count in lineitem, and the
    order→line fan-out envelope — the constraint checks a warehouse
    runs on every load since Spark enforces no keys. All partial-agg
    count shuffles; nothing row-scale survives the first reduce."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    pk = o.agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.countDistinct("o_orderkey").cast("long").alias("n_keys"),
    )
    comp = li.groupBy("l_orderkey", "l_linenumber").agg(
        F.count(F.lit(1)).alias("c")
    )
    ck = comp.agg(
        F.sum(F.when(F.col("c") > 1, 1).otherwise(0))
        .cast("long")
        .alias("dup_compound")
    )
    fanb = li.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("c"))
    fan = fanb.agg(
        F.min("c").cast("long").alias("min_fan"),
        F.max("c").cast("long").alias("max_fan"),
        F.round(F.avg("c"), 6).alias("avg_fan"),
    )
    return (
        pk.crossJoin(ck)
        .crossJoin(fan)
        .select(
            "n_orders",
            "n_keys",
            (F.col("n_orders") == F.col("n_keys")).alias("pk_unique"),
            "dup_compound",
            "min_fan",
            "max_fan",
            "avg_fan",
        )
    )


@query(
    "q244_vocab_concentration",
    f"""
    WITH cts AS (
      SELECT t.t AS term, CAST(count(*) AS BIGINT) AS c
      FROM (SELECT {DK_WORDS} AS w FROM documents) d, UNNEST(w) AS t(t)
      WHERE t.t <> ''
      GROUP BY t.t
    ),
    tot AS (SELECT CAST(sum(c) AS BIGINT) AS n,
                   CAST(count(*) AS BIGINT) AS v FROM cts),
    top AS (SELECT c FROM cts ORDER BY c DESC, term LIMIT 100)
    SELECT tot.v AS vocab_size, tot.n AS total_tokens,
           CAST((SELECT count(*) FROM top) AS BIGINT) AS top_k,
           CAST((SELECT sum(c) FROM top) AS BIGINT)   AS top_mass,
           round((SELECT sum(c) FROM top) / CAST(tot.n AS DOUBLE), 6)
             AS top_share
    FROM tot
    """,
)
def q244_vocab_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary concentration: what share of all token occurrences
    the top-100 terms carry — the heavy-tail number that sizes
    stopword lists, df-caps (q110/q207), and subword-vocab budgets.
    One term-count shuffle; the top-100 is a TakeOrdered over the
    vocabulary frame, never a global window."""
    from etl_jetro_spark.functions.hashing import norm_text

    d = load(spark, sf_dir, "documents")
    cts = (
        d.select(F.explode(F.split(norm_text("text"), " ")).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    tot = cts.agg(
        F.sum("c").cast("long").alias("total_tokens"),
        F.count(F.lit(1)).cast("long").alias("vocab_size"),
    )
    top = cts.orderBy(F.desc("c"), F.asc("term")).limit(100)
    topa = top.agg(
        F.count(F.lit(1)).cast("long").alias("top_k"),
        F.sum("c").cast("long").alias("top_mass"),
    )
    return tot.crossJoin(topa).select(
        "vocab_size",
        "total_tokens",
        "top_k",
        "top_mass",
        F.round(
            F.col("top_mass") / F.col("total_tokens").cast("double"), 6
        ).alias("top_share"),
    )


@query(
    "q245_segment_star_summary",
    f"""
    SELECT c.c_mktsegment AS segment,
           CAST(count(DISTINCT c.c_custkey) AS BIGINT) AS n_customers,
           CAST(count(DISTINCT o.o_orderkey) AS BIGINT) AS n_orders,
           {sql_exact_net_sum('l.l_extendedprice', 'l.l_discount')}
             AS net_revenue,
           CAST(count(*) AS BIGINT) AS n_lines,
           round(count(*) / CAST(count(DISTINCT o.o_orderkey) AS DOUBLE), 6)
             AS lines_per_order
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY c.c_mktsegment
    """,
)
def q245_segment_star_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-table star rollup per market segment: customers, orders,
    net revenue, and line fan-out in ONE aggregation over the
    customer⋈orders⋈lineitem join — the canonical star-schema report.
    The customer dim broadcasts; orders⋈lineitem is the q42 bucketed
    fact-fact join at scale; distinct counts expand via Spark's
    standard two-shuffle rewrite."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    j = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(bcast_sized(c), o["o_custkey"] == c["c_custkey"])
    )
    return j.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.countDistinct("c_custkey").cast("long").alias("n_customers"),
        F.countDistinct("o_orderkey").cast("long").alias("n_orders"),
        # exact cents x (100 - disc100): price and discount are both
        # 2-dp-exact, so the revenue sum is an exact integer in 1e-4
        # dollars (q1's 30x-gate fix applied to the star rollup)
        M.exact_net_sum("l_extendedprice", "l_discount").alias("net_revenue"),
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.round(
            F.count(F.lit(1))
            / F.countDistinct("o_orderkey").cast("double"),
            6,
        ).alias("lines_per_order"),
    )


@query(
    "q246_backlog_aging",
    f"""
    WITH mx AS (SELECT max(CAST(o_orderdate AS DATE)) AS today FROM orders),
    open_o AS (
      SELECT datediff('day', CAST(o_orderdate AS DATE), mx.today) AS age_d,
             o_totalprice
      FROM orders CROSS JOIN mx WHERE o_orderstatus = 'O'
    )
    SELECT CASE WHEN age_d <= 30 THEN '0-30'
                WHEN age_d <= 90 THEN '31-90'
                WHEN age_d <= 365 THEN '91-365'
                ELSE '365+' END AS age_bucket,
           CAST(count(*) AS BIGINT) AS n_orders,
           {sql_exact_money_sum('o_totalprice')} AS open_value,
           CAST(min(age_d) AS BIGINT) AS min_age_d,
           CAST(max(age_d) AS BIGINT) AS max_age_d
    FROM open_o GROUP BY 1
    """,
)
def q246_backlog_aging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-order backlog aging report: orders still in status 'O'
    bucketed by age against the dataset watermark (0-30/31-90/91-365/
    365+ days), with the open value per bucket — the AR-style aging
    summary every ops dashboard carries. One max broadcast + one
    filtered partial-agg pass; integer day arithmetic on DATE-cast
    wall-clock on both engines."""
    o = load(spark, sf_dir, "orders")
    mx = o.agg(F.max(F.to_date("o_orderdate")).alias("today"))
    aged = (
        o.filter(F.col("o_orderstatus") == "O")
        .crossJoin(bcast_small(mx))
        .select(
            F.datediff(
                F.col("today"), F.to_date("o_orderdate")
            ).alias("age_d"),
            "o_totalprice",
        )
    )
    bucket = (
        F.when(F.col("age_d") <= 30, "0-30")
        .when(F.col("age_d") <= 90, "31-90")
        .when(F.col("age_d") <= 365, "91-365")
        .otherwise("365+")
    )
    return aged.groupBy(bucket.alias("age_bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        M.exact_money_sum("o_totalprice").alias("open_value"),
        F.min("age_d").cast("long").alias("min_age_d"),
        F.max("age_d").cast("long").alias("max_age_d"),
    )


@query(
    "q247_discount_quantity_corr",
    """
    SELECT p.p_brand AS brand,
           CAST(count(*) AS BIGINT) AS n_lines,
           round(avg(l.l_discount), 6) AS avg_discount,
           round(corr(l.l_discount, l.l_quantity), 6) AS disc_qty_corr
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    GROUP BY p.p_brand
    HAVING count(*) >= 100
    """,
)
def q247_discount_quantity_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discount effectiveness screen per brand: the discount↔quantity
    correlation (does discounting move volume?) over the
    lineitem⋈part join — part is a grow-with-data dim so its broadcast
    is SIZE-GATED (bcast_sized: hinted while it fits under
    autoBroadcastJoinThreshold, plain shuffle join past it — the lint's
    growth rule caught the old forced hint), corr is a single-pass
    moment aggregate, and the >=100-line support filter keeps noise
    brands out. The price-elasticity cousin of q131's grouped OLS."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    return (
        li.join(bcast_sized(p), li["l_partkey"] == p["p_partkey"])
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.round(F.avg("l_discount"), 6).alias("avg_discount"),
            F.round(F.corr("l_discount", "l_quantity"), 6).alias(
                "disc_qty_corr"
            ),
        )
        .filter(F.col("n_lines") >= 100)
    )


@query(
    "q248_length_diversity_corr",
    f"""
    WITH f AS (
      SELECT source, CAST(len(text) AS BIGINT) AS n_chars,
             CAST(len(list_distinct(list_filter(
               string_split({DK_NORM_TEXT}, ' '), x -> x <> '')))
               AS BIGINT) AS n_distinct
      FROM documents
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(avg(n_chars), 4) AS avg_chars,
           round(avg(n_distinct), 4) AS avg_distinct_tokens,
           round(corr(n_chars, n_distinct), 6) AS len_diversity_corr
    FROM f GROUP BY source
    """,
)
def q248_length_diversity_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length vs lexical-diversity correlation per source — when the
    correlation is near 1 the source's vocabulary grows with length
    (organic text); template/boilerplate sources flatten out (length
    grows, distinct tokens don't) — a one-number companion to the q234
    template audit. Features are partition-local expressions; the
    reduce is source-cardinality-sized."""
    from etl_jetro_spark.functions.hashing import norm_text

    d = load(spark, sf_dir, "documents")
    f = d.select(
        "source",
        F.length("text").cast("long").alias("n_chars"),
        F.size(
            F.array_distinct(
                F.filter(
                    F.split(norm_text("text"), " "), lambda x: x != ""
                )
            )
        )
        .cast("long")
        .alias("n_distinct"),
    )
    return f.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        F.round(F.avg("n_distinct"), 4).alias("avg_distinct_tokens"),
        F.round(F.corr("n_chars", "n_distinct"), 6).alias(
            "len_diversity_corr"
        ),
    )


@query(
    "q249_supplier_hhi",
    """
    WITH ps AS (
      SELECT l_partkey, l_suppkey, sum(l_quantity) AS q
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    tot AS (SELECT l_partkey, sum(q) AS tq,
                   CAST(count(*) AS BIGINT) AS n_supp
            FROM ps GROUP BY l_partkey),
    hhi AS (
      SELECT ps.l_partkey,
             max(tot.n_supp) AS n_supp,
             sum((ps.q / tot.tq) * (ps.q / tot.tq)) AS h
      FROM ps JOIN tot ON tot.l_partkey = ps.l_partkey
      GROUP BY ps.l_partkey
    )
    SELECT CASE WHEN h >= 0.25 THEN 'concentrated'
                WHEN h >= 0.15 THEN 'moderate'
                ELSE 'competitive' END AS concentration,
           CAST(count(*) AS BIGINT) AS n_parts,
           round(avg(h), 6)         AS avg_hhi,
           round(avg(n_supp), 4)    AS avg_suppliers
    FROM hhi GROUP BY 1
    """,
)
def q249_supplier_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supply-concentration census: the Herfindahl-Hirschman index of
    supplier quantity shares within each part (DOJ 0.15/0.25
    thresholds), rolled up to how many parts are competitively vs
    single-source supplied — the supply-chain-risk readout. Two
    partial-agg passes over (part, supplier) cells; shares never leave
    their part's group, so the whole census is shuffle-bounded by cell
    cardinality."""
    li = load(spark, sf_dir, "lineitem")
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("l_quantity").alias("q")
    )
    tot = ps.groupBy("l_partkey").agg(
        F.sum("q").alias("tq"),
        F.count(F.lit(1)).cast("long").alias("n_supp"),
    )
    share = F.col("q") / F.col("tq")
    hhi = (
        ps.join(tot, "l_partkey")
        .groupBy("l_partkey")
        .agg(
            F.max("n_supp").alias("n_supp"),
            F.sum(share * share).alias("h"),
        )
    )
    conc = (
        F.when(F.col("h") >= 0.25, "concentrated")
        .when(F.col("h") >= 0.15, "moderate")
        .otherwise("competitive")
    )
    return hhi.groupBy(conc.alias("concentration")).agg(
        F.count(F.lit(1)).cast("long").alias("n_parts"),
        F.round(F.avg("h"), 6).alias("avg_hhi"),
        F.round(F.avg("n_supp"), 4).alias("avg_suppliers"),
    )


@query(
    "q250_interarrival_profile",
    """
    WITH s AS (
      SELECT event_type, user_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS t,
             lag(CAST(floor(epoch(ts)) AS BIGINT))
               OVER (PARTITION BY event_type, user_id
                     ORDER BY CAST(floor(epoch(ts)) AS BIGINT), event_id)
               AS pt
      FROM events
    ),
    g AS (SELECT event_type, t - pt AS gap FROM s WHERE pt IS NOT NULL),
    m AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_gaps,
             avg(gap)                 AS mean_gap,
             sum(CAST(gap AS DOUBLE) * gap) AS ssq
      FROM g GROUP BY event_type
    )
    SELECT event_type, n_gaps,
           round(mean_gap, 6) AS mean_gap_s,
           round(3600.0 / mean_gap, 6) AS rate_per_hour,
           round(sqrt((ssq - n_gaps * mean_gap * mean_gap)
                      / (n_gaps - 1)) / mean_gap, 6) AS gap_cv,
           sqrt((ssq - n_gaps * mean_gap * mean_gap)
                / (n_gaps - 1)) / mean_gap > 1.5 AS overdispersed
    FROM m WHERE n_gaps > 1
    """,
)
def q250_interarrival_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-arrival profile by event type: mean gap, implied
    hourly rate, and the coefficient of variation (a Poisson process
    has CV = 1; CV > 1.5 flags clumped arrivals) — the
    interarrival-domain twin of q216's count-domain Fano factor. Gaps
    come from PARTITIONED (type, user) lag windows; moments are
    closed-form sums so the CV needs one pass."""
    from pyspark.sql import Window

    e = load_events(spark, sf_dir).select(
        "event_type",
        "user_id",
        "event_id",
        F.expr("ts div 1000000000").alias("t"),
    )
    w = Window.partitionBy("event_type", "user_id").orderBy("t", "event_id")
    g = (
        e.withColumn("pt", F.lag("t").over(w))
        .filter(F.col("pt").isNotNull())
        .select("event_type", (F.col("t") - F.col("pt")).alias("gap"))
    )
    m = g.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        F.avg("gap").alias("mean_gap"),
        F.sum(F.col("gap").cast("double") * F.col("gap")).alias("ssq"),
    )
    sd = F.sqrt(
        (F.col("ssq") - F.col("n_gaps") * F.col("mean_gap") * F.col("mean_gap"))
        / (F.col("n_gaps") - 1)
    )
    cv = sd / F.col("mean_gap")
    return m.filter(F.col("n_gaps") > 1).select(
        "event_type",
        "n_gaps",
        F.round("mean_gap", 6).alias("mean_gap_s"),
        F.round(3600.0 / F.col("mean_gap"), 6).alias("rate_per_hour"),
        F.round(cv, 6).alias("gap_cv"),
        (cv > 1.5).alias("overdispersed"),
    )


@query(
    "q251_bigram_entropy",
    f"""
    WITH toks AS (
      SELECT source, w FROM (SELECT source, {DK_WORDS} AS w FROM documents)
      WHERE len(w) >= 2
    ),
    bg AS (
      SELECT source,
             unnest(list_transform(generate_series(1, len(w) - 1),
                                   i -> w[i] || ' ' || w[i + 1])) AS bigram
      FROM toks
    ),
    c AS (SELECT source, bigram, CAST(count(*) AS BIGINT) AS c
          FROM bg GROUP BY source, bigram)
    SELECT source,
           CAST(sum(c) AS BIGINT)   AS n_bigrams,
           CAST(count(*) AS BIGINT) AS n_distinct,
           round(ln(sum(c)) - sum(c * ln(c)) / sum(c), 6) AS bigram_entropy
    FROM c GROUP BY source
    """,
)
def q251_bigram_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source bigram Shannon entropy (the q134 formulation one
    n-gram order up) — low bigram entropy with normal unigram entropy
    is the signature of templated/repetitive text that fools
    unigram-level quality gates. Bigrams generate partition-locally
    from adjacent token pairs; one (source, bigram) count shuffle;
    entropy from closed-form ln sums."""
    from etl_jetro_spark.functions.hashing import norm_text

    d = load(spark, sf_dir, "documents")
    toks = d.select("source", F.split(norm_text("text"), " ").alias("w"))
    # norm_text collapses whitespace, so split() yields no interior
    # empty tokens; a fully-empty doc gives [''] (size 1) and is
    # excluded by the size filter — no per-bigram guards needed.
    bg = toks.filter(F.size("w") >= 2).select(
        "source",
        F.explode(
            F.expr(
                "transform(sequence(1, size(w) - 1),"
                " i -> concat(w[i-1], ' ', w[i]))"
            )
        ).alias("bigram"),
    )
    c = bg.groupBy("source", "bigram").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    return c.groupBy("source").agg(
        F.sum("c").cast("long").alias("n_bigrams"),
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
        F.round(
            F.log(F.sum("c"))
            - F.sum(F.col("c") * F.log("c")) / F.sum("c"),
            6,
        ).alias("bigram_entropy"),
    )


@query(
    "q253_type_affinity_lift",
    """
    WITH u AS (SELECT DISTINCT user_id, event_type FROM events),
    n AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS nu FROM events),
    per AS (SELECT event_type, CAST(count(*) AS BIGINT) AS c FROM u
            GROUP BY event_type),
    pair AS (
      SELECT a.event_type AS ta, b.event_type AS tb,
             CAST(count(*) AS BIGINT) AS co
      FROM u a JOIN u b
        ON b.user_id = a.user_id AND a.event_type < b.event_type
      GROUP BY a.event_type, b.event_type
    )
    SELECT p.ta, p.tb, p.co,
           round(p.co * CAST(n.nu AS DOUBLE) / (ca.c * cb.c), 6) AS lift
    FROM pair p
    JOIN per ca ON ca.event_type = p.ta
    JOIN per cb ON cb.event_type = p.tb
    CROSS JOIN n
    """,
)
def q253_type_affinity_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type affinity lift matrix: P(a ∧ b)/(P(a)·P(b)) over
    distinct users — lift > 1 means the surfaces share an audience
    (cross-sell signal), < 1 means they split it. The only data-scale
    work is the distinct (user, type) projection; the per-user pair
    join is bounded by types-per-user (≤5) and the matrix is
    types²-sized."""
    e = load(spark, sf_dir, "events")
    u = e.select("user_id", "event_type").distinct()
    n = e.agg(F.countDistinct("user_id").cast("long").alias("nu"))
    per = u.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    a = u.alias("a")
    b = u.alias("b")
    pair = (
        a.join(
            b,
            (F.col("b.user_id") == F.col("a.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("ta"),
            F.col("b.event_type").alias("tb"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("co"))
    )
    ca = per.select(F.col("event_type").alias("ta"), F.col("c").alias("c_a"))
    cb = per.select(F.col("event_type").alias("tb"), F.col("c").alias("c_b"))
    return (
        pair.join(bcast_small(ca), "ta")
        .join(bcast_small(cb), "tb")
        .crossJoin(bcast_small(n))
        .select(
            "ta",
            "tb",
            "co",
            F.round(
                F.col("co")
                * F.col("nu").cast("double")
                / (F.col("c_a") * F.col("c_b")),
                6,
            ).alias("lift"),
        )
    )


@query(
    "q254_basket_size_histogram",
    """
    WITH f AS (SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n_lines
               FROM lineitem GROUP BY l_orderkey),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM f)
    SELECT f.n_lines,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(count(*) / CAST(tot.n AS DOUBLE), 6) AS share,
           round(sum(count(*)) OVER (ORDER BY f.n_lines
                                     ROWS UNBOUNDED PRECEDING)
                 / CAST(tot.n AS DOUBLE), 6) AS cum_share
    FROM f CROSS JOIN tot GROUP BY f.n_lines, tot.n
    """,
)
def q254_basket_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order basket-size distribution with cumulative share — the
    per-basket-size histogram that justifies the bounded-basket
    argument every pair-expansion query (q151/q194/q211) leans on.
    The fan-out count is one partial-agg shuffle; the cumulative
    share comes from a triangular self-join on the max-basket-sized
    histogram frame — windowless by construction."""
    li = load(spark, sf_dir, "lineitem")
    f = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines")
    )
    tot = f.agg(F.count(F.lit(1)).cast("long").alias("n"))
    h = f.groupBy("n_lines").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders")
    ).localCheckpoint(eager=False)
    # cumulative share via a triangular self-join on the max-basket-
    # sized histogram frame (~dozen rows) — windowless, so the catalog
    # plan-lint's no-global-window rule holds structurally rather than
    # by an NDV-size judgment call
    cum = (
        h.alias("x")
        .join(
            bcast_small(h.alias("y")),
            F.col("y.n_lines") <= F.col("x.n_lines"),
        )
        .groupBy(F.col("x.n_lines").alias("n_lines"))
        .agg(
            F.max(F.col("x.n_orders")).alias("n_orders"),
            F.sum(F.col("y.n_orders")).alias("cum"),
        )
    )
    return cum.crossJoin(bcast_small(tot)).select(
        "n_lines",
        "n_orders",
        F.round(F.col("n_orders") / F.col("n").cast("double"), 6).alias(
            "share"
        ),
        F.round(F.col("cum") / F.col("n").cast("double"), 6).alias(
            "cum_share"
        ),
    )


@query(
    "q255_supplier_balance_outliers",
    """
    WITH m AS (
      SELECT s_nationkey,
             CAST(count(*) AS BIGINT) AS n,
             avg(s_acctbal) AS mu,
             CASE WHEN count(*) > 1
                  THEN sqrt((sum(s_acctbal * s_acctbal)
                             - sum(s_acctbal) * sum(s_acctbal)
                               / CAST(count(*) AS DOUBLE))
                            / (count(*) - 1))
                  ELSE 0 END AS sd
      FROM supplier GROUP BY s_nationkey
    )
    SELECT n.n_name AS nation,
           m.n AS n_suppliers,
           round(m.mu, 4) AS mean_balance,
           CAST(sum(CASE WHEN m.sd > 0
                         AND abs(s.s_acctbal - m.mu) > 2 * m.sd
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM supplier s
    JOIN m ON m.s_nationkey = s.s_nationkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    GROUP BY n.n_name, m.n, m.mu
    """,
)
def q255_supplier_balance_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier account-balance outlier census per nation: 2σ flags
    against per-nation moments (closed-form variance — no second
    pass), the vendor-risk screen before settlement. The moments
    frame is nation-sized and broadcast back over the supplier scan;
    nation names join from the broadcast dim."""
    s = load(spark, sf_dir, "supplier")
    nat = load(spark, sf_dir, "nation")
    m = s.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.avg("s_acctbal").alias("mu"),
        F.when(
            F.count(F.lit(1)) > 1,
            F.sqrt(
                (
                    F.sum(F.col("s_acctbal") * F.col("s_acctbal"))
                    - F.sum("s_acctbal")
                    * F.sum("s_acctbal")
                    / F.count(F.lit(1)).cast("double")
                )
                / (F.count(F.lit(1)) - 1)
            ),
        )
        .otherwise(0.0)
        .alias("sd"),
    )
    return (
        s.join(bcast_small(m), "s_nationkey")
        .join(
            bcast_small(nat), F.col("s_nationkey") == F.col("n_nationkey")
        )
        .groupBy(
            F.col("n_name").alias("nation"),
            F.col("n").alias("n_suppliers"),
            F.col("mu"),
        )
        .agg(
            F.sum(
                F.when(
                    (F.col("sd") > 0)
                    & (
                        F.abs(F.col("s_acctbal") - F.col("mu"))
                        > 2 * F.col("sd")
                    ),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_outliers")
        )
        .select(
            "nation",
            "n_suppliers",
            F.round("mu", 4).alias("mean_balance"),
            "n_outliers",
        )
    )


@query(
    "q252_order_dow_mix",
    f"""
    WITH base AS (
      SELECT dayofweek(o_orderdate) AS dow, o_orderpriority AS pri,
             o_totalprice
      FROM orders
    ),
    cell AS (
      SELECT dow, pri, CAST(count(*) AS BIGINT) AS n,
             {sql_sum_micro('o_totalprice')} AS um
      FROM base GROUP BY dow, pri
    ),
    d AS (SELECT dow, CAST(sum(n) AS BIGINT) AS nd FROM cell GROUP BY dow)
    SELECT CAST(cell.dow AS BIGINT) AS day_of_week, cell.pri, cell.n,
           round(CAST(cell.um AS DOUBLE) / 1000000, 4) AS revenue,
           round(cell.n / CAST(d.nd AS DOUBLE), 6) AS day_share
    FROM cell JOIN d ON d.dow = cell.dow
    """,
)
def q252_order_dow_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order placement mix: priority composition of each weekday's
    order flow (count, revenue, within-day share) — the operational
    staffing/capacity readout. One cell-bounded partial-agg pass; the
    weekday convention is bridged explicitly (Spark dayofweek is
    1-based Sunday, DuckDB 0-based)."""
    o = load(spark, sf_dir, "orders")
    base = o.select(
        (F.dayofweek(F.to_date("o_orderdate")) - 1).alias("dow"),
        F.col("o_orderpriority").alias("pri"),
        "o_totalprice",
    )
    cell = base.groupBy("dow", "pri").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        # micro-dollar row quantization (30x-gate float-fold class)
        M.sum_micro("o_totalprice").alias("um"),
    )
    d = cell.groupBy("dow").agg(F.sum("n").cast("long").alias("nd"))
    return cell.join(bcast_small(d), "dow").select(
        F.col("dow").cast("long").alias("day_of_week"),
        "pri",
        "n",
        F.round(F.col("um").cast("double") / 1000000, 4).alias("revenue"),
        F.round(F.col("n") / F.col("nd").cast("double"), 6).alias(
            "day_share"
        ),
    )


_Q256_K = (
    "(SELECT greatest(32, CAST(floor(sqrt(count(*))) AS BIGINT))"
    " FROM embeddings)"
)
_Q256_NC = (
    "(SELECT greatest(8, CAST(floor(sqrt("
    "greatest(32, CAST(floor(sqrt(count(*))) AS BIGINT))"
    ")) AS BIGINT)) FROM embeddings)"
)


@query(
    "q256_two_level_assign_recall",
    f"""
    WITH emb AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings),
    p AS (SELECT vec_id, v FROM emb WHERE vec_id % 7 = 0),
    c AS (SELECT vec_id AS cid, v AS cv FROM emb WHERE vec_id < {_Q256_K}),
    g AS (SELECT vec_id AS gid, v AS gv FROM emb WHERE vec_id < {_Q256_NC}),
    flat AS (
      SELECT vec_id, cid AS cid_f, sc AS s_f FROM (
        SELECT p.vec_id, c.cid,
               {_Q146_COS.format(a='p.v', b='c.cv')} AS sc,
               row_number() OVER (
                 PARTITION BY p.vec_id
                 ORDER BY {_Q146_COS.format(a='p.v', b='c.cv')} DESC, c.cid
               ) AS rn
        FROM p CROSS JOIN c) WHERE rn = 1),
    cg AS (
      SELECT cid, cv, gid FROM (
        SELECT c.cid, c.cv, g.gid,
               row_number() OVER (
                 PARTITION BY c.cid
                 ORDER BY {_Q146_COS.format(a='c.cv', b='g.gv')} DESC, g.gid
               ) AS rn
        FROM c CROSS JOIN g) WHERE rn = 1),
    vg AS (
      SELECT vec_id, v, gid FROM (
        SELECT p.vec_id, p.v, g.gid,
               row_number() OVER (
                 PARTITION BY p.vec_id
                 ORDER BY {_Q146_COS.format(a='p.v', b='g.gv')} DESC, g.gid
               ) AS rn
        FROM p CROSS JOIN g) WHERE rn <= 3),
    tl AS (
      SELECT vec_id, cid AS cid_t, sc AS s_t FROM (
        SELECT vg.vec_id, cg.cid,
               {_Q146_COS.format(a='vg.v', b='cg.cv')} AS sc,
               row_number() OVER (
                 PARTITION BY vg.vec_id
                 ORDER BY {_Q146_COS.format(a='vg.v', b='cg.cv')} DESC, cg.cid
               ) AS rn
        FROM vg JOIN cg ON vg.gid = cg.gid) WHERE rn = 1),
    -- stranded-vector fallback (one-row-per-vector contract): a probe
    -- whose coarse cells all have zero fine members inner-joins away in
    -- tl; it falls back to the flat argmax, mirroring the operator
    fb AS (
      SELECT vec_id, cid AS cid_t, sc AS s_t FROM (
        SELECT p.vec_id, c.cid,
               {_Q146_COS.format(a='p.v', b='c.cv')} AS sc,
               row_number() OVER (
                 PARTITION BY p.vec_id
                 ORDER BY {_Q146_COS.format(a='p.v', b='c.cv')} DESC, c.cid
               ) AS rn
        FROM p CROSS JOIN c
        WHERE p.vec_id NOT IN (SELECT vec_id FROM tl)) WHERE rn = 1),
    tl_all AS (SELECT * FROM tl UNION ALL SELECT * FROM fb)
    SELECT CAST(count(*) AS BIGINT) AS n_probes,
           CAST(sum(CASE WHEN cid_f = cid_t THEN 1 ELSE 0 END) AS BIGINT)
             AS n_agree,
           round(avg(CASE WHEN cid_f = cid_t THEN 1.0 ELSE 0.0 END), 6)
             AS recall,
           round(avg(round(s_f - s_t, 6)), 5) AS avg_score_gap
    FROM flat JOIN tl_all USING (vec_id)
    """,
)
def q256_two_level_assign_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assignment-recall gate for the two-level SemDeDup path (round-5
    verdict ask #3's telemetry half, the q57 pattern): on a
    deterministic ~14% probe sample (vec_id % 7 == 0), run BOTH the
    exact flat argmax (ivf_assign) and the coarse-then-fine two-level
    assignment (ivf_assign_two_level) against the same K/NC centroid
    sets q146 uses, and report agreement rate plus the mean cosine gap
    between the exact-best and two-level-best centroid scores (>= 0 by
    construction — flat is the exact argmax). Sampling keeps the n*K
    exact side cheap at every SF while the estimate stays unbiased; the
    oracle replays both assignments with the same ties->lowest-id
    rule.

    Measured: ~0.58 at sf0.01 AND sf0.1 (avg cosine gap ~0.03). The
    fixture's random high-dim vectors are the worst case for coarse
    quantization — near-uniform pairwise cosine gives the coarse cells
    almost no structure to exploit; real embedding corpora cluster and
    route far better. For the DEDUP downstream (q146) the flat-argmax
    disagreement is mostly harmless either way: near-identical vectors
    follow the same deterministic coarse routing, so planted dup pairs
    still co-locate (test_semantic_dedup_collapses_planted_cluster
    asserts identical verdicts on both paths) — what dedup needs is
    consistent assignment of near-dups, not agreement with the flat
    argmax."""
    import math

    from etl_jetro_spark.operators.similarity import (
        _vec,
        cosine,
        ivf_assign,
        ivf_assign_two_level,
    )

    emb = load(spark, sf_dir, "embeddings")
    k = max(32, math.isqrt(emb.count()))
    nc = max(8, math.isqrt(k))
    cents = emb.filter(F.col("vec_id") < k).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")
    )
    coarse = emb.filter(F.col("vec_id") < nc).select(
        F.col("vec_id").alias("gid"), F.col("embedding").alias("gv")
    )
    probes = emb.filter(F.col("vec_id") % 7 == 0).select(
        "vec_id", "embedding"
    )
    flat = ivf_assign(probes, "vec_id", "embedding", cents)
    tl = ivf_assign_two_level(
        probes, "vec_id", "embedding", cents, coarse, n_probe_cells=3
    )
    fl = flat.join(bcast_small(cents), "cid").select(
        "vec_id",
        F.col("cid").alias("cid_f"),
        cosine(_vec("embedding"), _vec("cv")).alias("s_f"),
    )
    tl2 = tl.join(bcast_small(cents), "cid").select(
        "vec_id",
        F.col("cid").alias("cid_t"),
        cosine(_vec("embedding"), _vec("cv")).alias("s_t"),
    )
    agree = (F.col("cid_f") == F.col("cid_t")).cast("double")
    return fl.join(tl2, "vec_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_probes"),
        F.sum(agree.cast("long")).cast("long").alias("n_agree"),
        F.round(F.avg(agree), 6).alias("recall"),
        F.round(
            F.avg(F.round(F.col("s_f") - F.col("s_t"), 6)), 5
        ).alias("avg_score_gap"),
    )


# --------------------------------------------------------------------------
# Round-6 wave: corpus-growth curves, distribution fits, concentration,
# assignment-distribution divergence, agreement statistics
# --------------------------------------------------------------------------

# Shared by q257/q262: DuckDB CTE assigning every document a 1..10 decile
# by doc_id rank. The Spark side rides group_ranked (the distributed rank
# frame) — never a global row_number window over the doc spine.
_DK_DOC_DECILES = """
    rk AS (SELECT doc_id,
                  row_number() OVER (ORDER BY doc_id) AS rn,
                  count(*) OVER () AS n
           FROM documents),
    dec AS (SELECT doc_id, CAST(((rn - 1) * 10) // n AS INT) + 1 AS decile
            FROM rk)
"""


def _doc_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, decile 1..10) by doc_id rank — distributed rank frame
    (group_ranked with no keys), integer decile arithmetic so both
    engines bucket identically (no float division at the boundary)."""
    from etl_jetro_spark.operators.aggregate import group_ranked

    d = load(spark, sf_dir, "documents").select("doc_id")
    rk = group_ranked(d, [], "doc_id")
    return rk.select(
        F.col("_v").alias("doc_id"),
        (F.expr("((_rn - 1) * 10) DIV _n") + 1).cast("int").alias("decile"),
    )


@query(
    "q257_heaps_vocab_growth",
    f"""
    WITH wr AS (SELECT doc_id, list_filter({DK_WORDS}, x -> x <> '') AS w
                FROM documents),
    toks AS (
      SELECT doc_id, w[i] AS t FROM wr,
             UNNEST(generate_series(1, len(w))) AS s(i)
    ),
    {_DK_DOC_DECILES},
    per_docs AS (SELECT decile, count(*) AS nd FROM dec GROUP BY decile),
    ntok AS (SELECT d.decile, count(*) AS nt
             FROM toks JOIN dec d USING (doc_id) GROUP BY d.decile),
    firsts AS (SELECT t, min(doc_id) AS fdoc FROM toks GROUP BY t),
    nv AS (SELECT d.decile, count(*) AS v
           FROM firsts f JOIN dec d ON d.doc_id = f.fdoc GROUP BY d.decile),
    per AS (SELECT p.decile, p.nd,
                   coalesce(ntok.nt, 0) AS nt, coalesce(nv.v, 0) AS v
            FROM per_docs p
            LEFT JOIN ntok ON ntok.decile = p.decile
            LEFT JOIN nv ON nv.decile = p.decile)
    SELECT a.decile,
           CAST(sum(b.nd) AS BIGINT) AS cum_docs,
           CAST(sum(b.nt) AS BIGINT) AS cum_tokens,
           CAST(sum(b.v) AS BIGINT)  AS vocab,
           CASE WHEN sum(b.nt) > 1 AND sum(b.v) > 0
                THEN round(ln(sum(b.v)) / ln(sum(b.nt)), 6) END AS heaps_beta
    FROM per a JOIN per b ON b.decile <= a.decile
    GROUP BY a.decile
    """,
)
def q257_heaps_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary growth curve: cumulative distinct vocabulary
    vs cumulative token count at ten corpus checkpoints (doc_id-rank
    deciles) — the saturation diagnostic that tells a data pipeline
    whether more of the same source still adds new vocabulary, plus the
    pointwise Heaps exponent ln V / ln N. Distributed shape: token
    explode is partition-local; first-appearance = min(doc_id) per token
    (one vocab-sized shuffle); doc ranks ride group_ranked (never a
    global window over the doc spine); the cumulative step is a
    10x10 triangular self-join on the decile aggregate — window-free,
    so the 10-row frame needs no SinglePartition exchange."""
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.explode(
            F.filter(F.split(EF.norm_text("text"), " "), lambda w: w != "")
        ).alias("t"),
    )
    dec = _doc_deciles(spark, sf_dir)
    per_docs = dec.groupBy("decile").agg(F.count(F.lit(1)).alias("nd"))
    ntok = (
        toks.join(dec, "doc_id")
        .groupBy("decile")
        .agg(F.count(F.lit(1)).alias("nt"))
    )
    firsts = toks.groupBy("t").agg(F.min("doc_id").alias("fdoc"))
    nv = (
        firsts.join(dec, firsts.fdoc == dec.doc_id)
        .groupBy("decile")
        .agg(F.count(F.lit(1)).alias("v"))
    )
    per = (
        per_docs.join(ntok, "decile", "left")
        .join(nv, "decile", "left")
        .select(
            "decile",
            "nd",
            F.coalesce("nt", F.lit(0)).alias("nt"),
            F.coalesce("v", F.lit(0)).alias("v"),
        )
    )
    a, b = per.alias("a"), per.alias("b")
    cum = (
        a.join(b, F.col("b.decile") <= F.col("a.decile"))
        .groupBy(F.col("a.decile").alias("decile"))
        .agg(
            F.sum("b.nd").cast("long").alias("cum_docs"),
            F.sum("b.nt").cast("long").alias("cum_tokens"),
            F.sum("b.v").cast("long").alias("vocab"),
        )
    )
    return cum.select(
        "decile",
        "cum_docs",
        "cum_tokens",
        "vocab",
        F.when(
            (F.col("cum_tokens") > 1) & (F.col("vocab") > 0),
            F.round(F.log("vocab") / F.log("cum_tokens"), 6),
        ).alias("heaps_beta"),
    )


@query(
    "q258_zipf_slope",
    f"""
    WITH wr AS (SELECT lang, list_filter({DK_WORDS}, x -> x <> '') AS w
                FROM documents),
    toks AS (
      SELECT lang, w[i] AS t FROM wr,
             UNNEST(generate_series(1, len(w))) AS s(i)
    ),
    cnt AS (SELECT lang, t, count(*) AS c FROM toks GROUP BY lang, t),
    top AS (
      SELECT lang, c,
             row_number() OVER (PARTITION BY lang
                                ORDER BY c DESC, t ASC) AS r
      FROM cnt QUALIFY r <= 200
    ),
    xy AS (SELECT lang, ln(r) AS x, ln(c) AS y FROM top),
    s AS (SELECT lang, CAST(count(*) AS DOUBLE) AS n,
                 sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
                 sum(x * x) AS sxx, sum(y * y) AS syy
          FROM xy GROUP BY lang)
    SELECT lang, CAST(n AS BIGINT) AS n_tokens,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 4) AS slope,
           round((sy - sx * (n * sxy - sx * sy) / (n * sxx - sx * sx)) / n,
                 4) AS intercept,
           round(pow(n * sxy - sx * sy, 2)
                 / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 4) AS r2
    FROM s
    """,
)
def q258_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit per language: OLS slope of ln(frequency) on
    ln(rank) over each language's top-200 tokens — the
    natural-language sanity check of a crawl (clean text sits near
    slope -1; boilerplate/spam flattens it). One token-count shuffle;
    the rank window is PARTITIONED by lang over the post-agg count
    frame (vocab-sized, sublinear in the corpus) and WindowGroupLimit
    prunes it to 200 rows per lang; the OLS reduce is langs-sized.
    Closed-form moment OLS keeps both engines in exact agreement at
    4 dp."""
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "lang",
        F.explode(
            F.filter(F.split(EF.norm_text("text"), " "), lambda w: w != "")
        ).alias("t"),
    )
    cnt = toks.groupBy("lang", "t").agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("lang").orderBy(F.col("c").desc(), F.col("t").asc())
    top = cnt.withColumn("r", F.row_number().over(w)).filter(F.col("r") <= 200)
    xy = top.select("lang", F.log("r").alias("x"), F.log("c").alias("y"))
    s = xy.groupBy("lang").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    deny = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return s.select(
        "lang",
        F.col("n").cast("long").alias("n_tokens"),
        F.round(num / den, 4).alias("slope"),
        F.round((F.col("sy") - F.col("sx") * num / den) / F.col("n"), 4).alias(
            "intercept"
        ),
        F.round(F.pow(num, 2) / (den * deny), 4).alias("r2"),
    )


@query(
    "q259_doc_repetition",
    f"""
    WITH {_dk_shingles_cte(3).lstrip()},
    per_pair AS (SELECT doc_id, sh, count(*) AS c FROM sh
                 GROUP BY doc_id, sh),
    per_doc AS (SELECT doc_id,
                       CAST(sum(c) AS DOUBLE) AS tot,
                       CAST(count(*) AS DOUBLE) AS dis,
                       max(c) AS mx
                FROM per_pair GROUP BY doc_id),
    rep AS (SELECT d.source, 1 - p.dis / p.tot AS r, p.mx
            FROM per_doc p JOIN documents d USING (doc_id))
    SELECT source,
           CAST(count(*) AS BIGINT)                            AS n_docs,
           round(avg(r), 6)                                    AS avg_repetition,
           round(avg(CASE WHEN r > 0.2 THEN 1.0 ELSE 0.0 END), 6)
                                                               AS share_repetitive,
           round(max(r), 6)                                    AS max_repetition,
           CAST(max(mx) AS BIGINT)                             AS max_shingle_count
    FROM rep GROUP BY source
    """,
)
def q259_doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITHIN-document repetition audit: per doc, 1 - distinct/total
    3-word shingle mass (the boilerplate/template-loop signal CCNet-style
    LINE dedup misses when the repetition is intra-document), rolled up
    per source with the share of docs above the 0.2 repetition gate.
    Docs with fewer than 3 words carry no shingles and are excluded.
    Scale shape: shingle explode and the (doc_id, sh) count are
    partition-local until ONE doc-keyed shuffle; everything after is
    source-sized. No pair joins anywhere — repetition is a per-doc
    aggregate, not a similarity query."""
    from etl_jetro_spark.operators.dedup import shingle_rows

    d = load(spark, sf_dir, "documents")
    sh = shingle_rows(d, "doc_id", "text", 3, distinct=False).select(
        F.col("_id").alias("doc_id"), F.col("_sh").alias("sh")
    )
    per_pair = sh.groupBy("doc_id", "sh").agg(F.count(F.lit(1)).alias("c"))
    per_doc = per_pair.groupBy("doc_id").agg(
        F.sum("c").cast("double").alias("tot"),
        F.count(F.lit(1)).cast("double").alias("dis"),
        F.max("c").alias("mx"),
    )
    rep = per_doc.join(
        d.select("doc_id", "source"), "doc_id"
    ).select("source", (1 - F.col("dis") / F.col("tot")).alias("r"), "mx")
    return rep.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.round(F.avg("r"), 6).alias("avg_repetition"),
        F.round(F.avg((F.col("r") > 0.2).cast("double")), 6).alias(
            "share_repetitive"
        ),
        F.round(F.max("r"), 6).alias("max_repetition"),
        F.max("mx").cast("long").alias("max_shingle_count"),
    )


@query(
    "q260_label_cluster_divergence",
    f"""
    WITH emb AS (
      SELECT vec_id, label,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings),
    c AS (SELECT vec_id AS cid, v AS cv FROM emb WHERE vec_id < 32),
    assigned AS (
      SELECT vec_id, label, cid FROM (
        SELECT e.vec_id, e.label, c.cid,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY {_Q146_COS.format(a='e.v', b='c.cv')} DESC, c.cid
               ) AS rn
        FROM emb e CROSS JOIN c) WHERE rn = 1),
    cellcnt AS (SELECT label, cid, count(*) AS n
                FROM assigned GROUP BY label, cid),
    ltot AS (SELECT label, CAST(sum(n) AS DOUBLE) AS nl FROM cellcnt
             GROUP BY label),
    grid AS (SELECT l.label, c.cid, l.nl,
                    coalesce(cc.n, 0) AS n
             FROM ltot l CROSS JOIN c
             LEFT JOIN cellcnt cc ON cc.label = l.label AND cc.cid = c.cid),
    p AS (SELECT label, cid, (n + 1) / (nl + 32) AS p FROM grid),
    pairs AS (
      SELECT a.label AS la, b.label AS lb, a.p AS pa, b.p AS pb
      FROM p a JOIN p b ON a.cid = b.cid AND a.label < b.label)
    SELECT la, lb,
           round(0.5 * sum(pa * ln(2 * pa / (pa + pb)))
               + 0.5 * sum(pb * ln(2 * pb / (pa + pb))), 6) AS js
    FROM pairs GROUP BY la, lb
    """,
)
def q260_label_cluster_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution divergence between label groups in EMBEDDING space:
    assign every vector to its nearest of 32 anchor centroids (the exact
    ivf_assign argmax, same ties->lowest-cid rule the oracle replays),
    build each label's add-1-smoothed distribution over the 32 cells,
    and report Jensen-Shannon divergence for every label pair — the
    MAUVE-style "are these two sources/stages drawn from the same
    embedding distribution" audit, SQL-expressible because the cell
    histogram replaces a density model. Scale shape: one n-row
    assignment shuffle; everything after is (labels x 32)-bounded."""
    from etl_jetro_spark.operators.similarity import ivf_assign

    emb = load(spark, sf_dir, "embeddings")
    cents = emb.filter(F.col("vec_id") < 32).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")
    )
    assigned = ivf_assign(emb, "vec_id", "embedding", cents)
    cellcnt = (
        assigned.join(emb.select("vec_id", "label"), "vec_id")
        .groupBy("label", "cid")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    ltot = cellcnt.groupBy("label").agg(
        F.sum("n").cast("double").alias("nl")
    )
    grid = (
        ltot.crossJoin(bcast_small(cents.select("cid")))
        .join(cellcnt, ["label", "cid"], "left")
        .select(
            "label",
            "cid",
            ((F.coalesce("n", F.lit(0)) + 1) / (F.col("nl") + 32)).alias("p"),
        )
    )
    a = grid.select(
        F.col("label").alias("la"), "cid", F.col("p").alias("pa")
    )
    b = grid.select(
        F.col("label").alias("lb"), "cid", F.col("p").alias("pb")
    )
    pairs = a.join(b, "cid").filter(F.col("la") < F.col("lb"))
    return pairs.groupBy("la", "lb").agg(
        F.round(
            0.5
            * F.sum(
                F.col("pa") * F.log(2 * F.col("pa") / (F.col("pa") + F.col("pb")))
            )
            + 0.5
            * F.sum(
                F.col("pb") * F.log(2 * F.col("pb") / (F.col("pa") + F.col("pb")))
            ),
            6,
        ).alias("js")
    )


@query(
    "q261_langid_kappa",
    f"""
    WITH hits AS (
      SELECT doc_id, lang,
             len(list_filter(string_split({DK_NORM_TEXT}, ' '),
                             x -> list_contains({_dk_stop_list('en')}, x))) AS h_en,
             len(list_filter(string_split({DK_NORM_TEXT}, ' '),
                             x -> list_contains({_dk_stop_list('es')}, x))) AS h_es,
             len(list_filter(string_split({DK_NORM_TEXT}, ' '),
                             x -> list_contains({_dk_stop_list('de')}, x))) AS h_de,
             len(list_filter(string_split({DK_NORM_TEXT}, ' '),
                             x -> list_contains({_dk_stop_list('fr')}, x))) AS h_fr
      FROM documents
    ),
    pred AS (
      SELECT lang AS declared,
             CASE
               WHEN greatest(h_en, h_es, h_de, h_fr) = 0 THEN 'und'
               WHEN h_en = greatest(h_en, h_es, h_de, h_fr) THEN 'en'
               WHEN h_es = greatest(h_en, h_es, h_de, h_fr) THEN 'es'
               WHEN h_de = greatest(h_en, h_es, h_de, h_fr) THEN 'de'
               ELSE 'fr'
             END AS predicted
      FROM hits
    ),
    cells AS (SELECT declared, predicted, count(*) AS n FROM pred
              GROUP BY declared, predicted),
    tot AS (SELECT CAST(sum(n) AS DOUBLE) AS nn FROM cells),
    rowt AS (SELECT declared AS cls, sum(n) AS nr FROM cells GROUP BY declared),
    colt AS (SELECT predicted AS cls, sum(n) AS nc FROM cells GROUP BY predicted),
    po AS (SELECT sum(CASE WHEN declared = predicted THEN n ELSE 0 END) AS agree
           FROM cells),
    pe AS (SELECT sum(r.nr * c.nc) AS e
           FROM rowt r JOIN colt c ON r.cls = c.cls)
    SELECT CAST(tot.nn AS BIGINT) AS n_docs,
           round(po.agree / tot.nn, 6) AS po,
           round(pe.e / (tot.nn * tot.nn), 6) AS pe,
           round((po.agree / tot.nn - pe.e / (tot.nn * tot.nn))
                 / (1 - pe.e / (tot.nn * tot.nn)), 6) AS kappa
    FROM tot CROSS JOIN po CROSS JOIN pe
    """,
)
def q261_langid_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between the declared ``lang`` label and the
    stopword-heuristic detector — the chance-corrected agreement scalar
    that q231's confusion matrix summarizes to (kappa near 0 means the
    labels carry no more signal than the marginals; the metric that
    decides if declared labels are trustworthy enough to gate the mix).
    Detection is partition-local; all reduction frames are
    langs-bounded."""
    pred = load(spark, sf_dir, "documents").select(
        F.col("lang").alias("declared"), O.lang_id("text").alias("predicted")
    )
    cells = pred.groupBy("declared", "predicted").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = cells.agg(F.sum("n").cast("double").alias("nn"))
    rowt = cells.groupBy(F.col("declared").alias("cls")).agg(
        F.sum("n").alias("nr")
    )
    colt = cells.groupBy(F.col("predicted").alias("cls")).agg(
        F.sum("n").alias("nc")
    )
    po = cells.agg(
        F.sum(
            F.when(F.col("declared") == F.col("predicted"), F.col("n")).otherwise(
                0
            )
        ).alias("agree")
    )
    pe = rowt.join(colt, "cls").agg(
        F.sum(F.col("nr") * F.col("nc")).alias("e")
    )
    poc = F.col("agree") / F.col("nn")
    pec = F.col("e") / (F.col("nn") * F.col("nn"))
    return (
        tot.crossJoin(bcast_small(po))
        .crossJoin(bcast_small(pe))
        .select(
            F.col("nn").cast("long").alias("n_docs"),
            F.round(poc, 6).alias("po"),
            F.round(pec, 6).alias("pe"),
            F.round((poc - pec) / (1 - pec), 6).alias("kappa"),
        )
    )


@query(
    "q262_novelty_decile",
    f"""
    WITH {_dk_shingles_cte(5).lstrip()},
    dsh AS (SELECT DISTINCT doc_id, sh FROM sh),
    firsts AS (SELECT sh, min(doc_id) AS fdoc FROM dsh GROUP BY sh),
    per_doc AS (
      SELECT d.doc_id,
             CAST(count(*) AS DOUBLE) AS nd,
             CAST(sum(CASE WHEN f.fdoc = d.doc_id THEN 1 ELSE 0 END)
                  AS DOUBLE) AS novel
      FROM dsh d JOIN firsts f ON f.sh = d.sh
      GROUP BY d.doc_id),
    {_DK_DOC_DECILES.strip().rstrip()}
    SELECT dec.decile,
           CAST(count(*) AS BIGINT)        AS n_docs,
           round(avg(novel / nd), 6)       AS avg_novelty,
           round(min(novel / nd), 6)       AS min_novelty
    FROM per_doc JOIN dec USING (doc_id)
    GROUP BY dec.decile
    """,
)
def q262_novelty_decile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus NOVELTY curve: per document, the fraction of its distinct
    5-word shingles whose global first appearance (min doc_id) is the
    document itself, aggregated over doc_id-rank deciles — the
    "is new data still new" trend an ingestion pipeline watches to
    decide when a source is mined out (the streaming twin of q74's
    incremental dedup, as a curve instead of a verdict). Docs with
    fewer than 5 words carry no shingles and are excluded. One
    shingle-keyed shuffle for first-appearance, one doc-keyed for the
    per-doc ratio; deciles ride group_ranked (no global window)."""
    from etl_jetro_spark.operators.dedup import shingle_rows

    d = load(spark, sf_dir, "documents")
    # r11: the old shape joined the full shingle-incidence frame back
    # onto the first-appearance frame and aggregated the JOINED rows by
    # doc — a full-frame join plus a full-frame doc shuffle. But
    # "novel" is just a credit of +1 to each shingle's min(doc_id), so
    # per-doc novelty = count of firsts rows per fdoc — and both aggs
    # partial-aggregate map-side, so the two exchanges now carry
    # doc-/shingle-NDV-sized partials instead of the raw incidence
    # stream. The barrier runs the shingling once for both consumers.
    dsh = shingle_rows(d, "doc_id", "text", 5, distinct=True).select(
        F.col("_id").alias("doc_id"), F.col("_sh").alias("sh")
    ).localCheckpoint(eager=False)
    nd = dsh.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("double").alias("nd")
    )
    novel = (
        dsh.groupBy("sh")
        .agg(F.min("doc_id").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("double").alias("novel"))
    )
    per_doc = nd.join(novel, "doc_id", "left").select(
        "doc_id", "nd", F.coalesce("novel", F.lit(0.0)).alias("novel")
    )
    dec = _doc_deciles(spark, sf_dir)
    nv = F.col("novel") / F.col("nd")
    return (
        per_doc.join(dec, "doc_id")
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.round(F.avg(nv), 6).alias("avg_novelty"),
            F.round(F.min(nv), 6).alias("min_novelty"),
        )
    )


@query(
    "q263_region_revenue_gini",
    f"""
    WITH rev AS (
      SELECT r.r_name AS region, o.o_custkey AS ck,
             CAST(sum({sql_micro_units('o.o_totalprice')}) AS BIGINT) AS x
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      GROUP BY r.r_name, o.o_custkey),
    rk AS (SELECT region, x,
                  row_number() OVER (PARTITION BY region
                                     ORDER BY x, ck) AS rn
           FROM rev)
    SELECT region,
           CAST(count(*) AS BIGINT)        AS n_cust,
           round(CAST(CAST(sum(x) AS HUGEINT) AS DOUBLE) / 1000000, 2)
             AS total_rev,
           round((2.0 * CAST(sum(CAST(rn AS HUGEINT) * x) AS DOUBLE)
                  - (count(*) + 1) * CAST(CAST(sum(x) AS HUGEINT) AS DOUBLE))
                 / (count(*) * CAST(CAST(sum(x) AS HUGEINT) AS DOUBLE)),
                 6) AS gini
    FROM rk GROUP BY region
    """,
)
def q263_region_revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT Gini coefficient of per-customer revenue concentration by
    region (G = (2·Σ rank·x − (n+1)·Σx) / (n·Σx) over ascending
    revenues) — the inequality scalar behind q138-style concentration
    audits, needing a full per-group rank, not a top-k. The rank rides
    ``group_ranked`` (range-partitioned rank frame, per-cell offsets
    broadcast — no region-partitioned window over the customer-scale
    frame, which region's 5-value skew would serialize); the Gini
    reduce is region-sized. Customers without orders hold no revenue
    row and are excluded (the lending-book convention)."""
    from etl_jetro_spark.operators.aggregate import group_ranked

    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    rev = (
        o.join(bcast_sized(c), o.o_custkey == c.c_custkey)
        .join(bcast_small(n), c.c_nationkey == n.n_nationkey)
        .join(bcast_small(r), n.n_regionkey == r.r_regionkey)
        .groupBy(
            F.col("r_name").alias("region"), F.col("o_custkey").alias("ck")
        )
        .agg(M.sum_micro("o_totalprice").cast("long").alias("x"))
    )
    rk = group_ranked(rev, ["region"], "x", tiebreak=["ck"])
    # exact integer Gini arithmetic (q163's fix applied per region):
    # micro-dollar units cancel in the ratio; only total_rev converts
    tot = F.sum(F.col("_v").cast("decimal(38,0)"))
    cnt = F.count(F.lit(1))
    return rk.groupBy("region").agg(
        cnt.cast("long").alias("n_cust"),
        F.round(tot.cast("double") / M.MICRO, 2).alias("total_rev"),
        F.round(
            (
                2.0
                * F.sum(
                    F.col("_rn").cast("decimal(19,0)")
                    * F.col("_v").cast("decimal(19,0)")
                ).cast("double")
                - (cnt + 1) * tot.cast("double")
            )
            / (cnt * tot.cast("double")),
            6,
        ).alias("gini"),
    )


@query(
    "q264_packing_efficiency",
    f"""
    WITH nt AS (
      SELECT doc_id,
             len(list_filter({DK_WORDS}, x -> x <> '')) AS n
      FROM documents),
    lens AS (SELECT * FROM (VALUES (128), (256), (512)) AS t(max_len)),
    x AS (SELECT l.max_len, nt.n,
                 (nt.n + l.max_len - 1) // l.max_len AS chunks
          FROM nt CROSS JOIN lens l WHERE nt.n > 0)
    SELECT max_len,
           CAST(count(*) AS BIGINT)                  AS n_docs,
           CAST(sum(n) AS BIGINT)                    AS total_tokens,
           CAST(sum(chunks) AS BIGINT)               AS total_chunks,
           round(sum(n) / CAST(sum(chunks) * max_len AS DOUBLE), 6)
                                                     AS utilization,
           round(avg(CAST(chunks AS DOUBLE)), 6)     AS avg_chunks_per_doc
    FROM x GROUP BY max_len
    """,
)
def q264_packing_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window packing efficiency sweep: for each candidate
    max_len, the chunk count and pad-waste if every document is split
    into ceil(tokens/max_len) fixed-size windows — the token-budget
    planning number that decides sequence length for a training run
    (utilization = real tokens / padded slots; the q62 chunker's
    capacity-planning twin). Token counts are partition-local; the
    3-row length frame cross-joins in; integer ceil-division keeps both
    engines exact."""
    d = load(spark, sf_dir, "documents")
    nt = d.select(
        "doc_id",
        F.size(
            F.filter(F.split(EF.norm_text("text"), " "), lambda w: w != "")
        ).alias("n"),
    ).filter(F.col("n") > 0)
    lens = spark.range(3).select(
        F.element_at(
            F.array(F.lit(128), F.lit(256), F.lit(512)),
            (F.col("id") + 1).cast("int"),
        ).alias("max_len")
    )
    x = nt.crossJoin(bcast_small(lens)).select(
        "max_len",
        "n",
        F.expr("(n + max_len - 1) DIV max_len").alias("chunks"),
    )
    return x.groupBy("max_len").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n").cast("long").alias("total_tokens"),
        F.sum("chunks").cast("long").alias("total_chunks"),
        F.round(
            F.sum("n") / (F.sum("chunks") * F.col("max_len")).cast("double"),
            6,
        ).alias("utilization"),
        F.round(F.avg(F.col("chunks").cast("double")), 6).alias(
            "avg_chunks_per_doc"
        ),
    )


@query(
    "q265_cohort_ltv",
    f"""
    WITH f AS (SELECT o_custkey, min(o_orderdate) AS fd FROM orders
               GROUP BY o_custkey),
    csize AS (SELECT CAST(date_trunc('month', fd) AS DATE) AS cohort,
                     CAST(count(*) AS BIGINT) AS n_cohort
              FROM f GROUP BY 1),
    cell AS (
      SELECT CAST(date_trunc('month', f.fd) AS DATE) AS cohort,
             (year(o.o_orderdate) * 12 + month(o.o_orderdate))
             - (year(f.fd) * 12 + month(f.fd)) AS months_since,
             CAST((2 * {sql_sum_micro('o.o_totalprice')} + 10000)
                  // 20000 AS BIGINT) AS rev_c
      FROM orders o JOIN f ON f.o_custkey = o.o_custkey
      GROUP BY 1, 2),
    cum AS (SELECT cohort, months_since,
                   sum(rev_c) OVER (PARTITION BY cohort ORDER BY months_since
                                    ROWS UNBOUNDED PRECEDING) AS cum_c
            FROM cell)
    SELECT cum.cohort, cum.months_since, csize.n_cohort,
           ((2 * cum.cum_c * 100 + csize.n_cohort)
            // (2 * csize.n_cohort)) / 10000.0 AS ltv_per_cust
    FROM cum JOIN csize ON csize.cohort = cum.cohort
    """,
)
def q265_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV curves: customers grouped by first-order month, then
    cumulative revenue per cohort member at each month-since-first —
    the retention-economics matrix (rows = cohorts, columns = account
    age) behind q179's retention counts. Month arithmetic is integer
    (year*12+month), immune to month-length/tz edge cases. Shapes: one
    customer-keyed first-order aggregate, one (cohort, months)-keyed
    cell aggregate; the running sum windows over the POST-AGG
    cohort-month frame partitioned by cohort (bounded by the date
    span, not the data)."""
    from pyspark.sql import Window

    o = load(spark, sf_dir, "orders")
    f = o.groupBy("o_custkey").agg(F.min("o_orderdate").alias("fd"))
    csize = f.groupBy(
        F.date_trunc("month", "fd").cast("date").alias("cohort")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_cohort"))
    mo = F.year("o_orderdate") * 12 + F.month("o_orderdate")
    mf = F.year("fd") * 12 + F.month("fd")
    cell = (
        o.join(f, "o_custkey")
        .groupBy(
            F.date_trunc("month", "fd").cast("date").alias("cohort"),
            (mo - mf).alias("months_since"),
        )
        # accumulate INTEGER CENTS: a double running sum is association-
        # ordered (DuckDB's windowed sum is a segment tree, Spark's is
        # sequential — they disagree by ulps exactly at round boundaries).
        # Cents come from the EXACT micro-dollar row sum via pure int64
        # half-up division ((2a+b) div 2b) — no float touches money
        # before the final display division (moneylint discipline)
        .agg(
            F.floor(
                (2 * M.sum_micro("o_totalprice") + 10000) / 20000
            )
            .cast("long")
            .alias("rev_c")
        )
    )
    w = (
        Window.partitionBy("cohort")
        .orderBy("months_since")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = cell.withColumn("cum_c", F.sum("rev_c").over(w))
    # 4-dp half-up rounding of cum_c/(100*n) done ENTIRELY in int64
    # ((2a+b) div (2b) = round-half-up(a/b) for positive ints): a float
    # division here lands on .xxxx5 boundaries where Spark (HALF_UP on
    # the double) and DuckDB (round-half-even bankers on binary) split
    return cum.join(bcast_small(csize), "cohort").select(
        "cohort",
        "months_since",
        "n_cohort",
        (
            F.expr("(2 * cum_c * 100 + n_cohort) div (2 * n_cohort)")
            / 10000.0
        ).alias("ltv_per_cust"),
    )


@query(
    "q266_discount_quantity_lift",
    """
    WITH x AS (
      SELECT p.p_brand AS brand,
             CASE WHEN l.l_discount > 0.05 THEN 1 ELSE 0 END AS hi,
             l.l_quantity AS q
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey),
    s AS (SELECT brand,
                 CAST(sum(hi) AS BIGINT) AS n_hi,
                 CAST(sum(1 - hi) AS BIGINT) AS n_lo,
                 sum(CASE WHEN hi = 1 THEN q END) AS sq_hi,
                 sum(CASE WHEN hi = 0 THEN q END) AS sq_lo
          FROM x GROUP BY brand)
    SELECT brand, n_hi, n_lo,
           round(sq_hi / n_hi, 4)             AS avg_qty_hi,
           round(sq_lo / n_lo, 4)             AS avg_qty_lo,
           round((sq_hi / n_hi) / (sq_lo / n_lo), 6) AS lift
    FROM s WHERE n_hi >= 30 AND n_lo >= 30
    """,
)
def q266_discount_quantity_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discount->quantity lift per brand (price-elasticity proxy): mean
    quantity in deep-discount lines (>5%) vs shallow, brands with at
    least 30 observations on each side — the merchandising twin of
    q247's correlation, as a ratio effect size. Single lineitem⋈part
    pass (part SIZE-GATED broadcast — grows with the catalog), one
    brand-sized aggregate; the lift arithmetic is derived from sums so
    both engines divide identical numbers."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    hi = (F.col("l_discount") > 0.05).cast("int")
    s = (
        li.join(bcast_sized(p), li.l_partkey == p.p_partkey)
        .select(F.col("p_brand").alias("brand"), hi.alias("hi"),
                F.col("l_quantity").alias("q"))
        .groupBy("brand")
        .agg(
            F.sum("hi").cast("long").alias("n_hi"),
            F.sum(1 - F.col("hi")).cast("long").alias("n_lo"),
            F.sum(F.when(F.col("hi") == 1, F.col("q"))).alias("sq_hi"),
            F.sum(F.when(F.col("hi") == 0, F.col("q"))).alias("sq_lo"),
        )
    )
    return s.filter((F.col("n_hi") >= 30) & (F.col("n_lo") >= 30)).select(
        "brand",
        "n_hi",
        "n_lo",
        F.round(F.col("sq_hi") / F.col("n_hi"), 4).alias("avg_qty_hi"),
        F.round(F.col("sq_lo") / F.col("n_lo"), 4).alias("avg_qty_lo"),
        F.round(
            (F.col("sq_hi") / F.col("n_hi")) / (F.col("sq_lo") / F.col("n_lo")),
            6,
        ).alias("lift"),
    )


# --------------------------------------------------------------------------
# Round-7 wave: memorization/contamination audits, mixture planning,
# dedup-signal agreement, code-switching, filter sweeps, drift, style
# --------------------------------------------------------------------------

@query(
    "q267_memorization_spans",
    f"""
    WITH {_dk_shingles_cte(6).lstrip()},
    dsh AS (SELECT DISTINCT doc_id, sh FROM sh),
    reach AS (SELECT sh, CAST(count(*) AS BIGINT) AS n_docs
              FROM dsh GROUP BY sh HAVING count(*) >= 2),
    hits AS (SELECT d.doc_id, d.sh, r.n_docs
             FROM dsh d JOIN reach r USING (sh))
    SELECT doc.source,
           CAST(count(DISTINCT h.sh) AS BIGINT)     AS n_risky_spans,
           CAST(count(DISTINCT h.doc_id) AS BIGINT) AS n_docs_affected,
           CAST(max(h.n_docs) AS BIGINT)            AS max_span_reach
    FROM hits h JOIN documents doc ON doc.doc_id = h.doc_id
    GROUP BY doc.source
    """,
)
def q267_memorization_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Verbatim-span MEMORIZATION audit: 6-word shingles appearing in
    >= 2 distinct documents are the spans a model is most likely to
    memorize verbatim (the long-n-gram twin of q72's decontamination —
    there the reference set is external, here the corpus leaks into
    itself). Per source: distinct risky spans, documents carrying one,
    and the widest span reach. Scale shape: codegen shingle_rows
    (zero-shuffle generation), ONE shingle-keyed count shuffle, the
    reach frame joins back shingle-keyed (plain join — its size tracks
    duplicate mass, so no forced broadcast), one source-sized rollup."""
    from etl_jetro_spark.operators.dedup import shingle_rows

    d = load(spark, sf_dir, "documents")
    dsh = shingle_rows(d, "doc_id", "text", 6, distinct=True)
    reach = (
        dsh.groupBy("_sh")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .filter(F.col("n_docs") >= 2)
    )
    hits = dsh.join(reach, "_sh")
    per = hits.join(
        d.select("doc_id", "source"), hits["_id"] == F.col("doc_id")
    )
    return per.groupBy("source").agg(
        F.countDistinct("_sh").cast("long").alias("n_risky_spans"),
        F.countDistinct("doc_id").cast("long").alias("n_docs_affected"),
        F.max("n_docs").cast("long").alias("max_span_reach"),
    )


_Q268_TARGETS = (("en", 0.40), ("de", 0.20), ("fr", 0.20), ("es", 0.15), ("zh", 0.05))
_Q268_BUDGET = 1_000_000


@query(
    "q268_mixture_epoch_plan",
    f"""
    WITH tok AS (
      SELECT lang,
             CAST(sum(CASE WHEN trim(text) = '' THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\\s+')) END)
                  AS BIGINT) AS avail_tokens
      FROM documents GROUP BY lang),
    tgt AS (SELECT * FROM (VALUES
      {', '.join(f"('{lang}', CAST({w} AS DOUBLE))" for lang, w in _Q268_TARGETS)}
    ) AS t(lang, w))
    SELECT tok.lang, avail_tokens,
           CAST(round({_Q268_BUDGET} * w) AS BIGINT) AS needed_tokens,
           CAST(ceil(round({_Q268_BUDGET} * w) / avail_tokens) AS BIGINT)
             AS epochs,
           round(round({_Q268_BUDGET} * w) / avail_tokens, 6) AS oversample
    FROM tok JOIN tgt USING (lang)
    """,
)
def q268_mixture_epoch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-MIXTURE epoch planner: given a target language mixture and a
    token budget, how many epochs of each language's available tokens the
    sampler must take (epochs > 1 = the source repeats; the oversample
    ratio is the exact repetition factor) — the planning table behind
    q176's mixture resampler, answering "can this corpus even serve the
    target mix" before any sampling runs. One lang-keyed partial-agg
    shuffle; everything after is mixture-sized arithmetic."""
    from etl_jetro_spark.operators.textstats import token_count

    d = load(spark, sf_dir, "documents")
    tok = d.groupBy("lang").agg(
        F.sum(token_count("text")).cast("long").alias("avail_tokens")
    )
    tmap = F.create_map(
        *[x for lang, w in _Q268_TARGETS for x in (F.lit(lang), F.lit(w))]
    )
    planned = tok.withColumn("w", tmap[F.col("lang")]).filter(
        F.col("w").isNotNull()
    )
    needed = F.round(F.lit(float(_Q268_BUDGET)) * F.col("w")).cast("long")
    ratio = needed / F.col("avail_tokens")
    return planned.select(
        "lang",
        "avail_tokens",
        needed.alias("needed_tokens"),
        F.ceil(ratio).cast("long").alias("epochs"),
        F.round(ratio, 6).alias("oversample"),
    )


@query(
    "q269_lexical_semantic_agreement",
    f"""
    WITH {_dk_shingles_cte(3).lstrip()},
    mh AS (
      SELECT d.doc_id, s.seed,
             coalesce(min(md5(CAST(s.seed AS VARCHAR) || ':' || sh.sh)),
                      md5(CAST(s.seed AS VARCHAR) || ':')) AS mh
      FROM documents d
      CROSS JOIN (SELECT unnest(generate_series(0, {_MINHASHES - 1})) AS seed) s
      LEFT JOIN sh ON sh.doc_id = d.doc_id
      GROUP BY d.doc_id, s.seed
    ),
    bandkeys AS (
      SELECT doc_id,
             md5(CAST(seed // {_RPB} AS VARCHAR) || ',' ||
                 string_agg(mh, ',' ORDER BY seed)) AS bk
      FROM mh GROUP BY doc_id, seed // {_RPB}
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bandkeys a JOIN bandkeys b ON a.bk = b.bk AND a.doc_id < b.doc_id
    ),
    est AS (
      SELECT c.id_a, c.id_b,
             sum(CASE WHEN x.mh = y.mh THEN 1 ELSE 0 END) / {_MINHASHES}.0
               AS est_jaccard
      FROM cand c
      JOIN mh x ON x.doc_id = c.id_a
      JOIN mh y ON y.doc_id = c.id_b AND y.seed = x.seed
      GROUP BY c.id_a, c.id_b
    ),
    emb AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
            FROM embeddings),
    scored AS (
      SELECT e.est_jaccard,
             round({_Q146_COS.format(a='a.v', b='b.v')}, 6) AS cos
      FROM est e
      JOIN emb a ON a.vec_id = e.id_a
      JOIN emb b ON b.vec_id = e.id_b
    )
    SELECT CASE WHEN est_jaccard >= 1.0 THEN 'exact-signature'
                ELSE 'partial-signature' END                 AS lexical_band,
           CAST(count(*) AS BIGINT)                          AS n_pairs,
           round(avg(est_jaccard), 6)                        AS avg_est_jaccard,
           round(avg(cos), 4)                                AS avg_cosine,
           round(avg(CASE WHEN cos > 0 THEN 1.0 ELSE 0.0 END), 6)
                                                             AS share_cos_positive
    FROM scored GROUP BY 1
    """,
)
def q269_lexical_semantic_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-SIGNAL agreement audit: do LEXICAL near-dups (MinHash-LSH
    estimate >= 0.5, q18's machinery) and SEMANTIC near-dups (embedding
    cosine, q146's signal) agree? Per lexical band (exact vs partial
    signature match), the mean embedding cosine and the share of pairs
    with positive cosine calibrate which dedup tier to trust where —
    template clones with swapped entities score high lexically and flat
    semantically (exactly the fixture's shape: its embeddings are
    independent of text, so the audit correctly reports no semantic
    signal). Candidate pairs come from LSH banding
    (never all-pairs); embeddings join per-pair by id (docs and vectors
    share the id space, q200's mapping); everything after is
    pair-bounded."""
    from etl_jetro_spark.operators.similarity import _vec, cosine

    d = load(spark, sf_dir, "documents")
    e = load(spark, sf_dir, "embeddings")
    cands = O.minhash_lsh_candidates(
        d, "doc_id", "text", num_hashes=_MINHASHES, bands=_BANDS, shingle_words=3
    )
    ea = e.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("_va"))
    eb = e.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("_vb"))
    scored = (
        cands.join(ea, "id_a")
        .join(eb, "id_b")
        .select(
            "est_jaccard",
            F.round(cosine(_vec("_va"), _vec("_vb")), 6).alias("cos"),
        )
    )
    band = F.when(
        F.col("est_jaccard") >= 1.0, "exact-signature"
    ).otherwise("partial-signature")
    return scored.groupBy(band.alias("lexical_band")).agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.round(F.avg("est_jaccard"), 6).alias("avg_est_jaccard"),
        F.round(F.avg("cos"), 4).alias("avg_cosine"),
        F.round(F.avg((F.col("cos") > 0).cast("double")), 6).alias(
            "share_cos_positive"
        ),
    )


@query(
    "q270_code_switch_audit",
    f"""
    WITH h AS (
      SELECT source,
             len(list_filter(string_split({DK_NORM_TEXT}, ' '),
                             x -> list_contains({_dk_stop_list('en')}, x))) AS h_en,
             len(list_filter(string_split({DK_NORM_TEXT}, ' '),
                             x -> list_contains({_dk_stop_list('es')}, x))) AS h_es,
             len(list_filter(string_split({DK_NORM_TEXT}, ' '),
                             x -> list_contains({_dk_stop_list('de')}, x))) AS h_de,
             len(list_filter(string_split({DK_NORM_TEXT}, ' '),
                             x -> list_contains({_dk_stop_list('fr')}, x))) AS h_fr,
             CASE WHEN trim(text) = '' THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS nt
      FROM documents),
    s AS (SELECT source, list_sort([h_en, h_es, h_de, h_fr]) AS a, nt FROM h),
    f AS (SELECT source, a[4] AS t1, a[3] AS t2, nt FROM s)
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN t2 >= 2 AND 2 * t2 >= t1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_mixed,
           round(avg(CASE WHEN t2 >= 2 AND 2 * t2 >= t1 THEN 1.0 ELSE 0.0 END),
                 6) AS mixed_share,
           round(avg(CASE WHEN nt > 0 THEN CAST(t1 AS DOUBLE) / nt
                     ELSE 0.0 END), 6) AS avg_top1_ratio
    FROM f GROUP BY source
    """,
)
def q270_code_switch_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CODE-SWITCHING audit: a document whose second-best language
    stopword count is material (>= 2 hits and >= half the best) is
    language-mixed — the doc-level mixture signal q231/q261's
    single-label classifier can't express, and the share a curation
    pipeline watches before trusting doc-level lang routing. All four
    hit counts ride the codegen regexp path (one normalized-text
    evaluation shared by subexpression elimination); per-source
    rollup is the only shuffle."""
    from etl_jetro_spark.operators.textstats import (
        STOPWORD_SETS,
        stopword_hits,
        token_count,
    )

    d = load(spark, sf_dir, "documents")
    arr = F.sort_array(
        F.array(*[stopword_hits("text", lang) for lang in STOPWORD_SETS]),
        asc=False,
    )
    f = d.select(
        "source",
        arr[0].alias("t1"),
        arr[1].alias("t2"),
        token_count("text").alias("nt"),
    )
    mixed = (F.col("t2") >= 2) & (2 * F.col("t2") >= F.col("t1"))
    return f.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(mixed.cast("int")).cast("long").alias("n_mixed"),
        F.round(F.avg(mixed.cast("double")), 6).alias("mixed_share"),
        F.round(
            F.avg(
                F.when(
                    F.col("nt") > 0, F.col("t1").cast("double") / F.col("nt")
                ).otherwise(0.0)
            ),
            6,
        ).alias("avg_top1_ratio"),
    )


_Q271_SCORED_CTE = f"""
    feat AS (
      SELECT doc_id,
             CAST(len(text) AS BIGINT) AS n_chars,
             CAST(CASE WHEN trim(text) = '' THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS INT) AS n_tokens,
             len(regexp_replace(text, '[^.,;:!?''"()\\[\\]-]', '', 'g')) AS n_punct,
             len(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digit,
             len(list_filter(string_split({DK_NORM_TEXT}, ' '),
                             x -> list_contains({_dk_stop_list('en')}, x))) AS n_stop
      FROM documents
    ),
    scored AS (
      SELECT doc_id, n_tokens,
             round(least(n_tokens / 20.0, 1.0) * 0.4
                   + (1 - least(CAST(n_punct AS DOUBLE) / n_chars * 2
                                + CAST(n_digit AS DOUBLE) / n_chars * 2, 1.0)) * 0.3
                   + least(CAST(n_stop AS DOUBLE) / n_tokens * 4, 1.0) * 0.3, 6)
               AS score
      FROM feat WHERE n_chars > 0 AND n_tokens > 0
    )"""


@query(
    "q271_quality_filter_sweep",
    f"""
    WITH {_Q271_SCORED_CTE.lstrip()},
    th AS (SELECT CAST(i AS DOUBLE) / 10 AS threshold
           FROM UNNEST(generate_series(1, 9)) AS t(i)),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS nd,
                   CAST(sum(n_tokens) AS BIGINT) AS ntok FROM scored)
    SELECT th.threshold,
           CAST(sum(CASE WHEN s.score >= th.threshold THEN 1 ELSE 0 END)
                AS BIGINT) AS n_docs_kept,
           round(sum(CASE WHEN s.score >= th.threshold THEN 1.0 ELSE 0.0 END)
                 / tot.nd, 6) AS doc_share,
           CAST(sum(CASE WHEN s.score >= th.threshold THEN s.n_tokens
                    ELSE 0 END) AS BIGINT) AS n_tokens_kept,
           round(CAST(sum(CASE WHEN s.score >= th.threshold THEN s.n_tokens
                          ELSE 0 END) AS DOUBLE) / tot.ntok, 6) AS token_share
    FROM scored s CROSS JOIN th CROSS JOIN tot
    GROUP BY th.threshold, tot.nd, tot.ntok
    """,
)
def q271_quality_filter_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-FILTER threshold sweep: documents and tokens retained at
    each candidate quality-score cutoff 0.1..0.9 — the curve a curation
    pipeline reads to pick the filter operating point (keep 90% of
    tokens vs keep 50%). All nine thresholds evaluate as conditional
    aggregates in ONE scan of the scored frame (no 9x expansion, no
    per-threshold pass); the 1-row result stacks to 9 rows via an
    inline-array explode. Scores and comparisons use q24's exact
    replayed formula, so the boundary behavior is bit-identical on both
    engines."""
    from etl_jetro_spark.operators.textstats import quality_score

    d = load(spark, sf_dir, "documents")
    scored = (
        quality_score(d, "text")
        .filter((F.col("q_n_chars") > 0) & (F.col("q_n_tokens") > 0))
        .select(
            F.col("quality_score").alias("score"),
            F.col("q_n_tokens").alias("n_tokens"),
        )
    )
    ths = [i / 10 for i in range(1, 10)]
    keep = {t: (F.col("score") >= F.lit(t)).cast("long") for t in ths}
    agg = scored.agg(
        F.count(F.lit(1)).alias("_nd"),
        F.sum("n_tokens").alias("_ntok"),
        *[F.sum(keep[t]).alias(f"_d{i}") for i, t in enumerate(ths)],
        *[
            F.sum(keep[t] * F.col("n_tokens")).alias(f"_k{i}")
            for i, t in enumerate(ths)
        ],
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(t).alias("threshold"),
                F.col(f"_d{i}").cast("long").alias("n_docs_kept"),
                F.round(F.col(f"_d{i}") / F.col("_nd"), 6).alias("doc_share"),
                F.col(f"_k{i}").cast("long").alias("n_tokens_kept"),
                F.round(
                    F.col(f"_k{i}").cast("double") / F.col("_ntok"), 6
                ).alias("token_share"),
            )
            for i, t in enumerate(ths)
        ]
    )
    return agg.select(F.explode(rows).alias("_r")).select("_r.*")


@query(
    "q272_source_quality_drift",
    f"""
    WITH {_Q271_SCORED_CTE.lstrip()},
    rk AS (SELECT d.source, s.score,
                  row_number() OVER (PARTITION BY d.source
                                     ORDER BY s.doc_id) AS rn
           FROM scored s JOIN documents d USING (doc_id))
    SELECT source,
           CAST(count(*) AS BIGINT)              AS n_docs,
           round(avg(score), 6)                  AS avg_quality,
           round(regr_slope(score, rn), 5)       AS drift_slope,
           round(corr(CAST(rn AS DOUBLE), score), 5) AS drift_corr
    FROM rk GROUP BY source
    """,
)
def q272_source_quality_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-quality DRIFT screen: per source, the OLS slope (and
    correlation) of quality score against within-source crawl order
    (doc_id rank) — "is this source degrading as we crawl deeper", the
    decision input for per-source depth caps (q175's cap parameter).
    The rank rides group_ranked (range-partitioned, per-cell offsets
    broadcast — no source-partitioned window over the doc-scale frame);
    slope/corr are algebraic one-pass aggregates."""
    from etl_jetro_spark.operators.aggregate import group_ranked
    from etl_jetro_spark.operators.textstats import quality_score

    d = load(spark, sf_dir, "documents")
    scored = (
        quality_score(d, "text")
        .filter((F.col("q_n_chars") > 0) & (F.col("q_n_tokens") > 0))
        .select("doc_id", "source", F.col("quality_score").alias("score"))
    )
    rk = group_ranked(scored.select("source", "doc_id"), ["source"], "doc_id")
    j = rk.select(
        "source", F.col("_v").alias("doc_id"), F.col("_rn").alias("rn")
    ).join(scored.select("doc_id", "score"), "doc_id")
    return j.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.round(F.avg("score"), 6).alias("avg_quality"),
        F.round(F.regr_slope(F.col("score"), F.col("rn")), 5).alias(
            "drift_slope"
        ),
        F.round(F.corr(F.col("rn").cast("double"), F.col("score")), 5).alias(
            "drift_corr"
        ),
    )


@query(
    "q273_source_style_similarity",
    f"""
    WITH nt AS (SELECT source, {DK_NORM_TEXT} AS t FROM documents),
    g AS (SELECT source, substring(t, i, 3) AS g
          FROM nt, UNNEST(generate_series(1, greatest(len(t) - 2, 0))) AS s(i)),
    c AS (SELECT source, g, CAST(count(*) AS BIGINT) AS c
          FROM g GROUP BY source, g),
    top AS (SELECT source, g, c FROM (
              SELECT *, row_number() OVER (PARTITION BY source
                                           ORDER BY c DESC, g) AS rn
              FROM c) WHERE rn <= 200),
    nrm AS (SELECT source, sqrt(CAST(sum(c * c) AS DOUBLE)) AS n
            FROM top GROUP BY source),
    dots AS (SELECT a.source AS source_a, b.source AS source_b,
                    CAST(sum(a.c * b.c) AS BIGINT) AS dot
             FROM top a JOIN top b ON a.g = b.g AND a.source < b.source
             GROUP BY 1, 2)
    SELECT d.source_a, d.source_b,
           round(d.dot / (x.n * y.n), 6) AS style_cosine
    FROM dots d
    JOIN nrm x ON x.source = d.source_a
    JOIN nrm y ON y.source = d.source_b
    """,
)
def q273_source_style_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source STYLE similarity: cosine between per-source character-
    3-gram count profiles, restricted to each source's top-200 grams —
    the authorship/boilerplate fingerprint that groups mirror sites and
    syndication families before any document-level dedup runs. The
    normalized text is materialized as a column BEFORE the per-position
    substring transform (char_shingles_normed contract — the lambda
    reads an attribute, never re-normalizes); profiles shrink to
    sources x 200 rows after one (source, gram) count shuffle, so the
    pairwise stage is gram-keyed over a parameter-sized frame. Integer
    dot products — no float-order sensitivity until the final divide."""
    from pyspark.sql import Window

    from etl_jetro_spark.functions.hashing import char_shingles_normed, norm_text

    d = load(spark, sf_dir, "documents")
    grams = d.select(
        "source", norm_text("text").alias("_t")
    ).select(
        "source", F.explode(char_shingles_normed(F.col("_t"), 3)).alias("g")
    )
    counts = grams.groupBy("source", "g").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    w = Window.partitionBy("source").orderBy(F.desc("c"), F.asc("g"))
    top = (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 200)
        .drop("rn")
        .localCheckpoint(eager=False)
    )
    nrm = top.groupBy("source").agg(
        F.sqrt(F.sum(F.col("c") * F.col("c")).cast("double")).alias("n")
    )
    a = top.select(
        F.col("source").alias("source_a"), "g", F.col("c").alias("ca")
    )
    b = top.select(
        F.col("source").alias("source_b"), "g", F.col("c").alias("cb")
    )
    dots = (
        a.join(b, "g")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.sum(F.col("ca") * F.col("cb")).cast("long").alias("dot"))
    )
    na = nrm.select(F.col("source").alias("source_a"), F.col("n").alias("na"))
    nb = nrm.select(F.col("source").alias("source_b"), F.col("n").alias("nb"))
    return (
        dots.join(bcast_small(na), "source_a")
        .join(bcast_small(nb), "source_b")
        .select(
            "source_a",
            "source_b",
            F.round(F.col("dot") / (F.col("na") * F.col("nb")), 6).alias(
                "style_cosine"
            ),
        )
    )


_Q274_CUTOFF = "2000-07-01"


@query(
    "q274_lapsed_high_balance_customers",
    f"""
    WITH ab AS (SELECT avg(c_acctbal) AS a FROM customer WHERE c_acctbal > 0),
    idle AS (
      SELECT c.c_mktsegment, c.c_acctbal
      FROM customer c CROSS JOIN ab
      WHERE c.c_acctbal > ab.a
        AND NOT EXISTS (SELECT 1 FROM orders o
                        WHERE o.o_custkey = c.c_custkey
                          AND o.o_orderdate >= TIMESTAMP '{_Q274_CUTOFF}'))
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT)   AS n_customers,
           round(sum(c_acctbal), 2)   AS total_balance,
           round(avg(c_acctbal), 2)   AS avg_balance
    FROM idle GROUP BY c_mktsegment
    """,
)
def q274_lapsed_high_balance_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape on this schema: LAPSED customers — above-average
    positive balance, no order since the cutoff — rolled up by market
    segment (the win-back target list). The anti-join + scalar-subquery
    decorrelation pattern, q100's EXISTS twin on the negative side: the
    average is a 1-row scalar aggregate broadcast into the filter; the
    recency test is a LEFT ANTI against the date-filtered order keys
    (filter pushed below the key-only projection — no order payload
    ever shuffles)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    ab = c.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("_a")
    )
    recent = o.filter(
        F.col("o_orderdate") >= F.lit(_Q274_CUTOFF).cast("timestamp")
    ).select("o_custkey")
    idle = (
        c.join(recent, c["c_custkey"] == F.col("o_custkey"), "left_anti")
        .crossJoin(bcast_small(ab))
        .filter(F.col("c_acctbal") > F.col("_a"))
    )
    return idle.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.round(F.sum("c_acctbal"), 2).alias("total_balance"),
        F.round(F.avg("c_acctbal"), 2).alias("avg_balance"),
    )


@query(
    "q275_promo_revenue_share",
    """
    WITH j AS (
      SELECT strftime(l.l_shipdate, '%Y-%m') AS month,
             l.l_extendedprice * (1 - l.l_discount) AS rev,
             p.p_type
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey)
    SELECT month,
           round(sum(CASE WHEN p_type = 'PROMO' THEN rev ELSE 0 END), 2)
             AS promo_revenue,
           round(sum(rev), 2) AS total_revenue,
           round(100.0 * sum(CASE WHEN p_type = 'PROMO' THEN rev ELSE 0 END)
                 / sum(rev), 4) AS promo_share_pct
    FROM j GROUP BY month
    """,
)
def q275_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: monthly promo-type revenue share. The part dim
    joins size-gated (bcast_sized — part grows with the business, the
    q247 catch class); month buckets via a shared date_format/strftime
    literal so bucketing is identical cross-engine; one month-sized
    partial-agg rollup."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    j = li.join(
        bcast_sized(p.select("p_partkey", "p_type")),
        li["l_partkey"] == F.col("p_partkey"),
    ).select(
        F.date_format("l_shipdate", "yyyy-MM").alias("month"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
        "p_type",
    )
    promo = F.when(F.col("p_type") == "PROMO", F.col("rev")).otherwise(0.0)
    return j.groupBy("month").agg(
        F.round(F.sum(promo), 2).alias("promo_revenue"),
        F.round(F.sum("rev"), 2).alias("total_revenue"),
        F.round(100.0 * F.sum(promo) / F.sum("rev"), 4).alias(
            "promo_share_pct"
        ),
    )


@query(
    "q276_embedding_centroid_drift",
    f"""
    WITH pe AS (
      SELECT label,
             CASE WHEN vec_id % 2 = 0 THEN 'a' ELSE 'b' END AS h,
             vec_id,
             generate_subscripts(embedding, 1) AS i,
             CAST(unnest(embedding) AS DOUBLE) AS x
      FROM embeddings),
    cent AS (SELECT label, h, i, avg(x) AS m
             FROM pe GROUP BY label, h, i),
    halves AS (SELECT label, h, CAST(count(DISTINCT vec_id) AS BIGINT) AS n
               FROM pe GROUP BY label, h),
    pairs AS (
      SELECT a.label,
             sum(a.m * b.m) AS dot,
             sqrt(sum(a.m * a.m)) AS na,
             sqrt(sum(b.m * b.m)) AS nb
      FROM cent a JOIN cent b ON a.label = b.label AND a.i = b.i
      WHERE a.h = 'a' AND b.h = 'b'
      GROUP BY a.label)
    SELECT p.label,
           x.n AS n_a, y.n AS n_b,
           round(p.dot / (p.na * p.nb), 6) AS centroid_cosine
    FROM pairs p
    JOIN halves x ON x.label = p.label AND x.h = 'a'
    JOIN halves y ON y.label = p.label AND y.h = 'b'
    """,
)
def q276_embedding_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-DISTRIBUTION drift per label: cosine between the label
    centroid computed on the even-id half and the odd-id half of the
    corpus — q142's drift monitor lifted into embedding space (a stable
    corpus scores ~1; a drifting encoder or source mix pulls it down).
    Vectors explode to (label, half, dim) once — ONE dim-keyed
    partial-agg shuffle; centroids are labels x halves x dims rows
    (metadata-sized), and the pairwise stage runs entirely on them."""
    e = load(spark, sf_dir, "embeddings")
    pe = e.select(
        "label",
        F.when(F.col("vec_id") % 2 == 0, "a").otherwise("b").alias("h"),
        "vec_id",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("i", "x"),
    )
    cent = pe.groupBy("label", "h", "i").agg(F.avg("x").alias("m"))
    halves = pe.groupBy("label", "h").agg(
        F.countDistinct("vec_id").cast("long").alias("n")
    )
    a = cent.filter(F.col("h") == "a").select(
        "label", "i", F.col("m").alias("ma")
    )
    b = cent.filter(F.col("h") == "b").select(
        "label", "i", F.col("m").alias("mb")
    )
    pairs = (
        a.join(b, ["label", "i"])
        .groupBy("label")
        .agg(
            F.sum(F.col("ma") * F.col("mb")).alias("dot"),
            F.sqrt(F.sum(F.col("ma") * F.col("ma"))).alias("na"),
            F.sqrt(F.sum(F.col("mb") * F.col("mb"))).alias("nb"),
        )
    )
    ha = halves.filter(F.col("h") == "a").select("label", F.col("n").alias("n_a"))
    hb = halves.filter(F.col("h") == "b").select("label", F.col("n").alias("n_b"))
    return (
        pairs.join(bcast_small(ha), "label")
        .join(bcast_small(hb), "label")
        .select(
            "label",
            "n_a",
            "n_b",
            F.round(F.col("dot") / (F.col("na") * F.col("nb")), 6).alias(
                "centroid_cosine"
            ),
        )
    )


# --------------------------------------------------------------------------
# 28. Round-7 second wave: leakage-safe splits, corpus vocabulary health,
#     classic order-analytics shapes, embedding hygiene (q277-q286)
# --------------------------------------------------------------------------

_Q277_SPLITS = "CASE WHEN {b} < 9000 THEN 'train' WHEN {b} < 9500 THEN 'val' ELSE 'test' END"


@query(
    "q277_leakage_safe_split",
    f"""
    WITH fp AS (SELECT doc_id, md5({DK_NORM_TEXT}) AS f FROM documents),
    rep AS (SELECT f, min(doc_id) AS rep_id FROM fp GROUP BY f),
    j AS (SELECT fp.doc_id, fp.f, r.rep_id FROM fp JOIN rep r USING (f)),
    b AS (SELECT f,
                 {_hexb_sql('split:', 'doc_id', 10_000)} AS bn,
                 {_hexb_sql('split:', 'rep_id', 10_000)} AS ba
          FROM j),
    tagged AS (
      SELECT 'naive' AS scheme, f, {_Q277_SPLITS.format(b='bn')} AS split FROM b
      UNION ALL
      SELECT 'cluster_aware', f, {_Q277_SPLITS.format(b='ba')} FROM b),
    c AS (SELECT scheme, f, split, count(*) AS c FROM tagged GROUP BY 1, 2, 3),
    g AS (SELECT scheme, f, sum(c) AS n, sum(c * (c - 1) / 2) AS within
          FROM c GROUP BY 1, 2),
    leak AS (SELECT scheme, CAST(sum(n * (n - 1) / 2 - within) AS BIGINT)
                      AS leaked_pairs
             FROM g GROUP BY 1),
    sizes AS (SELECT scheme, split, CAST(sum(c) AS BIGINT) AS n_docs
              FROM c GROUP BY 1, 2)
    SELECT s.scheme, s.split, s.n_docs, l.leaked_pairs
    FROM sizes s JOIN leak l USING (scheme)
    """,
)
def q277_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEAKAGE-SAFE train/val/test splitting: the q62 hash-mod split keyed
    on the exact-dup CLUSTER representative (min doc_id per normalized-text
    fingerprint) instead of the raw doc_id, side-by-side with the naive
    per-doc split it replaces. Output per scheme: split sizes plus the
    number of duplicate PAIRS whose members land in different splits —
    the train->test contamination a per-doc split silently ships (the
    reason dedup must run BEFORE splitting in a training pipeline;
    cluster_aware is 0 by construction). Pair counts come from per-
    (scheme, fingerprint, split) group sizes — sum of c·(c-1)/2 algebra,
    never materialized pairs — so the audit costs two fingerprint-keyed
    partial-agg shuffles at any scale."""
    from etl_jetro_spark.functions.hashing import norm_text
    from etl_jetro_spark.operators.sampling import split_assign

    splits = {"train": 0.9, "val": 0.05, "test": 0.05}
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.md5(norm_text("text")).alias("f")
    )
    rep = d.groupBy("f").agg(F.min("doc_id").alias("rep_id"))
    j = d.join(rep, "f")
    # Both schemes in ONE pass over the fingerprinted frame: two split
    # columns, then a 2-element inline-array explode. A unionByName of
    # two split_assign branches would re-scan documents and re-run the
    # md5(norm_text) fingerprint + rep join per scheme — Catalyst does
    # not dedupe the shared subplan (measured 2x at sf1).
    both = split_assign(
        split_assign(j, "doc_id", splits, out="_sn", salt="split:"),
        "rep_id",
        splits,
        out="_sa",
        salt="split:",
    )
    tagged = both.select(
        "f",
        F.explode(
            F.array(
                F.struct(
                    F.lit("naive").alias("scheme"),
                    F.col("_sn").alias("split"),
                ),
                F.struct(
                    F.lit("cluster_aware").alias("scheme"),
                    F.col("_sa").alias("split"),
                ),
            )
        ).alias("_s"),
    ).select("f", "_s.scheme", "_s.split")
    c = tagged.groupBy("scheme", "f", "split").agg(
        F.count(F.lit(1)).alias("c")
    )
    g = c.groupBy("scheme", "f").agg(
        F.sum("c").alias("n"),
        F.sum(F.col("c") * (F.col("c") - 1) / 2).alias("within"),
    )
    leak = g.groupBy("scheme").agg(
        F.sum(F.col("n") * (F.col("n") - 1) / 2 - F.col("within"))
        .cast("long")
        .alias("leaked_pairs")
    )
    sizes = c.groupBy("scheme", "split").agg(
        F.sum("c").cast("long").alias("n_docs")
    )
    return sizes.join(bcast_small(leak), "scheme").select(
        "scheme", "split", "n_docs", "leaked_pairs"
    )


@query(
    "q278_hapax_profile",
    f"""
    WITH toks AS (
      SELECT source, unnest(string_split({DK_NORM_TEXT}, ' ')) AS t
      FROM documents),
    c AS (SELECT source, t, CAST(count(*) AS BIGINT) AS c
          FROM toks WHERE t <> '' GROUP BY 1, 2)
    SELECT source,
           CAST(sum(c) AS BIGINT)    AS token_mass,
           CAST(count(*) AS BIGINT)  AS vocab_size,
           CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
                                     AS hapax_count,
           round(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)
                 / CAST(count(*) AS DOUBLE), 6)  AS hapax_vocab_share,
           round(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)
                 / CAST(sum(c) AS DOUBLE), 6)    AS hapax_token_share
    FROM c GROUP BY source
    """,
)
def q278_hapax_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAPAX-LEGOMENA profile per source: what fraction of each source's
    vocabulary (and token mass) occurs exactly once — the corpus-health
    twin of q257's Heaps curve. A high hapax share flags OCR noise /
    mojibake / ID-like junk tokens (tokenizer-unfriendly); a low one
    flags boilerplate. One (source, token) partial-agg shuffle — counts
    combine map-side — then a source-sized rollup; the vocabulary is
    never collected or broadcast (the q68/q69 lesson)."""
    from etl_jetro_spark.functions.hashing import norm_text

    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "source", F.explode(F.split(norm_text("text"), " ")).alias("t")
    ).filter(F.col("t") != "")
    c = toks.groupBy("source", "t").agg(F.count(F.lit(1)).alias("c"))
    hapax = F.sum((F.col("c") == 1).cast("long"))
    return c.groupBy("source").agg(
        F.sum("c").cast("long").alias("token_mass"),
        F.count(F.lit(1)).cast("long").alias("vocab_size"),
        hapax.cast("long").alias("hapax_count"),
        F.round(hapax / F.count(F.lit(1)), 6).alias("hapax_vocab_share"),
        F.round(hapax / F.sum("c"), 6).alias("hapax_token_share"),
    )


@query(
    "q279_returned_revenue_customers",
    f"""
    SELECT c.c_custkey, any_value(c.c_name) AS c_name,
           any_value(n.n_name) AS n_name,
           {sql_exact_net_sum('l.l_extendedprice', 'l.l_discount', dp=2)}
             AS revenue,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem l
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey
    ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
)
def q279_returned_revenue_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: customers ranked by RETURNED-item revenue — the
    at-risk accounts list. Return-flag filter pushes to the lineitem
    scan; the orderkey join is the only data-scale shuffle (customer is
    size-gated, nation broadcast); global top-20 via orderBy+limit =
    TakeOrdered (per-partition heaps, never a global sort — planlint
    rule). Ranked on the ROUNDED revenue with a custkey tiebreak so the
    cut is float-order stable across engines."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    j = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(bcast_sized(c), o["o_custkey"] == c["c_custkey"])
        .join(bcast_small(n), c["c_nationkey"] == n["n_nationkey"])
    )
    agg = j.groupBy("c_custkey").agg(
        F.first("c_name").alias("c_name"),
        F.first("n_name").alias("n_name"),
        M.exact_net_sum("l_extendedprice", "l_discount", dp=2).alias(
            "revenue"
        ),
        F.count(F.lit(1)).cast("long").alias("n_items"),
    )
    return agg.orderBy(F.desc("revenue"), F.asc("c_custkey")).limit(20)


@query(
    "q280_order_return_mix",
    """
    WITH per_order AS (
      SELECT l_orderkey, count(*) AS n_items,
             sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS n_ret
      FROM lineitem GROUP BY 1),
    cls AS (
      SELECT o.o_orderpriority,
             CASE WHEN p.n_ret = 0 THEN 'none'
                  WHEN p.n_ret = p.n_items THEN 'full'
                  ELSE 'partial' END AS return_class,
             p.n_items
      FROM per_order p JOIN orders o ON o.o_orderkey = p.l_orderkey)
    SELECT o_orderpriority, return_class,
           CAST(count(*) AS BIGINT)              AS n_orders,
           round(avg(CAST(n_items AS DOUBLE)), 4) AS avg_items
    FROM cls GROUP BY 1, 2
    """,
)
def q280_order_return_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order RETURN-mix matrix: per order priority, how many orders came
    back fully / partially / not at all, with mean basket size per cell —
    the fulfillment-quality rollup behind q6's supplier view. One
    orderkey partial-agg shuffle builds the per-order return census; the
    orders join is key-aligned on the same orderkey (AQE picks the
    strategy); the final matrix is priorities x 3 cells."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    per = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum((F.col("l_returnflag") == "R").cast("long")).alias("n_ret"),
    )
    cls = per.join(o, per["l_orderkey"] == o["o_orderkey"]).select(
        "o_orderpriority",
        F.when(F.col("n_ret") == 0, "none")
        .when(F.col("n_ret") == F.col("n_items"), "full")
        .otherwise("partial")
        .alias("return_class"),
        "n_items",
    )
    return cls.groupBy("o_orderpriority", "return_class").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.round(F.avg(F.col("n_items").cast("double")), 4).alias("avg_items"),
    )


@query(
    "q281_cheapest_supplier_observed",
    """
    WITH u AS (
      SELECT l_partkey, l_suppkey, l_extendedprice / l_quantity AS up
      FROM lineitem WHERE l_quantity > 0),
    w AS (SELECT l_partkey, l_suppkey, up,
                 row_number() OVER (PARTITION BY l_partkey
                                    ORDER BY up, l_suppkey) AS rn
          FROM u),
    win AS (SELECT l_partkey, l_suppkey, up FROM w WHERE rn = 1)
    SELECT n.n_name, CAST(count(*) AS BIGINT) AS n_parts_won,
           round(avg(win.up), 4) AS avg_win_price
    FROM win
    JOIN supplier s ON s.s_suppkey = win.l_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    GROUP BY n.n_name
    """,
)
def q281_cheapest_supplier_observed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cheapest OBSERVED supplier per part (TPC-H Q2's argmin, recovered
    from lineitem history since this schema carries no partsupp): per
    part, the supplier with the lowest observed unit price (suppkey
    tiebreak), rolled up to how many parts each supplier NATION wins.
    The argmin is a partkey-partitioned row_number — millions of tiny
    groups spread evenly, no group ever serialized to one task beyond
    its own rows; unit-price division is IEEE-identical on both engines
    so the order (and the winner) agrees bit-for-bit. Supplier joins
    size-gated, nation broadcast."""
    from pyspark.sql import Window

    li = load(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 0)
    u = li.select(
        "l_partkey",
        "l_suppkey",
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("up"),
    )
    w = Window.partitionBy("l_partkey").orderBy("up", "l_suppkey")
    win = (
        u.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    j = win.join(
        bcast_sized(s), win["l_suppkey"] == s["s_suppkey"]
    ).join(bcast_small(n), s["s_nationkey"] == n["n_nationkey"])
    return j.groupBy("n_name").agg(
        F.count(F.lit(1)).cast("long").alias("n_parts_won"),
        F.round(F.avg("up"), 4).alias("avg_win_price"),
    )


@query(
    "q282_large_order_customers",
    """
    WITH big AS (
      SELECT l_orderkey, sum(l_quantity) AS sum_qty
      FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 300)
    SELECT c.c_custkey, c.c_name, o.o_orderkey,
           CAST(o.o_orderdate AS DATE) AS o_orderdate,
           round(o.o_totalprice, 2) AS o_totalprice,
           round(b.sum_qty, 2) AS sum_qty
    FROM big b
    JOIN orders o   ON o.o_orderkey = b.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY sum_qty DESC, o_orderkey LIMIT 20
    """,
)
def q282_large_order_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: LARGE orders (total quantity > 300) with their
    customers — the bulk-buyer watchlist. The quantity rollup is one
    orderkey partial-agg shuffle; the HAVING filter collapses it to a
    tiny frame BEFORE any join (orders joins against the filtered keys,
    not the reverse); customer is size-gated. Global top-20 via
    orderBy+limit on integral-valued quantity sums (exact doubles — no
    float-order risk at the cut; orderkey tiebreak)."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_sq"))
        .filter(F.col("_sq") > 300)
    )
    j = big.join(o, big["l_orderkey"] == o["o_orderkey"]).join(
        bcast_sized(c), o["o_custkey"] == c["c_custkey"]
    )
    return (
        j.select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
            F.round("o_totalprice", 2).alias("o_totalprice"),
            F.round("_sq", 2).alias("sum_qty"),
        )
        .orderBy(F.desc("sum_qty"), F.asc("o_orderkey"))
        .limit(20)
    )


@query(
    "q283_embedding_norm_outliers",
    f"""
    WITH nr AS (
      SELECT label,
             sqrt(list_sum(list_transform(embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
      FROM embeddings),
    r1 AS (SELECT label, nrm AS v,
                  row_number() OVER (PARTITION BY label ORDER BY nrm) AS rn,
                  count(*) OVER (PARTITION BY label) AS n
           FROM nr WHERE nrm IS NOT NULL),
    med AS (SELECT label, {_SQL_PCTL('0.5')} AS med FROM r1 GROUP BY label),
    dev AS (SELECT n.label, n.nrm, m.med, abs(n.nrm - m.med) AS d
            FROM nr n JOIN med m USING (label)),
    r2 AS (SELECT label, d AS v,
                  row_number() OVER (PARTITION BY label ORDER BY d) AS rn,
                  count(*) OVER (PARTITION BY label) AS n
           FROM dev),
    madt AS (SELECT label, {_SQL_PCTL('0.5')} AS mad FROM r2 GROUP BY label)
    SELECT d.label, CAST(count(*) AS BIGINT) AS n,
           round(any_value(d.med), 6) AS med_norm,
           round(any_value(t.mad), 6) AS mad_norm,
           CAST(sum(CASE WHEN d.d > 3.0 * t.mad THEN 1 ELSE 0 END) AS BIGINT)
             AS n_outliers
    FROM dev d JOIN madt t USING (label)
    GROUP BY d.label
    """,
)
def q283_embedding_norm_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-NORM hygiene per label: exact median + MAD of the L2
    norms with a 3-MAD outlier census — catches the truncated / zeroed /
    exploded vectors an encoder bug ships before they poison cosine
    retrieval (q21/q32) or SemDeDup centroids (q146). Norms reduce
    IN-EXPRESSION (F.aggregate over the array — sequential fold,
    bit-identical to DuckDB's list_sum; no dim explode, no shuffle);
    both medians ride the distributed rank frame via
    operators.aggregate.mad_outliers (q122's operator on a new
    modality)."""
    from etl_jetro_spark.operators.aggregate import mad_outliers

    e = load(spark, sf_dir, "embeddings")
    arr = F.col("embedding").cast("array<double>")
    nr = e.select(
        "label",
        F.sqrt(
            F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x * x)
        ).alias("nrm"),
    )
    out = mad_outliers(nr, ["label"], "nrm", z=3.0)
    return out.select(
        "label",
        F.col("n").cast("long").alias("n"),
        F.round("med", 6).alias("med_norm"),
        F.round("mad", 6).alias("mad_norm"),
        F.col("n_outliers").cast("long").alias("n_outliers"),
    )


@query(
    "q284_nation_trade_matrix",
    """
    SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS INTEGER) AS l_year,
           ((sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)
                 * (100 - CAST(round(l.l_discount * 100, 0) AS BIGINT)))
             + 50) // 100) / 100.0 AS revenue,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem l
    JOIN orders o    ON o.o_orderkey = l.l_orderkey
    JOIN customer c  ON c.c_custkey = o.o_custkey
    JOIN nation nc   ON nc.n_nationkey = c.c_nationkey
    JOIN supplier s  ON s.s_suppkey = l.l_suppkey
    JOIN nation ns   ON ns.n_nationkey = s.s_nationkey
    WHERE ns.n_name <> nc.n_name
    GROUP BY 1, 2, 3
    """,
)
def q284_nation_trade_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: cross-border trade matrix — shipped revenue by
    (supplier nation, customer nation, ship year), domestic flows
    excluded. One data-scale shuffle (the orderkey join); supplier and
    customer dims size-gated, both nation legs broadcast; the rollup
    output is nations² x years. The classic snowflake star-join whose
    plan Catalyst should (and does) collapse to broadcast hash joins
    around a single sort-merge. Revenue accumulates as exact integer
    10^-4-dollars (price and discount are 2-dp decimals riding doubles),
    so the sum is order-independent, and the 2-dp rounding happens as
    integer half-up BEFORE the one exact division — engines disagree on
    round(double, 2) at .xx5 (Spark rounds the decimal repr, DuckDB the
    binary value; both float-path variants failed live at sf0.01)."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    nc = n.select(
        F.col("n_nationkey").alias("_ck"), F.col("n_name").alias("cust_nation")
    )
    ns = n.select(
        F.col("n_nationkey").alias("_sk"), F.col("n_name").alias("supp_nation")
    )
    j = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(bcast_sized(c), o["o_custkey"] == c["c_custkey"])
        .join(bcast_small(nc), c["c_nationkey"] == F.col("_ck"))
        .join(bcast_sized(s), li["l_suppkey"] == s["s_suppkey"])
        .join(bcast_small(ns), s["s_nationkey"] == F.col("_sk"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
    )
    cents = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    dpct = F.round(F.col("l_discount") * 100, 0).cast("long")
    return j.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
    ).agg(
        (
            F.floor((F.sum(cents * (100 - dpct)) + 50) / 100) / 100.0
        ).alias("revenue"),
        F.count(F.lit(1)).cast("long").alias("n_items"),
    )


@query(
    "q285_dup_rate_by_length",
    f"""
    WITH fp AS (SELECT doc_id, n_chars, md5({DK_NORM_TEXT}) AS f
                FROM documents),
    dup AS (SELECT f, count(*) AS cnt FROM fp GROUP BY 1),
    rk AS (SELECT fp.doc_id, fp.n_chars, d.cnt,
                  ntile(10) OVER (ORDER BY fp.n_chars, fp.doc_id) AS decile
           FROM fp JOIN dup d USING (f))
    SELECT CAST(decile AS BIGINT) AS decile,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS dup_docs,
           round(sum(CASE WHEN cnt > 1 THEN 1 ELSE 0 END)
                 / CAST(count(*) AS DOUBLE), 6) AS dup_share,
           round(avg(CAST(n_chars AS DOUBLE)), 2) AS avg_n_chars
    FROM rk GROUP BY decile
    """,
)
def q285_dup_rate_by_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WHERE do duplicates live? Exact-dup share by document-length
    decile — short boilerplate dedups very differently from long-form
    text, and this is the curve that decides whether a length floor
    should run before the (much more expensive) near-dup pass. Length
    deciles come from the distributed rank frame (group_ranked, keys=[]
    — no SinglePartition window; q92's exact-ntile arithmetic); the dup
    flag is one fingerprint-keyed count joined back by doc_id."""
    from etl_jetro_spark.functions.hashing import norm_text
    from etl_jetro_spark.operators.aggregate import group_ranked

    d = load(spark, sf_dir, "documents").select(
        "doc_id", "n_chars", F.md5(norm_text("text")).alias("f")
    )
    dup = d.groupBy("f").agg(F.count(F.lit(1)).alias("cnt"))
    flagged = d.join(dup, "f").select(
        "doc_id", (F.col("cnt") > 1).cast("long").alias("is_dup")
    )
    r = group_ranked(
        d.select("n_chars", "doc_id"), [], "n_chars", tiebreak=["doc_id"]
    )
    dec = r.select(
        "doc_id",
        F.col("_v").alias("n_chars"),
        _ntile_from_rank(F.col("_rn"), F.col("_n"), 10).alias("decile"),
    )
    j = dec.join(flagged, "doc_id")
    return j.groupBy("decile").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("is_dup").cast("long").alias("dup_docs"),
        F.round(F.sum("is_dup") / F.count(F.lit(1)), 6).alias("dup_share"),
        F.round(F.avg(F.col("n_chars").cast("double")), 2).alias(
            "avg_n_chars"
        ),
    )


@query(
    "q286_supplier_share_trend",
    f"""
    WITH m AS (
      SELECT l_suppkey,
             (year(l_shipdate) - 1992) * 12 + month(l_shipdate) - 1 AS m_idx,
             {sql_sum_net4('l_extendedprice', 'l_discount')} AS rev
      FROM lineitem GROUP BY 1, 2),
    tot AS (SELECT m_idx, CAST(sum(rev) AS HUGEINT) AS t FROM m GROUP BY 1),
    sh AS (SELECT m.l_suppkey, m.m_idx,
                  CAST(m.rev AS DOUBLE) / CAST(t.t AS DOUBLE) AS share
           FROM m JOIN tot t USING (m_idx))
    SELECT l_suppkey AS s_suppkey,
           CAST(count(*) AS BIGINT)       AS n_months,
           round(avg(share), 6)           AS avg_share,
           round(regr_slope(share, m_idx), 7) AS share_slope
    FROM sh GROUP BY 1 HAVING count(*) >= 18
    """,
)
def q286_supplier_share_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier MARKET-SHARE trend: per supplier, the OLS slope of its
    monthly revenue share against a calendar month index — the
    gaining/losing-ground screen (q272's drift algebra on the commerce
    side). The (supplier, month) rollup is one partial-agg shuffle;
    month totals are a calendar-bounded frame (fixed date horizon —
    flat across SF, hence bcast_small) joined back by month; slope and
    mean are algebraic one-pass aggregates. Suppliers active < 18
    months are excluded (slope meaningless)."""
    li = load(spark, sf_dir, "lineitem")
    m = li.groupBy(
        "l_suppkey",
        (
            (F.year("l_shipdate") - 1992) * 12 + F.month("l_shipdate") - 1
        ).alias("m_idx"),
    ).agg(
        # exact 1e-4-dollar net units (moneylint); the units cancel in
        # the share ratio, so no conversion constant appears at all
        M.sum_net4("l_extendedprice", "l_discount").alias("rev")
    )
    tot = m.groupBy("m_idx").agg(
        F.sum(F.col("rev").cast("decimal(38,0)")).alias("t")
    )
    sh = m.join(bcast_small(tot), "m_idx").select(
        "l_suppkey",
        "m_idx",
        (F.col("rev").cast("double") / F.col("t").cast("double")).alias(
            "share"
        ),
    )
    return (
        sh.groupBy("l_suppkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_months"),
            F.round(F.avg("share"), 6).alias("avg_share"),
            F.round(
                F.regr_slope(F.col("share"), F.col("m_idx").cast("double")), 7
            ).alias("share_slope"),
        )
        .filter(F.col("n_months") >= 18)
        .select(
            F.col("l_suppkey").alias("s_suppkey"),
            "n_months",
            "avg_share",
            "share_slope",
        )
    )


# --------------------------------------------------------------------------
# 29. Round-7 third wave: the remaining classic TPC-H shapes this schema
#     can express (Q3/Q4/Q5/Q13/Q19/Q8) plus tokenizer-induction and
#     event-cadence ops (q287-q296)
# --------------------------------------------------------------------------


@query(
    "q287_shipping_priority",
    f"""
    SELECT l.l_orderkey,
           {sql_exact_net_sum('l.l_extendedprice', 'l.l_discount', dp=2)}
             AS revenue,
           any_value(o.o_orderdate) AS o_orderdate
    FROM lineitem l
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-07-01'
      AND l.l_shipdate  > TIMESTAMP '1998-07-01'
    GROUP BY l.l_orderkey
    ORDER BY revenue DESC, l_orderkey LIMIT 10
    """,
)
def q287_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: top-10 highest-revenue orders placed before the
    cutoff but not yet shipped by it, for one market segment — the
    shipping-priority worklist. Both date predicates and the segment
    filter push to their scans BEFORE the one data-scale orderkey join
    (customer size-gated); global top-10 is orderBy+limit = TakeOrdered
    (per-partition heaps — planlint rule), ranked on rounded revenue
    with an orderkey tiebreak for a float-order-stable cut."""
    cut = F.to_timestamp(F.lit("1998-07-01"))
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cut)
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cut)
    c = load(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    j = li.join(o, li["l_orderkey"] == o["o_orderkey"]).join(
        bcast_sized(c.select("c_custkey")), o["o_custkey"] == c["c_custkey"]
    )
    agg = j.groupBy("l_orderkey").agg(
        M.exact_net_sum("l_extendedprice", "l_discount", dp=2).alias(
            "revenue"
        ),
        F.first("o_orderdate").alias("o_orderdate"),
    )
    return agg.orderBy(F.desc("revenue"), F.asc("l_orderkey")).limit(10)


@query(
    "q288_priority_return_exposure",
    """
    SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-04-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_returnflag = 'R')
    GROUP BY o.o_orderpriority
    """,
)
def q288_priority_return_exposure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (EXISTS decorrelation): one quarter's orders that
    had at least one RETURNED line, counted by order priority — does
    expedited handling actually reduce returns? The EXISTS becomes a
    LEFT SEMI join on the orderkey: the returned-lines side is filtered
    and key-only (no row explosion for multi-line matches), the date
    window pushes to the orders scan, and the rollup output is
    priority-sized. This schema carries no commit/receipt dates, so
    'late lineitem' becomes 'returned lineitem' — same plan shape."""
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1997-01-01")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1997-04-01")))
    )
    ret = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey")
    )
    return (
        o.join(ret, o["o_orderkey"] == ret["l_orderkey"], "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
    )


@query(
    "q289_local_supply_volume",
    """
    SELECT r.r_name,
           CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
           ((sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)
                 * (100 - CAST(round(l.l_discount * 100, 0) AS BIGINT)))
             + 50) // 100) / 100.0 AS local_revenue,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem l
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    JOIN region r   ON r.r_regionkey = n.n_regionkey
    WHERE c.c_nationkey = s.s_nationkey
    GROUP BY 1, 2
    """,
)
def q289_local_supply_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue shipped by a supplier in the SAME nation
    as the customer, rolled up by customer region and order year — the
    local-sourcing volume report. One data-scale shuffle (the orderkey
    join); customer/supplier size-gated, nation->region broadcast; the
    same-nation predicate applies after the two dim joins, before the
    regions x years rollup. Revenue follows q284's exact integer-cent
    algebra (order-independent sum, half-up in integer space, one
    division)."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    r = load(spark, sf_dir, "region").select("r_regionkey", "r_name")
    j = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(bcast_sized(c), o["o_custkey"] == c["c_custkey"])
        .join(bcast_sized(s), li["l_suppkey"] == s["s_suppkey"])
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(bcast_small(n), F.col("c_nationkey") == n["n_nationkey"])
        .join(bcast_small(r), n["n_regionkey"] == r["r_regionkey"])
    )
    cents = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    dpct = F.round(F.col("l_discount") * 100, 0).cast("long")
    return j.groupBy(
        "r_name", F.year("o_orderdate").cast("int").alias("o_year")
    ).agg(
        (F.floor((F.sum(cents * (100 - dpct)) + 50) / 100) / 100.0).alias(
            "local_revenue"
        ),
        F.count(F.lit(1)).cast("long").alias("n_items"),
    )


@query(
    "q290_customer_order_distribution",
    """
    WITH pc AS (SELECT o_custkey, count(*) AS c FROM orders GROUP BY 1),
    percust AS (
      SELECT cu.c_custkey, coalesce(p.c, 0) AS c_count
      FROM customer cu LEFT JOIN pc p ON p.o_custkey = cu.c_custkey)
    SELECT CAST(c_count AS BIGINT) AS c_count,
           CAST(count(*) AS BIGINT) AS custdist
    FROM percust GROUP BY c_count
    """,
)
def q290_customer_order_distribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q13 shape: how many customers placed 0, 1, 2, ... orders —
    the engagement histogram, zeros included. Orders pre-aggregate to
    per-customer counts BEFORE touching the customer dim (the join
    carries one row per customer, not one per order), the LEFT join
    keeps never-ordered customers, and the final histogram is a
    count-sized rollup. Two partial-agg shuffles total; no row ever
    fans out."""
    pc = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    cu = load(spark, sf_dir, "customer").select("c_custkey")
    percust = cu.join(
        pc, cu["c_custkey"] == pc["o_custkey"], "left"
    ).select(F.coalesce(F.col("c"), F.lit(0)).cast("long").alias("c_count"))
    return percust.groupBy("c_count").agg(
        F.count(F.lit(1)).cast("long").alias("custdist")
    )


@query(
    "q291_banded_discount_revenue",
    f"""
    SELECT {sql_exact_net_sum('l.l_extendedprice', 'l.l_discount', dp=2)}
             AS revenue,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#11' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def q291_banded_discount_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under a DISJUNCTION of (brand, size band,
    quantity band) conditions — the OR-of-ANDs predicate that breaks
    naive pushdown. Catalyst extracts the common quantity envelope
    (1 <= qty <= 30) to the lineitem scan and the size envelope to the
    part scan; the exact disjunction evaluates after the size-gated
    part join. Single-row output; the point is the predicate plumbing,
    not the rollup."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    j = li.join(bcast_sized(p), li["l_partkey"] == p["p_partkey"])
    qty, brand, size = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    cond = (
        ((brand == "Brand#12") & size.between(1, 5) & qty.between(1, 11))
        | ((brand == "Brand#23") & size.between(1, 10) & qty.between(10, 20))
        | ((brand == "Brand#11") & size.between(1, 15) & qty.between(20, 30))
    )
    return j.filter(cond).agg(
        M.exact_net_sum("l_extendedprice", "l_discount", dp=2).alias(
            "revenue"
        ),
        F.count(F.lit(1)).cast("long").alias("n_items"),
    )


@query(
    "q292_nation_market_share",
    """
    WITH flows AS (
      SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
             ns.n_name AS supp_nation,
             CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)
               * (100 - CAST(round(l.l_discount * 100, 0) AS BIGINT)) AS v
      FROM lineitem l
      JOIN orders o    ON o.o_orderkey = l.l_orderkey
      JOIN customer c  ON c.c_custkey = o.o_custkey
      JOIN nation ncu  ON ncu.n_nationkey = c.c_nationkey
      JOIN region r    ON r.r_regionkey = ncu.n_regionkey
      JOIN supplier s  ON s.s_suppkey = l.l_suppkey
      JOIN nation ns   ON ns.n_nationkey = s.s_nationkey
      WHERE r.r_name = 'AMERICA')
    SELECT o_year,
           round(sum(CASE WHEN supp_nation = 'NATION_6' THEN v ELSE 0 END)
                 / CAST(sum(v) AS DOUBLE), 6) AS mkt_share
    FROM flows GROUP BY o_year
    """,
)
def q292_nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one supplier nation's share of all revenue sold
    into a region, per order year. The share is a conditional-over-total
    aggregate on ONE flow frame — no self-join, no second pass; the
    region filter prunes via the customer->nation->region broadcast legs
    before the single data-scale orderkey shuffle. Numerator and
    denominator accumulate in the same exact integer-cent space, so the
    ratio is order-independent."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load(spark, sf_dir, "nation")
    ncu = n.select(
        F.col("n_nationkey").alias("_ck"), F.col("n_regionkey").alias("_rk")
    )
    ns = n.select(
        F.col("n_nationkey").alias("_sk"), F.col("n_name").alias("supp_nation")
    )
    r = (
        load(spark, sf_dir, "region")
        .filter(F.col("r_name") == "AMERICA")
        .select("r_regionkey")
    )
    j = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(bcast_sized(c), o["o_custkey"] == c["c_custkey"])
        .join(bcast_small(ncu), c["c_nationkey"] == F.col("_ck"))
        .join(bcast_small(r), F.col("_rk") == r["r_regionkey"])
        .join(bcast_sized(s), li["l_suppkey"] == s["s_suppkey"])
        .join(bcast_small(ns), s["s_nationkey"] == F.col("_sk"))
    )
    v = F.round(F.col("l_extendedprice") * 100, 0).cast("long") * (
        100 - F.round(F.col("l_discount") * 100, 0).cast("long")
    )
    return j.groupBy(
        F.year("o_orderdate").cast("int").alias("o_year")
    ).agg(
        F.round(
            F.sum(F.when(F.col("supp_nation") == "NATION_6", v).otherwise(0))
            / F.sum(v).cast("double"),
            6,
        ).alias("mkt_share")
    )


@query(
    "q293_bpe_pair_induction",
    f"""
    WITH w0 AS (SELECT unnest(string_split({DK_NORM_TEXT}, ' ')) AS w
                FROM documents),
    w2 AS (SELECT w FROM w0 WHERE length(w) >= 2),
    ip AS (SELECT w, unnest(range(1, length(w))) AS i FROM w2),
    p AS (SELECT substring(w, CAST(i AS INTEGER), 2) AS pair FROM ip)
    SELECT pair, CAST(count(*) AS BIGINT) AS cnt
    FROM p GROUP BY 1 ORDER BY cnt DESC, pair LIMIT 30
    """,
)
def q293_bpe_pair_induction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE merge-candidate induction: the top-30 adjacent
    character pairs by corpus frequency — exactly the statistic the
    first byte-pair-encoding merge step selects from, computed the way
    a tokenizer-training pipeline must at corpus scale (counts combine
    map-side; the driver never sees more than the final 30 rows). Words
    materialize behind the first explode boundary, so the per-position
    lambda reads an ATTRIBUTE — the norm_text regexes run once per doc,
    not once per character (the q259/q262 lesson). Global top-30 is
    orderBy+limit = TakeOrdered, count-desc with a pair tiebreak."""
    from etl_jetro_spark.functions.hashing import norm_text

    d = load(spark, sf_dir, "documents")
    words = d.select(
        F.explode(F.split(norm_text("text"), " ")).alias("w")
    ).filter(F.length("w") >= 2)
    pairs = words.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("w") - 1),
                lambda i: F.col("w").substr(i, F.lit(2)),
            )
        ).alias("pair")
    )
    cnt = pairs.groupBy("pair").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    return cnt.orderBy(F.desc("cnt"), F.asc("pair")).limit(30)


@query(
    "q294_event_cadence_percentiles",
    """
    WITH g AS (
      SELECT event_type,
             epoch_us(ts) - lag(epoch_us(ts)) OVER (
               PARTITION BY user_id, event_type
               ORDER BY epoch_us(ts), event_id) AS gap
      FROM events)
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_gaps,
           round(quantile_cont(CAST(gap AS DOUBLE), 0.50) / 1000000, 6)
             AS p50_s,
           round(quantile_cont(CAST(gap AS DOUBLE), 0.90) / 1000000, 6)
             AS p90_s,
           round(quantile_cont(CAST(gap AS DOUBLE), 0.99) / 1000000, 6)
             AS p99_s
    FROM g WHERE gap IS NOT NULL GROUP BY 1
    """,
)
def q294_event_cadence_percentiles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Event CADENCE profile: exact p50/p90/p99 of the inter-arrival gap
    between consecutive same-type events of the same user, per event
    type — the polling-vs-bursty signature that sizes streaming-state
    watermarks (streaming/stateful.py timers) and rate limits. Gaps
    come from one lag() over a (user, type)-PARTITIONED window (keyed,
    WGL-pruned — never a global sort); percentiles ride the distributed
    exact rank frame (no per-group multiset buffering). Microsecond
    integers end-to-end: the parquet timestamps carry sub-second
    precision, so second-truncated math would corrupt every gap."""
    from pyspark.sql import Window

    from etl_jetro_spark.operators.aggregate import exact_group_percentiles

    e = load_events(spark, sf_dir).select(
        "user_id",
        "event_type",
        "event_id",
        # engine contract: ts is epoch ns (BIGINT, us-precision source)
        F.expr("ts div 1000").alias("us"),
    )
    w = Window.partitionBy("user_id", "event_type").orderBy("us", "event_id")
    g = e.withColumn("gap", F.col("us") - F.lag("us").over(w)).filter(
        F.col("gap").isNotNull()
    )
    pct = exact_group_percentiles(
        g,
        ["event_type"],
        F.col("gap").cast("double"),
        {"p50": 0.5, "p90": 0.9, "p99": 0.99},
    )
    n = g.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps")
    )
    return n.join(bcast_small(pct), "event_type").select(
        "event_type",
        "n_gaps",
        F.round(F.col("p50") / 1e6, 6).alias("p50_s"),
        F.round(F.col("p90") / 1e6, 6).alias("p90_s"),
        F.round(F.col("p99") / 1e6, 6).alias("p99_s"),
    )


@query(
    "q295_label_silhouette",
    """
    WITH e AS (
      SELECT vec_id, label,
             generate_subscripts(embedding, 1) AS i,
             CAST(unnest(embedding) AS DOUBLE) AS x
      FROM embeddings),
    cent AS (SELECT label AS clabel, i, avg(x) AS m FROM e GROUP BY 1, 2),
    nv AS (SELECT vec_id, sqrt(sum(x * x)) AS nv FROM e GROUP BY 1),
    ncn AS (SELECT clabel, sqrt(sum(m * m)) AS nc FROM cent GROUP BY 1),
    dots AS (SELECT e.vec_id, e.label, c.clabel, sum(e.x * c.m) AS dot
             FROM e JOIN cent c USING (i) GROUP BY 1, 2, 3),
    cosv AS (SELECT d.vec_id, d.label, d.clabel, d.dot / (v.nv * n.nc) AS cos
             FROM dots d JOIN nv v USING (vec_id) JOIN ncn n USING (clabel)),
    pv AS (SELECT vec_id, label,
                  max(CASE WHEN clabel = label THEN cos END) AS own,
                  max(CASE WHEN clabel <> label THEN cos END) AS best_other
           FROM cosv GROUP BY 1, 2)
    SELECT label,
           CAST(count(*) AS BIGINT) AS n_vecs,
           round(avg(own), 6) AS avg_own_cos,
           round(avg(best_other), 6) AS avg_best_other_cos,
           round(avg(own - best_other), 6) AS avg_margin
    FROM pv GROUP BY 1
    """,
)
def q295_label_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-cluster SEPARATION audit (centroid silhouette): per vector,
    cosine to its own label centroid vs the best other-label centroid;
    per label, the mean margin — a near-zero or negative margin flags
    labels that are not separable in embedding space (mislabeled data,
    or an encoder that can't tell them apart) BEFORE anyone trains a
    probe on them. Centroids reduce through one dim-keyed partial-agg
    shuffle to a labels x dims frame, re-assembled into labels-count
    arrays (k-bounded, bcast_small); every vector then scores all K
    centroids in ONE broadcast-join pass — n x K rows, never n x n."""
    from etl_jetro_spark.operators.similarity import cosine

    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    pe = e.select("label", F.posexplode("v").alias("i", "x"))
    cent = pe.groupBy("label", "i").agg(F.avg("x").alias("m"))
    carr = cent.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("i", "m"))),
            lambda s: s["m"],
        ).alias("cv")
    )
    cx = e.crossJoin(
        bcast_small(carr.select(F.col("label").alias("clabel"), "cv"))
    )
    per = cx.select(
        "vec_id", "label", "clabel", cosine(F.col("v"), F.col("cv")).alias("cos")
    )
    pv = per.groupBy("vec_id", "label").agg(
        F.max(F.when(F.col("clabel") == F.col("label"), F.col("cos"))).alias(
            "own"
        ),
        F.max(F.when(F.col("clabel") != F.col("label"), F.col("cos"))).alias(
            "best_other"
        ),
    )
    return pv.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n_vecs"),
        F.round(F.avg("own"), 6).alias("avg_own_cos"),
        F.round(F.avg("best_other"), 6).alias("avg_best_other_cos"),
        F.round(F.avg(F.col("own") - F.col("best_other")), 6).alias(
            "avg_margin"
        ),
    )


@query(
    "q296_vocab_coverage_curve",
    f"""
    WITH t0 AS (SELECT unnest(string_split({DK_NORM_TEXT}, ' ')) AS t
                FROM documents),
    c AS (SELECT t, count(*) AS c FROM t0 WHERE t <> '' GROUP BY 1),
    r AS (SELECT c, row_number() OVER (ORDER BY c DESC, t) AS rn FROM c),
    a AS (SELECT sum(c) AS total, count(*) AS vocab,
                 sum(CASE WHEN rn <= 100 THEN c ELSE 0 END) AS m100,
                 sum(CASE WHEN rn <= 1000 THEN c ELSE 0 END) AS m1000,
                 sum(CASE WHEN rn <= 5000 THEN c ELSE 0 END) AS m5000,
                 sum(CASE WHEN rn <= 20000 THEN c ELSE 0 END) AS m20000
          FROM r)
    SELECT top_k, CAST(vocab AS BIGINT) AS vocab_size,
           CAST(total AS BIGINT) AS total_tokens,
           CAST(m AS BIGINT) AS covered_tokens,
           round(m / CAST(total AS DOUBLE), 6) AS covered_share
    FROM (
      SELECT CAST(100 AS BIGINT) AS top_k, m100 AS m, vocab, total FROM a
      UNION ALL
      SELECT 1000, m1000, vocab, total FROM a
      UNION ALL
      SELECT 5000, m5000, vocab, total FROM a
      UNION ALL
      SELECT 20000, m20000, vocab, total FROM a)
    """,
)
def q296_vocab_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-budget coverage curve: what share of total token mass
    the top-K most frequent tokens cover, at K = 100 / 1k / 5k / 20k —
    the closed-vocab truncation-loss table behind every tokenizer-size
    decision (the OOV mass is 1 - covered_share). Token counts are one
    partial-agg shuffle; the global frequency rank rides the
    DISTRIBUTED rank frame (group_ranked, keys=[] — a plain
    row_number() window here would serialize the whole vocabulary
    through one task); all four cutoffs are conditional aggregates in
    ONE pass over the ranked vocab, stacked by inline-array explode.
    The vocabulary is never collected or broadcast."""
    from etl_jetro_spark.functions.hashing import norm_text
    from etl_jetro_spark.operators.aggregate import group_ranked

    KS = [100, 1000, 5000, 20000]
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(F.split(norm_text("text"), " ")).alias("t")
    ).filter(F.col("t") != "")
    c = toks.groupBy("t").agg(F.count(F.lit(1)).alias("c"))
    ranked = group_ranked(
        c.select("t", "c", (-F.col("c")).alias("negc")),
        [],
        "negc",
        tiebreak=["t", "c"],
    )
    a = ranked.agg(
        F.sum("c").alias("total"),
        F.count(F.lit(1)).alias("vocab"),
        *[
            F.sum(F.when(F.col("_rn") <= k, F.col("c")).otherwise(0)).alias(
                f"m{k}"
            )
            for k in KS
        ],
    )
    return a.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).cast("long").alias("top_k"),
                        F.col(f"m{k}").alias("m"),
                    )
                    for k in KS
                ]
            )
        ).alias("s"),
        "vocab",
        "total",
    ).select(
        F.col("s.top_k").alias("top_k"),
        F.col("vocab").cast("long").alias("vocab_size"),
        F.col("total").cast("long").alias("total_tokens"),
        F.col("s.m").cast("long").alias("covered_tokens"),
        F.round(F.col("s.m") / F.col("total").cast("double"), 6).alias(
            "covered_share"
        ),
    )


# --------------------------------------------------------------------------
# 36. Round-7 fourth wave: TPC-H Q9/Q15 shapes, engagement Markov,
#     per-part robust price dispersion, context-window truncation loss,
#     prefix dedup yield, token length profile
# --------------------------------------------------------------------------

@query(
    "q297_nation_year_profit",
    """
    WITH p AS (SELECT p_partkey, p_retailprice FROM part
               WHERE p_name LIKE '%red%'),
    j AS (SELECT n.n_name AS nation,
                 CAST(year(o.o_orderdate) AS INT) AS o_year,
                 l.l_extendedprice * (1 - l.l_discount)
                   - 0.55 * p.p_retailprice * l.l_quantity AS profit
          FROM lineitem l
          JOIN p ON l.l_partkey = p.p_partkey
          JOIN supplier s ON l.l_suppkey = s.s_suppkey
          JOIN nation n ON s.s_nationkey = n.n_nationkey
          JOIN orders o ON l.l_orderkey = o.o_orderkey)
    SELECT nation, o_year,
           round(sum(profit), 4)        AS sum_profit,
           CAST(count(*) AS BIGINT)     AS n_lines
    FROM j GROUP BY nation, o_year
    """,
)
def q297_nation_year_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape on this schema: profit attribution per supplier
    NATION x order YEAR for one product family (p_name token filter),
    with cost proxied at 55% of retail price (no partsupp table here).
    The name filter pushes to the part scan BEFORE the partkey join
    (part grows with data -> size-gated, AQE decides past the
    threshold); supplier joins plain on suppkey; nation is the fixed
    25-row dim (bcast_small); the one unavoidable data x data join is
    lineitem x orders on the orderkey — hash-partitioned both sides,
    no skew (orderkeys are unique on the orders side). Output is
    nations x years — dimension-sized."""
    p = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%red%"))
        .select("p_partkey", "p_retailprice")
    )
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    j = (
        li.join(bcast_sized(p), li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(bcast_small(n), s.s_nationkey == n.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
    )
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.lit(
        0.55
    ) * F.col("p_retailprice") * F.col("l_quantity")
    return (
        j.select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
            profit.alias("profit"),
        )
        .groupBy("nation", "o_year")
        .agg(
            F.round(F.sum("profit"), 4).alias("sum_profit"),
            F.count(F.lit(1)).cast("long").alias("n_lines"),
        )
    )


@query(
    "q298_peak_quarter_supplier",
    """
    WITH r AS (SELECT l_suppkey,
                      sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                               AS BIGINT)) AS rev_c
               FROM lineitem
               WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                 AND l_shipdate <  TIMESTAMP '1996-04-01'
               GROUP BY l_suppkey),
    m AS (SELECT max(rev_c) AS mx FROM r)
    SELECT s.s_suppkey, s.s_name,
           round(r.rev_c / 100.0, 2) AS total_revenue
    FROM r JOIN m ON r.rev_c = m.mx
    JOIN supplier s ON s.s_suppkey = r.l_suppkey
    """,
)
def q298_peak_quarter_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) with the maximum revenue over one
    quarter. Revenue accumulates in INTEGER CENTS (per-line round, then
    an exact associative integer sum — q265's trick), so the global max
    and the equality against it are bit-identical cross-engine; a double
    sum here could crown a different winner per fold order. The global
    max is a 1-row scalar aggregate CROSS-joined back (broadcast — the
    planlint-sanctioned global-total shape, never a global window);
    supplier names join on the suppkey after the revenue frame is
    already supplier-sized."""
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    r = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .select(
            "l_suppkey",
            F.round(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
            )
            .cast("long")
            .alias("cents"),
        )
        .groupBy("l_suppkey")
        .agg(F.sum("cents").alias("rev_c"))
    )
    m = r.agg(F.max("rev_c").alias("mx"))
    return (
        r.crossJoin(bcast_small(m))  # 1-row scalar
        .filter(F.col("rev_c") == F.col("mx"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("rev_c") / 100.0, 2).alias("total_revenue"),
        )
    )


@query(
    "q299_engagement_decile_markov",
    """
    WITH wkly AS (SELECT CAST(date_trunc('week', ts) AS DATE) AS wk,
                         user_id, count(*) AS cnt
                  FROM events GROUP BY wk, user_id),
    rk AS (SELECT wk, user_id, cnt,
                  row_number() OVER (PARTITION BY wk
                                     ORDER BY cnt, user_id) AS rn,
                  count(*) OVER (PARTITION BY wk) AS n
           FROM wkly),
    dec AS (SELECT wk, user_id,
                   CAST(((rn - 1) * 10) // n AS INT) + 1 AS d
            FROM rk),
    tr AS (SELECT a.d AS d_from, b.d AS d_to
           FROM dec a JOIN dec b
             ON a.user_id = b.user_id AND b.wk = a.wk + 7),
    c AS (SELECT d_from, d_to, CAST(count(*) AS BIGINT) AS n_users
          FROM tr GROUP BY d_from, d_to),
    t AS (SELECT d_from, sum(n_users) AS tot FROM c GROUP BY d_from)
    SELECT c.d_from, c.d_to, c.n_users,
           round(c.n_users / CAST(t.tot AS DOUBLE), 6) AS share
    FROM c JOIN t USING (d_from)
    """,
)
def q299_engagement_decile_markov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engagement-decile MARKOV matrix: users bucketed into weekly
    activity deciles, transition counts between consecutive weeks — the
    retention-dynamics table (is the top decile sticky? do middle
    deciles churn downward?). The weekly decile is an explicit
    row-number formula (floor((rn-1)*10/n)+1, user_id tiebreak) so both
    engines bucket identically — NOT ntile, whose remainder spreading
    is engine-defined. The per-week rank rides the distributed rank
    frame (group_ranked keyed by week — weeks x users rows, no week
    ever serialized through one task; a data-scale user base spreads
    across the range partitions). The week-over-week self-join is
    user-keyed (uniform — each user appears once per week); the final
    10x10 matrix and its row totals are bounded frames (bcast_small)."""
    from etl_jetro_spark.operators.aggregate import group_ranked

    e = load_events(spark, sf_dir)
    wkly = (
        e.select(
            F.date_trunc("week", F.col("ts_utc")).cast("date").alias("wk"),
            "user_id",
        )
        .groupBy("wk", "user_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    rk = group_ranked(wkly, ["wk"], "cnt", tiebreak=["user_id"])
    dec = rk.select(
        "wk",
        "user_id",
        (
            F.floor(((F.col("_rn") - 1) * 10) / F.col("_n")).cast("int") + 1
        ).alias("d"),
    )
    a = dec.select(
        F.col("user_id").alias("u"),
        F.col("wk").alias("wk_a"),
        F.col("d").alias("d_from"),
    )
    b = dec.select(
        F.col("user_id").alias("u"),
        F.col("wk").alias("wk_b"),
        F.col("d").alias("d_to"),
    )
    tr = a.join(
        b,
        (a.u == b.u) & (F.col("wk_b") == F.date_add(F.col("wk_a"), 7)),
    )
    c = tr.groupBy("d_from", "d_to").agg(
        F.count(F.lit(1)).cast("long").alias("n_users")
    )
    t = c.groupBy("d_from").agg(F.sum("n_users").alias("tot"))
    return c.join(bcast_small(t), "d_from").select(
        "d_from",
        "d_to",
        "n_users",
        F.round(F.col("n_users") / F.col("tot").cast("double"), 6).alias(
            "share"
        ),
    )


@query(
    "q300_part_price_dispersion",
    """
    WITH li AS (SELECT l_partkey, l_extendedprice / l_quantity AS up
                FROM lineitem WHERE l_quantity > 0),
    med AS (SELECT l_partkey, quantile_cont(up, 0.5) AS med
            FROM li GROUP BY l_partkey),
    dev AS (SELECT l.l_partkey, l.up, m.med, abs(l.up - m.med) AS dv
            FROM li l JOIN med m USING (l_partkey)),
    madt AS (SELECT l_partkey, quantile_cont(dv, 0.5) AS mad
             FROM dev GROUP BY l_partkey),
    pp AS (SELECT d.l_partkey, count(*) AS n,
                  any_value(d.med) AS med, any_value(t.mad) AS mad,
                  sum(CASE WHEN d.dv > 3.0 * t.mad THEN 1 ELSE 0 END) AS n_out
           FROM dev d JOIN madt t USING (l_partkey)
           GROUP BY d.l_partkey)
    SELECT p.p_brand,
           CAST(count(*) AS BIGINT)          AS n_parts,
           CAST(sum(pp.n) AS BIGINT)         AS n_lines,
           CAST(sum(pp.n_out) AS BIGINT)     AS n_outlier_lines,
           round(avg(pp.mad / pp.med), 6)    AS avg_rel_mad
    FROM pp JOIN part p ON pp.l_partkey = p.p_partkey
    GROUP BY p.p_brand
    """,
)
def q300_part_price_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-PART robust unit-price dispersion rolled up by brand: exact
    median + MAD of the observed unit price for EVERY part (the
    millions-of-small-groups regime — q122 ran the same operator over 5
    event types; this is its high-cardinality stress shape), then
    brand-level outlier-line counts and the mean relative MAD. Both
    medians ride the range-partitioned rank frame inside
    operators.aggregate.mad_outliers — no per-group multiset, no
    per-group serial sort, so the shape survives a billion-part
    catalog; the groups-sized median frames join back size-gated. The
    brand rollup joins the parts dim on its key and reduces to
    brand-count rows."""
    from etl_jetro_spark.operators.aggregate import mad_outliers

    li = load(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 0)
    up = li.select(
        "l_partkey",
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("up"),
    )
    pp = mad_outliers(up, ["l_partkey"], "up", z=3.0)
    p = load(spark, sf_dir, "part").select("p_partkey", "p_brand")
    return (
        pp.join(p, pp.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.sum("n").cast("long").alias("n_lines"),
            F.sum("n_outliers").cast("long").alias("n_outlier_lines"),
            F.round(F.avg(F.col("mad") / F.col("med")), 6).alias(
                "avg_rel_mad"
            ),
        )
    )


@query(
    "q301_truncation_loss_curve",
    """
    WITH d AS (SELECT source,
                 CASE WHEN trim(text) = '' THEN 0
                      ELSE len(regexp_split_to_array(trim(text), '\\s+'))
                 END AS nt
               FROM documents),
    a AS (SELECT source, count(*) AS n_docs, sum(nt) AS total_tokens,
                 sum(least(nt, 32)) AS k32,
                 sum(least(nt, 64)) AS k64,
                 sum(least(nt, 96)) AS k96,
                 sum(CASE WHEN nt > 32 THEN 1 ELSE 0 END) AS t32,
                 sum(CASE WHEN nt > 64 THEN 1 ELSE 0 END) AS t64,
                 sum(CASE WHEN nt > 96 THEN 1 ELSE 0 END) AS t96
          FROM d GROUP BY source)
    SELECT source, ctx_len,
           CAST(total_tokens AS BIGINT) AS total_tokens,
           CAST(kept AS BIGINT)         AS kept_tokens,
           round(1 - kept / CAST(total_tokens AS DOUBLE), 6) AS lost_share,
           CAST(n_trunc AS BIGINT)      AS n_docs_truncated,
           round(n_trunc / CAST(n_docs AS DOUBLE), 6) AS trunc_doc_share
    FROM (
      SELECT source, CAST(32 AS BIGINT) AS ctx_len, k32 AS kept,
             t32 AS n_trunc, total_tokens, n_docs FROM a
      UNION ALL
      SELECT source, 64, k64, t64, total_tokens, n_docs FROM a
      UNION ALL
      SELECT source, 96, k96, t96, total_tokens, n_docs FROM a)
    """,
)
def q301_truncation_loss_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window TRUNCATION-LOSS curve per source: at each candidate
    context length L, the token mass lost to truncation
    (sum(max(0, n_tok - L)) / total) and the share of documents cut —
    the table behind a sequence-length budget decision (too short
    wastes the corpus tail; the loss curve shows exactly how much).
    ONE pass: per-doc token counts reduce through a single source-keyed
    partial-agg shuffle carrying all three cutoffs as conditional
    aggregates; the sources x 3 output is stacked by inline-array
    explode (q296's shape). Nothing is broadcast; cutoffs are tuned to
    the fixture's 10-99-token docs (a real corpus would use
    512/2048/8192 — the plan is cutoff-count-linear either way)."""
    from etl_jetro_spark.operators.textstats import token_count

    KS = [32, 64, 96]
    d = load(spark, sf_dir, "documents").select(
        "source", token_count("text").cast("long").alias("nt")
    )
    a = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("nt").alias("total_tokens"),
        *[F.sum(F.least(F.col("nt"), F.lit(k))).alias(f"k{k}") for k in KS],
        *[
            F.sum((F.col("nt") > k).cast("long")).alias(f"t{k}")
            for k in KS
        ],
    )
    return a.select(
        "source",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).cast("long").alias("ctx_len"),
                        F.col(f"k{k}").alias("kept"),
                        F.col(f"t{k}").alias("n_trunc"),
                    )
                    for k in KS
                ]
            )
        ).alias("s"),
        "total_tokens",
        "n_docs",
    ).select(
        "source",
        F.col("s.ctx_len").alias("ctx_len"),
        F.col("total_tokens").cast("long").alias("total_tokens"),
        F.col("s.kept").cast("long").alias("kept_tokens"),
        F.round(
            1 - F.col("s.kept") / F.col("total_tokens").cast("double"), 6
        ).alias("lost_share"),
        F.col("s.n_trunc").cast("long").alias("n_docs_truncated"),
        F.round(
            F.col("s.n_trunc") / F.col("n_docs").cast("double"), 6
        ).alias("trunc_doc_share"),
    )


@query(
    "q302_prefix_dedup_yield",
    f"""
    WITH fp AS (SELECT doc_id, source,
                  CASE WHEN trim(text) = '' THEN 0
                       ELSE len(regexp_split_to_array(trim(text), '\\s+'))
                  END AS nt,
                  md5(array_to_string(list_slice(
                      string_split({DK_NORM_TEXT}, ' '), 1, 20), ' ')) AS f
                FROM documents),
    k AS (SELECT f, min(doc_id) AS keeper FROM fp GROUP BY f)
    SELECT fp.source,
           CAST(count(*) AS BIGINT)   AS n_docs,
           CAST(sum(fp.nt) AS BIGINT) AS total_tokens,
           CAST(sum(CASE WHEN fp.doc_id = k.keeper THEN 1 ELSE 0 END)
                AS BIGINT)            AS kept_docs,
           CAST(sum(CASE WHEN fp.doc_id = k.keeper THEN fp.nt ELSE 0 END)
                AS BIGINT)            AS kept_tokens,
           round(sum(CASE WHEN fp.doc_id = k.keeper THEN fp.nt ELSE 0 END)
                 / CAST(sum(fp.nt) AS DOUBLE), 6) AS token_yield
    FROM fp JOIN k USING (f)
    GROUP BY fp.source
    """,
)
def q302_prefix_dedup_yield(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PREFIX-dedup token yield per source: documents sharing the same
    normalized 20-token PREFIX collapse to one keeper (min doc_id —
    boilerplate and mirrored-lede detection, the cheap first pass
    before MinHash), and each source reports how much of its token
    mass survives. The prefix fingerprint is a scan-side expression
    (slice of the normalized split — no shuffle to build); keeper
    election is one fingerprint-keyed partial-agg shuffle joined back
    on the same key (exact_duplicates' shape — co-partitioned, zero
    extra exchange under AQE); the rollup is sources-sized. Keeper
    election is GLOBAL (min doc_id across sources), so a source that
    syndicates another's ledes shows the loss — per-source election
    would hide exactly that."""
    from etl_jetro_spark.functions.hashing import norm_text
    from etl_jetro_spark.operators.textstats import token_count

    d = load(spark, sf_dir, "documents")
    fp = d.select(
        "doc_id",
        "source",
        token_count("text").cast("long").alias("nt"),
        F.md5(
            F.array_join(
                F.slice(F.split(norm_text("text"), " "), 1, 20), " "
            )
        ).alias("f"),
    )
    k = fp.groupBy("f").agg(F.min("doc_id").alias("keeper"))
    j = fp.join(k, "f")
    kept = (F.col("doc_id") == F.col("keeper")).cast("long")
    return j.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("nt").cast("long").alias("total_tokens"),
        F.sum(kept).cast("long").alias("kept_docs"),
        F.sum(kept * F.col("nt")).cast("long").alias("kept_tokens"),
        F.round(
            F.sum(kept * F.col("nt")) / F.sum("nt").cast("double"), 6
        ).alias("token_yield"),
    )


@query(
    "q303_token_length_profile",
    f"""
    WITH t0 AS (SELECT unnest(string_split({DK_NORM_TEXT}, ' ')) AS t
                FROM documents),
    t1 AS (SELECT t, least(len(t), 15) AS lb FROM t0 WHERE t <> ''),
    g AS (SELECT lb, CAST(count(*) AS BIGINT) AS n_tokens,
                 CAST(count(DISTINCT t) AS BIGINT) AS n_distinct
          FROM t1 GROUP BY lb),
    s AS (SELECT sum(n_tokens) AS tot FROM g)
    SELECT g.lb AS len_bucket, g.n_tokens, g.n_distinct,
           round(g.n_tokens / CAST(s.tot AS DOUBLE), 6) AS mass_share
    FROM g, s
    """,
)
def q303_token_length_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token LENGTH profile of the corpus: occurrence count, distinct
    types, and token-mass share per character-length bucket (capped at
    15+) — the character-budget histogram a subword tokenizer's
    max-piece-length and byte-fallback decisions read from. Token
    explode feeds ONE two-phase aggregate (count + count(DISTINCT t)
    expand by Spark's distinct-agg rewrite — partials by (lb, t), never
    a per-group set); the 15-row result takes its mass denominator
    from a 1-row scalar aggregate cross-joined back (bcast_small) —
    the global total never rides a global window."""
    from etl_jetro_spark.functions.hashing import norm_text

    d = load(spark, sf_dir, "documents")
    t1 = (
        d.select(F.explode(F.split(norm_text("text"), " ")).alias("t"))
        .filter(F.col("t") != "")
        .select("t", F.least(F.length("t"), F.lit(15)).alias("lb"))
    )
    g = t1.groupBy("lb").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.countDistinct("t").cast("long").alias("n_distinct"),
    )
    s = g.agg(F.sum("n_tokens").alias("tot"))
    return g.crossJoin(bcast_small(s)).select(
        F.col("lb").alias("len_bucket"),
        "n_tokens",
        "n_distinct",
        F.round(F.col("n_tokens") / F.col("tot").cast("double"), 6).alias(
            "mass_share"
        ),
    )


@query(
    "q304_reserve_balance_customers",
    """
    WITH ab AS (SELECT avg(c_acctbal) AS v FROM customer WHERE c_acctbal > 0),
    sel AS (SELECT c.c_mktsegment, c.c_acctbal
            FROM customer c CROSS JOIN ab
            WHERE c.c_acctbal > ab.v
              AND NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_custkey = c.c_custkey
                                AND o.o_orderdate >= DATE '1999-01-01'))
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_cust,
           round(sum(c_acctbal), 4) AS total_bal,
           round(avg(c_acctbal), 6) AS avg_bal
    FROM sel GROUP BY 1
    """,
)
def q304_reserve_balance_customers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q22 shape: dormant buying power — customers whose balance
    beats the positive-balance average but who placed NO order since
    1999 (every fixture customer has SOME order, so the lapse cutoff is
    what makes the cohort non-empty — same move as TPC-H's own 7-year
    window), rolled up by market segment. The average is a 1-row scalar
    aggregate CROSS-joined back (bcast_small — never a global window);
    the lapse test is a LEFT ANTI against the date-filtered orders keys
    (filter pushes to the orders scan; the anti probe carries ONE
    column); the segment rollup is segments-sized."""
    c = load(spark, sf_dir, "customer")
    o = (
        load(spark, sf_dir, "orders")
        .filter(
            F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp")
        )
        .select("o_custkey")
    )
    ab = c.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("v")
    )
    sel = (
        c.crossJoin(bcast_small(ab))
        .filter(F.col("c_acctbal") > F.col("v"))
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
    )
    return sel.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("long").alias("n_cust"),
        F.round(F.sum("c_acctbal"), 4).alias("total_bal"),
        F.round(F.avg("c_acctbal"), 6).alias("avg_bal"),
    )


@query(
    "q305_part_supplier_variety",
    """
    WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
    j AS (SELECT p.p_brand, p.p_size, ps.l_suppkey
          FROM ps JOIN part p ON ps.l_partkey = p.p_partkey
          WHERE p.p_brand <> 'Brand#45' AND p.p_type NOT LIKE 'MEDIUM%')
    SELECT p_brand, p_size,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM j GROUP BY 1, 2
    """,
)
def q305_part_supplier_variety(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q16 shape: how many DISTINCT suppliers can source each
    (brand, size) cell, excluding one brand and one type family — the
    sourcing-diversity table a procurement planner reads. The
    supplier-part relation is recovered from lineitem as a DISTINCT
    key-pair projection (partial-agg dedup BEFORE the part join — the
    fact table never joins at raw-row width); part is filtered at the
    scan (both predicates push down) and size-gated for broadcast
    (bcast_sized — a dim that grows with SF must prove it fits). The
    count(DISTINCT) expands via Spark's two-phase distinct-agg rewrite:
    partials keyed by (brand, size, suppkey), never a per-group set."""
    li = load(spark, sf_dir, "lineitem")
    p = (
        load(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#45")
            & (~F.col("p_type").startswith("MEDIUM"))
        )
        .select("p_partkey", "p_brand", "p_size")
    )
    ps = li.select("l_partkey", "l_suppkey").distinct()
    j = ps.join(
        bcast_sized(p), F.col("l_partkey") == F.col("p_partkey")
    )
    return j.groupBy("p_brand", "p_size").agg(
        F.countDistinct("l_suppkey").cast("long").alias("supplier_cnt")
    )


@query(
    "q306_red_part_top_suppliers",
    """
    WITH red AS (SELECT p_partkey FROM part WHERE p_name LIKE 'red%'),
    sq AS (SELECT l.l_suppkey, sum(l.l_quantity) AS qty
           FROM lineitem l JOIN red r ON l.l_partkey = r.p_partkey
           WHERE l.l_shipdate >= DATE '1996-01-01'
             AND l.l_shipdate < DATE '1997-01-01'
           GROUP BY 1),
    t AS (SELECT avg(qty) AS thr FROM sq)
    SELECT s.s_suppkey, s.s_name, round(sq.qty, 4) AS red_qty
    FROM sq CROSS JOIN t
    JOIN supplier s ON sq.l_suppkey = s.s_suppkey
    WHERE sq.qty > t.thr
    """,
)
def q306_red_part_top_suppliers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q20 shape: suppliers who moved an above-average volume of
    'red'-named parts in 1996 — the shortlist for a part-family supply
    contract. The part filter runs at the scan and the surviving keys
    join size-gated (bcast_sized); the date filter pushes into the
    lineitem scan, so the only data-scale work is one suppkey-keyed
    partial-agg shuffle. The threshold is a 1-row scalar aggregate
    cross-joined back (bcast_small); supplier names attach AFTER the
    frame is already supplier-sized."""
    li = load(spark, sf_dir, "lineitem")
    red = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_name").startswith("red"))
        .select("p_partkey")
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    sq = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(bcast_sized(red), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    t = sq.agg(F.avg("qty").alias("thr"))
    return (
        sq.crossJoin(bcast_small(t))
        .filter(F.col("qty") > F.col("thr"))
        .join(bcast_sized(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey", "s_name", F.round("qty", 4).alias("red_qty")
        )
    )


@query(
    "q307_late_shipment_priority",
    """
    SELECT l.l_linestatus,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
    GROUP BY 1
    """,
)
def q307_late_shipment_priority(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q12 shape: among shipments that left more than 60 days
    after the order was placed, how many belonged to critical
    (URGENT/HIGH) orders vs the rest, per line status — the
    late-but-critical exposure table. One data×data orderkey join
    (sort-merge; AQE may flip it at runtime) with both scans projected
    to 3 columns; the lateness predicate references both sides so it
    filters AT the join, and the priority split is a conditional
    aggregate in the same linestatus-keyed pass — no second shuffle."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linestatus", "l_shipdate"
    )
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        )
        .groupBy("l_linestatus")
        .agg(
            F.sum(hi.cast("long")).cast("long").alias("high_line_count"),
            F.sum((~hi).cast("long")).cast("long").alias("low_line_count"),
        )
    )


@query(
    "q308_sentence_length_profile",
    """
    WITH s AS (
      SELECT source, trim(sv) AS sv
      FROM (SELECT source, unnest(string_split_regex(text, '[.!?]+')) AS sv
            FROM documents)
      WHERE trim(sv) <> ''
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_sentences,
           round(avg(len(sv)), 6) AS avg_len,
           round(quantile_cont(CAST(len(sv) AS DOUBLE), 0.5), 6) AS p50_len,
           round(quantile_cont(CAST(len(sv) AS DOUBLE), 0.9), 6) AS p90_len
    FROM s GROUP BY 1
    """,
)
def q308_sentence_length_profile(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """SENTENCE-length profile per source: count, mean, and exact
    p50/p90 character length of sentences (split on [.!?]+) — the
    segmentation signal behind chunking and pack-by-sentence decisions
    (short-sentence sources pack tight; long-tail sources need
    mid-sentence splits). The sentence explode is scan-side; the mean
    rides one source-keyed partial-agg shuffle and the percentiles ride
    the distributed exact rank frame (operators/aggregate.py — no
    per-group multiset buffering, matching quantile_cont's
    interpolation bit-for-bit)."""
    from etl_jetro_spark.operators.aggregate import exact_group_percentiles

    d = load(spark, sf_dir, "documents")
    s = (
        d.select(
            "source",
            F.explode(F.split(F.col("text"), r"[.!?]+")).alias("sv"),
        )
        .select("source", F.trim(F.col("sv")).alias("sv"))
        .filter(F.col("sv") != "")
        .select("source", F.length("sv").alias("slen"))
    )
    pct = exact_group_percentiles(
        s,
        ["source"],
        F.col("slen").cast("double"),
        {"p50": 0.5, "p90": 0.9},
    )
    n = s.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_sentences"),
        F.round(F.avg("slen"), 6).alias("avg_len"),
    )
    return n.join(bcast_small(pct), "source").select(
        "source",
        "n_sentences",
        "avg_len",
        F.round("p50", 6).alias("p50_len"),
        F.round("p90", 6).alias("p90_len"),
    )


@query(
    "q309_dup_cluster_size_histogram",
    f"""
    WITH cl AS (SELECT md5({DK_NORM_TEXT}) AS h,
                       CAST(count(*) AS BIGINT) AS sz
                FROM documents GROUP BY 1),
    g AS (SELECT sz AS cluster_size,
                 CAST(count(*) AS BIGINT) AS n_clusters,
                 CAST(sum(sz) AS BIGINT) AS n_docs
          FROM cl GROUP BY 1),
    t AS (SELECT sum(n_docs) AS tot FROM g)
    SELECT g.cluster_size, g.n_clusters, g.n_docs,
           round(g.n_docs / CAST(t.tot AS DOUBLE), 6) AS doc_share
    FROM g CROSS JOIN t
    """,
)
def q309_dup_cluster_size_histogram(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Exact-duplicate CLUSTER-SIZE histogram: how many clusters exist
    at each multiplicity and what share of the corpus sits in them —
    the shape that decides whether dedup is worth a MinHash pass (a
    fat tail of big clusters = boilerplate; all-singletons = skip).
    Two stacked partial-agg shuffles, each strictly smaller than the
    last (docs → clusters → sizes); the doc-share denominator is a
    1-row scalar aggregate cross-joined back (bcast_small). The hash is
    the shared md5-of-normalized-text key (functions/hashing.py) every
    exact-dedup query agrees on."""
    from etl_jetro_spark.functions.hashing import norm_text

    d = load(spark, sf_dir, "documents")
    cl = (
        d.select(F.md5(norm_text("text")).alias("h"))
        .groupBy("h")
        .agg(F.count(F.lit(1)).cast("long").alias("sz"))
    )
    g = cl.groupBy(F.col("sz").alias("cluster_size")).agg(
        F.count(F.lit(1)).cast("long").alias("n_clusters"),
        F.sum("sz").cast("long").alias("n_docs"),
    )
    t = g.agg(F.sum("n_docs").alias("tot"))
    return g.crossJoin(bcast_small(t)).select(
        "cluster_size",
        "n_clusters",
        "n_docs",
        F.round(F.col("n_docs") / F.col("tot").cast("double"), 6).alias(
            "doc_share"
        ),
    )


@query(
    "q310_sampling_temperature_sweep",
    """
    WITH tok AS (
      SELECT source,
             CAST(sum(CASE WHEN trim(text) = '' THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\\s+'))
                  END) AS BIGINT) AS avail
      FROM documents GROUP BY 1),
    x AS (SELECT source, avail, tau
          FROM tok CROSS JOIN (SELECT unnest([0.5, 0.7, 1.0]) AS tau) ts
          WHERE avail > 0),
    d AS (SELECT tau, sum(pow(avail, tau)) AS denom FROM x GROUP BY 1)
    SELECT x.source, x.tau, x.avail AS avail_tokens,
           round(pow(x.avail, x.tau) / d.denom, 6) AS p_sample,
           round(5000000 * pow(x.avail, x.tau) / d.denom / x.avail, 6)
             AS epochs
    FROM x JOIN d USING (tau)
    """,
)
def q310_sampling_temperature_sweep(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Mixture-sampling TEMPERATURE sweep: per-source sampling
    probability p_i ∝ tokens_i^τ at τ ∈ {0.5, 0.7, 1.0} and the
    implied epochs over each source at a fixed token budget — the
    GPT-3/PaLM-style knob that trades natural proportions (τ=1)
    against upweighting small high-quality sources (τ<1), and the
    companion to q268's fixed-target epoch plan. ONE doc-scale pass
    (source-keyed token totals); everything after — the τ explode, the
    per-τ normalizer, the join back — is sources×3-sized arithmetic on
    bcast_small frames."""
    from etl_jetro_spark.operators.textstats import token_count

    BUDGET = 5_000_000
    d = load(spark, sf_dir, "documents")
    tok = (
        d.groupBy("source")
        .agg(F.sum(token_count("text")).cast("long").alias("avail"))
        .filter(F.col("avail") > 0)
    )
    x = tok.select(
        "source",
        "avail",
        F.explode(
            F.array(*[F.lit(t) for t in (0.5, 0.7, 1.0)])
        ).alias("tau"),
    )
    den = x.groupBy("tau").agg(
        F.sum(F.pow(F.col("avail"), F.col("tau"))).alias("denom")
    )
    w = F.pow(F.col("avail"), F.col("tau")) / F.col("denom")
    return x.join(bcast_small(den), "tau").select(
        "source",
        "tau",
        F.col("avail").alias("avail_tokens"),
        F.round(w, 6).alias("p_sample"),
        F.round(F.lit(BUDGET) * w / F.col("avail"), 6).alias("epochs"),
    )


@query(
    "q311_priority_segment_chi2",
    """
    WITH cell AS (
      SELECT c.c_mktsegment AS seg, o.o_orderpriority AS pri,
             count(*) AS n
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2),
    rt AS (SELECT seg, sum(n) AS rn FROM cell GROUP BY 1),
    ct AS (SELECT pri, sum(n) AS cn FROM cell GROUP BY 1),
    tot AS (SELECT sum(n) AS t, CAST(count(DISTINCT seg) AS BIGINT) AS r,
                   CAST(count(DISTINCT pri) AS BIGINT) AS c
            FROM cell),
    s AS (SELECT sum(CAST(cell.n AS DOUBLE) * cell.n / (rt.rn * ct.cn))
                   AS s2
          FROM cell JOIN rt USING (seg) JOIN ct USING (pri))
    SELECT round(tot.t * (s.s2 - 1), 6) AS chi2,
           (tot.r - 1) * (tot.c - 1) AS dof,
           round(sqrt(tot.t * (s.s2 - 1)
                      / (tot.t * least(tot.r - 1, tot.c - 1))), 6)
             AS cramers_v,
           CAST(tot.t AS BIGINT) AS n
    FROM s CROSS JOIN tot
    """,
)
def q311_priority_segment_chi2(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Chi-square INDEPENDENCE test between market segment and order
    priority (with Cramér's V effect size) — the categorical-drift
    companion to q213's KS test and q192's mutual information. Uses the
    zero-cell-safe identity chi2 = N·(Σ n²/(rowtot·coltot) − 1), so
    absent contingency cells need no synthesis. One data-scale custkey
    join + one (seg, pri) partial-agg shuffle; the marginals re-reduce
    from the ≤ segments×priorities cell frame (bcast_small), and the
    result is a single row."""
    o = load(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority"
    )
    c = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    cell = (
        o.join(c, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(
            F.col("c_mktsegment").alias("seg"),
            F.col("o_orderpriority").alias("pri"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    rt = cell.groupBy("seg").agg(F.sum("n").alias("rn"))
    ct = cell.groupBy("pri").agg(F.sum("n").alias("cn"))
    tot = cell.agg(
        F.sum("n").alias("t"),
        F.countDistinct("seg").cast("long").alias("r"),
        F.countDistinct("pri").cast("long").alias("c"),
    )
    s = (
        cell.join(bcast_small(rt), "seg")
        .join(bcast_small(ct), "pri")
        .agg(
            F.sum(
                F.col("n").cast("double")
                * F.col("n")
                / (F.col("rn") * F.col("cn"))
            ).alias("s2")
        )
    )
    chi2 = F.col("t") * (F.col("s2") - 1)
    return s.crossJoin(bcast_small(tot)).select(
        F.round(chi2, 6).alias("chi2"),
        ((F.col("r") - 1) * (F.col("c") - 1)).alias("dof"),
        F.round(
            F.sqrt(
                chi2
                / (F.col("t") * F.least(F.col("r") - 1, F.col("c") - 1))
            ),
            6,
        ).alias("cramers_v"),
        F.col("t").cast("long").alias("n"),
    )


@query(
    "q312_knn_hubness",
    """
    WITH e AS (
      SELECT vec_id, generate_subscripts(embedding, 1) AS i,
             CAST(unnest(embedding) AS DOUBLE) AS v
      FROM embeddings),
    nrm AS (SELECT vec_id, sqrt(sum(v * v)) AS nv FROM e GROUP BY 1),
    p AS (SELECT * FROM e WHERE vec_id < 1000),
    dots AS (SELECT p.vec_id AS probe_id, e.vec_id AS neighbor_id,
                    sum(p.v * e.v) AS dot
             FROM p JOIN e USING (i)
             WHERE p.vec_id <> e.vec_id
             GROUP BY 1, 2),
    sc AS (SELECT d.probe_id, d.neighbor_id,
                  round(d.dot / (np.nv * nn.nv), 12) AS score
           FROM dots d
           JOIN nrm np ON np.vec_id = d.probe_id
           JOIN nrm nn ON nn.vec_id = d.neighbor_id),
    rk AS (SELECT neighbor_id,
                  row_number() OVER (PARTITION BY probe_id
                                     ORDER BY score DESC, neighbor_id) AS r
           FROM sc),
    deg AS (SELECT neighbor_id, count(*) AS ind
            FROM rk WHERE r <= 10 GROUP BY 1),
    alldeg AS (SELECT emb.vec_id, coalesce(deg.ind, 0) AS ind
               FROM embeddings emb
               LEFT JOIN deg ON deg.neighbor_id = emb.vec_id),
    g AS (SELECT CAST(least(ind, 8) AS BIGINT) AS in_degree_bucket,
                 CAST(count(*) AS BIGINT) AS n_vectors
          FROM alldeg GROUP BY 1),
    t AS (SELECT sum(n_vectors) AS tot FROM g)
    SELECT g.in_degree_bucket, g.n_vectors,
           round(g.n_vectors / CAST(t.tot AS DOUBLE), 6) AS vec_share
    FROM g CROSS JOIN t
    """,
)
def q312_knn_hubness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN HUBNESS audit: the in-degree distribution of corpus vectors
    across the top-10 neighbor lists of a FIXED-SIZE deterministic
    probe panel (vec_id < 1000, q164's pattern) — high-dimensional hubs
    (vectors that appear in "everyone's" neighbor list) poison ANN
    recall measurement and near-dup thresholds, and this histogram is
    the standard detector. The panel is a fixed COUNT, not a fixed
    RATE: a %-of-corpus sample makes the exact probe×corpus score
    volume quadratic in the data (measured: 8.4 s at sf0.1 ballooning
    past 7 min at sf1 with a 10% rate; 1000 probes keep it linear —
    hubness estimates don't improve past ~1k probes anyway). Neighbor
    lists come from the Arrow PANEL k-NN
    (operators/similarity.knn_join_panel — the bounded panel closes
    over a mapInPandas stage; every corpus batch scores against it with
    ONE float64 matmul at ~50 ns/pair vs the ~20 µs/pair interpreted
    expression fold, and emits only its local top-k, so the global
    top-k window shuffles ≤ k·|panel| rows per batch; corpus streams
    once, nothing data-scale collected or broadcast); in-degree is one
    neighbor-keyed partial-agg shuffle, zero-degree vectors re-enter by
    a corpus-keyed LEFT join, and the bucket histogram caps at 8+."""
    from etl_jetro_spark.operators.similarity import knn_join_panel

    emb = load(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 1000)
    nn = knn_join_panel(probes, emb, "vec_id", "embedding", k=10)
    deg = nn.groupBy("neighbor_id").agg(
        F.count(F.lit(1)).cast("long").alias("ind")
    )
    alldeg = (
        emb.select("vec_id")
        .join(deg, F.col("vec_id") == F.col("neighbor_id"), "left")
        .select(F.coalesce(F.col("ind"), F.lit(0)).alias("ind"))
    )
    g = alldeg.groupBy(
        F.least(F.col("ind"), F.lit(8)).cast("long").alias(
            "in_degree_bucket"
        )
    ).agg(F.count(F.lit(1)).cast("long").alias("n_vectors"))
    t = g.agg(F.sum("n_vectors").alias("tot"))
    return g.crossJoin(bcast_small(t)).select(
        "in_degree_bucket",
        "n_vectors",
        F.round(
            F.col("n_vectors") / F.col("tot").cast("double"), 6
        ).alias("vec_share"),
    )


@query(
    "q313_revenue_lorenz_curve",
    """
    WITH rev AS (SELECT o_custkey,
                        CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                             AS BIGINT) AS rev_c
                 FROM orders GROUP BY 1),
    rk AS (SELECT rev_c,
                  row_number() OVER (ORDER BY rev_c, o_custkey) AS rn,
                  count(*) OVER () AS n
           FROM rev),
    dec AS (SELECT CAST(((rn - 1) * 10) // n AS INT) + 1 AS decile, rev_c
            FROM rk),
    g AS (SELECT decile, CAST(count(*) AS BIGINT) AS n_cust,
                 CAST(sum(rev_c) AS BIGINT) AS drev
          FROM dec GROUP BY 1),
    t AS (SELECT sum(drev) AS tot FROM g),
    c AS (SELECT a.decile, a.n_cust, a.drev,
                 CAST(sum(b.drev) AS BIGINT) AS cum
          FROM g a JOIN g b ON b.decile <= a.decile
          GROUP BY 1, 2, 3)
    SELECT c.decile, c.n_cust,
           round(c.drev / 100.0, 2) AS decile_revenue,
           round(c.cum / CAST(t.tot AS DOUBLE), 6) AS cum_share
    FROM c CROSS JOIN t
    """,
)
def q313_revenue_lorenz_curve(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Revenue LORENZ curve: cumulative revenue share at each customer
    decile (ascending) — the 10-point curve behind q163/q263's scalar
    Gini, the "bottom 50% of customers hold X% of revenue" table.
    Revenue accumulates in INTEGER CENTS (exact associative sum — a
    double here could flip rank order at decile boundaries per fold
    order); the global decile comes from the distributed rank frame
    (group_ranked with keys=[] — range-partitioned parallel sort, NO
    SinglePartition window) with q299's explicit floor((rn−1)·10/n)+1
    bucketing; the cumulative sum is a ≤10×10 self-join on bcast_small
    frames, never a running window."""
    from etl_jetro_spark.operators.aggregate import group_ranked

    o = load(spark, sf_dir, "orders")
    rev = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
            "rev_c"
        )
    )
    r = group_ranked(rev, [], "rev_c", tiebreak=["o_custkey"])
    dec = r.select(
        (
            F.floor(((F.col("_rn") - 1) * 10) / F.col("_n")).cast("int")
            + 1
        ).alias("decile"),
        F.col("_v").alias("rev_c"),
    )
    g = dec.groupBy("decile").agg(
        F.count(F.lit(1)).cast("long").alias("n_cust"),
        F.sum("rev_c").cast("long").alias("drev"),
    )
    t = g.agg(F.sum("drev").alias("tot"))
    b = g.select(
        F.col("decile").alias("d2"), F.col("drev").alias("drev2")
    )
    c = (
        g.join(bcast_small(b), F.col("d2") <= F.col("decile"))
        .groupBy("decile", "n_cust", "drev")
        .agg(F.sum("drev2").cast("long").alias("cum"))
    )
    return c.crossJoin(bcast_small(t)).select(
        "decile",
        "n_cust",
        F.round(F.col("drev") / 100.0, 2).alias("decile_revenue"),
        F.round(
            F.col("cum") / F.col("tot").cast("double"), 6
        ).alias("cum_share"),
    )


@query(
    "q314_length_diversity_spearman",
    f"""
    WITH tok AS (
      SELECT doc_id, t FROM (
        SELECT doc_id, unnest(string_split({DK_NORM_TEXT}, ' ')) AS t
        FROM documents) WHERE t <> ''),
    per AS (SELECT doc_id, count(*) AS nt, count(DISTINCT t) AS nd
            FROM tok GROUP BY 1),
    v AS (SELECT d.doc_id, d.n_chars,
                 per.nd / CAST(per.nt AS DOUBLE) AS ratio
          FROM documents d JOIN per USING (doc_id)),
    rk AS (SELECT doc_id,
                  row_number() OVER (ORDER BY ratio, doc_id) AS r_div,
                  row_number() OVER (ORDER BY n_chars, doc_id) AS r_len
           FROM v)
    SELECT round(corr(CAST(r_div AS DOUBLE), CAST(r_len AS DOUBLE)), 6)
             AS spearman_rho,
           CAST(count(*) AS BIGINT) AS n_docs
    FROM rk
    """,
)
def q314_length_diversity_spearman(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """SPEARMAN rank correlation between document length and lexical
    diversity (distinct-token ratio) — the monotone do-longer-docs-
    repeat-themselves signal Pearson misses when the relationship is
    nonlinear (and the fixture's ratio is bounded in (0,1] with a hard
    ceiling at short lengths). Per-doc ratios reduce through one
    doc-keyed shuffle; BOTH global rank sequences come from the
    distributed rank frame (group_ranked keys=[] — range-partitioned
    parallel sort with doc_id tiebreak, NO SinglePartition window);
    corr() of the two rank columns is a single scalar aggregate."""
    from etl_jetro_spark.operators.aggregate import group_ranked
    from etl_jetro_spark.functions.hashing import norm_text

    d = load(spark, sf_dir, "documents")
    per = (
        d.select(
            "doc_id",
            F.explode(F.split(norm_text("text"), " ")).alias("t"),
        )
        .filter(F.col("t") != "")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("nt"),
            F.countDistinct("t").alias("nd"),
        )
    )
    v = d.select("doc_id", "n_chars").join(per, "doc_id").select(
        "doc_id",
        "n_chars",
        (F.col("nd") / F.col("nt").cast("double")).alias("ratio"),
    )
    rd = group_ranked(v, [], "ratio", tiebreak=["doc_id"]).select(
        "doc_id", F.col("_rn").alias("r_div")
    )
    rl = group_ranked(v, [], F.col("n_chars").cast("double"),
                      tiebreak=["doc_id"]).select(
        "doc_id", F.col("_rn").alias("r_len")
    )
    return rd.join(rl, "doc_id").agg(
        F.round(
            F.corr(
                F.col("r_div").cast("double"), F.col("r_len").cast("double")
            ),
            6,
        ).alias("spearman_rho"),
        F.count(F.lit(1)).cast("long").alias("n_docs"),
    )


@query(
    "q315_neyman_allocation",
    """
    WITH tok AS (
      SELECT source,
             CASE WHEN trim(text) = '' THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\\s+'))
             END AS nt
      FROM documents),
    st AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                  stddev_pop(CAST(nt AS DOUBLE)) AS sd
           FROM tok GROUP BY 1),
    w AS (SELECT source, n_docs, sd, n_docs * sd AS wt FROM st),
    t AS (SELECT sum(wt) AS tot FROM w)
    SELECT w.source, w.n_docs, round(w.sd, 6) AS sigma_tokens,
           round(w.wt / t.tot, 6) AS neyman_share,
           round(10000 * w.wt / t.tot, 2) AS alloc_docs
    FROM w CROSS JOIN t
    """,
)
def q315_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEYMAN optimal sample allocation across source strata: for a
    fixed audit budget (10k docs), each source's share is proportional
    to N_h·σ_h of its token-count distribution — high-variance strata
    get oversampled, uniform boilerplate strata barely sampled; the
    standard design for corpus QA at a scale where uniform sampling
    wastes most of the budget on homogeneous sources. ONE doc-scale
    source-keyed pass (count + stddev_pop combine map-side); the
    normalizer is a 1-row scalar cross-joined back (bcast_small)."""
    from etl_jetro_spark.operators.textstats import token_count

    d = load(spark, sf_dir, "documents")
    st = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.stddev_pop(token_count("text").cast("double")).alias("sd"),
    )
    w = st.select(
        "source", "n_docs", "sd", (F.col("n_docs") * F.col("sd")).alias("wt")
    )
    t = w.agg(F.sum("wt").alias("tot"))
    return w.crossJoin(bcast_small(t)).select(
        "source",
        "n_docs",
        F.round("sd", 6).alias("sigma_tokens"),
        F.round(F.col("wt") / F.col("tot"), 6).alias("neyman_share"),
        F.round(F.lit(10000) * F.col("wt") / F.col("tot"), 2).alias(
            "alloc_docs"
        ),
    )


@query(
    "q316_fully_returned_orders",
    """
    WITH oagg AS (
      SELECT l_orderkey,
             count(*) AS n_lines,
             sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS n_ret,
             sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                      AS BIGINT)) AS rev_c
      FROM lineitem GROUP BY 1),
    j AS (SELECT CAST(year(o.o_orderdate) AS INT) AS yr,
                 CASE WHEN oagg.n_lines = oagg.n_ret THEN 1 ELSE 0 END AS fullret,
                 rev_c
          FROM orders o JOIN oagg ON o.o_orderkey = oagg.l_orderkey)
    SELECT yr,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(fullret) AS BIGINT) AS n_fully_returned,
           round(sum(fullret) / CAST(count(*) AS DOUBLE), 6) AS full_share,
           round(sum(CASE WHEN fullret = 1 THEN rev_c ELSE 0 END) / 100.0, 2)
             AS returned_revenue
    FROM j GROUP BY 1
    """,
)
def q316_fully_returned_orders(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Relational DIVISION per year: orders where EVERY lineitem came
    back ('R') — total write-off orders, their share, and the revenue
    they returned. The division is count(*) = count(returned) on ONE
    orderkey-keyed partial-agg pass (never a NOT EXISTS double
    anti-join); the year rollup joins the pre-aggregated frame — the
    fact table crosses the join at one row per order, not per line.
    Revenue in integer cents (exact associative sum)."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    lag = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum((F.col("l_returnflag") == "R").cast("long")).alias("n_ret"),
        F.sum(
            F.round(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
            ).cast("long")
        ).alias("rev_c"),
    )
    full = (F.col("n_lines") == F.col("n_ret")).cast("long")
    j = o.join(lag, F.col("o_orderkey") == F.col("l_orderkey")).select(
        F.year("o_orderdate").cast("int").alias("yr"),
        full.alias("full"),
        "rev_c",
    )
    return j.groupBy("yr").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("full").cast("long").alias("n_fully_returned"),
        F.round(
            F.sum("full") / F.count(F.lit(1)).cast("double"), 6
        ).alias("full_share"),
        F.round(
            F.sum(F.when(F.col("full") == 1, F.col("rev_c")).otherwise(0))
            / 100.0,
            2,
        ).alias("returned_revenue"),
    )


@query(
    "q317_price_percentile_bands",
    """
    SELECT o_orderpriority, CAST(year(o_orderdate) AS INT) AS yr,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
           round(quantile_cont(o_totalprice, 0.50), 4) AS p50,
           round(quantile_cont(o_totalprice, 0.75), 4) AS p75
    FROM orders GROUP BY 1, 2
    """,
)
def q317_price_percentile_bands(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Order-value QUARTILE bands per (priority, year) — the exact
    p25/p50/p75 heatmap behind pricing-drift review. Exercises the
    distributed rank frame with a COMPOSITE group key
    (operators/aggregate.exact_group_percentiles — range-partitioned
    parallel sort over (priority, year, price); no per-group multiset
    ever buffers in an executor): ~35 small groups at sf0.1, but the
    same plan holds when one (priority, year) cell is 100 TB."""
    from etl_jetro_spark.operators.aggregate import exact_group_percentiles

    o = load(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.year("o_orderdate").cast("int").alias("yr"),
        "o_totalprice",
    )
    pct = exact_group_percentiles(
        o,
        ["o_orderpriority", "yr"],
        "o_totalprice",
        {"p25": 0.25, "p50": 0.5, "p75": 0.75},
    )
    n = o.groupBy("o_orderpriority", "yr").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders")
    )
    return n.join(bcast_small(pct), ["o_orderpriority", "yr"]).select(
        "o_orderpriority",
        "yr",
        "n_orders",
        F.round("p25", 4).alias("p25"),
        F.round("p50", 4).alias("p50"),
        F.round("p75", 4).alias("p75"),
    )


@query(
    "q318_distinct_ngram_ratio",
    f"""
    WITH wrds AS (SELECT doc_id, {DK_WORDS} AS w FROM documents),
    s1 AS (SELECT array_to_string(w[i:i+0], ' ') AS sh
           FROM wrds, UNNEST(generate_series(1, greatest(len(w), 0))) AS t(i)),
    s2 AS (SELECT array_to_string(w[i:i+1], ' ') AS sh
           FROM wrds, UNNEST(generate_series(1, greatest(len(w) - 1, 0))) AS t(i)),
    s3 AS (SELECT array_to_string(w[i:i+2], ' ') AS sh
           FROM wrds, UNNEST(generate_series(1, greatest(len(w) - 2, 0))) AS t(i)),
    u AS (
      SELECT 1 AS n, CAST(count(*) AS BIGINT) AS total,
             CAST(count(DISTINCT sh) AS BIGINT) AS n_distinct
      FROM s1 WHERE sh <> ''
      UNION ALL
      SELECT 2, CAST(count(*) AS BIGINT), CAST(count(DISTINCT sh) AS BIGINT)
      FROM s2 WHERE sh <> ''
      UNION ALL
      SELECT 3, CAST(count(*) AS BIGINT), CAST(count(DISTINCT sh) AS BIGINT)
      FROM s3 WHERE sh <> '')
    SELECT n, total, n_distinct,
           round(n_distinct / CAST(total AS DOUBLE), 6) AS distinct_ratio
    FROM u
    """,
)
def q318_distinct_ngram_ratio(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Corpus DISTINCT-n-gram ratio curve for n ∈ {1,2,3} — the
    repetition-by-order signature (unigrams saturate fast; if trigrams
    do too the corpus is template-heavy and dedup will pay off) that
    complements q257's Heaps exponent. Each n rides the CODEGEN
    zero-shuffle shingle generator (dedup.shingle_rows — the round-6
    verdict's measured-10× lesson: never the per-element HOF) into ONE
    two-phase distinct-agg shuffle; the three 1-row results union."""
    from etl_jetro_spark.operators.dedup import shingle_rows

    d = load(spark, sf_dir, "documents")
    outs = []
    for n in (1, 2, 3):
        sh = shingle_rows(d, "doc_id", "text", n, distinct=False)
        outs.append(
            sh.agg(
                F.count(F.lit(1)).cast("long").alias("total"),
                F.countDistinct("_sh").cast("long").alias("n_distinct"),
            ).select(F.lit(n).alias("n"), "total", "n_distinct")
        )
    u = outs[0].unionByName(outs[1]).unionByName(outs[2])
    return u.select(
        "n",
        "total",
        "n_distinct",
        F.round(
            F.col("n_distinct") / F.col("total").cast("double"), 6
        ).alias("distinct_ratio"),
    )


@query(
    "q319_hash_bucket_uniformity",
    f"""
    WITH b AS (
      SELECT {_dk_hex8("md5(CAST(doc_id AS VARCHAR))")} % 64 AS bucket
      FROM documents),
    g AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs
          FROM b GROUP BY 1),
    t AS (SELECT sum(n_docs) AS tot FROM g)
    SELECT g.bucket, g.n_docs,
           round(t.tot / 64.0, 4) AS expected,
           round(g.n_docs / (t.tot / 64.0) - 1, 6) AS rel_dev
    FROM g CROSS JOIN t
    """,
)
def q319_hash_bucket_uniformity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """HASH-partition uniformity audit: md5-bucket counts over 64
    buckets with relative deviation from uniform — the pre-flight check
    before committing a key to bucketed storage or a consistent-hash
    shard map (q219); a hot bucket here is a hot task at 100 TB. The
    bucket is the shared md5 digit-walk (exact integer arithmetic both
    engines); one partial-agg shuffle to 64 rows, scalar total
    cross-joined back (bcast_small)."""
    d = load(spark, sf_dir, "documents")
    bucket = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
        ).cast("long")
        % 64
    )
    g = d.select(bucket.alias("bucket")).groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    t = g.agg(F.sum("n_docs").alias("tot"))
    return g.crossJoin(bcast_small(t)).select(
        "bucket",
        "n_docs",
        F.round(F.col("tot") / 64.0, 4).alias("expected"),
        F.round(
            F.col("n_docs") / (F.col("tot") / 64.0) - 1, 6
        ).alias("rel_dev"),
    )


@query(
    "q320_label_anova_f",
    """
    WITH e AS (
      SELECT label, generate_subscripts(embedding, 1) AS i,
             CAST(unnest(embedding) AS DOUBLE) AS x
      FROM embeddings),
    cell AS (SELECT label, i, count(*) AS n, sum(x) AS s, sum(x * x) AS ss
             FROM e GROUP BY 1, 2),
    dim AS (SELECT i, sum(n) AS nn, sum(s) AS gs, sum(ss) AS gss,
                   sum(s * s / n) AS sb
            FROM cell GROUP BY 1),
    tot AS (SELECT sum(sb - gs * gs / nn) AS ssb,
                   sum(gss - sb) AS ssw,
                   max(nn) AS n_vecs,
                   CAST(count(*) AS BIGINT) AS d
            FROM dim),
    k AS (SELECT CAST(count(DISTINCT label) AS BIGINT) AS k FROM e)
    SELECT round(tot.ssb, 4) AS ss_between,
           round(tot.ssw, 4) AS ss_within,
           (k.k - 1) * tot.d AS df_between,
           (CAST(tot.n_vecs AS BIGINT) - k.k) * tot.d AS df_within,
           round((tot.ssb / ((k.k - 1) * tot.d))
                 / (tot.ssw / ((CAST(tot.n_vecs AS BIGINT) - k.k) * tot.d)),
                 6) AS f_stat
    FROM tot CROSS JOIN k
    """,
)
def q320_label_anova_f(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F over embedding dimensions pooled: between-label
    vs within-label variance of the embedding coordinates — the
    do-labels-explain-the-geometry test behind q295's silhouette and
    q260's divergence, as a single classical statistic. Everything
    reduces to SUFFICIENT STATISTICS (n, Σx, Σx²) per (label, dim) in
    ONE corpus-scale partial-agg shuffle; the labels×dims frame
    (K·64 rows) re-reduces to per-dim and scalar frames — no second
    pass over the data, nothing broadcast but 1-row scalars."""
    emb = load(spark, sf_dir, "embeddings")
    e = emb.select(
        "label", F.posexplode(F.col("embedding")).alias("i", "xf")
    ).select("label", "i", F.col("xf").cast("double").alias("x"))
    cell = e.groupBy("label", "i").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("s"),
        F.sum(F.col("x") * F.col("x")).alias("ss"),
    )
    dim = cell.groupBy("i").agg(
        F.sum("n").alias("nn"),
        F.sum("s").alias("gs"),
        F.sum("ss").alias("gss"),
        F.sum(F.col("s") * F.col("s") / F.col("n")).alias("sb"),
    )
    tot = dim.agg(
        F.sum(
            F.col("sb") - F.col("gs") * F.col("gs") / F.col("nn")
        ).alias("ssb"),
        F.sum(F.col("gss") - F.col("sb")).alias("ssw"),
        F.max("nn").alias("n_vecs"),
        F.count(F.lit(1)).cast("long").alias("d"),
    )
    k = emb.agg(F.countDistinct("label").cast("long").alias("k"))
    dfb = (F.col("k") - 1) * F.col("d")
    dfw = (F.col("n_vecs").cast("long") - F.col("k")) * F.col("d")
    return tot.crossJoin(bcast_small(k)).select(
        F.round("ssb", 4).alias("ss_between"),
        F.round("ssw", 4).alias("ss_within"),
        dfb.alias("df_between"),
        dfw.alias("df_within"),
        F.round(
            (F.col("ssb") / dfb) / (F.col("ssw") / dfw), 6
        ).alias("f_stat"),
    )


@query(
    "q321_positional_token_entropy",
    f"""
    WITH wd AS (SELECT doc_id, {DK_WORDS} AS w FROM documents),
    pw AS (SELECT i AS pos, w[i] AS t
           FROM wd, UNNEST(generate_series(1, least(len(w), 10))) AS x(i)
           WHERE w[i] <> ''),
    c AS (SELECT pos, t, count(*) AS c FROM pw GROUP BY 1, 2),
    tt AS (SELECT pos, sum(c) AS tot, CAST(count(*) AS BIGINT) AS n_types
           FROM c GROUP BY 1)
    SELECT c.pos AS position,
           CAST(tt.tot AS BIGINT) AS n_docs_at_pos,
           tt.n_types,
           round(-sum((c.c / CAST(tt.tot AS DOUBLE))
                      * ln(c.c / CAST(tt.tot AS DOUBLE))), 6) AS entropy
    FROM c JOIN tt USING (pos)
    GROUP BY 1, 2, 3
    """,
)
def q321_positional_token_entropy(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """POSITIONAL token entropy: Shannon entropy (nats) of the token
    distribution at each of the first 10 word positions — near-zero
    entropy at position 1 screams templated ledes ("Subject:", "FROM
    the desk of"), the boilerplate signature that survives exact dedup
    but q302's prefix pass catches. The position slice happens AT THE
    SCAN (slice before explode — only 10 words per doc ever leave the
    projection); counts reduce through one (pos, token) partial-agg
    shuffle; per-position totals re-reduce from that frame and join
    back bcast_small (10 rows)."""
    from etl_jetro_spark.functions.hashing import norm_text

    d = load(spark, sf_dir, "documents")
    pw = (
        d.select(
            F.posexplode(
                F.slice(F.split(norm_text("text"), " "), 1, 10)
            ).alias("p0", "t")
        )
        .filter(F.col("t") != "")
        .select((F.col("p0") + 1).alias("pos"), "t")
    )
    c = pw.groupBy("pos", "t").agg(F.count(F.lit(1)).alias("c"))
    tt = c.groupBy("pos").agg(
        F.sum("c").alias("tot"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
    )
    p = F.col("c") / F.col("tot").cast("double")
    return (
        c.join(bcast_small(tt), "pos")
        .groupBy(
            F.col("pos").alias("position"),
            F.col("tot").cast("long").alias("n_docs_at_pos"),
            "n_types",
        )
        .agg(F.round(-F.sum(p * F.log(p)), 6).alias("entropy"))
    )


@query(
    "q322_text_embedding_norm_corr",
    """
    WITH norms AS (
      SELECT vec_id, sqrt(sum(CAST(v AS DOUBLE) * v)) AS nrm
      FROM (SELECT vec_id, unnest(embedding) AS v FROM embeddings)
      GROUP BY 1)
    SELECT CAST(count(*) AS BIGINT) AS n_vecs,
           round(avg(nrm), 6) AS avg_norm,
           round(corr(CAST(d.n_chars AS DOUBLE), nrm), 6)
             AS pearson_len_norm
    FROM norms JOIN documents d ON d.doc_id = norms.vec_id
    """,
)
def q322_text_embedding_norm_corr(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """CROSS-MODAL consistency audit: Pearson correlation between a
    document's character length and its embedding L2 norm (doc_id ↔
    vec_id are 1:1 in this corpus) — unnormalized encoders leak length
    into the norm, which silently turns "semantic" near-dup thresholds
    (q39/q146) into length filters; this one number is the check. The
    norm is expression-only (zip-free transform+aggregate fold, zero
    shuffle, whole-stage codegen); ONE key join and a scalar corr()."""
    from etl_jetro_spark.operators.similarity import norm as vnorm

    emb = load(spark, sf_dir, "embeddings")
    d = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    v = F.transform("embedding", lambda x: x.cast("double"))
    n = emb.select("vec_id", vnorm(v).alias("nrm"))
    return n.join(d, F.col("doc_id") == F.col("vec_id")).agg(
        F.count(F.lit(1)).cast("long").alias("n_vecs"),
        F.round(F.avg("nrm"), 6).alias("avg_norm"),
        F.round(
            F.corr(F.col("n_chars").cast("double"), F.col("nrm")), 6
        ).alias("pearson_len_norm"),
    )


@query(
    "q323_part_token_price_lift",
    """
    WITH t AS (SELECT unnest(string_split(p_name, ' ')) AS token,
                      p_retailprice
               FROM part),
    g AS (SELECT token, CAST(count(*) AS BIGINT) AS n_parts,
                 avg(p_retailprice) AS ap
          FROM t GROUP BY 1),
    ga AS (SELECT avg(p_retailprice) AS gavg FROM part)
    SELECT g.token, g.n_parts, round(g.ap, 4) AS avg_price,
           round(g.ap / ga.gavg, 6) AS price_lift
    FROM g CROSS JOIN ga
    """,
)
def q323_part_token_price_lift(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Part-name TOKEN price lift: average retail price per name token
    against the catalog average — which adjectives command a premium
    ('hot gear' vs 'small bolt'), the categorical-feature-vs-target
    screen a pricing model starts from. Token explode at the scan; one
    token-keyed partial-agg shuffle; the global average is a 1-row
    scalar aggregate cross-joined back (bcast_small) computed from the
    part scan directly — not from the token frame, where multi-token
    names would double-weight."""
    p = load(spark, sf_dir, "part")
    t = p.select(
        F.explode(F.split(F.col("p_name"), " ")).alias("token"),
        "p_retailprice",
    )
    g = t.groupBy("token").agg(
        F.count(F.lit(1)).cast("long").alias("n_parts"),
        F.avg("p_retailprice").alias("ap"),
    )
    ga = p.agg(F.avg("p_retailprice").alias("gavg"))
    return g.crossJoin(bcast_small(ga)).select(
        "token",
        "n_parts",
        F.round("ap", 4).alias("avg_price"),
        F.round(F.col("ap") / F.col("gavg"), 6).alias("price_lift"),
    )


@query(
    "q324_lang_trigram_signature",
    f"""
    WITH nt AS (SELECT lang, {DK_NORM_TEXT} AS s FROM documents),
    tri AS (SELECT lang, substr(s, i, 3) AS t
            FROM nt,
            UNNEST(generate_series(1, greatest(len(s) - 2, 0))) AS x(i)),
    c AS (SELECT lang, t, CAST(count(*) AS DOUBLE) AS c
          FROM tri GROUP BY 1, 2),
    nrm AS (SELECT lang, sqrt(sum(c * c)) AS nv FROM c GROUP BY 1),
    dt AS (SELECT a.lang AS lang_a, b.lang AS lang_b, sum(a.c * b.c) AS d
           FROM c a JOIN c b ON a.t = b.t AND a.lang < b.lang
           GROUP BY 1, 2)
    SELECT dt.lang_a, dt.lang_b,
           round(dt.d / (na.nv * nb.nv), 6) AS cosine_sim
    FROM dt
    JOIN nrm na ON na.lang = dt.lang_a
    JOIN nrm nb ON nb.lang = dt.lang_b
    """,
)
def q324_lang_trigram_signature(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cross-LANGUAGE character-trigram signature similarity: cosine
    between each language pair's corpus-level trigram count vectors —
    the confusability matrix that predicts exactly which language pairs
    q25's n-gram lang-id will blur (es/fr high, en/de lower), read
    BEFORE trusting per-language corpus stats. Normalized text is
    materialized behind a select boundary, then
    ``char_shingles_normed`` (the codegen-safe attribute form — NOT the
    re-normalizing per-element lambda the repo already measured at 38×)
    explodes at the scan; counts reduce through one (lang, trigram)
    shuffle; the pairwise dot is a trigram-KEYED self-join (fanout ≤
    langs² per trigram, never |vocab|²) and the norms are a langs-row
    bcast_small frame."""
    from etl_jetro_spark.functions.hashing import (
        char_shingles_normed,
        norm_text,
    )

    d = load(spark, sf_dir, "documents")
    tri = (
        d.select("lang", norm_text("text").alias("s"))
        .select("lang", F.explode(char_shingles_normed(F.col("s"), 3)).alias("t"))
    )
    c = tri.groupBy("lang", "t").agg(
        F.count(F.lit(1)).cast("double").alias("c")
    )
    nrm = c.groupBy("lang").agg(
        F.sqrt(F.sum(F.col("c") * F.col("c"))).alias("nv")
    )
    a = c.select(
        F.col("lang").alias("lang_a"), "t", F.col("c").alias("ca")
    )
    b = c.select(
        F.col("lang").alias("lang_b"), "t", F.col("c").alias("cb")
    )
    dt = (
        a.join(b, "t")
        .filter(F.col("lang_a") < F.col("lang_b"))
        .groupBy("lang_a", "lang_b")
        .agg(F.sum(F.col("ca") * F.col("cb")).alias("d"))
    )
    na = nrm.select(F.col("lang").alias("lang_a"), F.col("nv").alias("na"))
    nb = nrm.select(F.col("lang").alias("lang_b"), F.col("nv").alias("nb"))
    return (
        dt.join(bcast_small(na), "lang_a")
        .join(bcast_small(nb), "lang_b")
        .select(
            "lang_a",
            "lang_b",
            F.round(F.col("d") / (F.col("na") * F.col("nb")), 6).alias(
                "cosine_sim"
            ),
        )
    )


@query(
    "q325_term_burstiness",
    f"""
    WITH tok AS (
      SELECT doc_id, t FROM (
        SELECT doc_id, unnest(string_split({DK_NORM_TEXT}, ' ')) AS t
        FROM documents) WHERE t <> ''),
    g AS (SELECT t AS term, CAST(count(*) AS BIGINT) AS cf,
                 CAST(count(DISTINCT doc_id) AS BIGINT) AS df
          FROM tok GROUP BY 1)
    SELECT term, cf, df, round(cf / CAST(df AS DOUBLE), 6) AS burstiness
    FROM g ORDER BY cf DESC, term LIMIT 20
    """,
)
def q325_term_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term BURSTINESS (Church-Gale): collection frequency over document
    frequency for the 20 most frequent terms — bursty terms (cf ≫ df)
    repeat within the documents that contain them, which breaks the
    independence assumption behind q69's unigram LM and inflates q68's
    raw tf; stopwords sit near cf/df ≈ tokens-per-doc while topical
    terms spike. ONE (term) partial-agg shuffle with the two-phase
    distinct-agg rewrite for df; the global top-20 is TakeOrdered
    ((cf DESC, term) — deterministic at the cut), never a global
    window."""
    from etl_jetro_spark.functions.hashing import norm_text

    d = load(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(F.split(norm_text("text"), " ")).alias("t")
    ).filter(F.col("t") != "")
    g = tok.groupBy(F.col("t").alias("term")).agg(
        F.count(F.lit(1)).cast("long").alias("cf"),
        F.countDistinct("doc_id").cast("long").alias("df"),
    )
    return (
        g.orderBy(F.col("cf").desc(), F.col("term").asc())
        .limit(20)
        .select(
            "term",
            "cf",
            "df",
            F.round(F.col("cf") / F.col("df").cast("double"), 6).alias(
                "burstiness"
            ),
        )
    )


@query(
    "q326_robust_numeric_profile",
    """
    WITH v AS (
      SELECT 'l_quantity' AS col, CAST(l_quantity AS DOUBLE) AS v
      FROM lineitem
      UNION ALL
      SELECT 'l_extendedprice', CAST(l_extendedprice AS DOUBLE)
      FROM lineitem
      UNION ALL
      SELECT 'l_discount', CAST(l_discount AS DOUBLE) FROM lineitem
      UNION ALL
      SELECT 'l_tax', CAST(l_tax AS DOUBLE) FROM lineitem),
    cnt AS (SELECT col, v, CAST(count(*) AS DOUBLE) AS w
            FROM v GROUP BY 1, 2),
    c AS (SELECT col, v, w,
                 sum(w) OVER (PARTITION BY col ORDER BY v
                              ROWS UNBOUNDED PRECEDING) AS cw,
                 sum(w) OVER (PARTITION BY col) AS tw
          FROM cnt),
    med AS (SELECT col, min(v) FILTER (cw >= 0.5 * tw) AS med
            FROM c GROUP BY 1),
    da AS (SELECT cnt.col, abs(cnt.v - med.med) AS av, sum(cnt.w) AS w
           FROM cnt JOIN med USING (col) GROUP BY 1, 2),
    c2 AS (SELECT col, av, w,
                  sum(w) OVER (PARTITION BY col ORDER BY av
                               ROWS UNBOUNDED PRECEDING) AS cw,
                  sum(w) OVER (PARTITION BY col) AS tw
           FROM da),
    mad AS (SELECT col, min(av) FILTER (cw >= 0.5 * tw) AS mad
            FROM c2 GROUP BY 1)
    SELECT cnt.col,
           CAST(sum(cnt.w) AS BIGINT) AS n,
           round(med.med, 6) AS median,
           round(mad.mad, 6) AS mad,
           round(sum(CASE WHEN abs(cnt.v - med.med)
                               > 3.5 * 1.4826 * mad.mad
                          THEN cnt.w ELSE 0 END) / sum(cnt.w), 6)
             AS outlier_share
    FROM cnt JOIN med USING (col) JOIN mad USING (col)
    GROUP BY cnt.col, med.med, mad.mad
    """,
)
def q326_robust_numeric_profile(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Table-wide ROBUST numeric profile: exact (type-1 lower) median,
    MAD, and modified-z outlier share (|v − med| > 3.5·1.4826·MAD) for
    every numeric lineitem column — q84's profile with
    breakdown-resistant statistics. Columns stack into (col, v) by
    inline-array explode and immediately collapse to a VALUE HISTOGRAM
    ((col, v) → count), so the raw table is scanned ONCE and every
    later pass — both weighted-median rank frames
    (operators/aggregate.weighted_group_percentiles, q155's operator),
    the deviation re-histogram, and the outlier share — runs on
    NDV-bounded frames (a first cut with two raw-data rank-frame passes
    measured 10.9 s sf0.1 / 34.2 s sf1; this form re-measured at
    6.7 s / 7.4 s — near-FLAT at 10× the data, the NDV bound showing).
    Integer counts make the cumulative weights exact
    doubles, so the type-1 quantile pick is bit-deterministic
    cross-engine — no interpolation, no slack sensitivity."""
    from etl_jetro_spark.operators.aggregate import (
        weighted_group_percentiles,
    )

    COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    li = load(spark, sf_dir, "lineitem")
    v = li.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("col"),
                        F.col(c).cast("double").alias("v"),
                    )
                    for c in COLS
                ]
            )
        ).alias("s")
    ).select("s.col", "s.v")
    # The histogram feeds THREE consumers (the median pass, the
    # deviation re-histogram, the final outlier join) and the tiny
    # med/mad frames feed two more each; Catalyst does not share
    # common subtrees, so without barriers the scan+explode+groupBy
    # ran 4x and each wgp median up to 3x (r11 — measured in the plan:
    # four lineitem scans). Lazy localCheckpoints compute each once.
    cnt = v.groupBy("col", "v").agg(
        F.count(F.lit(1)).cast("double").alias("w")
    ).localCheckpoint(eager=False)
    med = weighted_group_percentiles(
        cnt, ["col"], "v", "w", {"med": 0.5}
    ).localCheckpoint(eager=False)
    da = (
        cnt.join(bcast_small(med), "col")
        .groupBy("col", F.abs(F.col("v") - F.col("med")).alias("av"))
        .agg(F.sum("w").alias("w"))
    )
    mad = weighted_group_percentiles(
        da, ["col"], "av", "w", {"mad": 0.5}
    ).localCheckpoint(eager=False)
    j = cnt.join(bcast_small(med), "col").join(bcast_small(mad), "col")
    out = (
        F.abs(F.col("v") - F.col("med")) > 3.5 * 1.4826 * F.col("mad")
    )
    return (
        j.groupBy("col", "med", "mad")
        .agg(
            F.sum("w").cast("long").alias("n"),
            F.round(
                F.sum(F.when(out, F.col("w")).otherwise(0.0))
                / F.sum("w"),
                6,
            ).alias("outlier_share"),
        )
        .select(
            "col",
            "n",
            F.round("med", 6).alias("median"),
            F.round("mad", 6).alias("mad"),
            "outlier_share",
        )
    )


@query(
    "q327_splurge_orders",
    f"""
    WITH ca AS (SELECT o_custkey,
                       CAST({sql_sum_micro('o_totalprice')} AS DOUBLE)
                         / 1000000 / count(*) AS av,
                       count(*) AS n
                FROM orders GROUP BY 1),
    j AS (SELECT c.c_mktsegment AS seg, o.o_totalprice,
                 CASE WHEN o.o_totalprice > 1.5 * ca.av
                      THEN 1 ELSE 0 END AS splurge
          FROM orders o
          JOIN ca ON o.o_custkey = ca.o_custkey
          JOIN customer c ON c.c_custkey = o.o_custkey
          WHERE ca.n >= 2)
    SELECT seg,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(splurge) AS BIGINT) AS n_splurge,
           round(sum(splurge) / CAST(count(*) AS DOUBLE), 6)
             AS splurge_share,
           round(CAST(CAST(sum(CASE WHEN splurge = 1
                              THEN {sql_micro_units('o_totalprice')}
                              ELSE 0 END) AS HUGEINT) AS DOUBLE)
                 / 1000000, 4) AS splurge_revenue
    FROM j GROUP BY 1
    """,
)
def q327_splurge_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-subquery DECORRELATION shape: orders that exceed 1.5×
    THEIR OWN customer's average order value (customers with ≥2 orders),
    rolled up by segment — the "orders above own baseline" pattern every
    anomaly review starts from, written as the decorrelated plan
    Catalyst would produce: the per-customer average is ONE custkey
    partial-agg, and the orders→average join lands on the SAME custkey
    the aggregate just shuffled on, so AQE plans it with no extra
    exchange on the aggregated side. The segment dim joins after;
    conditional aggs finish in the rollup pass."""
    o = load(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    # the baseline average is derived from the EXACT micro-dollar sum
    # so a knife-edge order can't flip its splurge flag between engines
    ca = o.groupBy(F.col("o_custkey").alias("k")).agg(
        (
            M.sum_micro("o_totalprice").cast("double")
            / M.MICRO
            / F.count(F.lit(1))
        ).alias("av"),
        F.count(F.lit(1)).alias("n"),
    )
    splurge = (F.col("o_totalprice") > 1.5 * F.col("av")).cast("long")
    j = (
        o.join(ca, F.col("o_custkey") == F.col("k"))
        .filter(F.col("n") >= 2)
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .select(
            F.col("c_mktsegment").alias("seg"),
            "o_totalprice",
            splurge.alias("splurge"),
        )
    )
    return j.groupBy("seg").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("splurge").cast("long").alias("n_splurge"),
        F.round(
            F.sum("splurge") / F.count(F.lit(1)).cast("double"), 6
        ).alias("splurge_share"),
        F.round(
            F.sum(
                F.when(
                    F.col("splurge") == 1, M.micro_units("o_totalprice")
                ).otherwise(F.lit(0).cast("decimal(20,0)"))
            ).cast("double")
            / M.MICRO,
            4,
        ).alias("splurge_revenue"),
    )


@query(
    "q328_theil_sen_trend",
    """
    WITH m AS (
      SELECT l_suppkey,
             CAST(year(l_shipdate) * 12 + month(l_shipdate) AS BIGINT)
               AS mi,
             CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                           AS BIGINT)) AS DOUBLE) AS rev_c
      FROM lineitem GROUP BY 1, 2),
    pr AS (SELECT a.l_suppkey,
                  (b.rev_c - a.rev_c) / (b.mi - a.mi) AS slope
           FROM m a JOIN m b
             ON a.l_suppkey = b.l_suppkey AND a.mi < b.mi),
    ts AS (SELECT l_suppkey,
                  quantile_cont(slope, 0.5) AS ts_slope,
                  CAST(count(*) AS BIGINT) AS n_pairs
           FROM pr GROUP BY 1),
    nm AS (SELECT l_suppkey, CAST(count(*) AS BIGINT) AS n_months
           FROM m GROUP BY 1)
    SELECT ts.l_suppkey, nm.n_months, ts.n_pairs,
           round(ts.ts_slope / 100.0, 4) AS ts_slope
    FROM ts JOIN nm USING (l_suppkey)
    ORDER BY ts.ts_slope DESC, ts.l_suppkey LIMIT 10
    """,
)
def q328_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THEIL-SEN robust trend: median of all pairwise month-over-month
    revenue slopes per supplier, top-10 climbers — the
    breakdown-resistant alternative to q286's OLS slope (one crazy
    month drags a least-squares fit; it barely moves the median slope).
    Monthly revenue reduces in INTEGER CENTS, and every pair slope is
    cents/month-index — exact-double arithmetic, bit-identical
    cross-engine, so the median and the top-10 cut are deterministic.
    The pairwise self-join is bounded by CALENDAR² per supplier (≤84
    months → ≤3.5k pairs each), linear in suppliers — never data²; and
    BECAUSE each group is calendar²-bounded (not data-bounded), the
    per-supplier median legitimately uses Spark's buffered
    ``percentile`` aggregate — the per-group multiset it holds is ≤3.5k
    doubles by construction, the one regime where the distributed rank
    frame's two range-sorts are pure overhead (measured: rank frame
    8.7 s sf0.1 / 21.5 s sf1 → this form 5.9 s / 8.9 s). Top-10 is
    TakeOrdered."""
    li = load(spark, sf_dir, "lineitem")
    m = (
        li.select(
            "l_suppkey",
            (
                F.year("l_shipdate") * 12 + F.month("l_shipdate")
            ).cast("long").alias("mi"),
            F.round(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
            ).cast("long").alias("cents"),
        )
        .groupBy("l_suppkey", "mi")
        .agg(F.sum("cents").cast("double").alias("rev_c"))
        # m feeds three consumers (both pair-join sides and the month
        # count); without a barrier the lineitem scan+agg runs 3x (r11)
        .localCheckpoint(eager=False)
    )
    a = m.select("l_suppkey", F.col("mi").alias("mi_a"), F.col("rev_c").alias("ra"))
    b = m.select("l_suppkey", F.col("mi").alias("mi_b"), F.col("rev_c").alias("rb"))
    pr = (
        a.join(b, "l_suppkey")
        .filter(F.col("mi_a") < F.col("mi_b"))
        .select(
            "l_suppkey",
            (
                (F.col("rb") - F.col("ra")) / (F.col("mi_b") - F.col("mi_a"))
            ).alias("slope"),
        )
    )
    ts = pr.groupBy("l_suppkey").agg(
        F.expr("percentile(slope, 0.5)").alias("ts"),
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
    )
    nm = m.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_months")
    )
    return (
        ts.join(nm, "l_suppkey")
        .orderBy(F.col("ts").desc(), F.col("l_suppkey").asc())
        .limit(10)
        .select(
            "l_suppkey",
            "n_months",
            "n_pairs",
            F.round(F.col("ts") / 100.0, 4).alias("ts_slope"),
        )
    )


# --------------------------------------------------------------------------
# Round-9 additions: multimodal patch/frame featurization, rank statistics,
# privacy audit, mixture budget planning, batch-packing economics,
# Matryoshka embedding ablation, top-k churn.
# --------------------------------------------------------------------------

@query(
    "q329_image_patch_stats",
    """
    WITH dims AS (
      SELECT doc_id, 4 + doc_id % 13 AS w, 3 + doc_id % 11 AS h,
             (doc_id * 31) % 256 AS a
      FROM documents
    ),
    cells AS (
      SELECT doc_id,
             CAST((((g // w) * 2) // h) * 2 + (((g % w) * 2) // w) AS INT)
               AS patch_id,
             (a + g) % 256 AS v
      FROM dims, unnest(generate_series(0, w * h - 1)) AS t(g)
    )
    SELECT doc_id AS media_id, patch_id,
           CAST(count(*) AS BIGINT) AS px_count,
           CAST(sum(v) AS BIGINT)   AS px_sum,
           CAST(min(v) AS INT)      AS px_min,
           CAST(max(v) AS INT)      AS px_max
    FROM cells GROUP BY 1, 2
    """,
)
def q329_image_patch_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ViT-style 2x2 patch featurization over REAL decoded PNGs: the
    fixture encodes one grayscale PNG per document (raster a pure
    function of doc_id), operators/multimodal.image_patch_stats decodes
    the actual bytes and emits one row per patch with exact integer
    stats; the oracle recomputes every patch analytically — a wrong
    byte anywhere in decode/tiling breaks the hash. Scale: grid-bounded
    fan-out inside a streaming Arrow batch iterator (reference parity:
    this is the image-side analogue of the reference's per-file feature
    pass, sheet_bot-era tools have no multimodal path)."""
    from etl_jetro_spark.operators.multimodal import image_patch_stats
    from etl_jetro_spark.operators.util import spread
    from etl_jetro_spark.plans.fixtures import media_png_frame

    docs = spread(load(spark, sf_dir, "documents").select("doc_id"))
    return image_patch_stats(media_png_frame(docs))


@query(
    "q330_wav_energy_windows",
    """
    WITH dims AS (
      SELECT doc_id AS media_id, 50 + doc_id % 100 AS n, doc_id * 7919 AS c
      FROM documents
    ),
    ex AS (
      SELECT media_id, CAST(g // 80 AS INT) AS window_id,
             ((c + g * 104729) % 65536) - 32768 AS s
      FROM dims, unnest(generate_series(0, n - 1)) AS t(g)
    )
    SELECT media_id, window_id,
           CAST(count(*) AS BIGINT) AS n_samples,
           round(sqrt(CAST(sum(s * s) AS BIGINT) / count(*)), 4) AS rms
    FROM ex GROUP BY 1, 2
    """,
)
def q330_wav_energy_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-level audio energy (the decode half of a VAD/silence-trim
    stage): one real 8 kHz PCM WAV per document, decoded by
    operators/multimodal.wav_energy_windows into 10 ms windows — one row
    per (media, window) with an exact integer sum of squares; RMS is the
    single float op sqrt(sumsq/n), reproduced bit-for-bit by the oracle
    from the same deterministic samples."""
    from etl_jetro_spark.operators.multimodal import wav_energy_windows
    from etl_jetro_spark.operators.util import spread
    from etl_jetro_spark.plans.fixtures import media_wav_frame

    docs = spread(load(spark, sf_dir, "documents").select("doc_id"))
    win = wav_energy_windows(media_wav_frame(docs), window_ms=10)
    return win.select(
        "media_id",
        "window_id",
        "n_samples",
        F.round(F.sqrt(F.col("sumsq") / F.col("n_samples")), 4).alias("rms"),
    )


@query(
    "q331_mann_whitney_u",
    """
    WITH pv AS (
      SELECT l_quantity AS v,
             CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n1v,
             CAST(count(*) AS BIGINT) AS nv
      FROM lineitem WHERE l_returnflag IN ('R', 'N') GROUP BY 1
    ),
    ranked AS (
      SELECT n1v, nv,
             CAST(coalesce(sum(nv) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS cum
      FROM pv
    ),
    s AS (
      SELECT CAST(sum(n1v) AS BIGINT) AS n1,
             CAST(sum(nv - n1v) AS BIGINT) AS n2,
             CAST(sum(n1v * (2 * cum + nv + 1)) AS BIGINT) AS twor1,
             CAST(sum(nv * nv * nv - nv) AS BIGINT) AS tie
      FROM ranked
    )
    SELECT n1, n2,
           round((twor1 - n1 * (n1 + 1)) / 2.0, 1) AS u1,
           round((twor1 - n1 * (n1 + 1) - n1 * n2)
                 / (2.0 * sqrt(n1 * n2 * ((n1 + n2 + 1)
                     - tie / ((n1 + n2) * (n1 + n2 - 1.0))) / 12.0)),
                 4) AS z,
           round(((twor1 - n1 * (n1 + 1) - n1 * n2)
                 / (2.0 * sqrt(n1 * n2 * ((n1 + n2 + 1)
                     - tie / ((n1 + n2) * (n1 + n2 - 1.0))) / 12.0)))
                 / sqrt(n1 + n2), 6) AS effect_r
    FROM s
    """,
)
def q331_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) with tie correction: do
    returned lineitems ('R') ship in different quantities than kept ones
    ('N')? Quantity has a bounded domain (1..50) and massive ties, so
    this exercises the tie-corrected variance for real. Rank statistics
    WITHOUT a global sort or empty-partition-spec window: quantities
    reduce to one row per distinct value (domain-bounded, constant
    across SFs), cumulative counts come from a broadcast non-equi
    self-join on that 50-row frame, and everything above is a global
    one-row aggregate. 2*R1 and the tie term stay exact BIGINTs; z is
    assembled from them with the identical float expression on both
    engines."""
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag").isin("R", "N")
    )
    pv = li.groupBy(F.col("l_quantity").alias("v")).agg(
        F.sum(
            F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
        ).cast("long").alias("n1v"),
        F.count(F.lit(1)).cast("long").alias("nv"),
    )
    b = pv.select(
        F.col("v").alias("bv"), F.col("nv").alias("bnv")
    )
    ranked = (
        pv.join(bcast_small(b), F.col("bv") < F.col("v"), "left")
        .groupBy("v", "n1v", "nv")
        .agg(F.coalesce(F.sum("bnv"), F.lit(0)).alias("cum"))
    )
    s = ranked.agg(
        F.sum("n1v").cast("long").alias("n1"),
        F.sum(F.col("nv") - F.col("n1v")).cast("long").alias("n2"),
        F.sum(
            F.col("n1v") * (2 * F.col("cum") + F.col("nv") + 1)
        ).cast("long").alias("twor1"),
        F.sum(
            F.col("nv") * F.col("nv") * F.col("nv") - F.col("nv")
        ).cast("long").alias("tie"),
    )
    n1, n2 = F.col("n1"), F.col("n2")
    twou1 = F.col("twor1") - n1 * (n1 + 1)
    sig = F.sqrt(
        n1 * n2 * (
            (n1 + n2 + 1)
            - F.col("tie") / ((n1 + n2) * (n1 + n2 - F.lit(1.0)))
        ) / F.lit(12.0)
    )
    z = (twou1 - n1 * n2) / (F.lit(2.0) * sig)
    return s.select(
        "n1",
        "n2",
        F.round(twou1 / F.lit(2.0), 1).alias("u1"),
        F.round(z, 4).alias("z"),
        F.round(z / F.sqrt(n1 + n2), 6).alias("effect_r"),
    )


@query(
    "q332_k_anonymity_audit",
    """
    WITH g AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(floor(c_acctbal / 2000) AS BIGINT) AS bal_band,
             CAST(count(*) AS BIGINT) AS gsz
      FROM customer GROUP BY 1, 2, 3
    ),
    cls AS (
      SELECT CASE WHEN gsz = 1 THEN 'unique'
                  WHEN gsz <= 4 THEN '2-4'
                  WHEN gsz <= 9 THEN '5-9'
                  ELSE '10+' END AS risk_class,
             gsz
      FROM g
    )
    SELECT risk_class,
           CAST(count(*) AS BIGINT)  AS n_groups,
           CAST(sum(gsz) AS BIGINT)  AS n_customers,
           round(100.0 * sum(gsz) / sum(sum(gsz)) OVER (), 4)
             AS pct_customers
    FROM cls GROUP BY 1
    """,
)
def q332_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over quasi-identifiers (nation, market segment,
    account-balance band): how many customers sit in equivalence classes
    small enough to re-identify (k < 5)? The privacy-governance pass a
    training-data pipeline runs before release. Two-level aggregation —
    QI-group sizes, then a 4-class histogram; the global denominator is
    a one-row re-aggregate joined back broadcast (no empty-partition
    window). The class split (1 / 2-4 / 5-9 / 10+) is the standard
    k-threshold ladder."""
    c = load(spark, sf_dir, "customer")
    g = c.groupBy(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 2000).cast("long").alias("bal_band"),
    ).agg(F.count(F.lit(1)).cast("long").alias("gsz"))
    cls = g.select(
        F.when(F.col("gsz") == 1, "unique")
        .when(F.col("gsz") <= 4, "2-4")
        .when(F.col("gsz") <= 9, "5-9")
        .otherwise("10+")
        .alias("risk_class"),
        "gsz",
    )
    agg = cls.groupBy("risk_class").agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum("gsz").cast("long").alias("n_customers"),
    )
    tot = agg.agg(F.sum("n_customers").alias("_tot"))
    return agg.crossJoin(bcast_small(tot)).select(
        "risk_class",
        "n_groups",
        "n_customers",
        F.round(100.0 * F.col("n_customers") / F.col("_tot"), 4).alias(
            "pct_customers"
        ),
    )


@query(
    "q333_waterfill_token_budget",
    """
    WITH caps AS (
      SELECT source,
             CAST(sum(CASE WHEN trim(text) = '' THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\\s+'))
                  END) AS BIGINT) AS cap
      FROM documents GROUP BY 1
    ),
    p AS (
      SELECT source, cap,
             CAST(row_number() OVER (ORDER BY cap, source) AS BIGINT) AS rn,
             CAST(coalesce(sum(cap) OVER (ORDER BY cap, source
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS prefix
      FROM caps
    ),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS s,
             CAST(sum(cap) AS BIGINT) AS total,
             CAST(sum(cap) * 3 // 5 AS BIGINT) AS b
      FROM caps
    ),
    lam AS (
      SELECT (b - prefix) / (s - rn + 1.0) AS lam
      FROM p, tot
      WHERE prefix + cap * (s - rn + 1) >= b
      ORDER BY rn LIMIT 1
    )
    SELECT source, cap AS cap_tokens,
           round(least(CAST(cap AS DOUBLE), lam), 2) AS alloc_tokens,
           CAST(CASE WHEN CAST(cap AS DOUBLE) > lam THEN 1 ELSE 0 END
                AS INT) AS rationed
    FROM caps, lam
    """,
)
def q333_waterfill_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Water-filling token-budget allocation across sources: given a
    budget of 60% of the corpus, allocate each source min(cap, lambda)
    where the water level lambda solves sum(min(cap_s, lambda)) = B —
    the max-min-fair mixture allocator (the closed-form core of
    DoReMi-style mixture planning; complements q268's epoch plan, which
    takes weights as given). No sort, no global window: the per-source
    cap frame is enum-bounded (20 sources at every SF — the bcast_small
    growth lint verifies that), rank and prefix sums come from a
    broadcast self-join on it, the budget from a one-row re-aggregate,
    and lambda is the min_by over the first segment whose full-level
    total reaches B. Integer prefix sums; lambda is the only division,
    computed identically on both engines (budget = total*3//5 kept
    integer-exact)."""
    d = load(spark, sf_dir, "documents")
    caps = d.groupBy("source").agg(
        F.sum(O.token_count("text")).cast("long").alias("cap")
    )
    b2 = caps.select(
        F.col("source").alias("bs"), F.col("cap").alias("bcap")
    )
    before = (F.col("bcap") < F.col("cap")) | (
        (F.col("bcap") == F.col("cap")) & (F.col("bs") < F.col("source"))
    )
    p = (
        caps.join(bcast_small(b2), before, "left")
        .groupBy("source", "cap")
        .agg(
            (F.count("bs") + 1).cast("long").alias("rn"),
            F.coalesce(F.sum("bcap"), F.lit(0)).cast("long").alias("prefix"),
        )
    )
    tot = caps.agg(
        F.count(F.lit(1)).cast("long").alias("s"),
        F.sum("cap").cast("long").alias("total"),
        ((F.sum("cap") * 3) / 5).cast("long").alias("b"),
    )
    lam = (
        p.crossJoin(bcast_small(tot))
        .filter(
            F.col("prefix") + F.col("cap") * (F.col("s") - F.col("rn") + 1)
            >= F.col("b")
        )
        .agg(
            F.expr(
                "min_by((b - prefix) / (s - rn + 1.0), rn)"
            ).alias("lam")
        )
    )
    return caps.crossJoin(bcast_small(lam)).select(
        "source",
        F.col("cap").alias("cap_tokens"),
        F.round(
            F.least(F.col("cap").cast("double"), F.col("lam")), 2
        ).alias("alloc_tokens"),
        (F.col("cap").cast("double") > F.col("lam"))
        .cast("int")
        .alias("rationed"),
    )


@query(
    "q334_padding_waste",
    """
    WITH t AS (
      SELECT doc_id,
             CAST(CASE WHEN trim(text) = '' THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\\s+'))
                  END AS BIGINT) AS tok
      FROM documents
    ),
    nb AS (SELECT CAST(ceil(count(*) / 32.0) AS BIGINT) AS nb FROM t),
    ha AS (
      SELECT doc_id, tok,
             md5('pack:' || CAST(doc_id AS VARCHAR)) AS hx
      FROM t
    ),
    a AS (
      SELECT tok,
             ((strpos('0123456789abcdef', substr(hx, 1, 1)) - 1) * 268435456
            + (strpos('0123456789abcdef', substr(hx, 2, 1)) - 1) * 16777216
            + (strpos('0123456789abcdef', substr(hx, 3, 1)) - 1) * 1048576
            + (strpos('0123456789abcdef', substr(hx, 4, 1)) - 1) * 65536
            + (strpos('0123456789abcdef', substr(hx, 5, 1)) - 1) * 4096
            + (strpos('0123456789abcdef', substr(hx, 6, 1)) - 1) * 256
            + (strpos('0123456789abcdef', substr(hx, 7, 1)) - 1) * 16
            + (strpos('0123456789abcdef', substr(hx, 8, 1)) - 1)) % nb
               AS batch
      FROM ha, nb
    ),
    ab AS (SELECT batch, max(tok) AS mx, count(*) AS c, sum(tok) AS s
           FROM a GROUP BY 1),
    arow AS (
      SELECT 'hash' AS strategy, CAST(sum(c) AS BIGINT) AS n_docs,
             CAST(count(*) AS BIGINT) AS n_batches,
             CAST(sum(s) AS BIGINT) AS token_sum,
             CAST(sum(mx * c) AS BIGINT) AS padded_sum
      FROM ab
    ),
    srt AS (
      SELECT tok, row_number() OVER (ORDER BY tok, doc_id) AS rn FROM t
    ),
    bb AS (SELECT (rn - 1) // 32 AS batch, max(tok) AS mx, count(*) AS c,
                  sum(tok) AS s
           FROM srt GROUP BY 1),
    brow AS (
      SELECT 'sorted' AS strategy, CAST(sum(c) AS BIGINT) AS n_docs,
             CAST(count(*) AS BIGINT) AS n_batches,
             CAST(sum(s) AS BIGINT) AS token_sum,
             CAST(sum(mx * c) AS BIGINT) AS padded_sum
      FROM bb
    )
    SELECT strategy, n_docs, n_batches, token_sum, padded_sum,
           round(100.0 * (padded_sum - token_sum) / padded_sum, 4)
             AS waste_pct
    FROM (SELECT * FROM arow UNION ALL SELECT * FROM brow)
    """,
)
def q334_padding_waste(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-packing economics: how many pad tokens does fixed-capacity
    batching (32 docs/batch) burn under (a) hash-assigned batches — the
    shuffle-free assignment a distributed loader actually uses — vs
    (b) length-sorted batches (the bucketing optimization)? Waste per
    batch = max_len * batch_size - sum_len. Strategy (a) derives the
    batch from an md5 hash-mod (no ordering anywhere); strategy (b)
    needs a true global length rank and gets it from the
    range-partitioned rank frame (operators/aggregate.group_ranked) —
    NOT an empty-partition-spec window, so the sort scales out. The
    measured gap (sorted batching typically cuts padding several-fold)
    is the number that justifies a length-bucketing stage in a training
    loader."""
    d = load(spark, sf_dir, "documents")
    t = d.select(
        "doc_id", O.token_count("text").cast("long").alias("tok")
    )
    nb = t.agg(
        F.ceil(F.count(F.lit(1)) / 32.0).cast("long").alias("nb")
    )
    a = (
        t.crossJoin(bcast_small(nb))
        .select(
            "tok",
            (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.lit("pack:"),
                                F.col("doc_id").cast("string"),
                            )
                        ),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("long")
                % F.col("nb")
            ).alias("batch"),
        )
    )
    from etl_jetro_spark.operators.aggregate import group_ranked

    srt = group_ranked(t, keys=[], value="tok", tiebreak=["doc_id"])
    b = srt.select(
        F.col("_v").alias("tok"),
        ((F.col("_rn") - 1) / 32).cast("long").alias("batch"),
    )

    def summarize(frame: DataFrame, label: str) -> DataFrame:
        per = frame.groupBy("batch").agg(
            F.max("tok").alias("mx"),
            F.count(F.lit(1)).alias("c"),
            F.sum("tok").alias("s"),
        )
        return per.agg(
            F.sum("c").cast("long").alias("n_docs"),
            F.count(F.lit(1)).cast("long").alias("n_batches"),
            F.sum("s").cast("long").alias("token_sum"),
            F.sum(F.col("mx") * F.col("c")).cast("long").alias("padded_sum"),
        ).select(F.lit(label).alias("strategy"), "*")

    u = summarize(a, "hash").unionAll(summarize(b, "sorted"))
    return u.select(
        "strategy",
        "n_docs",
        "n_batches",
        "token_sum",
        "padded_sum",
        F.round(
            100.0
            * (F.col("padded_sum") - F.col("token_sum"))
            / F.col("padded_sum"),
            4,
        ).alias("waste_pct"),
    )


@query(
    "q335_matryoshka_agreement",
    """
    WITH q AS (
      SELECT vec_id AS qid, embedding FROM embeddings WHERE vec_id % 20 = 0
    ),
    qe AS (
      SELECT qid, generate_subscripts(embedding, 1) AS i,
             CAST(unnest(embedding) AS DOUBLE) AS v
      FROM q
    ),
    ce AS (
      SELECT vec_id, generate_subscripts(embedding, 1) AS i,
             CAST(unnest(embedding) AS DOUBLE) AS v
      FROM embeddings
    ),
    s AS (
      SELECT qe.qid, ce.vec_id,
             round(sum(ce.v * qe.v)
                   / (sqrt(sum(ce.v * ce.v)) * sqrt(sum(qe.v * qe.v))), 12)
               AS cfull,
             round(sum(CASE WHEN ce.i <= 16 THEN ce.v * qe.v ELSE 0 END)
               / (sqrt(sum(CASE WHEN ce.i <= 16 THEN ce.v * ce.v ELSE 0 END))
                * sqrt(sum(CASE WHEN qe.i <= 16 THEN qe.v * qe.v ELSE 0 END))),
               12) AS cpref
      FROM ce JOIN qe USING (i)
      WHERE ce.vec_id <> qe.qid
      GROUP BY 1, 2
    ),
    rf AS (
      SELECT qid, vec_id, cfull,
             row_number() OVER (PARTITION BY qid
                                ORDER BY cfull DESC, vec_id) AS rn
      FROM s
    ),
    rp AS (
      SELECT qid, vec_id, cfull,
             row_number() OVER (PARTITION BY qid
                                ORDER BY cpref DESC, vec_id) AS rn
      FROM s
    )
    SELECT rf.qid,
           rf.vec_id AS top1_full,
           rp.vec_id AS top1_prefix,
           CAST(CASE WHEN rf.vec_id = rp.vec_id THEN 1 ELSE 0 END AS INT)
             AS agree,
           round(rf.cfull, 4) AS full_score,
           round(rp.cfull, 4) AS prefix_pick_full_score
    FROM rf JOIN rp USING (qid)
    WHERE rf.rn = 1 AND rp.rn = 1
    """,
)
def q335_matryoshka_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-style dimension-truncation ablation: for every 20th
    vector as a probe, does the top-1 cosine neighbor chosen with only
    the FIRST 16 of 64 dimensions agree with the full-dimension choice,
    and how much full-dim score does the truncated pick give up? The
    measurement that decides whether an ANN index can run on prefix
    dims (memory/4) with re-ranking. Both top-1 searches run through
    the Arrow matmul panel path (an expression-fold pair pass measured
    55 s at sf1 — 20M interpreted HOF dots — vs ~4 s this way); the
    prefix-pick's FULL cosine is then recomputed only for the |probes|
    chosen pairs (k-bounded joins), giving the regret column. The probe
    panel is the bounded evaluation sample this ablation assumes
    (max_panel raises loudly past it)."""
    from etl_jetro_spark.operators.similarity import (
        _vec,
        cosine,
        knn_join_panel,
    )

    emb = load(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") % 20 == 0)
    full_nn = knn_join_panel(probes, emb, "vec_id", "embedding", k=1)
    sl = F.slice("embedding", 1, 16).alias("embedding")
    pref_nn = knn_join_panel(
        probes.select("vec_id", sl), emb.select("vec_id", sl),
        "vec_id", "embedding", k=1,
    )
    pv = emb.select(
        F.col("vec_id").alias("qid"), _vec("embedding").alias("_qv")
    )
    cv = emb.select(
        F.col("vec_id").alias("pickid"), _vec("embedding").alias("_cv")
    )
    pp = (
        pref_nn.select(
            F.col("probe_id").alias("qid"),
            F.col("neighbor_id").alias("top1_prefix"),
        )
        .join(pv, "qid")
        .join(cv, F.col("top1_prefix") == F.col("pickid"))
        .select(
            "qid",
            "top1_prefix",
            # 12 dp to match the oracle's round(cfull, 12): both engines
            # then double-round identically into the 4 dp output
            F.round(cosine(F.col("_qv"), F.col("_cv")), 12).alias("cf"),
        )
    )
    ff = full_nn.select(
        F.col("probe_id").alias("qid"),
        F.col("neighbor_id").alias("top1_full"),
        F.col("score").alias("full_score"),
    )
    return ff.join(pp, "qid").select(
        "qid",
        "top1_full",
        "top1_prefix",
        (F.col("top1_full") == F.col("top1_prefix")).cast("int").alias(
            "agree"
        ),
        F.round(F.col("full_score"), 4).alias("full_score"),
        F.round(F.col("cf"), 4).alias("prefix_pick_full_score"),
    )


@query(
    "q336_topk_revenue_churn",
    """
    WITH rev AS (
      SELECT CAST(year(l_shipdate) AS INT) AS yr, l_partkey,
             CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                           AS BIGINT)) AS BIGINT) AS rev_c
      FROM lineitem
      WHERE year(l_shipdate) IN (1995, 1996)
      GROUP BY 1, 2
    ),
    rk AS (
      SELECT yr, l_partkey,
             CAST(row_number() OVER (PARTITION BY yr
                  ORDER BY rev_c DESC, l_partkey) AS BIGINT) AS rnk
      FROM rev
    ),
    t95 AS (SELECT l_partkey, rnk FROM rk WHERE yr = 1995 AND rnk <= 20),
    t96 AS (SELECT l_partkey, rnk FROM rk WHERE yr = 1996 AND rnk <= 20)
    SELECT coalesce(t95.l_partkey, t96.l_partkey) AS l_partkey,
           t95.rnk AS rank_1995,
           t96.rnk AS rank_1996,
           CASE WHEN t95.l_partkey IS NULL THEN 'entered'
                WHEN t96.l_partkey IS NULL THEN 'exited'
                ELSE 'stayed' END AS status,
           t95.rnk - t96.rnk AS rank_delta
    FROM t95 FULL JOIN t96 ON t95.l_partkey = t96.l_partkey
    """,
)
def q336_topk_revenue_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter churn: which parts entered / exited / moved inside
    the revenue top-20 between 1995 and 1996? Rank deltas on integer
    cents (exact, tie-broken by partkey). Per-year top-20 comes from the
    range-partitioned rank frame (group_ranked keyed by year) — a
    2-partition window sort would funnel each year through one task;
    the rank frame spreads each year's sort across the cluster and the
    k<=20 cut keeps the join k-bounded."""
    from etl_jetro_spark.operators.aggregate import group_ranked

    li = load(spark, sf_dir, "lineitem").filter(
        F.year("l_shipdate").isin(1995, 1996)
    )
    rev = (
        li.select(
            F.year("l_shipdate").cast("int").alias("yr"),
            "l_partkey",
            F.round(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
            ).cast("long").alias("cents"),
        )
        .groupBy("yr", "l_partkey")
        .agg(F.sum("cents").alias("rev_c"))
    )
    rk = group_ranked(
        rev.select("yr", "l_partkey", (-F.col("rev_c")).alias("neg")),
        keys=["yr"],
        value="neg",
        tiebreak=["l_partkey"],
    ).select("yr", "l_partkey", F.col("_rn").alias("rnk"))
    t95 = rk.filter((F.col("yr") == 1995) & (F.col("rnk") <= 20)).select(
        F.col("l_partkey").alias("p95"), F.col("rnk").alias("rank_1995")
    )
    t96 = rk.filter((F.col("yr") == 1996) & (F.col("rnk") <= 20)).select(
        F.col("l_partkey").alias("p96"), F.col("rnk").alias("rank_1996")
    )
    j = t95.join(t96, F.col("p95") == F.col("p96"), "full")
    return j.select(
        F.coalesce(F.col("p95"), F.col("p96")).alias("l_partkey"),
        "rank_1995",
        "rank_1996",
        F.when(F.col("p95").isNull(), "entered")
        .when(F.col("p96").isNull(), "exited")
        .otherwise("stayed")
        .alias("status"),
        (F.col("rank_1995") - F.col("rank_1996")).alias("rank_delta"),
    )


@query(
    "q337_kruskal_wallis_h",
    """
    WITH pvg AS (
      SELECT l_quantity AS v, l_returnflag AS g,
             CAST(count(*) AS BIGINT) AS ngv
      FROM lineitem GROUP BY 1, 2
    ),
    pv AS (SELECT v, CAST(sum(ngv) AS BIGINT) AS nv FROM pvg GROUP BY 1),
    cum AS (
      SELECT v, nv,
             CAST(coalesce(sum(nv) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS c
      FROM pv
    ),
    grp AS (
      SELECT g, CAST(sum(ngv) AS BIGINT) AS ng,
             CAST(sum(ngv * (2 * c + nv + 1)) AS BIGINT) AS tworg
      FROM pvg JOIN cum USING (v) GROUP BY 1
    ),
    ties AS (
      SELECT CAST(sum(nv * nv * nv - nv) AS BIGINT) AS tie FROM pv
    ),
    s AS (
      SELECT CAST(count(*) AS INT) AS n_groups,
             CAST(sum(ng) AS BIGINT) AS n,
             sum(CAST(tworg AS DOUBLE) * CAST(tworg AS DOUBLE)
                 / (4.0 * ng)) AS rterm
      FROM grp
    )
    SELECT n_groups, n,
           round((12.0 * rterm / (n * (n + 1.0)) - 3.0 * (n + 1))
                 / (1.0 - CAST(tie AS DOUBLE) / (CAST(n AS DOUBLE) * n * n - n)),
                 4) AS h,
           round(((12.0 * rterm / (n * (n + 1.0)) - 3.0 * (n + 1))
                 / (1.0 - CAST(tie AS DOUBLE) / (CAST(n AS DOUBLE) * n * n - n))
                 - n_groups + 1) / (n - n_groups), 6) AS epsilon_sq
    FROM s, ties
    """,
)
def q337_kruskal_wallis_h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H (rank-based one-way ANOVA, tie-corrected) across
    the three return flags on shipped quantity — the k-group extension
    of q331's Mann-Whitney machinery, same scale shape: ranks come from
    the bounded value domain (one row per distinct quantity, constant
    across SFs) with cumulative counts via a broadcast non-equi
    self-join, never a global sort. 2*R_g and the tie term stay exact
    BIGINTs; R_g is cast to double BEFORE squaring (the long would
    overflow at sf1 — both engines square the same exact integer-valued
    double, so results stay bit-identical). epsilon^2 = (H-k+1)/(N-k)
    is the standard effect size."""
    li = load(spark, sf_dir, "lineitem")
    pvg = li.groupBy(
        F.col("l_quantity").alias("v"), F.col("l_returnflag").alias("g")
    ).agg(F.count(F.lit(1)).cast("long").alias("ngv"))
    pv = pvg.groupBy("v").agg(F.sum("ngv").cast("long").alias("nv"))
    b = pv.select(F.col("v").alias("bv"), F.col("nv").alias("bnv"))
    cum = (
        pv.join(bcast_small(b), F.col("bv") < F.col("v"), "left")
        .groupBy("v", "nv")
        .agg(F.coalesce(F.sum("bnv"), F.lit(0)).cast("long").alias("c"))
    )
    grp = (
        pvg.join(bcast_small(cum), "v")
        .groupBy("g")
        .agg(
            F.sum("ngv").cast("long").alias("ng"),
            F.sum(
                F.col("ngv") * (2 * F.col("c") + F.col("nv") + 1)
            ).cast("long").alias("tworg"),
        )
    )
    ties = pv.agg(
        F.sum(
            F.col("nv") * F.col("nv") * F.col("nv") - F.col("nv")
        ).cast("long").alias("tie")
    )
    s = grp.agg(
        F.count(F.lit(1)).cast("int").alias("n_groups"),
        F.sum("ng").cast("long").alias("n"),
        F.sum(
            F.col("tworg").cast("double")
            * F.col("tworg").cast("double")
            / (F.lit(4.0) * F.col("ng"))
        ).alias("rterm"),
    )
    j = s.crossJoin(bcast_small(ties))
    n, ng = F.col("n"), F.col("n_groups")
    h_raw = F.lit(12.0) * F.col("rterm") / (n * (n + F.lit(1.0))) - 3.0 * (
        n + 1
    )
    corr = F.lit(1.0) - F.col("tie").cast("double") / (
        n.cast("double") * n * n - n
    )
    h = h_raw / corr
    return j.select(
        "n_groups",
        "n",
        F.round(h, 4).alias("h"),
        F.round((h - ng + 1) / (n - ng), 6).alias("epsilon_sq"),
    )


@query(
    "q338_knn_label_purity",
    """
    WITH e AS (
      SELECT vec_id, label, generate_subscripts(embedding, 1) AS i,
             CAST(unnest(embedding) AS DOUBLE) AS v
      FROM embeddings
    ),
    s AS (
      SELECT a.vec_id AS qid, a.label AS qlab, b.vec_id AS cid,
             b.label AS clab,
             round(sum(a.v * b.v)
                   / (sqrt(sum(a.v * a.v)) * sqrt(sum(b.v * b.v))), 12) AS sc
      FROM e a JOIN e b ON a.i = b.i AND a.vec_id <> b.vec_id
      GROUP BY 1, 2, 3, 4
    ),
    nn AS (
      SELECT qid, qlab, clab,
             row_number() OVER (PARTITION BY qid
                                ORDER BY sc DESC, cid) AS rn
      FROM s
    )
    SELECT qlab AS label,
           CAST(count(*) AS BIGINT) AS n_vecs,
           round(avg(CASE WHEN clab = qlab THEN 1.0 ELSE 0.0 END), 6)
             AS purity
    FROM nn WHERE rn = 1 GROUP BY 1
    """,
)
def q338_knn_label_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out 1-NN label purity per label: does each vector's
    exact cosine nearest neighbor share its label? The standard
    embedding-quality eval (complements q295's centroid silhouette —
    purity is local structure, silhouette is global separation).
    operators/similarity.knn_top1_exact: one pair pass, per-side norms
    precomputed, top-1 by max-of-struct — brute-force n^2 is the
    evaluation path on bounded samples; production ANN goes through
    LSH/IVF."""
    from etl_jetro_spark.operators.similarity import knn_top1_exact

    emb = load(spark, sf_dir, "embeddings")
    nn = knn_top1_exact(emb, payload=["label"])
    own = emb.select(F.col("vec_id"), F.col("label"))
    return (
        nn.join(own, "vec_id")
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vecs"),
            F.round(
                F.avg(
                    (F.col("nn_label") == F.col("label")).cast("double")
                ),
                6,
            ).alias("purity"),
        )
    )


@query(
    "q339_mutual_nn_pairs",
    """
    WITH e AS (
      SELECT vec_id, generate_subscripts(embedding, 1) AS i,
             CAST(unnest(embedding) AS DOUBLE) AS v
      FROM embeddings
    ),
    s AS (
      SELECT a.vec_id AS qid, b.vec_id AS cid,
             round(sum(a.v * b.v)
                   / (sqrt(sum(a.v * a.v)) * sqrt(sum(b.v * b.v))), 12) AS sc
      FROM e a JOIN e b ON a.i = b.i AND a.vec_id <> b.vec_id
      GROUP BY 1, 2
    ),
    nn AS (
      SELECT qid, cid, sc,
             row_number() OVER (PARTITION BY qid
                                ORDER BY sc DESC, cid) AS rn
      FROM s
    )
    SELECT a.qid AS vec_a, a.cid AS vec_b, round(a.sc, 4) AS score
    FROM nn a JOIN nn b
      ON a.cid = b.qid AND b.cid = a.qid AND a.qid < a.cid
    WHERE a.rn = 1 AND b.rn = 1
    """,
)
def q339_mutual_nn_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual-nearest-neighbor mining: pairs (a, b) where each is the
    other's exact cosine 1-NN — the reciprocal-best-match criterion
    used for bitext mining and high-precision near-dup seeding (far
    stricter than one-directional top-1). One knn_top1_exact frame
    self-joined on the reciprocity condition; output is at most n/2
    pairs."""
    from etl_jetro_spark.operators.similarity import knn_top1_exact

    emb = load(spark, sf_dir, "embeddings")
    nn = knn_top1_exact(emb)
    other = nn.select(
        F.col("vec_id").alias("o_id"), F.col("nn_id").alias("o_nn")
    )
    return (
        nn.join(
            other,
            (F.col("nn_id") == F.col("o_id"))
            & (F.col("o_nn") == F.col("vec_id")),
        )
        .filter(F.col("vec_id") < F.col("nn_id"))
        .select(
            F.col("vec_id").alias("vec_a"),
            F.col("nn_id").alias("vec_b"),
            F.round(F.col("nn_score"), 4).alias("score"),
        )
    )


@query(
    "q340_chunk_overlap_accounting",
    """
    WITH t AS (
      SELECT doc_id, source,
             CAST(CASE WHEN trim(text) = '' THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\\s+'))
                  END AS BIGINT) AS n
      FROM documents
    ),
    per AS (
      SELECT source, n,
             CASE WHEN n <= 128 THEN 1
                  ELSE CAST(ceil((n - 128) / 96.0) AS BIGINT) + 1
                  END AS k
      FROM t WHERE n > 0
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n) AS BIGINT)   AS token_sum,
           CAST(sum(k) AS BIGINT)   AS n_chunks,
           CAST(sum(128 * (k - 1) + (n - 96 * (k - 1))) AS BIGINT)
             AS emitted_tokens,
           round(100.0 * (sum(128 * (k - 1) + (n - 96 * (k - 1))) - sum(n))
                 / sum(n), 4) AS overhead_pct
    FROM per GROUP BY 1
    """,
)
def q340_chunk_overlap_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG-style strided chunking economics: 128-token chunks at stride
    96 (25% overlap) — per source, how many chunks and how many extra
    tokens does the overlap re-emit? Extends q64/q65 (exact-partition
    chunk/packing) with the OVERLAPPING window semantics retrieval
    pipelines actually use, in CLOSED FORM: chunk count and emitted
    tokens are pure integer expressions of the doc's token count
    (k = ceil((n-128)/96)+1; the last chunk covers the tail, never a
    fully-redundant trailing window) — zero fan-out, one source-keyed
    shuffle; overhead_pct is the number that prices an overlap policy
    before a 100 TB re-chunk."""
    d = load(spark, sf_dir, "documents")
    t = d.select(
        "source", O.token_count("text").cast("long").alias("n")
    ).filter(F.col("n") > 0)
    k = F.when(F.col("n") <= 128, F.lit(1).cast("long")).otherwise(
        F.ceil((F.col("n") - 128) / 96.0).cast("long") + 1
    )
    per = t.select("source", "n", k.alias("k"))
    emitted = 128 * (F.col("k") - 1) + (F.col("n") - 96 * (F.col("k") - 1))
    return per.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n").cast("long").alias("token_sum"),
        F.sum("k").cast("long").alias("n_chunks"),
        F.sum(emitted).cast("long").alias("emitted_tokens"),
        F.round(
            100.0 * (F.sum(emitted) - F.sum("n")) / F.sum("n"), 4
        ).alias("overhead_pct"),
    )


@query(
    "q341_boilerplate_trigram_mass",
    f"""
    WITH wrds AS (
      SELECT doc_id, source, {DK_WORDS} AS w FROM documents
    ),
    sh AS (
      SELECT doc_id, source, array_to_string(w[i:i+2], ' ') AS sh
      FROM wrds,
           UNNEST(generate_series(1, greatest(len(w) - 2, 0))) AS t(i)
    ),
    ds AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
           FROM documents GROUP BY 1),
    per AS (
      SELECT source, sh, CAST(count(*) AS BIGINT) AS occ,
             CAST(count(DISTINCT doc_id) AS BIGINT) AS dfd
      FROM sh GROUP BY 1, 2
    )
    SELECT per.source,
           CAST(count(*) AS BIGINT) AS n_trigrams,
           CAST(sum(CASE WHEN 4 * dfd >= n_docs THEN 1 ELSE 0 END)
                AS BIGINT) AS n_flagged,
           CAST(sum(occ) AS BIGINT) AS occ_total,
           round(100.0 * sum(CASE WHEN 4 * dfd >= n_docs THEN occ
                             ELSE 0 END) / sum(occ), 4)
             AS boilerplate_pct
    FROM per JOIN ds ON per.source = ds.source
    GROUP BY 1
    """,
)
def q341_boilerplate_trigram_mass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate share per source: word trigrams occurring in >= 25%
    of a source's documents are boilerplate (headers, footers, nav
    text); what fraction of the source's trigram occurrences do they
    claim? The CCNet-adjacent corpus-hygiene number one level above
    q118's exact line dedup. One (source, trigram)-keyed aggregation
    carries both the occurrence count and the distinct-doc frequency
    (two-phase distinct-agg rewrite); the per-source doc totals join
    back broadcast (enum-bounded). Shingles come from shingle_rows —
    codegen explode, zero pre-shuffle."""
    from etl_jetro_spark.operators.dedup import shingle_rows

    d = load(spark, sf_dir, "documents")
    sh = shingle_rows(d, "doc_id", "text", n=3, distinct=False)
    src = d.select(F.col("doc_id").alias("_id"), "source")
    per = (
        sh.join(src, "_id")
        .groupBy("source", "_sh")
        .agg(
            F.count(F.lit(1)).cast("long").alias("occ"),
            F.countDistinct("_id").cast("long").alias("dfd"),
        )
    )
    ds = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    flagged = 4 * F.col("dfd") >= F.col("n_docs")
    return (
        per.join(bcast_small(ds), "source")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_trigrams"),
            F.sum(flagged.cast("long")).cast("long").alias("n_flagged"),
            F.sum("occ").cast("long").alias("occ_total"),
            F.round(
                100.0
                * F.sum(F.when(flagged, F.col("occ")).otherwise(0))
                / F.sum("occ"),
                4,
            ).alias("boilerplate_pct"),
        )
    )


@query(
    "q342_topk_rank_overlap",
    """
    WITH agg AS (
      SELECT l_partkey,
             CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                           AS BIGINT)) AS BIGINT) AS rev_c,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
      FROM lineitem GROUP BY 1
    ),
    ra AS (
      SELECT l_partkey,
             row_number() OVER (ORDER BY rev_c DESC, l_partkey) AS r
      FROM agg QUALIFY r <= 20
    ),
    rb AS (
      SELECT l_partkey,
             row_number() OVER (ORDER BY qty DESC, l_partkey) AS r
      FROM agg QUALIFY r <= 20
    ),
    j AS (
      SELECT ra.r AS r_rev, rb.r AS r_qty
      FROM ra JOIN rb USING (l_partkey)
    )
    SELECT k,
           CAST(coalesce(sum(CASE WHEN r_rev <= k AND r_qty <= k
                             THEN 1 END), 0) AS BIGINT) AS n_common,
           round(coalesce(sum(CASE WHEN r_rev <= k AND r_qty <= k
                          THEN 1 END), 0) / (1.0 * k), 4) AS overlap_frac
    FROM (SELECT unnest([5, 10, 20]) AS k), j
    GROUP BY k
    """,
)
def q342_topk_rank_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-list agreement audit: overlap@k (k = 5/10/20) between the
    parts ranked by revenue and by shipped quantity — the retrieval-eval
    primitive (same measurement as comparing two ANN indexes' top-k
    lists) on exact integer metrics. Each global top-20 is an
    orderBy+limit (TakeOrdered — never an empty-partition-spec window);
    ranks are re-derived on the 20-row frames (bounded input, planlint
    class 'window over GlobalLimit'), and the overlap histogram is a
    k-explode over the <=20-row join."""
    from pyspark.sql import Window

    li = load(spark, sf_dir, "lineitem")
    agg = (
        li.select(
            "l_partkey",
            F.round(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
            ).cast("long").alias("cents"),
            F.col("l_quantity").cast("long").alias("q"),
        )
        .groupBy("l_partkey")
        .agg(
            F.sum("cents").alias("rev_c"),
            F.sum("q").alias("qty"),
        )
    )

    def top20(metric: str, out: str) -> DataFrame:
        t = agg.orderBy(
            F.col(metric).desc(), F.col("l_partkey").asc()
        ).limit(20)
        w = Window.orderBy(F.col(metric).desc(), F.col("l_partkey").asc())
        return t.select(
            "l_partkey", F.row_number().over(w).alias(out)
        )

    j = top20("rev_c", "r_rev").join(top20("qty", "r_qty"), "l_partkey")
    ks = spark.range(1).select(
        F.explode(F.array(F.lit(5), F.lit(10), F.lit(20))).alias("k")
    )
    return (
        j.crossJoin(bcast_small(ks))
        .groupBy("k")
        .agg(
            F.sum(
                ((F.col("r_rev") <= F.col("k")) & (F.col("r_qty") <= F.col("k")))
                .cast("long")
            ).alias("n_common"),
        )
        .select(
            "k",
            "n_common",
            F.round(F.col("n_common") / (F.lit(1.0) * F.col("k")), 4).alias(
                "overlap_frac"
            ),
        )
    )


@query(
    "q343_theil_decomposition",
    """
    WITH cust AS (
      SELECT c_nationkey,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders JOIN customer ON c_custkey = o_custkey
      GROUP BY o_custkey, c_nationkey
    ),
    grp AS (
      SELECT c_nationkey,
             CAST(count(*) AS BIGINT) AS ng,
             CAST(sum(cents) AS BIGINT) AS xg,
             sum(cents * ln(CAST(cents AS DOUBLE))) AS sxl
      FROM cust GROUP BY 1
    ),
    tot AS (SELECT CAST(sum(ng) AS BIGINT) AS n,
                   CAST(sum(xg) AS BIGINT) AS x
            FROM grp)
    SELECT n_name AS nation, ng AS n_cust,
           round(CAST(xg AS DOUBLE) / x, 6) AS rev_share,
           round(sxl / xg - ln(CAST(xg AS DOUBLE) / ng), 6)
             AS theil_within,
           round((CAST(xg AS DOUBLE) / x)
                 * ln((CAST(xg AS DOUBLE) / ng)
                      / (CAST(x AS DOUBLE) / n)), 6)
             AS between_contrib,
           round((CAST(xg AS DOUBLE) / x)
                 * (sxl / xg - ln(CAST(xg AS DOUBLE) / ng)), 6)
             AS within_contrib
    FROM grp JOIN nation ON n_nationkey = c_nationkey, tot
    """,
)
def q343_theil_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-T inequality DECOMPOSITION of customer revenue by nation:
    unlike Gini (q163/q263/q313), Theil splits exactly into
    between-group + within-group terms — the question "is revenue
    inequality driven by rich nations or rich customers inside each
    nation?" that concentration curves can't answer. Per-customer
    revenue reduces in integer cents; per-nation sufficient stats are
    (n_g, X_g, Σ x·ln x), so T_g = Σx·ln(x)/X_g − ln(μ_g) needs no
    second pass; the global totals re-reduce from the 25-row group
    frame and join back broadcast."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    cust = (
        o.join(bcast_sized(c), o.o_custkey == c.c_custkey)
        .select(
            "o_custkey",
            "c_nationkey",
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cc"),
        )
        .groupBy("o_custkey", "c_nationkey")
        .agg(F.sum("cc").alias("cents"))
    )
    grp = cust.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).cast("long").alias("ng"),
        F.sum("cents").cast("long").alias("xg"),
        F.sum(
            F.col("cents") * F.log(F.col("cents").cast("double"))
        ).alias("sxl"),
    )
    tot = grp.agg(
        F.sum("ng").cast("long").alias("n"),
        F.sum("xg").cast("long").alias("x"),
    )
    xg, x = F.col("xg").cast("double"), F.col("x").cast("double")
    mu_g = xg / F.col("ng")
    mu = x / F.col("n")
    share = xg / x
    t_g = F.col("sxl") / xg - F.log(mu_g)
    return (
        grp.crossJoin(bcast_small(tot))
        .join(bcast_small(n), grp.c_nationkey == n.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.col("ng").alias("n_cust"),
            F.round(share, 6).alias("rev_share"),
            F.round(t_g, 6).alias("theil_within"),
            F.round(share * F.log(mu_g / mu), 6).alias("between_contrib"),
            F.round(share * t_g, 6).alias("within_contrib"),
        )
    )


@query(
    "q344_negative_sampling_audit",
    """
    WITH tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM embeddings),
    cand AS (
      SELECT e.vec_id, e.label AS a_label,
             (e.vec_id * 9973 + j * 104729) % n AS neg_id
      FROM embeddings e, tot, unnest(generate_series(1, 4)) AS t(j)
    ),
    hits AS (
      SELECT c.vec_id, c.a_label, b.label AS n_label
      FROM cand c JOIN embeddings b ON b.vec_id = c.neg_id
      WHERE c.neg_id <> c.vec_id
    )
    SELECT a_label AS label,
           CAST(count(DISTINCT vec_id) AS BIGINT) AS n_anchors,
           CAST(count(*) AS BIGINT) AS n_sampled,
           CAST(sum(CASE WHEN n_label = a_label THEN 1 ELSE 0 END)
                AS BIGINT) AS n_false_neg,
           round(sum(CASE WHEN n_label = a_label THEN 1.0 ELSE 0 END)
                 / count(*), 6) AS fn_rate
    FROM hits GROUP BY 1
    """,
)
def q344_negative_sampling_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive-training negative-sampling audit: each vector draws 4
    deterministic hash-picked 'negatives'; what fraction share the
    anchor's label (false negatives — pairs a contrastive loss would
    wrongly push apart)? With 10 roughly-uniform labels the expected
    rate is ~0.1; a skewed label shows up immediately. Hash-mod pick is
    engine-portable (no RNG), self-pairs are filtered identically on
    both sides, and missing ids drop in the equi-join the same way —
    the audit stays exact at any SF. Complements q221's pair audit
    (which checks given pairs; this one checks the SAMPLER)."""
    emb = load(spark, sf_dir, "embeddings")
    tot = emb.agg(F.count(F.lit(1)).cast("long").alias("n"))
    cand = (
        emb.crossJoin(bcast_small(tot))
        .select(
            "vec_id",
            F.col("label").alias("a_label"),
            F.explode(F.sequence(F.lit(1), F.lit(4))).alias("j"),
            "n",
        )
        .select(
            "vec_id",
            "a_label",
            ((F.col("vec_id") * 9973 + F.col("j") * 104729) % F.col("n"))
            .alias("neg_id"),
        )
        .filter(F.col("neg_id") != F.col("vec_id"))
    )
    b = emb.select(
        F.col("vec_id").alias("neg_id"), F.col("label").alias("n_label")
    )
    hits = cand.join(b, "neg_id")
    return hits.groupBy(F.col("a_label").alias("label")).agg(
        F.countDistinct("vec_id").cast("long").alias("n_anchors"),
        F.count(F.lit(1)).cast("long").alias("n_sampled"),
        F.sum(
            (F.col("n_label") == F.col("a_label")).cast("long")
        ).cast("long").alias("n_false_neg"),
        F.round(
            F.sum((F.col("n_label") == F.col("a_label")).cast("double"))
            / F.count(F.lit(1)),
            6,
        ).alias("fn_rate"),
    )


@query(
    "q345_quality_dup_calibration",
    f"""
    WITH feat AS (
      SELECT doc_id, text,
             CAST(len(text) AS BIGINT) AS n_chars,
             CAST(CASE WHEN trim(text) = '' THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS INT) AS n_tokens,
             len(regexp_replace(text, '[^.,;:!?''"()\\[\\]-]', '', 'g')) AS n_punct,
             len(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digit,
             len(list_filter(string_split({DK_NORM_TEXT}, ' '),
                             x -> list_contains({_dk_stop_list('en')}, x))) AS n_stop
      FROM documents
    ),
    scored AS (
      SELECT doc_id, md5({DK_NORM_TEXT.replace('text', 'feat.text')}) AS fp,
             round(least(n_tokens / 20.0, 1.0) * 0.4
                   + (1 - least(CAST(n_punct AS DOUBLE) / n_chars * 2
                                + CAST(n_digit AS DOUBLE) / n_chars * 2, 1.0)) * 0.3
                   + least(CAST(n_stop AS DOUBLE) / n_tokens * 4, 1.0) * 0.3, 6)
               AS q
      FROM feat WHERE n_chars > 0 AND n_tokens > 0
    ),
    dup AS (
      SELECT fp, CAST(count(*) AS BIGINT) AS grp FROM scored GROUP BY 1
    ),
    flagged AS (
      SELECT s.doc_id, s.q,
             CASE WHEN d.grp > 1 THEN 1 ELSE 0 END AS is_dup,
             row_number() OVER (ORDER BY s.q, s.doc_id) AS rn,
             count(*) OVER () AS n
      FROM scored s JOIN dup d USING (fp)
    )
    SELECT CAST((rn - 1) * 10 // n + 1 AS INT) AS decile,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(CAST(sum(CAST(round(q * 1000000) AS BIGINT)) AS DOUBLE)
                 / (1000000.0 * count(*)), 6) AS avg_quality,
           round(sum(CAST(is_dup AS DOUBLE)) / count(*), 6) AS dup_rate
    FROM flagged GROUP BY 1
    """,
)
def q345_quality_dup_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Score-calibration table: does the composite quality score (q24)
    actually predict exact duplication? Documents are cut into global
    quality DECILES (range-partitioned rank frame — the q299 explicit
    floor((rn-1)*10/n)+1 bucketing, never engine ntile) and each decile
    reports its exact-dup membership rate (q17's normalized-md5
    fingerprint). The filter-threshold-picking table a corpus curator
    reads before spending a 100 TB dedup pass. Decile means average in
    exact 1e-6 units (the score is 6-dp-quantized, so round(q*1e6) is
    integer-exact — the q195 lesson applied preemptively)."""
    from etl_jetro_spark.functions.hashing import norm_text
    from etl_jetro_spark.operators.aggregate import group_ranked

    d = load(spark, sf_dir, "documents")
    scored = (
        O.quality_score(d, "text")
        .filter((F.col("q_n_chars") > 0) & (F.col("q_n_tokens") > 0))
        .select(
            "doc_id",
            F.md5(norm_text("text")).alias("fp"),
            F.col("quality_score").alias("q"),
        )
        # freeze the narrow frame: TWO consumers below (dup counts +
        # the join back), and the regex-heavy score/norm projections
        # must not re-run — nor be CollapseProject-inlined — per
        # consumer (the q145 lesson; measured 25.3 -> ~8 s at sf1)
        .localCheckpoint(eager=False)
    )
    dup = scored.groupBy("fp").agg(
        F.count(F.lit(1)).cast("long").alias("grp")
    )
    flagged = scored.join(dup, "fp").select(
        "doc_id", "q", (F.col("grp") > 1).cast("int").alias("is_dup")
    )
    r = group_ranked(flagged, [], "q", tiebreak=["doc_id", "is_dup"])
    binned = r.select(
        F.col("_v").alias("q"),
        F.col("is_dup"),
        ((F.col("_rn") - 1) * 10 / F.col("_n")).cast("long").alias("b"),
    )
    return binned.groupBy((F.col("b") + 1).cast("int").alias("decile")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.round(
            F.sum(F.round(F.col("q") * 1000000).cast("long"))
            / (F.lit(1000000.0) * F.count(F.lit(1))),
            6,
        ).alias("avg_quality"),
        F.round(
            F.sum(F.col("is_dup").cast("double")) / F.count(F.lit(1)), 6
        ).alias("dup_rate"),
    )


@query(
    "q346_wilcoxon_signed_rank",
    """
    WITH pr AS (
      SELECT l_orderkey,
             max(CASE WHEN l_linenumber = 1 THEN l_quantity END) AS q1,
             max(CASE WHEN l_linenumber = 2 THEN l_quantity END) AS q2
      FROM lineitem WHERE l_linenumber IN (1, 2) GROUP BY 1
    ),
    dd AS (
      SELECT CAST(q1 - q2 AS BIGINT) AS d FROM pr
      WHERE q1 IS NOT NULL AND q2 IS NOT NULL AND q1 <> q2
    ),
    pv AS (
      SELECT abs(d) AS a,
             CAST(count(*) AS BIGINT) AS nv,
             CAST(sum(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS BIGINT) AS posv
      FROM dd GROUP BY 1
    ),
    ranked AS (
      SELECT a, nv, posv,
             CAST(coalesce(sum(nv) OVER (ORDER BY a
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS cum
      FROM pv
    ),
    s AS (
      SELECT CAST(sum(nv) AS BIGINT) AS n,
             CAST(sum(CAST(posv AS HUGEINT) * (2 * cum + nv + 1))
                  AS DOUBLE) AS twow,
             CAST(sum(CAST(nv AS HUGEINT) * nv * nv - nv) AS DOUBLE) AS tie
      FROM ranked
    )
    SELECT n AS n_pairs,
           round(twow / 2.0, 1) AS w_plus,
           round((twow - n * (n + 1.0) / 2.0)
                 / (2.0 * sqrt((2.0 * n * (n + 1.0) * (2.0 * n + 1.0) - tie)
                               / 48.0)), 4) AS z,
           round(((twow - n * (n + 1.0) / 2.0)
                 / (2.0 * sqrt((2.0 * n * (n + 1.0) * (2.0 * n + 1.0) - tie)
                               / 48.0)))
                 / sqrt(CAST(n AS DOUBLE)), 6) AS effect_r
    FROM s
    """,
)
def q346_wilcoxon_signed_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilcoxon signed-rank test (paired, tie-corrected): within each
    order, does line 1 ship a different quantity than line 2? The
    paired difference d = q1 - q2 is an exact integer on the BOUNDED
    domain [-49, 49], so — like q331's rank-sum — the rank statistic
    needs NO global sort: nonzero |d| values reduce to a <=49-row
    value frame, average ranks come from a broadcast non-equi cumsum
    on that frame, and 2*W+ / the tie term stay exact integers
    (decimal-summed: at 100 TB n ~ 1e9 pairs and posv*(2cum+nv+1)
    ~ 4n^2 overflows BIGINT). z and the effect size r = z/sqrt(n) are
    assembled from the exact integers with the identical float
    expression on both engines. One orderkey shuffle end to end."""
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_linenumber").isin(1, 2)
    )
    pr = li.groupBy("l_orderkey").agg(
        F.max(F.when(F.col("l_linenumber") == 1, F.col("l_quantity"))).alias("q1"),
        F.max(F.when(F.col("l_linenumber") == 2, F.col("l_quantity"))).alias("q2"),
    )
    d = (
        pr.filter(
            F.col("q1").isNotNull()
            & F.col("q2").isNotNull()
            & (F.col("q1") != F.col("q2"))
        )
        .select((F.col("q1") - F.col("q2")).cast("long").alias("d"))
    )
    pv = d.groupBy(F.abs(F.col("d")).alias("a")).agg(
        F.count(F.lit(1)).cast("long").alias("nv"),
        F.sum(F.when(F.col("d") > 0, 1).otherwise(0)).cast("long").alias("posv"),
    )
    b = pv.select(F.col("a").alias("ba"), F.col("nv").alias("bnv"))
    ranked = (
        pv.join(bcast_small(b), F.col("ba") < F.col("a"), "left")
        .groupBy("a", "nv", "posv")
        .agg(F.coalesce(F.sum("bnv"), F.lit(0)).alias("cum"))
    )
    nvd = F.col("nv").cast("decimal(19,0)")
    s = ranked.agg(
        F.sum("nv").cast("long").alias("n"),
        F.sum(
            F.col("posv").cast("decimal(19,0)")
            * (2 * F.col("cum") + F.col("nv") + 1).cast("decimal(19,0)")
        ).cast("double").alias("twow"),
        F.sum(nvd * nvd * nvd - F.col("nv")).cast("double").alias("tie"),
    )
    n = F.col("n")
    num = F.col("twow") - n * (n + F.lit(1.0)) / F.lit(2.0)
    sig2 = (
        F.lit(2.0) * n * (n + F.lit(1.0)) * (F.lit(2.0) * n + F.lit(1.0))
        - F.col("tie")
    ) / F.lit(48.0)
    z = num / (F.lit(2.0) * F.sqrt(sig2))
    return s.select(
        n.alias("n_pairs"),
        F.round(F.col("twow") / F.lit(2.0), 1).alias("w_plus"),
        F.round(z, 4).alias("z"),
        F.round(z / F.sqrt(n.cast("double")), 6).alias("effect_r"),
    )


@query(
    "q347_brown_forsythe_variance",
    """
    WITH v AS (
      SELECT l_returnflag AS flag,
             CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS cents
      FROM lineitem WHERE l_returnflag IN ('A', 'N', 'R')
    ),
    med AS (
      SELECT flag, quantile_cont(cents, 0.5) AS med FROM v GROUP BY 1
    ),
    z AS (
      SELECT v.flag,
             abs(2 * v.cents - CAST(round(2 * m.med) AS BIGINT)) AS z2
      FROM v JOIN med m ON v.flag = m.flag
    ),
    g AS (
      SELECT flag, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(z2) AS HUGEINT) AS s1,
             sum(CAST(z2 AS HUGEINT) * z2) AS s2
      FROM z GROUP BY 1
    ),
    one AS (
      SELECT max(CASE WHEN flag = 'A' THEN n END) AS na,
             max(CASE WHEN flag = 'N' THEN n END) AS nn,
             max(CASE WHEN flag = 'R' THEN n END) AS nr,
             CAST(max(CASE WHEN flag = 'A' THEN s1 END) AS DOUBLE) AS s1a,
             CAST(max(CASE WHEN flag = 'N' THEN s1 END) AS DOUBLE) AS s1n,
             CAST(max(CASE WHEN flag = 'R' THEN s1 END) AS DOUBLE) AS s1r,
             CAST(max(CASE WHEN flag = 'A' THEN s2 END) AS DOUBLE) AS s2a,
             CAST(max(CASE WHEN flag = 'N' THEN s2 END) AS DOUBLE) AS s2n,
             CAST(max(CASE WHEN flag = 'R' THEN s2 END) AS DOUBLE) AS s2r,
             CAST(max(CASE WHEN flag = 'A' THEN s1 END)
                  + max(CASE WHEN flag = 'N' THEN s1 END)
                  + max(CASE WHEN flag = 'R' THEN s1 END) AS DOUBLE) AS s1t,
             CAST(sum(n) AS BIGINT) AS nt
      FROM g
    ),
    f AS (
      SELECT round(
               (((s1a * s1a / na + s1n * s1n / nn + s1r * s1r / nr)
                 - s1t * s1t / nt) / 2.0)
               / ((((s2a - s1a * s1a / na) + (s2n - s1n * s1n / nn))
                   + (s2r - s1r * s1r / nr)) / (nt - 3.0)),
               4) AS bf_f
      FROM one
    )
    SELECT g.flag AS l_returnflag,
           g.n AS n_items,
           CAST(round(2 * m.med) AS BIGINT) AS median_cents_x2,
           round(CAST(g.s1 AS DOUBLE) / (2.0 * g.n), 4) AS mean_absdev_cents,
           f.bf_f
    FROM g JOIN med m ON g.flag = m.flag CROSS JOIN f
    """,
)
def q347_brown_forsythe_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown-Forsythe (median-centered Levene) variance-homogeneity
    test: do the A/N/R return classes have equal price SPREAD, not just
    equal means (q320's ANOVA tests means)? Exactness discipline:
    prices are exact 2-dp -> cents are exact BIGINTs; the per-group
    exact median (operators/aggregate.exact_group_percentiles — the
    range-partitioned parallel sort, no task ever holds a group) at
    p=0.5 is half-cent-exact, so z = |2*cents - 2*median| is an exact
    integer. Group sums of z and z^2 stay exact (decimal on Spark,
    HUGEINT on DuckDB — z^2 sums reach ~1e21 at sf1, past BIGINT at
    100 TB); the F statistic is assembled from the exact sufficient
    statistics in ONE fixed-order scalar expression (k=3 groups pivoted
    to a single row), so no float SUM ever depends on engine iteration
    order — the q195 lesson applied to a ratio-of-sums statistic.

    Plan shape: ONE range-partition sort of the cents frame
    (operators/aggregate.group_ranked, checkpointed) feeds BOTH the
    median rank-probe AND the |z| sufficient-statistics pass — the
    naive exact_group_percentiles-then-rejoin form re-scanned and
    re-shuffled lineitem a second time for z (measured 9.2 -> ~7 s
    at sf0.1)."""
    from etl_jetro_spark.operators.aggregate import group_ranked

    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag").isin("A", "N", "R")
    )
    v = li.select(
        F.col("l_returnflag").alias("flag"),
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("cents"),
    )
    ranked = group_ranked(v, ["flag"], "cents")
    # type-7 median x2, exact: ranks lo = (n+1) div 2, hi = (n+2) div 2
    # collapse to lo = hi for odd n, so vlo + vhi is 2*median either way
    lo = ((F.col("_n") + 1) / 2).cast("long")
    hi = ((F.col("_n") + 2) / 2).cast("long")
    med = (
        ranked.filter((F.col("_rn") == lo) | (F.col("_rn") == hi))
        .groupBy("flag")
        .agg(
            (
                F.max(F.when(F.col("_rn") == lo, F.col("_v")))
                + F.max(F.when(F.col("_rn") == hi, F.col("_v")))
            ).alias("m2")
        )
    )
    z = ranked.join(bcast_small(med), "flag").select(
        "flag", F.abs(2 * F.col("_v") - F.col("m2")).alias("z2")
    )
    z2d = F.col("z2").cast("decimal(19,0)")
    g = z.groupBy("flag").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("z2").cast("decimal(20,0)")).alias("s1"),
        F.sum(z2d * z2d).alias("s2"),
    )

    def pick(col: str, flag: str):
        return F.max(F.when(F.col("flag") == flag, F.col(col)))

    one = g.agg(
        pick("n", "A").alias("na"),
        pick("n", "N").alias("nn"),
        pick("n", "R").alias("nr"),
        pick("s1", "A").cast("double").alias("s1a"),
        pick("s1", "N").cast("double").alias("s1n"),
        pick("s1", "R").cast("double").alias("s1r"),
        pick("s2", "A").cast("double").alias("s2a"),
        pick("s2", "N").cast("double").alias("s2n"),
        pick("s2", "R").cast("double").alias("s2r"),
        (pick("s1", "A") + pick("s1", "N") + pick("s1", "R"))
        .cast("double")
        .alias("s1t"),
        F.sum("n").cast("long").alias("nt"),
    )
    s1a, s1n, s1r = F.col("s1a"), F.col("s1n"), F.col("s1r")
    na, nn, nr, nt = F.col("na"), F.col("nn"), F.col("nr"), F.col("nt")
    ssb = (
        s1a * s1a / na + s1n * s1n / nn + s1r * s1r / nr
    ) - F.col("s1t") * F.col("s1t") / nt
    ssw = (
        (F.col("s2a") - s1a * s1a / na)
        + (F.col("s2n") - s1n * s1n / nn)
    ) + (F.col("s2r") - s1r * s1r / nr)
    f = one.select(
        F.round(
            (ssb / F.lit(2.0)) / (ssw / (nt - F.lit(3.0))), 4
        ).alias("bf_f")
    )
    return (
        g.join(bcast_small(med), "flag")
        .crossJoin(bcast_small(f))
        .select(
            F.col("flag").alias("l_returnflag"),
            F.col("n").alias("n_items"),
            F.col("m2").cast("long").alias("median_cents_x2"),
            F.round(
                F.col("s1").cast("double") / (F.lit(2.0) * F.col("n")), 4
            ).alias("mean_absdev_cents"),
            F.col("bf_f"),
        )
    )


@query(
    "q348_kendall_tau_parts",
    """
    WITH g AS (
      SELECT p_brand AS b, p_size AS s,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100
                           AS BIGINT)) AS BIGINT) AS yc
      FROM part GROUP BY 1, 2
    ),
    pr AS (
      -- both signs oriented a->b: sx = sign(x_b - x_a),
      -- sy = sign(ybar_b - ybar_a) via exact cross-multiplication
      SELECT CASE WHEN a.s < b.s THEN 1
                  WHEN a.s > b.s THEN -1 ELSE 0 END AS sx,
             CASE WHEN CAST(b.yc AS HUGEINT) * a.n
                       > CAST(a.yc AS HUGEINT) * b.n THEN 1
                  WHEN CAST(b.yc AS HUGEINT) * a.n
                       < CAST(a.yc AS HUGEINT) * b.n THEN -1
                  ELSE 0 END AS sy
      FROM g a JOIN g b
        ON (a.b < b.b) OR (a.b = b.b AND a.s < b.s)
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n0,
             CAST(sum(CASE WHEN sx * sy > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS c,
             CAST(sum(CASE WHEN sx * sy < 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS d,
             CAST(sum(CASE WHEN sx = 0 AND sy <> 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS tx,
             CAST(sum(CASE WHEN sy = 0 AND sx <> 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS ty,
             CAST(sum(CASE WHEN sx = 0 AND sy = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS tb
      FROM pr
    )
    SELECT n0 AS n_pairs, c AS concordant, d AS discordant,
           tx AS ties_x, ty AS ties_y, tb AS ties_both,
           round((c - d) / sqrt((n0 - tx - tb) * 1.0 * (n0 - ty - tb)), 6)
             AS tau_b
    FROM s
    """,
)
def q348_kendall_tau_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-b rank correlation (complements q314's Spearman —
    tau counts inversions, is robust to the monotone-transform choice,
    and has the tie-b correction built in): does part size move with
    mean retail price across (brand, size) cells? Scale shape: the
    correlation runs on the SUFFICIENT-STATISTICS frame (one row per
    (p_brand, p_size) — enum-bounded at <=25x50 rows at ANY corpus
    size), so the O(cells^2) pair join is a constant-bounded broadcast
    self-join, never a data-sized all-pairs. Mean comparisons are
    exact cross-multiplications (yc_a*n_b vs yc_b*n_a, decimal-widened
    — cents-sums reach ~1e15 and counts ~1e8 at 100 TB, so the product
    passes BIGINT); concordant/discordant/tie counts are exact
    integers and tau_b is one identical float expression on both
    engines."""
    p = load(spark, sf_dir, "part")
    g = p.groupBy(
        F.col("p_brand").alias("b"), F.col("p_size").alias("s")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(
            (F.col("p_retailprice").cast("decimal(18,2)") * 100).cast("long")
        ).cast("long").alias("yc"),
    )
    a = g.select(
        F.col("b").alias("ab"), F.col("s").alias("asz"),
        F.col("n").alias("an"), F.col("yc").alias("ayc"),
    )
    bb = g.select(
        F.col("b").alias("bb"), F.col("s").alias("bsz"),
        F.col("n").alias("bn"), F.col("yc").alias("byc"),
    )
    cross_a = F.col("ayc").cast("decimal(19,0)") * F.col("bn").cast(
        "decimal(19,0)"
    )
    cross_b = F.col("byc").cast("decimal(19,0)") * F.col("an").cast(
        "decimal(19,0)"
    )
    # bcast_sized, not bcast_small: the frame saturates at the 25x50
    # brand/size enum ceiling but is still growing between the lint's
    # two measurement SFs; the size gate keeps the broadcast measured.
    pr = a.join(
        bcast_sized(bb),
        (F.col("ab") < F.col("bb"))
        | ((F.col("ab") == F.col("bb")) & (F.col("asz") < F.col("bsz"))),
    ).select(
        # both signs oriented a->b (sx = sign(x_b - x_a), sy =
        # sign(ybar_b - ybar_a)): a mismatched orientation silently
        # flips tau's sign on BOTH engines — caught by the
        # textbook-value oracle test, not by engine parity
        F.when(F.col("asz") < F.col("bsz"), 1)
        .when(F.col("asz") > F.col("bsz"), -1)
        .otherwise(0)
        .alias("sx"),
        F.when(cross_b > cross_a, 1)
        .when(cross_b < cross_a, -1)
        .otherwise(0)
        .alias("sy"),
    )
    s = pr.agg(
        F.count(F.lit(1)).cast("long").alias("n0"),
        F.sum(F.when(F.col("sx") * F.col("sy") > 0, 1).otherwise(0))
        .cast("long").alias("c"),
        F.sum(F.when(F.col("sx") * F.col("sy") < 0, 1).otherwise(0))
        .cast("long").alias("d"),
        F.sum(
            F.when((F.col("sx") == 0) & (F.col("sy") != 0), 1).otherwise(0)
        ).cast("long").alias("tx"),
        F.sum(
            F.when((F.col("sy") == 0) & (F.col("sx") != 0), 1).otherwise(0)
        ).cast("long").alias("ty"),
        F.sum(
            F.when((F.col("sx") == 0) & (F.col("sy") == 0), 1).otherwise(0)
        ).cast("long").alias("tb"),
    )
    n0, c, d = F.col("n0"), F.col("c"), F.col("d")
    tx, ty, tb = F.col("tx"), F.col("ty"), F.col("tb")
    return s.select(
        n0.alias("n_pairs"),
        c.alias("concordant"),
        d.alias("discordant"),
        tx.alias("ties_x"),
        ty.alias("ties_y"),
        tb.alias("ties_both"),
        F.round(
            (c - d)
            / F.sqrt((n0 - tx - tb) * F.lit(1.0) * (n0 - ty - tb)),
            6,
        ).alias("tau_b"),
    )


@query(
    "q349_lone_late_supplier",
    """
    WITH x AS (
      SELECT l.l_suppkey AS sk, l.l_orderkey AS ok,
             CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 75 DAY
                  THEN 1 ELSE 0 END AS late
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    per AS (
      SELECT ok,
             count(DISTINCT sk) AS nsup,
             count(DISTINCT CASE WHEN late = 1 THEN sk END) AS nlate,
             max(CASE WHEN late = 1 THEN sk END) AS lone
      FROM x GROUP BY 1
    ),
    w AS (
      SELECT lone AS sk, CAST(count(*) AS BIGINT) AS numwait
      FROM per WHERE nsup >= 2 AND nlate = 1 GROUP BY 1
    )
    SELECT s.s_name, w.numwait
    FROM w JOIN supplier s ON w.sk = s.s_suppkey
    ORDER BY w.numwait DESC, s.s_name
    LIMIT 15
    """,
)
def q349_lone_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (waiting-supplier audit): suppliers who were the
    ONLY late shipper (shipdate > orderdate + 75 days) in a
    multi-supplier order — the classic exists/not-exists correlated
    pair. Only the decorrelation SHAPE follows dbgen Q21; the
    predicates are a variant (lateness is shipdate vs orderdate+75d,
    and there is no o_orderstatus='F' or nation filter). Rewritten as what the
    decorrelated plan SHOULD be: ONE aggregation per order computes
    (distinct suppliers, distinct late suppliers, the lone late key),
    so both EXISTS probes collapse into the same orderkey shuffle the
    lineitem x orders equi-join already runs — no second/third
    lineitem scan, no anti-join cascade. The per-supplier tally is
    metadata-sized, the name join broadcasts, and the top-15 is a
    TakeOrdered with a full (numwait DESC, s_name) tiebreak so the
    LIMIT cut is deterministic on both engines."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    x = li.join(
        o, F.col("l_orderkey") == F.col("o_orderkey")
    ).select(
        F.col("l_orderkey").alias("ok"),
        F.col("l_suppkey").alias("sk"),
        F.when(
            F.col("l_shipdate")
            > F.expr("timestampadd(DAY, 75, o_orderdate)"),
            1,
        ).otherwise(0).alias("late"),
    )
    per = x.groupBy("ok").agg(
        F.countDistinct("sk").alias("nsup"),
        F.countDistinct(
            F.when(F.col("late") == 1, F.col("sk"))
        ).alias("nlate"),
        F.max(F.when(F.col("late") == 1, F.col("sk"))).alias("lone"),
    )
    w = (
        per.filter((F.col("nsup") >= 2) & (F.col("nlate") == 1))
        .groupBy(F.col("lone").alias("sk"))
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
    )
    sup = load(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("sk"), "s_name"
    )
    return (
        w.join(bcast_sized(sup), "sk")
        .select("s_name", "numwait")
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(15)
    )


# --------------------------------------------------------------------------
# 34. Round-10 wave: fused retrieval eval (RRF, rerank-budget recall,
#     label NDCG), per-source contamination matrices, dedup-state TTL /
#     eviction audits, int8-retrieval agreement, centroid confusion
# --------------------------------------------------------------------------


def _probe_scores_sql(sa_cond: str, sb_cond: str, per: int = 25) -> str:
    """Shared oracle CTE block: ``sc(qid, cid, sa, sb)`` — every corpus
    vector scored against an adaptive ~`per`-probe slice (m = max(5,
    ceil(n/per)), the q221 adaptive-parameter pattern), with two cosine
    channels defined by dim predicates over ``c.i``/``q.i`` (1-based).
    Probe x corpus is ~per x n dim-join rows — LINEAR in the corpus at
    any scale, never pairwise."""
    sa_q = sa_cond.replace("c.i", "q.i")
    sb_q = sb_cond.replace("c.i", "q.i")
    return f"""
    md AS (SELECT greatest(5, CAST(ceil(count(*) / {per}.0) AS BIGINT)) AS m
           FROM embeddings),
    e AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
                 CAST(unnest(embedding) AS DOUBLE) AS x
          FROM embeddings),
    nrm AS (SELECT vec_id,
                   sqrt(sum(CASE WHEN {sa_cond.replace("c.i", "i")}
                            THEN x * x ELSE 0 END)) AS na,
                   sqrt(sum(CASE WHEN {sb_cond.replace("c.i", "i")}
                            THEN x * x ELSE 0 END)) AS nb
            FROM e GROUP BY 1),
    ok AS (SELECT vec_id FROM nrm WHERE na > 0 AND nb > 0),
    qp AS (SELECT e.* FROM e CROSS JOIN md JOIN ok USING (vec_id)
           WHERE e.vec_id % md.m = 0),
    cp AS (SELECT e.* FROM e JOIN ok USING (vec_id)),
    dots AS (
      SELECT q.vec_id AS qid, c.vec_id AS cid,
             sum(CASE WHEN {sa_cond} THEN c.x * q.x ELSE 0 END) AS da,
             sum(CASE WHEN {sb_cond} THEN c.x * q.x ELSE 0 END) AS db
      FROM cp c JOIN qp q ON c.i = q.i AND c.vec_id <> q.vec_id
      GROUP BY 1, 2),
    sc AS (
      SELECT dots.qid, dots.cid,
             round(dots.da / (nq.na * nc.na), 12) AS sa,
             round(dots.db / (nq.nb * nc.nb), 12) AS sb
      FROM dots
      JOIN nrm nq ON nq.vec_id = dots.qid
      JOIN nrm nc ON nc.vec_id = dots.cid)
    """  # noqa: S608 (static fragments, no user input)


def _probe_scores(
    spark: SparkSession, sf_dir: str, mode: str, cut: int, per: int = 25
) -> DataFrame:
    """Spark twin of :func:`_probe_scores_sql` — delegates to the engine
    operator :func:`operators.retrieval.probe_channel_scores` (adaptive
    ~`per`-probe slice, expression-only codegen, round-12 tie hygiene,
    checkpoint barrier; see that module's docstring for the scale and
    determinism story)."""
    from etl_jetro_spark.operators.retrieval import probe_channel_scores

    return probe_channel_scores(
        load(spark, sf_dir, "embeddings"), mode, cut, per=per
    )


def _rank_frame(scored: DataFrame, col: str, out: str) -> DataFrame:
    """Engine operator :func:`operators.retrieval.rank_channel`."""
    from etl_jetro_spark.operators.retrieval import rank_channel

    return rank_channel(scored, col, out)


@query(
    "q350_rrf_rank_fusion",
    f"""
    WITH {_probe_scores_sql("c.i <= 32", "c.i > 32")},
    r AS (
      SELECT qid, cid,
             row_number() OVER (PARTITION BY qid ORDER BY sa DESC, cid) AS ra,
             row_number() OVER (PARTITION BY qid ORDER BY sb DESC, cid) AS rb
      FROM sc),
    f AS (
      SELECT qid, cid, ra, rb,
             row_number() OVER (
               PARTITION BY qid
               ORDER BY 1.0 / (60 + ra) + 1.0 / (60 + rb) DESC, cid) AS rf
      FROM r)
    SELECT qid,
           CAST(min(CASE WHEN ra = 1 THEN cid END) AS BIGINT) AS top1_a,
           CAST(min(CASE WHEN rb = 1 THEN cid END) AS BIGINT) AS top1_b,
           CAST(min(CASE WHEN rf = 1 THEN cid END) AS BIGINT) AS top1_fused,
           CAST(min(CASE WHEN rf = 1 THEN ra END) AS BIGINT)
             AS fused_rank_in_a,
           CAST(min(CASE WHEN rf = 1 THEN rb END) AS BIGINT)
             AS fused_rank_in_b
    FROM f GROUP BY qid
    """,
)
def q350_rrf_rank_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion of two retrieval systems (cosine over the
    front half of the embedding vs the back half — two cheap independent
    views of one index): per probe, the top-1 under each system and
    under RRF (k=60), with the fused pick's rank in each source list —
    the standard eval for 'does fusion beat either retriever'. RRF is a
    pure function of INTEGER ranks, so the fused ordering is exact on
    both engines regardless of float fold. The probe slice is adaptive
    (~25 probes at any corpus size) and scoring is a per x n x d
    dim-join — linear, never pairwise; ranks ride the distributed rank
    frame, not a corpus-sized window partition."""
    scored = _probe_scores(spark, sf_dir, "halves", 32)
    from etl_jetro_spark.operators.retrieval import (
        rank_channels,
        rrf as rrf_score,
    )

    # both channel ranks in ONE distributed rank pass (r11) — the
    # separate per-channel passes plus their (qid, cid) re-join paid
    # the rank machinery's fixed costs twice
    r = rank_channels(scored, {"sa": "ra", "sb": "rb"})
    fused = r.select(
        "qid", "cid", "ra", "rb", rrf_score("ra", "rb", k=60).alias("rrf")
    )
    f = _rank_frame(fused, "rrf", "rf").join(r, ["qid", "cid"])
    return f.groupBy("qid").agg(
        F.min(F.when(F.col("ra") == 1, F.col("cid"))).cast("long").alias("top1_a"),
        F.min(F.when(F.col("rb") == 1, F.col("cid"))).cast("long").alias("top1_b"),
        F.min(F.when(F.col("rf") == 1, F.col("cid"))).cast("long").alias("top1_fused"),
        F.min(F.when(F.col("rf") == 1, F.col("ra"))).cast("long").alias("fused_rank_in_a"),
        F.min(F.when(F.col("rf") == 1, F.col("rb"))).cast("long").alias("fused_rank_in_b"),
    )


@query(
    "q351_rerank_recall_tradeoff",
    f"""
    WITH {_probe_scores_sql("c.i <= 16", "TRUE")},
    r AS (
      SELECT qid, cid,
             row_number() OVER (PARTITION BY qid ORDER BY sa DESC, cid) AS rp,
             row_number() OVER (PARTITION BY qid ORDER BY sb DESC, cid) AS rt
      FROM sc),
    ks(k1) AS (VALUES (5), (10), (20)),
    per AS (
      SELECT r.qid, ks.k1,
             sum(CASE WHEN rt <= 5 AND rp <= ks.k1 THEN 1 ELSE 0 END) / 5.0
               AS recall5
      FROM r CROSS JOIN ks GROUP BY 1, 2)
    SELECT CAST(k1 AS BIGINT) AS stage1_depth,
           CAST(count(*) AS BIGINT) AS n_probes,
           round(avg(recall5), 6) AS avg_recall_at_5,
           round(min(recall5), 6) AS worst_recall_at_5
    FROM per GROUP BY k1
    """,
)
def q351_rerank_recall_tradeoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rerank-budget tradeoff: stage-1 retrieves top-k1 by a cheap
    16-dim prefix cosine, stage-2 reranks those k1 by full-dim cosine
    (the cross-encoder stand-in — deterministic, so the oracle can
    mirror it). Because the reranker ranks by the SAME score as the
    ground truth, recall@5 after rerank is exactly |full-top5 ∩
    prefix-topk1| / 5 — reported per stage-1 depth k1 ∈ {{5,10,20}}
    as the 'how much candidate budget buys how much recall' curve.
    Integer-rank arithmetic end-to-end; adaptive ~25-probe slice keeps
    the scoring linear in the corpus at a fixed constant."""
    scored = _probe_scores(spark, sf_dir, "prefix", 16)
    from etl_jetro_spark.operators.retrieval import rank_channels

    # one stacked rank pass for both channels (r11; see q350)
    r = rank_channels(scored, {"sa": "rp", "sb": "rt"})
    ks = spark.createDataFrame([(5,), (10,), (20,)], ["k1"])
    per = (
        r.crossJoin(bcast_small(ks))
        .groupBy("qid", "k1")
        .agg(
            (
                F.sum(
                    ((F.col("rt") <= 5) & (F.col("rp") <= F.col("k1"))).cast(
                        "long"
                    )
                )
                / 5.0
            ).alias("recall5")
        )
    )
    return per.groupBy(F.col("k1").cast("long").alias("stage1_depth")).agg(
        F.count(F.lit(1)).cast("long").alias("n_probes"),
        F.round(F.avg("recall5"), 6).alias("avg_recall_at_5"),
        F.round(F.min("recall5"), 6).alias("worst_recall_at_5"),
    )


@query(
    "q352_retrieval_label_ndcg",
    f"""
    WITH {_probe_scores_sql("c.i <= 16", "TRUE")},
    lbl AS (SELECT vec_id, label FROM embeddings),
    rel AS (
      SELECT sc.qid, sc.cid, sc.sa, sc.sb,
             CASE WHEN lq.label = lc.label THEN 1 ELSE 0 END AS rel
      FROM sc JOIN lbl lq ON lq.vec_id = sc.qid
              JOIN lbl lc ON lc.vec_id = sc.cid),
    r AS (
      SELECT qid, rel,
             row_number() OVER (PARTITION BY qid ORDER BY sa DESC, cid) AS rp,
             row_number() OVER (PARTITION BY qid ORDER BY sb DESC, cid) AS rt
      FROM rel),
    dcg AS (
      SELECT qid,
             sum(CASE WHEN rp <= 10 THEN rel / log2(rp + 1.0) ELSE 0 END)
               AS dcg_prefix,
             sum(CASE WHEN rt <= 10 THEN rel / log2(rt + 1.0) ELSE 0 END)
               AS dcg_full,
             CAST(sum(rel) AS BIGINT) AS n_rel
      FROM r GROUP BY qid),
    ideal AS (
      SELECT d.qid,
             sum(1.0 / log2(g.i + 1.0)) AS idcg
      FROM dcg d JOIN (SELECT unnest(generate_series(1, 10)) AS i) g
        ON g.i <= least(10, d.n_rel)
      GROUP BY d.qid)
    SELECT CAST(count(*) AS BIGINT) AS n_probes,
           round(avg(d.dcg_prefix / i.idcg), 6) AS avg_ndcg10_prefix,
           round(avg(d.dcg_full / i.idcg), 6)   AS avg_ndcg10_full,
           round(avg(d.dcg_full / i.idcg) - avg(d.dcg_prefix / i.idcg), 6)
             AS full_dim_gain
    FROM dcg d JOIN ideal i ON i.qid = d.qid
    WHERE d.n_rel > 0
    """,
)
def q352_retrieval_label_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-relevance NDCG@10 of the cheap 16-dim prefix retriever vs
    the full-dim retriever: binary relevance = candidate shares the
    probe's label; the gain column is the measured retrieval value of
    the back 48 dims — the number that decides whether the cheap index
    is good enough to serve. IDCG comes from a 10-row series joined on
    least(10, n_rel), so every float in the metric is assembled from
    integer ranks and counts by one identical expression per engine.
    Probes adaptive (~25), scoring linear in the corpus."""
    scored = _probe_scores(spark, sf_dir, "prefix", 16)
    lbl = load(spark, sf_dir, "embeddings").select("vec_id", "label")
    rel = (
        scored.join(
            bcast_sized(lbl.select(F.col("vec_id").alias("qid"),
                                   F.col("label").alias("_lq"))), "qid"
        )
        .join(
            lbl.select(F.col("vec_id").alias("cid"),
                       F.col("label").alias("_lc")), "cid"
        )
        .select(
            "qid", "cid", "sa", "sb",
            (F.col("_lq") == F.col("_lc")).cast("long").alias("rel"),
        )
    )
    from etl_jetro_spark.operators.retrieval import rank_channels

    # one stacked rank pass for both channels (r11; see q350)
    rr = rank_channels(rel, {"sa": "rp", "sb": "rt"})
    r = rel.select("qid", "cid", "rel").join(rr, ["qid", "cid"])
    dcg = r.groupBy("qid").agg(
        F.sum(
            F.when(F.col("rp") <= 10, F.col("rel") / F.log2(F.col("rp") + 1.0))
            .otherwise(0.0)
        ).alias("dcg_prefix"),
        F.sum(
            F.when(F.col("rt") <= 10, F.col("rel") / F.log2(F.col("rt") + 1.0))
            .otherwise(0.0)
        ).alias("dcg_full"),
        F.sum("rel").cast("long").alias("n_rel"),
    )
    series = spark.range(1, 11).select(F.col("id").alias("i"))
    ideal = (
        dcg.select("qid", "n_rel")
        .join(bcast_small(series), F.col("i") <= F.least(F.lit(10), F.col("n_rel")))
        .groupBy("qid")
        .agg(F.sum(1.0 / F.log2(F.col("i") + 1.0)).alias("idcg"))
    )
    return (
        dcg.filter(F.col("n_rel") > 0)
        .join(ideal, "qid")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_probes"),
            F.round(F.avg(F.col("dcg_prefix") / F.col("idcg")), 6).alias(
                "avg_ndcg10_prefix"
            ),
            F.round(F.avg(F.col("dcg_full") / F.col("idcg")), 6).alias(
                "avg_ndcg10_full"
            ),
            F.round(
                F.avg(F.col("dcg_full") / F.col("idcg"))
                - F.avg(F.col("dcg_prefix") / F.col("idcg")),
                6,
            ).alias("full_dim_gain"),
        )
    )


_SQL_WORDS = (
    "string_split(trim(regexp_replace(regexp_replace(lower(text), "
    "'[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g')), ' ')"
)


@query(
    "q353_source_overlap_matrix",
    f"""
    WITH wrds AS (SELECT doc_id, source, {_SQL_WORDS} AS w FROM documents),
    sh AS (
      SELECT DISTINCT source, array_to_string(w[i:i+2], ' ') AS sh
      FROM wrds,
           UNNEST(generate_series(1, greatest(len(w) - 2, 0))) AS t(i)),
    tot AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY 1),
    shared AS (
      SELECT a.source AS src_a, b.source AS src_b,
             CAST(count(*) AS BIGINT) AS n_shared
      FROM sh a JOIN sh b ON a.sh = b.sh AND a.source < b.source
      GROUP BY 1, 2)
    SELECT s.src_a, s.src_b, s.n_shared,
           ta.n AS n_a, tb.n AS n_b,
           round(s.n_shared
                 / CAST(ta.n + tb.n - s.n_shared AS DOUBLE), 6) AS jaccard
    FROM shared s
    JOIN tot ta ON ta.source = s.src_a
    JOIN tot tb ON tb.source = s.src_b
    """,
)
def q353_source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source-pair contamination matrix at the word-trigram level:
    distinct shared trigrams and trigram-set Jaccard for every unordered
    source pair — the cross-source duplication map a corpus curator
    reads before assigning mixture weights (ADVICE r9 family: per-source
    overlap matrices). The pair space is #sources², never corpus-sized:
    the (source, trigram) frame is deduped FIRST (one shuffle), and the
    trigram-keyed self-join fans out at most #sources rows per trigram.
    Shingles ride shingle_rows (codegen explode, zero pre-shuffle)."""
    from etl_jetro_spark.operators.dedup import shingle_rows

    d = load(spark, sf_dir, "documents")
    sh = (
        shingle_rows(d, "doc_id", "text", n=3, distinct=False)
        .join(d.select(F.col("doc_id").alias("_id"), "source"), "_id")
        .select("source", "_sh")
        .distinct()
    )
    tot = sh.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("n"))
    a = sh.select(F.col("source").alias("src_a"), "_sh")
    b = sh.select(F.col("source").alias("src_b"), "_sh")
    shared = (
        a.join(b, "_sh")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
    )
    return (
        shared.join(
            bcast_small(tot.select(F.col("source").alias("src_a"),
                                   F.col("n").alias("n_a"))), "src_a"
        )
        .join(
            bcast_small(tot.select(F.col("source").alias("src_b"),
                                   F.col("n").alias("n_b"))), "src_b"
        )
        .select(
            "src_a", "src_b", "n_shared", "n_a", "n_b",
            F.round(
                F.col("n_shared")
                / (F.col("n_a") + F.col("n_b") - F.col("n_shared")).cast(
                    "double"
                ),
                6,
            ).alias("jaccard"),
        )
    )


@query(
    "q354_source_uniqueness_audit",
    f"""
    WITH wrds AS (SELECT doc_id, source, {_SQL_WORDS} AS w FROM documents),
    sh AS (
      SELECT DISTINCT source, array_to_string(w[i:i+2], ' ') AS sh
      FROM wrds,
           UNNEST(generate_series(1, greatest(len(w) - 2, 0))) AS t(i)),
    tot AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY 1),
    leak AS (
      SELECT a.source,
             CAST(count(DISTINCT a.sh) AS BIGINT) AS n_leaked
      FROM sh a JOIN sh b ON a.sh = b.sh AND a.source <> b.source
      GROUP BY 1),
    pair AS (
      SELECT a.source AS src, b.source AS other,
             CAST(count(*) AS BIGINT) AS n_shared
      FROM sh a JOIN sh b ON a.sh = b.sh AND a.source <> b.source
      GROUP BY 1, 2),
    top AS (
      SELECT src, other, n_shared,
             row_number() OVER (PARTITION BY src
                                ORDER BY n_shared DESC, other) AS rn
      FROM pair)
    SELECT tot.source,
           tot.n AS n_trigrams,
           coalesce(leak.n_leaked, 0) AS n_shared_any,
           round(coalesce(leak.n_leaked, 0) / CAST(tot.n AS DOUBLE), 6)
             AS shared_frac,
           top.other    AS top_overlap_source,
           top.n_shared AS top_overlap_count
    FROM tot
    LEFT JOIN leak ON leak.source = tot.source
    LEFT JOIN top  ON top.src = tot.source AND top.rn = 1
    """,
)
def q354_source_uniqueness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source uniqueness: how much of a source's distinct trigram
    vocabulary appears in ANY other source, and which single other
    source overlaps it most — the directional readout that says 'this
    feed is a rebrand of that one' (the argmax column) next to q353's
    symmetric matrix. Same linear shingle plan; the cross-source join
    fans out at most #sources per trigram; the argmax window runs on
    the #sources²-row pair frame."""
    from pyspark.sql import Window

    from etl_jetro_spark.operators.dedup import shingle_rows

    d = load(spark, sf_dir, "documents")
    sh = (
        shingle_rows(d, "doc_id", "text", n=3, distinct=False)
        .join(d.select(F.col("doc_id").alias("_id"), "source"), "_id")
        .select("source", "_sh")
        .distinct()
    )
    tot = sh.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("n_trigrams"))
    a = sh.select(F.col("source").alias("src"), "_sh")
    b = sh.select(F.col("source").alias("other"), "_sh")
    cross = a.join(b, "_sh").filter(F.col("src") != F.col("other"))
    leak = (
        cross.select("src", "_sh")
        .distinct()
        .groupBy("src")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared_any"))
    )
    pair = cross.groupBy("src", "other").agg(
        F.count(F.lit(1)).cast("long").alias("n_shared")
    )
    w = Window.partitionBy("src").orderBy(
        F.col("n_shared").desc(), F.col("other")
    )
    top = (
        pair.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "src",
            F.col("other").alias("top_overlap_source"),
            F.col("n_shared").alias("top_overlap_count"),
        )
    )
    return (
        tot.withColumnRenamed("source", "_src")
        .join(leak, F.col("_src") == leak["src"], "left")
        .drop("src")
        .join(bcast_small(top), F.col("_src") == top["src"], "left")
        .drop("src")
        .select(
            F.col("_src").alias("source"),
            "n_trigrams",
            F.coalesce("n_shared_any", F.lit(0)).alias("n_shared_any"),
            F.round(
                F.coalesce("n_shared_any", F.lit(0))
                / F.col("n_trigrams").cast("double"),
                6,
            ).alias("shared_frac"),
            "top_overlap_source",
            "top_overlap_count",
        )
    )


@query(
    "q355_eval_contamination_depth",
    f"""
    WITH h AS (
      SELECT doc_id,
             ((strpos('0123456789abcdef',
                      substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 1))
               - 1) % 2) = 0 AS is_eval
      FROM documents),
    wrds AS (SELECT doc_id, {_SQL_WORDS} AS w FROM documents),
    sh AS (
      SELECT DISTINCT doc_id, array_to_string(w[i:i+4], ' ') AS sh
      FROM wrds,
           UNNEST(generate_series(1, greatest(len(w) - 4, 0))) AS t(i)),
    train_sh AS (
      SELECT DISTINCT sh.sh
      FROM sh JOIN h USING (doc_id) WHERE NOT h.is_eval),
    ev AS (
      SELECT sh.doc_id, sh.sh,
             CASE WHEN t.sh IS NOT NULL THEN 1 ELSE 0 END AS hit
      FROM sh JOIN h USING (doc_id)
      LEFT JOIN train_sh t ON t.sh = sh.sh
      WHERE h.is_eval),
    depth AS (
      SELECT doc_id,
             sum(hit) / CAST(count(*) AS DOUBLE) AS d
      FROM ev GROUP BY doc_id),
    binned AS (
      SELECT CASE WHEN d = 0 THEN 'clean'
                  WHEN d < 0.25 THEN 'lo'
                  WHEN d < 0.75 THEN 'mid'
                  ELSE 'hi' END AS bin, d
      FROM depth)
    SELECT bin,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(avg(d), 6) AS avg_depth
    FROM binned GROUP BY bin
    """,
)
def q355_eval_contamination_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train→eval contamination DEPTH distribution: a deterministic md5
    half-split plays train vs eval; per eval doc, the fraction of its
    distinct 5-gram shingles that appear anywhere in train, bucketed
    into clean / <25% / <75% / ≥75% bins — the graded readout one level
    past q72's binary decontamination verdict (a doc 3% contaminated
    and one 90% contaminated need different treatment). The train set
    collapses to DISTINCT shingles before the probe join (one shuffle
    each side, shingle-keyed equi-join, never pairwise); the md5 split
    reuses q62's engine-portable hash idiom."""
    from etl_jetro_spark.functions.hashing import norm_text  # noqa: F401
    from etl_jetro_spark.operators.dedup import shingle_rows

    d = load(spark, sf_dir, "documents")
    is_eval = (
        F.conv(F.substring(F.md5(F.concat(F.lit("split:"),
                                          F.col("doc_id").cast("string"))), 1, 1),
               16, 10).cast("long") % 2 == 0
    )
    h = d.select(F.col("doc_id").alias("_id"), is_eval.alias("is_eval"))
    sh = shingle_rows(d, "doc_id", "text", n=5, distinct=True).join(h, "_id")
    train_sh = (
        sh.filter(~F.col("is_eval")).select("_sh").distinct()
        .withColumn("_hit", F.lit(1))
    )
    ev = (
        sh.filter(F.col("is_eval"))
        .join(train_sh, "_sh", "left")
        .select("_id", F.coalesce("_hit", F.lit(0)).alias("hit"))
    )
    depth = ev.groupBy("_id").agg(
        (F.sum("hit") / F.count(F.lit(1)).cast("double")).alias("d")
    )
    bin_ = (
        F.when(F.col("d") == 0, "clean")
        .when(F.col("d") < 0.25, "lo")
        .when(F.col("d") < 0.75, "mid")
        .otherwise("hi")
    )
    return depth.groupBy(bin_.alias("bin")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.round(F.avg("d"), 6).alias("avg_depth"),
    )


@query(
    "q356_dedup_ttl_hit_rates",
    """
    WITH e AS (
      SELECT user_id, event_type, event_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS s
      FROM events),
    g AS (
      SELECT s - lag(s) OVER (PARTITION BY user_id, event_type
                              ORDER BY s, event_id) AS gap
      FROM e),
    ttls(ttl) AS (VALUES (60), (600), (3600))
    SELECT CAST(ttl AS BIGINT) AS ttl_s,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CASE WHEN gap IS NOT NULL AND gap <= ttl
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_hits,
           round(sum(CASE WHEN gap IS NOT NULL AND gap <= ttl
                          THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE), 6)
             AS hit_rate
    FROM g CROSS JOIN ttls
    GROUP BY ttl
    """,
)
def q356_dedup_ttl_hit_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming-dedup TTL sizing: if a (user, event_type) key's state
    entry lives TTL seconds past its last event, what fraction of
    events would be suppressed as duplicates? Swept for TTL ∈ {60 s,
    10 min, 1 h} — the hit-rate-vs-state-cost curve that picks the
    watermark for a `dropDuplicatesWithinWatermark` job. The per-key
    gap is ONE lag window partitioned by key (one hash exchange, local
    sorts — the q208 sessionization shape); the TTL sweep is a 3-row
    broadcast cross join over the already-computed gaps, so the corpus
    is scanned once no matter how many TTLs are audited."""
    from pyspark.sql import Window

    e = load_events(spark, sf_dir).select(
        "user_id",
        "event_type",
        "event_id",
        (F.col("ts") / F.lit(1_000_000_000)).cast("long").alias("s"),
    )
    w = Window.partitionBy("user_id", "event_type").orderBy("s", "event_id")
    g = e.select((F.col("s") - F.lag("s").over(w)).alias("gap"))
    ttls = spark.createDataFrame([(60,), (600,), (3600,)], ["ttl"])
    hit = (F.col("gap").isNotNull() & (F.col("gap") <= F.col("ttl"))).cast(
        "long"
    )
    return (
        g.crossJoin(bcast_small(ttls))
        .groupBy(F.col("ttl").cast("long").alias("ttl_s"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(hit).cast("long").alias("n_dup_hits"),
            F.round(
                F.sum(hit) / F.count(F.lit(1)).cast("double"), 6
            ).alias("hit_rate"),
        )
    )


@query(
    "q357_dedup_state_peak",
    """
    WITH e AS (
      SELECT user_id, event_type, event_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS s
      FROM events),
    g AS (
      SELECT user_id, event_type, s, event_id,
             CASE WHEN lag(s) OVER w IS NULL OR s - lag(s) OVER w > 600
                  THEN 1 ELSE 0 END AS brk
      FROM e WINDOW w AS (PARTITION BY user_id, event_type
                          ORDER BY s, event_id)),
    iv0 AS (
      SELECT user_id, event_type, s,
             sum(brk) OVER (PARTITION BY user_id, event_type
                            ORDER BY s, event_id
                            ROWS UNBOUNDED PRECEDING) AS iid
      FROM g),
    iv AS (
      SELECT user_id, event_type, iid,
             min(s) AS s0, max(s) + 600 AS s1
      FROM iv0 GROUP BY 1, 2, 3),
    pts AS (
      SELECT s0 AS t, 1 AS delta FROM iv
      UNION ALL
      SELECT s1 AS t, -1 AS delta FROM iv),
    sweep AS (
      SELECT t, sum(delta) AS d FROM pts GROUP BY t),
    run AS (
      SELECT t, sum(d) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS live
      FROM sweep)
    SELECT CAST((SELECT count(DISTINCT (user_id, event_type)) FROM iv)
                AS BIGINT) AS n_keys,
           CAST((SELECT count(*) FROM iv) AS BIGINT) AS n_admissions,
           CAST((SELECT sum(s1 - s0) FROM iv) AS BIGINT)
             AS state_seconds,
           CAST(max(live) AS BIGINT) AS peak_live_state
    FROM run
    """,
)
def q357_dedup_state_peak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-state capacity audit at TTL = 600 s: per-key live intervals
    [event, last-event + TTL) are MERGED (a new interval starts only
    when the gap exceeds the TTL — the q208 break-flag idiom), then a
    +1/-1 boundary sweep over the merged intervals yields the PEAK
    number of simultaneously live state entries — the number that sizes
    executor state memory for the streaming dedup operator. Admissions
    and state-seconds are interval-frame aggregates. The global running
    sum runs over the boundary frame COLLAPSED to distinct timestamps
    (bounded by the time horizon, not the corpus) via the q232
    distributed-cumsum idiom: range partition + local window + bounded
    per-partition offsets."""
    from pyspark.sql import Window

    e = load_events(spark, sf_dir).select(
        "user_id",
        "event_type",
        "event_id",
        (F.col("ts") / F.lit(1_000_000_000)).cast("long").alias("s"),
    )
    wk = Window.partitionBy("user_id", "event_type").orderBy("s", "event_id")
    g = e.withColumn(
        "brk",
        F.when(
            F.lag("s").over(wk).isNull()
            | ((F.col("s") - F.lag("s").over(wk)) > 600),
            1,
        ).otherwise(0),
    )
    iv0 = g.withColumn(
        "iid",
        F.sum("brk").over(wk.rowsBetween(Window.unboundedPreceding, 0)),
    )
    iv = iv0.groupBy("user_id", "event_type", "iid").agg(
        F.min("s").alias("s0"), (F.max("s") + 600).alias("s1")
    )
    stats = iv.agg(
        F.countDistinct("user_id", "event_type").cast("long").alias("n_keys"),
        F.count(F.lit(1)).cast("long").alias("n_admissions"),
        F.sum(F.col("s1") - F.col("s0")).cast("long").alias("state_seconds"),
    )
    pts = iv.select(F.col("s0").alias("t"), F.lit(1).alias("delta")).unionAll(
        iv.select(F.col("s1").alias("t"), F.lit(-1).alias("delta"))
    )
    sweep = pts.groupBy("t").agg(F.sum("delta").alias("d"))
    nparts = max(spark.sparkContext.defaultParallelism, 8)
    base = (
        sweep.repartitionByRange(nparts, "t")
        .sortWithinPartitions("t")
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    wl = (
        Window.partitionBy("_pid")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    loc = base.select("_pid", "t", F.sum("d").over(wl).alias("ld"))
    pidtot = base.groupBy("_pid").agg(F.sum("d").alias("td"))
    woff = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, 0)
    off = pidtot.select(
        "_pid", (F.sum("td").over(woff) - F.col("td")).alias("od")
    )
    peak = (
        loc.join(bcast_small(off), "_pid")
        .agg(F.max(F.col("ld") + F.col("od")).cast("long").alias("peak_live_state"))
    )
    return stats.crossJoin(peak).select(
        "n_keys", "n_admissions", "state_seconds", "peak_live_state"
    )


@query(
    "q358_ttl_eviction_scaling",
    """
    WITH e AS (
      SELECT user_id, event_type, event_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS s
      FROM events),
    g AS (
      SELECT s - lag(s) OVER (PARTITION BY user_id, event_type
                              ORDER BY s, event_id) AS gap
      FROM e),
    keys AS (
      SELECT CAST(count(DISTINCT (user_id, event_type)) AS BIGINT) AS nk
      FROM e),
    ttls(ttl) AS (VALUES (60), (600), (3600))
    SELECT CAST(ttl AS BIGINT) AS ttl_s,
           keys.nk AS n_keys,
           CAST(sum(CASE WHEN gap IS NULL OR gap > ttl THEN 1 ELSE 0 END)
                AS BIGINT) AS n_admissions,
           CAST(sum(CASE WHEN gap IS NULL OR gap > ttl THEN 1 ELSE 0 END)
                AS BIGINT) AS n_evictions,
           round(sum(CASE WHEN gap IS NULL OR gap > ttl THEN 1 ELSE 0 END)
                 / CAST(keys.nk AS DOUBLE), 6) AS readmissions_per_key,
           CAST(sum(CASE WHEN gap IS NOT NULL AND gap <= ttl THEN gap
                         ELSE ttl END) AS BIGINT) AS state_seconds
    FROM g CROSS JOIN ttls CROSS JOIN keys
    GROUP BY ttl, keys.nk
    """,
)
def q358_ttl_eviction_scaling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TTL eviction economics, swept for TTL ∈ {60 s, 10 min, 1 h}:
    admissions (= evictions — every admitted entry expires exactly
    once), re-admission pressure per key, and total state-seconds,
    derived in CLOSED FORM from the per-key gap frame — an event
    extends the live interval by min(gap, TTL), an over-TTL gap closes
    one interval and admits another, so no interval frame needs
    materializing per TTL. One lag window over the corpus; the sweep is
    a 3-row cross join. Read next to q357 (exact peak at one TTL) and
    q356 (hit rates): together they are the sizing sheet for the
    streaming dedup operator's state store."""
    from pyspark.sql import Window

    e = load_events(spark, sf_dir).select(
        "user_id",
        "event_type",
        "event_id",
        (F.col("ts") / F.lit(1_000_000_000)).cast("long").alias("s"),
    )
    w = Window.partitionBy("user_id", "event_type").orderBy("s", "event_id")
    g = e.select((F.col("s") - F.lag("s").over(w)).alias("gap"))
    nk = e.agg(
        F.countDistinct("user_id", "event_type").cast("long").alias("nk")
    )
    ttls = spark.createDataFrame([(60,), (600,), (3600,)], ["ttl"])
    admit = (F.col("gap").isNull() | (F.col("gap") > F.col("ttl"))).cast("long")
    state_inc = F.when(
        F.col("gap").isNotNull() & (F.col("gap") <= F.col("ttl")), F.col("gap")
    ).otherwise(F.col("ttl"))
    return (
        g.crossJoin(bcast_small(ttls))
        .crossJoin(bcast_small(nk))
        .groupBy(F.col("ttl").cast("long").alias("ttl_s"), F.col("nk"))
        .agg(
            F.sum(admit).cast("long").alias("n_admissions"),
            F.sum(admit).cast("long").alias("n_evictions"),
            F.round(F.sum(admit) / F.col("nk").cast("double"), 6).alias(
                "readmissions_per_key"
            ),
            F.sum(state_inc).cast("long").alias("state_seconds"),
        )
        .select(
            "ttl_s",
            F.col("nk").alias("n_keys"),
            "n_admissions",
            "n_evictions",
            "readmissions_per_key",
            "state_seconds",
        )
    )


@query(
    "q359_quantized_top1_agreement",
    f"""
    WITH {_probe_scores_sql("TRUE", "TRUE")},
    e2 AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
                  CAST(unnest(embedding) AS DOUBLE) AS x
           FROM embeddings),
    scl AS (SELECT vec_id, max(abs(x)) / 127.0 AS scale
            FROM e2 GROUP BY vec_id),
    dq AS (
      SELECT e2.vec_id, e2.i,
             CAST(round(CASE WHEN scl.scale > 0 THEN e2.x / scl.scale
                             ELSE 0 END) AS BIGINT) AS qi
      FROM e2 JOIN scl USING (vec_id)),
    qn AS (SELECT vec_id, CAST(sum(qi * qi) AS BIGINT) AS n2
           FROM dq GROUP BY vec_id),
    md2 AS (SELECT greatest(5, CAST(ceil(count(*) / 25.0) AS BIGINT)) AS m
            FROM embeddings),
    qs AS (
      SELECT q.vec_id AS qid, c.vec_id AS cid,
             CAST(sum(c.qi * q.qi) AS BIGINT) AS dotq
      FROM dq c
      JOIN (SELECT dq.* FROM dq CROSS JOIN md2
            WHERE dq.vec_id % md2.m = 0) q
        ON c.i = q.i AND c.vec_id <> q.vec_id
      GROUP BY 1, 2),
    sq AS (
      SELECT qs.qid, qs.cid,
             round(CAST(qs.dotq AS DOUBLE)
                   / sqrt(CAST(a.n2 * b.n2 AS DOUBLE)), 12) AS sq
      FROM qs JOIN qn a ON a.vec_id = qs.qid
              JOIN qn b ON b.vec_id = qs.cid
      WHERE a.n2 > 0 AND b.n2 > 0),
    rf AS (SELECT qid, cid, sa,
                  row_number() OVER (PARTITION BY qid
                                     ORDER BY sa DESC, cid) AS r
           FROM sc),
    rq AS (SELECT qid, cid,
                  row_number() OVER (PARTITION BY qid
                                     ORDER BY sq DESC, cid) AS r
           FROM sq)
    SELECT rf.qid,
           rf.cid AS top1_float,
           rq.cid AS top1_int8,
           CAST(CASE WHEN rf.cid = rq.cid THEN 1 ELSE 0 END AS BIGINT)
             AS agree,
           round(rf.sa, 4) AS float_top1_cos
    FROM rf JOIN rq ON rq.qid = rf.qid AND rq.r = 1
    WHERE rf.r = 1
    """,
)
def q359_quantized_top1_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Does int8 quantization change retrieval answers? Per probe, the
    top-1 neighbor under full-precision cosine vs cosine over the
    DEQUANTIZED int8 vectors (per-vector symmetric scale = max|x|/127,
    the q71 scheme) — the go/no-go audit before shipping a quantized
    index. Quantized values are reconstructed with one identical
    expression per engine (round-to-int is exact, scale is a
    deterministic per-vector scalar), so both rank frames are engine-
    portable. Probes adaptive (~25), both scoring passes linear in the
    corpus; ranks on the distributed rank frame."""
    scored = _probe_scores(spark, sf_dir, "prefix", 64)
    emb = load(spark, sf_dir, "embeddings")
    import math

    m = max(5, math.ceil(emb.count() / 25.0))
    e2 = emb.select(
        "vec_id", F.posexplode("embedding").alias("i0", "xf")
    ).select(
        "vec_id",
        (F.col("i0") + 1).alias("i"),
        F.col("xf").cast("double").alias("x"),
    )
    scl = e2.groupBy("vec_id").agg(
        (F.max(F.abs(F.col("x"))) / 127.0).alias("scale")
    )
    # INTEGER quantized coordinates: the per-vector positive scale
    # cancels in cosine, so the whole quantized score is exact integer
    # arithmetic until one final division - fold-order-free on both
    # engines (the dequantized-float form gave identical duplicate
    # candidates ulp-different dots at sf3 and broke top-1 ties on
    # noise; sf3 oracle gate catch)
    dq = (
        e2.join(scl, "vec_id")
        .select(
            "vec_id",
            "i",
            F.round(
                F.when(
                    F.col("scale") > 0, F.col("x") / F.col("scale")
                ).otherwise(0.0)
            )
            .cast("long")
            .alias("qi"),
        )
    )
    qn = dq.groupBy("vec_id").agg(
        F.sum(F.col("qi") * F.col("qi")).cast("long").alias("n2")
    )
    qprobe = dq.filter(F.col("vec_id") % m == 0).select(
        F.col("vec_id").alias("_qid"),
        F.col("i").alias("_qi"),
        F.col("qi").alias("_qx"),
    )
    qs = (
        dq.join(
            bcast_sized(qprobe),
            (F.col("i") == F.col("_qi"))
            & (F.col("vec_id") != F.col("_qid")),
        )
        .groupBy(F.col("_qid").alias("qid"), F.col("vec_id").alias("cid"))
        .agg(F.sum(F.col("qi") * F.col("_qx")).cast("long").alias("dotq"))
    )
    sq = (
        qs.join(
            bcast_sized(
                qn.select(F.col("vec_id").alias("qid"), F.col("n2").alias("qa"))
            ),
            "qid",
        )
        .join(
            qn.select(F.col("vec_id").alias("cid"), F.col("n2").alias("qb")),
            "cid",
        )
        .filter((F.col("qa") > 0) & (F.col("qb") > 0))
        .select(
            "qid",
            "cid",
            F.round(
                F.col("dotq").cast("double")
                / F.sqrt((F.col("qa") * F.col("qb")).cast("double")),
                12,
            ).alias("sq"),
        )
    )
    # top-1 per probe via min(struct(-score, cid)) — lexicographic min
    # is exactly the (score DESC, cid ASC) rank-1 row, including the
    # 12 dp-rounded exact ties, in ONE partial-aggregating exchange;
    # the previous full distributed rank frame + filter(r == 1) paid
    # the whole rank machinery twice to keep one row per probe (r11)
    def _top1(df, score, out):
        return (
            df.groupBy("qid")
            .agg(
                F.min(
                    F.struct(
                        (-F.col(score)).alias("_ns"),
                        F.col("cid").alias("cid"),
                    )
                ).alias("_t")
            )
            .select(
                "qid",
                F.col("_t.cid").alias(out),
                (-F.col("_t._ns")).alias(score),
            )
        )

    rf = _top1(scored.select("qid", "cid", "sa"), "sa", "top1_float")
    rq = _top1(sq, "sq", "top1_int8")
    return (
        rf.select("qid", "top1_float", "sa")
        .join(rq.select("qid", "top1_int8"), "qid")
        .select(
            "qid",
            "top1_float",
            "top1_int8",
            (F.col("top1_float") == F.col("top1_int8"))
            .cast("long")
            .alias("agree"),
            F.round("sa", 4).alias("float_top1_cos"),
        )
    )


@query(
    "q360_label_centroid_confusion",
    """
    WITH e AS (SELECT vec_id, label, generate_subscripts(embedding, 1) AS i,
                      CAST(unnest(embedding) AS DOUBLE) AS x
               FROM embeddings),
    cent AS (SELECT label AS clab, i, avg(x) AS m FROM e GROUP BY 1, 2),
    cn AS (SELECT clab, sqrt(sum(m * m)) AS nc FROM cent GROUP BY 1),
    vn AS (SELECT vec_id, sqrt(sum(x * x)) AS nv FROM e GROUP BY 1),
    s AS (
      SELECT e.vec_id, e.label, cent.clab,
             sum(e.x * cent.m) AS dot
      FROM e JOIN cent ON cent.i = e.i
      GROUP BY 1, 2, 3),
    sc AS (
      SELECT s.vec_id, s.label, s.clab,
             round(s.dot / (vn.nv * cn.nc), 12) AS cos
      FROM s JOIN vn USING (vec_id) JOIN cn USING (clab)
      WHERE vn.nv > 0 AND cn.nc > 0),
    pick AS (
      SELECT vec_id, label, clab AS pred
      FROM (SELECT vec_id, label, clab,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY cos DESC, clab) AS rn
            FROM sc)
      WHERE rn = 1)
    SELECT CAST(label AS BIGINT) AS true_label,
           CAST(pred AS BIGINT)  AS pred_label,
           CAST(count(*) AS BIGINT) AS n
    FROM pick GROUP BY 1, 2
    """,
)
def q360_label_centroid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-centroid label confusion matrix: each vector is assigned
    to the label centroid with highest cosine (deterministic label-asc
    tiebreak) and tallied against its true label — the one-pass
    'are these labels even linearly separable' diagnostic run before
    training a classifier on the embeddings. Centroids are a
    (label x dim) aggregate (enum-bounded, broadcast back); assignment
    is n x #labels x d — linear in the corpus; no window, no pairwise
    join anywhere."""
    emb = load(spark, sf_dir, "embeddings")
    e = emb.select(
        "vec_id", "label", F.posexplode("embedding").alias("i0", "xf")
    ).select(
        "vec_id",
        "label",
        (F.col("i0") + 1).alias("i"),
        F.col("xf").cast("double").alias("x"),
    )
    cent = e.groupBy(F.col("label").alias("clab"), "i").agg(
        F.avg("x").alias("m")
    )
    cn = cent.groupBy("clab").agg(F.sqrt(F.sum(F.col("m") * F.col("m"))).alias("nc"))
    vn = e.groupBy("vec_id").agg(F.sqrt(F.sum(F.col("x") * F.col("x"))).alias("nv"))
    s = (
        e.join(bcast_small(cent.withColumnRenamed("i", "_ci")),
               F.col("i") == F.col("_ci"))
        .groupBy("vec_id", "label", "clab")
        .agg(F.sum(F.col("x") * F.col("m")).alias("dot"))
    )
    sc = (
        s.join(vn, "vec_id")
        .join(bcast_small(cn), "clab")
        .filter((F.col("nv") > 0) & (F.col("nc") > 0))
        .select(
            "vec_id",
            "label",
            "clab",
            # 12 dp round-before-rank: dot and the centroid mean are
            # partial-agg folds whose order differs per engine, and the
            # argmax below must not decide on that noise (ranklint)
            F.round(F.col("dot") / (F.col("nv") * F.col("nc")), 12).alias(
                "cos"
            ),
        )
    )
    pick = sc.groupBy("vec_id", "label").agg(
        F.min_by(
            F.col("clab"), F.struct(-F.col("cos"), F.col("clab"))
        ).alias("pred")
    )
    return pick.groupBy(
        F.col("label").cast("long").alias("true_label"),
        F.col("pred").cast("long").alias("pred_label"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))


# --------------------------------------------------------------------------
# 35. Round-10 wave 2: evaluation & calibration analytics
#     (operators/evalstats.py) — score calibration (Brier/ECE), paired
#     classifier tests (McNemar, Cochran Q), multiple-testing control,
#     conformal coverage, embedding-geometry diagnostics
# --------------------------------------------------------------------------

_DK_QFEAT = f"""feat AS (
      SELECT doc_id, text,
             CAST(len(text) AS BIGINT) AS n_chars,
             CAST(CASE WHEN trim(text) = '' THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS INT) AS n_tokens,
             len(regexp_replace(text, '[^.,;:!?''"()\\[\\]-]', '', 'g')) AS n_punct,
             len(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digit,
             len(list_filter(string_split({DK_NORM_TEXT}, ' '),
                             x -> list_contains({_dk_stop_list('en')}, x))) AS n_stop
      FROM documents
    ),
    scored AS (
      SELECT doc_id, md5({DK_NORM_TEXT.replace('text', 'feat.text')}) AS fp,
             round(least(n_tokens / 20.0, 1.0) * 0.4
                   + (1 - least(CAST(n_punct AS DOUBLE) / n_chars * 2
                                + CAST(n_digit AS DOUBLE) / n_chars * 2, 1.0)) * 0.3
                   + least(CAST(n_stop AS DOUBLE) / n_tokens * 4, 1.0) * 0.3, 6)
               AS q
      FROM feat WHERE n_chars > 0 AND n_tokens > 0
    ),
    dup AS (
      SELECT fp, CAST(count(*) AS BIGINT) AS grp FROM scored GROUP BY 1
    ),
    """


def _q361_oracle() -> str:
    from etl_jetro_spark.operators.evalstats import brier_decomposition_sql

    return brier_decomposition_sql(
        """SELECT CAST(round(s.q * 1000000) AS BIGINT) AS p6,
                  CASE WHEN d.grp = 1 THEN 1 ELSE 0 END AS y
           FROM scored s JOIN dup d USING (fp)""",
        pre_ctes=_DK_QFEAT,
    )


@query("q361_quality_brier_decomposition", None)
def q361_quality_brier_decomposition(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Murphy decomposition of the composite quality score (q24/q345)
    read as a probabilistic forecast that a document is EXACT-DUP-FREE
    (q17's normalized-md5 fingerprint): Brier score, reliability,
    resolution, uncertainty over ten fixed-width probability bins, plus
    the expected calibration error — the "can I trust this score as a
    keep-probability" audit run before spending a 100 TB filter pass
    (q345 shows the decile curve; this is the one-row decision scalar).

    Exactness at scale: the score is 6-dp-quantized, so every moment
    (raw Brier numerator, ECE numerator, per-bin sums) is an exact
    integer carried as DECIMAL(38,0)/HUGEINT; only the 10-term bin
    combine runs in double (bounded count — static-wobble class). Scale
    shape: one fingerprint shuffle + one 10-group aggregate, both
    data-linear; zero windows over data."""
    from etl_jetro_spark.functions.hashing import norm_text
    from etl_jetro_spark.operators import evalstats as ES

    d = load(spark, sf_dir, "documents")
    scored = (
        O.quality_score(d, "text")
        .filter((F.col("q_n_chars") > 0) & (F.col("q_n_tokens") > 0))
        .select(
            "doc_id",
            F.md5(norm_text("text")).alias("fp"),
            F.col("quality_score").alias("q"),
        )
        # freeze the narrow frame: TWO consumers below (dup counts + the
        # join back) must not re-run — nor CollapseProject-inline — the
        # regex-heavy score/norm projections (the q145/q345 lesson;
        # measured 12.9 -> 7.2 s at sf1)
        .localCheckpoint(eager=False)
    )
    dup = scored.groupBy("fp").agg(F.count(F.lit(1)).cast("long").alias("grp"))
    rows = scored.join(dup, "fp").select(
        F.round(F.col("q") * 1000000).cast("long").alias("p6"),
        (F.col("grp") == 1).cast("int").alias("y"),
    )
    return ES.brier_decomposition(rows, "p6", "y", n_bins=10)


ORACLES["q361_quality_brier_decomposition"] = _q361_oracle()


@query(
    "q363_langid_mcnemar",
    f"""
    WITH hits AS (
      SELECT doc_id, lang,
             len(list_filter(string_split({DK_NORM_TEXT}, ' '),
                             x -> list_contains({_dk_stop_list('en')}, x))) AS h_en,
             len(list_filter(string_split({DK_NORM_TEXT}, ' '),
                             x -> list_contains({_dk_stop_list('es')}, x))) AS h_es,
             len(list_filter(string_split({DK_NORM_TEXT}, ' '),
                             x -> list_contains({_dk_stop_list('de')}, x))) AS h_de,
             len(list_filter(string_split({DK_NORM_TEXT}, ' '),
                             x -> list_contains({_dk_stop_list('fr')}, x))) AS h_fr
      FROM documents
    ),
    pred AS (
      SELECT lang AS declared,
             CASE
               WHEN greatest(h_en, h_es, h_de, h_fr) = 0 THEN 'und'
               WHEN h_en = greatest(h_en, h_es, h_de, h_fr) THEN 'en'
               WHEN h_es = greatest(h_en, h_es, h_de, h_fr) THEN 'es'
               WHEN h_de = greatest(h_en, h_es, h_de, h_fr) THEN 'de'
               ELSE 'fr'
             END AS predicted
      FROM hits
    ),
    maj AS (
      SELECT lang AS mlang
      FROM (SELECT lang, count(*) AS c FROM documents GROUP BY 1
            ORDER BY c DESC, lang LIMIT 1)
    ),
    paired AS (
      SELECT CASE WHEN declared = predicted THEN 1 ELSE 0 END AS a,
             CASE WHEN declared = (SELECT mlang FROM maj) THEN 1 ELSE 0 END AS b
      FROM pred
    ),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN a = 1 AND b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_both,
             CAST(sum(CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_only_a,
             CAST(sum(CASE WHEN a = 0 AND b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_only_b,
             CAST(sum(CASE WHEN a = 0 AND b = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_neither
      FROM paired
    )
    SELECT n, n_both, n_only_a, n_only_b, n_neither,
           CASE WHEN n_only_a + n_only_b > 0 THEN
             round(CAST((abs(n_only_a - n_only_b) - 1)
                        * (abs(n_only_a - n_only_b) - 1) AS DOUBLE)
                   / CAST(n_only_a + n_only_b AS DOUBLE), 6)
           END AS chi2
    FROM agg
    """,
)
def q363_langid_mcnemar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's paired test (continuity-corrected): is the stopword
    lang-id heuristic (q25/q261) more accurate against the declared
    label than the majority-class baseline (predict the corpus's most
    common language, ties lang-asc)? Discordant pairs only carry the
    signal — the textbook way to compare two classifiers evaluated on
    the SAME documents, where the naive two-proportion z overstates
    significance by ignoring the pairing. Accuracy indicators are
    exact integers; the single division happens after all counts.
    Detection is partition-local regex work (no shuffle before the
    one 5-counter aggregate); the baseline is a 1-row broadcast."""
    from etl_jetro_spark.operators import evalstats as ES

    d = load(spark, sf_dir, "documents")
    pred = d.select(
        F.col("lang").alias("declared"), O.lang_id("text").alias("predicted")
    )
    maj = (
        d.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(
            F.min_by(
                F.col("lang"), F.struct(-F.col("c"), F.col("lang"))
            ).alias("mlang")
        )
    )
    paired = pred.crossJoin(bcast_small(maj)).select(
        (F.col("declared") == F.col("predicted")).alias("ca"),
        (F.col("declared") == F.col("mlang")).alias("cb"),
    )
    return ES.mcnemar(paired, F.col("ca"), F.col("cb"))


@query(
    "q364_quality_gates_cochran_q",
    """
    WITH g AS (
      SELECT CASE WHEN n_chars BETWEEN 200 AND 2000 THEN 1 ELSE 0 END AS g0,
             CASE WHEN len(regexp_replace(text, '[^0-9]', '', 'g')) <= 5
                  THEN 1 ELSE 0 END AS g1,
             CASE WHEN (CASE WHEN trim(text) = '' THEN 0
                        ELSE len(regexp_split_to_array(trim(text), '\\s+'))
                        END) >= 30 THEN 1 ELSE 0 END AS g2
      FROM documents),
    r AS (SELECT g0, g1, g2, g0 + g1 + g2 AS rr FROM g),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(g0) AS BIGINT) AS s0,
             CAST(sum(g1) AS BIGINT) AS s1,
             CAST(sum(g2) AS BIGINT) AS s2,
             CAST(sum(rr) AS BIGINT) AS sr,
             CAST(sum(rr * rr) AS BIGINT) AS sr2
      FROM r)
    SELECT n,
           round(s0 / CAST(n AS DOUBLE), 6) AS rate_g0,
           round(s1 / CAST(n AS DOUBLE), 6) AS rate_g1,
           round(s2 / CAST(n AS DOUBLE), 6) AS rate_g2,
           CASE WHEN 3 * sr - sr2 > 0 THEN
             round(CAST(2 * (3 * (CAST(s0 AS HUGEINT) * s0
                                  + CAST(s1 AS HUGEINT) * s1
                                  + CAST(s2 AS HUGEINT) * s2)
                             - CAST(s0 + s1 + s2 AS HUGEINT)
                               * (s0 + s1 + s2)) AS DOUBLE)
                   / CAST(3 * sr - sr2 AS DOUBLE), 6)
           END AS q_stat,
           CAST(2 AS BIGINT) AS dof
    FROM agg
    """,
)
def q364_quality_gates_cochran_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran's Q across three paired binary quality gates (length
    sweet spot, low digit noise, minimum token count) applied to every
    document — "do these gates differ in pass rate on the same corpus,
    or are they interchangeable filters?" The k-sample generalization
    of McNemar; rejecting means the gates encode genuinely different
    criteria and a curator cannot drop one as redundant. Every moment
    (per-gate totals, per-row pass counts and their squares) is an
    exact integer with DECIMAL(38,0)/HUGEINT guards on the squared
    column totals; one final division. One partition-local pass, one
    6-counter aggregate — no shuffle beyond the partial-agg combine."""
    from etl_jetro_spark.operators import evalstats as ES
    from etl_jetro_spark.operators.textstats import token_count

    d = load(spark, sf_dir, "documents")
    return ES.cochran_q(
        d,
        [
            F.col("n_chars").between(200, 2000),
            F.length(F.regexp_replace("text", "[^0-9]", "")) <= 5,
            token_count("text") >= 30,
        ],
    )


def _q362_oracle() -> str:
    from etl_jetro_spark.operators.evalstats import two_sided_p_sql

    return f"""
    WITH per AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS n,
             sum(CAST(n_chars AS HUGEINT)) AS s1,
             sum(CAST(n_chars AS HUGEINT) * n_chars) AS s2
      FROM documents GROUP BY source),
    tot AS (
      SELECT CAST(sum(n) AS BIGINT) AS tn,
             sum(s1) AS ts1,
             sum(s2) AS ts2
      FROM per),
    d AS (
      SELECT source, n,
             CAST(n AS DOUBLE) AS ns, CAST(s1 AS DOUBLE) AS s1s,
             CAST(s2 AS DOUBLE) AS s2s,
             CAST(tn - n AS DOUBLE) AS nr, CAST(ts1 - s1 AS DOUBLE) AS s1r,
             CAST(ts2 - s2 AS DOUBLE) AS s2r
      FROM per CROSS JOIN tot),
    zs AS (
      SELECT source, n,
             (s1s / ns - s1r / nr)
               / sqrt((s2s - s1s * s1s / ns) / (ns - 1) / ns
                      + (s2r - s1r * s1r / nr) / (nr - 1) / nr) AS z
      FROM d),
    ps AS (
      SELECT source, n, z,
             round({two_sided_p_sql('z')}, 12) AS p12
      FROM zs),
    ranked AS (
      SELECT source, n, z, p12,
             row_number() OVER (ORDER BY p12, source) AS p_rank,
             count(*) OVER () AS m
      FROM ps),
    dec AS (
      SELECT source, n, z, p12, p_rank, m,
             CASE WHEN p12 <= 0.05 * p_rank / m THEN 1 ELSE 0 END AS bh_ok,
             CASE WHEN p12 <= 0.05 / (m - p_rank + 1) THEN 1 ELSE 0 END
               AS holm_ok
      FROM ranked),
    k AS (
      SELECT source, n, z, p12, p_rank, m,
             max(CASE WHEN bh_ok = 1 THEN p_rank END) OVER () AS bh_k,
             min(holm_ok) OVER (ORDER BY p_rank
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS holm_all
      FROM dec)
    SELECT source,
           CAST(n AS BIGINT) AS n_docs,
           round(z, 6) AS z,
           round(p12, 8) AS p_value,
           CAST(p_rank AS BIGINT) AS p_rank,
           CAST(m AS BIGINT) AS m,
           CAST(CASE WHEN coalesce(p_rank <= bh_k, false) THEN 1 ELSE 0 END
                AS BIGINT) AS bh_reject,
           CAST(CASE WHEN holm_all = 1 THEN 1 ELSE 0 END AS BIGINT)
             AS holm_reject
    FROM k
    """


@query("q362_source_length_fdr", None)
def q362_source_length_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document-length anomaly audit with multiple-testing
    control: for each source, a Welch z two-sample test of its n_chars
    mean against all other sources, then Benjamini-Hochberg (FDR) and
    Holm (FWER) decisions at alpha = 0.05 across the 20-hypothesis
    family (operators/evalstats.bh_holm) — the correction a platform
    MUST apply when it screens hundreds of sources, or ~5% of healthy
    sources get flagged by chance.

    Portability: z is derived purely from integer sums via one fixed
    +,-,*,/,sqrt sequence (correctly-rounded IEEE ops — bit-identical
    cross-engine); the only non-correctly-rounded primitive is exp()
    inside the A&S normal CDF, absorbed by the 12 dp round BEFORE
    ranking, so BH/Holm decide on identical values. Scale shape: one
    partial-agg pass over documents; everything after is
    #sources-bounded (the one global window is metadata-sized)."""
    from etl_jetro_spark.operators import evalstats as ES

    d = load(spark, sf_dir, "documents")
    # decimal(38,0) accumulators (the q385 pattern): a long SUM of
    # n_chars^2 wraps silently at ~4e18 — reachable at 100 TB — while
    # the DuckDB oracle sums BIGINT into exact HUGEINT (ADVICE r10)
    nc = F.col("n_chars").cast("decimal(38,0)")
    per = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(nc).alias("s1"),
        F.sum(nc * nc).alias("s2"),
    )
    tot = per.agg(
        F.sum("n").cast("long").alias("tn"),
        F.sum("s1").alias("ts1"),
        F.sum("s2").alias("ts2"),
    )
    dd = per.crossJoin(bcast_small(tot)).select(
        "source",
        "n",
        F.col("n").cast("double").alias("ns"),
        F.col("s1").cast("double").alias("s1s"),
        F.col("s2").cast("double").alias("s2s"),
        (F.col("tn") - F.col("n")).cast("double").alias("nr"),
        (F.col("ts1") - F.col("s1")).cast("double").alias("s1r"),
        (F.col("ts2") - F.col("s2")).cast("double").alias("s2r"),
    )
    ns, s1s, s2s = F.col("ns"), F.col("s1s"), F.col("s2s")
    nr, s1r, s2r = F.col("nr"), F.col("s1r"), F.col("s2r")
    z = (s1s / ns - s1r / nr) / F.sqrt(
        (s2s - s1s * s1s / ns) / (ns - F.lit(1)) / ns
        + (s2r - s1r * s1r / nr) / (nr - F.lit(1)) / nr
    )
    ps = dd.select(
        "source",
        "n",
        z.alias("z"),
        F.round(ES.two_sided_p(z), 12).alias("p12"),
    )
    out = ES.bh_holm(ps, ["source"], "p12", alpha=0.05)
    return out.select(
        "source",
        F.col("n").cast("long").alias("n_docs"),
        F.round("z", 6).alias("z"),
        F.round("p12", 8).alias("p_value"),
        F.col("p_rank").cast("long").alias("p_rank"),
        F.col("m").cast("long").alias("m"),
        F.col("bh_reject").cast("long").alias("bh_reject"),
        F.col("holm_reject").cast("long").alias("holm_reject"),
    )


ORACLES["q362_source_length_fdr"] = _q362_oracle()


@query(
    "q368_conformal_length_coverage",
    """
    WITH hb AS (
      SELECT source, CAST(n_chars AS BIGINT) AS v,
             ((strpos('0123456789abcdef', substr(hx, 1, 1)) - 1) * 268435456
            + (strpos('0123456789abcdef', substr(hx, 2, 1)) - 1) * 16777216
            + (strpos('0123456789abcdef', substr(hx, 3, 1)) - 1) * 1048576
            + (strpos('0123456789abcdef', substr(hx, 4, 1)) - 1) * 65536
            + (strpos('0123456789abcdef', substr(hx, 5, 1)) - 1) * 4096
            + (strpos('0123456789abcdef', substr(hx, 6, 1)) - 1) * 256
            + (strpos('0123456789abcdef', substr(hx, 7, 1)) - 1) * 16
            + (strpos('0123456789abcdef', substr(hx, 8, 1)) - 1)) % 2 AS bkt
      FROM (SELECT source, n_chars,
                   md5('conf:' || CAST(doc_id AS VARCHAR)) AS hx
            FROM documents)),
    calib AS (SELECT source, v FROM hb WHERE bkt = 0),
    tst AS (SELECT source, v FROM hb WHERE bkt = 1),
    ranked AS (
      SELECT source, v,
             row_number() OVER (PARTITION BY source ORDER BY v) AS rn,
             count(*) OVER (PARTITION BY source) AS n
      FROM calib),
    alphas AS (SELECT unnest([1, 2]) AS a),
    qh AS (
      SELECT r.source, al.a, r.n AS n_cal, r.v AS q_hat,
             CASE WHEN ((r.n + 1) * (10 - al.a) + 9) // 10 > r.n
                  THEN 1 ELSE 0 END AS inf_bound
      FROM ranked r CROSS JOIN alphas al
      WHERE r.rn = least(((r.n + 1) * (10 - al.a) + 9) // 10, r.n)),
    cov AS (
      SELECT q.source, q.a, q.n_cal, q.q_hat, q.inf_bound,
             CAST(count(*) AS BIGINT) AS n_test,
             CAST(sum(CASE WHEN q.inf_bound = 1 OR t.v <= q.q_hat
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_cov
      FROM qh q JOIN tst t ON t.source = q.source
      GROUP BY q.source, q.a, q.n_cal, q.q_hat, q.inf_bound)
    SELECT source,
           CAST(a AS BIGINT) AS alpha_tenths,
           CAST(n_cal AS BIGINT) AS n_cal,
           n_test,
           CASE WHEN inf_bound = 0 THEN q_hat END AS q_hat,
           round(CAST(n_cov AS DOUBLE) / n_test, 6) AS coverage,
           round((10 - a) / 10.0, 6) AS target
    FROM cov
    """,
)
def q368_conformal_length_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal coverage audit per source: calibrate a one-sided
    upper bound on document length on a deterministic md5 half-split
    (doc_id parity correlates with source in this schema, so the split
    rides sampling.hash_bucket; the k-th smallest calibration score,
    k = ceil((n+1)(1-alpha)) in EXACT integer arithmetic —
    operators/evalstats.conformal_upper), then measures empirical
    coverage on the held-out half for alpha in {0.1, 0.2}.
    Finite-sample distribution-free coverage is the guarantee a serving
    pipeline quotes when it truncates documents by a learned bound; the
    audit checks the guarantee actually holds per source. All decisions
    are integer order statistics (no float quantile lerp — the q133
    lesson by construction). Scale shape: the calibration rank rides
    group_ranked's range-partitioned sort; the per-(source, alpha)
    bound frame is metadata-sized and broadcast into the test join."""
    from etl_jetro_spark.operators import evalstats as ES
    from etl_jetro_spark.operators.sampling import hash_bucket

    d = load(spark, sf_dir, "documents").select(
        "source",
        F.col("n_chars").cast("long").alias("v"),
        hash_bucket("doc_id", 2, salt="conf:").alias("bkt"),
    )
    calib = d.filter(F.col("bkt") == 0).select("source", "v")
    tst = d.filter(F.col("bkt") == 1).select("source", "v")
    outs = []
    for a in (1, 2):
        bounds = ES.conformal_upper(calib, ["source"], "v", a).withColumn(
            "alpha_tenths", F.lit(a).cast("long")
        )
        cov = (
            tst.join(bcast_small(bounds), "source")
            .groupBy(
                "source", "alpha_tenths", "n_cal", "q_hat", "inf_bound"
            )
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_test"),
                F.sum(
                    (
                        F.col("inf_bound") | (F.col("v") <= F.col("q_hat"))
                    ).cast("long")
                )
                .cast("long")
                .alias("n_cov"),
            )
        )
        outs.append(cov)
    allc = outs[0].unionByName(outs[1])
    return allc.select(
        "source",
        "alpha_tenths",
        F.col("n_cal").cast("long").alias("n_cal"),
        "n_test",
        F.when(~F.col("inf_bound"), F.col("q_hat")).alias("q_hat"),
        F.round(F.col("n_cov").cast("double") / F.col("n_test"), 6).alias(
            "coverage"
        ),
        F.round(
            (F.lit(10) - F.col("alpha_tenths")) / F.lit(10.0), 6
        ).alias("target"),
    )


@query(
    "q371_source_shortdoc_eb_shrinkage",
    """
    WITH per AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN n_chars < 200 THEN 1 ELSE 0 END) AS BIGINT)
               AS k
      FROM documents GROUP BY source),
    mom AS (
      SELECT CAST(max(n) AS DOUBLE) AS nn,
             CAST(count(*) AS DOUBLE) AS s,
             CAST(sum(k) AS DOUBLE) AS sk,
             CAST(sum(k * k) AS DOUBLE) AS sk2
      FROM per),
    ab0 AS (
      SELECT nn, sk / (s * nn) AS pooled,
             nn * (sk2 / s / (sk / s) - sk / s - 1) + sk / s AS den,
             nn * (sk / s) - sk2 / s AS anum,
             (nn - sk / s) * (nn - sk2 / s / (sk / s)) AS bnum
      FROM mom
      WHERE sk > 0),
    ab AS (
      SELECT nn, pooled,
             CASE WHEN den > 0 AND anum / den > 0 AND bnum / den > 0
                  THEN 1 ELSE 0 END AS ok,
             anum / den AS ah, bnum / den AS bh
      FROM ab0)
    SELECT p.source,
           p.n AS n_docs,
           p.k AS k_short,
           round(CAST(p.k AS DOUBLE) / p.n, 6) AS raw_rate,
           round(CASE WHEN ab.ok = 1
                      THEN (ab.ah + p.k) / (ab.ah + ab.bh + ab.nn)
                      ELSE ab.pooled END, 6) AS shrunk_rate,
           CASE WHEN ab.ok = 1 THEN round(ab.ah, 6) END AS alpha_hat,
           CASE WHEN ab.ok = 1 THEN round(ab.bh, 6) END AS beta_hat
    FROM per p CROSS JOIN ab
    """,
)
def q371_source_shortdoc_eb_shrinkage(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Empirical-Bayes shrinkage of per-source short-document rates
    under a beta-binomial model fitted by method of moments (the
    equal-n design: every source contributes the same document count,
    which the driver's generator guarantees at every SF). A source with
    3/25 short docs should NOT be ranked by its raw 12% against a
    source at 2/25 — the EB posterior mean (alpha+k)/(alpha+beta+n)
    borrows strength across sources and shrinks small-sample extremes
    toward the corpus rate; this is the canonical fix for small-cell
    league tables in data-quality dashboards. When the family is UNDER-
    dispersed (between-source variance below binomial — the MoM
    denominator or an estimate goes non-positive) the model degenerates
    to zero between-source variance and the output falls back to
    complete pooling (shrunk = corpus rate, alpha/beta NULL). All
    moments are exact integer sums; the estimator is one fixed division
    sequence from them (identical doubles cross-engine).
    #sources-bounded after one partial-agg pass."""
    d = load(spark, sf_dir, "documents")
    per = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum((F.col("n_chars") < 200).cast("long")).cast("long").alias("k"),
    )
    mom = per.agg(
        F.max("n").cast("double").alias("nn"),
        F.count(F.lit(1)).cast("double").alias("s"),
        F.sum("k").cast("double").alias("sk"),
        F.sum(F.col("k") * F.col("k")).cast("double").alias("sk2"),
    ).filter(F.col("sk") > 0)
    nn, s, sk, sk2 = (F.col(c) for c in ("nn", "s", "sk", "sk2"))
    den = nn * (sk2 / s / (sk / s) - sk / s - F.lit(1)) + sk / s
    ab0 = mom.select(
        "nn",
        (sk / (s * nn)).alias("pooled"),
        den.alias("den"),
        (nn * (sk / s) - sk2 / s).alias("anum"),
        ((nn - sk / s) * (nn - sk2 / s / (sk / s))).alias("bnum"),
    )
    ab = ab0.select(
        "nn",
        "pooled",
        (
            (F.col("den") > 0)
            & (F.col("anum") / F.col("den") > 0)
            & (F.col("bnum") / F.col("den") > 0)
        )
        .cast("int")
        .alias("ok"),
        (F.col("anum") / F.col("den")).alias("ah"),
        (F.col("bnum") / F.col("den")).alias("bh"),
    )
    return per.crossJoin(bcast_small(ab)).select(
        "source",
        F.col("n").alias("n_docs"),
        F.col("k").alias("k_short"),
        F.round(F.col("k").cast("double") / F.col("n"), 6).alias("raw_rate"),
        F.round(
            F.when(
                F.col("ok") == 1,
                (F.col("ah") + F.col("k"))
                / (F.col("ah") + F.col("bh") + F.col("nn")),
            ).otherwise(F.col("pooled")),
            6,
        ).alias("shrunk_rate"),
        F.when(F.col("ok") == 1, F.round("ah", 6)).alias("alpha_hat"),
        F.when(F.col("ok") == 1, F.round("bh", 6)).alias("beta_hat"),
    )


@query(
    "q365_event_value_friedman",
    """
    WITH per AS (
      SELECT user_id, event_type,
             CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT)
               AS v6
      FROM events GROUP BY 1, 2),
    fullb AS (
      SELECT user_id FROM per GROUP BY user_id HAVING count(*) = 5),
    t AS (SELECT p.* FROM per p JOIN fullb USING (user_id)),
    ranked AS (
      SELECT user_id, event_type,
             2 * rank() OVER (PARTITION BY user_id ORDER BY v6)
               + count(*) OVER (PARTITION BY user_id, v6) - 1 AS r2
      FROM t),
    pert AS (
      SELECT event_type,
             CAST(sum(r2) AS HUGEINT) AS r2j,
             CAST(sum(CAST(r2 AS HUGEINT) * r2) AS HUGEINT) AS a4j,
             CAST(count(*) AS BIGINT) AS nblk
      FROM ranked GROUP BY 1),
    agg AS (
      SELECT max(nblk) AS n_blocks,
             sum((r2j - CAST(nblk AS HUGEINT) * 6)
                 * (r2j - CAST(nblk AS HUGEINT) * 6)) AS num,
             sum(a4j) AS a4
      FROM pert)
    SELECT CAST(n_blocks AS BIGINT) AS n_blocks,
           CAST(5 AS BIGINT) AS k_treatments,
           CASE WHEN a4 - CAST(n_blocks AS HUGEINT) * 5 * 36 > 0 THEN
             round(4.0 * CAST(num AS DOUBLE)
                   / CAST(a4 - CAST(n_blocks AS HUGEINT) * 5 * 36 AS DOUBLE),
                   6)
           END AS chi2,
           CAST(4 AS BIGINT) AS dof
    FROM agg
    """,
)
def q365_event_value_friedman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman's blocked rank test (tie-corrected): within each user
    that produced all five event types, rank the per-type total value
    and test whether the five types draw systematically different
    spend — the nonparametric repeated-measures ANOVA a platform runs
    across treatment arms evaluated on the SAME users (blocking removes
    between-user spend variance that a pooled Kruskal-Wallis would
    swallow). Row-level 1e-6 quantization makes every per-(user, type)
    total an exact integer, so ranks never sit on float fold noise;
    mid-ranks ride half-units (2r = 2*rank + ties - 1, an integer) and
    the statistic is exact integers until one final division
    (operators/evalstats.friedman). The rank window is 5-bounded and
    user-partitioned; reduction frames are #event-types-bounded."""
    from etl_jetro_spark.operators import evalstats as ES

    e = load_events(spark, sf_dir)
    per = e.groupBy("user_id", "event_type").agg(
        F.sum(F.round(F.col("value") * 1000000).cast("long"))
        .cast("long")
        .alias("v6")
    )
    return ES.friedman(per, "user_id", "event_type", "v6", k=5)


@query(
    "q372_purchase_sprt_evalue",
    """
    WITH daily AS (
      SELECT epoch_ns(ts) // 86400000000000 AS day,
             CAST(count(*) AS BIGINT) AS n_events,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_purchases
      FROM events GROUP BY 1),
    walk AS (
      SELECT day, n_events, n_purchases,
             CAST(sum(CAST(round((n_purchases * 0.04139268515822499
                 + (n_events - n_purchases) * -0.010995384301463193)
                 * 1000000000000.0) AS HUGEINT))
               OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW) AS DOUBLE) / 1000000000000.0
               AS log10_e_raw
      FROM daily)
    SELECT CAST(day AS BIGINT) AS day,
           n_events, n_purchases,
           round(log10_e_raw, 6) AS log10_e,
           CAST(CASE WHEN round(log10_e_raw, 9) >= 1.3010299956639813
                     THEN 1 ELSE 0 END AS BIGINT) AS crossed
    FROM walk
    """,
)
def q372_purchase_sprt_evalue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anytime-valid sequential test (SPRT e-process) of the daily
    purchase-conversion rate: H0 p=0.2 vs H1 p=0.22, one likelihood-
    ratio factor per day, cumulative log10 e-value and the
    'evidence crossed 1/alpha = 20' flag — the modern always-valid
    monitoring rule that lets a pipeline peek at a metric every day
    WITHOUT alpha inflation (classic fixed-horizon tests are invalid
    under continuous monitoring). The two per-day log-LR coefficients
    are Python-precomputed double literals embedded in BOTH engines
    (log10 is not correctly-rounded; embedding kills the 1-ulp seam),
    counts are exact integers, and the cumulative walk is a #days-
    bounded broadcast non-equi self-join (never a global window — the
    planlint contract). Each per-day term is quantized to an exact
    integer 1e-12 unit BEFORE accumulating (ADVICE r10: the self-join
    fold is otherwise order-arbitrary on Spark vs day-ordered on
    DuckDB, and the 'crossed' decision would consume a fold-dependent
    round), so the cumulative sum is associative-exact in any order and
    both engines divide the identical integer once at the end; the
    crossing decision compares the 9 dp-rounded walk to a literal. One
    partial-agg pass over events; everything after is
    calendar-bounded."""
    e = load_events(spark, sf_dir)
    daily = e.groupBy(
        F.expr("ts div 86400000000000").alias("day")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum((F.col("event_type") == "purchase").cast("long"))
        .cast("long")
        .alias("n_purchases"),
    )
    terms = daily.select(
        F.col("day").alias("_tday"),
        # quantize each day's log-LR contribution to exact 1e-12 units:
        # the double arithmetic up to here is the same two multiplies +
        # one add of identical literals on both engines (bit-identical),
        # and the integer units make the cumulative fold exact in ANY
        # accumulation order (ADVICE r10)
        F.round(
            (
                F.col("n_purchases") * F.lit(0.04139268515822499)
                + (F.col("n_events") - F.col("n_purchases"))
                * F.lit(-0.010995384301463193)
            )
            * F.lit(1000000000000.0)
        )
        .cast("decimal(38,0)")
        .alias("_term_q"),
    )
    walk = (
        daily.join(
            bcast_small(terms), F.col("_tday") <= F.col("day")  # bcast-ok: #days rows
        )
        .groupBy("day", "n_events", "n_purchases")
        .agg(
            (
                F.sum("_term_q").cast("double")
                / F.lit(1000000000000.0)
            ).alias("log10_e_raw")
        )
    )
    return walk.select(
        F.col("day").cast("long").alias("day"),
        "n_events",
        "n_purchases",
        F.round("log10_e_raw", 6).alias("log10_e"),
        (F.round("log10_e_raw", 9) >= F.lit(1.3010299956639813))
        .cast("long")
        .alias("crossed"),
    )


@query(
    "q370_watermark_lateness_audit",
    """
    WITH rm AS (
      SELECT event_id, epoch_ns(ts) AS tsn,
             max(epoch_ns(ts)) OVER (ORDER BY event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mx
      FROM events),
    late AS (SELECT mx - tsn AS lat FROM rm),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN lat > 0 THEN 1 ELSE 0 END) AS BIGINT) AS d0,
             CAST(sum(CASE WHEN lat > 60000000000 THEN 1 ELSE 0 END)
                  AS BIGINT) AS d60,
             CAST(sum(CASE WHEN lat > 300000000000 THEN 1 ELSE 0 END)
                  AS BIGINT) AS d300,
             CAST(sum(CASE WHEN lat > 900000000000 THEN 1 ELSE 0 END)
                  AS BIGINT) AS d900,
             CAST(sum(CASE WHEN lat > 3600000000000 THEN 1 ELSE 0 END)
                  AS BIGINT) AS d3600,
             CAST(sum(CASE WHEN lat > 21600000000000 THEN 1 ELSE 0 END)
                  AS BIGINT) AS d21600
      FROM late)
    SELECT t.delay_s, t.n_dropped, agg.n AS n_events,
           round(CAST(t.n_dropped AS DOUBLE) / agg.n, 6) AS dropped_frac
    FROM agg, LATERAL (VALUES
      (CAST(0 AS BIGINT), d0), (CAST(60 AS BIGINT), d60),
      (CAST(300 AS BIGINT), d300), (CAST(900 AS BIGINT), d900),
      (CAST(3600 AS BIGINT), d3600), (CAST(21600 AS BIGINT), d21600))
      AS t(delay_s, n_dropped)
    """,
)
def q370_watermark_lateness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-delay sizing audit: treating event_id as the arrival
    sequence, the per-row lateness is (max event-time seen so far) -
    (own event time) — exactly the quantity Structured Streaming's
    ``withWatermark`` compares against its delay threshold. For a grid
    of candidate delays (0 s to 6 h) the audit reports how many rows a
    streaming aggregation WOULD drop as too-late — the table an
    engineer reads to pick the delay before deploying the stream
    (SURVEY §2 T5's late/dup handling, quantified). The running max is
    the distributed two-pass sweep (operators/frontier.running_prefix_
    max — range-partition by arrival, partition-local window, metadata
    prefix; no single-task global window), lateness is exact integer
    nanoseconds, and the threshold histogram is one conditional
    aggregate, unpivoted to a 6-row grid."""
    from etl_jetro_spark.operators.frontier import running_prefix_max

    e = load_events(spark, sf_dir).select("event_id", "ts")
    rm = running_prefix_max(e, "event_id", "ts")
    late = rm.select((F.col("_runmax") - F.col("ts")).alias("lat"))
    grid_s = [0, 60, 300, 900, 3600, 21600]
    agg = late.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        *[
            F.sum((F.col("lat") > d * 1_000_000_000).cast("long"))
            .cast("long")
            .alias(f"d{d}")
            for d in grid_s
        ],
    )
    stack = ", ".join(f"{d}L, d{d}" for d in grid_s)
    return agg.select(
        F.expr(f"stack({len(grid_s)}, {stack}) AS (delay_s, n_dropped)"),
        F.col("n").alias("n_events"),
    ).select(
        "delay_s",
        "n_dropped",
        "n_events",
        F.round(F.col("n_dropped").cast("double") / F.col("n_events"), 6).alias(
            "dropped_frac"
        ),
    )


def _dk_qprefix(name: str, dims: int, units: float) -> str:
    """DuckDB CTE: first ``dims`` coordinates of every embedding,
    quantized to exact integers at ``units`` (mirror of
    operators/evalstats.quantized_prefix)."""
    return f"""{name} AS (
      SELECT vec_id AS _vid, i, CAST(round(x * {units}) AS BIGINT) AS xq
      FROM (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
                   CAST(unnest(embedding) AS DOUBLE) AS x
            FROM embeddings)
      WHERE i <= {dims})"""


@query(
    "q366_embedding_participation_ratio",
    f"""
    WITH {_dk_qprefix('e16', 16, 10000.0)},
    mom AS (
      SELECT a.i AS ii, b.i AS jj,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(a.xq AS HUGEINT) * b.xq) AS HUGEINT) AS sxy
      FROM e16 a JOIN e16 b ON a._vid = b._vid
      GROUP BY 1, 2),
    sums AS (SELECT i, CAST(sum(xq) AS HUGEINT) AS sx FROM e16 GROUP BY 1),
    nij AS (
      SELECT m.ii, m.jj, m.n,
             CAST(m.n AS HUGEINT) * m.sxy - sa.sx * sb.sx AS nv
      FROM mom m JOIN sums sa ON sa.i = m.ii JOIN sums sb ON sb.i = m.jj),
    agg AS (
      SELECT max(n) AS n,
             CAST(sum(CASE WHEN ii = jj THEN nv END) AS HUGEINT) AS trn,
             sum(CAST(nv AS DOUBLE) * CAST(nv AS DOUBLE)) AS sumsq
      FROM nij)
    SELECT CAST(n AS BIGINT) AS n_vectors,
           CAST(16 AS BIGINT) AS dims,
           round(CAST(trn AS DOUBLE)
                 / (CAST(n AS DOUBLE) * n * 100000000.0), 6) AS total_var,
           round(CAST(trn AS DOUBLE) * CAST(trn AS DOUBLE) / sumsq, 6)
             AS participation_ratio,
           round(CAST(trn AS DOUBLE) * CAST(trn AS DOUBLE) / sumsq / 16, 6)
             AS eff_dim_frac
    FROM agg
    """,
)
def q366_embedding_participation_ratio(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Effective dimensionality of the embedding space WITHOUT an
    eigendecomposition: the participation ratio PR = (tr C)^2 / tr(C^2)
    of the covariance of the first 16 coordinates (the Matryoshka
    prefix, q335's convention) — equal to (sum lambda)^2 / sum lambda^2
    over the eigenvalues, i.e. ~16 when variance is isotropic and ~1
    when one direction dominates; the collapse diagnostic a platform
    tracks before trusting ANN recall or cosine thresholds. tr(C^2) is
    the squared Frobenius norm, so the whole statistic needs only the
    16x16 second-moment grid: coordinates are quantized to exact
    integers at 1e-4 (operators/evalstats.quantized_prefix), every
    moment is an exact DECIMAL(38,0)/HUGEINT, the centered numerators
    N_ij = n*S_ij - S_i*S_j are exact integers IDENTICAL on both
    engines, and the n^2 normalization cancels in the ratio. Scale
    shape: one 256-fanout self-join reduced in a single shuffle;
    everything after is 256-bounded."""
    from etl_jetro_spark.operators import evalstats as ES

    emb = load(spark, sf_dir, "embeddings")
    e16 = ES.quantized_prefix(emb, "vec_id", "embedding", 16, 10000.0)
    m = ES.pair_moments(e16, e16)
    nij = m.select(
        "ii",
        "jj",
        "n",
        (
            F.col("n").cast("decimal(38,0)") * F.col("sxy")
            - F.col("sx") * F.col("sy")
        ).alias("nv"),
    )
    agg = nij.agg(
        F.max("n").alias("n"),
        F.sum(F.when(F.col("ii") == F.col("jj"), F.col("nv"))).alias("trn"),
        F.sum(F.col("nv").cast("double") * F.col("nv").cast("double")).alias(
            "sumsq"
        ),
    )
    trn_d = F.col("trn").cast("double")
    n_d = F.col("n").cast("double")
    return agg.select(
        F.col("n").cast("long").alias("n_vectors"),
        F.lit(16).cast("long").alias("dims"),
        F.round(trn_d / (n_d * n_d * F.lit(100000000.0)), 6).alias(
            "total_var"
        ),
        F.round(trn_d * trn_d / F.col("sumsq"), 6).alias(
            "participation_ratio"
        ),
        F.round(trn_d * trn_d / F.col("sumsq") / F.lit(16), 6).alias(
            "eff_dim_frac"
        ),
    )


@query(
    "q367_quantization_cka",
    f"""
    WITH {_dk_qprefix('ex', 8, 10000.0)},
    {_dk_qprefix('ey', 8, 100.0).lstrip()},
    momxy AS (
      SELECT a.i AS ii, b.i AS jj, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(a.xq AS HUGEINT) * b.xq) AS HUGEINT) AS sxy
      FROM ex a JOIN ey b ON a._vid = b._vid GROUP BY 1, 2),
    momxx AS (
      SELECT a.i AS ii, b.i AS jj, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(a.xq AS HUGEINT) * b.xq) AS HUGEINT) AS sxy
      FROM ex a JOIN ex b ON a._vid = b._vid GROUP BY 1, 2),
    momyy AS (
      SELECT a.i AS ii, b.i AS jj, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(a.xq AS HUGEINT) * b.xq) AS HUGEINT) AS sxy
      FROM ey a JOIN ey b ON a._vid = b._vid GROUP BY 1, 2),
    sx AS (SELECT i, CAST(sum(xq) AS HUGEINT) AS s FROM ex GROUP BY 1),
    sy AS (SELECT i, CAST(sum(xq) AS HUGEINT) AS s FROM ey GROUP BY 1),
    fro AS (
      SELECT 'xy' AS which, max(m.n) AS n,
             sum(CAST(CAST(m.n AS HUGEINT) * m.sxy - a.s * b.s AS DOUBLE)
                 * CAST(CAST(m.n AS HUGEINT) * m.sxy - a.s * b.s AS DOUBLE))
               AS f2
      FROM momxy m JOIN sx a ON a.i = m.ii JOIN sy b ON b.i = m.jj
      UNION ALL
      SELECT 'xx', max(m.n),
             sum(CAST(CAST(m.n AS HUGEINT) * m.sxy - a.s * b.s AS DOUBLE)
                 * CAST(CAST(m.n AS HUGEINT) * m.sxy - a.s * b.s AS DOUBLE))
      FROM momxx m JOIN sx a ON a.i = m.ii JOIN sx b ON b.i = m.jj
      UNION ALL
      SELECT 'yy', max(m.n),
             sum(CAST(CAST(m.n AS HUGEINT) * m.sxy - a.s * b.s AS DOUBLE)
                 * CAST(CAST(m.n AS HUGEINT) * m.sxy - a.s * b.s AS DOUBLE))
      FROM momyy m JOIN sy a ON a.i = m.ii JOIN sy b ON b.i = m.jj)
    SELECT CAST(max(n) AS BIGINT) AS n_vectors,
           CAST(8 AS BIGINT) AS dims,
           round(max(CASE WHEN which = 'xy' THEN f2 END)
                 / sqrt(max(CASE WHEN which = 'xx' THEN f2 END)
                        * max(CASE WHEN which = 'yy' THEN f2 END)), 6)
             AS cka
    FROM fro
    """,
)
def q367_quantization_cka(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear CKA (centered kernel alignment) between the full-
    precision embedding prefix (8 dims, 1e-4 quantization) and its
    COARSE 2-decimal counterpart — "does aggressive quantization
    preserve the feature geometry?" as one scalar in [0, 1]:
    CKA = ||Cxy||_F^2 / (||Cxx||_F ||Cyy||_F). The representation-
    similarity metric used to compare layers/models, here auditing a
    storage-precision decision. Every cross-moment grid is exact
    integers (operators/evalstats.pair_moments); the per-matrix
    quantization scales cancel exactly in the ratio, so the statistic
    measures geometry, not units. Three 64-fanout joins reduced in one
    shuffle each; everything after is 64-bounded."""
    from etl_jetro_spark.operators import evalstats as ES

    emb = load(spark, sf_dir, "embeddings")
    ex = ES.quantized_prefix(emb, "vec_id", "embedding", 8, 10000.0)
    ey = ES.quantized_prefix(emb, "vec_id", "embedding", 8, 100.0)
    fros = []
    for which, (ea, eb) in (
        ("xy", (ex, ey)),
        ("xx", (ex, ex)),
        ("yy", (ey, ey)),
    ):
        m = ES.pair_moments(ea, eb)
        fros.append(
            m.agg(
                F.max("n").alias("n"), ES.centered_gram_fro2(m).alias("f2")
            ).select(F.lit(which).alias("which"), "n", "f2")
        )
    fro = fros[0].unionByName(fros[1]).unionByName(fros[2])
    return fro.agg(
        F.max("n").cast("long").alias("n_vectors"),
        F.lit(8).cast("long").alias("dims"),
        F.round(
            F.max(F.when(F.col("which") == "xy", F.col("f2")))
            / F.sqrt(
                F.max(F.when(F.col("which") == "xx", F.col("f2")))
                * F.max(F.when(F.col("which") == "yy", F.col("f2")))
            ),
            6,
        ).alias("cka"),
    )


@query(
    "q369_label_davies_bouldin",
    f"""
    WITH {_dk_qprefix('e', 64, 10000.0)},
    lab AS (SELECT vec_id AS _vid, label FROM embeddings),
    el AS (SELECT e._vid, lab.label, e.i, e.xq FROM e JOIN lab USING (_vid)),
    csum AS (
      SELECT label, i, CAST(sum(xq) AS HUGEINT) AS sx,
             CAST(count(*) AS BIGINT) AS n
      FROM el GROUP BY 1, 2),
    pv AS (
      SELECT el._vid, el.label,
             CAST(sum((CAST(el.xq AS HUGEINT) * c.n - c.sx)
                      * (CAST(el.xq AS HUGEINT) * c.n - c.sx)) AS HUGEINT)
               AS ssq,
             max(c.n) AS n
      FROM el JOIN csum c ON c.label = el.label AND c.i = el.i
      GROUP BY 1, 2),
    s AS (
      SELECT label, max(n) AS n_members,
             round(avg(sqrt(CAST(ssq AS DOUBLE))
                       / (CAST(n AS DOUBLE) * 10000.0)), 9) AS s_intra
      FROM pv GROUP BY 1),
    m AS (
      SELECT a.label AS la, b.label AS lb,
             round(sqrt(CAST(sum((a.sx * b.n - b.sx * a.n)
                                 * (a.sx * b.n - b.sx * a.n)) AS DOUBLE))
                   / (CAST(max(a.n) AS DOUBLE) * max(b.n) * 10000.0), 9)
               AS dist
      FROM csum a JOIN csum b ON a.i = b.i AND a.label <> b.label
      GROUP BY 1, 2),
    ratio AS (
      SELECT m.la, m.lb, (sa.s_intra + sb.s_intra) / m.dist AS r
      FROM m JOIN s sa ON sa.label = m.la JOIN s sb ON sb.label = m.lb),
    pick AS (
      SELECT la, lb, r,
             row_number() OVER (PARTITION BY la ORDER BY r DESC, lb) AS rn
      FROM ratio)
    SELECT CAST(s.label AS BIGINT) AS label,
           s.n_members,
           round(s.s_intra, 6) AS s_intra,
           CAST(p.lb AS BIGINT) AS worst_other,
           round(p.r, 6) AS db_term
    FROM s JOIN pick p ON p.la = s.label AND p.rn = 1
    """,
)
def q369_label_davies_bouldin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Davies-Bouldin cluster-quality terms per label: S_i = mean
    Euclidean distance of members to their label centroid, M_ij =
    centroid separation, and per-label DB term = max_j (S_i + S_j) /
    M_ij with the offending neighbor — the "which labels smear into
    which" table read next to q295's silhouette and q360's confusion
    matrix before trusting the labels for training. Exactness: 1e-4
    quantized coordinates make every squared deviation an exact
    HUGEINT/DECIMAL(38,0) integer ((xq*n - Sx)^2 sums — no float ever
    reaches the aggregates); sqrt of identical integers is identical;
    the only fold-order float is the per-label member AVERAGE, rounded
    to 9 dp before the ratio/argmax so a last-ulp seam cannot flip the
    worst-neighbor pick (the q359 lesson). Scale shape: one broadcast
    centroid join + per-vector 64-group reduce (data-linear), then
    labels^2 x dims bounded frames."""
    from etl_jetro_spark.operators import evalstats as ES

    emb = load(spark, sf_dir, "embeddings")
    e = ES.quantized_prefix(emb, "vec_id", "embedding", 64, 10000.0)
    el = e.join(
        emb.select(F.col("vec_id").alias("_vid"), "label"), "_vid"
    )
    csum = el.groupBy("label", "i").agg(
        F.sum("xq").cast("decimal(38,0)").alias("sx"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    diff = F.col("xq").cast("decimal(38,0)") * F.col("n") - F.col("sx")
    pv = (
        el.join(bcast_small(csum), ["label", "i"])
        .groupBy("_vid", "label")
        .agg(F.sum(diff * diff).alias("ssq"), F.max("n").alias("n"))
    )
    s = pv.groupBy("label").agg(
        F.max("n").cast("long").alias("n_members"),
        F.round(
            F.avg(
                F.sqrt(F.col("ssq").cast("double"))
                / (F.col("n").cast("double") * F.lit(10000.0))
            ),
            9,
        ).alias("s_intra"),
    )
    a = csum.select(
        F.col("label").alias("la"), "i",
        F.col("sx").alias("sxa"), F.col("n").alias("na"),
    )
    b = csum.select(
        F.col("label").alias("lb"), "i",
        F.col("sx").alias("sxb"), F.col("n").alias("nb"),
    )
    cd = F.col("sxa") * F.col("nb") - F.col("sxb") * F.col("na")
    m = (
        a.join(b, "i")
        .filter(F.col("la") != F.col("lb"))
        .groupBy("la", "lb")
        .agg(
            F.round(
                F.sqrt(F.sum(cd * cd).cast("double"))
                / (
                    F.max("na").cast("double")
                    * F.max("nb")
                    * F.lit(10000.0)
                ),
                9,
            ).alias("dist")
        )
    )
    sa = s.select(F.col("label").alias("la"), F.col("s_intra").alias("si_a"))
    sb = s.select(F.col("label").alias("lb"), F.col("s_intra").alias("si_b"))
    ratio = (
        m.join(bcast_small(sa), "la")
        .join(bcast_small(sb), "lb")
        .select(
            "la", "lb",
            ((F.col("si_a") + F.col("si_b")) / F.col("dist")).alias("r"),
        )
    )
    pick = ratio.groupBy("la").agg(
        F.min_by(F.struct("lb", "r"), F.struct(-F.col("r"), F.col("lb"))).alias(
            "w"
        )
    )
    return (
        s.join(pick, s["label"] == pick["la"])
        .select(
            F.col("label").cast("long").alias("label"),
            "n_members",
            F.round("s_intra", 6).alias("s_intra"),
            F.col("w.lb").cast("long").alias("worst_other"),
            F.round(F.col("w.r"), 6).alias("db_term"),
        )
    )


_BENFORD_P = (
    ("1", "0.3010299956639812"),
    ("2", "0.17609125905568124"),
    ("3", "0.12493873660829992"),
    ("4", "0.09691001300805642"),
    ("5", "0.07918124604762482"),
    ("6", "0.06694678963061322"),
    ("7", "0.05799194697768673"),
    ("8", "0.05115252244738129"),
    ("9", "0.04575749056067514"),
)


@query(
    "q373_order_total_benford",
    f"""
    WITH bp(digit, p) AS (VALUES
      {", ".join(f"({d}, {p})" for d, p in _BENFORD_P)}),
    fd AS (
      SELECT CAST(substr(CAST({sql_cents('o_totalprice')} AS VARCHAR), 1, 1)
                  AS INT) AS digit
      FROM orders WHERE {sql_cents('o_totalprice')} > 0),
    obs AS (
      SELECT digit, CAST(count(*) AS BIGINT) AS n_obs FROM fd GROUP BY 1),
    g AS (
      SELECT bp.digit, bp.p, coalesce(obs.n_obs, 0) AS n_obs,
             sum(coalesce(obs.n_obs, 0)) OVER () AS n
      FROM bp LEFT JOIN obs ON obs.digit = bp.digit),
    t AS (
      SELECT digit, p, n_obs, n,
             (CAST(n_obs AS DOUBLE) - n * p) * (CAST(n_obs AS DOUBLE) - n * p)
               / (n * p) AS term
      FROM g)
    SELECT CAST(digit AS BIGINT) AS digit,
           n_obs,
           round(CAST(n_obs AS DOUBLE) / n, 6) AS obs_frac,
           round(p, 6) AS benford_p,
           round(sum(term) OVER (), 6) AS chi2,
           CAST(8 AS BIGINT) AS dof
    FROM t
    """,
)
def q373_order_total_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit of order totals: the observed first-
    digit distribution of o_totalprice (in exact integer cents — the
    first digit comes from the DECIMAL STRING, never from a floatable
    log10 whose boundary ulp could misbin powers of ten) against
    Benford's law, with the 8-df chi-square distance — the standard
    fabricated-data / generator-drift screen a platform runs over any
    numeric column it ingests. Expected digit probabilities are Python-
    precomputed literals shared by both engines; counts are exact; the
    chi-square combines 9 bounded terms (global scalars join back
    broadcast — never a global window, the planlint contract). One
    partial-agg pass over orders; everything after is 9-rows-bounded."""
    o = load(spark, sf_dir, "orders")
    cents = M.cents("o_totalprice")
    fd = o.select(cents.alias("c")).filter(F.col("c") > 0).select(
        F.substring(F.col("c").cast("string"), 1, 1).cast("int").alias("digit")
    )
    obs = fd.groupBy("digit").agg(F.count(F.lit(1)).cast("long").alias("n_obs"))
    bp = spark.createDataFrame(
        [(int(d), float(p)) for d, p in _BENFORD_P], "digit INT, p DOUBLE"
    )
    g0 = (
        bp.join(bcast_small(obs), "digit", "left")
        .select(
            "digit",
            "p",
            F.coalesce("n_obs", F.lit(0)).cast("long").alias("n_obs"),
        )
    )
    tot = g0.agg(F.sum("n_obs").cast("long").alias("n"))
    g = g0.crossJoin(bcast_small(tot))
    term = (
        (F.col("n_obs").cast("double") - F.col("n") * F.col("p"))
        * (F.col("n_obs").cast("double") - F.col("n") * F.col("p"))
        / (F.col("n") * F.col("p"))
    )
    t = g.withColumn("term", term)
    chi = t.agg(F.sum("term").alias("chi2t"))
    return t.crossJoin(bcast_small(chi)).select(
        F.col("digit").cast("long").alias("digit"),
        "n_obs",
        F.round(F.col("n_obs").cast("double") / F.col("n"), 6).alias(
            "obs_frac"
        ),
        F.round("p", 6).alias("benford_p"),
        F.round("chi2t", 6).alias("chi2"),
        F.lit(8).cast("long").alias("dof"),
    )


@query(
    "q374_group_kfold_balance",
    """
    WITH hb AS (
      SELECT user_id, event_type, value,
             ((strpos('0123456789abcdef', substr(hx, 1, 1)) - 1) * 268435456
            + (strpos('0123456789abcdef', substr(hx, 2, 1)) - 1) * 16777216
            + (strpos('0123456789abcdef', substr(hx, 3, 1)) - 1) * 1048576
            + (strpos('0123456789abcdef', substr(hx, 4, 1)) - 1) * 65536
            + (strpos('0123456789abcdef', substr(hx, 5, 1)) - 1) * 4096
            + (strpos('0123456789abcdef', substr(hx, 6, 1)) - 1) * 256
            + (strpos('0123456789abcdef', substr(hx, 7, 1)) - 1) * 16
            + (strpos('0123456789abcdef', substr(hx, 8, 1)) - 1)) % 5 AS fold
      FROM (SELECT user_id, event_type, value,
                   md5('fold:' || CAST(user_id AS VARCHAR)) AS hx
            FROM events))
    SELECT CAST(fold AS BIGINT) AS fold,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           round(CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                      AS DOUBLE) / count(*), 6) AS purchase_share,
           round(CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS DOUBLE)
                 / (1000000.0 * count(*)), 6) AS avg_value
    FROM hb GROUP BY fold
    """,
)
def q374_group_kfold_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped 5-fold cross-validation assignment + balance audit: folds
    are assigned by md5 hash of user_id (sampling.hash_bucket), so a
    user's events can NEVER straddle folds — the leakage-safe CV
    primitive for behavioral data (a random row split would leak user
    identity across train/test). The audit reports what a curator
    checks before trusting the folds: event and user counts, purchase
    share, and mean event value per fold (value totals ride exact 1e-6
    integer units). One hash pass + one 5-group aggregate; the count-
    distinct is Spark's two-stage partial distinct, never a collect."""
    from etl_jetro_spark.operators.sampling import hash_bucket

    e = load_events(spark, sf_dir)
    hb = e.select(
        "user_id",
        "event_type",
        "value",
        hash_bucket("user_id", 5, salt="fold:").alias("fold"),
    )
    return hb.groupBy(F.col("fold").cast("long").alias("fold")).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
        F.round(
            F.sum((F.col("event_type") == "purchase").cast("long")).cast(
                "double"
            )
            / F.count(F.lit(1)),
            6,
        ).alias("purchase_share"),
        F.round(
            # decimal(38,0) accumulator: a long SUM of 1e-6-unit values
            # wraps at ~4e12 value-units summed — the oracle's
            # sum(BIGINT) is exact HUGEINT (ADVICE r10, q385 pattern)
            F.sum(
                F.round(F.col("value") * 1000000).cast("decimal(38,0)")
            ).cast("double")
            / (F.lit(1000000.0) * F.count(F.lit(1))),
            6,
        ).alias("avg_value"),
    )


_RBO_W = (
    "0.23541639942571424",
    "0.13541639942571426",
    "0.09041639942571428",
    "0.06341639942571428",
    "0.045191399425714276",
    "0.03206939942571428",
    "0.022227899425714286",
    "0.014635885139999999",
    "0.008657173890000001",
    "0.00387420489",
)


@query(
    "q375_prefix_full_rbo",
    f"""
    WITH {_probe_scores_sql("c.i <= 16", "TRUE")},
    w(m, wt) AS (VALUES
      {", ".join(f"({m}, {w})" for m, w in enumerate(_RBO_W, 1))}),
    r AS (
      SELECT qid, cid,
             row_number() OVER (PARTITION BY qid ORDER BY sa DESC, cid) AS rp,
             row_number() OVER (PARTITION BY qid ORDER BY sb DESC, cid) AS rt
      FROM sc),
    mx AS (
      SELECT qid, greatest(rp, rt) AS m, CAST(count(*) AS BIGINT) AS cnt
      FROM r WHERE greatest(rp, rt) <= 10 GROUP BY 1, 2),
    per AS (
      SELECT mx.qid,
             sum(CAST(mx.cnt AS DOUBLE) * w.wt) AS rbo_trunc,
             CAST(sum(CASE WHEN mx.m = 1 THEN mx.cnt ELSE 0 END) AS BIGINT)
               AS top1_agree,
             CAST(sum(mx.cnt) AS BIGINT) AS overlap_at_10
      FROM mx JOIN w ON w.m = mx.m GROUP BY 1)
    SELECT CAST(qid AS BIGINT) AS qid,
           top1_agree,
           overlap_at_10,
           round(rbo_trunc, 6) AS rbo_trunc,
           round(rbo_trunc / 0.6513215599, 6) AS rbo_norm
    FROM per
    """,
)
def q375_prefix_full_rbo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-biased overlap (truncated at depth 10, p = 0.9) between the
    cheap 16-dim prefix ranking and the full-dim ranking, per probe —
    the top-weighted list-similarity metric that upgrades q342's flat
    overlap@k: agreement at rank 1 counts ~6x rank 10, matching how
    retrieval traffic actually concentrates. Identity: RBO_trunc =
    sum_d (1-p) p^(d-1) X_d / d with X_d = |top-d ∩ top-d|; since
    X_d = sum_(m<=d) cnt_m over m = max(rank_a, rank_b), the metric
    collapses to ONE weighted sum over the m-histogram with Python-
    precomputed tail-weight literals W_m = sum_(d>=m) w_d shared by
    both engines (no pow() at query time); rbo_norm rescales by
    1 - p^10 so identical prefixes score 1. Integer ranks ride the
    distributed rank frame; per-probe output is #probes-bounded."""
    scored = _probe_scores(spark, sf_dir, "prefix", 16)
    from etl_jetro_spark.operators.retrieval import rank_channels

    # one stacked rank pass for both channels (r11; see q350)
    r = rank_channels(scored, {"sa": "rp", "sb": "rt"})
    mx = (
        r.select(
            "qid", F.greatest(F.col("rp"), F.col("rt")).alias("m")
        )
        .filter(F.col("m") <= 10)
        .groupBy("qid", "m")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    w = spark.createDataFrame(
        [(m, float(wt)) for m, wt in enumerate(_RBO_W, 1)], "m INT, wt DOUBLE"
    )
    per = (
        mx.join(bcast_small(w), "m")
        .groupBy("qid")
        .agg(
            F.sum(F.col("cnt").cast("double") * F.col("wt")).alias(
                "rbo_trunc"
            ),
            F.sum(F.when(F.col("m") == 1, F.col("cnt")).otherwise(0))
            .cast("long")
            .alias("top1_agree"),
            F.sum("cnt").cast("long").alias("overlap_at_10"),
        )
    )
    return per.select(
        F.col("qid").cast("long").alias("qid"),
        "top1_agree",
        "overlap_at_10",
        F.round("rbo_trunc", 6).alias("rbo_trunc"),
        F.round(F.col("rbo_trunc") / F.lit(0.6513215599), 6).alias(
            "rbo_norm"
        ),
    )


@query(
    "q376_doclen_hill_tail_index",
    """
    WITH r AS (
      SELECT CAST(n_chars AS BIGINT) AS v,
             row_number() OVER (ORDER BY n_chars DESC, doc_id) AS rn
      FROM documents WHERE n_chars > 0),
    ks(k) AS (VALUES (50), (100)),
    ref AS (
      SELECT ks.k, r.v AS vref FROM ks JOIN r ON r.rn = ks.k + 1),
    tail AS (
      SELECT ref.k, ref.vref,
             avg(ln(CAST(r.v AS DOUBLE) / ref.vref)) AS invalpha
      FROM ref JOIN r ON r.rn <= ref.k
      GROUP BY 1, 2)
    SELECT CAST(k AS BIGINT) AS k,
           vref AS threshold,
           round(invalpha, 6) AS inv_alpha,
           CASE WHEN invalpha > 0 THEN round(1.0 / invalpha, 6) END
             AS hill_alpha
    FROM tail
    """,
)
def q376_doclen_hill_tail_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill estimator of the document-length tail index at k in {50,
    100}: 1/alpha = mean over the k largest lengths of ln(x_(i) /
    x_(k+1)) — the heavy-tail exponent a pipeline monitors because
    truncation budgets, packing efficiency, and shuffle skew all hinge
    on how Pareto the length tail is (alpha <= 2 means variance is
    effectively unbounded and mean-based capacity planning lies). The
    global descending rank rides the range-partitioned rank frame (no
    single-task sort); only the k+1 tail rows join the reference
    order statistic, so the post-rank work is k-bounded. ln() is
    output-only (no decision made on it) — static-wobble class under
    the 6 dp round."""
    from etl_jetro_spark.operators.aggregate import group_ranked

    d = load(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    r = group_ranked(
        d.select(F.col("n_chars").cast("long").alias("v"), "doc_id"),
        [],
        -F.col("v"),
        tiebreak=["doc_id"],
    )
    vals = r.select((-F.col("_v")).alias("v"), F.col("_rn").alias("rn"))
    ks = spark.createDataFrame([(50,), (100,)], ["k"])
    ref = (
        bcast_small(ks)
        .join(vals, F.col("rn") == F.col("k") + 1)
        .select("k", F.col("v").alias("vref"))
    )
    tail = (
        vals.join(bcast_small(ref), F.col("rn") <= F.col("k"))
        .groupBy("k", "vref")
        .agg(
            F.avg(
                F.log(F.col("v").cast("double") / F.col("vref"))
            ).alias("invalpha")
        )
    )
    return tail.select(
        F.col("k").cast("long").alias("k"),
        F.col("vref").alias("threshold"),
        F.round("invalpha", 6).alias("inv_alpha"),
        F.when(
            F.col("invalpha") > 0, F.round(1.0 / F.col("invalpha"), 6)
        ).alias("hill_alpha"),
    )


# --------------------------------------------------------------------------
# 16. Corpus comparison & mixture design (operators/corpusstats.py)
# --------------------------------------------------------------------------

# Shared DuckDB fragments: normalized word rows and the source-term
# count frame (exact BIGINT counts — every probability downstream is a
# division of these on both engines).
_DK_WF = (
    f"w0 AS (SELECT source, doc_id, unnest({DK_WORDS}) AS w FROM documents),\n"
    "    wf AS (SELECT source, doc_id, w FROM w0 WHERE w <> '')"
)
_DK_TC = (
    "tc AS (SELECT source, w, CAST(count(*) AS BIGINT) AS cnt\n"
    "          FROM wf GROUP BY 1, 2)"
)
_LN2 = "0.6931471805599453"  # Python-precomputed ln(2), shared literal

from etl_jetro_spark.operators.corpusstats import sql_ols_select  # noqa: E402

_OLS = sql_ols_select()


def _source_term_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, w, cnt) — the engine-side mirror of ``_DK_TC``: one
    corpus-linear explode + one map-side-combined groupBy."""
    from etl_jetro_spark.operators.corpusstats import word_rows

    d = load(spark, sf_dir, "documents")
    return (
        word_rows(d, "text", "source")
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


@query(
    "q377_source_js_divergence",
    f"""
    WITH {_DK_WF},
    {_DK_TC},
    vocab AS (
      SELECT w FROM (
        SELECT w, sum(cnt) AS cg FROM tc GROUP BY 1
        ORDER BY cg DESC, w LIMIT 200)),
    sv AS (SELECT tc.source, tc.w, tc.cnt FROM tc JOIN vocab USING (w)),
    tot AS (SELECT source, CAST(sum(cnt) AS BIGINT) AS n FROM sv GROUP BY 1),
    grid AS (
      SELECT t.source, v.w, t.n, coalesce(sv.cnt, 0) AS cnt
      FROM tot t CROSS JOIN vocab v
      LEFT JOIN sv ON sv.source = t.source AND sv.w = v.w),
    pr AS (SELECT source, w, CAST(cnt AS DOUBLE) / n AS p FROM grid),
    pairs AS (
      SELECT a.source AS src_a, b.source AS src_b,
             a.p AS pa, b.p AS pb, (a.p + b.p) / 2.0 AS m
      FROM pr a JOIN pr b ON a.w = b.w AND a.source < b.source),
    agg AS (
      SELECT src_a, src_b,
             CAST(sum(CASE WHEN pa > 0 OR pb > 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_support,
             sum(CASE WHEN pa > 0 THEN 0.5 * pa * ln(pa / m) ELSE 0 END)
           + sum(CASE WHEN pb > 0 THEN 0.5 * pb * ln(pb / m) ELSE 0 END)
               AS jsd
      FROM pairs GROUP BY 1, 2)
    SELECT src_a, src_b, n_support,
           round(jsd, 6) + 0.0 AS jsd_nats,
           round(jsd / {_LN2}, 6) + 0.0 AS jsd_bits
    FROM agg
    """,
)
def q377_source_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Jensen-Shannon divergence between source unigram
    distributions over the shared top-200 global vocabulary — the
    mixture-design distance a curator reads to decide which sources are
    redundant (JSD ~ 0) vs complementary before weighting them. The
    token pass is corpus-linear (one explode + one map-side-combined
    agg); EVERYTHING after the term frame is bounded by #sources x 200:
    the vocab is TakeOrdered (count desc, term asc — exact-integer
    tie-break), per-source counts renormalize within the vocab by exact
    BIGINT totals, and the 190-pair JSD runs on a 4000-row grid. Both
    engines divide the same exact integers, so ln() sees bit-identical
    arguments; the divergence sums are output-only (6 dp). jsd_bits
    rescales by a Python-precomputed ln(2) literal shared by both
    engines (0 <= jsd_bits <= 1)."""
    tc = _source_term_counts(spark, sf_dir)
    vocab = (
        tc.groupBy("w")
        .agg(F.sum("cnt").cast("long").alias("cg"))
        .orderBy(F.desc("cg"), F.asc("w"))
        .limit(200)
        .select("w")
    )
    sv = tc.join(bcast_small(vocab), "w")
    tot = sv.groupBy("source").agg(F.sum("cnt").cast("long").alias("n"))
    grid = (
        bcast_small(tot)
        .crossJoin(bcast_small(vocab))
        .join(sv, ["source", "w"], "left")
        .select(
            "source", "w",
            (F.coalesce(F.col("cnt"), F.lit(0)).cast("double") / F.col("n")
             ).alias("p"),
        )
    )
    a = grid.select(
        F.col("source").alias("src_a"), "w", F.col("p").alias("pa")
    )
    b = grid.select(
        F.col("source").alias("src_b"), "w", F.col("p").alias("pb")
    )
    pairs = a.join(b, "w").filter(F.col("src_a") < F.col("src_b"))
    m = (F.col("pa") + F.col("pb")) / 2.0
    agg = pairs.groupBy("src_a", "src_b").agg(
        F.sum(
            F.when((F.col("pa") > 0) | (F.col("pb") > 0), 1).otherwise(0)
        ).cast("long").alias("n_support"),
        (
            F.sum(
                F.when(
                    F.col("pa") > 0,
                    0.5 * F.col("pa") * F.log(F.col("pa") / m),
                ).otherwise(0.0)
            )
            + F.sum(
                F.when(
                    F.col("pb") > 0,
                    0.5 * F.col("pb") * F.log(F.col("pb") / m),
                ).otherwise(0.0)
            )
        ).alias("jsd"),
    )
    return agg.select(
        "src_a", "src_b", "n_support",
        (F.round("jsd", 6) + F.lit(0.0)).alias("jsd_nats"),
        (F.round(F.col("jsd") / F.lit(float(_LN2)), 6) + F.lit(0.0)).alias(
            "jsd_bits"
        ),
    )


@query(
    "q378_source_zipf_slope",
    f"""
    WITH {_DK_WF},
    {_DK_TC},
    r AS (
      SELECT source, w, cnt,
             row_number() OVER (PARTITION BY source
                                ORDER BY cnt DESC, w) AS rn
      FROM tc),
    t AS (SELECT source, ln(CAST(rn AS DOUBLE)) AS x,
                 ln(CAST(cnt AS DOUBLE)) AS y
          FROM r WHERE rn <= 100),
    fit AS (SELECT source, {_OLS} FROM t GROUP BY 1)
    SELECT source, n AS n_top,
           round(slope, 6) + 0.0 AS zipf_slope,
           round(intercept, 6) + 0.0 AS ln_c,
           round(r2, 6) + 0.0 AS r2
    FROM fit
    """,
)
def q378_source_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law fit per source: OLS slope of ln(count) on ln(rank) over
    each source's top-100 terms — natural text sits near -1; templated
    or boilerplate-heavy sources flatten toward 0, so the slope is a
    one-number genre/quality fingerprint for mixture design. The
    per-source rank rides the range-partitioned rank frame
    (operators.aggregate.group_ranked — at 100 TB a source's vocabulary
    is millions of terms, never one task's window), cut at rank 100
    with an exact-integer count + term-asc tie-break; the OLS closed
    form (operators.corpusstats.ols_fit and its SQL mirror) consumes
    ln() of identical exact integers on both engines, fit columns
    output-only (6 dp)."""
    from etl_jetro_spark.operators.aggregate import group_ranked
    from etl_jetro_spark.operators.corpusstats import ols_fit

    tc = _source_term_counts(spark, sf_dir)
    r = group_ranked(tc, ["source"], -F.col("cnt"), tiebreak=["w"])
    top = r.filter(F.col("_rn") <= 100).select(
        "source",
        F.log(F.col("_rn").cast("double")).alias("x"),
        F.log((-F.col("_v")).cast("double")).alias("y"),
    )
    fit = ols_fit(top, ["source"], F.col("x"), F.col("y"))
    return fit.select(
        "source",
        F.col("n").alias("n_top"),
        (F.round("slope", 6) + F.lit(0.0)).alias("zipf_slope"),
        (F.round("intercept", 6) + F.lit(0.0)).alias("ln_c"),
        (F.round("r2", 6) + F.lit(0.0)).alias("r2"),
    )


@query(
    "q379_source_heaps_exponent",
    f"""
    WITH {_DK_WF},
    dr AS (
      SELECT source, doc_id,
             row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn,
             count(*) OVER (PARTITION BY source) AS nd
      FROM documents),
    nt AS (SELECT source, doc_id, CAST(count(*) AS BIGINT) AS ntok
           FROM wf GROUP BY 1, 2),
    fr AS (
      SELECT f.source, f.w, min(dr.rn) AS frn
      FROM (SELECT DISTINCT source, doc_id, w FROM wf) f
      JOIN dr ON dr.source = f.source AND dr.doc_id = f.doc_id
      GROUP BY 1, 2),
    grid AS (
      SELECT source, nd, k, (k * nd + 9) // 10 AS c
      FROM (SELECT DISTINCT source, nd FROM dr)
      CROSS JOIN (SELECT unnest(range(1, 11)) AS k)),
    nk AS (
      SELECT g.source, g.k, CAST(sum(nt.ntok) AS BIGINT) AS ntok
      FROM grid g
      JOIN dr ON dr.source = g.source AND dr.rn <= g.c
      JOIN nt ON nt.source = dr.source AND nt.doc_id = dr.doc_id
      GROUP BY 1, 2),
    vk AS (
      SELECT g.source, g.k, CAST(count(*) AS BIGINT) AS vt
      FROM grid g
      JOIN fr ON fr.source = g.source AND fr.frn <= g.c
      GROUP BY 1, 2),
    pts AS (
      SELECT nk.source, ln(CAST(nk.ntok AS DOUBLE)) AS x,
             ln(CAST(vk.vt AS DOUBLE)) AS y
      FROM nk JOIN vk ON vk.source = nk.source AND vk.k = nk.k),
    fit AS (SELECT source, {_OLS} FROM pts GROUP BY 1),
    nd1 AS (SELECT DISTINCT source, CAST(nd AS BIGINT) AS n_docs FROM dr)
    SELECT fit.source, nd1.n_docs, fit.n AS n_points,
           round(fit.slope, 6) + 0.0 AS heaps_beta,
           round(fit.r2, 6) + 0.0 AS r2
    FROM fit JOIN nd1 ON nd1.source = fit.source
    """,
)
def q379_source_heaps_exponent(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Heaps-law vocabulary-growth exponent per source: V(N) ~ K * N^b,
    fit as the OLS slope of ln(distinct terms) on ln(total tokens) at
    ten document-prefix checkpoints (docs ordered by doc_id, checkpoint
    ranks ceil(k*n/10) computed in exact integer arithmetic on both
    engines). Low beta means the source's vocabulary saturates — more
    of it buys tokens but no new types, the diminishing-returns curve a
    data-mixture optimizer trades against. Cumulative-distinct is NOT
    computed by a running window: each term contributes its FIRST-
    occurrence rank (min doc rank — one term-keyed agg), so V at
    checkpoint c is a count of first-ranks <= c; token prefix sums join
    docs to the 200-row checkpoint grid (fanout <= 10 per doc, data-
    linear). Doc ranks ride the range-partitioned rank frame — no
    per-source single-task sort at 100 TB."""
    from etl_jetro_spark.operators.aggregate import group_ranked
    from etl_jetro_spark.operators.corpusstats import ols_fit, word_rows

    d = load(spark, sf_dir, "documents")
    dr = group_ranked(d.select("source", "doc_id"), ["source"], "doc_id")
    dr = dr.select(
        "source", F.col("_v").alias("doc_id"), F.col("_rn").alias("rn"),
        F.col("_n").alias("nd"),
    )
    wf = word_rows(d, "text", "source", "doc_id")
    nt = wf.groupBy("source", "doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("ntok")
    )
    fr = (
        wf.dropDuplicates(["source", "doc_id", "w"])
        .join(dr.select("source", "doc_id", "rn"), ["source", "doc_id"])
        .groupBy("source", "w")
        .agg(F.min("rn").alias("frn"))
    )
    ks = spark.createDataFrame([(k,) for k in range(1, 11)], "k INT")
    grid = (
        bcast_small(dr.select("source", "nd").distinct())
        .crossJoin(bcast_small(ks))
        .select(
            "source", "nd", "k",
            F.expr("(k * nd + 9) div 10").alias("c"),
        )
    )
    g = bcast_small(
        grid.select(F.col("source").alias("gsrc"), "k", "c")
    )
    dj = nt.join(dr.select("source", "doc_id", "rn"), ["source", "doc_id"])
    nk = (
        dj.join(g, (dj["source"] == g["gsrc"]) & (dj["rn"] <= g["c"]))
        .groupBy(F.col("gsrc").alias("source"), F.col("k"))
        .agg(F.sum("ntok").cast("long").alias("ntok"))
    )
    vk = (
        fr.join(g, (fr["source"] == g["gsrc"]) & (fr["frn"] <= g["c"]))
        .groupBy(F.col("gsrc").alias("source"), F.col("k"))
        .agg(F.count(F.lit(1)).cast("long").alias("vt"))
    )
    pts = nk.join(vk, ["source", "k"]).select(
        "source",
        F.log(F.col("ntok").cast("double")).alias("x"),
        F.log(F.col("vt").cast("double")).alias("y"),
    )
    fit = ols_fit(pts, ["source"], F.col("x"), F.col("y"))
    nd1 = dr.select("source", F.col("nd").cast("long").alias("n_docs")
                    ).distinct()
    return fit.join(bcast_small(nd1), "source").select(
        "source", "n_docs",
        F.col("n").alias("n_points"),
        (F.round("slope", 6) + F.lit(0.0)).alias("heaps_beta"),
        (F.round("r2", 6) + F.lit(0.0)).alias("r2"),
    )


@query(
    "q380_source_term_chisq",
    f"""
    WITH {_DK_WF},
    {_DK_TC},
    vocab AS (
      SELECT w FROM (
        SELECT w, sum(cnt) AS cg FROM tc GROUP BY 1
        ORDER BY cg DESC, w LIMIT 50)),
    sv AS (SELECT tc.source, tc.w, tc.cnt FROM tc JOIN vocab USING (w)),
    ct AS (SELECT source, CAST(sum(cnt) AS BIGINT) AS coltot
           FROM sv GROUP BY 1),
    rt AS (SELECT w, CAST(sum(cnt) AS BIGINT) AS rowtot FROM sv GROUP BY 1),
    g AS (SELECT CAST(sum(cnt) AS BIGINT) AS grand FROM sv),
    cell AS (
      SELECT ct.source, rt.w, ct.coltot, g.grand,
             coalesce(sv.cnt, 0) AS o,
             CAST(rt.rowtot AS DOUBLE) * ct.coltot / g.grand AS e
      FROM ct CROSS JOIN rt CROSS JOIN g
      LEFT JOIN sv ON sv.source = ct.source AND sv.w = rt.w)
    SELECT source,
           CAST(any_value(coltot) AS BIGINT) AS n_obs,
           round(any_value(CAST(coltot AS DOUBLE) / grand), 6)
             AS token_share,
           round(sum((o - e) * (o - e) / e), 6) AS chi2_contrib
    FROM cell GROUP BY 1
    """,
)
def q380_source_term_chisq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square homogeneity decomposition over the top-50 global
    terms x sources contingency table: each source's contribution to
    the homogeneity statistic (expected counts e = rowtot * coltot /
    grand under independence), the screening test that flags which
    source's common-term profile deviates most from the corpus norm.
    Observed/row/column/grand totals are exact BIGINTs; e is the same
    double on both engines (one multiply, one divide of exact
    integers); zero cells enter as (0-e)^2/e = e via the coalesce-0
    grid (#sources x 50, driver-small). The only corpus-scale work is
    the shared term frame; the chi-square sum is output-only (6 dp)."""
    tc = _source_term_counts(spark, sf_dir)
    vocab = (
        tc.groupBy("w")
        .agg(F.sum("cnt").cast("long").alias("cg"))
        .orderBy(F.desc("cg"), F.asc("w"))
        .limit(50)
        .select("w")
    )
    sv = tc.join(bcast_small(vocab), "w")
    ct = sv.groupBy("source").agg(F.sum("cnt").cast("long").alias("coltot"))
    rt = sv.groupBy("w").agg(F.sum("cnt").cast("long").alias("rowtot"))
    g = sv.agg(F.sum("cnt").cast("long").alias("grand"))
    cell = (
        bcast_small(ct)
        .crossJoin(bcast_small(rt))
        .crossJoin(bcast_small(g))
        .join(sv, ["source", "w"], "left")
        .select(
            "source", "coltot", "grand",
            F.coalesce(F.col("cnt"), F.lit(0)).alias("o"),
            (F.col("rowtot").cast("double") * F.col("coltot")
             / F.col("grand")).alias("e"),
        )
    )
    return cell.groupBy("source").agg(
        F.any_value(F.col("coltot")).cast("long").alias("n_obs"),
        F.round(
            F.any_value(F.col("coltot").cast("double") / F.col("grand")), 6
        ).alias("token_share"),
        F.round(
            F.sum((F.col("o") - F.col("e")) * (F.col("o") - F.col("e"))
                  / F.col("e")), 6
        ).alias("chi2_contrib"),
    )


@query(
    "q381_source_cross_entropy",
    f"""
    WITH {_DK_WF},
    {_DK_TC},
    gt AS (SELECT w, CAST(sum(cnt) AS BIGINT) AS cg FROM tc GROUP BY 1),
    sc AS (SELECT CAST(sum(cg) AS BIGINT) AS ng,
                  CAST(count(*) AS BIGINT) AS v FROM gt),
    j AS (
      SELECT tc.source, tc.cnt,
             ln(CAST(gt.cg + 1 AS DOUBLE) / CAST(sc.ng + sc.v AS DOUBLE))
               AS lnq
      FROM tc JOIN gt USING (w) CROSS JOIN sc),
    per AS (
      SELECT source, CAST(sum(cnt) AS BIGINT) AS n_tokens,
             sum(CAST(cnt AS DOUBLE) * lnq) AS s
      FROM j GROUP BY 1)
    SELECT source, n_tokens,
           round(-(s / CAST(n_tokens AS DOUBLE)), 6) AS xent_nats,
           round(exp(-(s / CAST(n_tokens AS DOUBLE))), 6) AS ppl
    FROM per
    """,
)
def q381_source_cross_entropy(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cross-entropy (and unigram perplexity) of each source under the
    add-one-smoothed corpus language model q(t) = (c_g(t)+1)/(N_g+V) —
    the LM-affinity score a mixture designer uses to spot sources the
    corpus models poorly (high perplexity = distributional outlier or
    high-value diversity, low = redundant). H(p_s, q) = -(1/N_s) *
    sum_t c_st * ln q(t): counts exact BIGINT, the smoothed probability
    is ONE division of exact integers (bit-identical ln arguments on
    both engines), the accumulator is a term-keyed data-linear join +
    one partial agg; exp() and the double sum are output-only (6 dp).
    Corpus-scale work: two term-frame shuffles, nothing driver-sized
    but the 1-row scalar broadcast."""
    tc = _source_term_counts(spark, sf_dir)
    gt = tc.groupBy("w").agg(F.sum("cnt").cast("long").alias("cg"))
    sc = gt.agg(
        F.sum("cg").cast("long").alias("ng"),
        F.count(F.lit(1)).cast("long").alias("v"),
    )
    j = (
        tc.join(gt, "w")
        .crossJoin(bcast_small(sc))
        .select(
            "source", "cnt",
            F.log(
                (F.col("cg") + 1).cast("double")
                / (F.col("ng") + F.col("v")).cast("double")
            ).alias("lnq"),
        )
    )
    per = j.groupBy("source").agg(
        F.sum("cnt").cast("long").alias("n_tokens"),
        F.sum(F.col("cnt").cast("double") * F.col("lnq")).alias("s"),
    )
    h = -(F.col("s") / F.col("n_tokens").cast("double"))
    return per.select(
        "source", "n_tokens",
        F.round(h, 6).alias("xent_nats"),
        F.round(F.exp(h), 6).alias("ppl"),
    )


@query(
    "q382_event_markov_entropy",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev
      FROM events),
    tr AS (
      SELECT prev AS from_type, event_type AS to_type,
             CAST(count(*) AS BIGINT) AS c
      FROM seq WHERE prev IS NOT NULL GROUP BY 1, 2),
    st AS (
      SELECT from_type, CAST(sum(c) AS BIGINT) AS n_out,
             CAST(count(*) AS BIGINT) AS n_dest,
             sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))) AS clnc
      FROM tr GROUP BY 1),
    tot AS (SELECT CAST(sum(n_out) AS BIGINT) AS t FROM st),
    h AS (
      SELECT from_type, n_out, n_dest, t,
             ln(CAST(n_out AS DOUBLE)) - clnc / CAST(n_out AS DOUBLE)
               AS h_nats
      FROM st CROSS JOIN tot)
    SELECT from_type, n_out, n_dest,
           round(h_nats, 6) + 0.0 AS h_nats,
           round(CAST(n_out AS DOUBLE) / t, 6) AS pi,
           round(CAST(n_out AS DOUBLE) / t * h_nats, 6) + 0.0
             AS rate_contrib
    FROM h
    """,
)
def q382_event_markov_entropy(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """First-order Markov transition entropy of the per-user event
    stream: for each from-state, the Shannon entropy of its next-event
    distribution (H_s = ln c_s - (1/c_s) sum_t c_st ln c_st — exact
    counts, ONE division) plus its empirical occupancy pi and the
    entropy-rate contribution pi * H_s (sum of the column = the chain's
    entropy rate) — the sequence-predictability profile that sizes
    next-event-prediction training data and streaming-state fanout.
    Transitions come from one lag() over a user-PARTITIONED window
    (keyed, never global; ts is the engine's epoch-ns contract with
    event_id tie-break); everything after the transition count is
    #event_types^2-bounded. ln() is output-only under the 6 dp round."""
    from pyspark.sql import Window

    e = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type", F.lag("event_type").over(w).alias("prev")
    ).filter(F.col("prev").isNotNull())
    tr = seq.groupBy(
        F.col("prev").alias("from_type"),
        F.col("event_type").alias("to_type"),
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    st = tr.groupBy("from_type").agg(
        F.sum("c").cast("long").alias("n_out"),
        F.count(F.lit(1)).cast("long").alias("n_dest"),
        F.sum(
            F.col("c").cast("double") * F.log(F.col("c").cast("double"))
        ).alias("clnc"),
    )
    tot = st.agg(F.sum("n_out").cast("long").alias("t"))
    h = (
        F.log(F.col("n_out").cast("double"))
        - F.col("clnc") / F.col("n_out").cast("double")
    )
    pi = F.col("n_out").cast("double") / F.col("t")
    return st.crossJoin(bcast_small(tot)).select(
        "from_type", "n_out", "n_dest",
        (F.round(h, 6) + F.lit(0.0)).alias("h_nats"),
        F.round(pi, 6).alias("pi"),
        (F.round(pi * h, 6) + F.lit(0.0)).alias("rate_contrib"),
    )


@query(
    "q383_source_keyness_logodds",
    f"""
    WITH {_DK_WF},
    {_DK_TC},
    gt AS (SELECT w, CAST(sum(cnt) AS BIGINT) AS cg FROM tc GROUP BY 1),
    sc AS (SELECT CAST(sum(cg) AS BIGINT) AS ng FROM gt),
    stot AS (SELECT source, CAST(sum(cnt) AS BIGINT) AS ns
             FROM tc GROUP BY 1),
    cand AS (
      SELECT tc.source, tc.w, tc.cnt, gt.cg, stot.ns, sc.ng,
             500.0 * (CAST(gt.cg AS DOUBLE) / sc.ng) AS a
      FROM tc
      JOIN gt USING (w)
      JOIN stot ON stot.source = tc.source
      CROSS JOIN sc
      WHERE gt.cg >= 20),
    zz AS (
      SELECT source, w, cnt AS c_in, cg - cnt AS c_out,
             (ln((cnt + a) / (ns + 500.0 - cnt - a))
              - ln((cg - cnt + a)
                   / (ng - ns + 500.0 - (cg - cnt) - a)))
             / sqrt(1.0 / (cnt + a) + 1.0 / (cg - cnt + a)) AS zval
      FROM cand),
    r AS (
      SELECT source, w, c_in, c_out, zval,
             row_number() OVER (PARTITION BY source
                                ORDER BY round(zval, 9) DESC, w) AS rn
      FROM zz)
    SELECT source, CAST(rn AS BIGINT) AS rank, w AS term,
           round(zval, 6) + 0.0 AS z, c_in, c_out
    FROM r WHERE rn <= 5
    """,
)
def q383_source_keyness_logodds(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Distinctive-term extraction per source via Monroe et al.'s
    log-odds ratio with an informative Dirichlet prior ("Fightin'
    Words"): prior mass alpha_t = a0 * g_t (a0 = 500 pseudo-tokens
    spread by the corpus distribution) shrinks rare-term noise that
    plain log-odds or PMI would surface; z = delta / sqrt(1/(c_in +
    alpha_t) + 1/(c_rest + alpha_t)). Top-5 terms per source — the
    source-fingerprint report a curator reads to name WHAT a source
    uniquely contributes. Counts exact; the z RANK is a decision on a
    9 dp-rounded value with term-asc tie-break (the Davies-Bouldin
    pattern — ln/sqrt wobble is ~1e-15, six orders below the round);
    the rank rides the range-partitioned rank frame over the
    candidate-term frame (cg >= 20, exact-integer gate), never a
    vocabulary-sized single-task window."""
    from etl_jetro_spark.operators.aggregate import group_ranked

    tc = _source_term_counts(spark, sf_dir)
    gt = tc.groupBy("w").agg(F.sum("cnt").cast("long").alias("cg"))
    sc = gt.agg(F.sum("cg").cast("long").alias("ng"))
    stot = tc.groupBy("source").agg(F.sum("cnt").cast("long").alias("ns"))
    base = (
        tc.join(gt.filter(F.col("cg") >= 20), "w")
        .join(bcast_small(stot), "source")
        .crossJoin(bcast_small(sc))
    )
    a = 500.0 * (F.col("cg").cast("double") / F.col("ng"))
    c1 = F.col("cnt")
    c2 = F.col("cg") - F.col("cnt")
    o1 = (c1 + a) / (F.col("ns") + 500.0 - c1 - a)
    o2 = (c2 + a) / (F.col("ng") - F.col("ns") + 500.0 - c2 - a)
    va = 1.0 / (c1 + a) + 1.0 / (c2 + a)
    zz = base.select(
        "source", "w",
        c1.alias("c_in"), c2.alias("c_out"),
        ((F.log(o1) - F.log(o2)) / F.sqrt(va)).alias("zval"),
    )
    r = group_ranked(
        zz.withColumn("z9", -F.round(F.col("zval"), 9)),
        ["source"],
        "z9",
        tiebreak=["w", "zval", "c_in", "c_out"],
    )
    return r.filter(F.col("_rn") <= 5).select(
        "source",
        F.col("_rn").cast("long").alias("rank"),
        F.col("w").alias("term"),
        (F.round("zval", 6) + F.lit(0.0)).alias("z"),
        "c_in", "c_out",
    )


@query(
    "q384_source_oov_rate",
    f"""
    WITH {_DK_WF},
    {_DK_TC},
    gt AS (SELECT w, CAST(sum(cnt) AS BIGINT) AS cg FROM tc GROUP BY 1),
    ng AS (SELECT CAST(sum(cg) AS BIGINT) AS n FROM gt),
    cs AS (SELECT w, cg,
                  sum(cg) OVER (ORDER BY cg DESC, w) AS cum
           FROM gt),
    vocab AS (
      SELECT cs.w FROM cs CROSS JOIN ng
      WHERE 5 * (cum - cg) < 4 * ng.n),
    nv AS (SELECT CAST(count(*) AS BIGINT) AS n_vocab FROM vocab),
    m AS (
      SELECT tc.source, tc.cnt,
             CASE WHEN vocab.w IS NULL THEN 1 ELSE 0 END AS oov
      FROM tc LEFT JOIN vocab ON vocab.w = tc.w),
    per AS (
      SELECT source,
             CAST(sum(cnt) AS BIGINT) AS n_tokens,
             CAST(sum(CASE WHEN oov = 1 THEN cnt ELSE 0 END) AS BIGINT)
               AS oov_tokens,
             CAST(count(*) AS BIGINT) AS n_types,
             CAST(sum(oov) AS BIGINT) AS oov_types
      FROM m GROUP BY 1)
    SELECT source, n_vocab, n_tokens, oov_tokens,
           round(CAST(oov_tokens AS DOUBLE) / n_tokens, 6)
             AS oov_token_rate,
           n_types, oov_types,
           round(CAST(oov_types AS DOUBLE) / n_types, 6) AS oov_type_rate
    FROM per CROSS JOIN nv
    """,
)
def q384_source_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-coverage audit: per-source out-of-vocabulary rate
    against the MINIMAL 80%-token-mass vocabulary — terms taken in
    count-desc (term-asc tie-break) order until they cover 80% of
    corpus tokens, the frequency-mass cut an embedding table or
    subword vocabulary actually ships with (a fixed top-K would be
    degenerate here: the testdata's type inventory is smaller than any
    realistic K). The crossing decision is EXACT integer arithmetic on
    both engines — keep a term iff 5 * (cum - cnt) < 4 * N — no float
    threshold anywhere. The global cumulative mass rides the
    distributed two-pass prefix sweep (operators.frontier.
    running_prefix_sum over the group_ranked rank frame — no
    single-task vocabulary window at 100 TB); membership is a
    vocab-bounded broadcast left join; rates are exact BIGINT counts
    with ONE final division."""
    from etl_jetro_spark.operators.aggregate import group_ranked
    from etl_jetro_spark.operators.frontier import running_prefix_sum

    tc = _source_term_counts(spark, sf_dir)
    gt = tc.groupBy("w").agg(F.sum("cnt").cast("long").alias("cg"))
    ng = gt.agg(F.sum("cg").cast("long").alias("n"))
    r = group_ranked(gt, [], -F.col("cg"), tiebreak=["w"]).select(
        F.col("_rn").alias("rn"), (-F.col("_v")).alias("cg"), "w"
    )
    cs = running_prefix_sum(r, "rn", "cg")
    vocab = (
        cs.crossJoin(bcast_small(ng))
        .filter(
            5 * (F.col("_runsum") - F.col("cg")) < 4 * F.col("n")
        )
        .select("w", F.lit(1).alias("_iv"))
    )
    nv = vocab.agg(F.count(F.lit(1)).cast("long").alias("n_vocab"))
    m = tc.join(bcast_small(vocab), "w", "left").select(
        "source", "cnt",
        F.when(F.col("_iv").isNull(), 1).otherwise(0).alias("oov"),
    )
    per = m.groupBy("source").agg(
        F.sum("cnt").cast("long").alias("n_tokens"),
        F.sum(F.when(F.col("oov") == 1, F.col("cnt")).otherwise(0))
        .cast("long").alias("oov_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum("oov").cast("long").alias("oov_types"),
    )
    return per.crossJoin(bcast_small(nv)).select(
        "source", "n_vocab", "n_tokens", "oov_tokens",
        F.round(
            F.col("oov_tokens").cast("double") / F.col("n_tokens"), 6
        ).alias("oov_token_rate"),
        "n_types", "oov_types",
        F.round(
            F.col("oov_types").cast("double") / F.col("n_types"), 6
        ).alias("oov_type_rate"),
    )


@query(
    "q385_event_interarrival_burstiness",
    """
    WITH g AS (
      SELECT event_type,
             (epoch_us(ts) - lag(epoch_us(ts)) OVER (
                PARTITION BY user_id, event_type
                ORDER BY epoch_us(ts), event_id)) AS gap
      FROM events),
    s AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             sum(CAST(gap AS HUGEINT)) AS s1,
             sum(CAST(gap AS HUGEINT) * CAST(gap AS HUGEINT)) AS s2
      FROM g WHERE gap IS NOT NULL GROUP BY 1),
    mom AS (
      SELECT event_type, n,
             CAST(s1 AS DOUBLE) / n AS m,
             sqrt(greatest(
               CAST(s2 AS DOUBLE) / n
                 - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n),
               0.0)) AS sd
      FROM s)
    SELECT event_type, n AS n_gaps,
           round(m / 1000000.0, 6) AS mean_gap_s,
           round(sd / m, 6) AS cv,
           round((sd - m) / (sd + m), 6) AS burstiness
    FROM mom
    """,
)
def q385_event_interarrival_burstiness(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Goh-Barabasi burstiness B = (sigma - mu) / (sigma + mu) of the
    same-type inter-arrival gaps per event type (B -> -1 periodic,
    B ~ 0 Poisson, B -> 1 bursty) plus the coefficient of variation —
    the traffic-shape parameter that decides whether streaming-state
    sizing can assume memoryless arrivals (q294's percentiles give the
    quantiles; B gives the regime). Gaps are exact microsecond BIGINTs
    from ONE lag() over a (user, type)-partitioned window; the moment
    sums follow the integer-exactness discipline (DECIMAL(38,0) /
    HUGEINT — a squared gap overflows int64) so no float fold-order
    reaches an aggregate; mean/sd are identical casts + divisions of
    exact integers on both engines, output-only (6 dp)."""
    from pyspark.sql import Window

    e = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    us = F.expr("ts div 1000")
    g = e.select(
        "event_type",
        (us - F.lag(us).over(w)).alias("gap"),
    ).filter(F.col("gap").isNotNull())
    gd = F.col("gap").cast("decimal(38,0)")
    s = g.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(gd).alias("s1"),
        F.sum(gd * gd).alias("s2"),
    )
    m = F.col("s1").cast("double") / F.col("n")
    sd = F.sqrt(
        F.greatest(
            F.col("s2").cast("double") / F.col("n") - m * m, F.lit(0.0)
        )
    )
    return s.select(
        "event_type",
        F.col("n").alias("n_gaps"),
        F.round(m / 1000000.0, 6).alias("mean_gap_s"),
        F.round(sd / m, 6).alias("cv"),
        F.round((sd - m) / (sd + m), 6).alias("burstiness"),
    )


@query(
    "q386_source_lexical_richness",
    f"""
    WITH {_DK_WF},
    {_DK_TC},
    per AS (
      SELECT source,
             CAST(sum(cnt) AS BIGINT) AS n_tokens,
             CAST(count(*) AS BIGINT) AS n_types,
             CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_hapax
      FROM tc GROUP BY 1)
    SELECT source, n_tokens, n_types, n_hapax,
           round(n_types / sqrt(CAST(n_tokens AS DOUBLE)), 6)
             AS root_ttr,
           round(ln(CAST(n_types AS DOUBLE))
                 / ln(CAST(n_tokens AS DOUBLE)), 6) AS herdan_c,
           round(CAST(n_hapax AS DOUBLE) / n_types, 6) AS hapax_frac
    FROM per
    """,
)
def q386_source_lexical_richness(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Length-corrected lexical-richness profile per source: Guiraud's
    root type-token ratio V/sqrt(N), Herdan's C = ln V / ln N, and the
    hapax-legomena fraction — the trio that separates genuinely diverse
    text from templated boilerplate WITHOUT the raw-TTR size bias
    (plain V/N collapses as N grows, so cross-source comparison needs
    the corrected forms). One corpus-linear term frame, one
    #sources-bounded agg; counts exact BIGINT, each statistic ONE
    division (sqrt/ln output-only under the 6 dp round)."""
    tc = _source_term_counts(spark, sf_dir)
    per = tc.groupBy("source").agg(
        F.sum("cnt").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum(F.when(F.col("cnt") == 1, 1).otherwise(0))
        .cast("long").alias("n_hapax"),
    )
    return per.select(
        "source", "n_tokens", "n_types", "n_hapax",
        F.round(
            F.col("n_types") / F.sqrt(F.col("n_tokens").cast("double")), 6
        ).alias("root_ttr"),
        F.round(
            F.log(F.col("n_types").cast("double"))
            / F.log(F.col("n_tokens").cast("double")), 6
        ).alias("herdan_c"),
        F.round(
            F.col("n_hapax").cast("double") / F.col("n_types"), 6
        ).alias("hapax_frac"),
    )


# --------------------------------------------------------------------------
# 36. Round-11: deterministic sliced-subgraph 30x gates for the
#     co-purchase graph family (q158 / q178 / q236)
#
# The full-graph oracles are the ONLY catalog rows with no 30x
# correctness evidence: their wedge/pair frames grow as sum(basket^2)
# and single-node DuckDB dies spilling them at sf3 (SCALE.md round-10
# tally) while the engine completes. These three rows gate the SAME
# engine code paths (the operators, the identical edge construction)
# on a FIXED deterministic slice of the basket universe —
# l_orderkey % 30 = 7, every 30th order — whose wedge frame at sf3 is
# the size of the full sf0.1 frame, affordable to both engines. Slicing
# ORDERS (graph "documents") keeps every surviving basket intact, so
# co-occurrence semantics inside the slice are exact, not sampled; the
# modulus is on the uniformly-scattered orderkey, not a
# generator-correlated column (TESTDATA doc_id%20 lesson does not
# apply to TPC-H orderkeys).
# --------------------------------------------------------------------------

_GRAPH_SLICE = "l_orderkey % 30 = 7"


def _sliced_copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q158/q178's co-purchase edge frame (support >= 2, a < b) over the
    deterministic 1/30 orderkey slice."""
    li = load(spark, sf_dir, "lineitem").filter(F.expr(_GRAPH_SLICE))
    return _pair_support(li).select(
        F.col("u").alias("id_a"), F.col("v").alias("id_b")
    )


@query(
    "q387_graph_slice_clustering",
    f"""
    WITH bsk AS (SELECT l_orderkey, l_partkey FROM lineitem
                 WHERE {_GRAPH_SLICE}
                 GROUP BY l_orderkey, l_partkey),
    e AS (
      SELECT x.l_partkey AS a, y.l_partkey AS b
      FROM bsk x JOIN bsk y
        ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
      GROUP BY 1, 2 HAVING count(*) >= 2
    ),
    deg AS (
      SELECT v, count(*) AS d FROM (
        SELECT a AS v FROM e UNION ALL SELECT b FROM e) GROUP BY v
    ),
    o AS (
      SELECT CASE WHEN da.d < db.d OR (da.d = db.d AND e.a < e.b)
                  THEN e.a ELSE e.b END AS u,
             CASE WHEN da.d < db.d OR (da.d = db.d AND e.a < e.b)
                  THEN e.b ELSE e.a END AS w
      FROM e JOIN deg da ON da.v = e.a JOIN deg db ON db.v = e.b
    ),
    tri AS (
      SELECT x.u, x.w AS p, y.w AS q
      FROM o x JOIN o y ON x.u = y.u AND x.w < y.w
      WHERE EXISTS (SELECT 1 FROM e WHERE e.a = x.w AND e.b = y.w)
    ),
    perv AS (
      SELECT v, CAST(count(*) AS BIGINT) AS nt FROM (
        SELECT u AS v FROM tri UNION ALL SELECT p FROM tri
        UNION ALL SELECT q FROM tri) GROUP BY v
    )
    SELECT deg.v AS id, CAST(deg.d AS BIGINT) AS degree,
           coalesce(perv.nt, 0) AS n_triangles,
           round(CASE WHEN deg.d >= 2
                 THEN coalesce(perv.nt, 0) / (deg.d * (deg.d - 1) / 2.0)
                 ELSE 0.0 END, 6) AS coeff
    FROM deg LEFT JOIN perv ON perv.v = deg.v
    """,
)
def q387_graph_slice_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q158's per-vertex clustering coefficients gated on the
    deterministic 1/30 orderkey slice — the 30x correctness signal for
    the wedge/triangle machinery (operators/graph.clustering_
    coefficients) that the full-graph oracle cannot provide at sf3
    (section header). Identical operator, identical edge construction;
    only the basket universe is sliced."""
    from etl_jetro_spark.operators.graph import clustering_coefficients

    return clustering_coefficients(_sliced_copurchase_edges(spark, sf_dir))


def _sliced_pagerank_oracle_sql(iters: int = 5) -> str:
    base = _pagerank_oracle_sql(iters)
    return base.replace(
        "WITH bsk AS (SELECT l_orderkey, l_partkey FROM lineitem\n"
        "                 GROUP BY l_orderkey, l_partkey)",
        "WITH bsk AS (SELECT l_orderkey, l_partkey FROM lineitem\n"
        f"                 WHERE {_GRAPH_SLICE}\n"
        "                 GROUP BY l_orderkey, l_partkey)",
    )


@query("q388_graph_slice_pagerank", _sliced_pagerank_oracle_sql(5))
def q388_graph_slice_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q178's fixed-iteration PageRank (operators/graph.pagerank, 5
    rounds, beta=0.85) gated on the deterministic 1/30 orderkey slice —
    the 30x signal for the iterative join-and-combine rank machinery
    (section header). The oracle unrolls the same five synchronous
    iterations over the sliced edge frame."""
    from etl_jetro_spark.operators.graph import pagerank

    pr = pagerank(
        _sliced_copurchase_edges(spark, sf_dir), iterations=5, damping=0.85
    )
    return pr.select("id", F.round("rank", 6).alias("rank"))


@query(
    "q389_graph_slice_bfs",
    f"""
    WITH b AS (SELECT l_orderkey, l_partkey FROM lineitem
               WHERE {_GRAPH_SLICE}
               GROUP BY l_orderkey, l_partkey),
    e1 AS (
      SELECT a.l_partkey AS u, c.l_partkey AS v
      FROM b a JOIN b c
        ON a.l_orderkey = c.l_orderkey AND a.l_partkey <> c.l_partkey
      GROUP BY 1, 2
    ),
    deg AS (SELECT u, CAST(count(*) AS BIGINT) AS d FROM e1 GROUP BY u),
    seed AS (SELECT u FROM deg ORDER BY d DESC, u LIMIT 1),
    f1 AS (SELECT DISTINCT e1.v FROM e1 JOIN seed ON seed.u = e1.u
           WHERE e1.v NOT IN (SELECT u FROM seed)),
    vis1 AS (SELECT u FROM seed UNION SELECT v FROM f1),
    f2 AS (SELECT DISTINCT e1.v FROM e1 JOIN f1 ON f1.v = e1.u
           WHERE e1.v NOT IN (SELECT u FROM vis1)),
    vis2 AS (SELECT u FROM vis1 UNION SELECT v FROM f2),
    f3 AS (SELECT DISTINCT e1.v FROM e1 JOIN f2 ON f2.v = e1.u
           WHERE e1.v NOT IN (SELECT u FROM vis2))
    SELECT r.round,
           CASE r.round
             WHEN 1 THEN (SELECT CAST(count(*) AS BIGINT) FROM f1)
             WHEN 2 THEN (SELECT CAST(count(*) AS BIGINT) FROM f2)
             ELSE (SELECT CAST(count(*) AS BIGINT) FROM f3) END AS frontier,
           CASE r.round
             WHEN 1 THEN (SELECT CAST(count(*) AS BIGINT) FROM vis1)
             WHEN 2 THEN (SELECT CAST(count(*) AS BIGINT) FROM vis2)
             ELSE (SELECT CAST(count(*) AS BIGINT) FROM vis2)
                  + (SELECT CAST(count(*) AS BIGINT) FROM f3) END AS visited
    FROM (SELECT 1 AS round UNION ALL SELECT 2 UNION ALL SELECT 3) r
    """,
)
def q389_graph_slice_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q236's three synchronous BFS rounds gated on the deterministic
    1/30 orderkey slice — the 30x signal for the frontier-expansion
    machinery (section header). Shares q236's exact implementation via
    _bfs3_frontier_counts: per-round checkpointed frontier joins and
    anti-joins, seed = highest-degree vertex of the SLICED graph."""
    li = load(spark, sf_dir, "lineitem").filter(F.expr(_GRAPH_SLICE))
    return _bfs3_frontier_counts(li)


# --------------------------------------------------------------------------
# 37. Round-11 wave: cross-lingual corpus composition
#     (the thin family a multilingual training-data platform reads before
#     fixing a mixture: language-mix entropy per source, language-ID
#     confusion against declared labels, character-class composition,
#     and the stopword cross-hit matrix behind the lang-ID heuristic)
# --------------------------------------------------------------------------

@query(
    "q390_source_lang_mix_entropy",
    """
    WITH per AS (
      SELECT source, lang, CAST(count(*) AS BIGINT) AS c
      FROM documents GROUP BY 1, 2),
    tot AS (
      SELECT source, CAST(sum(c) AS BIGINT) AS n,
             CAST(count(*) AS BIGINT) AS n_langs
      FROM per GROUP BY 1),
    dom AS (
      SELECT source, lang AS dominant_lang, c AS cmax
      FROM (SELECT per.*, row_number() OVER (PARTITION BY source
                                             ORDER BY c DESC, lang) AS rn
            FROM per)
      WHERE rn = 1),
    ent AS (
      SELECT per.source,
             round(-sum((c / CAST(n AS DOUBLE))
                        * ln(c / CAST(n AS DOUBLE))), 6) AS lang_entropy
      FROM per JOIN tot USING (source) GROUP BY 1)
    SELECT tot.source, tot.n AS n_docs, tot.n_langs,
           dom.dominant_lang,
           round(dom.cmax / CAST(tot.n AS DOUBLE), 6) AS dominant_share,
           ent.lang_entropy
    FROM tot JOIN dom USING (source) JOIN ent USING (source)
    """,
)
def q390_source_lang_mix_entropy(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Language-mix profile per source: language count, dominant
    language (count desc, lang asc tiebreak — an integer rank key),
    dominant share, and the Shannon entropy of the language
    distribution — the monolingual-vs-mixed classification a curator
    applies to every source before assigning it a per-language
    cleaning pipeline. Doc counts are exact BIGINTs; entropy is a
    ≤#langs-term sum of ln() terms, OUTPUT-ONLY under the 6 dp round
    (the q386 ln precedent — no decision consumes it). One
    (source, lang) partial-agg pass; everything after is
    #sources-bounded."""
    d = load(spark, sf_dir, "documents")
    per = d.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    tot = per.groupBy("source").agg(
        F.sum("c").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_langs"),
    )
    dom = per.groupBy("source").agg(
        F.min_by(
            F.col("lang"), F.struct(-F.col("c"), F.col("lang"))
        ).alias("dominant_lang"),
        F.max("c").cast("long").alias("cmax"),
    )
    p = F.col("c") / F.col("n").cast("double")
    ent = (
        per.join(bcast_small(tot.select("source", "n")), "source")
        .groupBy("source")
        .agg(F.round(-F.sum(p * F.log(p)), 6).alias("lang_entropy"))
    )
    return (
        tot.join(bcast_small(dom), "source")
        .join(bcast_small(ent), "source")
        .select(
            "source",
            F.col("n").alias("n_docs"),
            "n_langs",
            "dominant_lang",
            F.round(
                F.col("cmax") / F.col("n").cast("double"), 6
            ).alias("dominant_share"),
            "lang_entropy",
        )
    )


@query(
    "q391_langid_margin_audit",
    f"""
    WITH hits AS (
      SELECT doc_id, lang,
             len(list_filter(string_split({DK_NORM_TEXT}, ' '),
                             x -> list_contains({_dk_stop_list('en')}, x))) AS h_en,
             len(list_filter(string_split({DK_NORM_TEXT}, ' '),
                             x -> list_contains({_dk_stop_list('es')}, x))) AS h_es,
             len(list_filter(string_split({DK_NORM_TEXT}, ' '),
                             x -> list_contains({_dk_stop_list('de')}, x))) AS h_de,
             len(list_filter(string_split({DK_NORM_TEXT}, ' '),
                             x -> list_contains({_dk_stop_list('fr')}, x))) AS h_fr
      FROM documents
    ),
    m AS (
      SELECT doc_id, lang,
             greatest(h_en, h_es, h_de, h_fr) AS best,
             list_reverse_sort([h_en, h_es, h_de, h_fr])[2] AS second,
             CASE
               WHEN greatest(h_en, h_es, h_de, h_fr) = 0 THEN 'und'
               WHEN h_en = greatest(h_en, h_es, h_de, h_fr) THEN 'en'
               WHEN h_es = greatest(h_en, h_es, h_de, h_fr) THEN 'es'
               WHEN h_de = greatest(h_en, h_es, h_de, h_fr) THEN 'de'
               ELSE 'fr'
             END AS predicted_lang
      FROM hits
    )
    SELECT lang AS declared_lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN predicted_lang = lang THEN 1 ELSE 0 END)
                AS BIGINT) AS n_match,
           CAST(sum(CASE WHEN best > 0 AND best = second THEN 1 ELSE 0 END)
                AS BIGINT) AS n_ambiguous,
           CAST(sum(CASE WHEN best = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_und,
           round(sum(CASE WHEN predicted_lang = lang THEN 1 ELSE 0 END)
                 / CAST(count(*) AS DOUBLE), 6) AS match_rate,
           round(CAST(sum(best - second) AS DOUBLE) / count(*), 6)
             AS mean_margin
    FROM m GROUP BY 1
    """,
)
def q391_langid_margin_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID CONFIDENCE audit per declared language: match rate
    against the q25 stopword heuristic plus the two signals the q231
    confusion matrix cannot show — how many docs the detector decided
    on a TIE (best = second-best hit count: the prediction is the
    en > es > de > fr priority order, not evidence) and the mean
    top-2 hit margin (the evidence gap behind a decision). A high
    match rate with near-zero margin means the labels agree with a
    coin flip — route by threshold on margin, not on the argmax. Hit
    counts ride the codegen regex path; best/second come from one
    4-element sort of exact integers; one corpus pass,
    #langs-bounded output."""
    from etl_jetro_spark.operators.textstats import (
        STOPWORD_SETS,
        stopword_hits,
    )

    d = load(spark, sf_dir, "documents")
    hits = {lg: stopword_hits("text", lg) for lg in STOPWORD_SETS}
    arr = F.sort_array(
        F.array(*[h.cast("long") for h in hits.values()]), asc=False
    )
    best, second = arr[0], arr[1]
    m = d.select(
        F.col("lang").alias("declared_lang"),
        O.lang_id("text").alias("predicted_lang"),
        best.alias("best"),
        second.alias("second"),
    )
    return m.groupBy("declared_lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(
            (F.col("predicted_lang") == F.col("declared_lang")).cast("int")
        ).cast("long").alias("n_match"),
        F.sum(
            ((F.col("best") > 0) & (F.col("best") == F.col("second")))
            .cast("int")
        ).cast("long").alias("n_ambiguous"),
        F.sum((F.col("best") == 0).cast("int")).cast("long").alias("n_und"),
        F.round(
            F.sum(
                (F.col("predicted_lang") == F.col("declared_lang"))
                .cast("int")
            )
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("match_rate"),
        F.round(
            F.sum(F.col("best") - F.col("second")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("mean_margin"),
    )


@query(
    "q392_script_class_profile",
    """
    WITH per AS (
      SELECT source,
             CAST(sum(len(text)) AS BIGINT) AS n_chars,
             CAST(sum(len(text)
                  - len(regexp_replace(text, '[A-Za-z]', '', 'g')))
                  AS BIGINT) AS n_letter,
             CAST(sum(len(text)
                  - len(regexp_replace(text, '[0-9]', '', 'g')))
                  AS BIGINT) AS n_digit,
             CAST(sum(len(text)
                  - len(regexp_replace(text, '\\s', '', 'g')))
                  AS BIGINT) AS n_space
      FROM documents GROUP BY 1)
    SELECT source, n_chars,
           round(n_letter / CAST(n_chars AS DOUBLE), 6) AS letter_frac,
           round(n_digit  / CAST(n_chars AS DOUBLE), 6) AS digit_frac,
           round(n_space  / CAST(n_chars AS DOUBLE), 6) AS space_frac,
           round((n_chars - n_letter - n_digit - n_space)
                 / CAST(n_chars AS DOUBLE), 6) AS other_frac
    FROM per
    """,
)
def q392_script_class_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-class composition per source: letter / digit /
    whitespace / other mass fractions — the script-mix screen that
    flags a source whose composition drifts from its declared language
    profile (a "zh" feed with zero non-ASCII, a prose source turning
    80% digits). Class counts are EXACT integers (length minus
    length-after-delete, the q24 feature pattern — no per-char explode,
    one codegen regexp per class); each fraction is one division under
    the 6 dp round. One partial-agg pass; output #sources-bounded."""
    d = load(spark, sf_dir, "documents")
    t = F.col("text")
    n_letter = F.length(t) - F.length(F.regexp_replace(t, "[A-Za-z]", ""))
    n_digit = F.length(t) - F.length(F.regexp_replace(t, "[0-9]", ""))
    n_space = F.length(t) - F.length(F.regexp_replace(t, r"\s", ""))
    per = d.groupBy("source").agg(
        F.sum(F.length(t)).cast("long").alias("n_chars"),
        F.sum(n_letter).cast("long").alias("n_letter"),
        F.sum(n_digit).cast("long").alias("n_digit"),
        F.sum(n_space).cast("long").alias("n_space"),
    )
    nc = F.col("n_chars").cast("double")
    return per.select(
        "source",
        "n_chars",
        F.round(F.col("n_letter") / nc, 6).alias("letter_frac"),
        F.round(F.col("n_digit") / nc, 6).alias("digit_frac"),
        F.round(F.col("n_space") / nc, 6).alias("space_frac"),
        F.round(
            (
                F.col("n_chars") - F.col("n_letter") - F.col("n_digit")
                - F.col("n_space")
            )
            / nc,
            6,
        ).alias("other_frac"),
    )


@query(
    "q393_stopword_crosshit_matrix",
    f"""
    WITH h AS (
      SELECT lang,
             CAST(sum(CASE WHEN trim(text) = '' THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\\s+'))
                  END) AS BIGINT) AS n_tokens,
             CAST(sum(len(list_filter(string_split({DK_NORM_TEXT}, ' '),
                  x -> list_contains({_dk_stop_list('en')}, x))))
                  AS BIGINT) AS h_en,
             CAST(sum(len(list_filter(string_split({DK_NORM_TEXT}, ' '),
                  x -> list_contains({_dk_stop_list('es')}, x))))
                  AS BIGINT) AS h_es,
             CAST(sum(len(list_filter(string_split({DK_NORM_TEXT}, ' '),
                  x -> list_contains({_dk_stop_list('de')}, x))))
                  AS BIGINT) AS h_de,
             CAST(sum(len(list_filter(string_split({DK_NORM_TEXT}, ' '),
                  x -> list_contains({_dk_stop_list('fr')}, x))))
                  AS BIGINT) AS h_fr
      FROM documents GROUP BY 1)
    SELECT lang AS declared_lang, t.stop_set, t.hits, h.n_tokens,
           round(1000.0 * t.hits / h.n_tokens, 6) AS hits_per_1k_tokens
    FROM h, LATERAL (VALUES
      ('en', h_en), ('es', h_es), ('de', h_de), ('fr', h_fr))
      AS t(stop_set, hits)
    """,
)
def q393_stopword_crosshit_matrix(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Stopword cross-hit matrix: for every declared language, the hit
    rate (per 1000 whitespace tokens) of EACH language's stopword set —
    the #langs x #sets signal matrix underneath the q25/q231/q391 lang-ID
    heuristic; off-diagonal mass is exactly where the classifier's
    confusion comes from, so this is the table that says whether to fix
    the stopword lists or distrust the labels. Hit counts ride the
    codegen regex path (textstats.stopword_hits); all counts exact
    BIGINT, one division per cell, melted to rows by the U1 unpivot."""
    from etl_jetro_spark.operators.textstats import (
        STOPWORD_SETS,
        stopword_hits,
        token_count,
    )

    d = load(spark, sf_dir, "documents")
    aggs = [F.sum(token_count("text")).cast("long").alias("n_tokens")] + [
        F.sum(stopword_hits("text", lg)).cast("long").alias(f"h_{lg}")
        for lg in STOPWORD_SETS
    ]
    h = d.groupBy(F.col("lang").alias("declared_lang")).agg(*aggs)
    stack = ", ".join(f"'{lg}', h_{lg}" for lg in STOPWORD_SETS)
    m = h.select(
        "declared_lang",
        "n_tokens",
        F.expr(
            f"stack({len(STOPWORD_SETS)}, {stack}) AS (stop_set, hits)"
        ),
    )
    return m.select(
        "declared_lang",
        "stop_set",
        "hits",
        "n_tokens",
        F.round(
            F.lit(1000.0) * F.col("hits") / F.col("n_tokens"), 6
        ).alias("hits_per_1k_tokens"),
    )


# --------------------------------------------------------------------------
# 38. Round-11 wave: tokenizer-fertility economics
#     (tokens-per-byte is the unit price of a mixture: it converts a
#     byte-denominated storage/egress budget into the token-denominated
#     training budget, per source and per language)
# --------------------------------------------------------------------------

@query(
    "q394_tokenizer_fertility",
    """
    WITH per AS (
      SELECT lang,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(strlen(text)) AS BIGINT) AS n_bytes,
             CAST(sum(CASE WHEN trim(text) = '' THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\\s+'))
                  END) AS BIGINT) AS ws_tokens,
             CAST(sum(len(regexp_extract_all(text,
                  '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))) AS BIGINT)
               AS bpe_tokens
      FROM documents GROUP BY 1)
    SELECT lang, n_docs, n_bytes, ws_tokens, bpe_tokens,
           round(bpe_tokens / CAST(ws_tokens AS DOUBLE), 6) AS fertility,
           round(1000.0 * bpe_tokens / n_bytes, 6) AS tokens_per_kb,
           round(n_bytes / CAST(bpe_tokens AS DOUBLE), 6) AS bytes_per_token
    FROM per
    """,
)
def q394_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility per language: BPE-ish subword tokens per
    whitespace word (fertility — the multiplier a subword tokenizer
    pays on morphology-rich or script-dense text), tokens per KB, and
    bytes per token — the conversion table between a byte-denominated
    corpus budget and the token budget training actually consumes.
    Complements q186 (chars per NORMALIZED word — the segmentation
    symptom dashboard): this one prices the SUBWORD axis and the raw
    byte axis, which is what storage and training bills denominate.
    Byte counts via octet_length (UTF-8 bytes, not code points — the
    number storage bills); both token counts ride codegen regex
    (textstats.token_count / bpe_ish_token_count). All sums exact
    BIGINT; three divisions under the 6 dp round. One corpus pass,
    #langs-bounded output."""
    from etl_jetro_spark.operators.textstats import (
        bpe_ish_token_count,
        token_count,
    )

    d = load(spark, sf_dir, "documents")
    per = d.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.octet_length("text")).cast("long").alias("n_bytes"),
        F.sum(token_count("text")).cast("long").alias("ws_tokens"),
        F.sum(bpe_ish_token_count("text")).cast("long").alias("bpe_tokens"),
    )
    return per.select(
        "lang", "n_docs", "n_bytes", "ws_tokens", "bpe_tokens",
        F.round(
            F.col("bpe_tokens") / F.col("ws_tokens").cast("double"), 6
        ).alias("fertility"),
        F.round(
            F.lit(1000.0) * F.col("bpe_tokens") / F.col("n_bytes"), 6
        ).alias("tokens_per_kb"),
        F.round(
            F.col("n_bytes") / F.col("bpe_tokens").cast("double"), 6
        ).alias("bytes_per_token"),
    )


@query(
    "q395_token_budget_pricing",
    """
    WITH per AS (
      SELECT source,
             CAST(sum(strlen(text)) AS BIGINT) AS n_bytes,
             CAST(sum(len(regexp_extract_all(text,
                  '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))) AS BIGINT)
               AS n_tokens
      FROM documents GROUP BY 1),
    tot AS (
      SELECT CAST(sum(n_bytes) AS BIGINT) AS tb,
             CAST(sum(n_tokens) AS BIGINT) AS tt
      FROM per)
    SELECT per.source, per.n_bytes, per.n_tokens,
           round(per.n_tokens / CAST(tot.tt AS DOUBLE), 6) AS token_share,
           round(per.n_bytes / CAST(tot.tb AS DOUBLE), 6) AS byte_share,
           round(1000.0 * per.n_tokens / per.n_bytes, 6) AS tokens_per_kb,
           CAST(row_number() OVER (
             ORDER BY round(1000.0 * per.n_tokens / per.n_bytes, 12) DESC,
                      per.source) AS BIGINT) AS density_rank
    FROM per CROSS JOIN tot
    """,
)
def q395_token_budget_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture pricing sheet per source: token share vs byte share of
    the corpus (a source whose token share exceeds its byte share is
    token-dense — cheap training mass per stored byte) and the
    density rank that orders sources by tokens-per-KB. The rank key is
    the 12 dp-rounded density with a source tiebreak (ranklint
    discipline: the density is one division of exact BIGINTs —
    bit-identical cross-engine — and the round still pins the
    contract); shares are exact-integer ratios under the 6 dp round.
    One corpus pass; the rank is a #sources^2 non-equi self-join on
    bcast_small frames — never a SinglePartition window (the planlint
    contract; the oracle's row_number is DuckDB-local where single-node
    is the point)."""
    from etl_jetro_spark.operators.textstats import bpe_ish_token_count

    d = load(spark, sf_dir, "documents")
    per = d.groupBy("source").agg(
        F.sum(F.octet_length("text")).cast("long").alias("n_bytes"),
        F.sum(bpe_ish_token_count("text")).cast("long").alias("n_tokens"),
    ).withColumn(
        "_d",
        F.round(F.lit(1000.0) * F.col("n_tokens") / F.col("n_bytes"), 12),
    )
    tot = per.agg(
        F.sum("n_bytes").cast("long").alias("tb"),
        F.sum("n_tokens").cast("long").alias("tt"),
    )
    b = per.select(F.col("source").alias("_s2"), F.col("_d").alias("_d2"))
    higher = (F.col("_d2") > F.col("_d")) | (
        (F.col("_d2") == F.col("_d")) & (F.col("_s2") < F.col("source"))
    )
    rank = (
        per.crossJoin(bcast_small(b))
        .groupBy("source")
        .agg(
            (F.sum(F.when(higher, 1).otherwise(0)) + 1)
            .cast("long")
            .alias("density_rank")
        )
    )
    return (
        per.crossJoin(bcast_small(tot))
        .join(bcast_small(rank), "source")
        .select(
            "source", "n_bytes", "n_tokens",
            F.round(
                F.col("n_tokens") / F.col("tt").cast("double"), 6
            ).alias("token_share"),
            F.round(
                F.col("n_bytes") / F.col("tb").cast("double"), 6
            ).alias("byte_share"),
            F.round(
                F.lit(1000.0) * F.col("n_tokens") / F.col("n_bytes"), 6
            ).alias("tokens_per_kb"),
            "density_rank",
        )
    )


@query(
    "q396_fertility_outlier_docs",
    """
    WITH per AS (
      SELECT doc_id, source,
             CAST(CASE WHEN trim(text) = '' THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\\s+'))
                  END AS BIGINT) AS ws_tokens,
             CAST(len(regexp_extract_all(text,
                  '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT)
               AS bpe_tokens
      FROM documents),
    r AS (
      SELECT doc_id, source, ws_tokens, bpe_tokens,
             round(bpe_tokens / CAST(ws_tokens AS DOUBLE), 12) AS ratio
      FROM per WHERE ws_tokens >= 10)
    SELECT doc_id, source, ws_tokens, bpe_tokens,
           round(ratio, 6) AS fertility
    FROM r ORDER BY ratio DESC, doc_id LIMIT 20
    """,
)
def q396_fertility_outlier_docs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Top-20 fertility-outlier documents (BPE-ish tokens per
    whitespace word, docs with >= 10 words): the worklist a curator
    reads to find what inflates a source's token bill — markup
    explosions, number dumps, punctuation soup — before writing the
    cleaning rule. The rank key is the 12 dp-rounded per-doc ratio
    (one division of two exact row-local integers, so it is
    bit-identical cross-engine; the round pins the ranklint contract)
    with a doc_id tiebreak; top-k executes as TakeOrdered — per
    partition partial top-20, never a global sort."""
    from etl_jetro_spark.operators.textstats import (
        bpe_ish_token_count,
        token_count,
    )

    d = load(spark, sf_dir, "documents")
    per = d.select(
        "doc_id",
        "source",
        token_count("text").cast("long").alias("ws_tokens"),
        bpe_ish_token_count("text").cast("long").alias("bpe_tokens"),
    ).filter(F.col("ws_tokens") >= 10)
    r = per.withColumn(
        "ratio",
        F.round(
            F.col("bpe_tokens") / F.col("ws_tokens").cast("double"), 12
        ),
    )
    return (
        r.orderBy(F.col("ratio").desc(), F.col("doc_id").asc())
        .limit(20)
        .select(
            "doc_id", "source", "ws_tokens", "bpe_tokens",
            F.round("ratio", 6).alias("fertility"),
        )
    )


@query(
    "q397_fertility_by_length_decile",
    """
    WITH per AS (
      SELECT doc_id,
             CAST(strlen(text) AS BIGINT) AS n_bytes,
             CAST(CASE WHEN trim(text) = '' THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\\s+'))
                  END AS BIGINT) AS ws_tokens,
             CAST(len(regexp_extract_all(text,
                  '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT)
               AS bpe_tokens
      FROM documents WHERE trim(text) <> ''),
    rk AS (
      SELECT per.*,
             row_number() OVER (ORDER BY n_bytes, doc_id) AS rn,
             count(*) OVER () AS n
      FROM per),
    dec AS (
      SELECT CAST(((rn - 1) * 10) // n AS BIGINT) + 1 AS decile,
             n_bytes, ws_tokens, bpe_tokens
      FROM rk)
    SELECT decile,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_bytes) AS BIGINT) AS byte_sum,
           round(sum(bpe_tokens) / CAST(sum(ws_tokens) AS DOUBLE), 6)
             AS fertility,
           round(1000.0 * sum(bpe_tokens) / sum(n_bytes), 6)
             AS tokens_per_kb
    FROM dec GROUP BY 1
    """,
)
def q397_fertility_by_length_decile(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Fertility as a function of document length: global byte-size
    deciles (distributed rank frame — group_ranked with keys=[], the
    q313 range-partitioned parallel sort, never a SinglePartition
    window) with per-decile fertility and token density — the curve
    that tells a curator whether token inflation is a property of
    SHORT docs (headers, fragments) or LONG ones (dumps), i.e. whether
    a length cut is also a cost cut. Decile bucketing is the exact
    integer floor((rn-1)*10/n)+1; all sums exact BIGINT; divisions
    output-only at 6 dp."""
    from etl_jetro_spark.operators.aggregate import group_ranked
    from etl_jetro_spark.operators.textstats import (
        bpe_ish_token_count,
        token_count,
    )

    d = load(spark, sf_dir, "documents")
    per = d.filter(F.trim(F.col("text")) != "").select(
        "doc_id",
        F.octet_length("text").cast("long").alias("n_bytes"),
        token_count("text").cast("long").alias("ws_tokens"),
        bpe_ish_token_count("text").cast("long").alias("bpe_tokens"),
    )
    # doc_id is unique, so the trailing tiebreak columns never influence
    # the order — they just ride along in the rank frame's output
    # (group_ranked contract) instead of a join-back
    r = group_ranked(
        per, [], "n_bytes", tiebreak=["doc_id", "ws_tokens", "bpe_tokens"]
    )
    dec = r.select(
        (
            F.floor(((F.col("_rn") - 1) * 10) / F.col("_n")).cast("long")
            + 1
        ).alias("decile"),
        F.col("_v").alias("n_bytes"),
        "ws_tokens",
        "bpe_tokens",
    )
    return dec.groupBy("decile").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_bytes").cast("long").alias("byte_sum"),
        F.round(
            F.sum("bpe_tokens") / F.sum("ws_tokens").cast("double"), 6
        ).alias("fertility"),
        F.round(
            F.lit(1000.0) * F.sum("bpe_tokens") / F.sum("n_bytes"), 6
        ).alias("tokens_per_kb"),
    )


# --------------------------------------------------------------------------
# 39. Round-11 wave: streaming backfill / replay reconciliation audits
#     (the batch-side truth a streaming deployment reconciles against:
#     what a watermark-cut snapshot missed, what at-least-once replay
#     inflates, how many days back a backfill must rewrite, and where
#     the replay left holes in the id space)
# --------------------------------------------------------------------------

@query(
    "q398_replay_reconciliation",
    """
    WITH cut AS (
      SELECT (max(event_id) * 4) // 5 AS c FROM events),
    per AS (
      SELECT epoch_ns(ts) // 86400000000000 AS day,
             event_type,
             CAST(count(*) AS BIGINT) AS final_n,
             CAST(sum(CASE WHEN event_id <= cut.c THEN 1 ELSE 0 END)
                  AS BIGINT) AS snap_n,
             sum(CAST(round(value * 1000000) AS HUGEINT)) AS vfinal,
             sum(CASE WHEN event_id <= cut.c
                      THEN CAST(round(value * 1000000) AS HUGEINT)
                      ELSE 0 END) AS vsnap
      FROM events CROSS JOIN cut
      GROUP BY 1, 2)
    SELECT CAST(day AS BIGINT) AS day, event_type, final_n, snap_n,
           final_n - snap_n AS late_n,
           round((final_n - snap_n) / CAST(final_n AS DOUBLE), 6)
             AS late_frac,
           round(CAST(vfinal - vsnap AS DOUBLE) / 1000000.0, 6)
             AS value_correction
    FROM per
    """,
)
def q398_replay_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-vs-replay reconciliation: freeze a snapshot at an
    arrival-order cutoff (event_id, the arrival proxy, at 80% of the
    stream — computed as exact integer (max*4) div 5 on both engines)
    and diff the per-(day, event_type) aggregates a streaming job would
    have emitted at the cut against the full-replay truth — the late_n
    / value_correction table IS the backfill work-order a reconciler
    files. Value corrections ride exact 1e-6 integer units
    (decimal(38,0) / HUGEINT accumulators — the q385 pattern) so the
    diff of two big sums never touches a float fold. One grouped pass
    with conditional aggregates; the cutoff is a 1-row broadcast."""
    e = load_events(spark, sf_dir)
    cut = e.agg(
        F.expr("(max(event_id) * 4) div 5").cast("long").alias("c")
    )
    vm = F.round(F.col("value") * 1000000).cast("decimal(38,0)")
    per = (
        e.crossJoin(bcast_small(cut))
        .groupBy(
            F.expr("ts div 86400000000000").cast("long").alias("day"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("final_n"),
            F.sum(
                F.when(F.col("event_id") <= F.col("c"), 1).otherwise(0)
            ).cast("long").alias("snap_n"),
            F.sum(vm).alias("vfinal"),
            F.sum(
                F.when(F.col("event_id") <= F.col("c"), vm).otherwise(
                    F.lit(0).cast("decimal(38,0)")
                )
            ).alias("vsnap"),
        )
    )
    return per.select(
        "day",
        "event_type",
        "final_n",
        "snap_n",
        (F.col("final_n") - F.col("snap_n")).cast("long").alias("late_n"),
        F.round(
            (F.col("final_n") - F.col("snap_n"))
            / F.col("final_n").cast("double"),
            6,
        ).alias("late_frac"),
        F.round(
            (F.col("vfinal") - F.col("vsnap")).cast("double") / 1000000.0,
            6,
        ).alias("value_correction"),
    )


@query(
    "q399_duplicate_replay_audit",
    """
    WITH raw AS (
      SELECT event_id, event_type, value FROM events
      UNION ALL
      SELECT event_id, event_type, value FROM events
      WHERE event_id % 50 = 7),
    rawagg AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS raw_n,
             sum(CAST(round(value * 1000000) AS HUGEINT)) AS raw_v
      FROM raw GROUP BY 1),
    ded AS (
      SELECT event_type, event_id,
             CAST(round(min(value) * 1000000) AS HUGEINT) AS v
      FROM raw GROUP BY 1, 2),
    dedagg AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS dedup_n,
             sum(v) AS dedup_v
      FROM ded GROUP BY 1)
    SELECT r.event_type, r.raw_n, d.dedup_n,
           r.raw_n - d.dedup_n AS dup_n,
           round(CAST(r.raw_v - d.dedup_v AS DOUBLE) / 1000000.0, 6)
             AS value_inflation,
           round((r.raw_n - d.dedup_n) / CAST(d.dedup_n AS DOUBLE), 6)
             AS dup_rate
    FROM rawagg r JOIN dedagg d USING (event_type)
    """,
)
def q399_duplicate_replay_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """At-least-once replay audit: a deterministic duplicate stream
    (every event_id = 7 mod 50 delivered twice — the union simulates a
    redelivery storm) aggregated RAW vs through the idempotent
    event_id-keyed dedup a streaming sink must apply — the
    value_inflation column is exactly the money a naive at-least-once
    consumer over-counts, and dup_rate is the redelivery pressure the
    state store must absorb. The dedup is one event_id-keyed partial
    agg (duplicates are byte-identical, min(value) = the value); all
    value mass rides exact 1e-6 integer units."""
    e = load_events(spark, sf_dir)
    base = e.select("event_id", "event_type", "value")
    raw = base.unionAll(base.filter(F.col("event_id") % 50 == 7))
    vm = F.round(F.col("value") * 1000000).cast("decimal(38,0)")
    rawagg = raw.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("raw_n"),
        F.sum(vm).alias("raw_v"),
    )
    ded = raw.groupBy("event_type", "event_id").agg(
        F.round(F.min("value") * 1000000).cast("decimal(38,0)").alias("v")
    )
    dedagg = ded.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("dedup_n"),
        F.sum("v").alias("dedup_v"),
    )
    return rawagg.join(dedagg, "event_type").select(
        "event_type",
        "raw_n",
        "dedup_n",
        (F.col("raw_n") - F.col("dedup_n")).cast("long").alias("dup_n"),
        F.round(
            (F.col("raw_v") - F.col("dedup_v")).cast("double") / 1000000.0,
            6,
        ).alias("value_inflation"),
        F.round(
            (F.col("raw_n") - F.col("dedup_n"))
            / F.col("dedup_n").cast("double"),
            6,
        ).alias("dup_rate"),
    )


@query(
    "q400_backfill_depth_histogram",
    """
    WITH arr AS (
      SELECT epoch_ns(ts) // 86400000000000 AS ev_day,
             (epoch_ns(ts)
              + CASE WHEN user_id % 20 = 3 THEN 172800000000000
                     WHEN user_id % 20 = 4 THEN 21600000000000
                     ELSE 0 END) // 86400000000000 AS arr_day,
             CAST(round(value * 1000000) AS HUGEINT) AS vm
      FROM events),
    d AS (
      SELECT least(arr_day - ev_day, 3) AS depth, vm FROM arr),
    agg AS (
      SELECT depth, CAST(count(*) AS BIGINT) AS n_events,
             sum(vm) AS v
      FROM d GROUP BY 1),
    tot AS (SELECT CAST(sum(n_events) AS BIGINT) AS tn,
                   sum(v) AS tv FROM agg)
    SELECT CAST(agg.depth AS BIGINT) AS backfill_days,
           agg.n_events,
           round(agg.n_events / CAST(tot.tn AS DOUBLE), 6) AS event_share,
           round(CAST(agg.v AS DOUBLE) / CAST(tot.tv AS DOUBLE), 6)
             AS value_share
    FROM agg CROSS JOIN tot
    """,
)
def q400_backfill_depth_histogram(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Backfill-depth histogram under a deterministic late-delivery
    simulation (the q399 pattern — the synthetic stream itself is
    perfectly in-order, so the delay schedule is injected): one user
    cohort (user_id = 3 mod 20) delivers 48 h late, another (4 mod 20)
    6 h late, the rest on time. For every event the backfill depth is
    arrival-day minus event-day — the number of days BACK the
    aggregate rewrite lands when the event finally shows up — and the
    per-depth event/value-mass shares are the table that sizes a
    backfill window: what fraction of events AND money a 1-day rewrite
    captures vs 2-day (q370's watermark audit answers drops; this
    answers rewrites). The 6 h cohort straddles midnight, so depth 0/1
    splits by time-of-day, exercising the boundary. Day arithmetic is
    exact integer ns; value mass rides exact 1e-6 units; one grouped
    pass, depth-bounded output."""
    e = load_events(spark, sf_dir)
    # integer `div` throughout: epoch-ns magnitudes exceed double's
    # exact range, so a float division could misbin a midnight-edge ns
    arr_day = F.expr(
        "(ts + CASE WHEN user_id % 20 = 3 THEN 172800000000000"
        " WHEN user_id % 20 = 4 THEN 21600000000000"
        " ELSE 0 END) div 86400000000000"
    )
    d = e.select(
        F.least(
            arr_day - F.expr("(ts div 86400000000000)"),
            F.lit(3),
        ).cast("long").alias("depth"),
        F.round(F.col("value") * 1000000)
        .cast("decimal(38,0)")
        .alias("vm"),
    )
    agg = d.groupBy("depth").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum("vm").alias("v"),
    )
    tot = agg.agg(
        F.sum("n_events").cast("long").alias("tn"), F.sum("v").alias("tv")
    )
    return agg.crossJoin(bcast_small(tot)).select(
        F.col("depth").alias("backfill_days"),
        "n_events",
        F.round(
            F.col("n_events") / F.col("tn").cast("double"), 6
        ).alias("event_share"),
        F.round(
            F.col("v").cast("double") / F.col("tv").cast("double"), 6
        ).alias("value_share"),
    )


@query(
    "q401_replay_hole_audit",
    """
    WITH per AS (
      SELECT epoch_ns(ts) // 86400000000000 AS day,
             CAST(count(*) AS BIGINT) AS n_events,
             CAST(min(event_id) AS BIGINT) AS id_min,
             CAST(max(event_id) AS BIGINT) AS id_max
      FROM events GROUP BY 1)
    SELECT CAST(day AS BIGINT) AS day, n_events, id_min, id_max,
           id_max - id_min + 1 AS id_span,
           id_max - id_min + 1 - n_events AS holes,
           round(n_events / CAST(id_max - id_min + 1 AS DOUBLE), 6)
             AS contiguity
    FROM per
    """,
)
def q401_replay_hole_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay-hole audit per day: the day's event_id range vs its event
    count — holes = ids inside the day's span that landed on OTHER days
    (out-of-order arrivals) or never arrived at all. A replay that
    reproduces a day should reproduce its contiguity number exactly;
    a contiguity drop after an incident replay is the fingerprint of
    lost or misrouted events. Pure exact-integer aggregation, one
    grouped pass, #days-bounded output."""
    e = load_events(spark, sf_dir)
    per = e.groupBy(
        F.expr("ts div 86400000000000").cast("long").alias("day")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.min("event_id").cast("long").alias("id_min"),
        F.max("event_id").cast("long").alias("id_max"),
    )
    span = (F.col("id_max") - F.col("id_min") + 1).cast("long")
    return per.select(
        "day", "n_events", "id_min", "id_max",
        span.alias("id_span"),
        (span - F.col("n_events")).cast("long").alias("holes"),
        F.round(F.col("n_events") / span.cast("double"), 6).alias(
            "contiguity"
        ),
    )
