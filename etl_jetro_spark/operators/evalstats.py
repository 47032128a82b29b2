"""Evaluation & calibration statistics operators.

The model-eval / data-audit layer of a training-data platform:
calibration of quality scores (Brier decomposition, ECE), multiple-
testing control across per-source audits (Benjamini-Hochberg, Holm),
paired classifier tests (McNemar, Cochran's Q), blocked rank tests
(Friedman), distribution-free coverage guarantees (split conformal),
and second-moment machinery for embedding-geometry diagnostics
(participation ratio, linear CKA).

Engine-portability rules (the 30x-oracle-gate lessons, see SCALE.md):

- every DECISION (rank, threshold, argmax) is made either on exact
  integers or on doubles produced by an identical IEEE operation
  sequence on both engines, rounded (12 dp) before the comparison;
- money/probability/embedding values are quantized to integer units at
  the row level and aggregated as BIGINT/DECIMAL(38,0) (Spark) vs
  HUGEINT (DuckDB), so no float fold-order ever reaches an aggregate;
- the only non-correctly-rounded primitive used is exp() (the normal
  CDF polynomial); its 1-ulp cross-engine wobble is absorbed by the
  12 dp round before any consumer.

Reference parity: the reference repo (an ETL/reporting engine — see
SURVEY §2) has no statistics layer; this module extends the engine
along the training-data-platform axis the project brief names as
first-class (quality-score calibration before a 100 TB filter pass,
per-source audit families, paired gate agreement).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from etl_jetro_spark.operators.aggregate import group_ranked
from etl_jetro_spark.plans.hints import bcast_small

# ---------------------------------------------------------------------------
# Normal CDF (Abramowitz & Stegun 26.2.17) — portable Spark SQL / DuckDB
# ---------------------------------------------------------------------------

# |error| < 7.5e-8 over the real line; elementary ops only (abs, exp, *,
# +), valid verbatim in both Spark SQL and DuckDB. Consumers MUST round
# before comparing across engines: exp() is not guaranteed correctly
# rounded on either side, so the last ~1 ulp may differ.
_AS_B = ("0.319381530", "-0.356563782", "1.781477937",
         "-1.821255978", "1.330274429")
_INV_SQRT_2PI = "0.3989422804014327"


def two_sided_p_sql(z: str) -> str:
    """``2 * (1 - Phi(|z|))`` as a SQL fragment valid in both Spark SQL
    and DuckDB — the two-sided normal p-value of the expression ``z``.
    Same operation sequence on both engines; round to 12 dp before any
    cross-engine comparison."""
    t = f"(1.0 / (1.0 + 0.2316419 * abs({z})))"
    b1, b2, b3, b4, b5 = _AS_B
    poly = (
        f"({t} * ({b1} + {t} * ({b2} + {t} * "
        f"({b3} + {t} * ({b4} + {t} * {b5})))))"
    )
    pdf = f"({_INV_SQRT_2PI} * exp(-0.5 * abs({z}) * abs({z})))"
    return f"(2.0 * {pdf} * {poly})"


def two_sided_p(z: Column) -> Column:
    """Column form of :func:`two_sided_p_sql` — mirrors the SQL fragment
    operation-for-operation so both engines produce the same double (up
    to exp()'s final ulp, handled by the caller's 12 dp round)."""
    az = F.abs(z)
    t = F.lit(1.0) / (F.lit(1.0) + F.lit(0.2316419) * az)
    b1, b2, b3, b4, b5 = (float(b) for b in _AS_B)
    poly = t * (
        F.lit(b1)
        + t * (F.lit(b2) + t * (F.lit(b3) + t * (F.lit(b4) + t * F.lit(b5))))
    )
    pdf = F.lit(float(_INV_SQRT_2PI)) * F.exp(F.lit(-0.5) * az * az)
    return F.lit(2.0) * pdf * poly


# ---------------------------------------------------------------------------
# Multiple-testing control over a BOUNDED hypothesis family
# ---------------------------------------------------------------------------

def bh_holm(
    df: DataFrame,
    key_cols: list[str],
    p_col: str,
    alpha: float,
) -> DataFrame:
    """Benjamini-Hochberg (step-up FDR) and Holm (step-down FWER)
    decisions over a family of hypotheses — one input row each.

    The family must be METADATA-SIZED (#sources, #nations, #configs —
    never data-scale): the procedure is a global sort by definition.
    It is implemented WITHOUT any global window (the planlint contract:
    Spark never WindowGroupLimit-prunes an empty partition spec) — the
    rank is 1 + count of lexicographically-smaller rows via a broadcast
    non-equi self-join, and every global scalar joins back broadcast;
    all frames stay m-bounded. ``p_col`` must already be engine-rounded
    (12 dp) so ranks agree across engines; ties break on ``key_cols``
    ascending (the (p, keys) tuple must be unique).

    Adds: ``m`` (family size), ``p_rank`` (1-based ascending),
    ``bh_reject`` (p_(i) <= alpha*i/m for some i >= rank, i.e. rank <=
    argmax passing index), ``holm_reject`` (p_(j) <= alpha/(m-j+1) for
    ALL j <= rank).
    """
    order_cols = [p_col, *key_cols]
    other = df.select(
        *[F.col(c).alias(f"_o_{c}") for c in order_cols]
    )
    # lexicographic (other < row) over (p, keys...), built innermost-out
    lt = F.lit(False)
    for c in reversed(order_cols):
        a, b = F.col(f"_o_{c}"), F.col(c)
        lt = (a < b) | ((a == b) & lt)
    ranked = (
        df.join(bcast_small(other), lt, "left")
        .groupBy(*df.columns)
        .agg(
            (F.count(F.col(f"_o_{p_col}")) + 1).cast("long").alias("p_rank")
        )
    )
    tot = df.agg(F.count(F.lit(1)).cast("long").alias("m"))
    ranked = ranked.crossJoin(bcast_small(tot))
    bh_ok = F.col(p_col) <= F.lit(alpha) * F.col("p_rank") / F.col("m")
    holm_ok = (
        F.col(p_col) <= F.lit(alpha) / (F.col("m") - F.col("p_rank") + 1)
    )
    flagged = ranked.withColumn("_bh_ok", bh_ok).withColumn(
        "_holm_ok", holm_ok.cast("int")
    )
    bhk = flagged.agg(
        F.max(F.when(F.col("_bh_ok"), F.col("p_rank"))).alias("_bh_k")
    )
    pre = flagged.select(
        F.col("p_rank").alias("_o_rank"), F.col("_holm_ok").alias("_o_ok")
    )
    holm = (
        flagged.join(bcast_small(pre), F.col("_o_rank") <= F.col("p_rank"))
        .groupBy(*[c for c in flagged.columns])
        .agg(F.min("_o_ok").alias("_holm_all"))
    )
    return (
        holm.crossJoin(bcast_small(bhk))
        .withColumn(
            "bh_reject",
            F.coalesce(F.col("p_rank") <= F.col("_bh_k"), F.lit(False)),
        )
        .withColumn("holm_reject", F.col("_holm_all") == 1)
        .drop("_bh_k", "_bh_ok", "_holm_ok", "_holm_all")
    )


# ---------------------------------------------------------------------------
# Calibration: Brier decomposition + ECE on 1e-6-unit probabilities
# ---------------------------------------------------------------------------

def brier_decomposition(
    df: DataFrame, prob6_col: str, label_col: str, n_bins: int = 10
) -> DataFrame:
    """Murphy (1973) decomposition of the Brier score of a binned
    probabilistic forecast, plus the expected calibration error.

    ``prob6_col``: forecast probability in EXACT 1e-6 integer units
    (BIGINT in [0, 1e6]); ``label_col``: 0/1 outcome. Rows are cut into
    ``n_bins`` fixed-width probability bins; the binned forecast is the
    bin's mean probability, for which ``brier_binned = reliability -
    resolution + uncertainty`` holds as an identity (the textbook test
    checks each term independently).

    Exactness: the raw Brier numerator sum((p6 - 1e6*y)^2), the ECE
    numerator sum_k |Sq_k - 1e6*Sy_k|, and every per-bin moment are
    exact integers carried as DECIMAL(38,0) (HUGEINT on the oracle
    side); reliability/resolution combine the 10 exact per-bin terms in
    double (bounded-count sum — static-wobble class, safe under the
    output round). One row out.
    """
    width = 1_000_000 // n_bins
    p6 = F.col(prob6_col).cast("long")
    y = F.col(label_col).cast("long")
    binned = df.select(
        F.least(F.floor(p6 / width), F.lit(n_bins - 1)).alias("_b"),
        p6.alias("_p6"),
        y.alias("_y"),
        ((p6 - 1_000_000 * y) * (p6 - 1_000_000 * y))
        .cast("decimal(38,0)")
        .alias("_se"),
    )
    per_bin = binned.groupBy("_b").agg(
        F.count(F.lit(1)).cast("long").alias("nk"),
        F.sum("_p6").cast("decimal(38,0)").alias("sq"),
        F.sum("_y").cast("long").alias("sy"),
        F.sum("_se").cast("decimal(38,0)").alias("sse"),
    )
    # global exact moments join back broadcast (never a global window —
    # the planlint contract)
    tot = per_bin.agg(
        F.sum("nk").alias("n"),
        F.sum("sy").alias("syall"),
        F.sum("sse").alias("sseall"),
    )
    g = per_bin.crossJoin(bcast_small(tot))
    # per-bin exact integer numerators, combined in double (n_bins terms)
    cal_num = F.col("sq").cast("double") - 1_000_000.0 * F.col(
        "sy"
    ).cast("double")
    res_num = (
        F.col("sy").cast("double") * F.col("n").cast("double")
        - F.col("syall").cast("double") * F.col("nk").cast("double")
    )
    agg = g.agg(
        F.max("n").alias("n"),
        F.max("syall").alias("syall"),
        F.max("sseall").cast("double").alias("sseall"),
        F.sum(cal_num * cal_num / F.col("nk").cast("double")).alias("reln"),
        F.sum(res_num * res_num / F.col("nk").cast("double")).alias("resn"),
        F.sum(F.abs(cal_num)).alias("ecen"),
    )
    n = F.col("n").cast("double")
    sy = F.col("syall").cast("double")
    rel = F.col("reln") / (F.lit(1e12) * n)
    res = F.col("resn") / (n * n * n)
    unc = sy * (n - sy) / (n * n)
    return agg.select(
        F.col("n").cast("long").alias("n_rows"),
        F.round(sy / n, 6).alias("base_rate"),
        F.round(F.col("sseall") / (F.lit(1e12) * n), 6).alias("brier"),
        F.round(rel, 6).alias("reliability"),
        F.round(res, 6).alias("resolution"),
        F.round(unc, 6).alias("uncertainty"),
        F.round(rel - res + unc, 6).alias("brier_binned"),
        F.round(F.col("ecen") / (F.lit(1e6) * n), 6).alias("ece"),
    )


def brier_decomposition_sql(
    rows_select: str, pre_ctes: str = "", n_bins: int = 10
) -> str:
    """DuckDB oracle mirror of :func:`brier_decomposition`.
    ``rows_select`` must be a SELECT yielding columns ``(p6, y)``
    (BIGINT 1e-6-unit probability, 0/1 label); ``pre_ctes`` optionally
    prepends comma-terminated CTE definitions it depends on. Returns a
    full query (same column names, same operation order — the bounded
    double sums combine identical exact-integer term values)."""
    width = 1_000_000 // n_bins
    return f"""
    WITH {pre_ctes}rows_in AS ({rows_select}),
    binned AS (
      SELECT least(CAST(floor(p6 / {width}) AS BIGINT), {n_bins - 1}) AS b,
             p6, y,
             CAST((p6 - 1000000 * y) * (p6 - 1000000 * y) AS HUGEINT) AS se
      FROM rows_in),
    per_bin AS (
      SELECT b, CAST(count(*) AS BIGINT) AS nk,
             CAST(sum(p6) AS HUGEINT) AS sq,
             CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(se) AS HUGEINT) AS sse
      FROM binned GROUP BY b),
    g AS (
      SELECT nk, sq, sy, sse,
             sum(nk) OVER () AS n,
             sum(sy) OVER () AS syall,
             sum(sse) OVER () AS sseall
      FROM per_bin),
    agg AS (
      SELECT max(n) AS n, max(syall) AS syall,
             CAST(max(sseall) AS DOUBLE) AS sseall,
             sum((CAST(sq AS DOUBLE) - 1000000.0 * CAST(sy AS DOUBLE))
                 * (CAST(sq AS DOUBLE) - 1000000.0 * CAST(sy AS DOUBLE))
                 / CAST(nk AS DOUBLE)) AS reln,
             sum((CAST(sy AS DOUBLE) * CAST(n AS DOUBLE)
                  - CAST(syall AS DOUBLE) * CAST(nk AS DOUBLE))
                 * (CAST(sy AS DOUBLE) * CAST(n AS DOUBLE)
                    - CAST(syall AS DOUBLE) * CAST(nk AS DOUBLE))
                 / CAST(nk AS DOUBLE)) AS resn,
             sum(abs(CAST(sq AS DOUBLE)
                     - 1000000.0 * CAST(sy AS DOUBLE))) AS ecen
      FROM g)
    SELECT CAST(n AS BIGINT) AS n_rows,
           round(CAST(syall AS DOUBLE) / n, 6) AS base_rate,
           round(sseall / (1e12 * n), 6) AS brier,
           round(reln / (1e12 * n), 6) AS reliability,
           round(resn / (CAST(n AS DOUBLE) * n * n), 6) AS resolution,
           round(CAST(syall AS DOUBLE) * (n - syall) / (CAST(n AS DOUBLE) * n),
                 6) AS uncertainty,
           round(reln / (1e12 * n)
                 - resn / (CAST(n AS DOUBLE) * n * n)
                 + CAST(syall AS DOUBLE) * (n - syall)
                   / (CAST(n AS DOUBLE) * n), 6) AS brier_binned,
           round(ecen / (1e6 * n), 6) AS ece
    FROM agg
    """


# ---------------------------------------------------------------------------
# Paired binary tests: McNemar, Cochran's Q — exact integer statistics
# ---------------------------------------------------------------------------

def mcnemar(df: DataFrame, a_ok: Column, b_ok: Column) -> DataFrame:
    """McNemar's test (continuity-corrected) on two paired binary
    outcomes: chi2 = (|b - c| - 1)^2 / (b + c) over the discordant
    counts. Exact integers until the single final division; one row
    out with the full 2x2 table."""
    t = df.select(a_ok.cast("int").alias("_a"), b_ok.cast("int").alias("_b"))
    agg = t.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(((F.col("_a") == 1) & (F.col("_b") == 1)).cast("long")).alias(
            "n_both"
        ),
        F.sum(((F.col("_a") == 1) & (F.col("_b") == 0)).cast("long")).alias(
            "n_only_a"
        ),
        F.sum(((F.col("_a") == 0) & (F.col("_b") == 1)).cast("long")).alias(
            "n_only_b"
        ),
        F.sum(((F.col("_a") == 0) & (F.col("_b") == 0)).cast("long")).alias(
            "n_neither"
        ),
    )
    b, c = F.col("n_only_a"), F.col("n_only_b")
    num = (F.abs(b - c) - 1) * (F.abs(b - c) - 1)
    return agg.select(
        "n",
        "n_both",
        "n_only_a",
        "n_only_b",
        "n_neither",
        F.when(
            b + c > 0,
            F.round(num.cast("double") / (b + c).cast("double"), 6),
        ).alias("chi2"),
    )


def cochran_q(df: DataFrame, gates: list[Column]) -> DataFrame:
    """Cochran's Q across k paired binary treatments:
    Q = (k-1) * (k*sum(G_j^2) - (sum G_j)^2) / (k*sum(R_i) - sum(R_i^2))
    with G_j the per-gate pass totals and R_i the per-row pass counts.
    All moments are exact integers (DECIMAL(38,0) guard on the squared
    column totals); one final division. One row out: per-gate rates,
    q_stat, df = k-1."""
    k = len(gates)
    t = df.select(
        *[g.cast("long").alias(f"_g{j}") for j, g in enumerate(gates)]
    ).withColumn(
        "_r", sum(F.col(f"_g{j}") for j in range(k)).cast("long")
    )
    agg = t.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        *[F.sum(f"_g{j}").cast("long").alias(f"g{j}") for j in range(k)],
        F.sum("_r").cast("long").alias("sr"),
        F.sum(F.col("_r") * F.col("_r")).cast("long").alias("sr2"),
    )
    gsum = sum(F.col(f"g{j}").cast("decimal(38,0)") for j in range(k))
    g2sum = sum(
        F.col(f"g{j}").cast("decimal(38,0)") * F.col(f"g{j}") for j in range(k)
    )
    num = F.lit(k - 1) * (F.lit(k) * g2sum - gsum * gsum)
    den = F.lit(k) * F.col("sr").cast("decimal(38,0)") - F.col("sr2")
    return agg.select(
        "n",
        *[
            F.round(F.col(f"g{j}") / F.col("n").cast("double"), 6).alias(
                f"rate_g{j}"
            )
            for j in range(k)
        ],
        F.when(
            den > 0, F.round(num.cast("double") / den.cast("double"), 6)
        ).alias("q_stat"),
        F.lit(k - 1).cast("long").alias("dof"),
    )


# ---------------------------------------------------------------------------
# Friedman test over blocked integer responses (tie-corrected, exact)
# ---------------------------------------------------------------------------

def friedman(
    df: DataFrame, block: str, treatment: str, value_int: str, k: int
) -> DataFrame:
    """Friedman's blocked rank test. One input row per (block,
    treatment) with an EXACT INTEGER response (quantize floats at the
    row level first); blocks missing any of the ``k`` treatments are
    dropped. Mid-ranks are carried in half-units (2r = 2*rank + ties -
    1, an integer), so the tie-corrected statistic

        chi2 = (k-1) * sum_j (R2_j - n*(k+1))^2 / (A4 - n*k*(k+1)^2)

    (R2_j = per-treatment sum of 2r, A4 = sum of (2r)^2) is exact
    integers until the one final division. The within-block window is
    k-bounded — partitioned by block, never global."""
    full = (
        df.groupBy(block)
        .agg(F.count(F.lit(1)).alias("_kb"))
        .filter(F.col("_kb") == k)
        .select(block)
    )
    t = df.join(full, block)
    wb = Window.partitionBy(block).orderBy(F.col(value_int).asc())
    wv = Window.partitionBy(block, value_int)
    r2 = (
        2 * F.rank().over(wb) + F.count(F.lit(1)).over(wv) - 1
    ).cast("long")
    ranked = t.select(
        F.col(block).alias("_blk"),
        F.col(treatment).alias("_trt"),
        r2.alias("_r2"),
    )
    per_t = ranked.groupBy("_trt").agg(
        F.sum("_r2").cast("decimal(38,0)").alias("r2j"),
        F.sum(F.col("_r2") * F.col("_r2")).cast("decimal(38,0)").alias("a4j"),
        (F.count(F.lit(1))).cast("long").alias("nblk"),
    )
    num_j = F.col("r2j") - F.col("nblk").cast("decimal(38,0)") * (k + 1)
    agg = per_t.agg(
        F.max("nblk").alias("n_blocks"),
        F.sum(num_j * num_j).alias("num"),
        F.sum("a4j").alias("a4"),
    )
    den = F.col("a4") - F.col("n_blocks").cast("decimal(38,0)") * k * (
        (k + 1) * (k + 1)
    )
    return agg.select(
        F.col("n_blocks").cast("long").alias("n_blocks"),
        F.lit(k).cast("long").alias("k_treatments"),
        F.when(
            den > 0,
            F.round(
                F.lit(float(k - 1))
                * F.col("num").cast("double")
                / den.cast("double"),
                6,
            ),
        ).alias("chi2"),
        F.lit(k - 1).cast("long").alias("dof"),
    )


# ---------------------------------------------------------------------------
# Split-conformal upper bound per group (exact integer rank arithmetic)
# ---------------------------------------------------------------------------

def conformal_upper(
    df: DataFrame, keys: list[str], score: str, alpha_tenths: int
) -> DataFrame:
    """Split-conformal one-sided upper bound per group: the k-th
    smallest calibration score with k = ceil((n+1)*(1-alpha)) computed
    EXACTLY as k = ((n+1)*(10-a) + 9) div 10 for alpha = a/10 (no
    float ceil at integer boundaries). When k > n the bound is
    +infinity (the method abstains): ``q_hat`` comes back NULL with
    ``inf_bound = true``. Output: keys, n_cal, q_hat, inf_bound."""
    a = int(alpha_tenths)
    r = group_ranked(df, keys, score)
    # integer `div`, not floor(double/10.0): the double path is exact
    # only while (n+1)*(10-a)+9 < 2^52-ish; `div` matches the oracle's
    # `// 10` at ANY n (ADVICE r10)
    kcol = F.expr(f"((_n + 1) * {10 - a} + 9) div 10").cast("long")
    groups = r.groupBy(*keys).agg(F.max("_n").cast("long").alias("n_cal"))
    at_k = r.filter(F.col("_rn") == F.least(kcol, F.col("_n"))).select(
        *keys, F.col("_v").alias("_qk")
    )
    kg = F.expr(f"((n_cal + 1) * {10 - a} + 9) div 10").cast("long")
    return (
        groups.join(at_k, keys, "left")
        .select(
            *keys,
            "n_cal",
            F.when(kg <= F.col("n_cal"), F.col("_qk")).alias("q_hat"),
            (kg > F.col("n_cal")).alias("inf_bound"),
        )
    )


# ---------------------------------------------------------------------------
# Quantized second moments for embedding-geometry diagnostics
# ---------------------------------------------------------------------------

def quantized_prefix(
    emb: DataFrame, id_col: str, vec_col: str, dims: int, units: float
) -> DataFrame:
    """Explode the first ``dims`` coordinates of ``vec_col`` to rows
    ``(id, i, xq)`` with xq = round(x * units) — an exact integer on
    both engines (float32 -> double is exact; the scale and round are
    single correctly-rounded ops). The integer frame is the input to
    every moment computation below, so no float ever reaches a SUM."""
    return emb.select(
        F.col(id_col).alias("_vid"),
        F.posexplode(vec_col).alias("_i0", "_xf"),
    ).filter(F.col("_i0") < dims).select(
        "_vid",
        (F.col("_i0") + 1).alias("i"),
        F.round(F.col("_xf").cast("double") * units, 0)
        .cast("long")
        .alias("xq"),
    )


def pair_moments(ex: DataFrame, ey: DataFrame) -> DataFrame:
    """Cross second moments of two quantized frames from
    :func:`quantized_prefix` (same ``_vid`` universe): one row per
    coordinate pair (i from X, j from Y) with n, s_ij = sum(x_i*y_j),
    sx_i, sy_j — all exact DECIMAL(38,0). The join fans out d_x*d_y
    rows per vector (bounded by the chosen prefix, never the full
    dim^2 of the stored embedding) and reduces in one shuffle."""
    a = ex.select("_vid", F.col("i").alias("ii"), F.col("xq").alias("xa"))
    b = ey.select("_vid", F.col("i").alias("jj"), F.col("xq").alias("xb"))
    prod = a.join(b, "_vid").groupBy("ii", "jj").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("xa").cast("decimal(38,0)") * F.col("xb")).alias("sxy"),
    )
    sx = ex.groupBy(F.col("i").alias("ii")).agg(
        F.sum("xq").cast("decimal(38,0)").alias("sx")
    )
    sy = ey.groupBy(F.col("i").alias("jj")).agg(
        F.sum("xq").cast("decimal(38,0)").alias("sy")
    )
    return prod.join(sx, "ii").join(sy, "jj")


def centered_gram_fro2(moments: DataFrame) -> Column:
    """Aggregate expression: squared Frobenius norm of the CENTERED
    cross-covariance numerator matrix N_ij = n*s_ij - sx_i*sy_j, as a
    double sum over the (bounded) coordinate-pair frame. The N_ij are
    exact integers identical on both engines; only the bounded
    fixed-count combine runs in double (static-wobble class)."""
    nij = (
        F.col("n").cast("decimal(38,0)") * F.col("sxy")
        - F.col("sx") * F.col("sy")
    ).cast("double")
    return F.sum(nij * nij)
