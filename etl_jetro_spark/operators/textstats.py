"""Text analysis operators for training-data pipelines.

Language ID (stopword-hit heuristic), quality scoring, token counting, and
document fingerprinting — all expression-only (whole-stage codegen; a 100 TB
corpus scan runs these at parquet-read speed with zero shuffles).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_jetro_spark.functions.hashing import doc_fingerprint, norm_text


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


def token_count(col: str | Column) -> Column:
    """Whitespace token count."""
    s = F.trim(_c(col))
    return F.when(s == "", 0).otherwise(F.size(F.split(s, r"\s+")))


# BPE-ish subword segmentation: letter runs, digit runs, and single
# non-alnum marks each count as a token (a cheap proxy for BPE token counts).
_BPE_ISH = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def bpe_ish_token_count(col: str | Column) -> Column:
    return F.size(F.regexp_extract_all(_c(col), F.lit(f"({_BPE_ISH})"), 1))


STOPWORD_SETS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "an", "and", "or", "of", "to", "in", "is", "on", "for", "with", "that", "it"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "una", "es", "por", "con", "para", "los", "las"),
    "de": ("der", "die", "das", "und", "ist", "von", "mit", "für", "auf", "ein", "eine", "zu", "den", "im"),
    "fr": ("le", "la", "les", "de", "et", "est", "un", "une", "dans", "que", "pour", "sur", "avec", "du"),
}


def stopword_hits(col: str | Column, lang: str = "en") -> Column:
    """Count of tokens that are stopwords of ``lang``."""
    words = F.split(norm_text(col), " ")
    sw = F.array(*[F.lit(w) for w in STOPWORD_SETS[lang]])
    return F.size(F.filter(words, lambda w: F.array_contains(sw, w)))


def lang_id(col: str | Column) -> Column:
    """Heuristic language ID: the language whose stopword set hits the most
    tokens; 'und' (undetermined) when nothing hits."""
    words = F.split(norm_text(col), " ")

    def hit_counter(sws: tuple[str, ...]):
        # NB: the lambda must take exactly one arg — pyspark passes the array
        # index to any second parameter, clobbering default-arg closures.
        arr = F.array(*[F.lit(x) for x in sws])
        return lambda w: F.array_contains(arr, w)

    hits = {
        lang: F.size(F.filter(words, hit_counter(sws)))
        for lang, sws in STOPWORD_SETS.items()
    }
    best = F.greatest(*hits.values())
    out = F.lit("und")
    expr = None
    for lang, h in hits.items():
        cond = (h == best) & (best > 0)
        expr = F.when(cond, lang) if expr is None else expr.when(cond, lang)
    return expr.otherwise("und")


def quality_features(df: DataFrame, text_col: str) -> DataFrame:
    """Attach the standard quality-feature columns."""
    t = _c(text_col)
    n_chars = F.length(t)
    toks = token_count(t)
    return df.withColumns(
        {
            "q_n_chars": n_chars,
            "q_n_tokens": toks,
            "q_mean_token_len": F.when(toks > 0, (n_chars - toks + 1) / toks).otherwise(0.0),
            "q_punct_ratio": F.when(
                n_chars > 0,
                F.length(F.regexp_replace(t, r"[^.,;:!?'\"()\[\]-]", "")) / n_chars,
            ).otherwise(0.0),
            "q_digit_ratio": F.when(
                n_chars > 0, F.length(F.regexp_replace(t, r"[^0-9]", "")) / n_chars
            ).otherwise(0.0),
            "q_stopword_ratio": F.when(
                toks > 0, stopword_hits(t, "en") / toks
            ).otherwise(0.0),
        }
    )


def quality_score(df: DataFrame, text_col: str) -> DataFrame:
    """Composite 0–1 quality score: length sweet spot, low digit/punct
    noise, healthy stopword density. Deterministic, monotone pieces."""
    feat = quality_features(df, text_col)
    len_score = F.least(F.col("q_n_tokens") / F.lit(20.0), F.lit(1.0))
    noise_penalty = F.least(
        F.col("q_punct_ratio") * 2 + F.col("q_digit_ratio") * 2, F.lit(1.0)
    )
    stop_score = F.least(F.col("q_stopword_ratio") * 4, F.lit(1.0))
    score = (len_score * 0.4 + (1 - noise_penalty) * 0.3 + stop_score * 0.3)
    return feat.withColumn("quality_score", F.round(score, 6))


def fingerprint(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, fingerprint) — md5 of normalized text (exact-dedup key)."""
    return df.select(_c(id_col), doc_fingerprint(text_col).alias("fingerprint"))


def vocab_doc_freq(
    df: DataFrame, id_col: str, text_col: str, min_df: int = 1
) -> DataFrame:
    """Corpus vocabulary with document frequencies — the vocab/stopword
    builder of a training pipeline. Tokens come from the same normalized
    split the dedup shingles use; one shuffle (groupBy token) over
    per-doc-distinct token rows. Returns (token, doc_freq)."""
    toks = (
        df.select(
            F.col(id_col).alias("_id"),
            F.explode(F.split(norm_text(text_col), " ")).alias("token"),
        )
        .filter(F.col("token") != "")
        .distinct()
    )
    out = toks.groupBy("token").agg(F.count(F.lit(1)).alias("doc_freq"))
    return out.filter(F.col("doc_freq") >= min_df)
