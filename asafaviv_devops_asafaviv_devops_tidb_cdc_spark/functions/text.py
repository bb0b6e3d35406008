"""Text-analysis building blocks for the training-data pipeline
(north-star operators E1/E4, BASELINE.json): tokenization, shingling,
fingerprinting, language-ID scoring, quality metrics.

All pure built-in SQL expressions (JVM-side, whole-stage codegen) —
no Python UDFs. At 100 TB these are map-only stages; the only
shuffles are the final aggregations callers add.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Marker stopwords per language, deliberately disjoint so the argmax
# is order-independent except for documented priority ties.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to"],
    "de": ["der", "die", "das", "und", "nicht"],
    "fr": ["le", "la", "les", "et", "ne"],
    "es": ["el", "los", "las", "y"],
    "zh": ["的", "是", "了"],
}

STOPWORDS = LANG_MARKERS["en"]


def tokens(col: str = "text") -> Column:
    """Whitespace tokenization (single-space corpora; regex-tokenize
    via ``regex_tokens`` for messy text)."""
    return F.split(F.col(col), " ")


def regex_tokens(col: str = "text") -> Column:
    """BPE-ish tokenizer: words / digit runs as separate tokens."""
    return F.expr(f"regexp_extract_all({col}, '[a-z]+|[0-9]+', 0)")


def shingles_from_tokens(toks_col: str, n: int = 3) -> Column:
    """Distinct word n-gram shingles over a MATERIALIZED token-array
    column; short docs fall back to the whole text as a single shingle.

    Callers must tokenize into a real column first (``withColumn``) —
    referencing ``split(text)`` directly here would re-run the split
    inside the lambda for every element_at access (higher-order-function
    lambdas are interpreted, no common-subexpression elimination), an
    O(shingles x n) blowup measured at ~4 s for 5 k docs."""
    parts = ", ".join(f"element_at({toks_col}, i + {k + 1})" for k in range(n))
    return F.expr(
        f"CASE WHEN {toks_col} IS NULL THEN CAST(NULL AS ARRAY<STRING>) "
        f"WHEN size({toks_col}) >= {n} THEN "
        f"array_distinct(transform(sequence(0, size({toks_col}) - {n}), "
        f"i -> concat_ws(' ', {parts}))) "
        f"ELSE array(concat_ws(' ', {toks_col})) END"
    )


def fingerprint_from_tokens(toks_col: str, n: int = 3) -> Column:
    """Document fingerprint over a MATERIALIZED token-array column:
    min sha256 over word n-gram shingles (a one-permutation MinHash —
    stable under small reorderings, unlike sha256(text)). Same
    tokenize-first rule as ``shingles_from_tokens``."""
    parts = ", ".join(f"element_at({toks_col}, i + {k + 1})" for k in range(n))
    return F.expr(
        f"CASE WHEN {toks_col} IS NULL THEN CAST(NULL AS STRING) "
        f"WHEN size({toks_col}) >= {n} THEN "
        f"array_min(transform(sequence(0, size({toks_col}) - {n}), "
        f"i -> sha2(concat_ws(' ', {parts}), 256))) "
        f"ELSE sha2(concat_ws(' ', {toks_col}), 256) END"
    )


def marker_score(toks_col: str, markers: list[str]) -> Column:
    arr = ", ".join(f"'{m}'" for m in markers)
    return F.expr(
        f"size(filter({toks_col}, x -> array_contains(array({arr}), x)))"
    )


def predicted_lang(scores: dict[str, Column]) -> Column:
    """Argmax with fixed priority en > de > fr > es > zh on ties."""
    s = scores
    return (
        F.when(s["zh"] > F.greatest(s["en"], s["de"], s["fr"], s["es"]), F.lit("zh"))
        .when(s["es"] > F.greatest(s["en"], s["de"], s["fr"]), F.lit("es"))
        .when(s["fr"] > F.greatest(s["en"], s["de"]), F.lit("fr"))
        .when(s["de"] > s["en"], F.lit("de"))
        .otherwise(F.lit("en"))
    )


# Scrub patterns kept to constructs with identical semantics in Java
# regex (Spark) and RE2 (DuckDB/most engines): literal classes, no
# backrefs/lookaround.
URL_PATTERN = r"https?://[^ ]+"
EMAIL_PATTERN = r"[a-z0-9.]+@[a-z0-9.]+"


def scrub_text(col: str = "text") -> Column:
    """PII/noise scrubbing for training corpora: URLs and emails
    replaced with placeholder tokens (map-only regexp_replace, global
    in both Spark and DuckDB-with-'g')."""
    return F.regexp_replace(
        F.regexp_replace(F.col(col), URL_PATTERN, "<URL>"),
        EMAIL_PATTERN,
        "<EMAIL>",
    )


def count_pattern(col: str, pattern: str) -> Column:
    return F.expr(f"size(regexp_extract_all({col}, '{pattern}', 0))").cast("long")


def repetition_ppm(toks_col: str) -> Column:
    """Boilerplate signal: fraction of tokens that are repeats of an
    earlier token, in exact integer ppm — 0 for all-unique docs, ->1e6
    for pathological repetition. Pure integer math, hash-stable."""
    return F.expr(
        f"((size({toks_col}) - size(array_distinct({toks_col}))) * 1000000)"
        f" div size({toks_col})"
    ).cast("long")


def with_quality_metrics(df: DataFrame, col: str = "text") -> DataFrame:
    """Quality-scoring columns: token count, mean token length (x100,
    exact integer), stopword ppm, and a keep/drop flag. Integer math
    only — ratios are hash-stable across engines."""
    stop_arr = ", ".join(f"'{w}'" for w in STOPWORDS)
    return (
        df.withColumn("_toks", tokens(col))
        .withColumn("n_chars", F.length(F.col(col)).cast("long"))
        .withColumn("n_tokens", F.size(F.col("_toks")).cast("long"))
        .withColumn(
            "mean_token_len_x100",
            F.expr("((n_chars - (n_tokens - 1)) * 100) div n_tokens").cast("long"),
        )
        .withColumn(
            "stopword_ppm",
            F.expr(
                f"(size(filter(_toks, x -> array_contains(array({stop_arr}), x)))"
                " * 1000000) div n_tokens"
            ).cast("long"),
        )
        .withColumn(
            "keep",
            (F.col("n_tokens") >= 10)
            & (F.col("n_tokens") <= 100_000)
            & (F.col("stopword_ppm") < 500_000),
        )
        .drop("_toks")
    )
