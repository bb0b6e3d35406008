"""PII detection / redaction expressions (E23), shared by the batch
census, its DuckDB oracle string, and the streaming fold — one
definition, three consumers (the functions/sampling.py discipline: the
batch/stream hash contract can only break loudly).

Patterns are deliberately engine-portable regex (no lookarounds, no
shorthand classes): Spark compiles them in codegen `regexp_count`/
`regexp_replace`, DuckDB in RE2 — both count and redact identically.
The planted PII (synthetic contact strings derived from doc_id) gives
both engines the same ground truth at any SF; a real deployment drops
the planting step and runs the same expressions over raw text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

PII_EMAIL = r"[a-z0-9]+@[a-z]+\.[a-z]+"
PII_PHONE = r"\+[0-9]{7,12}"
PII_IP = r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}"


def with_planted_pii(docs: DataFrame) -> DataFrame:
    """(doc_id, source, text) with deterministic planted PII on every
    11th (email) / 13th (phone) / 17th (IPv4) doc."""
    return docs.select(
        "doc_id",
        "source",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 11 == 0,
                F.concat(
                    F.lit(" contact u"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.com"),
                ),
            ).otherwise(""),
            F.when(
                F.col("doc_id") % 13 == 0,
                F.concat(
                    F.lit(" call +1555"),
                    F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
                ),
            ).otherwise(""),
            F.when(
                F.col("doc_id") % 17 == 0,
                F.concat(
                    F.lit(" from 10.0."),
                    (F.col("doc_id") % 256).cast("string"),
                    F.lit("."),
                    (F.col("doc_id") % 100).cast("string"),
                ),
            ).otherwise(""),
        ).alias("text"),
    )


def doc_metrics(d: DataFrame) -> DataFrame:
    """Per-doc PII counters + exact redaction byte delta — ONE codegen
    map pass (three regexp_counts and a chained regexp_replace length
    difference, no UDF)."""
    return d.select(
        "source",
        F.regexp_count("text", F.lit(PII_EMAIL)).alias("n_em"),
        F.regexp_count("text", F.lit(PII_PHONE)).alias("n_ph"),
        F.regexp_count("text", F.lit(PII_IP)).alias("n_ip"),
        (
            F.length("text")
            - F.length(
                F.regexp_replace(
                    F.regexp_replace(
                        F.regexp_replace(F.col("text"), PII_EMAIL, "<EMAIL>"),
                        PII_PHONE,
                        "<PHONE>",
                    ),
                    PII_IP,
                    "<IP>",
                )
            )
        ).alias("delta"),
    )


def rollup(m: DataFrame) -> DataFrame:
    """Per-source census from per-doc metrics. Every output is a SUM
    (flagged-doc count included: each doc contributes 0/1 exactly
    once), so partial rollups from disjoint doc sets fold by addition
    — the property the streaming twin rests on."""
    return m.groupBy("source").agg(
        F.sum(((F.col("n_em") + F.col("n_ph") + F.col("n_ip")) > 0).cast("long"))
        .cast("long")
        .alias("n_docs_flagged"),
        F.sum("n_em").cast("long").alias("n_emails"),
        F.sum("n_ph").cast("long").alias("n_phones"),
        F.sum("n_ip").cast("long").alias("n_ips"),
        F.sum("delta").cast("long").alias("chars_redacted"),
    )


def fold_rollups(parts: DataFrame) -> DataFrame:
    """Sum per-epoch partial censuses into the exact batch census."""
    return parts.groupBy("source").agg(
        F.sum("n_docs_flagged").cast("long").alias("n_docs_flagged"),
        F.sum("n_emails").cast("long").alias("n_emails"),
        F.sum("n_phones").cast("long").alias("n_phones"),
        F.sum("n_ips").cast("long").alias("n_ips"),
        F.sum("chars_redacted").cast("long").alias("chars_redacted"),
    )
