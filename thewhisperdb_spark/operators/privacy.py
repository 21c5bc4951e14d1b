"""PII detection and redaction — the privacy-scrubbing pass every
training-data release runs between cleaning and packing.

Patterns are restricted to constructs shared by Java regex (Spark) and RE2
(DuckDB oracle): character classes, bounded repetition, word boundaries —
no lookarounds. Everything is codegen'd regexp_count / regexp_replace: one
scan, no shuffle, no Python. At 100 TB this pass rides the same scan as the
quality filters.

The reference has no privacy surface (north-star §2.11 extension).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Ordered dict: redaction applies patterns in this order (emails first so the
# ip/phone patterns never see the digits inside an already-redacted email).
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
    "phone": r"\+[0-9][0-9\-]{7,14}[0-9]",
}


def pii_counts(col: Column) -> dict[str, Column]:
    """Per-kind PII match counts for a text column."""
    return {kind: F.regexp_count(col, F.lit(pat))
            for kind, pat in PII_PATTERNS.items()}


def redact_pii(col: Column, token: str = "[PII]") -> Column:
    """Replace every PII match with ``token`` (pattern order matters — see
    PII_PATTERNS). Chained regexp_replace, still one projection."""
    out = col
    for pat in PII_PATTERNS.values():
        out = F.regexp_replace(out, pat, token)
    return out


def pii_report(df: DataFrame, text_col: str = "text",
               group_col: str = "source") -> DataFrame:
    """Per-group PII accounting: match counts per kind plus the number of
    documents carrying any PII — the release-gate numbers. One scan, one
    partial-aggregating shuffle on the group key."""
    counts = pii_counts(F.col(text_col))
    any_pii = sum(list(counts.values()), F.lit(0)) > 0
    return (df.select(F.col(group_col).alias("g"),
                      *[c.alias(f"n_{k}") for k, c in counts.items()],
                      any_pii.cast("int").alias("has_pii"))
            .groupBy("g")
            .agg(*[F.sum(f"n_{k}").alias(f"n_{k}") for k in PII_PATTERNS],
                 F.sum("has_pii").cast("long").alias("n_docs_with_pii"),
                 F.count(F.lit(1)).alias("n_docs")))
