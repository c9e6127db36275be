"""PII detection and redaction for training-data curation.

Web-scale corpus pipelines scrub personally identifiable information before
training (the public-literature pattern: CCNet/Dolma/RefinedWeb-style rule
pipelines run regex scrubbers for emails / IP addresses / phone numbers).
The reference's per-mailbox model has no analog — mail IS addressed PII —
but its normalization layer (ref mail.py:309-439, per-row derived columns)
is the structural template: PII signals are one more set of derived columns
over the same row.

Everything here is JVM-side ``regexp_count`` / ``regexp_replace`` column
algebra — no Python UDFs, fully inside whole-stage codegen. The patterns
deliberately use only the regex subset on which Java's engine (Spark) and
RE2 (DuckDB, the oracle) produce identical matches: character classes,
bounded repetition, non-capturing groups and ``\b`` — no lookaround, no
backreferences (RE2 has neither).

Scale notes (100 TB): per-document map-side work only — counting and
redaction add zero shuffles; ``pii_summary`` is a single partial-aggregated
1-row reduce. A mega-document costs only its own scan within its task.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Ordered: redaction applies patterns in THIS order (an oracle replaying the
# redaction must nest its regexp_replace calls identically). The patterns
# are mutually non-overlapping by construction — phone requires a leading
# '+', card is exactly 4x4 digits with separators, ipv4 is dotted octets —
# so per-kind counts on the original text equal counts on the partially
# redacted text, and redaction order only matters for byte layout.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}(?:\.\d{1,3}){3}\b",
    "phone": r"\+\d{1,3}[ -]\d(?:[\d ()-]{5,12}\d)",
    "card": r"\b\d{4}(?:[ -]\d{4}){3}\b",
}


def pii_count(kind: str, text_col: str = "text") -> Column:
    """Match count of one PII kind over the raw text (JVM regexp_count)."""
    return F.regexp_count(
        F.coalesce(F.col(text_col), F.lit("")), F.lit(PII_PATTERNS[kind]))


def with_pii_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds one ``n_<kind>`` int column per pattern plus ``n_pii`` (total).

    Counts are measured on the original text; see PII_PATTERNS for why
    order/overlap cannot skew them.
    """
    for kind in PII_PATTERNS:
        df = df.withColumn(f"n_{kind}", pii_count(kind, text_col))
    total = None
    for kind in PII_PATTERNS:
        c = F.col(f"n_{kind}")
        total = c if total is None else total + c
    return df.withColumn("n_pii", total)


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "text_redacted",
    kinds: tuple[str, ...] | None = None,
) -> DataFrame:
    """Adds ``out_col``: the text with each PII match replaced by a typed
    placeholder (``<EMAIL>``, ``<IPV4>``, ...). Patterns apply in
    PII_PATTERNS order; pass ``kinds`` to scrub a subset.
    """
    col = F.coalesce(F.col(text_col), F.lit(""))
    for kind in kinds if kinds is not None else tuple(PII_PATTERNS):
        col = F.regexp_replace(
            col, PII_PATTERNS[kind], f"<{kind.upper()}>")
    return df.withColumn(out_col, col)


def pii_summary(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One-row corpus audit: document count, documents containing any PII,
    and total matches per kind. Partial aggregation keeps this a cheap
    map-side-combined reduce at any corpus size."""
    counted = with_pii_counts(df, text_col)
    aggs = [F.count(F.lit(1)).alias("n_docs"),
            F.sum((F.col("n_pii") > 0).cast("long")).alias("docs_with_pii")]
    for kind in PII_PATTERNS:
        aggs.append(F.sum(f"n_{kind}").cast("long").alias(f"total_{kind}"))
    return counted.agg(*aggs)
