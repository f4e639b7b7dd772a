"""PII detection and redaction over a text column.

A curation pass that precedes packing/training in a large-scale text
pipeline: find emails / IPv4 addresses / phone-shaped strings, count
them per document, and replace them with typed placeholder tags.

No reference analogue (beyond-reference op per the brief; the reference
corpus is flight records with no free-text PII surface).

Scale posture: pure JVM ``regexp_replace`` / ``regexp_count`` Column
expressions — one narrow projection, no shuffle, whole-stage codegen.
The patterns are deliberately restricted to a regex subset (character
classes, bounded repetition, ``\\b``) that behaves identically under
Java regex (Spark) and RE2 (DuckDB), so redaction output can be
hash-checked cross-engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Ordered: emails first (their local part may contain digits/dots that
# would otherwise partially match the IPv4 pattern), then IPv4, then
# phone-shaped digit runs. Each value is (pattern, replacement_tag).
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
    ("phone", r"\b\d{3}-\d{4}\b", "[PHONE]"),
]


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-kind match counts on the ORIGINAL text (before any
    replacement, so kinds don't mask each other's counts)."""
    return {
        f"n_{kind}": F.regexp_count(text, F.lit(pat)).cast("long")
        for kind, pat, _ in PII_PATTERNS
    }


def redact_pii(text: Column) -> Column:
    """Replace every PII match with its typed tag, applying the
    patterns in PII_PATTERNS order."""
    out = text
    for _, pat, tag in PII_PATTERNS:
        out = F.regexp_replace(out, pat, tag)
    return out


def redaction_report(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document PII report: counts per kind, total, and the
    fingerprint + length of the redacted text (the fingerprint lets a
    downstream exact-dedup stage run on redacted content)."""
    text = F.col(text_col)
    counts = pii_counts(text)
    redacted = redact_pii(text)
    total = None
    for c in counts.values():
        total = c if total is None else total + c
    return df.select(
        F.col(id_col),
        *[c.alias(name) for name, c in counts.items()],
        total.alias("n_pii_total"),
        F.length(redacted).cast("long").alias("redacted_len"),
        F.md5(redacted).alias("redacted_md5"),
    )
