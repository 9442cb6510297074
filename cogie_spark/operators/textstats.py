"""Text-analysis operators for large-scale training-data pipelines:
language-ID, quality scoring, token counting, document fingerprinting.

All pure built-in expressions (JVM-side, whole-stage codegen) — these run
over every document at 100 TB scale, so no Python is allowed in the path.
Reference analogues: tokenizer toolkit
(/root/reference/cogie/toolkit/tokenize/tokenize_toolkit.py:52-55) and the
mention normalization in /root/reference/cogie/toolkit/el/el_toolkit.py:87-96.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cogie_spark.functions.text import normalize_text, tokens

# tiny per-language function-word lists (public knowledge); the n-gram
# heuristic only needs the head of the Zipf curve
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "for", "on", "with"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "ein", "eine", "zu"],
    "fr": ["le", "la", "les", "et", "est", "de", "un", "une", "pour", "dans"],
    "es": ["el", "la", "los", "las", "y", "es", "de", "un", "una", "por"],
}


def token_count(text: Column | str) -> Column:
    """Whitespace token count (the BPE-ish regex variant is
    ``bpe_token_count``)."""
    return F.size(tokens(text))


def bpe_token_count(text: Column | str) -> Column:
    """Rough BPE-like token count: words + digit runs + punctuation runs
    counted separately via a tokenizing regex.
    DuckDB twin: len(regexp_extract_all(x, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]'))
    """
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(c, F.lit(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"), 0))


def stopword_hits(text: Column | str, lang: str) -> Column:
    """Number of tokens that are function words of ``lang``."""
    toks = tokens(text)
    words = STOPWORDS[lang]
    return F.size(F.filter(toks, lambda t: t.isin(*words)))


def lang_id(text: Column | str) -> Column:
    """Heuristic language ID: argmax of per-language stopword hit counts;
    'und' (undetermined) when no list scores > 0.

    Expressed as a greatest-of-structs trick so it stays in codegen:
    max over array<struct<hits,negidx>> picks highest hits (ties -> first
    language in list order).
    """
    langs = list(STOPWORDS)
    entries = [
        F.struct(
            stopword_hits(text, lg).alias("hits"),
            F.lit(len(langs) - i).alias("prio"),
            F.lit(lg).alias("lang"),
        )
        for i, lg in enumerate(langs)
    ]
    best = F.array_max(F.array(*entries))
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality features + composite score.

    Features: n_chars, n_tokens, mean token length, punctuation ratio,
    digit ratio, stopword(en) ratio, uppercase ratio. Composite score is
    a bounded [0,1] blend — the deterministic stand-in for a learned
    quality classifier.
    """
    t = F.col(text_col)
    norm = normalize_text(t)
    toks = tokens(text_col)
    n_chars = F.length(norm)
    n_toks = F.size(toks)
    punct = F.length(F.regexp_replace(norm, r"[a-z0-9\s]", ""))
    digit = F.length(F.regexp_replace(norm, r"[^0-9]", ""))
    upper = F.length(F.regexp_replace(t, r"[^A-Z]", ""))
    sw = F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS["en"])))
    out = (
        df.withColumn("n_chars", n_chars)
        .withColumn("n_tokens", n_toks)
        .withColumn("mean_token_len", F.round(n_chars / F.greatest(n_toks, F.lit(1)), 6))
        .withColumn("punct_ratio", F.round(punct / F.greatest(n_chars, F.lit(1)), 6))
        .withColumn("digit_ratio", F.round(digit / F.greatest(n_chars, F.lit(1)), 6))
        .withColumn("upper_ratio", F.round(upper / F.greatest(F.length(t), F.lit(1)), 6))
        .withColumn("stopword_ratio", F.round(sw / F.greatest(n_toks, F.lit(1)), 6))
    )
    score = (
        F.lit(1.0)
        - F.least(F.col("punct_ratio") * 2, F.lit(0.5))
        - F.least(F.col("digit_ratio"), F.lit(0.3))
    ) * F.least(F.col("n_tokens") / F.lit(20.0), F.lit(1.0))
    return out.withColumn("quality_score", F.round(score, 6))


def fingerprint(text: Column | str) -> Column:
    """Content fingerprint: md5 of normalized text (portable).

    The rolling-hash winnowing variant is ``winnow_fingerprints``.
    """
    return F.md5(normalize_text(text))


def winnow_fingerprints(text: Column | str, k: int = 8, window: int = 4) -> Column:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD'03):
    min shingle-hash per sliding window of ``window`` consecutive k-gram
    hashes, deduplicated. Pure expressions: shingle hashes once, then a
    transform over window start positions taking array_min of a slice.
    """
    from cogie_spark.functions.hashing import base_hash28
    from cogie_spark.functions.text import char_shingles

    hashes = F.transform(char_shingles(text, k=k, distinct=False), base_hash28)
    n = F.greatest(F.size(hashes) - F.lit(window - 1), F.lit(1))
    mins = F.transform(
        F.sequence(F.lit(1), n), lambda i: F.array_min(F.slice(hashes, i, window))
    )
    return F.array_distinct(mins)
