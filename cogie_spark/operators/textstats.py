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


def _dup_flags(srt: Column, n: Column) -> Column:
    """Per-position 'value occurs more than once' flags over a SORTED
    array: element i is a duplicate occurrence iff it equals a
    neighbor. ``F.get`` (0-based) returns NULL out of bounds instead of
    the ANSI INVALID_ARRAY_INDEX error ``element_at`` raises, so the
    boundary probes need no branches. Guarded sequence: sequence(0,-1)
    would auto-step DOWN and yield [0,-1], so the empty-array case pins
    the upper bound at 0 (the single probe coalesces to false)."""
    idx = F.sequence(F.lit(0), F.greatest(n - F.lit(1), F.lit(0)))
    return F.transform(
        idx,
        lambda i: F.coalesce(
            (F.get(srt, i) == F.get(srt, i - F.lit(1)))
            | (F.get(srt, i) == F.get(srt, i + F.lit(1))),
            F.lit(False),
        ),
    )


def _arr_sum(arr: Column) -> Column:
    return F.aggregate(arr, F.lit(0).cast("long"), lambda acc, x: acc + x.cast("long"))


def repetition_features(
    df: DataFrame,
    text_col: str = "text",
    top_ngram_ns: tuple[int, ...] = (2, 3),
    dup_ngram_ns: tuple[int, ...] = (5,),
) -> DataFrame:
    """Gopher-style repetition filters (Rae et al. 2021, table A1) —
    the standard 'remove degenerate repetitive documents' gate in a
    training-data pipeline. Pure built-in expressions (sorted-run trick:
    array_sort makes equal values adjacent, so duplicate membership and
    run lengths are neighbor comparisons), zero Python in the path.

    Adds:
      dup_line_frac        — fraction of non-empty lines occurring >1x
      dup_line_char_frac   — chars inside those duplicated lines / all
                             line chars
      top_{n}gram_char_frac — chars covered by the single most frequent
                             word n-gram / normalized chars
      dup_{n}gram_char_frac — chars covered by word n-grams occurring
                             >1x / normalized chars (overlapping
                             occurrences counted per-gram, the usual
                             upper-bound approximation)

    All fractions are in [0, 1] except dup_{n}gram_char_frac, which the
    overlap approximation can push above 1 on pathological inputs — cap
    at 1.0 like the published filter does.

    PERF INVARIANT (the 100 TB consideration): every array a lambda
    probes element-wise is staged as a REAL column first. A bare
    ``F.get(array_sort(...), i)`` inside transform/filter inlines the
    whole sort subtree into the lambda body, and Spark re-evaluates
    lambda subexpressions PER ELEMENT — O(G² log G) per row, a hang on
    kilobyte documents (observed, not hypothetical). Staged columns
    make the probes O(1) GetArrayItem on an attribute reference; the
    multi-reference aliases also stop CollapseProject from re-inlining
    them.
    """
    from cogie_spark.functions.text import word_ngrams

    text = F.col(text_col)
    lines = F.filter(
        F.transform(F.split(text, "\n"), lambda s: F.trim(s)), lambda s: s != ""
    )
    out = df.withColumn("_rl_lsrt", F.array_sort(lines))
    lsrt = F.col("_rl_lsrt")
    nl = F.size(lsrt)
    out = out.withColumn("_rl_lflags", _dup_flags(lsrt, nl))
    lflags = F.col("_rl_lflags")
    dup_lines = _arr_sum(F.transform(lflags, lambda b: b.cast("int")))
    dup_line_chars = _arr_sum(
        F.zip_with(lsrt, lflags, lambda l, b: F.when(b, F.length(l)).otherwise(F.lit(0)))
    )
    all_line_chars = _arr_sum(F.transform(lsrt, F.length))
    out = out.withColumn(
        "dup_line_frac",
        F.round(dup_lines / F.greatest(nl.cast("long"), F.lit(1)), 6),
    ).withColumn(
        "dup_line_char_frac",
        F.round(dup_line_chars / F.greatest(all_line_chars, F.lit(1)), 6),
    )

    n_chars = F.greatest(F.length(normalize_text(text)), F.lit(1)).cast("long")
    temps = ["_rl_lsrt", "_rl_lflags"]

    for n in sorted(set(top_ngram_ns) | set(dup_ngram_ns)):
        scol, rcol = f"_rl_srt_{n}", f"_rl_runs_{n}"
        temps += [scol, rcol]
        out = out.withColumn(scol, F.array_sort(word_ngrams(text, n=n, distinct=False)))
        srt = F.col(scol)
        ng = F.size(srt)
        starts = F.filter(
            F.sequence(F.lit(0), F.greatest(ng - F.lit(1), F.lit(0))),
            lambda i: (i == F.lit(0)) | (F.get(srt, i) != F.get(srt, i - F.lit(1))),
        )
        # run structs (cnt, len): occurrences and char length of each
        # distinct gram — ends are the next run's start (last run: ng)
        runs = F.zip_with(
            starts,
            F.concat(
                F.slice(starts, 2, F.greatest(F.size(starts) - 1, F.lit(0))),
                F.array(ng),
            ),
            lambda s, e: F.struct(
                (e - s).cast("long").alias("cnt"),
                F.length(F.get(srt, s)).cast("long").alias("len"),
            ),
        )
        out = out.withColumn(rcol, runs)
        if n in top_ngram_ns:
            top = F.array_max(F.col(rcol))
            out = out.withColumn(
                f"top_{n}gram_char_frac",
                F.round(F.least((top["cnt"] * top["len"]) / n_chars, F.lit(1.0)), 6),
            )
        if n in dup_ngram_ns:
            dup_chars = _arr_sum(
                F.transform(
                    F.col(rcol),
                    lambda r: F.when(r["cnt"] > 1, r["cnt"] * r["len"]).otherwise(F.lit(0)),
                )
            )
            out = out.withColumn(
                f"dup_{n}gram_char_frac",
                F.round(F.least(dup_chars / n_chars, F.lit(1.0)), 6),
            )
    return out.drop(*temps)


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
