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


def _neighbor_dup_flags(srt: Column) -> Column:
    """Per-position 'value occurs more than once' flags over a SORTED
    array: element i is a duplicate occurrence iff it equals the
    previous or next element. Built exclusively from whole-array ops —
    every reference to the array sits in an ARGUMENT position (shifted
    slices zipped positionally), never inside a lambda body, so the
    flags stay O(n) per row even after an optimizer rule (filter
    pushdown substituting a ``keep`` predicate, CollapseProject) inlines
    this expression somewhere the old index-probe form (``F.get(srt, i)``
    in a transform body) degraded to per-element re-evaluation of the
    whole sort subtree — O(n^2 log n), the observed 330 ms/doc hang when
    clean_corpus filtered on these columns."""
    n = F.size(srt)
    tail = F.greatest(n - F.lit(1), F.lit(0))
    null1 = F.array(F.lit(None).cast("string"))
    prev = F.concat(null1, F.slice(srt, 1, tail))
    nxt = F.concat(F.slice(srt, 2, tail), null1)
    flags = F.transform(
        F.arrays_zip(srt.alias("c"), prev.alias("p"), nxt.alias("x")),
        lambda s: F.coalesce(s["c"] == s["p"], F.lit(False))
        | F.coalesce(s["c"] == s["x"], F.lit(False)),
    )
    # n == 0: the padded prev/next are [null] and would zip to one
    # spurious position
    return F.when(n == F.lit(0), F.array().cast("array<boolean>")).otherwise(flags)


def _top_run(srt: Column) -> Column:
    """struct(cnt, len) of the most frequent element of a SORTED array
    (ties -> longer element, matching array_max over struct(cnt, len))
    via ONE O(n) aggregate fold. The fold body references only the
    accumulator and the element, so it is inline-safe like
    :func:`_neighbor_dup_flags` — and it replaces the run-boundary
    index arithmetic (starts/ends slices probing ``srt`` inside lambda
    bodies) that was not."""
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("cnt"),
        F.lit(0).cast("long").alias("best_cnt"),
        F.lit(0).cast("long").alias("best_len"),
    )

    def _close(acc):
        # fold the just-finished run (acc.prev x acc.cnt) into the best
        clen = F.coalesce(F.length(acc["prev"]).cast("long"), F.lit(0).cast("long"))
        better = acc["prev"].isNotNull() & (
            (acc["cnt"] > acc["best_cnt"])
            | ((acc["cnt"] == acc["best_cnt"]) & (clen > acc["best_len"]))
        )
        return (
            F.when(better, acc["cnt"]).otherwise(acc["best_cnt"]),
            F.when(better, clen).otherwise(acc["best_len"]),
        )

    def _merge(acc, x):
        same = acc["prev"].eqNullSafe(x)
        bc, bl = _close(acc)
        return F.struct(
            x.alias("prev"),
            F.when(same, acc["cnt"] + F.lit(1).cast("long"))
            .otherwise(F.lit(1).cast("long"))
            .alias("cnt"),
            F.when(same, acc["best_cnt"]).otherwise(bc).alias("best_cnt"),
            F.when(same, acc["best_len"]).otherwise(bl).alias("best_len"),
        )

    def _finish(acc):
        bc, bl = _close(acc)
        return F.struct(bc.alias("cnt"), bl.alias("len"))

    return F.aggregate(srt, init, _merge, _finish)


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

    INLINE-SAFETY INVARIANT (the 100 TB consideration): every lambda
    body in this operator references ONLY its lambda arguments — never
    an outer array expression. Interpreted HOFs re-evaluate body
    subtrees PER ELEMENT, so a body reference to the sorted-gram array
    means re-sorting (and re-tokenizing) the document once per element:
    O(G² log G) per row, an observed hang on kilobyte documents. Column
    staging alone (the previous defense) is NOT sufficient — predicate
    pushdown substitutes the staged aliases straight into a downstream
    filter (e.g. clean_corpus's `keep` gate), rebuilding the quadratic
    form (observed: 330 ms/doc). Neighbor comparisons are therefore
    shifted-slice zips and the top-run scan is an aggregate fold, both
    of which keep every array reference in argument position; the
    staged columns remain as a constant-factor economy only.
    """
    from cogie_spark.functions.text import word_ngrams

    text = F.col(text_col)
    lines = F.filter(
        F.transform(F.split(text, "\n"), lambda s: F.trim(s)), lambda s: s != ""
    )
    out = df.withColumn("_rl_lsrt", F.array_sort(lines))
    lsrt = F.col("_rl_lsrt")
    nl = F.size(lsrt)
    out = out.withColumn("_rl_lflags", _neighbor_dup_flags(lsrt))
    lflags = F.col("_rl_lflags")
    dup_lines = _arr_sum(F.transform(lflags, lambda b: b.cast("int")))
    dup_line_chars = _arr_sum(
        F.zip_with(lsrt, lflags, lambda l, b: F.when(b, F.length(l)).otherwise(F.lit(0)))
    )
    all_line_chars = _arr_sum(F.transform(lsrt, F.length))
    # NULL text: every fraction is 0.0 (a missing document is not a
    # repetitive one) — without the guard the NULL propagates into
    # least(NULL, 1.0), which SKIPS the NULL operand and silently
    # coerces the answer to the 1.0 cap (code-review r5 finding)
    _nz = lambda c: F.when(text.isNull(), F.lit(0.0)).otherwise(c)  # noqa: E731
    out = out.withColumn(
        "dup_line_frac",
        _nz(F.round(dup_lines / F.greatest(nl.cast("long"), F.lit(1)), 6)),
    ).withColumn(
        "dup_line_char_frac",
        _nz(F.round(dup_line_chars / F.greatest(all_line_chars, F.lit(1)), 6)),
    )

    n_chars = F.greatest(F.length(normalize_text(text)), F.lit(1)).cast("long")
    temps = ["_rl_lsrt", "_rl_lflags"]

    for n in sorted(set(top_ngram_ns) | set(dup_ngram_ns)):
        scol = f"_rl_srt_{n}"
        temps += [scol]
        out = out.withColumn(scol, F.array_sort(word_ngrams(text, n=n, distinct=False)))
        srt = F.col(scol)
        if n in top_ngram_ns:
            top = _top_run(srt)
            out = out.withColumn(
                f"top_{n}gram_char_frac",
                _nz(F.round(F.least((top["cnt"] * top["len"]) / n_chars, F.lit(1.0)), 6)),
            )
        if n in dup_ngram_ns:
            # chars of elements inside duplicated runs == sum over dup
            # runs of cnt x len (each of the run's cnt elements
            # contributes len once) — the documented per-gram
            # overlapping-occurrence upper bound, run-arithmetic-free
            dup_chars = _arr_sum(
                F.zip_with(
                    srt,
                    _neighbor_dup_flags(srt),
                    lambda x, b: F.when(b, F.length(x).cast("long")).otherwise(
                        F.lit(0).cast("long")
                    ),
                )
            )
            out = out.withColumn(
                f"dup_{n}gram_char_frac",
                _nz(F.round(F.least(dup_chars / n_chars, F.lit(1.0)), 6)),
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
    # windowed minima as `window` shifted slices zipped + least():
    # inline-safe (see repetition_features INLINE-SAFETY) — the previous
    # array_min(F.slice(hashes, i, window)) lambda body re-evaluated the
    # whole shingle-hash array per window position, O(n^2 k) per row.
    # least() skips the NULLs short tails zip to, matching array_min
    # over the shorter boundary slices.
    parts = [F.slice(hashes, 1 + j, n).alias(f"h{j}") for j in range(window)]
    mins = F.transform(
        F.arrays_zip(*parts),
        lambda s: F.least(*[s[f"h{j}"] for j in range(window)]),
    )
    return F.array_distinct(mins)
