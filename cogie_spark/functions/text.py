"""Text normalization / shingling / tokenization — built-in exprs only.

Mirrors the reference's feature builders (lowercase+join
/root/reference/cogie/toolkit/el/el_toolkit.py:92-96; WordPiece
sub-tokenization el_toolkit.py:209-233) with engine-portable equivalents:
whitespace tokens and character k-shingles. Shingles feed MinHash
(functions/hashing.py); tokens feed SimHash / TF-IDF / quality scoring.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def normalize_text(col: Column | str) -> Column:
    """lower + collapse whitespace runs + trim.

    Portable DuckDB twin:
    trim(regexp_replace(lower(x), '\\s+', ' ', 'g'))
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def tokens(col: Column | str) -> Column:
    """Whitespace tokens of normalized text (array<string>).

    DuckDB twin: string_split(<normalized>, ' ')
    """
    return F.split(normalize_text(col), " ")


def char_shingles(col: Column | str, k: int = 8, distinct: bool = True) -> Column:
    """Character k-shingles of normalized text as array<string>.

    For text shorter than k, the whole string is the single shingle.
    DuckDB twin (identical semantics):
      list_distinct(list_transform(
          range(1, greatest(length(t)-k+2, 2)),
          i -> substring(t, i::INT, k)))

    INLINE-SAFE / LINEAR (same property as :func:`word_ngrams`): the
    old form called ``t.substr(i, k)`` inside the transform body, where
    ``t`` is the normalize_text subtree — interpreted HOFs re-evaluate
    body subtrees per element, so the document was re-normalized (three
    regexp passes) once PER SHINGLE: O(len^2) per row, measured 14x
    slower on the code fixture. Shingles are now k shifted slices of
    the char array zipped positionally; short tails zip as NULLs which
    concat_ws drops, reproducing the whole-string-single-shingle
    behavior for text shorter than k.
    """
    t = normalize_text(col)
    chars = F.split(t, "")
    n = F.greatest(F.length(t) - F.lit(k - 1), F.lit(1))
    parts = [F.slice(chars, 1 + j, n).alias(f"c{j}") for j in range(k)]
    sh = F.transform(
        F.arrays_zip(*parts),
        lambda s: F.concat_ws("", *[s[f"c{j}"] for j in range(k)]),
    )
    return F.array_distinct(sh) if distinct else sh


def word_ngrams(col: Column | str, n: int = 3, distinct: bool = True) -> Column:
    """Word n-gram shingles (array<string>) — ~5x fewer elements than
    char shingles on code text; the pipeline's fast blocking feature.

    INLINE-SAFE / LINEAR construction: the gram array is built from n
    shifted slices of the token array zipped positionally, so every
    reference to the token array sits in an ARGUMENT position (evaluated
    once per row). The previous form sliced the token array inside the
    transform lambda BODY — interpreted HOFs re-evaluate body subtrees
    per element, so it re-tokenized the document once PER GRAM
    (measured 22x slower on 1.2k-token docs), and got quadratically
    worse when an optimizer rule (e.g. filter pushdown) inlined it.
    Short slices (j past the end) zip as NULLs, which concat_ws skips —
    reproducing the old slice-join behavior for size < n exactly."""
    toks = tokens(col)
    cnt = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(1))
    shifted = [F.slice(toks, 1 + j, cnt).alias(f"g{j}") for j in range(n)]
    grams = F.transform(
        F.arrays_zip(*shifted),
        lambda s: F.concat_ws(" ", *[s[f"g{j}"] for j in range(n)]),
    )
    # empty token array -> one empty gram (the legacy boundary: the old
    # sequence(1, 1) form emitted concat_ws of an empty slice)
    grams = F.when(F.size(toks) == F.lit(0), F.array(F.lit(""))).otherwise(grams)
    return F.array_distinct(grams) if distinct else grams


def nltk_tokens_udf():
    """F1 full-parity tokenizer: a vectorized pandas UDF wrapping
    ``nltk.word_tokenize`` — the reference's TokenizeToolkit
    (/root/reference/cogie/toolkit/tokenize/tokenize_toolkit.py:52-55).

    OPTIONAL: nltk (and its punkt data) is not shipped in this sandbox,
    so the UDF is built lazily and raises a clear ImportError when nltk
    is unavailable. The engine's default tokenizers (whitespace
    :func:`tokens` and the BPE-ish regex in operators/textstats.py) are
    the portable, oracle-checkable paths; this exists for users who
    need byte-level parity with the reference's NLTK tokenization.
    """
    try:
        import nltk  # noqa: F401
        from nltk.tokenize import word_tokenize
    except ImportError as e:  # pragma: no cover - sandbox has no nltk
        raise ImportError(
            "nltk_tokens_udf requires the optional 'nltk' package "
            "(pip install nltk; python -m nltk.downloader punkt). "
            "Use cogie_spark.functions.text.tokens for the portable path."
        ) from e

    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, StringType

    @pandas_udf(ArrayType(StringType()))
    def _tok(s: pd.Series) -> pd.Series:
        return s.fillna("").map(word_tokenize)

    return _tok


def shingles_sql(expr: str, k: int = 8, distinct: bool = True) -> str:
    """DuckDB SQL text equivalent of :func:`char_shingles` (for oracles)."""
    norm = f"trim(regexp_replace(lower({expr}), '\\s+', ' ', 'g'))"
    base = (
        f"list_transform(range(1, greatest(length({norm}) - {k - 2}, 2)), "
        f"i -> substring({norm}, i::INT, {k}))"
    )
    return f"list_distinct({base})" if distinct else base
