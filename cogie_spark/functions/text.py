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
    """
    t = normalize_text(col)
    n = F.greatest(F.length(t) - F.lit(k - 1), F.lit(1))
    sh = F.transform(F.sequence(F.lit(1), n), lambda i: t.substr(i, F.lit(k)))
    return F.array_distinct(sh) if distinct else sh


def word_ngrams(col: Column | str, n: int = 3, distinct: bool = True) -> Column:
    """Word n-gram shingles (array<string>) — ~5x fewer elements than
    char shingles on code text; the pipeline's fast blocking feature."""
    toks = tokens(col)
    cnt = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(1))
    grams = F.transform(F.sequence(F.lit(1), cnt), lambda i: F.concat_ws(" ", F.slice(toks, i, n)))
    return F.array_distinct(grams) if distinct else grams


def shingles_sql(expr: str, k: int = 8, distinct: bool = True) -> str:
    """DuckDB SQL text equivalent of :func:`char_shingles` (for oracles)."""
    norm = f"trim(regexp_replace(lower({expr}), '\\s+', ' ', 'g'))"
    base = (
        f"list_transform(range(1, greatest(length({norm}) - {k - 2}, 2)), "
        f"i -> substring({norm}, i::INT, {k}))"
    )
    return f"list_distinct({base})" if distinct else base
