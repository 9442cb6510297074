"""Engine-portable deterministic hashing primitives.

The reference replaces hashing with a learned FAISS ANN index
(/root/reference/cogie/models/el/blink.py:97-167) for sub-linear candidate
generation. Our Spark-first equivalent is MinHash-LSH banding, which needs
a hash family that is:

1. deterministic across engines (Spark AND DuckDB — the driver's oracle),
2. computable entirely JVM-side with built-in expressions (no Python),
3. cheap enough to evaluate per-shingle at 10^12-file scale.

We use the top 60 bits of md5 (15 hex chars -> BIGINT). Identical SQL
exists in DuckDB: ``('0x' || substring(md5(x),1,15))::BIGINT``.
A salt prefix gives us an indexed hash family h_i(x) = h64(i || ':' || x),
the standard "k independent permutations" construction for MinHash.

All functions here return Column expressions (whole-stage codegen'd);
none drop to Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def h64(col: Column | str, salt: str = "") -> Column:
    """Portable 60-bit hash of a string column as BIGINT.

    Matches DuckDB: ('0x' || substring(md5(<salt>:<x>),1,15))::BIGINT
    """
    c = F.col(col) if isinstance(col, str) else col
    if salt:
        c = F.concat(F.lit(f"{salt}:"), c)
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


def h64_sql(expr: str, salt: str = "") -> str:
    """The DuckDB-side SQL text equivalent of :func:`h64` (for oracles)."""
    inner = f"'{salt}:' || {expr}" if salt else expr
    return f"('0x' || substring(md5({inner}), 1, 15))::BIGINT"


def stable_id(*cols: Column | str) -> Column:
    """Stable node id = sha256 over the natural key (SURVEY.md §7.3:
    connected-components needs a total order on node ids).

    Mirrors the reference's dense ``local_idx`` assignment
    (/root/reference/cogie/utils/util.py:427-444) but is order-free and
    therefore safe under distributed, re-partitioned input.
    """
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    return F.sha2(F.concat_ws("", *cs), 256)


# Linear-permutation MinHash family over a single base hash:
#   base(s)  = top 28 bits of md5(s)            (one md5 per shingle)
#   perm_i(h)= (a_i * h + b_i) mod P            (exact int64, no overflow:
#              a_i < P < 2^30 ... a_i*h < 2^58)
# Same constants and arithmetic are emitted into the DuckDB oracle SQL, so
# signatures are bit-identical across engines.
MINHASH_P = 1_000_000_007
_A_MULT = 2_654_435_761  # Knuth multiplicative constant
_B_MULT = 40_503


def _perm_coeffs(i: int) -> tuple[int, int]:
    return (_A_MULT * i + 1) % MINHASH_P, (_B_MULT * i + 7) % MINHASH_P


def base_hash28(col: Column) -> Column:
    """Portable 28-bit base hash: ('0x'||substring(md5(x),1,7))::BIGINT."""
    return F.conv(F.substring(F.md5(col), 1, 7), 16, 10).cast("bigint")


def minhash_signature(shingles: Column, num_perm: int) -> Column:
    """MinHash signature: array of ``num_perm`` BIGINT minima.

    One md5 per shingle, then ``num_perm`` linear permutations — the
    standard k-permutation construction, kept cheap enough to run per row
    at 10^12-file scale. Pure built-in exprs (transform + array_min),
    whole-stage codegen'd. Replaces the role of the reference's
    bi-encoder+FAISS retrieval
    (/root/reference/cogie/toolkit/el/el_toolkit.py:511-535).
    """
    return minhash_from_hashes(F.transform(shingles, base_hash28), num_perm)


def minhash_from_hashes(hashes: Column, num_perm: int) -> Column:
    """Signature from precomputed base hashes. Callers should materialize
    the base-hash array in its own projection first (operators/blocking.py
    does) so the md5 pass runs once, not ``num_perm`` times.
    """
    def perm(a: int, b: int):
        # unary closure — PySpark maps lambda arity to HOF arg count,
        # so default-arg tricks would mis-declare a 3-arg lambda
        return lambda h: (F.lit(a) * h + F.lit(b)) % F.lit(MINHASH_P)

    mins = []
    for i in range(num_perm):
        a, b = _perm_coeffs(i)
        mins.append(F.array_min(F.transform(hashes, perm(a, b))))
    return F.array(*mins)



def minhash_bands(signature: Column, bands: int, rows_per_band: int) -> Column:
    """Split a MinHash signature into LSH bands.

    Returns array<struct<band_id:int, band_hash:string>> — explode it and
    equi-join on (band_id, band_hash) to get candidate pairs. Two items
    collide on a band iff all ``rows_per_band`` minima agree, giving the
    classic (1-(1-s^r)^b) S-curve.
    """
    structs = []
    for b in range(bands):
        sl = F.slice(signature, b * rows_per_band + 1, rows_per_band)
        # BIGINT band hash: block keys are shuffled/sorted billions of
        # times at scale — 8-byte longs beat 32-char md5 strings on
        # every axis (bytes moved, comparisons, hashing). xxhash64 over
        # the concatenated minima; the value never crosses engines
        # (oracles verify pair OUTPUT, not band representation).
        band_hash = F.xxhash64(F.concat_ws("_", F.transform(sl, lambda x: x.cast("string"))))
        structs.append(F.struct(F.lit(b).alias("band_id"), band_hash.alias("band_hash")))
    return F.array(*structs)


def simhash64(token_col: Column, bits: int = 64) -> Column:
    """SimHash over a token array, entirely with built-in expressions.

    Each token hashes to ``bits`` bits via h64; per bit position we sum
    +1/-1 votes across tokens and take the sign. Implemented as: for each
    bit j, sum over tokens of (2*((h>>j)&1)-1); result bit j = vote>0.

    Expressed with aggregate() over the token array so it runs JVM-side.
    """
    h = F.transform(token_col, lambda t: h64(t))

    def bit_expr(j: int) -> Column:
        def merge(acc: Column, x: Column) -> Column:
            return acc + (F.shiftright(x, j).bitwiseAND(F.lit(1)) * 2 - 1)

        votes = F.aggregate(h, F.lit(0).cast("long"), merge)
        return F.when(votes > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))

    out = F.lit(0).cast("long")
    for j in range(bits - 1, -1, -1):
        out = out * 2 + bit_expr(j)
    return out
