"""Blocking: salted MinHash-LSH candidate generation.

Spark-first replacement for the reference's FAISS ANN retrieval stage
(/root/reference/cogie/toolkit/el/el_toolkit.py:511-535 run_biencoder;
index search /root/reference/cogie/models/el/blink.py:157-162). The role
is identical — sub-linear candidate generation that bounds the pair count
before the expensive scorer — but the mechanism is LSH banding expressed
as explode + equi-join so Catalyst/AQE handle the physics.

Scale design (the part that must survive 10^12 files):
- Composite block key = (lang, band_id, band_hash): lang pre-partitions
  the space; band_hash is the MinHash band collision.
- Pair generation is a self-join on the block key. Its cost is
  sum(block_size^2), so skew is THE failure mode: boilerplate files
  (license headers, empty files) form mega-blocks. We cap block size
  with an explicit, LOGGED guardrail (never silent — SURVEY.md §2):
  blocks above ``max_block_size`` are dropped from pair generation and
  reported in the returned stats dict. AQE skew-join handles residual
  imbalance below the cap.
- Pairs are deduped across bands with a groupBy on (left,right) — the
  map-side partial aggregation makes this cheap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cogie_spark.functions.hashing import base_hash28, minhash_bands, minhash_from_hashes
from cogie_spark.functions.text import char_shingles


def with_blocks(
    df: DataFrame,
    id_col: str = "file_id",
    content_col: str = "content",
    key_cols: tuple[str, ...] = ("lang",),
    num_perm: int = 32,
    bands: int = 16,
    shingle_k: int = 8,
) -> DataFrame:
    """Explode each row into its LSH block memberships.

    Output: (id, *key_cols, band_id, band_hash) — one row per band.
    All hashing is built-in-expression (functions/hashing.py), so the
    whole stage is whole-stage-codegen'd JVM work; no Python runs here.
    """
    rows_per_band = num_perm // bands
    bandcol = minhash_bands(F.col("_sig"), bands, rows_per_band)
    return (
        # three projections so each expensive pass (md5 shingle hashing,
        # 32 linear-perm minima) is computed exactly once per row —
        # CollapseProject keeps multiply-referenced aliases materialized
        df.select(
            id_col,
            *key_cols,
            F.transform(char_shingles(content_col, k=shingle_k), base_hash28).alias("_h"),
        )
        .select(id_col, *key_cols, minhash_from_hashes(F.col("_h"), num_perm).alias("_sig"))
        .select(id_col, *key_cols, F.explode(bandcol).alias("_band"))
        .select(
            id_col,
            *key_cols,
            F.col("_band.band_id").alias("band_id"),
            F.col("_band.band_hash").alias("band_hash"),
        )
    )


def candidate_pairs(
    blocks: DataFrame,
    id_col: str = "file_id",
    key_cols: tuple[str, ...] = ("lang",),
    max_block_size: int = 64,
) -> tuple[DataFrame, DataFrame]:
    """Self-join blocks into deduped candidate pairs with a skew guardrail.

    Returns (pairs, dropped_blocks):
    - pairs: (left_id, right_id, *key_cols) distinct, left < right.
    - dropped_blocks: blocks over ``max_block_size`` with their sizes —
      the caller logs/persists these (north rule: no silent caps).

    The block-size computation is one extra aggregation over the block
    table; at scale it is far cheaper than the quadratic blow-up it
    prevents (a single 10^5-member boilerplate block would emit 5*10^9
    pairs).
    """
    from pyspark import StorageLevel

    key = [*key_cols, "band_id", "band_hash"]
    # materialize the block table once: it is referenced three times
    # (size agg + both sides of the self-join); recomputing it would
    # re-run the MinHash pass per reference. MEMORY_AND_DISK spills at
    # scale instead of recomputing.
    blocks = blocks.persist(StorageLevel.MEMORY_AND_DISK)
    sizes = blocks.groupBy(*key).agg(F.count("*").alias("block_size"))
    ok = sizes.filter(F.col("block_size") <= max_block_size).select(*key)
    dropped = sizes.filter(F.col("block_size") > max_block_size)

    pruned = blocks.join(ok, key, "inner")
    a = pruned.alias("a")
    b = pruned.alias("b")
    join_cond = F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    for k in key:
        join_cond = join_cond & (F.col(f"a.{k}") == F.col(f"b.{k}"))
    pairs = (
        a.join(b, join_cond)
        .select(
            F.col(f"a.{id_col}").alias("left_id"),
            F.col(f"b.{id_col}").alias("right_id"),
            *[F.col(f"a.{k}").alias(k) for k in key_cols],
        )
        # dedup across bands: map-side combine makes this a cheap agg
        .groupBy("left_id", "right_id", *key_cols)
        .agg(F.count("*").alias("n_shared_bands"))
    )
    return pairs, dropped
