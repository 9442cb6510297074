"""Pairwise scoring over the bounded candidate-pair table.

Replaces the reference's cross-encoder re-ranking
(/root/reference/cogie/toolkit/el/el_toolkit.py:631-645; pair build
el_modify el_toolkit.py:538-555): the pair table (J5 in SURVEY.md §2.3)
is joined back to both sides' features, then scored by Arrow-batched
pandas UDFs (functions/similarity.py) — one vectorized batch per Arrow
chunk, zero per-row Python, exactly the reference's batched-GPU shape
restated on Spark.

Feature truncation mirrors the reference's fixed feature widths
(max_context_length=32 / max_cand_length=128 / pair width 160,
/root/reference/test/models/test_blink.py:39-53): we truncate normalized
content to ``feature_chars`` before scoring so scorer cost is bounded per
pair regardless of file size — the property that keeps throughput stable
at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cogie_spark.functions.similarity import jaro_winkler, token_set_ratio
from cogie_spark.functions.text import normalize_text


def score_pairs(
    pairs: DataFrame,
    files: DataFrame,
    id_col: str = "file_id",
    content_col: str = "content",
    feature_chars: int = 2000,
    jw_chars: int = 256,
    weights: tuple[float, float] = (0.3, 0.7),
) -> DataFrame:
    """Join pair ids to features and compute the blended score.

    score = w_jw * jaro_winkler + w_ts * token_set_ratio.
    Jaro-Winkler (quadratic in the worst case) sees only the first
    ``jw_chars`` chars — the same bounded-feature-width discipline as the
    reference's max_context_length=32 tokens; token_set_ratio sees the
    full ``feature_chars`` window (its DP row is vectorized in numpy).
    Two shuffles (the two feature joins); the scorers are narrow stages.
    """
    feats = files.select(
        F.col(id_col).alias("_fid"),
        F.substring(normalize_text(content_col), 1, feature_chars).alias("_feat"),
    )
    w_jw, w_ts = weights
    joined = pairs.join(
        feats.withColumnRenamed("_fid", "left_id").withColumnRenamed("_feat", "_lf"), "left_id"
    ).join(feats.withColumnRenamed("_fid", "right_id").withColumnRenamed("_feat", "_rf"), "right_id")
    # the scorers are CPU-bound per ROW; AQE coalesces this small-BYTES
    # shuffle to a couple of partitions, which would serialize the
    # Arrow-batched UDF stage. Spread it across the cluster explicitly.
    n_part = max(joined.sparkSession.sparkContext.defaultParallelism * 2, 8)
    scored = (
        joined.repartition(n_part)
        .withColumn(
            "jw",
            jaro_winkler(
                F.substring(F.col("_lf"), 1, jw_chars), F.substring(F.col("_rf"), 1, jw_chars)
            ),
        )
        .withColumn("ts", token_set_ratio(F.col("_lf"), F.col("_rf")))
        .withColumn("score", F.lit(w_jw) * F.col("jw") + F.lit(w_ts) * F.col("ts"))
        .drop("_lf", "_rf")
    )
    return scored


def match_edges(scored: DataFrame, threshold: float = 0.72) -> DataFrame:
    """Threshold scored pairs into the match-edge list for clustering.

    The reference's analogue is the argmax winner pick
    (el_toolkit.py:131-133); in the dedup/clustering formulation every
    above-threshold pair is an edge and transitivity is resolved by
    connected components (operators/cc.py).
    """
    return scored.filter(F.col("score") >= threshold).select("left_id", "right_id", "score")
