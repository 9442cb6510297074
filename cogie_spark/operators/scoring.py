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

from cogie_spark.functions.similarity import (
    jaro_winkler,
    tfidf_cosine_udf,
    token_set_ratio_native,
)
from cogie_spark.functions.text import normalize_text, tokens


def corpus_idf(
    files: DataFrame,
    content_col: str = "content",
    max_terms: int = 100_000,
    n_docs: int | None = None,
) -> dict[str, float]:
    """token -> log(N/df) over the corpus, capped at the ``max_terms``
    most-frequent terms (the cap bounds the broadcast at 10^12-file
    scale; tokens outside the cap default to weight 1.0 inside the UDF).

    ``n_docs``: pass the corpus row count when the caller already knows
    it (run_linkage recovers it from the blocking size-precheck
    aggregate) — skips this function's own count() job, leaving ONE
    action (the bounded vocab collect).

    This is the deterministic stand-in for the reference's precomputed
    candidate encodings (/root/reference/cogie/models/el/biencoder.py:
    127-128): built once, shipped to every executor, reused per batch.
    """
    import math

    from cogie_spark.jobdesc import job_desc

    if n_docs is None:
        with job_desc(files, "cogie:idf-ndocs"):
            n_docs = files.count()
    n_docs = n_docs or 1
    # IDF is a corpus statistic — estimate it from a deterministic hash
    # sample once the corpus is large (identical idf distribution, ~10x
    # less explode/sort work and a bounded driver collect)
    target_sample = 30_000
    src = files
    denom = n_docs
    if n_docs > target_sample:
        k = max(2, n_docs // target_sample)
        src = files.filter(F.pmod(F.xxhash64(F.col(content_col)), F.lit(k)) == 0)
        denom = max(n_docs // k, 1)
    with job_desc(files, "cogie:idf-vocab"):
        df_rows = _collect_idf_rows(src, content_col, max_terms)
    return {r["t"]: math.log(denom / r["df"]) + 1.0 for r in df_rows}


def _collect_idf_rows(src, content_col, max_terms):
    return (
        src.select(F.explode(F.array_distinct(tokens(content_col))).alias("t"))
        .filter(F.col("t") != "")
        .groupBy("t")
        .agg(F.count("*").alias("df"))
        .orderBy(F.desc("df"), F.asc("t"))
        .limit(max_terms)
        .collect()
    )


def score_pairs(
    pairs: DataFrame,
    files: DataFrame,
    id_col: str = "file_id",
    content_col: str = "content",
    feature_chars: int = 2000,
    jw_chars: int = 256,
    ts_chars: int = 512,
    weights: tuple[float, float, float] = (0.2, 0.5, 0.3),
    idf: dict[str, float] | None = None,
    partitions: int | None = None,
) -> DataFrame:
    """Join pair ids to features and compute the blended score.

    score = w_jw * jaro_winkler + w_ts * token_set_ratio
          + w_tf * tfidf_cosine — the north rule's scorer triple
    (jw/tfidf Arrow-batched pandas UDFs, token-set pure JVM — the
    cross-encoder replacement). The two quadratic scorers see bounded
    windows — ``jw_chars`` and ``ts_chars`` — the same bounded-feature-
    width discipline as the reference's max_seq_length=160-token pair
    input (test_blink.py:53): per-pair scorer cost is O(window²), so an
    unbounded window is the difference between a scorer stage that
    scales with pair count and one that scales with pair×content size.
    tfidf (linear) sees the full ``feature_chars`` window.
    Two shuffles (the two feature joins); the scorers are narrow stages.
    """
    feats = files.select(
        F.col(id_col).alias("_fid"),
        F.substring(normalize_text(content_col), 1, feature_chars).alias("_feat"),
    )
    joined = pairs.join(
        feats.withColumnRenamed("_fid", "left_id").withColumnRenamed("_feat", "_lf"), "left_id"
    ).join(feats.withColumnRenamed("_fid", "right_id").withColumnRenamed("_feat", "_rf"), "right_id")
    return score_features(
        joined,
        jw_chars=jw_chars,
        ts_chars=ts_chars,
        weights=weights,
        idf=idf,
        partitions=partitions,
    )


def score_features(
    joined: DataFrame,
    jw_chars: int = 256,
    ts_chars: int = 512,
    weights: tuple[float, float, float] = (0.2, 0.5, 0.3),
    idf: dict[str, float] | None = None,
    partitions: int | None = None,
) -> DataFrame:
    """Score a pair table that already carries its feature columns
    (_lf, _rf) — the join-free half of :func:`score_pairs`.

    Callers that must join other per-id payloads onto the pair table
    anyway (run_linkage attaches MinHash signatures for the cascade
    filter) should attach features in the SAME joins and call this
    directly: every avoided pair-table shuffle is the dominant cost at
    10^12-pair scale.

    ``partitions`` controls the pre-scorer spread WITHOUT probing the
    plan (a ``joined.rdd.getNumPartitions()`` probe under AQE finalizes
    the adaptive plan and can execute the upstream join shuffles at
    plan-build time — results a later action's fresh QueryExecution
    does not reuse, i.e. a hidden double execution for any caller whose
    pair table is not persisted):

    - ``None`` (default): repartition to ``max(cores*2, 8)``. Safe for
      public callers — the scorers are CPU-bound per row and AQE
      coalesces small-BYTES shuffles to 1-2 partitions, which would
      serialize the UDF stage; one extra pair-table shuffle is cheaper
      than a single-core scorer stage.
    - ``0``: score in place. For callers (run_linkage) that KNOW the
      upstream partitioning already feeds every core — skipping the
      shuffle of the pipeline's biggest relation was A/B-measured a
      net win at bench scale.
    - ``n > 0``: repartition to exactly ``n``.
    """
    w_jw, w_ts, w_tf = weights
    tf_cos = tfidf_cosine_udf(idf)
    if partitions is None:
        cores = joined.sparkSession.sparkContext.defaultParallelism
        joined = joined.repartition(max(cores * 2, 8))
    elif partitions > 0:
        joined = joined.repartition(partitions)
    return (
        joined
        .withColumn(
            "jw",
            jaro_winkler(
                F.substring(F.col("_lf"), 1, jw_chars), F.substring(F.col("_rf"), 1, jw_chars)
            ),
        )
        # token_set_ratio is pure JVM expressions (sorted-unique-token
        # Levenshtein ratio) — one fewer Arrow round-trip per pair
        .withColumn(
            "ts",
            token_set_ratio_native(
                F.substring(F.col("_lf"), 1, ts_chars), F.substring(F.col("_rf"), 1, ts_chars)
            ),
        )
        .withColumn("tfidf", tf_cos(F.col("_lf"), F.col("_rf")))
        .withColumn(
            "score",
            F.lit(w_jw) * F.col("jw") + F.lit(w_ts) * F.col("ts") + F.lit(w_tf) * F.col("tfidf"),
        )
        .drop("_lf", "_rf")
    )


def match_edges(scored: DataFrame, threshold: float = 0.72) -> DataFrame:
    """Threshold scored pairs into the match-edge list for clustering.

    The reference's analogue is the argmax winner pick
    (el_toolkit.py:131-133); in the dedup/clustering formulation every
    above-threshold pair is an edge and transitivity is resolved by
    connected components (operators/cc.py).
    """
    return scored.filter(F.col("score") >= threshold).select("left_id", "right_id", "score")
