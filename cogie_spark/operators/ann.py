"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline (the reference's exact
DenseFlatIndexer, /root/reference/cogie/models/el/blink.py:73-93); the
scale path is LSH sign-bucketing / IVF coarse quantization (the role of
HNSW at blink.py:97-167).

The probe side is expected to be small (a query batch) — it is
broadcast; the corpus side streams. Top-k per probe is a window
row_number, the Spark restatement of scores.topk
(/root/reference/cogie/toolkit/el/el_toolkit.py:528).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cogie_spark.functions.hashing import base_hash28
from cogie_spark.functions.similarity import cosine_native


def brute_force_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id_col: str = "probe_id",
) -> DataFrame:
    """Exact cosine top-k: broadcast probes x corpus, window top-k.

    Output: (probe_id, vec_id, cosine, rank). Deterministic tie-break on
    vec_id. Cost is |probes| * |corpus| vector ops, all JVM-side
    (zip_with/aggregate) — the right baseline and the recall oracle for
    the bucketed variant.
    """
    p = probes.select(
        F.col(probe_id_col).alias("probe_id"), F.col(vec_col).cast("array<double>").alias("_pv")
    )
    c = corpus.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).cast("array<double>").alias("_cv")
    )
    scored = (
        c.crossJoin(F.broadcast(p))
        .withColumn("cosine", F.round(cosine_native(F.col("_pv"), F.col("_cv")), 6))
        .drop("_pv", "_cv")
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "vec_id", "cosine", "rank")
    )


def _proj_hash(vec: F.Column, proj_id: int, dim_step: int = 1) -> F.Column:
    """Deterministic pseudo-random projection sign bit, no stored model:
    weight for (proj, dim) = portable hash of 'proj:dim' mapped to ±1;
    sign(sum_d w_pd * v_d) computed with aggregate over the vector.
    """
    def step(acc, x):
        return F.struct(
            (acc["i"] + 1).alias("i"),
            (
                acc["s"]
                + x
                * (
                    (
                        base_hash28(F.concat(F.lit(f"p{proj_id}:"), acc["i"].cast("string")))
                        % F.lit(2)
                    ).cast("double")
                    * 2
                    - 1
                )
            ).alias("s"),
        )

    init = F.struct(F.lit(0).cast("int").alias("i"), F.lit(0.0).alias("s"))
    return (F.aggregate(vec, init, step)["s"] > 0).cast("int")


def lsh_buckets(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding", n_bits: int = 8
) -> DataFrame:
    """Random-hyperplane LSH bucket id per vector (sign-bit code).

    Projections are derived from the portable hash family — no model
    state to ship; any executor recomputes the same planes. Output:
    (vec_id, bucket).
    """
    v = F.col("_v")
    bucket = F.lit(0).cast("long")
    for b in range(n_bits):
        bucket = bucket * 2 + _proj_hash(v, b)
    return df.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).cast("array<double>").alias("_v")
    ).select("vec_id", bucket.alias("bucket"), F.col("_v").alias("embedding"))


def bucketed_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id_col: str = "probe_id",
    n_bits: int = 8,
) -> DataFrame:
    """Approximate top-k: probes only score corpus vectors in the same
    LSH bucket — the sub-linear scale path (candidate recall traded for
    a |corpus|/2^n_bits expected fan-in per probe)."""
    cb = lsh_buckets(corpus, id_col=id_col, vec_col=vec_col, n_bits=n_bits)
    pb = lsh_buckets(probes, id_col=probe_id_col, vec_col=vec_col, n_bits=n_bits).select(
        F.col("vec_id").alias("probe_id"), "bucket", F.col("embedding").alias("_pv")
    )
    scored = (
        cb.join(F.broadcast(pb), "bucket")
        .withColumn("cosine", F.round(cosine_native(F.col("_pv"), F.col("embedding")), 6))
        .select("probe_id", "vec_id", "cosine")
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "vec_id", "cosine", "rank")
    )
