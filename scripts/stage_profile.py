"""Per-stage flagship profile at one core count — the scaling-evidence
harness behind BASELINE.md's stage table.

Runs the flagship stages with explicit materialization barriers so each
stage's wall is attributable (NOTE: barriers change what is measured vs
the lazy pipeline — use the RATIOS across core counts, not the absolute
walls, per BASELINE.md).

Usage (pin cores so local[8] is really an 8-core machine):
    taskset -c 0-7  python scripts/stage_profile.py 8  [n_groups]
    taskset -c 0-31 python scripts/stage_profile.py 32 [n_groups]

Prints one JSON line: {"cores": N, "groups": G, "stages": {name: sec}}.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main():
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_groups = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000

    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    from cogie_spark.fixtures.codefiles import code_files
    from cogie_spark.operators.blocking import (
        bands_from_signatures,
        candidate_pairs,
        estimate_jaccard,
        signature_table,
    )
    from cogie_spark.operators.cc import connected_components
    from cogie_spark.operators.scoring import corpus_idf, match_edges, score_features
    from cogie_spark.plans.linkage import LinkageConfig
    from cogie_spark.session import get_spark

    cfg = LinkageConfig()
    spark = get_spark(
        app_name=f"stage_profile_{cores}", master=f"local[{cores}]", shuffle_partitions=cores
    )

    fixture = os.path.join("/tmp", f"cogie_bench_fixture_g{n_groups}")
    if not os.path.exists(os.path.join(fixture, "_SUCCESS")):
        code_files(spark, n_groups=n_groups, seed=42).write.mode("overwrite").parquet(fixture)

    stages: dict[str, float] = {}

    def bar(name, df):
        t0 = time.time()
        df.persist(StorageLevel.MEMORY_AND_DISK).count()
        stages[name] = round(time.time() - t0, 2)
        return df

    files = bar("load", spark.read.parquet(fixture))

    # exact pre-dedup (one representative per distinct sha)
    keyed = files.withColumn("_sha", F.col("sha256"))
    reps = keyed.groupBy("_sha").agg(F.min(cfg.id_col).alias("_rep_id"))
    reps_files = keyed.join(
        reps.withColumnRenamed("_rep_id", cfg.id_col), ["_sha", cfg.id_col], "inner"
    ).drop("_sha")
    reps_files = bar("prededup", reps_files)

    sigs = bar(
        "signatures",
        signature_table(
            reps_files, id_col=cfg.id_col, content_col=cfg.content_col,
            key_cols=cfg.key_cols, num_perm=cfg.num_perm, shingle_k=cfg.shingle_k,
            mode=cfg.signature_mode,
        ),
    )

    # banding + pair generation + cascade (the round-2 wall-flat stage)
    t0 = time.time()
    blocks = bands_from_signatures(
        sigs, id_col=cfg.id_col, key_cols=cfg.key_cols,
        bands=cfg.bands, rows_per_band=cfg.num_perm // cfg.bands,
    )
    pairs, dropped = candidate_pairs(
        blocks, id_col=cfg.id_col, key_cols=cfg.key_cols, max_block_size=cfg.max_block_size
    )
    from cogie_spark.functions.text import normalize_text

    side = sigs.select(F.col(cfg.id_col).alias("_sid"), "sig").join(
        reps_files.select(
            F.col(cfg.id_col).alias("_sid"),
            F.substring(normalize_text(cfg.content_col), 1, cfg.feature_chars).alias("_feat"),
        ),
        "_sid",
    ).persist(StorageLevel.MEMORY_AND_DISK)
    pairs = (
        pairs.join(
            side.select(F.col("_sid").alias("left_id"), F.col("sig").alias("_lsig"), F.col("_feat").alias("_lf")),
            "left_id",
        )
        .join(
            side.select(F.col("_sid").alias("right_id"), F.col("sig").alias("_rsig"), F.col("_feat").alias("_rf")),
            "right_id",
        )
        .withColumn("est_jaccard", estimate_jaccard(F.col("_lsig"), F.col("_rsig"), cfg.num_perm))
        .filter(F.col("est_jaccard") >= cfg.prefilter_est_jaccard)
        .drop("_lsig", "_rsig")
    )
    pairs = pairs.persist(StorageLevel.MEMORY_AND_DISK)
    n_pairs = pairs.count()
    stages["banding_pairs_cascade"] = round(time.time() - t0, 2)

    # scorer
    t0 = time.time()
    idf = spark.sparkContext.broadcast(
        corpus_idf(reps_files, content_col=cfg.content_col, max_terms=cfg.idf_max_terms)
    )
    scored = score_features(
        pairs, jw_chars=cfg.jw_chars, ts_chars=cfg.ts_chars, weights=cfg.weights, idf=idf
    ).persist(StorageLevel.MEMORY_AND_DISK)
    scored.count()
    stages["scorer"] = round(time.time() - t0, 2)

    t0 = time.time()
    comp = connected_components(match_edges(scored, threshold=cfg.threshold), max_iter=cfg.cc_max_iter)
    n_comp = comp.count()
    stages["connected_components"] = round(time.time() - t0, 2)

    print(json.dumps({
        "cores": cores, "groups": n_groups, "pairs": n_pairs, "components": n_comp,
        "stages": stages, "total": round(sum(stages.values()), 2),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
