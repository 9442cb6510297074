"""spark-submit entry point for the flagship linkage pipeline.

Usage (the north rule's deployment contract):

    python -c "from cogie_spark.shipping import package_zip; print(package_zip())"
    spark-submit --master local[32] \
        --py-files /tmp/cogie_spark_pkg.zip \
        scripts/linkage_job.py --groups 3000 --output /tmp/linkage_out

On a real cluster the same command with --master yarn/k8s and
--num-executors N is the N-vs-4N scaling run.
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--groups", type=int, default=1000)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--output", default=None)
    ap.add_argument("--input", default=None, help="parquet dir of code_files rows (overrides --groups)")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--threshold", type=float, default=0.72)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("cogie_linkage").getOrCreate()

    from cogie_spark.fixtures.codefiles import code_files
    from cogie_spark.io.tableio import CheckpointManager
    from cogie_spark.plans.linkage import LinkageConfig, run_linkage

    files = (
        spark.read.parquet(args.input) if args.input else code_files(spark, args.groups, args.seed)
    )
    ck = CheckpointManager(spark, args.checkpoint) if args.checkpoint else None
    t0 = time.time()
    out = run_linkage(files, LinkageConfig(threshold=args.threshold), checkpoint=ck)
    clusters = out["clusters"]
    if args.output:
        clusters.write.mode("overwrite").parquet(args.output)
        n = spark.read.parquet(args.output).count()
    else:
        n = clusters.count()
    stats = {
        "rows": n,
        "pairs_scored": out["scored"].count(),
        "wall_sec": round(time.time() - t0, 2),
    }
    print(json.dumps(stats))
    spark.stop()


if __name__ == "__main__":
    main()
