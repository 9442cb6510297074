"""Capture .explain("formatted") for the headline bench queries into
plans/<tag>/<query>_<suffix>.txt — the optimization-round evidence files.

Usage:
    python scripts/capture_plans.py r06 before [sf_dir]
    python scripts/capture_plans.py r06 after  [sf_dir]

Captures the six relational/dedup headliners plus the corpus-clean plan
and the flagship stage plans (signatures, pairs, scored, clusters —
explained WITHOUT running the pipeline's eager actions where possible).
"""

from __future__ import annotations

import os
import sys


def _fmt(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main():
    tag = sys.argv[1] if len(sys.argv) > 1 else "r06"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    outdir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                          "plans", tag)
    os.makedirs(outdir, exist_ok=True)

    from cogie_spark.queries import QUERIES
    from cogie_spark.session import get_spark

    spark = get_spark(app_name="capture_plans")

    for name in ["q01_pricing_summary", "q04_enrich_join", "q08_range_join",
                 "q32_minhash_near_dup", "q24_ann_topk", "q10_vocab_topk"]:
        df = QUERIES[name](spark, sf_dir)
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(_fmt(df))
        print(f"captured {name}")

    # corpus-clean kept view
    from cogie_spark.plans.corpus import CorpusConfig, clean_corpus

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    kept = clean_corpus(docs, CorpusConfig())["kept"]
    with open(os.path.join(outdir, f"corpus_clean_{suffix}.txt"), "w") as f:
        f.write(_fmt(kept))
    print("captured corpus_clean")

    # flagship stage plans on a small fixture (500 groups keeps the
    # eager pipeline actions cheap; plan SHAPE is size-independent)
    from cogie_spark.fixtures.codefiles import code_files
    from cogie_spark.plans.linkage import LinkageConfig, run_linkage

    fixture = os.path.join("/tmp", "cogie_plancap_g500")
    if not os.path.exists(os.path.join(fixture, "_SUCCESS")):
        code_files(spark, n_groups=500, seed=42).write.mode("overwrite").parquet(fixture)
    files = spark.read.parquet(fixture)
    out = run_linkage(files, LinkageConfig())
    for key in ["pairs", "scored", "clusters"]:
        with open(os.path.join(outdir, f"flagship_{key}_{suffix}.txt"), "w") as f:
            f.write(_fmt(out[key]))
        print(f"captured flagship_{key}")
    spark.stop()


if __name__ == "__main__":
    main()
