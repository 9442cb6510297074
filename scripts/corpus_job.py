"""spark-submit entry point for the composed corpus-cleaning plan.

    spark-submit --master local[32] \
        --py-files /tmp/cogie_spark_pkg.zip \
        scripts/corpus_job.py --input /data/documents --output /data/clean

Tags every document (audit view), writes the gated + deduplicated +
PII-redacted training view, and prints one JSON stats line.
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="parquet dir with (doc_id, text) columns")
    ap.add_argument("--output", default=None, help="parquet dir for the kept view")
    ap.add_argument("--tagged-output", default=None, help="parquet dir for the audit view")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--min-quality", type=float, default=0.3)
    ap.add_argument("--max-dup-line-frac", type=float, default=0.30)
    ap.add_argument("--max-top-2gram-char-frac", type=float, default=0.20)
    ap.add_argument("--langs", default="", help="comma-separated language allowlist (empty = all)")
    ap.add_argument("--no-redact", action="store_true")
    ap.add_argument(
        "--pack-budget", type=int, default=0,
        help="if >0, bin-pack kept docs into packs of at most this many "
             "whitespace tokens (operators/packing.py) and report fill stats",
    )
    ap.add_argument("--pack-output", default=None,
                    help="parquet dir for the (id, pack_id, pack_slot) assignment")
    ap.add_argument(
        "--near-dup", choices=("off", "minhash", "semantic"), default="off",
        help="near-duplicate pruning of the kept view (plans/corpus.py "
             "near_dup_prune): transitive groups, min-id representative",
    )
    ap.add_argument("--near-dup-threshold", type=float, default=None,
                    help="jaccard (minhash) / cosine (semantic) threshold; "
                         "omit for the operator defaults")
    ap.add_argument("--vec-col", default="embedding",
                    help="embedding column for --near-dup semantic")
    ap.add_argument(
        "--mix", default="",
        help="target domain mix for the training view, e.g. "
             "'en=0.6,fr=0.3,code=0.1' (operators/sampling.mix_sample); "
             "proportions must sum to 1; requires --mix-budget",
    )
    ap.add_argument("--mix-budget", type=int, default=0,
                    help="total token budget the --mix proportions apply to")
    ap.add_argument(
        "--substr-dedup-k", type=int, default=0,
        help="excise every repeated k-token passage except its first-seen "
             "occurrence (dedup.substring_dedup; Lee et al. ExactSubstr); "
             "0 = off. Runs after near-dup pruning, before --mix",
    )
    ap.add_argument("--substr-dedup-winnow", type=int, default=1,
                    help="winnowing window for --substr-dedup-k (>1 keeps "
                         "~1/winnow of window starts via content-defined "
                         "min-fingerprint selection — alignment-independent, "
                         "unlike a positional stride; trades span-edge "
                         "precision for fewer exploded rows)")
    ap.add_argument("--mix-stratum-col", default="lang_pred",
                    help="column holding the stratum/domain label; the "
                         "default is the language tag this job's own "
                         "clean_corpus stage computes")
    args = ap.parse_args()
    if bool(args.mix) != (args.mix_budget > 0):
        ap.error("--mix and --mix-budget must be given together")

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("cogie_corpus").getOrCreate()

    from cogie_spark.plans.corpus import CorpusConfig, clean_corpus, kept_view

    cfg = CorpusConfig(
        id_col=args.id_col,
        text_col=args.text_col,
        min_quality=args.min_quality,
        max_dup_line_frac=args.max_dup_line_frac,
        max_top_2gram_char_frac=args.max_top_2gram_char_frac,
        langs=tuple(s for s in args.langs.split(",") if s),
        redact=not args.no_redact,
    )
    docs = spark.read.parquet(args.input)
    t0 = time.time()
    out = clean_corpus(docs, cfg)
    if args.tagged_output:
        out["tagged"].write.mode("overwrite").parquet(args.tagged_output)
    if args.tagged_output:
        # derive kept from the just-written audit bytes: writing both
        # views from the same clean_corpus lineage would run the whole
        # tag plan over the raw corpus TWICE
        kept = kept_view(spark.read.parquet(args.tagged_output), cfg)
    else:
        kept = out["kept"]
    n_dup_pruned = None
    if args.near_dup != "off":
        from cogie_spark.plans.corpus import near_dup_prune

        if not args.tagged_output:
            # near-dup pair generation reads its input several times
            # (signatures + verify joins); without written audit bytes
            # to re-read, materialize the gate plan once
            kept = kept.persist()
        kw = {}
        if args.near_dup == "minhash":
            if args.near_dup_threshold is not None:
                kw["jaccard_threshold"] = args.near_dup_threshold
        else:
            kw["vec_col"] = args.vec_col
            if args.near_dup_threshold is not None:
                kw["threshold"] = args.near_dup_threshold
        nd = near_dup_prune(kept, cfg, method=args.near_dup, **kw)
        n_dup_pruned = nd["dup_groups"].count()
        kept = nd["pruned"]
    substr_removed = None
    if args.substr_dedup_k > 0:
        from pyspark.sql import functions as F

        from cogie_spark.operators.dedup import substring_dedup

        kept = substring_dedup(
            kept, args.id_col, args.text_col,
            k=args.substr_dedup_k, winnow=args.substr_dedup_winnow,
            scope_col="lang_pred" if "lang_pred" in kept.columns else None,
        ).persist()  # the stats agg below and the downstream consumers
        # (--output write / counts) otherwise each re-run the window
        # explode + owner shuffle; one-shot job, session-end release
        substr_removed = kept.agg(
            F.sum("n_tokens_removed").alias("t"),
            F.sum((F.col("n_spans_removed") > 0).cast("long")).alias("d"),
        ).collect()[0]
        kept = kept.drop("n_tokens_removed", "n_spans_removed")
    mix_rows = None
    if args.mix:
        from pyspark.sql import functions as F

        from cogie_spark.operators.sampling import mix_sample
        from cogie_spark.operators.textstats import token_count

        mix = {}
        for part in args.mix.split(","):
            s, _, p = part.partition("=")
            mix[s.strip()] = float(p)
        mix_rows = []
        kept = mix_sample(
            kept.withColumn("_mix_tokens", token_count(args.text_col)),
            mix,
            float(args.mix_budget),
            stratum_col=args.mix_stratum_col,
            weight_col="_mix_tokens",
            id_col=args.id_col,
            report=mix_rows,
        ).drop("_mix_tokens")
    if args.output:
        # the training view on disk is the FINAL (gated, deduped,
        # near-dup-pruned) one; downstream stats/packing read the
        # written bytes instead of recomputing the plan
        kept.write.mode("overwrite").parquet(args.output)
        kept = spark.read.parquet(args.output)
    n_in = docs.count()
    n_kept = kept.count()
    stats = {
        "docs_in": n_in,
        "docs_kept": n_kept,
        "kept_frac": round(n_kept / max(n_in, 1), 4),
    }
    if n_dup_pruned is not None:
        stats["near_dup_pruned"] = n_dup_pruned
    if substr_removed is not None:
        stats["substr_tokens_removed"] = int(substr_removed["t"] or 0)
        stats["substr_docs_affected"] = int(substr_removed["d"] or 0)
    if mix_rows is not None:
        # docs_kept counts emitted rows INCLUDING upsampled copies (so
        # kept_frac can exceed 1); docs_unique is the distinct originals
        stats["docs_unique"] = kept.filter(F.col("copy_idx") == 0).count()
        stats["mix"] = [
            {k: (round(v, 4) if isinstance(v, float) else v) for k, v in r.items()}
            for r in mix_rows
        ]
    if args.pack_budget > 0:
        from pyspark.sql import functions as F

        from cogie_spark.operators.packing import pack_sequences, pack_stats
        from cogie_spark.operators.textstats import token_count

        # BFD quality needs a decent population per shard (~64+ docs);
        # the session's shuffle partitioning is the upper bound so huge
        # corpora still spread across the cluster
        shards = max(1, min(
            int(spark.conf.get("spark.sql.shuffle.partitions", "200")),
            n_kept // 64,
        ))
        # after --mix upsampling the id column is no longer unique
        # (copy_idx numbers the extra epochs) — pack on a derived
        # unique id so each copy occupies its own pack slot
        pack_id_col = args.id_col
        pack_in = kept
        if mix_rows is not None:
            pack_id_col = "_pack_id"
            pack_in = kept.withColumn(
                "_pack_id",
                F.concat_ws("#", F.col(args.id_col).cast("string"), F.col("copy_idx")),
            )
        packed = pack_sequences(
            pack_in.select(pack_id_col, token_count(args.text_col).alias("n_tokens")),
            budget=args.pack_budget,
            id_col=pack_id_col,
            shards=shards,
        )
        if args.pack_output:
            packed.write.mode("overwrite").parquet(args.pack_output)
            packed = spark.read.parquet(args.pack_output)
        ps = pack_stats(packed, args.pack_budget).collect()[0]
        stats.update(
            n_packs=ps.n_packs,
            n_oversize_docs=ps.n_oversize,
            pack_fill_rate=float(ps.fill_rate) if ps.fill_rate is not None else None,
        )
    stats["wall_sec"] = round(time.time() - t0, 2)
    print(json.dumps(stats))
    spark.stop()


if __name__ == "__main__":
    main()
