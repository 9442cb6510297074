"""Streaming corpus ingestion: the composed cleaning gate per
micro-batch, with cross-batch exact dedup against accumulated state.

A crawl arrives continuously; each micro-batch runs the SAME one-scan
tag+gate+dedup plan as the batch job (plans/corpus.py — no second
implementation to drift), then drops any document whose content sha256
was already admitted by an earlier batch (first-seen-wins, the
micro-batch analogue of the batch window-min). The reference has no
streaming surface at all (its toolkits are one-shot passes,
/root/reference/cogie/toolkit/tokenize/tokenize_toolkit.py) — this is
engine-native, built on the same manifest/state discipline as
streaming/incremental.py:

- state lives under one TableIO base: per-batch ``kept_<id>`` output
  dirs (the durable output log) and ``hashes_<id>`` dedup deltas, with
  a JSON manifest as the single commit point (fsio.write_text_atomic —
  Hadoop FS, object-store semantics documented there);
- commits are IDEMPOTENT under foreachBatch's at-least-once contract: a
  retried batch_id short-circuits to its committed kept rows instead of
  appending its delta twice;
- every ``compact_every`` batches the hash deltas fold into one base
  generation (crash between write and publish leaves the old manifest
  readable); kept dirs are never folded — they are the stream's output,
  retention is the consumer's policy.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cogie_spark.io import fsio
from cogie_spark.io.tableio import TableIO
from cogie_spark.plans.corpus import CorpusConfig, clean_corpus, kept_view

_MANIFEST = "corpus_manifest.json"
_HASH = "sha256"


def _read_manifest(state: TableIO) -> dict | None:
    txt = fsio.read_text(state.spark, state.path(_MANIFEST))
    return None if txt is None else json.loads(txt)


def _publish_manifest(state: TableIO, manifest: dict) -> None:
    # single commit point; atomicity contract documented on
    # fsio.write_text_atomic (rename on local/HDFS, last-writer-wins
    # single-writer on S3-like stores)
    fsio.write_text_atomic(
        state.spark, state.path(_MANIFEST), json.dumps(manifest, indent=1)
    )


def _hash_paths(manifest: dict) -> list[str]:
    names = []
    if manifest.get("base"):
        names.append(manifest["base"]["hashes"])
    names += [e["hashes"] for e in manifest["batches"] if e.get("hashes")]
    return names


def _compact_hashes(spark: SparkSession, state: TableIO, manifest: dict) -> dict:
    """Fold base + deltas into one new-generation hash table, publish,
    then best-effort delete the superseded dirs. src_batch provenance
    (min batch that admitted the hash) survives the fold."""
    gen = int(manifest.get("base", {}).get("gen", -1) if manifest.get("base") else -1) + 1
    folded = (
        spark.read.parquet(*[state.path(n) for n in _hash_paths(manifest)])
        .groupBy(_HASH)
        .agg(F.min("src_batch").alias("src_batch"))
    )
    base_name = f"hash_base_{gen}"
    state.write(base_name, folded)
    old_names = _hash_paths(manifest)
    new_manifest = {
        "batches": [
            {k: v for k, v in e.items() if k != "hashes"} for e in manifest["batches"]
        ],
        "base": {"hashes": base_name, "gen": gen},
        "compacted_through": max(e["batch_id"] for e in manifest["batches"]),
    }
    _publish_manifest(state, new_manifest)
    for n in old_names:  # superseded only after the publish succeeded
        fsio.delete(spark, state.path(n))
    return new_manifest


def incremental_clean_batch(
    batch: DataFrame,
    state: TableIO,
    cfg: CorpusConfig | None = None,
    batch_id: int = 0,
    compact_every: int = 8,
) -> DataFrame:
    """Clean one micro-batch and admit only first-seen content.

    Returns THIS batch's kept rows (post-gate, batch-local deduped,
    cross-batch deduped, redacted per cfg). Committed state: the kept
    rows under ``kept_<batch_id>`` and the admitted hashes under
    ``hashes_<batch_id>``, both recorded in the manifest atomically.
    """
    cfg = cfg or CorpusConfig()
    spark = batch.sparkSession
    manifest = _read_manifest(state) or {"batches": [], "base": None}

    # idempotent at-least-once: a retried batch_id returns its committed
    # kept rows; appending the delta again would double-admit content
    for entry in manifest["batches"]:
        if int(entry["batch_id"]) == batch_id:
            # same schema as the fresh-commit return below
            return state.read(entry["kept"]).drop(_HASH, "src_batch")

    kept = kept_view(clean_corpus(batch, cfg)["tagged"], cfg, hash_col=_HASH)

    hash_names = _hash_paths(manifest)
    if hash_names:
        seen = spark.read.parquet(*[state.path(n) for n in hash_names])
        # broadcast NOT forced: state grows unbounded; the planner picks
        # the strategy from measured sizes (AQE) — at 100 TB this is a
        # shuffled left-anti on the 64-hex key, the partition-count knob
        kept = kept.join(seen.select(_HASH), _HASH, "left_anti")

    kept_name = f"kept_{batch_id}"
    state.write(kept_name, kept.withColumn("src_batch", F.lit(batch_id)))
    committed = state.read(kept_name)
    state.write(
        f"hashes_{batch_id}",
        committed.select(_HASH, "src_batch").dropDuplicates([_HASH]),
    )
    manifest["batches"].append(
        {"batch_id": batch_id, "kept": kept_name, "hashes": f"hashes_{batch_id}"}
    )
    _publish_manifest(state, manifest)

    n_deltas = sum(1 for e in manifest["batches"] if e.get("hashes"))
    if compact_every and n_deltas >= compact_every:
        _compact_hashes(spark, state, manifest)
    return committed.drop(_HASH, "src_batch")


def start_corpus_stream(
    spark: SparkSession,
    input_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    schema: str = "doc_id long, text string",
    cfg: CorpusConfig | None = None,
    compact_every: int = 8,
):
    """File-source Structured Stream: every new parquet file under
    ``input_dir`` is a micro-batch of documents to clean and admit."""
    state = TableIO(spark, state_dir)

    def handle(batch: DataFrame, batch_id: int):
        incremental_clean_batch(
            batch, state, cfg=cfg, batch_id=batch_id, compact_every=compact_every
        )

    return (
        spark.readStream.schema(schema)
        .parquet(input_dir)
        .writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
