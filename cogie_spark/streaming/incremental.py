"""Incremental linkage: new file rows link against the existing
canonical clusters via Structured Streaming foreachBatch.

The reference's serving loop is stateless request/response with
singleton model caches (/root/reference/cogie/interface/interface.py:
24-129; cogie/toolkit/el/el_toolkit.py:75-82) — one record at a time
through the same pipeline. The Spark restatement is micro-batching:
each foreachBatch invocation is a bounded DataFrame that runs the SAME
batch operators (blocking -> scoring -> assignment) against the
persisted cluster state, then appends to it. No separate streaming
implementation of the operators exists — that is the point.

State layout (under ``state_dir``, via TableIO):
- ``members``  : (file_id, cluster_id, lang, content, sig) — all linked
  rows WITH their MinHash signatures: each micro-batch signatures only
  its own rows and banding of the existing state reuses the persisted
  sig column, so per-batch cost is O(batch + matched), not O(state).
State updates are atomic per batch (write-new + manifest publish is
handled by the plain parquet overwrite of a per-batch delta dir plus
union-on-read).
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cogie_spark.io.tableio import TableIO
from cogie_spark.operators.blocking import bands_from_signatures, signature_table
from cogie_spark.operators.scoring import score_pairs


def incremental_link_batch(
    batch: DataFrame,
    state: TableIO,
    threshold: float = 0.72,
    num_perm: int = 64,
    bands: int = 16,
    batch_id: int = 0,
) -> DataFrame:
    """Link one micro-batch against current state; returns assignments.

    New rows joining an existing cluster inherit its cluster_id; rows
    matching only each other form a new cluster keyed by their min
    file_id; everything else becomes a singleton. Transitivity ACROSS
    batches is by design cluster-mediated (a new row links to a cluster,
    not to individual members) — the same canonical-entity semantics as
    the reference's alignment to a fixed KB entity
    (/root/reference/cogie/toolkit/el/el_toolkit.py:131-143).
    """
    spark = batch.sparkSession
    # state is append-only per-batch delta dirs — no rewrite of data we
    # are concurrently reading, and O(batch) write cost regardless of
    # accumulated state size. The no-state case is detected EXPLICITLY
    # by listing delta dirs (local-FS glob here; a FileSystem listing on
    # a real cluster): a genuine read error on existing state must
    # propagate, not silently relink from scratch.
    have_state = bool(glob.glob(os.path.join(state.base, "members_delta_*")))

    batch = batch.persist()
    new_sigs = signature_table(batch, key_cols=("lang",), num_perm=num_perm, mode="fast").persist()

    if have_state:
        members = spark.read.parquet(f"{state.base}/members_delta_*")
        # block new rows against existing members (one band join), plus
        # within-batch self-join for brand-new duplicate groups.
        # Signatures of existing members come from the persisted sig
        # column — never recomputed from content (O(state) per batch).
        old = members.persist()
        old_sigs = old.select("file_id", "lang", "sig")
        nb = bands_from_signatures(new_sigs, key_cols=("lang",), bands=bands, rows_per_band=num_perm // bands)
        ob = bands_from_signatures(old_sigs, key_cols=("lang",), bands=bands, rows_per_band=num_perm // bands)
        cand = (
            nb.alias("n")
            .join(
                ob.alias("o"),
                (F.col("n.lang") == F.col("o.lang"))
                & (F.col("n.band_id") == F.col("o.band_id"))
                & (F.col("n.band_hash") == F.col("o.band_hash")),
            )
            .select(
                F.col("n.file_id").alias("left_id"), F.col("o.file_id").alias("right_id")
            )
            .distinct()
        )
        # feature join bounded to rows that actually appear in a
        # candidate pair: the state is only SCANNED (columnar read),
        # never shuffled wholesale — per-batch shuffle cost stays
        # O(batch + matched)
        cand_ids = (
            cand.select(F.col("left_id").alias("file_id"))
            .unionByName(cand.select(F.col("right_id").alias("file_id")))
            .distinct()
        )
        both = (
            batch.select("file_id", "lang", "content")
            .unionByName(old.select("file_id", "lang", "content"))
            .join(cand_ids, "file_id", "left_semi")
        )
        scored = score_pairs(cand, both)
        links = (
            scored.filter(F.col("score") >= threshold)
            .join(old.select(F.col("file_id").alias("right_id"), "cluster_id"), "right_id")
            .groupBy(F.col("left_id").alias("file_id"))
            .agg(F.min("cluster_id").alias("cluster_id"))
        )
    else:
        links = spark.createDataFrame([], "file_id string, cluster_id string")

    # within-batch clustering of the still-unassigned rows
    unassigned = batch.join(links, "file_id", "left_anti")
    from cogie_spark.plans.linkage import LinkageConfig, run_linkage

    intra = run_linkage(
        unassigned, LinkageConfig(threshold=threshold, num_perm=num_perm, bands=bands)
    )["clusters"]

    assignments = links.unionByName(intra)
    out = batch.select("file_id", "lang", "content").join(assignments, "file_id")

    # persist this batch's signatures alongside the rows: future batches
    # band the state without touching content
    new_members = out.select("file_id", "cluster_id", "lang", "content").join(
        new_sigs.select("file_id", "sig"), "file_id"
    )
    state.write(f"members_delta_{batch_id:05d}", new_members)
    return assignments


def start_incremental_stream(
    spark: SparkSession,
    input_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    schema: str = "repo string, path string, commit string, lang string, content string, sha256 string, file_id string",
    threshold: float = 0.72,
):
    """File-source Structured Stream: every new parquet file under
    ``input_dir`` is a micro-batch of code_files rows to link."""
    state = TableIO(spark, state_dir)

    def handle(batch: DataFrame, batch_id: int):
        incremental_link_batch(batch, state, threshold=threshold, batch_id=batch_id)

    return (
        spark.readStream.schema(schema)
        .parquet(input_dir)
        .writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
