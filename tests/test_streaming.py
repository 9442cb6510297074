"""Incremental linkage: two consecutive micro-batches through the same
foreachBatch handler; later duplicates must join the clusters formed by
earlier batches."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from cogie_spark.fixtures.codefiles import code_files
from cogie_spark.io.tableio import TableIO
from cogie_spark.streaming.incremental import incremental_link_batch


def test_incremental_two_batches(spark):
    files = code_files(spark, n_groups=12, seed=42, with_truth=True).cache()
    # batch 1: member_idx 0 of every group; batch 2: the mutated copies
    b1 = files.filter("member_idx = 0").drop("group_id", "member_idx")
    b2 = files.filter("member_idx > 0").drop("group_id", "member_idx")
    truth = {
        r["file_id"]: r["group_id"]
        for r in files.select("file_id", "group_id").collect()
    }

    state = TableIO(spark, tempfile.mkdtemp(prefix="cogie_stream_"))
    a1 = incremental_link_batch(b1, state, batch_id=0)
    assert a1.count() == b1.count()

    # per-batch cost contract: signature_table must only ever see the
    # incoming batch (and its unassigned remainder), NEVER the
    # accumulated state — state rows carry persisted sigs
    import cogie_spark.streaming.incremental as inc_mod

    sig_input_sizes: list[int] = []
    orig_sig = inc_mod.signature_table

    def counting_sig(df, **kw):
        sig_input_sizes.append(df.count())
        return orig_sig(df, **kw)

    inc_mod.signature_table = counting_sig
    try:
        a2 = incremental_link_batch(b2, state, batch_id=1)
        assert a2.count() == b2.count()
    finally:
        inc_mod.signature_table = orig_sig
    n_b2 = b2.count()
    assert sig_input_sizes and all(n <= n_b2 for n in sig_input_sizes), (
        f"signature_table saw more rows than the batch: {sig_input_sizes} vs {n_b2}"
    )

    # every batch-2 row must land in the cluster of its group's base row
    members = spark.read.parquet(f"{state.base}/members_delta_*")
    got = {r["file_id"]: r["cluster_id"] for r in members.select("file_id", "cluster_id").collect()}
    assert len(got) == files.count()
    # group -> set of cluster ids among members; each group must be one cluster
    by_group: dict[int, set] = {}
    for fid, gid in truth.items():
        by_group.setdefault(gid, set()).add(got[fid])
    frag = {g: cs for g, cs in by_group.items() if len(cs) > 1}
    assert not frag, f"groups split across clusters: {frag}"


def test_state_bands_persisted_not_recomputed(spark):
    """VERDICT r2 #3: banding the accumulated state must come from the
    persisted band deltas — bands_from_signatures only ever sees the
    incoming batch's rows, never O(state) input."""
    import cogie_spark.streaming.incremental as inc_mod

    files = code_files(spark, n_groups=10, seed=42).cache()
    b1 = files.filter("member_idx = 0").drop("group_id", "member_idx")
    b2 = files.filter("member_idx > 0").drop("group_id", "member_idx")
    state = TableIO(spark, tempfile.mkdtemp(prefix="cogie_bands_"))
    incremental_link_batch(b1, state, batch_id=0)

    band_input_sizes: list[int] = []
    orig = inc_mod.bands_from_signatures

    def counting(df, **kw):
        band_input_sizes.append(df.count())
        return orig(df, **kw)

    inc_mod.bands_from_signatures = counting
    try:
        incremental_link_batch(b2, state, batch_id=1)
    finally:
        inc_mod.bands_from_signatures = orig
    n_b2 = b2.count()
    assert band_input_sizes and all(n <= n_b2 for n in band_input_sizes), (
        f"bands_from_signatures saw state-sized input: {band_input_sizes} vs batch {n_b2}"
    )
    # the band deltas exist on disk, one per batch, and cover all rows
    import json

    manifest = json.loads((state.base / "_state_manifest.json").read_text())
    assert len(manifest["batches"]) == 2
    bands = spark.read.parquet(*[str(state.base / b["bands"]) for b in manifest["batches"]])
    assert bands.count() == files.count() * 16  # 16 bands per file
    assert set(bands.columns) == {"file_id", "lang", "band_id", "band_hash"}


def test_legacy_state_migration(spark):
    """ADVICE r2 #5: deltas written by the pre-manifest format (no sig
    column, no band deltas) are backfilled once on first read instead of
    erroring; subsequent batches link against the migrated state."""
    import json

    from pyspark.sql import functions as F

    files = code_files(spark, n_groups=6, seed=42, with_truth=True).cache()
    b1 = files.filter("member_idx = 0").drop("group_id", "member_idx")
    b2 = files.filter("member_idx > 0").drop("group_id", "member_idx")

    state = TableIO(spark, tempfile.mkdtemp(prefix="cogie_legacy_"))
    # hand-write a LEGACY delta: members without sig, no manifest
    legacy = b1.select("file_id", F.col("file_id").alias("cluster_id"), "lang", "content")
    state.write("members_delta_00000", legacy)

    a2 = incremental_link_batch(b2, state, batch_id=1)
    assert a2.count() == b2.count()
    manifest = json.loads((state.base / "_state_manifest.json").read_text())
    names = [b["members"] for b in manifest["batches"]]
    assert names[0].endswith("m"), names  # migrated under a new name
    migrated = spark.read.parquet(str(state.base / names[0]))
    assert "sig" in migrated.columns and migrated.count() == b1.count()
    # batch-2 duplicates joined the legacy rows' clusters
    truth = {r["file_id"]: r["group_id"] for r in files.select("file_id", "group_id").collect()}
    legacy_cluster_by_group = {
        truth[r["file_id"]]: r["cluster_id"] for r in legacy.collect()
    }
    got = {r["file_id"]: r["cluster_id"] for r in a2.collect()}
    joined = sum(
        1 for fid, cid in got.items() if cid == legacy_cluster_by_group.get(truth[fid])
    )
    assert joined >= int(0.9 * b2.count()), (joined, b2.count())


def test_stream_wiring_availablenow(spark):
    """Real readStream -> foreachBatch -> state path over a file source."""
    import tempfile

    from cogie_spark.streaming.incremental import start_incremental_stream

    src = tempfile.mkdtemp(prefix="stream_src_")
    state_dir = tempfile.mkdtemp(prefix="stream_state_")
    ckpt = tempfile.mkdtemp(prefix="stream_ckpt_")
    files = code_files(spark, n_groups=8, seed=42)
    files.write.mode("overwrite").parquet(src)

    q = start_incremental_stream(spark, src, state_dir, ckpt)
    q.awaitTermination(300)
    members = spark.read.parquet(f"{state_dir}/members_delta_*")
    assert members.count() == files.count()
    assert set(members.columns) == {"file_id", "cluster_id", "lang", "content", "sig"}


def test_corrupt_state_raises_not_relinks(spark):
    """ADVICE r1: a genuine read error on existing state must propagate
    — only the missing-state case may start fresh."""
    import os
    import tempfile

    import pytest

    state_dir = tempfile.mkdtemp(prefix="cogie_corrupt_")
    delta = os.path.join(state_dir, "members_delta_00000")
    os.makedirs(delta)
    with open(os.path.join(delta, "part-00000.parquet"), "w") as f:
        f.write("this is not parquet")
    state = TableIO(spark, state_dir)
    batch = code_files(spark, n_groups=3, seed=42)
    with pytest.raises(Exception):
        incremental_link_batch(batch, state, batch_id=1).count()
