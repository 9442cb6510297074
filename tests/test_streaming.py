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
