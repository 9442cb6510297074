"""M1 end-to-end: the flagship linkage pipeline reaches pairwise F1 >= 0.99
on the deterministic fixture at the shared blocking key (BASELINE.json),
and connected components is exact on hand-built graphs."""

from __future__ import annotations

from pyspark.sql import functions as F

from cogie_spark.fixtures.codefiles import code_files, labeled_pairs
from cogie_spark.operators.cc import connected_components
from cogie_spark.operators.metrics import bcubed, blocking_quality, pairwise_prf
from cogie_spark.plans.linkage import (
    LinkageConfig,
    predicted_pairs_from_clusters,
    run_linkage,
)


def test_connected_components_exact(spark):
    edges = spark.createDataFrame(
        [
            ("b", "a"), ("c", "b"),          # component {a,b,c} -> a
            ("e", "d"),                       # component {d,e}   -> d
            ("x", "y"), ("y", "z"), ("x", "z"),  # {x,y,z} -> x
        ],
        ["left_id", "right_id"],
    )
    got = {r["file_id"]: r["cluster_id"] for r in connected_components(edges).collect()}
    assert got == {"a": "a", "b": "a", "c": "a", "d": "d", "e": "d", "x": "x", "y": "x", "z": "x"}


def test_cc_long_chain(spark):
    # a path graph of 40 nodes — worst case for label propagation,
    # log-round for large/small-star
    ids = [f"n{i:03d}" for i in range(40)]
    edges = spark.createDataFrame(
        [(ids[i], ids[i + 1]) for i in range(39)], ["left_id", "right_id"]
    )
    got = connected_components(edges).collect()
    assert len(got) == 40
    assert {r["cluster_id"] for r in got} == {"n000"}


def test_flagship_f1(spark):
    files = code_files(spark, n_groups=80, seed=42, with_truth=True)
    lp = labeled_pairs(files).cache()
    engine_input = files.drop("group_id", "member_idx")
    out = run_linkage(engine_input, LinkageConfig())
    pred = predicted_pairs_from_clusters(out["clusters"])
    m = pairwise_prf(pred, lp)
    assert m["f1"] >= 0.99, m
    # every input file got a cluster
    assert out["clusters"].count() == engine_input.count()
    # per-record view of the same run: B-cubed weights every member
    # equally (pairwise F1 weights big clusters quadratically), so a
    # high score on BOTH rules out the quadratic metric masking
    # mis-clustered singletons
    truth = files.select("file_id", F.col("group_id").alias("entity_id"))
    b3 = bcubed(out["clusters"], truth).collect()[0]
    assert b3["bcubed_f1"] >= 0.99, dict(b3.asDict())
    # blocking stage, evaluated in REPRESENTATIVE space: exact prededup
    # resolves byte-identical true pairs before blocking (they map to
    # the same rep), so pair completeness is over rep-distinct true
    # pairs vs the candidate table
    f2r = out["file2rep"]
    lp_rep = (
        lp.filter("is_match")
        .join(f2r.toDF("left_id", "_rl"), "left_id")
        .join(f2r.toDF("right_id", "_rr"), "right_id")
        .filter("_rl != _rr")
        .select(
            F.least("_rl", "_rr").alias("left_id"),
            F.greatest("_rl", "_rr").alias("right_id"),
            F.lit(True).alias("is_match"),
        )
        .distinct()
    )
    n_reps = f2r.select("_rep_id").distinct().count()
    bq = blocking_quality(out["pairs"], lp_rep, n_records=n_reps).collect()[0]
    assert bq["pair_completeness"] >= 0.99, dict(bq.asDict())
    assert bq["reduction_ratio"] >= 0.9, dict(bq.asDict())


def test_blocking_recall(spark):
    """All true pairs must survive blocking (recall gate before scoring)."""
    from cogie_spark.operators.blocking import candidate_pairs, with_blocks

    files = code_files(spark, n_groups=60, seed=42, with_truth=True)
    lp = labeled_pairs(files).filter("is_match").select("left_id", "right_id")
    blocks = with_blocks(files.drop("group_id", "member_idx"))
    pairs, _ = candidate_pairs(blocks)
    missed = lp.join(pairs, ["left_id", "right_id"], "left_anti").count()
    total = lp.count()
    assert missed <= max(1, int(0.002 * total)), f"blocking missed {missed}/{total}"


def test_exact_prededup_clusters_identical_content(spark):
    """Byte-identical files must cluster even when LSH blocks are capped
    (they collapse to one representative before blocking)."""
    from pyspark.sql import functions as F

    files = code_files(spark, n_groups=20, seed=42).limit(30).withColumn(
        "content", F.lit("int main() { return 0; }")
    )
    files = files.withColumn("sha256", F.sha2("content", 256)).withColumn(
        "file_id", F.sha2(F.concat_ws("", "repo", "path", "commit"), 256)
    )
    out = run_linkage(files, LinkageConfig(max_block_size=4))
    n_clusters = out["clusters"].select("cluster_id").distinct().count()
    assert n_clusters == 1
    assert out["clusters"].count() == 30


def test_salted_hot_blocks(spark):
    """A hot block (size >> cap) must be salted, not dropped: join tasks
    stay bounded, and band multiplicity recovers most pairs."""
    from pyspark.sql import functions as F

    from cogie_spark.operators.blocking import candidate_pairs

    # synth block table: 200 ids sharing every one of 16 bands
    ids = spark.range(200).select(F.format_string("f%04d", "id").alias("file_id"))
    bands = spark.range(16).select(F.col("id").cast("int").alias("band_id"))
    blocks = ids.crossJoin(bands).select(
        "file_id", F.lit("python").alias("lang"), "band_id",
        F.concat(F.lit("hot"), F.col("band_id").cast("string")).alias("band_hash"),
    )
    pairs, dropped = candidate_pairs(blocks, max_block_size=32, salvage_factor=32)
    n = pairs.count()
    full = 200 * 199 // 2
    assert dropped.count() == 0
    # band-multiplicity recovery: expect >= 90% of pairs, but never more
    assert 0.9 * full <= n <= full, (n, full)

    # beyond the salvage tier -> dropped and reported
    pairs2, dropped2 = candidate_pairs(blocks, max_block_size=2, salvage_factor=4)
    assert dropped2.count() == 16
    assert pairs2.count() == 0


def test_cascade_sig_bits_clusters_identical(spark):
    """The 8-bit cascade signature (pair-table bytes / 8) must yield
    byte-identical clusters to the full 64-bit form: the tinyint cast
    preserves equality so est_8bit >= est_exact per pair — the cascade
    floor keeps a superset, and the exact scorers decide the edges."""
    files = code_files(spark, n_groups=40, seed=7)
    got = {}
    for bits in (8, 64):
        out = run_linkage(files, LinkageConfig(cascade_sig_bits=bits))
        got[bits] = {
            (r["file_id"], r["cluster_id"]) for r in out["clusters"].collect()
        }
        for df in out["_persisted"] + out.get("_checkpoints", []):
            df.unpersist()
    assert got[8] == got[64]
