"""Fixture invariants: determinism, sha256 per-row equality (BASELINE.json
input_hint), shape of labeled pairs."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from cogie_spark.fixtures.codefiles import code_files, labeled_pairs


def test_schema_and_sha256_invariant(spark):
    df = code_files(spark, n_groups=30, seed=42)
    assert set(df.columns) == {"repo", "path", "commit", "lang", "content", "sha256", "file_id"}
    # per-row invariant: stored sha256 == sha256(content), checked IN SPARK
    bad = df.filter(F.sha2("content", 256) != F.col("sha256")).count()
    assert bad == 0
    # and once more driver-side against hashlib (independent implementation)
    rows = df.limit(20).collect()
    assert rows
    for r in rows:
        assert hashlib.sha256(r["content"].encode()).hexdigest() == r["sha256"]


def test_determinism_across_partitionings(spark):
    a = code_files(spark, n_groups=25, seed=42).orderBy("file_id").collect()
    b = code_files(spark, n_groups=25, seed=42).repartition(13).orderBy("file_id").collect()
    assert a == b


def test_labeled_pairs_margins(spark):
    files = code_files(spark, n_groups=40, seed=42, with_truth=True)
    lp = labeled_pairs(files)
    counts = dict(lp.groupBy("is_match").count().collect())
    assert counts.get(True, 0) > 0 and counts.get(False, 0) > 0
    # no pair is both (dedup holds)
    assert lp.groupBy("left_id", "right_id").count().filter("count > 1").count() == 0
