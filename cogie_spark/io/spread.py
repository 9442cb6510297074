"""Scale-adaptive scan spreading (optimization guide §2.5 input skew,
§6 input split size).

Parquet splits are byte ranges, but a task only produces rows for the
row groups whose midpoint falls inside its range — so a table written as
one file with one row group scans as ONE task no matter how many cores
the cluster has, and every narrow operator fused into that scan stage
(regex features, shingling, MinHash aggregation) runs serially. The
sandbox testdata ships 1-6 row groups per table; a real 100 TB table has
thousands, so this module's helpers are no-ops there by construction:
they only insert a round-robin repartition when the OBSERVED scan
parallelism is below the target, and the bytes moved in that case are
bounded by (target partitions) x (max split size) per core — small by
the same argument that makes the scan narrow in the first place.

Two policies:

- :func:`spread_scan` — spread to the full core count. For inputs that
  feed compute-heavy narrow pipelines (per-row regex/shingle/hash work
  dominates the byte cost; used by the dedup/corpus/vocab/ANN paths).
- :func:`spread_table` — spread proportionally to on-disk bytes
  (one partition per ~4 MB, capped at cores). For relational scans
  whose per-row compute is cheap: tiny dim tables stay single-partition
  (no extra exchange in front of a broadcast build), fact tables get
  their scan+shuffle-write stage parallelized.

Both probe ``df.rdd.getNumPartitions()``, which is metadata-only (file
listing + physical planning, no job) for the narrow scan-rooted plans
these helpers are applied to. ``spread_scan`` refuses plans containing
wide operators (joins/aggregations/windows), where the probe could
trigger adaptive execution of upstream stages.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame

# operators whose presence makes a .rdd partition probe potentially
# execute upstream query stages under AQE (and where a post-shuffle
# frame is already sized by spark.sql.shuffle.partitions anyway)
_WIDE_NODE = re.compile(
    r"(?m)^[\s:+|-]*(?:'?)(Join|Aggregate|Window|Sort|Deduplicate|"
    r"Repartition|RepartitionByExpression|Rebalance|GlobalLimit|Intersect|Except)\b"
)


def _narrow_plan(df: DataFrame) -> bool:
    try:
        plan = df._jdf.queryExecution().analyzed().toString()
    except Exception:
        return False
    return _WIDE_NODE.search(plan) is None


def _scan_partitions(df: DataFrame) -> int | None:
    try:
        return df.rdd.getNumPartitions()
    except Exception:
        return None


def spread_scan(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Repartition a narrow scan-rooted frame up to ``min_parts``
    (default: defaultParallelism) when its scan parallelism is below
    that. No-op for already-wide scans (real-scale inputs) and for
    plans with wide operators (probe not safe there)."""
    target = min_parts or df.sparkSession.sparkContext.defaultParallelism
    if target <= 1 or not _narrow_plan(df):
        return df
    n = _scan_partitions(df)
    if n is None or n >= target:
        return df
    return df.repartition(target)


# one scan partition per this many on-disk bytes for cheap relational
# compute; ~4 MB compressed parquet ≈ 12-16 MB of in-memory rows
_BYTES_PER_PART = 4 << 20


def _path_bytes(path: str) -> int:
    try:
        if os.path.isdir(path):
            return sum(
                os.path.getsize(os.path.join(path, f))
                for f in os.listdir(path)
                if not f.startswith((".", "_"))
            )
        return os.path.getsize(path)
    except OSError:
        return 0


def spread_table(df: DataFrame, path: str) -> DataFrame:
    """Byte-proportional spread for a relational table scan at ``path``
    (local/posix paths only — object-store paths return 0 bytes and
    no-op, which is correct: those deployments write real multi-row-
    group files)."""
    cores = df.sparkSession.sparkContext.defaultParallelism
    target = min(cores, _path_bytes(path) // _BYTES_PER_PART)
    # a 2-3 way spread does not pay for its exchange — only rescue
    # scans that leave most of the machine idle
    if target < 4:
        return df
    n = _scan_partitions(df)
    if n is None or n >= target:
        return df
    return df.repartition(target)
