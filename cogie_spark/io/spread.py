"""Scale-adaptive scan spreading (optimization guide §2.5 input skew,
§6 input split size).

Parquet splits are byte ranges, but a task only produces rows for the
row groups whose midpoint falls inside its range — so a table written
as one file with one row group scans as ONE task no matter how many
cores the cluster has, and every narrow operator fused into that scan
stage runs serially. The sandbox testdata ships 1-6 row groups per
table; a real 100 TB table has thousands, so :func:`spread_scan` is a
no-op there by construction: it only inserts a round-robin repartition
when the OBSERVED scan parallelism is below the core count.

Scope discipline (A/B-measured in round 6): the spread pays ONLY where
heavy per-row compute — regex feature extraction, shingling, MinHash
aggregation, cosine scoring — is fused into the narrow scan stage, so
that 30+ idle cores are worth one small shuffle. It LOSES on relational
scans: shuffle joins re-partition both sides anyway, and cheap
aggregation/broadcast-probe work costs less on the narrow scan than an
extra full shuffle of the table. Callers therefore opt in explicitly
at compute-heavy sites (the dedup family's documents input, the corpus
tag plan, vocabulary building, ANN scoring); the relational query
paths read plain.

The partition probe ``df.rdd.getNumPartitions()`` is metadata-only
(file listing + physical planning, no job) for the narrow scan-rooted
plans this helper is applied to; plans containing wide operators
(joins/aggregations/windows) are refused, where the probe could
trigger adaptive execution of upstream stages.
"""

from __future__ import annotations

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


def _plan_size_bytes(df: DataFrame) -> int | None:
    """Catalyst's sizeInBytes estimate for the frame (sum of file sizes
    for scan-rooted plans) — cheap, no job."""
    try:
        return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:
        return None


# below this estimated input size the spread exchange + extra stage
# scheduling cost exceeds what parallelizing the fused compute saves —
# the round-6 interleaved A/B measured q32 ~0.5 s SLOWER with a spread
# over its 0.6 MB sf0.1 input and 2-8 s FASTER over 5.9 MB at sf1.0
_MIN_SPREAD_BYTES = 2 << 20


def spread_scan(
    df: DataFrame, min_parts: int | None = None, min_bytes: int = _MIN_SPREAD_BYTES
) -> DataFrame:
    """Repartition a narrow scan-rooted frame up to ``min_parts``
    (default: defaultParallelism) when its scan parallelism is below
    that AND its estimated size is at least ``min_bytes`` (too-small
    inputs cannot amortize the exchange). No-op for already-wide scans
    (real-scale inputs) and for plans with wide operators (probe not
    safe there)."""
    target = min_parts or df.sparkSession.sparkContext.defaultParallelism
    if target <= 1 or not _narrow_plan(df):
        return df
    size = _plan_size_bytes(df)
    if size is not None and size < min_bytes:
        return df
    n = _scan_partitions(df)
    if n is None or n >= target:
        return df
    return df.repartition(target)
