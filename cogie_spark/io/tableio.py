"""Parquet + manifest snapshot protocol — Iceberg commit semantics
without requiring an Iceberg runtime in the sandbox (SURVEY.md §7.3).

Every ``commit`` writes the DataFrame to a fresh snapshot directory and
then atomically publishes a manifest JSON (write-temp + rename). Readers
only ever see fully-written snapshots; a job killed mid-write leaves no
visible partial state. ``latest`` returns the newest committed snapshot,
which is exactly the resume contract of the reference trainer's
checkpoint/skip-to-global-step logic
(/root/reference/cogie/core/trainer.py:195-213,286-302).

A real Iceberg catalog slots in behind the same interface (commit ->
table snapshot, latest -> current snapshot) — the pipeline code never
touches paths directly.

Also maintains the north rule's per-stage observability tables:
- ``metrics``  : append-only (stage, iteration, key, value, ts)
- ``lineage``  : per-commit (stage, iteration, rows, input_fingerprint)
- ``lineage_partitions`` : per-PARTITION lineage of every committed
  snapshot (stage, iteration, file, rows, fingerprint) — one row per
  parquet file, with an order-insensitive ``bit_xor(xxhash64(*cols))``
  content fingerprint. The per-file xor composes: xor-ing all file
  fingerprints of a snapshot yields a whole-table fingerprint that is
  invariant to how rows were assigned to partitions, so two commits of
  the same logical table compare equal even across different
  partitionings. Per-file ROW COUNTS ride the parquet rowgroup fast
  path (count(1) reads no column data); content FINGERPRINTS add one
  read of the freshly-written snapshot (page-cache-hot right after the
  write) and can be disabled per manager
  (``partition_fingerprints=False``) when commit latency matters more
  than content verifiability — measured +57% per commit at 2M rows x 3
  cols on a degraded-band host (3.86 vs 2.46 s), less in a healthy band
  where the write itself dominates.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from cogie_spark.io import fsio


def _init_base(spark: SparkSession, base: str):
    """Scheme-aware base handling: a URI base (``hdfs://``, ``s3a://``)
    stays a STRING (pathlib corrupts the scheme's double slash) and is
    created through the Hadoop FS API; a plain local path keeps the
    pathlib ergonomics tests and local tools rely on."""
    base_str = str(base).rstrip("/")
    if "://" in base_str:
        # includes file:// — running the local FS through the Hadoop
        # route lets tests exercise the exact object-store code path
        fsio.mkdirs(spark, base_str)
        return base_str, base_str
    p = Path(base_str)
    p.mkdir(parents=True, exist_ok=True)
    return p, str(p)


class TableIO:
    """Thin parquet table reader/writer rooted at a base directory or
    Hadoop-compatible URI (``hdfs://``, ``s3a://``, ...)."""

    def __init__(self, spark: SparkSession, base: str):
        self.spark = spark
        self.base, self._base_str = _init_base(spark, base)

    def path(self, *names: str) -> str:
        """URI-safe absolute path of a child entry."""
        return fsio.join(self._base_str, *names)

    def write(self, name: str, df: DataFrame, mode: str = "overwrite") -> str:
        path = self.path(name)
        df.write.mode(mode).parquet(path)
        return path

    def read(self, name: str) -> DataFrame:
        return self.spark.read.parquet(self.path(name))

    def write_bucketed(
        self,
        name: str,
        df: DataFrame,
        buckets: int,
        bucket_cols: tuple[str, ...],
        sort_cols: tuple[str, ...] = (),
        mode: str = "overwrite",
    ) -> str:
        """Materialize ``df`` as a SORTED, BUCKETED parquet table — the
        north rule's "(lang, repo-prefix) composite keys materialized as
        sorted bucketed partitions" layout. Joins and aggregations on a
        prefix of ``bucket_cols`` between tables bucketed the same way
        need NO exchange: Catalyst recognizes the bucket spec as the
        required hash partitioning, so the big-side shuffle — the
        dominant cost of re-linking a 10^12-file catalogue against a
        daily delta — disappears (plan-asserted in tests).

        Spark's bucket metadata lives in the session catalog, so the
        table is written via ``saveAsTable`` with an explicit path under
        this TableIO's base and must be read back with
        :meth:`read_bucketed` (reading the bare parquet path works but
        loses the bucket spec). On a production deployment the same
        declaration is Iceberg's ``bucket(N, col)`` partition transform;
        this is the sandbox-runnable equivalent, swap at the catalog.
        """
        table = f"cogie_{name}"
        self.spark.sql(f"DROP TABLE IF EXISTS {table}")
        w = (
            df.write.format("parquet")
            .mode(mode)
            .bucketBy(buckets, *bucket_cols)
            .option("path", self.path(name))
        )
        if sort_cols:
            w = w.sortBy(*sort_cols)
        w.saveAsTable(table)
        return table

    def read_bucketed(self, name: str) -> DataFrame:
        """Read a :meth:`write_bucketed` table WITH its bucket spec."""
        return self.spark.table(f"cogie_{name}")


class CheckpointManager:
    """Committed, resumable snapshots per pipeline stage."""

    def __init__(
        self, spark: SparkSession, base: str, partition_fingerprints: bool = True
    ):
        self.spark = spark
        self.base, self._base_str = _init_base(spark, base)
        self.partition_fingerprints = partition_fingerprints

    def path(self, *names: str) -> str:
        return fsio.join(self._base_str, *names)

    # ------------------------------------------------------------- manifest
    def _manifest_path(self, stage: str) -> str:
        return self.path(stage, "_manifest.json")

    def _read_manifest(self, stage: str) -> dict:
        txt = fsio.read_text(self.spark, self._manifest_path(stage))
        if txt is None:
            return {"commits": []}
        return json.loads(txt)

    def _publish(self, stage: str, manifest: dict) -> None:
        # write-temp + rename through the Hadoop FS API — see
        # fsio.write_text_atomic for the per-FS atomicity contract
        fsio.write_text_atomic(
            self.spark, self._manifest_path(stage), json.dumps(manifest, indent=1)
        )

    # --------------------------------------------------------------- commits
    def commit(
        self,
        stage: str,
        df: DataFrame,
        iteration: int = 0,
        input_fingerprint: str | None = None,
    ) -> DataFrame:
        """Write a snapshot, publish it, return the re-read DataFrame.

        Returning the re-read frame truncates lineage (the parquet scan
        replaces the upstream plan) — required for iterative algorithms.
        """
        snap_dir = self.path(stage, f"snap_{iteration:05d}")
        df.write.mode("overwrite").parquet(snap_dir)
        part_stats = self._partition_stats(self.spark.read.parquet(snap_dir))
        rows = sum(r["rows"] for r in part_stats)
        manifest = self._read_manifest(stage)
        manifest["commits"].append(
            {
                "iteration": iteration,
                "path": str(snap_dir),
                "rows": rows,
                "input_fingerprint": input_fingerprint,
                "ts": time.time(),
            }
        )
        self._publish(stage, manifest)
        self._append_lineage(stage, iteration, rows, input_fingerprint)
        self._append_partition_lineage(stage, iteration, part_stats)
        return self.spark.read.parquet(str(snap_dir))

    def _partition_stats(self, snap: DataFrame) -> list:
        """Per-file (rows, fingerprint) of a written snapshot in ONE
        distributed agg — one output row per parquet file, so the
        driver-side list is bounded by the snapshot's partition count
        (which the engine controls), never its row count. The
        fingerprint is ``bit_xor(xxhash64(*cols))`` — order-insensitive
        within a file, and xor-composable across files into a
        partitioning-invariant whole-table fingerprint. Map-typed
        columns are excluded (Spark cannot hash maps); with
        ``partition_fingerprints=False`` the fingerprint is NULL and
        the agg degrades to the rowgroup-metadata count path."""
        from pyspark.sql import functions as F

        hashable = [c for c, t in snap.dtypes if not t.startswith("map<")]
        if self.partition_fingerprints and hashable:
            fp = F.bit_xor(F.xxhash64(*[F.col(c) for c in hashable]))
        else:
            fp = F.first(F.lit(None).cast("long"))
        return (
            snap.groupBy(F.input_file_name().alias("file"))
            .agg(F.count(F.lit(1)).alias("rows"), fp.alias("fingerprint"))
            .collect()
        )

    def expire(self, stage: str, keep_last: int = 1) -> list[int]:
        """Snapshot retention: drop all but the newest ``keep_last``
        commits of a stage — prune the manifest FIRST (publish is the
        commit point; a crash after it leaves unreferenced dirs that a
        re-run of expire removes), then delete the superseded snapshot
        dirs through the Hadoop FS API. Iterative stages (CC commits one
        snapshot per round) otherwise accumulate O(iterations) copies of
        the edge set — at 10^12-file scale that is the storage bill.
        The lineage/metrics logs are history, not state: never pruned.
        Returns the expired iteration numbers. Snapshots still
        referenced by the manifest are never touched, so ``latest`` and
        ``verify_commit`` keep working on everything retained.
        """
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        manifest = self._read_manifest(stage)
        commits = manifest["commits"]
        if len(commits) <= keep_last:
            return []
        drop, keep = commits[:-keep_last], commits[-keep_last:]
        self._publish(stage, {**manifest, "commits": keep})
        kept_paths = {c["path"] for c in keep}
        expired = []
        for c in drop:
            # a re-commit at the same iteration reuses the dir; never
            # delete a path a retained commit still references
            if c["path"] not in kept_paths:
                fsio.delete(self.spark, c["path"], recursive=True)
            expired.append(int(c["iteration"]))
        return expired

    def latest(self, stage: str) -> tuple[DataFrame, int] | None:
        manifest = self._read_manifest(stage)
        if not manifest["commits"]:
            return None
        last = manifest["commits"][-1]
        return self.spark.read.parquet(last["path"]), int(last["iteration"])

    # --------------------------------------------------------------- metrics
    def log_metric(self, stage: str, iteration: int, key: str, value: float) -> None:
        """Append to the metrics table (north rule: per-stage metrics).

        Stand-in for the reference's TensorBoard scalar stream
        (/root/reference/cogie/core/trainer.py:171-173).
        """
        self._append_jsonl(
            "metrics.jsonl",
            {"stage": stage, "iteration": iteration, "key": key, "value": value, "ts": time.time()},
        )

    def _append_lineage(self, stage, iteration, rows, input_fingerprint) -> None:
        self._append_jsonl(
            "lineage.jsonl",
            {
                "stage": stage,
                "iteration": iteration,
                "rows": rows,
                "input_fingerprint": input_fingerprint,
                "ts": time.time(),
            },
        )

    def _append_partition_lineage(self, stage, iteration, part_stats) -> None:
        """North rule: per-PARTITION lineage. One parquet file appended
        per commit (a single driver-built frame of one row per snapshot
        file — no jsonl fan-out of O(files) tiny objects on object
        stores). Only the basename of each snapshot file is stored so
        the table stays valid if the checkpoint base is relocated."""
        ts = time.time()
        rows = [
            (
                str(stage),
                int(iteration),
                str(r["file"]).rsplit("/", 1)[-1],
                int(r["rows"]),
                None if r["fingerprint"] is None else int(r["fingerprint"]),
                ts,
            )
            for r in part_stats
        ]
        sdf = self.spark.createDataFrame(
            rows,
            "stage string, iteration int, file string, rows long, "
            "fingerprint long, ts double",
        )
        sdf.coalesce(1).write.mode("append").parquet(self.path("lineage_partitions"))

    def partition_lineage_df(self) -> DataFrame:
        return self.spark.read.parquet(self.path("lineage_partitions"))

    def verify_commit(self, stage: str, iteration: int | None = None) -> dict:
        """Resume-time content verification against the per-partition
        lineage table (the consumer the table was built for): re-read a
        committed snapshot, recompute each file's (rows, fingerprint)
        with the same ONE-agg plan ``commit`` used, and compare
        file-by-file against what was recorded at commit time.

        Returns ``{"ok": bool, "files": n, "mismatched": [basename, ...],
        "missing": [...], "unexpected": [...]}``. A bit-rotted, truncated,
        or partially-overwritten snapshot surfaces as a named file list
        instead of a silently-wrong resume. Cost is one page-cache-class
        scan of the snapshot — the same price ``commit`` paid — so it is
        an opt-in resume guard, not an always-on tax. With
        ``partition_fingerprints=False`` at commit time the recorded
        fingerprints are NULL and only row counts are compared.
        """
        from pyspark.sql import functions as F

        manifest = self._read_manifest(stage)
        if not manifest["commits"]:
            raise ValueError(f"no commits for stage {stage!r}")
        commits = manifest["commits"]
        if iteration is None:
            last = commits[-1]
        else:
            matches = [c for c in commits if int(c["iteration"]) == iteration]
            if not matches:
                raise ValueError(f"stage {stage!r} has no commit at iteration {iteration}")
            last = matches[-1]
        it = int(last["iteration"])
        live = {
            str(r["file"]).rsplit("/", 1)[-1]: (int(r["rows"]), r["fingerprint"])
            for r in self._partition_stats(self.spark.read.parquet(last["path"]))
        }
        recorded = {
            r["file"]: (int(r["rows"]), r["fingerprint"])
            for r in self.partition_lineage_df()
            .where((F.col("stage") == stage) & (F.col("iteration") == it))
            .collect()
        }
        mismatched = sorted(
            f
            for f in live.keys() & recorded.keys()
            if live[f][0] != recorded[f][0]
            or (
                recorded[f][1] is not None
                and live[f][1] is not None
                and int(live[f][1]) != int(recorded[f][1])
            )
        )
        missing = sorted(recorded.keys() - live.keys())
        unexpected = sorted(live.keys() - recorded.keys())
        return {
            "ok": not (mismatched or missing or unexpected),
            "stage": stage,
            "iteration": it,
            "files": len(recorded),
            "mismatched": mismatched,
            "missing": missing,
            "unexpected": unexpected,
        }

    def _append_jsonl(self, fname: str, rec: dict) -> None:
        # metrics/lineage are append-only logs. POSIX append is the fast
        # local path; object stores have no append, so URI bases write
        # one small immutable object per record under a log dir — both
        # shapes read back with the same spark.read.json glob.
        if isinstance(self.base, Path):
            with open(self.base / fname, "a") as f:
                f.write(json.dumps(rec) + "\n")
        else:
            rec_name = f"{fname}.d/rec_{time.time_ns():020d}.json"
            fsio.write_text_atomic(self.spark, self.path(rec_name), json.dumps(rec))

    def _log_df(self, fname: str) -> DataFrame:
        if isinstance(self.base, Path):
            return self.spark.read.json(self.path(fname))
        return self.spark.read.json(self.path(f"{fname}.d"))

    def metrics_df(self) -> DataFrame:
        return self._log_df("metrics.jsonl")

    def lineage_df(self) -> DataFrame:
        return self._log_df("lineage.jsonl")
