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
"""

from __future__ import annotations

import json
import os
import time
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


class TableIO:
    """Thin parquet table reader/writer rooted at a base directory."""

    def __init__(self, spark: SparkSession, base: str):
        self.spark = spark
        self.base = Path(base)
        self.base.mkdir(parents=True, exist_ok=True)

    def write(self, name: str, df: DataFrame, mode: str = "overwrite") -> str:
        path = str(self.base / name)
        df.write.mode(mode).parquet(path)
        return path

    def read(self, name: str) -> DataFrame:
        return self.spark.read.parquet(str(self.base / name))


class CheckpointManager:
    """Committed, resumable snapshots per pipeline stage."""

    def __init__(self, spark: SparkSession, base: str):
        self.spark = spark
        self.base = Path(base)
        self.base.mkdir(parents=True, exist_ok=True)

    # ------------------------------------------------------------- manifest
    def _manifest_path(self, stage: str) -> Path:
        return self.base / stage / "_manifest.json"

    def _read_manifest(self, stage: str) -> dict:
        p = self._manifest_path(stage)
        if not p.exists():
            return {"commits": []}
        return json.loads(p.read_text())

    def _publish(self, stage: str, manifest: dict) -> None:
        p = self._manifest_path(stage)
        tmp = p.with_suffix(".tmp")
        tmp.write_text(json.dumps(manifest, indent=1))
        os.replace(tmp, p)  # atomic on POSIX — the "commit"

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
        snap_dir = self.base / stage / f"snap_{iteration:05d}"
        df.write.mode("overwrite").parquet(str(snap_dir))
        rows = self.spark.read.parquet(str(snap_dir)).count()
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
        return self.spark.read.parquet(str(snap_dir))

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

    def _append_jsonl(self, fname: str, rec: dict) -> None:
        with open(self.base / fname, "a") as f:
            f.write(json.dumps(rec) + "\n")

    def metrics_df(self) -> DataFrame:
        return self.spark.read.json(str(self.base / "metrics.jsonl"))

    def lineage_df(self) -> DataFrame:
        return self.spark.read.json(str(self.base / "lineage.jsonl"))
