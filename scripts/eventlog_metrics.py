"""Sum engine-relevant byte/CPU totals from a Spark event log.

The scaling sections of BASELINE.md argue from the quantity the engine
actually controls at cluster scale — bytes scanned / shuffled / CPU
burned per pair — rather than from wall time, which this host's shared
DRAM band perturbs. Round 4 computed those totals by hand; this script
makes the reading reproducible:

    COGIE_EVENT_LOG=/tmp/elog python bench.py            # any run
    python scripts/eventlog_metrics.py /tmp/elog         # -> one JSON line

Sums SparkListenerTaskEnd task metrics over the whole application (all
attempts, including failed/speculative tasks — what the cluster PAID,
not what the query logically needed):

    input_bytes          : Input Metrics / Bytes Read (scan volume)
    shuffle_write_bytes  : Shuffle Write Metrics / Shuffle Bytes Written
    shuffle_read_bytes   : Shuffle Read Metrics / Local + Remote Bytes Read
    executor_cpu_sec     : Executor CPU Time (ns -> s)
    executor_run_sec     : Executor Run Time (ms -> s)
    peak_memory_bytes    : max over tasks of Peak Execution Memory
    tasks               : task count

Accepts the event-log DIRECTORY (picks the newest app file, including
.inprogress) or one specific file. Plain json.loads over lines — no
Spark dependency, safe to run while an app is still writing.
"""

from __future__ import annotations

import json
import os
import sys


def newest_log(path: str) -> str:
    """Newest application entry under an event-log dir. Spark 4 writes
    the v2 layout — a DIRECTORY per app (eventlog_v2_<appId>/ holding
    events_N_... part files plus an appstatus marker); Spark 3's v1 is
    a single file. Return whichever the newest entry is; summarize()
    handles both shapes."""
    if os.path.isfile(path):
        return path
    cands = [
        os.path.join(path, f)
        for f in os.listdir(path)
        if not f.startswith(".")
    ]
    if not cands:
        raise SystemExit(f"no event-log files under {path}")
    return max(cands, key=os.path.getmtime)


def _event_files(log_path: str) -> list[str]:
    if os.path.isfile(log_path):
        return [log_path]
    # v2 app dir: events_<seq>_<appId>[.compressed] part files, ordered
    # by sequence number so multi-part (rolled) logs sum correctly
    parts = [f for f in os.listdir(log_path) if f.startswith("events_")]

    def seq(name: str) -> int:
        try:
            return int(name.split("_")[1])
        except (IndexError, ValueError):
            return 0

    return [os.path.join(log_path, f) for f in sorted(parts, key=seq)]


def _open_text(path: str):
    """Spark 4 compresses event-log parts (zstd by default; lz4/snappy
    configurable) — route compressed parts through pyarrow's codec
    stream, plain files through open()."""
    # sniff the codec from the BASENAME (a dotted parent dir must not
    # route an uncompressed part through a codec), and strip the v1
    # '.inprogress' suffix first so a live compressed log still decodes
    name = os.path.basename(path)
    if name.endswith(".inprogress"):
        name = name[: -len(".inprogress")]
    ext = name.rsplit(".", 1)[-1]
    if ext in ("zstd", "lz4", "snappy", "gz"):
        import io

        import pyarrow as pa

        codec = {"gz": "gzip"}.get(ext, ext)
        return io.TextIOWrapper(
            pa.CompressedInputStream(pa.OSFile(path, "rb"), codec), encoding="utf-8"
        )
    return open(path, encoding="utf-8")


def summarize(log_file: str) -> dict:
    totals = {
        "input_bytes": 0,
        "shuffle_write_bytes": 0,
        "shuffle_read_bytes": 0,
        "executor_cpu_sec": 0.0,
        "executor_run_sec": 0.0,
        "peak_memory_bytes": 0,
        "tasks": 0,
    }
    for part in _event_files(log_file):
        with _open_text(part) as f:
            for line in f:
                if '"SparkListenerTaskEnd"' not in line:
                    continue
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue  # torn tail line of an in-progress log
                m = ev.get("Task Metrics")
                if not m:
                    continue
                totals["tasks"] += 1
                totals["input_bytes"] += m.get("Input Metrics", {}).get("Bytes Read", 0)
                totals["shuffle_write_bytes"] += m.get("Shuffle Write Metrics", {}).get(
                    "Shuffle Bytes Written", 0
                )
                sr = m.get("Shuffle Read Metrics", {})
                totals["shuffle_read_bytes"] += sr.get("Local Bytes Read", 0) + sr.get(
                    "Remote Bytes Read", 0
                )
                totals["executor_cpu_sec"] += m.get("Executor CPU Time", 0) / 1e9
                totals["executor_run_sec"] += m.get("Executor Run Time", 0) / 1e3
                totals["peak_memory_bytes"] = max(
                    totals["peak_memory_bytes"], m.get("Peak Execution Memory", 0)
                )
    totals["executor_cpu_sec"] = round(totals["executor_cpu_sec"], 2)
    totals["executor_run_sec"] = round(totals["executor_run_sec"], 2)
    totals["log_file"] = log_file
    return totals


def by_job(log_file: str) -> dict:
    """Per-job-description byte/CPU attribution: map each stage to the
    job that submitted it (SparkListenerJobStart carries the driver's
    spark.job.description property and the job's stage IDs), then sum
    TaskEnd metrics per description. Jobs without a description (AQE
    broadcast/subquery-pool jobs, parquet footer reads) group under a
    named '(unlabeled: ...)' bucket.
    The same description across multiple actions accumulates — the
    jobdesc labels (cogie:*) are stable stage names, so this is the
    per-stage form of summarize()."""
    stage_desc: dict[int, str] = {}
    jobs: dict[str, dict] = {}

    def bucket(desc: str) -> dict:
        return jobs.setdefault(
            desc,
            {
                "shuffle_write_bytes": 0,
                "shuffle_read_bytes": 0,
                "input_bytes": 0,
                "executor_cpu_sec": 0.0,
                "tasks": 0,
            },
        )

    for part in _event_files(log_file):
        with _open_text(part) as f:
            for line in f:
                if '"SparkListenerJobStart"' in line:
                    try:
                        ev = json.loads(line)
                    except json.JSONDecodeError:
                        continue
                    # jobs without a description are (verified on a
                    # labeled bench run) AQE broadcast/subquery jobs —
                    # Spark's exchange thread pool does not inherit the
                    # job-description local property — plus the parquet
                    # footer-read job at session open; name them so the
                    # report doesn't show a bare '' bucket
                    desc = (ev.get("Properties") or {}).get(
                        "spark.job.description", ""
                    ) or "(unlabeled: AQE broadcast/subquery pool, footer reads)"
                    for sid in ev.get("Stage IDs", []):
                        stage_desc[sid] = desc
                elif '"SparkListenerTaskEnd"' in line:
                    try:
                        ev = json.loads(line)
                    except json.JSONDecodeError:
                        continue
                    m = ev.get("Task Metrics")
                    if not m:
                        continue
                    b = bucket(stage_desc.get(ev.get("Stage ID"), ""))
                    b["tasks"] += 1
                    b["input_bytes"] += m.get("Input Metrics", {}).get("Bytes Read", 0)
                    b["shuffle_write_bytes"] += m.get("Shuffle Write Metrics", {}).get(
                        "Shuffle Bytes Written", 0
                    )
                    sr = m.get("Shuffle Read Metrics", {})
                    b["shuffle_read_bytes"] += sr.get("Local Bytes Read", 0) + sr.get(
                        "Remote Bytes Read", 0
                    )
                    b["executor_cpu_sec"] += m.get("Executor CPU Time", 0) / 1e9
    for b in jobs.values():
        b["executor_cpu_sec"] = round(b["executor_cpu_sec"], 2)
    return jobs


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--by-job"]
    if len(args) != 1:
        raise SystemExit(__doc__)
    log = newest_log(args[0])
    if "--by-job" in sys.argv:
        print(json.dumps(by_job(log)))
    else:
        print(json.dumps(summarize(log)))


if __name__ == "__main__":
    main()
