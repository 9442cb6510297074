"""Host-ceiling probe: how does this machine's COMPUTE and MEMORY
BANDWIDTH scale from N to 4N pinned workers?

Two workloads, identical loop shape, different working-set size:
- 'cache' : 256 KB arrays (L2-resident) — pure-CPU scaling ceiling;
- 'mem'   : 256 MB arrays (DRAM-resident) — aggregate-bandwidth ceiling.

Each worker pins itself to one core (sched_setaffinity), runs
sum(a * b) rounds for ``seconds``, and reports bytes touched. The
printed JSON gives aggregate GB/s at each worker count and the
N->4N scaling ratio per workload.

Why this matters for the scaling legs (BASELINE.md): a Spark stage
whose tasks are DRAM-bound can never beat the 'mem' ratio no matter
how it is planned — on one socket, 4x threads share one memory
system. On a real 4N-executor cluster each executor brings its own
socket, so the sandbox 'mem' ratio is a host artifact, not an engine
property. Usage:
    python scripts/membw_probe.py [seconds_per_point]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

import numpy as np


def _worker(core: int, size_floats: int, seconds: float, out):
    try:
        os.sched_setaffinity(0, {core})
    except OSError:
        pass
    a = np.ones(size_floats, dtype=np.float64)
    b = np.full(size_floats, 2.0, dtype=np.float64)
    t0 = time.time()
    rounds = 0
    while time.time() - t0 < seconds:
        float((a * b).sum())
        rounds += 1
    # bytes touched per round: read a + read b + write tmp + read tmp
    out.put(rounds * size_floats * 8 * 4)


def measure(n_workers: int, size_floats: int, seconds: float) -> float:
    q = mp.Queue()
    ps = [
        mp.Process(target=_worker, args=(i, size_floats, seconds, q))
        for i in range(n_workers)
    ]
    t0 = time.time()
    for p in ps:
        p.start()
    total = sum(q.get() for _ in ps)
    for p in ps:
        p.join()
    return total / (time.time() - t0) / 1e9  # GB/s aggregate


def quick_mem_gbps(seconds: float = 2.0) -> float:
    """ONE pinned worker, DRAM-resident working set (~768 MB touched
    per round): the bandwidth-BAND gate for scaling legs. The round-5
    session-4 pair showed the page-fault probe (fault latency) can read
    clean while co-tenant streaming load drops the DRAM band 50x — this
    2-second single-point probe catches that directly."""
    return measure(1, 32 * 1024 * 1024, seconds)


def main() -> None:
    if "--quick" in sys.argv:
        print(json.dumps({"mem_gbps@1": round(quick_mem_gbps(), 2)}))
        return
    seconds = float(sys.argv[1]) if len(sys.argv) > 1 else 8.0
    points = {}
    for label, size in (("cache", 32 * 1024), ("mem", 32 * 1024 * 1024)):
        gbs = {n: round(measure(n, size, seconds), 2) for n in (8, 32)}
        points[label] = {
            "gbps@8": gbs[8],
            "gbps@32": gbs[32],
            "ratio_8_to_32": round(gbs[32] / gbs[8], 2),
            "efficiency": round(gbs[32] / gbs[8] / 4.0, 2),
        }
    print(json.dumps(points))


if __name__ == "__main__":
    main()
