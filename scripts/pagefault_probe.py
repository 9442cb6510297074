"""First-touch page-fault latency probe — the bench-window gate this
host actually needs.

Round-5 finding: this sandbox intermittently enters a state where the
FIRST touch of any new anonymous page costs ~1 ms (hypervisor-side
lazy provisioning / ballooning; hot-page access stays normal).  In
that state every allocation-heavy workload — a Spark JVM heap growing,
Arrow batch buffers, Python object churn — runs 100-1000x slow while
`top` shows the machine idle and load average looks fine, so the
load-average gate used since round 2 does not catch it.  Measured
2026-08-17: 1216 us/page cold vs 2.4 us/page hot (512x); healthy hosts
measure ~1-3 us cold.

Usage:  python scripts/pagefault_probe.py [--mb 64]
Prints one JSON line: {"cold_us_per_page": ..., "hot_us_per_page": ...,
"ratio": ...}.  Bench protocol: gate timed legs on
cold_us_per_page < 10 (alongside the existing load-average gate).
"""

from __future__ import annotations

import argparse
import json
import mmap
import time

PAGE = 4096


def probe(mb: int = 64) -> dict:
    size = mb * 1024 * 1024
    m = mmap.mmap(-1, size)
    t0 = time.perf_counter()
    for off in range(0, size, PAGE):
        m[off] = 1
    cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    for off in range(0, size, PAGE):
        m[off] = 2
    hot = time.perf_counter() - t0
    m.close()
    pages = size // PAGE
    return {
        "cold_us_per_page": round(cold / pages * 1e6, 2),
        "hot_us_per_page": round(hot / pages * 1e6, 2),
        "ratio": round(cold / hot, 1) if hot > 0 else float("inf"),
    }


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=int, default=64)
    print(json.dumps(probe(ap.parse_args().mb)))
