"""Summarize interleaved A/B leg JSONL (scripts/ab_r5_r6.sh /
ab_final_r6.sh output) into per-query matched-pair tables.

Usage: python scripts/ab_summarize.py /tmp/ab_final_r6.jsonl
"""

from __future__ import annotations

import json
import sys
from collections import defaultdict


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ab_final_r6.jsonl"
    legs = [json.loads(line) for line in open(path) if line.strip()]
    by_sf = defaultdict(lambda: defaultdict(dict))
    for leg in legs:
        sf = leg.get("sf", "?")
        tree = "r5" if "r5tree" in leg["tree"] else "r6"
        by_sf[sf][leg["pair"]][tree] = leg
    for sf, pairs in sorted(by_sf.items()):
        print(f"\n== {sf} ==")
        qnames = None
        for p in sorted(pairs):
            row = pairs[p]
            if len(row) < 2:
                print(f" pair {p}: incomplete ({list(row)})")
                continue
            if qnames is None:
                qnames = list(row["r5"]["r"]["queries"])
            for tree in ("r5", "r6"):
                r = row[tree]["r"]
                qs = " ".join(f"{q.split('_')[0]}={r['queries'][q]:.2f}" for q in qnames)
                print(
                    f" p{p} {tree} band={row[tree]['band_before']}->{row[tree]['band_after']}"
                    f" tot={r['value']:.1f} corpus={r.get('corpus_clean_sec')} {qs}"
                )
        # per-query min across legs per tree (the keep-best convention)
        mins = {t: defaultdict(lambda: 1e9) for t in ("r5", "r6")}
        cmins = {t: 1e9 for t in ("r5", "r6")}
        for p, row in pairs.items():
            for t, leg in row.items():
                for q, v in leg["r"]["queries"].items():
                    mins[t][q] = min(mins[t][q], v)
                c = leg["r"].get("corpus_clean_sec")
                if c is not None:
                    cmins[t] = min(cmins[t], c)
        if qnames:
            print(" best-of-legs per query:")
            for q in qnames:
                a, b = mins["r5"][q], mins["r6"][q]
                print(f"  {q:24s} r5={a:7.2f}  r6={b:7.2f}  ratio={b/a:5.2f}")
            print(f"  {'corpus_clean':24s} r5={cmins['r5']:7.2f}  r6={cmins['r6']:7.2f}"
                  f"  ratio={cmins['r6']/cmins['r5']:5.2f}")


if __name__ == "__main__":
    main()
