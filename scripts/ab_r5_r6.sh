#!/bin/bash
# Same-window interleaved A/B: r5 final tree (/tmp/r5tree) vs the r6
# working tree (/root/repo), full bench at $1 (default sf0.1), N pairs
# (default 2), band-probed around every leg. One JSON line per leg into
# $OUT (default /tmp/ab_r5_r6.jsonl).
set -u
SF="${1:-/root/testdata/sf0.1}"
PAIRS="${2:-2}"
OUT="${OUT:-/tmp/ab_r5_r6.jsonl}"
probe() { python /root/repo/scripts/membw_probe.py --quick 2>/dev/null | tail -1 | python -c 'import json,sys;print(json.load(sys.stdin)["mem_gbps@1"])'; }
for i in $(seq 1 "$PAIRS"); do
  for tree in /tmp/r5tree /root/repo; do
    b0=$(probe)
    line=$(cd "$tree" && SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS=32 python bench.py 2>/dev/null | tail -1)
    b1=$(probe)
    echo "{\"tree\": \"$tree\", \"pair\": $i, \"band_before\": $b0, \"band_after\": $b1, \"r\": $line}" >> "$OUT"
    echo "pair $i $tree band=$b0->$b1 done"
  done
done
