#!/bin/bash
# Band-gated final A/B for the round-6 writeup: waits for a healthy
# DRAM band (>= $FLOOR GB/s), then runs one interleaved full-bench pair
# (r5 worktree leg, then r6 repo leg) per healthy window until $PAIRS
# pairs exist at each SF. One JSON line per leg into $OUT.
set -u
FLOOR="${FLOOR:-2.0}"
PAIRS="${PAIRS:-3}"
OUT="${OUT:-/tmp/ab_final_r6.jsonl}"
probe() { python /root/repo/scripts/membw_probe.py --quick 2>/dev/null | tail -1 | python -c 'import json,sys;print(json.load(sys.stdin)["mem_gbps@1"])'; }
run_pair() { # $1 = sf dir, $2 = pair idx
  for tree in /tmp/r5tree /root/repo; do
    b0=$(probe)
    line=$(cd "$tree" && SPARK_GRAFT_SF_DIR="$1" SPARK_GRAFT_CPUS=32 python bench.py 2>/dev/null | tail -1)
    b1=$(probe)
    echo "{\"sf\": \"$1\", \"tree\": \"$tree\", \"pair\": $2, \"band_before\": $b0, \"band_after\": $b1, \"r\": $line}" >> "$OUT"
  done
}
for sf in /root/testdata/sf0.1 /root/testdata/sf1.0; do
  for i in $(seq 1 "$PAIRS"); do
    # wait for a healthy window (cap the wait per pair at ~40 min)
    for try in $(seq 1 150); do
      b=$(probe)
      ok=$(python -c "print(1 if $b >= $FLOOR else 0)")
      [ "$ok" = "1" ] && break
      sleep 60
    done
    echo "window band=$b sf=$sf pair=$i" >&2
    run_pair "$sf" "$i"
  done
done
echo DONE >&2
