#!/bin/bash
# Poll the DRAM band; when healthy, fire ONE 450k-group scaling pair.
# Takes /tmp/cogie_scaling.lock for the duration of the pair so
# interactive sessions on the same socket can avoid contaminating it
# (BASELINE.md round-5 session-5: a formally-clean pair was deflated by
# our own concurrent pytest run — the ambient-load gate cannot tell
# "us" from co-tenants).
set -u
cd /root/repo
OUT=${1:-/tmp/scaling_r5s6.json}
LOCK=/tmp/cogie_scaling.lock
# never leak the lock: remove it on ANY exit (Ctrl-C, kill, OOM of the
# child), and refuse to start over someone else's live lock
trap 'rm -f "$LOCK"' EXIT
if [ -e "$LOCK" ]; then
  echo "lock $LOCK already held ($(cat "$LOCK")) - refusing to start" >&2
  trap - EXIT
  exit 4
fi
for i in $(seq 1 27); do
  BW=$(python scripts/membw_probe.py --quick 2>/dev/null | tail -1 | python -c "import sys,json;print(json.load(sys.stdin)['mem_gbps@1'])")
  LOAD=$(cut -d' ' -f1 /proc/loadavg)
  echo "poll $i: bw=${BW} load=${LOAD} $(date +%H:%M:%S)"
  OK=$(python -c "print(1 if float('$BW')>=1.5 and float('$LOAD')<4 else 0)")
  if [ "$OK" = "1" ]; then
    echo "band healthy - taking lock and firing scaling pair at 450k groups"
    echo "$$ $(date +%s)" > "$LOCK"
    COGIE_BENCH_GROUPS=450000 COGIE_BW_FLOOR_GBPS=1.0 python bench.py --scaling > "$OUT" 2>"${OUT%.json}.err"
    rc=$?
    rm -f "$LOCK"   # promptly; the EXIT trap is the backstop
    echo "scaling done rc=$rc"
    cat "$OUT"
    BAND_OK=$(python -c "import json;print(json.load(open('$OUT'))['band_ok'])" 2>/dev/null)
    echo "band_ok=$BAND_OK"
    if [ "$BAND_OK" = "True" ]; then exit 0; fi
    echo "pair was band-contaminated; resuming polling"
  fi
  sleep 600
done
echo "no healthy window found"
exit 3
