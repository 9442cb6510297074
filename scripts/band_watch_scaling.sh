#!/bin/bash
# Poll the DRAM band; when healthy, fire scaling pairs — first 450k
# groups (replicate/beat the standing 0.573 best), then, if the first
# pair came back band-clean AND the band is still healthy, one 900k
# pair (the trend point both prior attempts lost to band collapse:
# BASELINE.md round-5 sessions 3-4).
# Takes /tmp/cogie_scaling.lock for the duration of each pair so
# interactive sessions on the same socket can avoid contaminating it
# (BASELINE.md round-5 session-5: a formally-clean pair was deflated by
# our own concurrent pytest run — the ambient-load gate cannot tell
# "us" from co-tenants).
set -u
cd /root/repo
OUTDIR=${1:-/tmp}
LOCK=/tmp/cogie_scaling.lock
# never leak the lock: remove it on ANY exit (Ctrl-C, kill, OOM of the
# child), and refuse to start over someone else's live lock
trap 'rm -f "$LOCK"' EXIT
if [ -e "$LOCK" ]; then
  echo "lock $LOCK already held ($(cat "$LOCK")) - refusing to start" >&2
  trap - EXIT
  exit 4
fi

band_healthy() {
  BW=$(python scripts/membw_probe.py --quick 2>/dev/null | tail -1 | python -c "import sys,json;print(json.load(sys.stdin)['mem_gbps@1'])")
  LOAD=$(cut -d' ' -f1 /proc/loadavg)
  echo "probe: bw=${BW} load=${LOAD} $(date +%H:%M:%S)"
  python -c "import sys; sys.exit(0 if float('$BW')>=1.5 and float('$LOAD')<4 else 1)"
}

run_pair() {  # $1 = n_groups, $2 = out json; returns 0 iff band_ok
  local groups=$1 out=$2
  echo "band healthy - taking lock and firing scaling pair at ${groups} groups"
  echo "$$ $(date +%s)" > "$LOCK"
  COGIE_BENCH_GROUPS=$groups COGIE_BW_FLOOR_GBPS=1.0 python bench.py --scaling > "$out" 2>"${out%.json}.err"
  local rc=$?
  rm -f "$LOCK"   # promptly; the EXIT trap is the backstop
  echo "scaling(${groups}) done rc=$rc"
  cat "$out"
  local band_ok
  band_ok=$(python -c "import json;print(json.load(open('$out'))['band_ok'])" 2>/dev/null)
  echo "band_ok=$band_ok"
  [ "$band_ok" = "True" ]
}

# Session-9 priority flip: the missing datum is a band-clean 900k
# pair (both prior attempts lost to band collapse / degraded band);
# 450k is already covered by the standing 0.573 best, so it runs
# second, only if the window survives the 900k pair.
DONE_900=0
for i in $(seq 1 27); do
  echo "poll $i"
  if band_healthy; then
    if [ "$DONE_900" = "0" ]; then
      if run_pair 900000 "$OUTDIR/scaling_r5s9_900k.json"; then
        DONE_900=1
        # band survived the 900k pair — try a 450k replicate while
        # the window holds
        if band_healthy; then
          run_pair 450000 "$OUTDIR/scaling_r5s9_450k.json" && exit 0
          echo "450k pair band-contaminated; resuming polling for it"
        fi
      else
        echo "900k pair was band-contaminated; resuming polling"
      fi
    else
      run_pair 450000 "$OUTDIR/scaling_r5s9_450k.json" && exit 0
      echo "450k pair band-contaminated; resuming polling"
    fi
  fi
  sleep 600
done
echo "no healthy window found"
exit 3
