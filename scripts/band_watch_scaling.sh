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

band_healthy() {  # $1 = bw floor (default 1.5)
  local floor=${1:-1.5}
  BW=$(python scripts/membw_probe.py --quick 2>/dev/null | tail -1 | python -c "import sys,json;print(json.load(sys.stdin)['mem_gbps@1'])")
  LOAD=$(cut -d' ' -f1 /proc/loadavg)
  echo "probe: bw=${BW} load=${LOAD} floor=${floor} $(date +%H:%M:%S)"
  python -c "import sys; sys.exit(0 if float('$BW')>=float('$floor') and float('$LOAD')<4 else 1)"
}

run_pair() {  # $1 = n_groups, $2 = out json, [$3 = cores pair]; 0 iff band_ok
  local groups=$1 out=$2 cores=${3:-8,32}
  echo "band healthy - taking lock and firing scaling pair at ${groups} groups (${cores})"
  echo "$$ $(date +%s)" > "$LOCK"
  COGIE_BENCH_GROUPS=$groups COGIE_BW_FLOOR_GBPS=1.0 COGIE_SCALING_CORES=$cores \
    python bench.py --scaling > "$out" 2>"${out%.json}.err"
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
POLL_SECS=${POLL_SECS:-600}
N_POLLS=${N_POLLS:-27}
# Session-10 sequence: (1) the missing band-clean 900k 8->32 pair;
# (2) a band-clean 2->8 pair at 200k — the low-core regime where the
# shared socket can still supply constant per-core DRAM bandwidth (a
# mixed-band attempt read 0.75 but its 2-leg opened at 0.1 GB/s, which
# INFLATES the ratio, so only a band_ok pair counts); (3) the 450k
# 8->32 replicate if the window still holds.
# Two-tier windows (session-10: today's windows last minutes, not
# hours): a STRONG band (>= 3 GB/s) is worth spending on the ~30-min
# 900k 8->32 pair; a MARGINAL band (>= 1.5) fires the shorter 2->8
# pair at 200k, whose low-core legs also tolerate band wobble better
# (and whose failure mode — narrow-leg deflation — only deflates the
# ratio when the band sags mid-8-leg, never inflates a clean pair).
DONE_900=0
DONE_2X8=0
for i in $(seq 1 "$N_POLLS"); do
  echo "poll $i"
  if band_healthy 1.5; then
    strong=1
    python -c "import sys; sys.exit(0 if float('$BW')>=3.0 else 1)" || strong=0
    if [ "$DONE_900" = "0" ] && [ "$strong" = "1" ]; then
      if run_pair 900000 "$OUTDIR/scaling_r5s10_900k.json"; then
        DONE_900=1
      else
        echo "900k pair was band-contaminated; resuming polling"
        continue
      fi
    fi
    if [ "$DONE_2X8" = "0" ] && band_healthy 1.5; then
      if run_pair 200000 "$OUTDIR/scaling_r5s10_2x8_200k.json" 2,8; then
        DONE_2X8=1
      else
        echo "2x8 pair band-contaminated; resuming polling"
        continue
      fi
    fi
    if [ "$DONE_900" = "1" ] && [ "$DONE_2X8" = "1" ] && band_healthy 1.5; then
      run_pair 450000 "$OUTDIR/scaling_r5s10_450k.json" && exit 0
      echo "450k pair band-contaminated; resuming polling for it"
    fi
    [ "$DONE_2X8" = "1" ] && [ "$DONE_900" = "0" ] && echo "2x8 done; waiting for a strong (>=3) window for 900k"
  fi
  sleep "$POLL_SECS"
done
echo "no healthy window found"
exit 3
