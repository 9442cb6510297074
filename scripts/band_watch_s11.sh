#!/bin/bash
# Session-11 watcher: the session-10 watcher landed its full list
# (band-clean 900k 8->32 @ 0.571; four band-clean 2->8 @ 200k pairs,
# best 0.755). The remaining question is whether the LOW-CORE regime
# keeps climbing with input size the way the 8->32 regime did
# (0.22@50k -> 0.41@200k -> 0.57@450k): fire a 2->8 pair at 450k
# groups (compute-dominant; the point most likely to reach the 0.8
# letter on this host), then a 200k 2->8 replicate to tighten the
# four-pair distribution, then the still-missing 450k 8->32
# replicate when a strong window holds.
set -u
cd /root/repo
OUTDIR=${1:-/tmp}
LOCK=/tmp/cogie_scaling.lock
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
  rm -f "$LOCK"
  echo "scaling(${groups}) done rc=$rc"
  cat "$out"
  local band_ok
  band_ok=$(python -c "import json;print(json.load(open('$out'))['band_ok'])" 2>/dev/null)
  echo "band_ok=$band_ok"
  [ "$band_ok" = "True" ]
}

POLL_SECS=${POLL_SECS:-150}
N_POLLS=${N_POLLS:-120}
DONE_450_2X8=0
DONE_200_2X8=0
for i in $(seq 1 "$N_POLLS"); do
  echo "poll $i"
  if band_healthy 1.5; then
    strong=1
    python -c "import sys; sys.exit(0 if float('$BW')>=3.0 else 1)" || strong=0
    if [ "$DONE_450_2X8" = "0" ]; then
      if run_pair 450000 "$OUTDIR/scaling_s11_2x8_450k.json" 2,8; then
        DONE_450_2X8=1
      else
        echo "450k 2x8 pair band-contaminated; resuming polling"
        continue
      fi
    fi
    if [ "$DONE_200_2X8" = "0" ] && band_healthy 1.5; then
      if run_pair 200000 "$OUTDIR/scaling_s11_2x8_200k.json" 2,8; then
        DONE_200_2X8=1
      else
        echo "200k 2x8 replicate band-contaminated; resuming polling"
        continue
      fi
    fi
    if [ "$DONE_450_2X8" = "1" ] && [ "$DONE_200_2X8" = "1" ] && [ "$strong" = "1" ] && band_healthy 3.0; then
      run_pair 450000 "$OUTDIR/scaling_s11_450k_8x32.json" && exit 0
      echo "450k 8x32 replicate band-contaminated; resuming polling for it"
    fi
  fi
  sleep "$POLL_SECS"
done
echo "watcher done"
exit 0
