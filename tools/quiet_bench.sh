#!/bin/bash
# Quiet-window scaling harvester: wait for host load < threshold, then run
# one interleaved ScaleProbe; repeat. Results accumulate in $OUT for
# post-hoc min-taking. Usage: quiet_bench.sh [attempts] [loadmax] [nclips]
ATTEMPTS=${1:-4}
LOADMAX=${2:-2.5}
NCLIPS=${3:-100000}
OUT=${OUT:-/tmp/quiet_bench_results.txt}
cd /root/repo
for i in $(seq 1 "$ATTEMPTS"); do
  # wait (up to 20 min per attempt) for a quiet window
  for w in $(seq 1 120); do
    L=$(cut -d' ' -f1 /proc/loadavg)
    ok=$(python3 -c "print(1 if $L < $LOADMAX else 0)")
    [ "$ok" = "1" ] && break
    sleep 10
  done
  echo "[attempt $i] load=$(cut -d' ' -f1-3 /proc/loadavg) $(date +%H:%M:%S)" >> "$OUT"
  sbt -batch "runMain graft.tools.ScaleProbe $NCLIPS 8 2" 2>&1 | grep '\[probe\]' >> "$OUT"
done
echo DONE >> "$OUT"
