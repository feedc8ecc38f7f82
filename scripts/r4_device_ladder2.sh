#!/bin/bash
# Round-4 device ladder, phase 2 (VERDICT r3 #5, #7, #8 and the #3 train
# profile): runs after r4_device_ladder.sh finishes (waits on its sentinel).
#   setsid nohup bash scripts/r4_device_ladder2.sh > /tmp/r4_ladder2.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
STAMP() { date +%H:%M:%S; }
R() { echo "=== $(STAMP) $*"; timeout 3600 "$@" 2>&1; echo "=== rc=$?"; }

# Wait (up to 8h) for phase 1 to finish so we never share the chip.
for i in $(seq 1 960); do
  grep -q "### r4 ladder done" /tmp/r4_ladder.log 2>/dev/null && break
  # phase-1 script died without the sentinel -> stop waiting
  pgrep -f "r4_device_ladder.sh" >/dev/null 2>&1 || break
  sleep 30
done

echo "### r4 ladder2 start $(date)"

# 1. Inference profile at the headline batch with the trunk on (#8) and at
#    the dip batch (#5) — top HLO sinks decide the next attack or the wall.
R python scripts/profile_hlo.py --batch 8 --top 30
R python scripts/profile_hlo.py --batch 10 --top 30

# 2. Train profile (post-SSIM/ImagePool r3b state) — where does the GAN
#    step spend time now, with the flash-MRF candidate measured in phase 1.
R python scripts/profile_hlo.py --train --batch 8 --top 30

# 3. Serving: windowed device-utilization + colocated ceiling from /healthz
#    (bench_serve diffs it across the concurrent window).
python serve.py --port 8612 > /tmp/r4_serve.log 2>&1 &
echo $! > /tmp/r4_serve.pid
for i in $(seq 1 240); do
  curl -s -m 2 http://127.0.0.1:8612/healthz >/dev/null 2>&1 && break
  sleep 5
done
sleep 2
R python scripts/bench_serve.py --url http://127.0.0.1:8612 --clients 8 --requests 64
R python scripts/bench_serve.py --url http://127.0.0.1:8612 --clients 16 --requests 96
echo "--- healthz final"; curl -s -m 5 http://127.0.0.1:8612/healthz; echo
kill "$(cat /tmp/r4_serve.pid)" 2>/dev/null

echo "### r4 ladder2 done $(date)"
