#!/bin/bash
# Round-4 ladder 7: the remaining unmeasured device items after ladder6.
#   1. deform-conv number (VERDICT r3 #6) — monotonic-window timing.
#   2. AUTO-layout A/B (VERDICT r3 #8) — input/output edge copies.
#   3. Inference HLO profile at b8 trunk-on — the next-sink receipt.
#   4. bench.py — warms the driver's program in the fresh (post-VM-restart)
#      compile cache so the official end-of-round run is cache-hot.
#   setsid nohup bash scripts/r4_ladder7.sh > /tmp/r4_ladder7.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
STAMP() { date +%H:%M:%S; }
R() { echo "=== $(STAMP) $*"; timeout 3600 "$@" 2>&1; echo "=== rc=$?"; }

echo "### r4 ladder7 start $(date)"

R python scripts/bench_deform.py

R python scripts/bench_layout.py --batch 8

R python scripts/profile_hlo.py --batch 8 --top 30

R python bench.py

echo "### r4 ladder7 done $(date)"
