#!/bin/bash
# Round-4 ladder 8: post-ladder7 follow-ups.
#   1. bench.py with AUTO layouts (new default) — confirms the driver's
#      official program is cache-warm (bench_layout arm2 compiled it) and
#      gives the official-path number.
#   2. bench_deform.py with relay-proof scan-chain timing (the dispatch
#      loop gave >100% MFU — VERDICT r3 #6 needs a real number).
#   3. One clamped CFEN_MRF_SQ sweep point (pre-clamp sweep said 128;
#      confirm the clamped form's optimum didn't shift).
#   setsid nohup bash scripts/r4_ladder8.sh > /tmp/r4_ladder8.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
STAMP() { date +%H:%M:%S; }
R() { echo "=== $(STAMP) $*"; "$@" 2>&1; echo "=== rc=$?"; }

echo "### r4 ladder8 start $(date)"

R python bench.py

R python scripts/bench_deform.py

R env CFEN_MRF_SQ=256 python bench_train.py --batch 8 --remat

echo "### r4 ladder8 done $(date)"
