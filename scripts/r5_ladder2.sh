#!/bin/bash
# Round-5 ladder 2: UNCONTENDED re-runs + remaining A/Bs.
# ladder1's train rows ran while the CPU test tier hogged the single host
# core (host-side set_input/dispatch inflate s/step), and flash (8.74)
# came out BELOW dense (11.06) — opposite of r4's same-session +61%.
# Settle it with nothing else running:
#   1. flash vs dense back-to-back pair (x2 each, alternating)
#   2. CFEN_VGG_BATCHED A/B (flash on both sides)
#   3. model_flops --mode train (fixed: builds the step first)
#   4. phase-sparse op-level headroom probe
#   setsid nohup bash scripts/r5_ladder2.sh > /tmp/r5_ladder2.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
STAMP() { date +%H:%M:%S; }
R() { echo "=== $(STAMP) $*"; "$@" 2>&1; echo "=== rc=$?"; }

echo "### r5 ladder2 start $(date)"

R python bench_train.py --batch 8 --remat
R env CFEN_PALLAS_MRF=0 python bench_train.py --batch 8 --remat
R python bench_train.py --batch 8 --remat
R env CFEN_PALLAS_MRF=0 python bench_train.py --batch 8 --remat

R env CFEN_VGG_BATCHED=1 python bench_train.py --batch 8 --remat
R python bench_train.py --batch 8 --remat
R env CFEN_VGG_BATCHED=1 python bench_train.py --batch 8 --remat

R python scripts/model_flops.py --mode train --batch 8 --remat

R python scripts/probe_phase_sparse.py

echo "### r5 ladder2 done $(date)"
