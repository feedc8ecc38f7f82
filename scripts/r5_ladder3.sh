#!/bin/bash
# Round-5 ladder 3: e2e retake (big-run warming fix) + overfit NaN diag
# (per-step loss logging + the select-gated skip valve now in place) +
# final official bench recapture for the driver.
#   setsid nohup bash scripts/r5_ladder3.sh > /tmp/r5_ladder3.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
STAMP() { date +%H:%M:%S; }
R() { echo "=== $(STAMP) $*"; "$@" 2>&1; echo "=== rc=$?"; }

echo "### r5 ladder3 start $(date)"

# dense-path train FLOPs basis (batch 4: the b8 dense program does not
# fit HBM — buffer-assignment OOM in ladder2; lookup is batch-agnostic)
R python scripts/model_flops.py --mode train --batch 4 --remat

R python scripts/bench_e2e.py

R python scripts/train_overfit.py --steps 400 --batch 8 --remat \
    --log_every 25

# in-session SQ re-tune, uncontended + device-input (VERDICT r4 #7;
# ladder1's SQ=64 row overlapped the CPU test tier)
R env CFEN_MRF_SQ=64 python bench_train.py --batch 8 --remat --device_input
R python bench_train.py --batch 8 --remat --device_input
R env CFEN_MRF_SQ=256 python bench_train.py --batch 8 --remat --device_input

R python bench.py

echo "### r5 ladder3 tail $(date)"

echo "### r5 ladder3 done $(date)"
