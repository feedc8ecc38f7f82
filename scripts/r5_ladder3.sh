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

R python scripts/bench_e2e.py

R python scripts/train_overfit.py --steps 400 --batch 8 --remat \
    --log_every 25

R python bench.py

echo "### r5 ladder3 done $(date)"
