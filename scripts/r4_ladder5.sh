#!/bin/bash
# Round-4 ladder 5: verify the MRF clamp fix on device, recapture train
# numbers with flash-MRF now auto-ON, and redo the deform bench with the
# monotonic-clock timing fix.
#   setsid nohup bash scripts/r4_ladder5.sh > /tmp/r4_ladder5.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
STAMP() { date +%H:%M:%S; }
R() { echo "=== $(STAMP) $*"; "$@" 2>&1; echo "=== rc=$?"; }

echo "### r4 ladder5 start $(date)"

# 1. 31-step loss trace, flash-MRF auto-ON (was nan at step 16 pre-clamp).
R python scripts/trace_train_losses.py --batch 8 --remat --steps 31

# 2. Train bench, flash-MRF ON (default now) — expect ~12.7 img/s, finite.
R python bench_train.py --batch 8 --remat

# 3. Dense-path control: clamped scan, 31-step trace + bench.
R env CFEN_PALLAS_MRF=0 python scripts/trace_train_losses.py --batch 8 --remat --steps 31
R env CFEN_PALLAS_MRF=0 python bench_train.py --batch 8 --remat

# 4. VGG_PS finiteness check post-clamp (perf already rejected: 10.01 vs
#    10.7 dense; this run is only to pin its nan on the MRF blowup).
R env CFEN_VGG_PS=1 CFEN_PALLAS_MRF=0 python scripts/trace_train_losses.py --batch 8 --remat --steps 20

# 5. Deform-conv bench with monotonic-clock median-of-3 timing.
R python scripts/bench_deform.py

echo "### r4 ladder5 done $(date)"
