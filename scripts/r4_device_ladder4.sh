#!/bin/bash
# Round-4 device ladder, phase 4: flash-MRF sweep with the per-kernel
# Mosaic vmem_limit_bytes raise (phase-3 blocker: XLA's 16 MB scoped-vmem
# default vs the 8 MB resident t-block double-buffered).
#   setsid nohup bash scripts/r4_device_ladder4.sh > /tmp/r4_ladder4.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
STAMP() { date +%H:%M:%S; }
R() { echo "=== $(STAMP) $*"; timeout 3600 "$@" 2>&1; echo "=== rc=$?"; }

echo "### r4 ladder4 start $(date)"

for SQ in 128 256 64 512; do
  echo "--- CFEN_PALLAS_MRF=1 SQ=$SQ"
  R env CFEN_PALLAS_MRF=1 CFEN_MRF_SQ=$SQ python bench_train.py --batch 8 --remat
done

echo "### r4 ladder4 done $(date)"
