#!/bin/bash
# Round-4 on-device measurement ladder (VERDICT r3 #1,2,3,5,6).
# Run DETACHED when the axon tunnel is up:
#   setsid nohup bash scripts/r4_device_ladder.sh > /tmp/r4_ladder.log 2>&1 &
# Sequential on purpose: one TPU, and cold compiles through the tunnel can
# take 10-22 min each (CLAUDE.md r3). Never kill mid-compile.
set -u
cd "$(dirname "$0")/.."
STAMP() { date +%H:%M:%S; }
R() { echo "=== $(STAMP) $*"; timeout 3600 "$@" 2>&1; echo "=== rc=$?"; }

echo "### r4 ladder start $(date)"

# 1. Recapture the inference headline (b8 trunk) + the dip shapes.
R python bench.py --batch 8
R python bench.py --batch 10
R python bench.py --batch 12
R python bench.py --batch 16

# 2. Train baseline at b8, then flash-MRF on with SQ sweep.
R python bench_train.py --batch 8 --remat
for SQ in 16 32 64 128; do
  echo "--- CFEN_PALLAS_MRF=1 SQ=$SQ"
  R env CFEN_PALLAS_MRF=1 CFEN_MRF_SQ=$SQ python bench_train.py --batch 8 --remat
done

# 3. VGG conv1_1 phase form (train): off vs on.
echo "--- CFEN_VGG_PS=1"
R env CFEN_VGG_PS=1 python bench_train.py --batch 8 --remat

# 4. Deform-conv device numbers.
R python scripts/bench_deform.py

echo "### r4 ladder done $(date)"
