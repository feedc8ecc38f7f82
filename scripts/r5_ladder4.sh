#!/bin/bash
# Round-5 ladder 4: device-only train A/Bs (--device_input removes the
# host u8-wire + relay-upload noise term that swamped ladder2's pairs:
# dense measured 6.71 then 11.11 on the SAME cached program 9 min apart).
# Alternating pairs, 2x each:
#   flash vs dense (VERDICT #7 second control), VGG batched on/off (#5).
#   setsid nohup bash scripts/r5_ladder4.sh > /tmp/r5_ladder4.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
STAMP() { date +%H:%M:%S; }
R() { echo "=== $(STAMP) $*"; "$@" 2>&1; echo "=== rc=$?"; }

echo "### r5 ladder4 start $(date)"

R python bench_train.py --batch 8 --remat --device_input
R env CFEN_PALLAS_MRF=0 python bench_train.py --batch 8 --remat --device_input
R python bench_train.py --batch 8 --remat --device_input
R env CFEN_PALLAS_MRF=0 python bench_train.py --batch 8 --remat --device_input

R env CFEN_VGG_BATCHED=1 python bench_train.py --batch 8 --remat --device_input
R python bench_train.py --batch 8 --remat --device_input
R env CFEN_VGG_BATCHED=1 python bench_train.py --batch 8 --remat --device_input

echo "### r5 ladder4 done $(date)"
