#!/bin/bash
# Round-5 ladder 1: metrics + controls (VERDICT r4 #2, #4, #6, #7, #8).
#   1-2. model_flops: dense-basis FLOPs for dual-basis MFU (committed JSON)
#   3.   bench.py — official headline w/ mfu_prog + mfu_model, cache-warm
#   4-5. flash-MRF second back-to-back control pair (flash on vs dense)
#   6.   CFEN_MRF_SQ sweep, same session (64 / 128 / 256)
#   7.   end-to-end test.py pipeline re-measure (bench_e2e)
#   8.   device overfit receipt: 400 GAN steps, loss+PSNR trajectory
#   setsid nohup bash scripts/r5_ladder1.sh > /tmp/r5_ladder1.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
STAMP() { date +%H:%M:%S; }
R() { echo "=== $(STAMP) $*"; "$@" 2>&1; echo "=== rc=$?"; }

echo "### r5 ladder1 start $(date)"

R python scripts/model_flops.py --mode infer --batch 8
R python scripts/model_flops.py --mode train --batch 8 --remat

R python bench.py

R python bench_train.py --batch 8 --remat
R env CFEN_PALLAS_MRF=0 python bench_train.py --batch 8 --remat

R env CFEN_MRF_SQ=64 python bench_train.py --batch 8 --remat
R env CFEN_MRF_SQ=128 python bench_train.py --batch 8 --remat
R env CFEN_MRF_SQ=256 python bench_train.py --batch 8 --remat

R python scripts/bench_e2e.py

R python scripts/train_overfit.py --steps 400 --batch 8 --remat

echo "### r5 ladder1 done $(date)"
