#!/bin/bash
# Round-4 ladder 6: clamp-cost A/B for flash-MRF (the clamped first
# measurement came in 10.82 vs 12.66 pre-clamp — mask cost or session
# variance?) and the post-IDMRF train profile (VERDICT r3 #3).
set -u
cd "$(dirname "$0")/.."
STAMP() { date +%H:%M:%S; }
R() { echo "=== $(STAMP) $*"; "$@" 2>&1; echo "=== rc=$?"; }

echo "### r4 ladder6 start $(date)"

# 1. Clamped kernel, cos<1 mask form (reuses the live cos strip).
R python bench_train.py --batch 8 --remat

# 2. A/B: masks off (CFEN_MRF_CLAMP=0; may nan late — timing still valid).
R env CFEN_MRF_CLAMP=0 python bench_train.py --batch 8 --remat

# 3. Variance check: clamped again (cache-hot compile).
R python bench_train.py --batch 8 --remat

# 4. Post-IDMRF train profile with flash-MRF ON (next-sink analysis).
R python scripts/profile_hlo.py --train --batch 8 --top 30

echo "### r4 ladder6 done $(date)"
