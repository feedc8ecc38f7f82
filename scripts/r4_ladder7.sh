#!/bin/bash
# Round-4 ladder 7: the remaining unmeasured device items after ladder6.
#   0. Same-session dense-vs-flash MRF A/B: ladder6 showed +-12% session
#      variance (clamped 13.02 then 10.64; masks-off 11.32), so the
#      flash-MRF win needs a back-to-back dense receipt.
#   1. deform-conv number (VERDICT r3 #6) — monotonic-window timing.
#   2. AUTO-layout A/B (VERDICT r3 #8) — input/output edge copies.
#   3. Inference HLO profile at b8 trunk-on — the next-sink receipt.
#   4. bench.py — warms the driver's program in the fresh (post-VM-restart)
#      compile cache so the official end-of-round run is cache-hot.
#   setsid nohup bash scripts/r4_ladder7.sh > /tmp/r4_ladder7.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
STAMP() { date +%H:%M:%S; }
R() { echo "=== $(STAMP) $*"; "$@" 2>&1; echo "=== rc=$?"; }

echo "### r4 ladder7 start $(date)"

# 0a. Dense scan ID-MRF (kernel off) — back-to-back with 0b.
R env CFEN_PALLAS_MRF=0 python bench_train.py --batch 8 --remat
# 0b. flash-MRF clamped (cache-hot from ladder6).
R python bench_train.py --batch 8 --remat

R python scripts/bench_deform.py

R python scripts/bench_layout.py --batch 8

R python scripts/profile_hlo.py --batch 8 --top 30

R python bench.py

echo "### r4 ladder7 done $(date)"
