#!/bin/bash
# Round-4 device ladder, phase 3: flash-MRF sweep with the fixed bwd SMEM
# block mapping (the r4 phase-1 sweep died at lowering for SQ<=64 and
# VMEM-OOM'd at SQ=128), the b10/b12 re-measure with the median-of-3
# monotonic-clock bench (the b12 wall-clock artifact), and the serving
# device-capacity run that phase 2 missed (no checkpoint on disk).
#   setsid nohup bash scripts/r4_device_ladder3.sh > /tmp/r4_ladder3.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
STAMP() { date +%H:%M:%S; }
R() { echo "=== $(STAMP) $*"; timeout 3600 "$@" 2>&1; echo "=== rc=$?"; }

echo "### r4 ladder3 start $(date)"

# 1. Re-measure the dip batches with the hardened timing (cache-hit, fast).
R python bench.py --batch 12
R python bench.py --batch 10

# 2. flash-MRF train sweep (each config is a fresh ~10 min remote compile).
for SQ in 32 64 16; do
  echo "--- CFEN_PALLAS_MRF=1 SQ=$SQ"
  R env CFEN_PALLAS_MRF=1 CFEN_MRF_SQ=$SQ python bench_train.py --batch 8 --remat
done
# SQ=128 OOM'd scoped vmem by 384K in phase 1; retry with the limit raised
# (proto-backed xla_* flags are forwarded per-compile through the tunnel).
echo "--- CFEN_PALLAS_MRF=1 SQ=128 scoped-vmem 24M"
R env CFEN_PALLAS_MRF=1 CFEN_MRF_SQ=128 \
  XLA_FLAGS=--xla_tpu_scoped_vmem_limit_kib=24576 \
  python bench_train.py --batch 8 --remat

# 3. Serving: create a canonical-geometry checkpoint (CPU, structure-only),
#    then the windowed device-utilization runs phase 2 intended.
env PYTHONPATH= JAX_PLATFORMS=cpu python - <<'EOF'
import jax
from cfen_vit_tpu.config import Config
from cfen_vit_tpu.models.registry import generator_spec
from cfen_vit_tpu.models.generator import generator_init
from cfen_vit_tpu.train.checkpoint import save_net
cfg = Config(name="srv512", checkpoints_dir="checkpoints", n_feats=24,
             hidden_dim_ratio=4, isTrain=False)
spec = generator_spec(cfg.model_G, cfg)
params = generator_init(jax.random.PRNGKey(0), spec)
print("saved", save_net(cfg, "1", "G", params))
EOF
setsid nohup python serve.py --name srv512 --checkpoints_dir checkpoints \
  --dataroot /tmp --which_epoch 1 --n_feats 24 --hidden_dim_ratio 4 \
  --port 8612 > /tmp/r4_serve.log 2>&1 &
echo $! > /tmp/r4_serve.pid
for i in $(seq 1 360); do
  curl -s -m 2 http://127.0.0.1:8612/healthz >/dev/null 2>&1 && break
  sleep 5
done
sleep 2
R python scripts/bench_serve.py --url http://127.0.0.1:8612 --clients 8 --requests 64
R python scripts/bench_serve.py --url http://127.0.0.1:8612 --clients 16 --requests 96
echo "--- healthz final"; curl -s -m 5 http://127.0.0.1:8612/healthz; echo
kill "$(cat /tmp/r4_serve.pid)" 2>/dev/null

echo "### r4 ladder3 done $(date)"
