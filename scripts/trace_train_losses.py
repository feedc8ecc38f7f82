"""Per-step loss-component trace for the GAN train step (nan forensics).

Runs the same synthetic-batch training loop bench_train.py times, but
prints every loss component at every step — used to locate which term
goes non-finite first when a dispatch variant (CFEN_PALLAS_MRF /
CFEN_VGG_PS) reports a nan G loss at the end of the r4 device ladder.

    python scripts/trace_train_losses.py [--batch 8] [--steps 31] [--remat]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--steps", type=int, default=31)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--remat", action="store_true")
    args = ap.parse_args()

    import numpy as np
    from cfen_vit_tpu.config import Config, enable_compilation_cache
    enable_compilation_cache()
    from cfen_vit_tpu.train.trainer import GanTrainer

    cfg = Config(dataroot="/tmp", name="bench_train",
                 checkpoints_dir="/tmp/bench_train_ckpt",
                 n_feats=24, loadSize=args.size // 2,
                 patch_size=args.size // 16, num_heads=4,
                 hidden_dim_ratio=4, batchSize=args.batch, pool_size=50,
                 sb=True, isTrain=True, compute_dtype=args.dtype,
                 remat=args.remat, remat_mode="branch")
    tr = GanTrainer(cfg)
    tr.setup(cfg)
    rng = np.random.RandomState(0)
    s = args.size

    def img(c):
        x = rng.rand(args.batch, s, s, c).astype(np.float32) * 2 - 1
        return np.rint((x + 1) * 127.5).astype(np.uint8) \
            .astype(np.float32) / 127.5 - 1.0

    batch = {
        "B": img(3), "A": img(3), "R": img(3), "S": img(1),
        "B_paths": [f"{i}.png" for i in range(args.batch)],
    }
    for step in range(args.steps):
        tr.set_input(batch)
        tr.optimize_parameters(cfg)
        losses = tr.get_current_losses()
        line = " ".join(f"{k}={float(v):.4g}" for k, v in sorted(
            losses.items()))
        print(f"step {step:3d}: {line}", flush=True)
        if not all(np.isfinite(float(v)) for v in losses.values()):
            print("NON-FINITE — stopping", flush=True)
            break


if __name__ == "__main__":
    main()
