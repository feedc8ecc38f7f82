"""Overfit receipt: prove the GAN trainer OPTIMIZES, not just steps.

(VERDICT r4 #3: "nobody has ever watched this trainer learn" — the step is
equivalence-tested to ~1e-12 and traced finite for 31 steps, but no run
showed losses trending down or PSNR(fake_A, clear) improving.)

Builds a tiny FIXED set of synthetic hazy/clear pairs with a physically
sensible haze model (B = A*t + atm*(1-t), smooth per-image transmission;
R = A, S = luma(A) as intrinsic-decomposition stand-ins for the dataset's
precomputed retinex targets), then runs the full reference-faithful GAN
step (train/trainer.py) on it and logs the G/D losses and PSNR(fake_A,
real_A) trajectory.  Done = G loss and PSNR trend the right way.

    python scripts/train_overfit.py --steps 400 --batch 8 --size 512 \
        --remat                  # device receipt (BASELINE.md table)

The CPU-tiny 50-step variant is tests/test_train_overfit.py (nightly).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_overfit_set(pairs: int, size: int, seed: int = 0):
    """Fixed synthetic hazy/clear pairs, u8-quantized (rides the u8 wire).

    Clear images are low-frequency color fields with a few hard-edged
    rectangles (so there is real structure to recover); haze follows the
    atmospheric scattering model with a smooth transmission map."""
    r = np.random.RandomState(seed)
    cell = max(4, size // 16)

    def lowfreq(c, lo=0.0, hi=1.0):
        g = r.rand(pairs, size // cell, size // cell, c).astype(np.float32)
        g = np.kron(g, np.ones((1, cell, cell, 1), np.float32))
        return lo + (hi - lo) * g

    clear = lowfreq(3, 0.1, 0.9)
    for i in range(pairs):                      # hard-edged structure
        for _ in range(6):
            y, x = r.randint(0, size - size // 4, 2)
            h, w = r.randint(size // 8, size // 4, 2)
            clear[i, y:y + h, x:x + w] = r.rand(3).astype(np.float32)
    t = 0.25 + 0.55 * lowfreq(1)                # transmission in [.25,.8]
    atm = (0.75 + 0.25 * r.rand(pairs, 1, 1, 1)).astype(np.float32)
    hazy = clear * t + atm * (1.0 - t)

    def u8norm(v):
        q = np.rint(np.clip(v, 0, 1) * 255.0).astype(np.uint8)
        return q.astype(np.float32) / 127.5 - 1.0

    luma = (0.299 * clear[..., :1] + 0.587 * clear[..., 1:2]
            + 0.114 * clear[..., 2:])
    return {"A": u8norm(clear), "B": u8norm(hazy),
            "R": u8norm(clear), "S": u8norm(luma)}


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """PSNR on [-1,1] images (peak 2.0); uint8 arrays (the trainer's u8
    input wire, train/trainer.py set_input) are denormalized first."""
    def f(v):
        v = np.asarray(v)
        if v.dtype == np.uint8:
            return v.astype(np.float32) / 127.5 - 1.0
        return v.astype(np.float32)
    mse = float(np.mean((f(a) - f(b)) ** 2))
    return 10.0 * np.log10(4.0 / max(mse, 1e-12))


def run(steps: int, batch: int, size: int, pairs: int, dtype: str,
        remat: bool, log_every: int, lr: float | None = None,
        quiet: bool = False):
    from cfen_vit_tpu.config import Config, enable_compilation_cache
    enable_compilation_cache()
    from cfen_vit_tpu.train.trainer import GanTrainer

    cfg = Config(dataroot="/tmp", name="overfit",
                 checkpoints_dir="/tmp/overfit_ckpt",
                 n_feats=24, loadSize=size // 2, patch_size=size // 16,
                 num_heads=4, hidden_dim_ratio=4, batchSize=batch,
                 pool_size=max(8, batch), sb=True, isTrain=True,
                 compute_dtype=dtype, remat=remat, remat_mode="branch")
    if lr is not None:
        cfg.lr = lr
    tr = GanTrainer(cfg)
    tr.setup(cfg)
    data = make_overfit_set(pairs, size)

    hist = []
    idx = np.arange(pairs)
    for step in range(steps):
        sel = np.take(idx, np.arange(step * batch, (step + 1) * batch)
                      % pairs, axis=0)
        b = {k: v[sel] for k, v in data.items()}
        b["B_paths"] = [f"{i}.png" for i in sel]
        tr.set_input(b)
        tr.optimize_parameters(cfg)
        # losses are scalars (cheap readback) — check EVERY step so the
        # first non-finite term is identified, not a 25-step-later NaN
        # blanket (the r5 device run went NaN between steps 275 and 300)
        losses = tr.get_current_losses()
        bad = [k for k, v in losses.items() if not np.isfinite(float(v))]
        if step % log_every == 0 or step == steps - 1 or bad:
            vis = tr.get_current_visuals()
            p = psnr(vis["fake_A"], vis["real_A"])
            hist.append({"step": step, "psnr": round(p, 3),
                         **{k: round(float(v), 4)
                            for k, v in losses.items()}})
            if not quiet:
                print(json.dumps(hist[-1]), flush=True)
        if bad:
            print(json.dumps({"step": step, "non_finite": bad}),
                  flush=True)
            break
    return hist


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--pairs", type=int, default=8)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--log_every", type=int, default=25)
    args = ap.parse_args()

    hist = run(args.steps, args.batch, args.size, args.pairs, args.dtype,
               args.remat, args.log_every)
    first, last = hist[0], hist[-1]
    print(json.dumps({
        "summary": "train_overfit",
        "steps": last["step"] + 1,
        "G_first": first["G"], "G_last": last["G"],
        "psnr_first": first["psnr"], "psnr_last": last["psnr"],
        "psnr_best": max(h["psnr"] for h in hist),
        # -inf "decreases" numerically but is a blow-up, not optimization
        # (the r5 ladder3 run reported g_decreased=true with G_last=-inf)
        "g_decreased": bool(np.isfinite(last["G"])
                            and last["G"] < first["G"]),
        "psnr_improved": bool(np.isfinite(last["psnr"])
                              and last["psnr"] > first["psnr"]),
        "finished": bool(last["step"] + 1 >= args.steps),
    }), flush=True)


if __name__ == "__main__":
    main()
