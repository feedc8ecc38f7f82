"""End-to-end test.py pipeline throughput (VERDICT r4 #6).

Times the actual CLI tool — PNG decode -> device -> PNG write — at the
canonical eval geometry (512px, n_feats=24, ratio=4, --sb --out_all) with
the r4+ stack (phase trunk, u8 wire, AUTO layouts, native codec).  The
last measurement was r2-era ("64 images in ~33 s incl ~25 s startup");
the device is ~3x faster since.

Method: startup (param upload + cached-executable reload over the relay)
dominates a single short run, so two runs of different sizes are
differenced — steady img/s = (n_big - n_small) / (t_big - t_small) — after
a warmup run populates the XLA compile cache.

    python scripts/bench_e2e.py [--n_small 8] [--n_big 72] [--batch 8]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WORK = "/tmp/bench_e2e"


def make_data(n: int, size: int, seed: int = 0) -> str:
    from PIL import Image
    root = os.path.join(WORK, f"data{n}")
    hazy = os.path.join(root, "hazy")
    if os.path.isdir(hazy) and len(os.listdir(hazy)) == n:
        return root
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(hazy)
    r = np.random.RandomState(seed)
    base = (r.rand(size, size, 3) * 255).astype(np.uint8)
    for i in range(n):
        img = np.roll(base, i * 7, axis=1)   # distinct but cheap to make
        Image.fromarray(img).save(os.path.join(hazy, f"img_{i:03d}.png"))
    return root


def make_ckpt(size: int) -> str:
    import jax
    from cfen_vit_tpu.config import Config
    from cfen_vit_tpu.models.registry import generator_spec
    from cfen_vit_tpu.models.generator import (generator_init,
                                               generator_forward)
    from cfen_vit_tpu.train.checkpoint import save_net
    ckpt = os.path.join(WORK, "ckpt")
    marker = os.path.join(ckpt, "e2e", "32_net_G.msgpack")
    alt = os.path.join(ckpt, "e2e")
    if os.path.isdir(alt) and any("32_net_G" in f for f in os.listdir(alt)):
        return ckpt
    cfg = Config(dataroot="/tmp", name="e2e", checkpoints_dir=ckpt,
                 n_feats=24, loadSize=size // 2, patch_size=size // 16,
                 num_heads=4, hidden_dim_ratio=4, isTrain=False, sb=True,
                 phase="test", which_epoch="32")
    spec = generator_spec(cfg.model_G, cfg)
    params = generator_init(jax.random.PRNGKey(0), spec)
    x = jax.numpy.zeros((1, size, size, 3), jax.numpy.float32)
    _, params = jax.jit(
        lambda p, xx: generator_forward(p, spec, xx, actnorm_init=True)
    )(params, x)
    save_net(cfg, "32", "G", params)
    del marker
    return ckpt


def run_cli(root: str, ckpt: str, size: int, batch: int) -> float:
    argv = [sys.executable, os.path.join(REPO, "test.py"),
            "--dataroot", root, "--name", "e2e",
            "--checkpoints_dir", ckpt,
            "--results_dir", os.path.join(WORK, "results"),
            "--model", "dec_vit", "--dataset_mode", "dec_vit",
            "--model_G", "iid_hlgvit_crs_gd4_cfs_v3",
            "--n_feats", "24", "--loadSize", str(size // 2),
            "--patch_size", str(size // 16), "--num_heads", "4",
            "--hidden_dim_ratio", "4", "--batchSize", str(batch),
            "--sb", "--out_all", "--which_epoch", "32",
            "--how_many", "100000"]
    t0 = time.perf_counter()
    subprocess.run(argv, check=True, cwd=REPO,
                   stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    return time.perf_counter() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_small", type=int, default=8)
    ap.add_argument("--n_big", type=int, default=72)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    ckpt = make_ckpt(args.size)
    small = make_data(args.n_small, args.size)
    big = make_data(args.n_big, args.size)

    # warm with the BIG run: it touches every batch shape the small run
    # will see (a first ladder1 attempt warmed with the small run and the
    # next run still hit a ~10 min compile, flipping the difference
    # negative)
    run_cli(big, ckpt, args.size, args.batch)
    t_big = run_cli(big, ckpt, args.size, args.batch)
    t_small = run_cli(small, ckpt, args.size, args.batch)
    n_d = args.n_big - args.n_small
    t_d = t_big - t_small
    steady = n_d / t_d if t_d > 0 else float("nan")
    startup = t_small - args.n_small / steady if steady == steady else None
    print(json.dumps({
        "metric": "test_py_e2e_images_per_sec",
        "value": round(steady, 2), "unit": "img/s",
        "t_small_s": round(t_small, 1), "t_big_s": round(t_big, 1),
        "n_small": args.n_small, "n_big": args.n_big,
        "batch": args.batch,
        "startup_s": round(startup, 1) if startup is not None else None,
        **({"noisy": True} if t_d <= 0 else {}),
    }), flush=True)


if __name__ == "__main__":
    main()
