"""End-to-end test.py pipeline throughput (VERDICT r4 #6).

Times the actual CLI tool — PNG decode -> device -> PNG write — at the
canonical eval geometry (512px, n_feats=24, ratio=4, --sb --out_all) with
the r4+ stack (phase trunk, u8 wire, AUTO layouts, native codec).  The
last measurement was r2-era ("64 images in ~33 s incl ~25 s startup");
the device is ~3x faster since.

Method: ONE CLI process over the big folder; test.py itself reports
steady-state img/s excluding batch 0 (which carries the jit compile /
persistent-cache deserialize).  The r5 first attempt differenced two
process runs of different sizes — rejected: per-process startup over the
relay varies by +-50 s (compile-service queueing, param upload), an order
of magnitude above the 64-image signal, and it read a bogus 0.3 img/s.
In-process per-batch timing has no such term.

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


def run_cli(root: str, ckpt: str, size: int, batch: int):
    """Returns (wall_s, total_img_s, steady_img_s) for one test.py run."""
    argv = [sys.executable, os.path.join(REPO, "test.py"),
            "--dataroot", root, "--name", "e2e",
            "--checkpoints_dir", ckpt,
            "--results_dir", os.path.join(WORK, "results"),
            "--model", "dec_vit", "--dataset_mode", "dec_vit",
            "--model_G", "iid_hlgvit_crs_gd4_cfs_v3",
            "--n_feats", "24", "--loadSize", str(size // 2),
            "--patch_size", str(size // 16), "--num_heads", "4",
            "--hidden_dim_ratio", "4", "--batchSize", str(batch),
            "--compute_dtype", "bfloat16",
            "--sb", "--out_all", "--which_epoch", "32",
            "--how_many", "100000"]
    t0 = time.perf_counter()
    out = subprocess.run(argv, check=True, cwd=REPO,
                         stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
                         text=True).stdout
    wall = time.perf_counter() - t0
    import re
    m = re.search(r"\(([\d.]+) img/s\)(?: \(steady ([\d.]+) img/s)?", out)
    total = float(m.group(1)) if m else float("nan")
    steady = float(m.group(2)) if m and m.group(2) else float("nan")
    return wall, total, steady


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_small", type=int, default=8)   # kept for CLI compat
    ap.add_argument("--n_big", type=int, default=72)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    ckpt = make_ckpt(args.size)
    big = make_data(args.n_big, args.size)

    # run 1 populates the persistent compile cache; run 2 is the receipt
    # (its batch 0 still pays the cache deserialize + param upload, which
    # the steady figure excludes by construction)
    run_cli(big, ckpt, args.size, args.batch)
    wall, total, steady = run_cli(big, ckpt, args.size, args.batch)
    startup = (wall - args.n_big / steady) if steady == steady else None
    print(json.dumps({
        "metric": "test_py_e2e_images_per_sec",
        "value": round(steady, 2), "unit": "img/s",
        "total_incl_startup": round(total, 2),
        "wall_s": round(wall, 1), "n": args.n_big, "batch": args.batch,
        "startup_s": round(startup, 1) if startup is not None else None,
        "dtype": "bfloat16",
    }), flush=True)


if __name__ == "__main__":
    main()
