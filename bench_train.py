"""Training-step benchmark: full GAN step (G+pools+3xD) on synthetic data.

    python bench_train.py [--batch 2] [--size 512] [--iters 10] \
        [--dtype bfloat16] [--remat]

Prints one JSON line with steps/sec and imgs/sec. The reference has no
training throughput numbers (and sleeps 160s between epochs); this
establishes ours.
"""

import argparse
import json
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["bfloat16", "float32"])
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--remat_mode", default="branch",
                    choices=["level", "level_dots", "vit", "branch"])
    ap.add_argument("--mrf_block", type=int, default=0,
                    help="ID-MRF streaming block size (0 = default 2048)")
    ap.add_argument("--float_wire", action="store_true",
                    help="un-quantized synthetic floats (disables the "
                         "lossless uint8 input wire the loader path gets)")
    ap.add_argument("--device_input", action="store_true",
                    help="commit the batch on-device once and skip "
                         "set_input in the timed loop: isolates the DEVICE "
                         "step for A/Bs (the default loader-realistic mode "
                         "includes ~0.2-0.4 s/step of host u8-wire work + "
                         "relay upload whose day-to-day weather swings "
                         "exceeded the r5 flash-vs-dense margin)")
    args = ap.parse_args()
    if args.mrf_block:
        import os
        os.environ["CFEN_MRF_BLOCK"] = str(args.mrf_block)

    from cfen_vit_tpu.config import Config, enable_compilation_cache
    enable_compilation_cache()
    from cfen_vit_tpu.train.trainer import GanTrainer

    cfg = Config(dataroot="/tmp", name="bench_train",
                 checkpoints_dir="/tmp/bench_train_ckpt",
                 n_feats=24, loadSize=args.size // 2,
                 patch_size=args.size // 16, num_heads=4,
                 hidden_dim_ratio=4, batchSize=args.batch, pool_size=50,
                 sb=True, isTrain=True, compute_dtype=args.dtype,
                 remat=args.remat, remat_mode=args.remat_mode)
    tr = GanTrainer(cfg)
    tr.setup(cfg)
    rng = np.random.RandomState(0)
    s = args.size

    def img(c):
        # loader-realistic data is u8/127.5-1 (data/dataset.py), which
        # rides the lossless uint8 wire; --float_wire keeps raw floats
        x = rng.rand(args.batch, s, s, c).astype(np.float32) * 2 - 1
        if args.float_wire:
            return x
        return np.rint((x + 1) * 127.5).astype(np.uint8) \
            .astype(np.float32) / 127.5 - 1.0

    batch = {
        "B": img(3), "A": img(3), "R": img(3), "S": img(1),
        "B_paths": [f"{i}.png" for i in range(args.batch)],
    }
    tr.set_input(batch)
    t0 = time.perf_counter()
    tr.optimize_parameters(cfg)           # init + compile + first step
    compile_s = time.perf_counter() - t0
    if args.device_input:
        import jax
        tr._batch = jax.device_put(tr._batch)
        jax.block_until_ready(tr._batch)

    # median of 3 windows on the monotonic clock (see bench.py: a wall
    # clock step once produced an impossible img/s reading mid-ladder)
    windows = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(args.iters):
            if not args.device_input:
                tr.set_input(batch)
            tr.optimize_parameters(cfg)
        float(tr.get_current_losses()["G"])   # sync
        windows.append((time.perf_counter() - t0) / args.iters)
    dt = sorted(windows)[1]

    # train-step roofline (VERDICT r1 #6): cost-analysis FLOPs of the one
    # jitted GAN step (G fwd+bwd, 3 VGG towers, IDMRF, 3 Ds fwd+bwd, Adam)
    flops = 0.0
    try:
        import jax
        import jax.numpy as jnp
        comp = tr._step_fn.lower(
            tr.state, tr._batch, tr.vgg,
            jnp.asarray(tr.lr, jnp.float32)).compile()
        flops = float(comp.cost_analysis().get("flops", 0.0))
    except Exception as e:  # cost analysis is best-effort
        print(f"# cost_analysis unavailable: {e}", file=sys.stderr)

    from cfen_vit_tpu.utils.profiling import mfu_line, model_flops_lookup
    print(json.dumps({
        "metric": f"{args.size}x{args.size}_gan_train_step",
        "value": round(dt, 4), "unit": "s/step",
        "imgs_per_sec": round(args.batch / dt, 2),
        "batch": args.batch, "dtype": args.dtype, "remat": args.remat,
        "remat_mode": args.remat_mode if args.remat else "none",
        "mrf_block": args.mrf_block or 2048,
        "device_input": bool(args.device_input),
        "compile_s": round(compile_s, 1),
        "gflops_per_img": round(flops / args.batch / 1e9, 1),
    }))
    if flops:
        # dual-basis MFU (VERDICT r4 #2): program basis (this compile's
        # cost_analysis — includes phase structural zeros, and misses the
        # flash-MRF custom-call FLOPs) + useful-model basis (dense-path
        # compile, precomputed by scripts/model_flops.py)
        line = mfu_line(flops, dt).replace("MFU=", "mfu_prog=")
        model_g = model_flops_lookup(
            f"train_s{args.size}_b{args.batch}_{args.dtype}_"
            + (f"remat-{args.remat_mode}" if args.remat else "noremat"))
        if model_g:
            line += (" " + mfu_line(model_g * 1e9 * args.batch, dt)
                     .replace("achieved=", "model_achieved=")
                     .replace("MFU=", "mfu_model=")
                     + f" model_flops/img={model_g:.1f}G")
        print("# " + line, file=sys.stderr)
    g = float(tr.get_current_losses()["G"])
    print(f"# G loss {g:.3f} (finite: {np.isfinite(g)})", file=sys.stderr)


if __name__ == "__main__":
    main()
