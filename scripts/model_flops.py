"""Precompute the useful-MODEL FLOPs basis for dual-basis MFU (VERDICT r4 #2).

The phase-space formulation inflates the compiled program's cost_analysis
FLOPs with structural parity-mismatch zeros (BASELINE.md: 106.5 -> 154.2
G/img at 512px infer), so MFU quoted on the program basis overstates useful
utilization.  The honest second basis is the DENSE path's compiled FLOP
count: CFEN_PHASE_SPACE=0 CFEN_PHASE_TRUNK=0 (and CFEN_PALLAS_MRF=0 for
training, so the reference-faithful dense ID-MRF dots are counted rather
than opaque custom-calls).  That number is a constant of the model geometry,
so it is computed ONCE here and committed to model_flops.json; bench.py /
bench_train.py just look it up (no extra compile in the official bench run).

Usage:
    python scripts/model_flops.py --mode infer --batch 8 [--size 512]
    python scripts/model_flops.py --mode train --batch 8 --remat

Runs on whatever backend is live (TPU numbers and CPU numbers agree: the
count is an HLO pass over convs/dots, which are backend-invariant).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "model_flops.json")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["infer", "train"], required=True)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["bfloat16", "float32"])
    ap.add_argument("--branches", default="d", choices=["d", "all"])
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--remat_mode", default="branch")
    args = ap.parse_args()

    # dense basis: force every structurally-padded / custom-call path off
    # BEFORE any tracing happens
    os.environ["CFEN_PHASE_SPACE"] = "0"
    os.environ["CFEN_PHASE_TRUNK"] = "0"
    os.environ["CFEN_PALLAS_MRF"] = "0"

    from cfen_vit_tpu.config import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    if args.mode == "infer":
        from dataclasses import replace
        from cfen_vit_tpu.models.registry import generator_spec
        from cfen_vit_tpu.models.generator import (generator_init,
                                                   generator_forward)
        dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
        spec = replace(generator_spec("iid_hlgvit_crs_gd4_cfs_v3"),
                       n_feats=24, hidden_dim_ratio=4,
                       load_size=args.size // 2,
                       patch_size=args.size // 16, num_heads=4)
        params = generator_init(jax.random.PRNGKey(0), spec)
        if dtype == jnp.bfloat16:
            params = jax.tree_util.tree_map(
                lambda a: a.astype(jnp.bfloat16)
                if a.dtype == jnp.float32 else a, params)
        x = jnp.asarray(np.zeros((args.batch, args.size, args.size, 3)),
                        dtype)
        if args.branches == "d":
            fn = lambda p, xx: generator_forward(p, spec, xx)["d"]  # noqa: E731
        else:
            fn = lambda p, xx: generator_forward(p, spec, xx)  # noqa: E731
        compiled = jax.jit(fn).lower(params, x).compile()
        flops = float(compiled.cost_analysis().get("flops", 0.0))
        key = (f"infer_s{args.size}_b{args.batch}_{args.branches}"
               f"_{args.dtype}")
    else:
        from cfen_vit_tpu.config import Config
        from cfen_vit_tpu.train.trainer import GanTrainer
        cfg = Config(dataroot="/tmp", name="model_flops",
                     checkpoints_dir="/tmp/model_flops_ckpt",
                     n_feats=24, loadSize=args.size // 2,
                     patch_size=args.size // 16, num_heads=4,
                     hidden_dim_ratio=4, batchSize=args.batch, pool_size=50,
                     sb=True, isTrain=True, compute_dtype=args.dtype,
                     remat=args.remat, remat_mode=args.remat_mode)
        tr = GanTrainer(cfg)
        tr.setup(cfg)
        rng = np.random.RandomState(0)
        s = args.size
        batch = {
            "B": rng.rand(args.batch, s, s, 3).astype(np.float32) * 2 - 1,
            "A": rng.rand(args.batch, s, s, 3).astype(np.float32) * 2 - 1,
            "R": rng.rand(args.batch, s, s, 3).astype(np.float32) * 2 - 1,
            "S": rng.rand(args.batch, s, s, 1).astype(np.float32) * 2 - 1,
            "B_paths": [f"{i}.png" for i in range(args.batch)],
        }
        tr.set_input(batch)
        # Build WITHOUT executing a step: the dense-path b8 512px train
        # program does not fit v5e HBM (compile-time buffer-assignment
        # RESOURCE_EXHAUSTED, r5 ladder2) — and FLOPs/img is batch-linear,
        # so the committed basis is computed at --batch 4 (the dense path's
        # own r2 operating point) and looked up batch-agnostically.
        tr.init_state({k: np.asarray(v) for k, v in tr._batch.items()})
        tr._step_fn = tr._make_step()
        comp = tr._step_fn.lower(
            tr.state, tr._batch, tr.vgg,
            jnp.asarray(tr.lr, jnp.float32)).compile()
        flops = float(comp.cost_analysis().get("flops", 0.0))
        key = (f"train_s{args.size}_b{args.batch}_{args.dtype}"
               f"_{'remat-' + args.remat_mode if args.remat else 'noremat'}")

    table = {}
    if os.path.exists(OUT):
        with open(OUT) as fh:
            table = json.load(fh)
    table[key] = {
        "gflops_per_img": round(flops / args.batch / 1e9, 2),
        "basis": "dense path: CFEN_PHASE_SPACE=0 CFEN_PHASE_TRUNK=0 "
                 "CFEN_PALLAS_MRF=0, compiled cost_analysis",
        "backend": jax.devices()[0].device_kind,
    }
    with open(OUT, "w") as fh:
        json.dump(table, fh, indent=1, sort_keys=True)
    print(json.dumps({key: table[key]}))


if __name__ == "__main__":
    main()
