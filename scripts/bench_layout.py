"""A/B: jit with AUTO input/output layouts vs default (VERDICT r3 #8).

The r4 b8 trunk-on profile shows ~1.4 ms/step of input/output edge copies
(copy.2930 [8,512,512,3] {2,1,3,0}->{0,3,2,1} 0.45 ms, copy.3334 0.30,
copy.3333 0.28, plus the [8,260,260,48] join copy) — XLA re-laying the
row-major host-transfer layout into its preferred one INSIDE the timed
program.  With `in_shardings=Format(Layout.AUTO)` the compiler picks the
input layout and `jax.device_put` commits the array in it up front, moving
that conversion out of the step (in serving it rides the upload, which
depth-2 pipelining already overlaps).

Prints one JSON line per arm.  Usage: python scripts/bench_layout.py
[--batch 8] [--iters 20]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--size", type=int, default=512)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from dataclasses import replace
    from jax.experimental.layout import Format, Layout
    from cfen_vit_tpu.config import enable_compilation_cache
    enable_compilation_cache()
    from cfen_vit_tpu.models.registry import generator_spec
    from cfen_vit_tpu.models.generator import (generator_init,
                                               generator_forward)

    spec = replace(generator_spec("iid_hlgvit_crs_gd4_cfs_v3"),
                   n_feats=24, hidden_dim_ratio=4,
                   load_size=args.size // 2, patch_size=args.size // 16,
                   num_heads=4)
    params = generator_init(jax.random.PRNGKey(0), spec)
    params = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if a.dtype == jnp.float32 else a, params)
    x_host = np.asarray(
        np.random.RandomState(0).rand(args.batch, args.size, args.size, 3)
        * 2 - 1, np.float32).astype(jnp.bfloat16)

    def fn(p, xx):
        return generator_forward(p, spec, xx)["d"]

    def timeit(fwd, p, xx):
        out = fwd(p, xx)
        jax.block_until_ready(out)
        windows = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = fwd(p, xx)
            jax.block_until_ready(out)
            windows.append(time.perf_counter() - t0)
        return sorted(windows)[1] / args.iters

    # arm 1: default layouts
    fwd0 = jax.jit(fn)
    dt0 = timeit(fwd0, params, jnp.asarray(x_host))
    print(json.dumps({"arm": "default", "batch": args.batch,
                      "ms_step": round(dt0 * 1e3, 2),
                      "img_s": round(args.batch / dt0, 1)}), flush=True)

    # arm 2: AUTO input layouts, inputs committed in the chosen layout
    auto = Format(Layout.AUTO)
    fwd1 = jax.jit(fn, in_shardings=auto, out_shardings=auto)
    lowered = fwd1.lower(params, x_host)
    compiled = lowered.compile()
    in_fmt = compiled.input_formats
    p_dev, x_dev = jax.device_put((params, x_host), in_fmt[0])
    dt1 = timeit(compiled, p_dev, x_dev)
    print(json.dumps({"arm": "auto_layout", "batch": args.batch,
                      "ms_step": round(dt1 * 1e3, 2),
                      "img_s": round(args.batch / dt1, 1),
                      "speedup_pct": round(100 * (dt0 / dt1 - 1), 1)}),
          flush=True)


if __name__ == "__main__":
    main()
