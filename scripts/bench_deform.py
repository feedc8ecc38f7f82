"""Device benchmark for the XLA-gather deformable conv (VERDICT r3 #6).

BASELINE.json's north star names "a Pallas gather-conv custom-call" as the
replacement for the reference's CUDA extension
(/root/reference/dcn/src/deform_conv_cuda_kernel.cu:190-373). The repo's
earned policy is measure-before-kernel: this script produces the number
that either justifies keeping the XLA gather form (ops/deform_conv.py) or
motivates writing the Pallas kernel.

For each geometry it times the jitted DCNv2 forward and forward+backward
(all 5 grads: x, offset, mask, w, b) and reports achieved GFLOP/s against
the pure-GEMM FLOP count (2*N*OH*OW*K^2*C*O — the useful work; gather and
bilinear arithmetic are overhead), i.e. an "effective MFU" for the op.

Usage: python scripts/bench_deform.py [--iters 30] [--dtype bfloat16]
Prints one JSON line per geometry.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


GEOMETRIES = [
    # (batch, H, W, Cin, Cout, kernel) — DCN papers / mmcv put DCNv2 in
    # backbone stages: mid-resolution, 64-256 channels. The 512px rows
    # bracket what plugging DCN into this repo's level-2/3 trunk would do.
    (8, 128, 128, 64, 64, 3),
    (8, 64, 64, 128, 128, 3),
    (8, 32, 32, 256, 256, 3),
    (4, 256, 256, 48, 48, 3),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["bfloat16", "float32"])
    ap.add_argument("--paths", default="xla,pallas",
                    help="comma list of forward paths to A/B "
                         "(xla = gather form, pallas = one-hot GEMM kernel)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax
    from cfen_vit_tpu.config import enable_compilation_cache
    enable_compilation_cache()
    from cfen_vit_tpu.ops.deform_conv import modulated_deform_conv
    from cfen_vit_tpu.utils.profiling import device_peak_flops

    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    peak = device_peak_flops() or float("nan")

    # A/B both forward paths (r5): the XLA gather form and the Pallas
    # block-local one-hot GEMM kernel (ops/pallas_deform.py). Dispatch is
    # decided at trace time from CFEN_PALLAS_DCN, so each path gets its
    # own freshly-traced jits.
    paths = [p for p in args.paths.split(",") if p]
    for (n, h, w, cin, cout, k) in GEOMETRIES:
        for path in paths:
            os.environ["CFEN_PALLAS_DCN"] = "1" if path == "pallas" else "0"
            _bench_one(args, n, h, w, cin, cout, k, dt, peak, path)
    os.environ.pop("CFEN_PALLAS_DCN", None)


def _bench_one(args, n, h, w, cin, cout, k, dt, peak, path):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax
    from cfen_vit_tpu.ops.deform_conv import modulated_deform_conv

    if True:
        r = np.random.RandomState(0)
        x = jnp.asarray(r.randn(n, h, w, cin), dt)
        # modest offsets (like a trained conv_offset_mask predicts)
        off = jnp.asarray(r.randn(n, h, w, 2 * k * k) * 2.0, dt)
        mask = jnp.asarray(r.rand(n, h, w, k * k), dt)
        wt = jnp.asarray(r.randn(k, k, cin, cout) * 0.05, dt)
        b = jnp.zeros((cout,), dt)

        def loss(x, o, m, w, b):
            return jnp.sum(modulated_deform_conv(
                x, o, m, w, b, 1, 1, 1).astype(jnp.float32) ** 2)

        grad = jax.grad(loss, argnums=(0, 1, 2, 3, 4))

        # Timing at ~50us-op granularity over the axon relay: a Python
        # dispatch loop reported >100% MFU (the per-call path never touches
        # the device synchronously), so instead run N data-dependent
        # iterations inside ONE jitted lax.scan (carry perturbs x by
        # 1e-30*result — unfoldable, forces serial execution) and
        # difference two window sizes to cancel the constant relay RTT.
        def chain_fwd(n):
            def body(xc, _):
                y = modulated_deform_conv(xc, off, mask, wt, b, 1, 1, 1)
                return xc + jnp.asarray(1e-30, dt) * y, None
            def run(x0):
                return lax.scan(body, x0, None, length=n)[0]
            return jax.jit(run)

        def chain_bwd(n):
            # All FIVE grads must feed the carry or XLA dead-code-eliminates
            # the offset/mask/w/b backward dots (advisor r4, verified by HLO
            # dot count): fold the non-x grads in as scalar reductions.
            def body(xc, _):
                gx, go, gm, gw, gb = grad(xc, off, mask, wt, b)
                s = (jnp.sum(go) + jnp.sum(gm) + jnp.sum(gw)
                     + jnp.sum(gb)).astype(dt)
                return xc + jnp.asarray(1e-30, dt) * (gx + s), None
            def run(x0):
                return lax.scan(body, x0, None, length=n)[0]
            return jax.jit(run)

        def timeit(mk):
            small, big = args.iters, args.iters * 5
            fns = {n: mk(n) for n in (small, big)}
            for f in fns.values():           # compile + warm
                jax.block_until_ready(f(x))
            med = {}
            for n, f in fns.items():
                windows = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    jax.block_until_ready(f(x))
                    windows.append(time.perf_counter() - t0)
                med[n] = sorted(windows)[1]
            # Guard against a noise-dominated difference (advisor r4): with
            # the documented +-12% relay variance a 5x window ratio can go
            # non-positive for very cheap ops; flag instead of emitting a
            # negative/absurd rate.
            noisy = med[big] <= med[small] * 1.05
            return (med[big] - med[small]) / (big - small), noisy

        t_fwd, noisy_f = timeit(chain_fwd)
        t_bwd, noisy_b = timeit(chain_bwd)
        gemm_flops = 2.0 * n * h * w * k * k * cin * cout
        print(json.dumps({
            "geometry": f"{n}x{h}x{w}x{cin}->{cout} k{k}",
            "path": path,
            "dtype": args.dtype,
            "fwd_ms": round(t_fwd * 1e3, 3),
            "fwd_bwd_ms": round(t_bwd * 1e3, 3),
            "gemm_gflops": round(gemm_flops / 1e9, 2),
            "fwd_eff_gflops": round(gemm_flops / t_fwd / 1e9, 1),
            "fwd_eff_mfu_pct": round(100 * gemm_flops / t_fwd / peak, 2),
            **({"noisy": True} if (noisy_f or noisy_b) else {}),
        }), flush=True)


if __name__ == "__main__":
    main()
