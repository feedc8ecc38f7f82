"""Decompose the 145 ms XLA deform-conv forward (4x256x256x48 k3) into its
pieces to find the actual sink before writing the Pallas kernel (VERDICT
r4 #1).  probe_gather.py showed a bare take_along_axis of the same data
volume runs at ~300 GB/s, so 145 ms is NOT an intrinsic gather floor.

All timings use the scan-chain + window-differencing method from
scripts/bench_deform.py: a plain dispatch loop through the axon relay does
not serialize even with block_until_ready (this probe's first version read
0.029 ms for a 36 ms op), so each piece runs as N data-dependent iterations
inside ONE jitted lax.scan, and two window sizes are differenced to cancel
the constant relay RTT.

Run detached: setsid nohup python scripts/probe_deform_decomp.py > log &
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from cfen_vit_tpu.config import enable_compilation_cache
enable_compilation_cache()
from cfen_vit_tpu.ops.deform_conv import modulated_deform_conv, \
    _sample_patches

N, H, W, C, O, K = 4, 256, 256, 48, 48, 3
DT = jnp.bfloat16
SMALL, BIG = 8, 40


def chain_time(name, body, x0):
    """body(carry) -> carry; time per-iteration cost via window differencing."""
    try:
        def mk(n):
            def run(x):
                return lax.scan(lambda c, _: (body(c), None), x,
                                None, length=n)[0]
            return jax.jit(run)
        fns = {n: mk(n) for n in (SMALL, BIG)}
        for f in fns.values():
            jax.block_until_ready(f(x0))
        med = {}
        for n, f in fns.items():
            ws = []
            for _ in range(3):
                t0 = time.perf_counter()
                jax.block_until_ready(f(x0))
                ws.append(time.perf_counter() - t0)
            med[n] = sorted(ws)[1]
        dt = (med[BIG] - med[SMALL]) / (BIG - SMALL)
        flag = " NOISY" if med[BIG] <= med[SMALL] * 1.05 else ""
        print(f"TIME {name}: {dt*1e3:.3f} ms{flag}", flush=True)
        return dt
    except Exception as e:  # noqa: BLE001
        print(f"TIME {name}: FAIL {type(e).__name__}: "
              f"{str(e).splitlines()[0][:200]}", flush=True)
        return None


def main():
    print(f"devices: {jax.devices()}", flush=True)
    r = np.random.RandomState(0)
    x = jnp.asarray(r.randn(N, H, W, C), DT)
    off = jnp.asarray(r.randn(N, H, W, 2 * K * K) * 2.0, DT)
    mask = jnp.asarray(r.rand(N, H, W, K * K), DT)
    wt = jnp.asarray(r.randn(K, K, C, O) * 0.05, DT)
    b = jnp.zeros((O,), DT)
    eps = jnp.asarray(1e-30, DT)
    hp, wp = H + 2, W + 2

    # 1. the full forward (ladder8 said ~145 ms)
    chain_time("full_fwd",
               lambda xc: xc + eps * modulated_deform_conv(
                   xc, off, mask, wt, b, 1, 1, 1), x)

    # 2. sampling alone (gather + bilinear combine + coord arith)
    chain_time("sample_patches",
               lambda xc: xc + eps * _sample_patches(
                   xc, off, K, 1, 1, 1).sum(3), x)

    # 3. mask+einsum alone on a materialized patch tensor
    patches = jax.jit(lambda x, o: _sample_patches(x, o, K, 1, 1, 1))(x, off)
    patches = jax.block_until_ready(patches)

    def gemm_body(xc):
        pm = (patches + eps * xc[..., None, :]) * mask[..., None]
        out = jnp.einsum("nhwkc,kco->nhwo", pm, wt.reshape(K * K, C, O),
                         preferred_element_type=jnp.float32).astype(DT)
        return xc + eps * out
    chain_time("mask+einsum", gemm_body, x)

    # 4. one raw batched gather at the exact internal shape:
    #    [N, HP*WP, C], idx [N, OH*OW*K*K, 1] (indices loop-invariant)
    idx = jnp.asarray(r.randint(0, hp * wp, (N, H * W * K * K, 1)),
                      jnp.int32)

    def pad_flat(xc):
        return jnp.pad(xc, ((0, 0), (1, 1), (1, 1), (0, 0))
                       ).reshape(N, hp * wp, C)

    def gather1_body(xc):
        g = jnp.take_along_axis(pad_flat(xc), idx, axis=1)
        return xc + eps * g.reshape(N, H, W, K * K, C).sum(3)
    chain_time("raw_gather_batched_x1", gather1_body, x)

    # 5. the same gather flattened to 2D (batch folded into rows)
    idxf = (idx[..., 0] + (jnp.arange(N, dtype=jnp.int32)
                           * (hp * wp))[:, None]).reshape(-1)[:, None]

    def gather_flat_body(xc):
        xpf = pad_flat(xc).reshape(N * hp * wp, C)
        g = jnp.take_along_axis(
            xpf, jnp.broadcast_to(idxf, (idxf.shape[0], C)), axis=0)
        return xc + eps * g.reshape(N, H, W, K * K, C).sum(3)
    chain_time("raw_gather_flat2d_x1", gather_flat_body, x)

    # 6. 4 gathers + bilinear combine from PRECOMPUTED indices/weights
    y0 = jnp.asarray(r.randint(0, hp - 1, (N, H * W * K * K)), jnp.int32)
    x0 = jnp.asarray(r.randint(0, wp - 1, (N, H * W * K * K)), jnp.int32)
    fy = jnp.asarray(r.rand(N, H * W * K * K, 1), DT)
    fx = jnp.asarray(r.rand(N, H * W * K * K, 1), DT)

    def four_body(xc):
        xp = pad_flat(xc)

        def at(yi, xi):
            return jnp.take_along_axis(xp, (yi * wp + xi)[..., None], axis=1)
        v = ((1 - fy) * (1 - fx) * at(y0, x0)
             + (1 - fy) * fx * at(y0, x0 + 1)
             + fy * (1 - fx) * at(y0 + 1, x0)
             + fy * fx * at(y0 + 1, x0 + 1))
        return xc + eps * v.reshape(N, H, W, K * K, C).sum(3)
    chain_time("four_gathers_combine", four_body, x)

    # 7. coordinate arithmetic alone (floor/clip/valid masks, bf16)
    def coords_body(xc):
        o = (off + eps * xc[..., :1]).reshape(N, H, W, K * K, 2)
        oy = jnp.arange(H, dtype=DT)[:, None, None]
        ox = jnp.arange(W, dtype=DT)[None, :, None]
        ky = jnp.repeat(jnp.arange(K, dtype=DT), K)[None, None, :]
        kx = jnp.tile(jnp.arange(K, dtype=DT), K)[None, None, :]
        ys = (oy - 1 + ky)[None] + o[..., 0] + 1.0
        xs = (ox - 1 + kx)[None] + o[..., 1] + 1.0
        y0 = jnp.floor(ys)
        x0 = jnp.floor(xs)
        s = ((ys - y0) + (xs - x0) + y0 + x0).sum(3)
        return xc + eps * s[..., None]
    chain_time("coord_arith", coords_body, x)

    print("probe done", flush=True)


if __name__ == "__main__":
    main()
