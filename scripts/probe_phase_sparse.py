"""Op-level headroom probe for the structural-zero attack (VERDICT r4 #3).

The dense phase kernels multiply known zeros (~45% of program FLOPs at
b8).  Before writing a sparse phase-conv kernel, establish per-op:
  1. is the dense phase conv MXU-bound at all?  (k1 same-IO control)
  2. does a "packed-sparse" form — concat the valid phase slices of the
     shifted inputs, then ONE lane-healthy 1x1 GEMM — beat the dense
     phase conv op-for-op, including its concat materialization cost?

Shapes = the band's real ops at b8: ResBlock k3 48->48 on [8,256,256,48]
(dense 432-wide contraction, useful 192-wide = 2.25x) and the tail conv7
phase form (K=5 cells, dense 1200-wide, useful 784-wide = 1.53x).

Chain-timed (scan + window differencing; plain loops don't serialize on
the axon relay).
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

B, H, W, C = 8, 256, 256, 48
CP = 12            # true full-res channels per phase
DT = jnp.bfloat16
SMALL, BIG = 10, 50

_DN = lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                 ("NHWC", "HWIO", "NHWC"))


def chain_time(name, body, x0):
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
              f"{str(e).splitlines()[0][:160]}", flush=True)
        return None


def conv(x, w, pad):
    return lax.conv_general_dilated(x, w, (1, 1),
                                    [(pad, pad), (pad, pad)], (1, 1),
                                    (1, 1), _DN)


def valid_pairs(k_cells: int, r: int):
    """Per 1-D cell t (centered), the valid (pi, po) pairs of a radius-r
    full-res conv in phase space: |2t + pi - po| <= r."""
    t0 = (k_cells - 1) // 2
    out = []
    for t in range(k_cells):
        pairs = [(pi, po) for pi in range(2) for po in range(2)
                 if abs(2 * (t - t0) + pi - po) <= r]
        out.append(pairs)
    return out


def packed_sparse(x, cells: int, r: int, w1x1):
    """Concat the valid (cell, pi) phase slices of the shifted input, then
    one 1x1 GEMM.  w1x1: [1, 1, V, C] with V = total packed width."""
    t0 = (cells - 1) // 2
    vp = valid_pairs(cells, r)
    pieces = []
    xp = jnp.pad(x, ((0, 0), (t0, t0), (t0, t0), (0, 0)))
    for ty in range(cells):
        piy = sorted({pi for pi, _ in vp[ty]})
        for tx in range(cells):
            pix = sorted({pi for pi, _ in vp[tx]})
            sl = xp[:, ty:ty + H, tx:tx + W, :]
            sl = sl.reshape(B, H, W, 2, 2, CP)
            sl = sl[:, :, :, piy][:, :, :, :, pix]
            pieces.append(sl.reshape(B, H, W, -1))
    xcat = jnp.concatenate(pieces, axis=-1)
    return conv(xcat, w1x1, 0), xcat.shape[-1]


def main():
    print(f"devices: {jax.devices()}", flush=True)
    r = np.random.RandomState(0)
    x = jnp.asarray(r.randn(B, H, W, C), DT)
    eps = jnp.asarray(1e-30, DT)

    for (name, cells, rad) in (("k3_resblock", 3, 1), ("k7_tail", 5, 3)):
        w = jnp.asarray(r.randn(cells, cells, C, C) * 0.05, DT)
        w1 = jnp.asarray(r.randn(1, 1, C, C) * 0.05, DT)
        pad = (cells - 1) // 2

        chain_time(f"{name}_dense_k{cells}",
                   lambda xc, w=w, pad=pad: xc + eps * conv(xc, w, pad), x)
        chain_time(f"{name}_1x1_same_io",
                   lambda xc, w1=w1: xc + eps * conv(xc, w1, 0), x)

        vp = valid_pairs(cells, rad)
        vy = sum(len(sorted({pi for pi, _ in vp[t]})) for t in range(cells))
        v_total = 0
        for ty in range(cells):
            for tx in range(cells):
                ny = len({pi for pi, _ in vp[ty]})
                nx = len({pi for pi, _ in vp[tx]})
                v_total += ny * nx * CP
        wp = jnp.asarray(r.randn(1, 1, v_total, C) * 0.05, DT)
        print(f"# {name}: dense width {cells*cells*C}, packed {v_total} "
              f"({cells*cells*C/v_total:.2f}x fewer MACs)", flush=True)
        chain_time(f"{name}_packed_sparse",
                   lambda xc, wp=wp, cells=cells, rad=rad:
                   xc + eps * packed_sparse(xc, cells, rad, wp)[0], x)

    print("probe done", flush=True)


if __name__ == "__main__":
    main()
