"""Probe 2: (a) Mosaic tpu.dynamic_gather (same-shape take_along_axis)
size/dtype limits + throughput; (b) XLA gather cost vs row width (packed
4-neighbor trick).  All chain-timed (plain loops don't serialize on the
axon relay).  Informs the Pallas deform-conv design (VERDICT r4 #1).
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cfen_vit_tpu.config import enable_compilation_cache
enable_compilation_cache()

SMALL, BIG = 10, 50


def chain_time(name, body, x0, per_iter_rows=None):
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
        extra = ""
        if per_iter_rows:
            extra = f" ({per_iter_rows / max(dt, 1e-9) / 1e6:.0f}M rows/s)"
        flag = " NOISY" if med[BIG] <= med[SMALL] * 1.05 else ""
        print(f"TIME {name}: {dt*1e6:.1f} us{extra}{flag}", flush=True)
        return dt
    except Exception as e:  # noqa: BLE001
        print(f"TIME {name}: FAIL {type(e).__name__}: "
              f"{str(e).splitlines()[0][:160]}", flush=True)
        return None


def main():
    print(f"devices: {jax.devices()}", flush=True)
    r = np.random.RandomState(0)

    # (a) in-kernel same-shape dynamic_gather, axis 0 and 1
    for axis in (0, 1):
        for s_rows in (8, 32, 256, 4096, 24576):
            for dt_name, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
                L = 128
                x = jnp.asarray(r.randn(s_rows, L), dt)
                hi = s_rows if axis == 0 else L
                idx = jnp.asarray(r.randint(0, hi, (s_rows, L)), jnp.int32)

                def kern(x_ref, i_ref, o_ref, axis=axis):
                    o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:],
                                                   axis=axis)

                def call(x, idx=idx, kern=kern, s_rows=s_rows, L=L, dt=dt):
                    return pl.pallas_call(
                        kern,
                        out_shape=jax.ShapeDtypeStruct((s_rows, L), dt),
                        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                                  pl.BlockSpec(memory_space=pltpu.VMEM)],
                        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                    )(x, idx)

                chain_time(f"dg_ax{axis}_{s_rows}x{L}_{dt_name}",
                           lambda xc, call=call: xc + jnp.asarray(
                               1e-30, xc.dtype) * call(xc),
                           x, per_iter_rows=s_rows)

    # (b) XLA gather cost vs row width, exact deform shapes
    N, H, W, C, K = 4, 256, 256, 48, 3
    hp, wp = H + 2, W + 2
    idx = jnp.asarray(r.randint(0, hp * wp, (N, H * W * K * K, 1)),
                      jnp.int32)
    for width in (48, 96, 192):
        xp = jnp.asarray(r.randn(N, hp * wp, width), jnp.bfloat16)

        def body(xc, idx=idx):
            g = jnp.take_along_axis(xc, idx, axis=1)
            # fold back to carry shape via slab-sum (keeps everything live)
            red = g.reshape(N, H * W, K * K, -1).sum(2)
            pad = jnp.zeros((N, hp * wp - H * W, red.shape[-1]), xc.dtype)
            return xc + jnp.asarray(1e-30, xc.dtype) * jnp.concatenate(
                [red, pad], axis=1)
        chain_time(f"xla_gather_w{width}", body, xp,
                   per_iter_rows=N * H * W * K * K)

    print("probe done", flush=True)


if __name__ == "__main__":
    main()
