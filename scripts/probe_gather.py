"""Mosaic capability probe: which in-kernel dynamic gathers lower on TPU?

The Pallas deformable-conv design (VERDICT r4 #1) hinges on an in-VMEM
gather: bilinear sampling needs x[flat_idx[p], :] for ~18k per-strip
sample rows from a [HP*WP, C] VMEM-resident image.  Mosaic's
tpu.DynamicGatherOp supports *some* take_along_axis patterns; this probe
compiles each candidate form and times it so the kernel is designed around
what actually lowers (the repo's measure-then-decide policy).

Run detached: setsid nohup python scripts/probe_gather.py > /tmp/probe.log &
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cfen_vit_tpu.config import enable_compilation_cache
enable_compilation_cache()

R, P, C = 66560, 18432, 128   # image rows (258*258 rounded up), samples, ch


def probe(name, fn, *args):
    try:
        f = jax.jit(fn)
        out = f(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(10):
            out = f(*args)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / 10
        print(f"PROBE {name}: OK {dt*1e3:.3f} ms", flush=True)
        return out
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:300]
        print(f"PROBE {name}: FAIL {type(e).__name__}: {msg}", flush=True)
        return None


def main():
    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(R, C), jnp.float32)
    xb = x.astype(jnp.bfloat16)
    idx = jnp.asarray(rng.randint(0, R, size=(P, C)), jnp.int32)
    idx1 = idx[:, :1]

    # 1. take_along_axis axis=0 (sublane gather), full-width indices
    def k_ta0(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=0)

    def ta0(x, idx):
        return pl.pallas_call(
            k_ta0,
            out_shape=jax.ShapeDtypeStruct((P, C), x.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, idx)

    probe("take_along_axis0_f32", ta0, x, idx)
    probe("take_along_axis0_bf16", ta0, xb, idx)

    # 2. advanced row indexing with a broadcast [P,1] index
    def k_row(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(
            x_ref[:], jnp.broadcast_to(i_ref[:], (P, C)), axis=0)

    probe("take_along_axis0_bcast", lambda x, i: pl.pallas_call(
        k_row,
        out_shape=jax.ShapeDtypeStruct((P, C), x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, i), x, idx1)

    # 3. lane gather (axis=1): small table in lanes
    xt = jnp.asarray(rng.randn(P, 128), jnp.float32)
    idxl = jnp.asarray(rng.randint(0, 128, size=(P, 128)), jnp.int32)

    def k_ta1(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=1)

    probe("take_along_axis1_f32", lambda x, i: pl.pallas_call(
        k_ta1,
        out_shape=jax.ShapeDtypeStruct((P, 128), x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, i), xt, idxl)

    # 4. XLA reference for the same gather shape (outside pallas), to
    #    quantify the headroom the kernel is chasing
    def xla_gather(x, i):
        return jnp.take_along_axis(x, jnp.broadcast_to(i, (P, C)), axis=0)
    probe("xla_take_along_axis0", xla_gather, x, idx1)

    print("probe done", flush=True)


if __name__ == "__main__":
    main()
