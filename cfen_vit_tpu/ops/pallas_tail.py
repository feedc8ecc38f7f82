"""Fused full-resolution tail (Pallas/TPU): us_conv_d01 + tail in ONE kernel.

The generator's full-res band is its worst-mapped region: C=12/3 channels
starve the 128-lane units, and at batch>=8 XLA flips the whole chain to a
batch-sublane/channel-lane layout where the tail's pad+conv7x7 fusion alone
costs 17.3 ms (vs 1.2 ms at batch 7) — the b8-12 throughput cliff of
BASELINE.md (scripts/profile_hlo.py, r2).  This kernel computes, per batch
item, entirely in VMEM:

  trunk [256,256,24] -> ConvTranspose2d(4,s2,p1) 24->12 -> ActNorm -> ReLU
  -> conv3x3 12->12 (+ActNorm for color tails) -> ReLU -> ReflectionPad(3)
  -> conv7x7 12->out_c -> tanh -> [512,512,out_c]

(ref v3:301-322 us_conv_d01*, :348-383 tails).  Implementation notes:
  * the transpose-conv runs as 4 phase convolutions (each output parity
    class = a 2x2 conv over the trunk), interleaved back by a stack+reshape
    that is layout-free (merges non-minor dims only);
  * 3x3/7x7 convs are tap-loops of [H*W, Cin] @ [Cin, Cout] matmuls with
    f32 accumulation — lane utilization is poor but the arithmetic is tiny
    (~1 GFLOP/img) and everything stays on-chip: HBM sees one trunk read
    and one image write;
  * reflection padding is built with single-row/column concats (no gathers).

Backward = custom_vjp recompute through the plain-jnp composition in
models/generator.py (the kernel is inference-critical; training already
pays a remat recompute).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except ImportError:  # pragma: no cover
    _HAS_PALLAS = False

_INTERPRET = False


def _kernel(has_an2: bool, out_c: int,
            x_ref, usw, usb, usan_w, usan_b, c1w, c1b, an2w, an2b,
            c2w, c2b, o_ref):
    f32 = jnp.float32
    x = x_ref[0]                                   # [H, W, 24]
    h, w, cin = x.shape
    dt = x.dtype

    # ---- ConvTranspose2d(k=4, s=2, p=1): 4 phase 2x2 convs --------------
    # out[2i+a, 2j+b] = sum_{u,v in {0,1}} in[i+a-1+u, j+b-1+v] @ W[a+2u, b+2v]
    zr = jnp.zeros((1, w, cin), dt)
    zc = jnp.zeros((h + 2, 1, cin), dt)
    xp = jnp.concatenate([zr, x, zr], axis=0)
    xp = jnp.concatenate([zc, xp, zc], axis=1)      # [H+2, W+2, C]
    cmid = usw.shape[-1]

    def phase(a, b):
        acc = jnp.zeros((h * w, cmid), f32)
        for u in (0, 1):
            for v in (0, 1):
                sl = xp[a + u:a + u + h, b + v:b + v + w, :]
                acc = acc + jax.lax.dot_general(
                    sl.reshape(h * w, cin), usw[a + 2 * u, b + 2 * v],
                    (((1,), (0,)), ((), ())), preferred_element_type=f32)
        return acc.reshape(h, w, cmid)

    rows = []
    for a in (0, 1):
        cols = [phase(a, b) for b in (0, 1)]
        rows.append(jnp.stack(cols, axis=2))        # [H, W, 2, C]
    t = jnp.stack(rows, axis=1)                     # [H, 2, W, 2, C]
    t = t.reshape(2 * h, 2 * w, cmid)               # interleave (layout-free)
    t = t + usb[0].astype(f32)
    # us ActNorm + ReLU: y = (x + b) * exp(w)
    t = (t + usan_b[0].astype(f32)) * jnp.exp(usan_w[0].astype(f32))
    t = jnp.maximum(t, 0.0).astype(dt)              # t1 [2H, 2W, 12]

    hh, ww = 2 * h, 2 * w

    # ---- conv3x3 12->12, zero pad 1 --------------------------------------
    zr = jnp.zeros((1, ww, cmid), dt)
    zc = jnp.zeros((hh + 2, 1, cmid), dt)
    tp = jnp.concatenate([zr, t, zr], axis=0)
    tp = jnp.concatenate([zc, tp, zc], axis=1)
    acc = jnp.zeros((hh * ww, cmid), f32)
    for dy in range(3):
        for dx in range(3):
            sl = tp[dy:dy + hh, dx:dx + ww, :]
            acc = acc + jax.lax.dot_general(
                sl.reshape(hh * ww, cmid), c1w[dy, dx],
                (((1,), (0,)), ((), ())), preferred_element_type=f32)
    t2 = acc + c1b[0].astype(f32)
    if has_an2:
        t2 = (t2 + an2b[0].astype(f32)) * jnp.exp(an2w[0].astype(f32))
    t2 = jnp.maximum(t2, 0.0).astype(dt).reshape(hh, ww, cmid)

    # ---- ReflectionPad2d(3) ----------------------------------------------
    top = jnp.concatenate([t2[3:4], t2[2:3], t2[1:2]], axis=0)
    bot = jnp.concatenate([t2[-2:-1], t2[-3:-2], t2[-4:-3]], axis=0)
    t2 = jnp.concatenate([top, t2, bot], axis=0)
    left = jnp.concatenate([t2[:, 3:4], t2[:, 2:3], t2[:, 1:2]], axis=1)
    right = jnp.concatenate([t2[:, -2:-1], t2[:, -3:-2], t2[:, -4:-3]],
                            axis=1)
    t2 = jnp.concatenate([left, t2, right], axis=1)  # [2H+6, 2W+6, 12]

    # ---- conv7x7 12->out_c + tanh -----------------------------------------
    acc = jnp.zeros((hh * ww, out_c), f32)
    for dy in range(7):
        for dx in range(7):
            sl = t2[dy:dy + hh, dx:dx + ww, :]
            acc = acc + jax.lax.dot_general(
                sl.reshape(hh * ww, cmid), c2w[dy, dx],
                (((1,), (0,)), ((), ())), preferred_element_type=f32)
    out = jnp.tanh(acc + c2b[0].astype(f32))
    o_ref[0] = out.reshape(hh, ww, out_c).astype(dt)


def fused_tail(x, us_p, tail_p, out_c: int):
    """x: [B, H, W, 24] trunk features (post d1+xf add); returns
    [B, 2H, 2W, out_c].  us_p: {conv{w,b}, an{w,b}}; tail_p: {conv1, conv2,
    optional an}."""
    b, h, w, cin = x.shape
    has_an2 = "an" in tail_p
    dt = x.dtype
    z = jnp.zeros((1, tail_p["conv1"]["w"].shape[-1]), dt)
    args = (
        us_p["conv"]["w"].astype(dt),
        us_p["conv"]["b"][None, :].astype(dt),
        us_p["an"]["w"][None, :].astype(jnp.float32),
        us_p["an"]["b"][None, :].astype(dt),
        tail_p["conv1"]["w"].astype(dt),
        tail_p["conv1"]["b"][None, :].astype(dt),
        (tail_p["an"]["w"][None, :].astype(jnp.float32) if has_an2
         else z.astype(jnp.float32)),
        (tail_p["an"]["b"][None, :].astype(dt) if has_an2 else z),
        tail_p["conv2"]["w"].astype(dt),
        tail_p["conv2"]["b"][None, :].astype(dt),
    )
    kernel = functools.partial(_kernel, has_an2, out_c)
    x_spec = pl.BlockSpec((1, h, w, cin), lambda i: (i, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    w_specs = [pl.BlockSpec(a.shape, lambda i, _nd=a.ndim: (0,) * _nd,
                            memory_space=pltpu.VMEM) for a in args]
    o_spec = pl.BlockSpec((1, 2 * h, 2 * w, out_c), lambda i: (i, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    flops = b * (2 * h) * (2 * w) * (4 * cin + 9 * 12 + 49 * out_c) * 12 * 2
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, 2 * h, 2 * w, out_c), dt),
        grid=(b,),
        in_specs=[x_spec] + w_specs,
        out_specs=o_spec,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(x.size + b * 4 * h * w * out_c)
            * x.dtype.itemsize,
            transcendentals=b * 4 * h * w * out_c),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_INTERPRET,
    )(x, *args)


def use_pallas_tail() -> bool:
    """CFEN_PALLAS_TAIL=1 forces the kernel on TPU; auto (default) is OFF:
    the r2 attempt hit a pathological Mosaic compile (>40 min for the
    whole-image tap-loop formulation) — keep opt-in until a fast-compiling
    formulation lands."""
    flag = os.environ.get("CFEN_PALLAS_TAIL", "auto")
    if flag != "1" or not _HAS_PALLAS:
        return False
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def supported(spec, tail_p) -> bool:
    """Covers the half-res-trunk tails whose norms are ActNorm-or-none
    (v3/v5 family).  InstanceNorm tails need global stats — plain path."""
    if not _HAS_PALLAS:
        return False
    return spec.half_res_trunk and (
        "an" in tail_p or spec.tail_norm != "instance")
