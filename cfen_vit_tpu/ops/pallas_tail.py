"""Fused reflection-pad + conv7x7 + tanh tail epilogue (Pallas/TPU).

The b8-12 throughput cliff (BASELINE.md): at batch>=8 XLA flips the
generator's full-res C=12 band to a batch-sublane/channel-lane layout, and
the tail's pad+conv7x7 fusion alone goes from 1.2 ms (b7) to 17.3 ms
(scripts/profile_hlo.py, r2).  This kernel computes that epilogue
channel-first — input [B, 12, H+8, W+6] NCHW puts WIDTH on the 128 lanes,
so VMEM blocks don't pad 12 channels up to 128 — and was measured 3.4x
faster than the XLA lowering on the isolated op at b8 (6.0 vs 20.3 ms,
NHWC<->NCHW transposes included).

Hard-won Mosaic constraints encoded here (each cost a compile cycle):
  * whole-image NHWC VMEM blocks with C=12 minor explode 10.7x from lane
    padding (a [1,518,512,12] window "costs" 135 MB) — hence channel-first;
  * dynamic row offsets into refs must be provably 8-aligned: load one
    strip+8-row slab at y0 (multiple of the 64-row strip), take the 7 tap
    rows as STATIC slices of the slab value;
  * tiny-vector reshapes ([3] -> [3,1,1]) and sublane+lane double
    broadcasts are unsupported: the per-channel bias is added as an SMEM
    scalar per output channel.

v1/v2 history: a fully-fused whole-image kernel (convT+norms+both convs)
hit a >1 h pathological Mosaic compile; NHWC strip kernels hit the lane
padding wall.  The convT/conv1 half of the tail stays on XLA for now (its
b8 penalty is ~5 ms vs the epilogue's 16) — a channel-first phase-space
version is the follow-up.

Reference semantics: ReflectionPad2d(3) + conv7x7 + tanh (ref v3:348-383).
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
_STRIP = 64


def _k2cf(out_c: int, strip: int, t_ref, w_ref, b_ref, o_ref):
    """t_ref [1, 12, HH+8, WW+6] (reflect-padded 3 + 2 zero alignment rows
    at the bottom), channel-first; o_ref [1, out_c, strip, WW]."""
    f32 = jnp.float32
    s = pl.program_id(1)
    ww = t_ref.shape[3] - 6
    y0 = s * strip
    acc = jnp.zeros((out_c, strip, ww), f32)
    slab = t_ref[0, :, pl.ds(pl.multiple_of(y0, 8), strip + 8), :]
    for dy in range(7):
        for dx in range(7):
            sl = slab[:, dy:dy + strip, dx:dx + ww]   # [12, S, W] static
            acc = acc + jax.lax.dot_general(
                w_ref[dy, dx], sl, (((0,), (0,)), ((), ())),
                preferred_element_type=f32)           # [out_c, S, W]
    outs = [jnp.tanh(acc[c] + b_ref[0, c]) for c in range(out_c)]
    o_ref[0] = jnp.stack(outs, axis=0).astype(t_ref.dtype)


def conv7_tail_epilogue(t2, w, bias):
    """t2: [B, HH, WW, 12] (pre-pad full-res features); w [7,7,12,out_c];
    bias [out_c].  Returns tanh(conv7x7(reflect_pad(t2,3))) as NHWC."""
    out_c = w.shape[-1]
    b, hh, ww, cmid = t2.shape
    strip = min(_STRIP, hh)
    tp = jnp.pad(t2, ((0, 0), (3, 3), (3, 3), (0, 0)), mode="reflect")
    tp = jnp.pad(tp, ((0, 0), (0, 2), (0, 0), (0, 0)))  # slab alignment
    tcf = jnp.transpose(tp, (0, 3, 1, 2))               # [B,12,HH+8,WW+6]
    t_spec = pl.BlockSpec((1, cmid, hh + 8, ww + 6),
                          lambda i, s: (i, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec((1, out_c, strip, ww), lambda i, s: (i, 0, s, 0),
                          memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec(w.shape, lambda i, s: (0,) * 4,
                         memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((1, out_c), lambda i, s: (0, 0),
                         memory_space=pltpu.SMEM)
    out_cf = pl.pallas_call(
        functools.partial(_k2cf, out_c, strip),
        out_shape=jax.ShapeDtypeStruct((b, out_c, hh, ww), t2.dtype),
        grid=(b, hh // strip),
        in_specs=[t_spec, wspec, bspec],
        out_specs=o_spec,
        cost_estimate=pl.CostEstimate(
            flops=b * hh * ww * 49 * cmid * out_c * 2,
            bytes_accessed=(tcf.size + b * hh * ww * out_c)
            * t2.dtype.itemsize,
            transcendentals=b * hh * ww * out_c),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_INTERPRET,
    )(tcf, w, bias[None, :].astype(jnp.float32))
    return jnp.transpose(out_cf, (0, 2, 3, 1))


def use_pallas_tail(batch: int) -> bool:
    """Measured dispatch: the XLA lowering is fine at batch<=7 (1.2 ms) and
    pathological at batch>=8 (17.3 ms, the layout flip); the kernel is
    ~6 ms at b8.  CFEN_PALLAS_TAIL=1 forces on, =0 off."""
    flag = os.environ.get("CFEN_PALLAS_TAIL", "auto")
    if flag == "0" or not _HAS_PALLAS:
        return False
    try:
        on_tpu = jax.devices()[0].platform in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False
    if flag == "1":
        return on_tpu
    return on_tpu and batch >= 8


def supported(spec, tail_p) -> bool:
    """The epilogue kernel needs strip-divisible full-res rows."""
    del tail_p
    if not _HAS_PALLAS:
        return False
    side = 2 * spec.load_size if spec.half_res_trunk else spec.load_size
    return side % min(_STRIP, side) == 0 and side >= 8
