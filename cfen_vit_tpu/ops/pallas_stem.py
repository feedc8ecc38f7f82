"""Channel-first fused stem (Pallas/TPU): head conv5x5 + ResBlock in one
kernel.

Same motivation and construction as the tail epilogue kernel
(ops/pallas_tail.py): the stem runs at full resolution with C=3/12, which
XLA lays out batch-on-sublanes at batch>=8 (head conv + two ResBlock convs
+ their pad/relu fusions cost ~8 ms at b8, ~4 ms at b7 —
scripts/profile_hlo.py).  Channel-first [B, C, H, W] blocks put WIDTH on
the 128 lanes; 64-row output strips keep Mosaic compile time sane; taps
are [cin, cout] x [cin, rows, W] dot_generals with f32 accumulation.

Computes (ref v3:123-127):
    h  = conv5x5(x)            3 -> 12, zero pad 2
    r1 = relu(conv3x3(h))      12 -> 12, zero pad 1
    r2 = conv3x3(r1)           12 -> 12, zero pad 1
    xf = h + r2
The conv3x3 zero-padding of h / r1 outside the image is enforced with row
masks (dynamic strip offset) and static column masks on the halo columns.

The stride-2 ds_conv + InstanceNorm that follow (half-res trunk) stay on
XLA: IN needs global spatial statistics and the trunk-res C=24 ops are not
part of the layout pathology.

Backward = custom_vjp recompute through the plain composition
(models/generator.py _stem_plain).
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


def _add_bias(acc, b_smem):
    """acc [cout, rows, cols] += per-channel SMEM scalar (scalar splats
    are fine; vector double-broadcasts are not)."""
    return jnp.stack([acc[c] + b_smem[0, c] for c in range(acc.shape[0])],
                     axis=0)


def _mask_rows_cols(v, row0, h_img, col0, w_img):
    """Zero elements whose absolute row/col falls outside the image.
    Row and column masks applied separately (a combined [1,R,C] mask would
    be a sublane+lane double broadcast, unsupported)."""
    rows, cols = v.shape[1], v.shape[2]
    ridx = jax.lax.broadcasted_iota(jnp.int32, (1, rows, 1), 1) + row0
    v = jnp.where((ridx >= 0) & (ridx < h_img), v, 0.0)
    cidx = jax.lax.broadcasted_iota(jnp.int32, (1, 1, cols), 2) + col0
    return jnp.where((cidx >= 0) & (cidx < w_img), v, 0.0)


def _ceil128(c: int) -> int:
    return -(-c // 128) * 128


def _kstem(strip: int, h_img: int, w_img: int,
           x_ref, w5, b5, wc1, bc1, wc2, bc2, o_ref):
    """x_ref [1, 3, H+24, PADW] (x zero-padded 8 rows top, 16 bottom, 8
    cols left, right as needed — padded row = x row + 8, col = x col + 8);
    o_ref [1, 12, strip, W].

    Mosaic constraint that shaped this: every conv TARGET region (= the
    per-tap dot-operand window shape) must have rows % 8 == 0 and
    cols % 128 == 0, or the lowering's [cin,R,C]->[cin,R*C] reshape is an
    unsupported lane-changing shape cast.  Hence the aligned compute
    ladder h(strip+16, TCH) -> r1(strip+8, TC1) -> r2(strip, TC2), each
    stage over-computing junk border that the next stage ignores."""
    f32 = jnp.float32
    s = pl.program_id(1)
    y0 = s * strip
    tc2 = _ceil128(w_img)
    tc1 = tc2 + 128
    tch = tc1 + 128

    # slab: x rows [y0-8, y0+strip+16)
    slab = x_ref[0, :, pl.ds(pl.multiple_of(y0, 8), strip + 24), :]

    def conv(src, wk, r0, c0, rows, cols):
        """k x k conv: target [cout, rows, cols]; src window for tap
        (dy,dx) starts at src-local (r0+dy, c0+dx)."""
        cout = wk.shape[-1]
        k = wk.shape[0]
        acc = jnp.zeros((cout, rows, cols), f32)
        for dy in range(k):
            for dx in range(k):
                sl = src[:, r0 + dy:r0 + dy + rows, c0 + dx:c0 + dx + cols]
                acc = acc + jax.lax.dot_general(
                    wk[dy, dx], sl, (((0,), (0,)), ((), ())),
                    preferred_element_type=f32)
        return acc

    # h: rows [y0-4, y0+strip+12), cols [-4, tch-4)
    #   conv5 tap (dy,dx) reads x rows y0-6+dy.. -> slab-local 2+dy;
    #   x col c-6+dx -> x_pad col c+2+dx (left pad 8)
    h = conv(slab, w5, 2, 2, strip + 16, tch)
    h = _add_bias(h, b5)
    hm = _mask_rows_cols(h, y0 - 4, h_img, -4, w_img)

    # r1: rows [y0-2, y0+strip+6), cols [-2, tc1-2)
    #   tap reads h rows (y0-2)-1+dy -> h-local 1+dy; cols -3+dx -> 1+dx
    r1 = conv(hm.astype(x_ref.dtype), wc1, 1, 1, strip + 8, tc1)
    r1 = jnp.maximum(_add_bias(r1, bc1), 0.0)
    r1 = _mask_rows_cols(r1, y0 - 2, h_img, -2, w_img)

    # r2: rows [y0, y0+strip), cols [0, tc2)
    r2 = conv(r1.astype(x_ref.dtype), wc2, 1, 1, strip, tc2)
    r2 = _add_bias(r2, bc2)

    # xf = h_center + r2 on [strip, W]
    h_center = h[:, 4:4 + strip, 4:4 + tc2]
    o_ref[0] = (h_center + r2)[:, :, :w_img].astype(x_ref.dtype)


def fused_stem(x, head_p):
    """x: [B, H, W, 3] -> xf [B, H, W, 12] (head conv5x5 + ResBlock).

    head_p: {"conv": {w,b}, "res": {"c1": {w,b}, "c2": {w,b}}}."""
    b, h_img, w_img, cin = x.shape
    strip = min(_STRIP, h_img)
    dt = x.dtype
    cmid = head_p["conv"]["w"].shape[-1]
    tch = _ceil128(w_img) + 256
    right = tch + 6 - 8 - w_img
    xp = jnp.pad(x, ((0, 0), (8, 16), (8, right), (0, 0)))
    xcf = jnp.transpose(xp, (0, 3, 1, 2))           # [B,3,H+24,tch+6]
    args = (head_p["conv"]["w"].astype(dt),
            head_p["conv"]["b"][None, :].astype(jnp.float32),
            head_p["res"]["c1"]["w"].astype(dt),
            head_p["res"]["c1"]["b"][None, :].astype(jnp.float32),
            head_p["res"]["c2"]["w"].astype(dt),
            head_p["res"]["c2"]["b"][None, :].astype(jnp.float32))
    x_spec = pl.BlockSpec((1, cin, h_img + 24, tch + 6),
                          lambda i, s: (i, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    specs = []
    for i, a in enumerate(args):
        if a.ndim == 2:   # biases -> SMEM scalars
            specs.append(pl.BlockSpec(a.shape, lambda i_, s_, _n=a.ndim:
                                      (0,) * _n, memory_space=pltpu.SMEM))
        else:
            specs.append(pl.BlockSpec(a.shape, lambda i_, s_, _n=a.ndim:
                                      (0,) * _n, memory_space=pltpu.VMEM))
    o_spec = pl.BlockSpec((1, cmid, strip, w_img),
                          lambda i, s: (i, 0, s, 0),
                          memory_space=pltpu.VMEM)
    out_cf = pl.pallas_call(
        functools.partial(_kstem, strip, h_img, w_img),
        out_shape=jax.ShapeDtypeStruct((b, cmid, h_img, w_img), dt),
        grid=(b, h_img // strip),
        in_specs=[x_spec] + specs,
        out_specs=o_spec,
        cost_estimate=pl.CostEstimate(
            flops=b * h_img * w_img * (25 * cin + 18 * cmid) * cmid * 2,
            bytes_accessed=(xcf.size + b * h_img * w_img * cmid)
            * x.dtype.itemsize,
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_INTERPRET,
    )(xcf, *args)
    return jnp.transpose(out_cf, (0, 2, 3, 1))


def use_pallas_stem(batch: int) -> bool:
    """Measured r2 (v5e, 512px): unlike the tail epilogue, this kernel is
    NEUTRAL at b8/b16 (48.4 vs 47.9 ms; 99.1 vs 96.3) and a clear loss at
    b7 (141 vs 199 img/s) — the conv5x5's cin=3 tap dots use <1% of the
    MXU and the aligned-ladder overcompute eats the layout win.  Default
    OFF; CFEN_PALLAS_STEM=1 forces it on TPU for future re-measurement."""
    del batch
    flag = os.environ.get("CFEN_PALLAS_STEM", "auto")
    if flag != "1" or not _HAS_PALLAS:
        return False
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def supported(spec) -> bool:
    if not _HAS_PALLAS:
        return False
    side = 2 * spec.load_size if spec.half_res_trunk else spec.load_size
    return side % min(_STRIP, side) == 0 and side >= 8