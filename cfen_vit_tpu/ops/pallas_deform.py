"""Pallas deformable-conv forward: block-local one-hot gather GEMM.

Replaces the XLA-gather forward of ops/deform_conv.py on TPU (VERDICT r4
#1).  The r4 device table (BASELINE.md) put the XLA form at fwd MFU
0.04-1.69% — XLA's TPU gather runs ~100M rows/s (23 ms per 2.36M-row
gather at the 4x256x256x48 geometry; scripts/probe_deform_decomp.py), and
Mosaic exposes no usable large-table gather either (same-shape
tpu.dynamic_gather only: scripts/probe_gather2.py — sublane form only
works within one 8x128 vreg, f32).

So the kernel avoids gathers entirely.  For each 8x8 output block the
deformed samples of all K^2 taps lie (after clamping the per-pixel
displacement to a static |d| <= MAX_DISP window) inside one
WIN = S + 2D + K square image window.  Bilinear sampling of all
S*S*K^2 block samples is then ONE factored one-hot contraction on the MXU:

    rowhot[s, wy] = mask_s * ((wy==y0_s)(1-fy_s) + (wy==y0_s+1) fy_s)
    A[s, wx*C+c]  = rowhot @ window_flat          # [P,WIN] x [WIN,WIN*C]
    patch[s, c]   = sum_wx colhot[s, wx] * A[s, wx*C:(wx+1)*C]
    out[p, o]     = sum_t patch[t-major slab] @ w[t]   (+ bias outside)

No gather, no dynamic shapes: iota-compares build the one-hots, the image
window is one strided DMA (rows are contiguous WIN*C runs because the
caller pre-flattens x to [N, Hp, Wp*C]), and everything else is MXU/VPU.
FLOPs are ~P*WIN*WIN*C*2 per block (structural zeros, same trade as
ops/phase_space.py) — ~293 GFLOP at the 256-geometry with D=12, i.e.
milliseconds where the XLA gather needs 145 ms.

Semantics: identical to ops/deform_conv.modulated_deform_conv (reference
dcn/src/deform_conv_cuda_kernel.cu:190-279 dmcn_im2col_bilinear) whenever
every per-tap displacement satisfies |offset| <= MAX_DISP; larger
displacements are clamped to the window edge (the XLA path keeps them
exact and stays available via CFEN_PALLAS_DCN=0).  Trained DCN offsets are
predicted by a zero-initialised conv and stay within a few pixels
(ModulatedDeformConvPack, ref dcn/deform_conv.py:221-283), so the default
D=12 (CFEN_DCN_MAXDISP) is far beyond practice.

Forward only: the backward stays the closed-form XLA VJP of
ops/deform_conv.py (scatter-add col2im / col2im_coord), per VERDICT r4 #1.

Restrictions (dispatch falls back to the XLA path otherwise):
  stride == 1, dilation == 1, pad == k // 2, C % 8 == 0.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cfg():
    d = int(os.environ.get("CFEN_DCN_MAXDISP", 12))
    s = int(os.environ.get("CFEN_DCN_BLOCK", 8))
    return d, s


def use_pallas_dcn() -> bool:
    """Auto-ON on TPU; CFEN_PALLAS_DCN=0 disables, =1 forces (interpret on
    CPU for tests)."""
    flag = os.environ.get("CFEN_PALLAS_DCN", "auto")
    if flag == "0":
        return False
    if flag == "1":
        return True
    return jax.devices()[0].platform in ("tpu", "axon")


def _kernel(y0_ref, x0_ref, fy_ref, fx_ref, m_ref, w_ref, xp_ref,
            out_ref, win_ref, pix_ref, sem, *, S, K, C, O, WIN, WINR,
            WINX, out_dtype):
    # Transposed dataflow: SAMPLES LIVE ON LANES throughout.  That makes
    # (a) the stage-A contraction emit A_T [WINX, P] directly (no
    # transpose), (b) the stage-B gated reduce slice 8-aligned SUBLANE
    # slabs A_T[i*C:(i+1)*C] instead of rotated 48-lane groups, and
    # (c) the conv GEMM contract tap-major sublane-concat slabs in one
    # dot that lands already [S*S, O] for the output write.
    n = pl.program_id(0)
    by = pl.program_id(1)
    bx = pl.program_id(2)
    P = S * S * K * K

    # one strided DMA: WINR rows (WIN rounded to the 8-sublane tiling) of
    # WINX = WINR*C contiguous elements (128-aligned); the overread
    # rows/lanes carry zero one-hot weight and never reach the output
    ys = pl.multiple_of(by * S, S)
    xs = pl.multiple_of(bx * (S * C), S * C)
    dma = pltpu.make_async_copy(
        xp_ref.at[n, pl.ds(ys, WINR), pl.ds(xs, WINX)], win_ref, sem)
    dma.start()

    y0 = y0_ref[0, 0, 0]          # [1, P] int32 (window-relative row)
    x0 = x0_ref[0, 0, 0]
    fy = fy_ref[0, 0, 0]          # [1, P] fractional parts
    fx = fx_ref[0, 0, 0]
    m = m_ref[0, 0, 0]            # [1, P] modulation mask

    # integer one-hots built arithmetically: relu(1 - |iota - idx|) is an
    # exact indicator and avoids i1 vectors + scalar-select relayouts
    # (Mosaic "Invalid relayout ... vector<...xi1>" on the where-form)
    iw = jax.lax.broadcasted_iota(jnp.int32, (WINR, P), 0)
    one = jnp.ones((), fy.dtype)

    def hot(idx):
        d = iw - jnp.broadcast_to(idx, (WINR, P))
        return jnp.maximum(1 - jnp.abs(d), 0).astype(fy.dtype)

    rowhot = hot(y0) * ((one - fy) * m) + hot(y0 + 1) * (fy * m)
    colhot = hot(x0) * (one - fx) + hot(x0 + 1) * fx

    dma.wait()
    # y-interpolation: [WINR, WINX]^T-contract [WINR, P] -> A_T [WINX, P]
    a_t = jax.lax.dot_general(
        win_ref[:], rowhot,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    # x-interpolation: gated reduce over the WIN column groups — 8-aligned
    # sublane slabs, per-group sublane-broadcast gate
    patch_t = jnp.zeros((C, P), jnp.float32)
    for i in range(WIN):
        patch_t = patch_t + a_t[i * C:(i + 1) * C, :] \
            * colhot[i:i + 1, :].astype(jnp.float32)

    # conv-weight GEMM: restack the tap-major slabs [C, S*S] into a
    # [K^2*C, S*S] scratch (ref stores normalize the lane offsets a
    # direct sublane-concat of lane slices trips Mosaic on), then all
    # K^2 taps contract in ONE dot: [K^2*C, S*S]^T-contract [K^2*C, O]
    patch_t = patch_t.astype(w_ref.dtype)
    for t in range(K * K):
        pix_ref[t * C:(t + 1) * C, :] = \
            patch_t[:, t * S * S:(t + 1) * S * S]
    acc = jax.lax.dot_general(
        pix_ref[:], w_ref[:],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    out_ref[...] = acc.reshape(1, S, S, O).astype(out_dtype)


def _prep(x, offset, mask, k: int, pad: int, max_disp: int, S: int):
    """XLA-side prep: zero-pad + flatten the image, and build the
    per-sample window-relative integer/fraction planes (tap-major)."""
    n, h, w, c = x.shape
    D = max_disp
    hb = -(-h // S) * S
    wb = -(-w // S) * S
    WIN = S + 2 * D + k
    WINR = -(-WIN // 8) * 8                 # DMA rows: 8-sublane tiling
    while (WINR * c) % 128:                 # lanes = WINR*C groups of C,
        WINR += 8                           # kept 128-aligned as a whole
    WINX = WINR * c
    # halo: rel displacement range [-pad-D, k-1-pad+D+1); extra hi padding
    # keeps the aligned (WINR x WINX) window DMA in bounds for the last
    # block row/column
    lo = pad + D
    hi_y = (k - 1 - pad + D + 1) + (hb - h) + (WINR - WIN)
    hi_x = (k - 1 - pad + D + 1) + (wb - w) + (-(-(WINX - WIN * c) // c))
    xp = jnp.pad(x, ((0, 0), (lo, hi_y), (lo, hi_x), (0, 0)))
    xp2 = xp.reshape(n, h + lo + hi_y, -1)   # [N, Hp, Wp*C], layout-free

    kk = k * k
    off = offset.reshape(n, h, w, kk, 2)
    dy = jnp.clip(off[..., 0].astype(jnp.float32), -D, D)
    dx = jnp.clip(off[..., 1].astype(jnp.float32), -D, D)
    ky = jnp.repeat(jnp.arange(k, dtype=jnp.float32), k)
    kx = jnp.tile(jnp.arange(k, dtype=jnp.float32), k)
    oyb = jnp.arange(h, dtype=jnp.float32) % S
    oxb = jnp.arange(w, dtype=jnp.float32) % S
    # window-relative sample coordinate (block origin already subtracted):
    # y = oy%S + ky - pad + dy + (pad + D) = oy%S + ky + D + dy
    ys = oyb[:, None, None] + (ky + D)[None, None, :] + dy
    xs = oxb[None, :, None] + (kx + D)[None, None, :] + dx
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    fy = (ys - y0).astype(x.dtype)
    fx = (xs - x0).astype(x.dtype)
    y0 = y0.astype(jnp.int32)
    x0 = x0.astype(jnp.int32)

    def blockify(a, dt):
        # [N,H,W,K2] -> [N,BY,BX,1,K2*S*S] tap-major (samples on LANES),
        # padded blocks zeroed
        if hb != h or wb != w:
            a = jnp.pad(a, ((0, 0), (0, hb - h), (0, wb - w), (0, 0)))
        a = a.reshape(n, hb // S, S, wb // S, S, kk)
        a = a.transpose(0, 1, 3, 5, 2, 4)
        return a.reshape(n, hb // S, wb // S, 1, kk * S * S).astype(dt)

    mv = mask.reshape(n, h, w, kk)
    planes = (blockify(y0, jnp.int32), blockify(x0, jnp.int32),
              blockify(fy, x.dtype), blockify(fx, x.dtype),
              blockify(mv, x.dtype))
    return xp2, planes, (hb, wb, WIN, WINR, WINX)


def modulated_deform_conv_pallas(x, offset, mask, w, b=None,
                                 stride: int = 1, pad: int = 1,
                                 dilation: int = 1,
                                 interpret: bool = False):
    """Pallas DCNv2 forward (see module docstring for the clamp contract).

    Same signature/semantics as ops.deform_conv.modulated_deform_conv for
    stride=1, dilation=1, pad=k//2; raises ValueError otherwise (the
    dispatcher checks first)."""
    k = w.shape[0]
    if stride != 1 or dilation != 1 or pad != k // 2:
        raise ValueError("pallas DCN supports stride=1 dilation=1 pad=k//2")
    n, h, wid, c = x.shape
    o = w.shape[3]
    if c % 8 != 0:
        raise ValueError("pallas DCN needs C % 8 == 0")
    D, S = _cfg()
    xp2, planes, (hb, wb, WIN, WINR, WINX) = _prep(x, offset, mask, k,
                                                   pad, D, S)
    P = S * S * k * k
    wf = w.reshape(k * k * c, o).astype(x.dtype)

    grid = (n, hb // S, wb // S)
    plane_spec_i = pl.BlockSpec((1, 1, 1, 1, P),
                                lambda n, i, j: (n, i, j, 0, 0),
                                memory_space=pltpu.VMEM)
    kern = functools.partial(_kernel, S=S, K=k, C=c, O=o, WIN=WIN,
                             WINR=WINR, WINX=WINX, out_dtype=x.dtype)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((n, hb, wb, o), x.dtype),
        grid=grid,
        in_specs=[plane_spec_i, plane_spec_i, plane_spec_i, plane_spec_i,
                  plane_spec_i,
                  pl.BlockSpec(memory_space=pltpu.VMEM),   # weights, whole
                  pl.BlockSpec(memory_space=pltpu.ANY)],   # image, HBM
        out_specs=pl.BlockSpec((1, S, S, o), lambda n, i, j: (n, i, j, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((WINR, WINX), x.dtype),
                        pltpu.VMEM((k * k * c, S * S), x.dtype),
                        pltpu.SemaphoreType.DMA],
        interpret=interpret,
    )(*planes, wf, xp2)
    if hb != h or wb != wid:
        out = out[:, :h, :wid, :]
    if b is not None:
        out = out + b
    return out
