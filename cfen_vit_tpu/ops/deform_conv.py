"""Deformable convolution v1/v2 — TPU-native replacement for the reference's
CUDA extension (dcn/src/deform_conv_cuda.cpp + deform_conv_cuda_kernel.cu,
1561 LoC of ATen/CUDA; python API dcn/deform_conv.py:15-329).

The CUDA implementation decomposes into `deformable_im2col` (bilinear
sampling into column buffers), a GEMM, and three backward kernels
(`col2im` for input grads, `col2im_coord` for offset/mask grads, im2col +
GEMM for weight grads).  On TPU the same decomposition maps onto XLA-native
primitives:

  * sampling   = one batched gather over the zero-padded feature map of the
                 4 bilinear neighbors per (output-pixel, kernel-tap), fully
                 vectorized — XLA lowers it to the TPU's native dynamic
                 gather; no scalar loops;
  * GEMM       = one einsum [N*OH*OW, K*K*C] x [K*K*C, O] on the MXU;
  * backward   = jax.custom_vjp with hand-derived closed forms: input grads
                 via scatter-add of the bilinear weights (col2im), offset
                 grads via the analytic d(bilinear)/d(coord) (col2im_coord),
                 mask grads as the sampled values, weight grads as the
                 transposed GEMM.  We express them through jax.vjp of the
                 (linear-in-x) sampling function, which XLA turns into
                 exactly that scatter-add.

Semantics match torchvision/mmcv ModulatedDeformConv: sampling coordinate
for output (oy, ox), tap (ky, kx):
    y = oy*stride - pad + ky*dilation + offset_y,  same for x;
out-of-bounds samples are zero (implemented by sampling a zero-padded map
with clamped indices).  v1 (DeformConv) is the mask==1 special case.

Layouts: x [N,H,W,C]; offset [N,OH,OW,2*K*K] ordered (ky, kx, [dy,dx]) like
the CUDA kernel's channel layout; mask [N,OH,OW,K*K]; w [K,K,C,O].
"""

from __future__ import annotations

from functools import partial
import jax
import jax.numpy as jnp


def _sample_patches(x, offset, kernel: int, stride: int, pad: int,
                    dilation: int):
    """Bilinear-sample the K*K deformed taps for every output pixel.

    x: [N,H,W,C] -> returns [N,OH,OW,K*K,C].
    Linear in x (for fixed offset), which makes its jax.vjp wrt x the exact
    col2im scatter-add of the CUDA backward."""
    n, h, w, c = x.shape
    k = kernel
    oh = (h + 2 * pad - (dilation * (k - 1) + 1)) // stride + 1
    ow = (w + 2 * pad - (dilation * (k - 1) + 1)) // stride + 1

    off = offset.reshape(n, oh, ow, k * k, 2)
    oy = jnp.arange(oh, dtype=x.dtype)[:, None, None]
    ox = jnp.arange(ow, dtype=x.dtype)[None, :, None]
    ky = jnp.repeat(jnp.arange(k, dtype=x.dtype), k)[None, None, :]
    kx = jnp.tile(jnp.arange(k, dtype=x.dtype), k)[None, None, :]
    # base grid [OH,OW,K*K] + per-pixel offsets [N,OH,OW,K*K]
    ys = (oy * stride - pad + ky * dilation)[None] + off[..., 0]
    xs = (ox * stride - pad + kx * dilation)[None] + off[..., 1]

    # zero-pad by 1 so clamped neighbors of out-of-range samples read 0,
    # and shift coordinates into the padded frame
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    ys = ys + 1.0
    xs = xs + 1.0
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    fy = ys - y0
    fx = xs - x0

    hp, wp = h + 2, w + 2

    def at(yi, xi):
        # in-bounds bilinear neighbors contribute; others are zero — the
        # CUDA kernel checks -1 < y < H etc. (deform_conv_cuda_kernel.cu's
        # dmcn_im2col_bilinear); valid neighbors of a partially-oob sample
        # still contribute, which clamping into the padded map reproduces.
        valid = ((yi >= 0) & (yi <= hp - 1) & (xi >= 0) & (xi <= wp - 1))
        yc = jnp.clip(yi, 0, hp - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, wp - 1).astype(jnp.int32)
        flat = xp.reshape(n, hp * wp, c)
        idx = yc * wp + xc                       # [N,OH,OW,K*K]
        g = jnp.take_along_axis(
            flat[:, :, None, :].reshape(n, hp * wp, c),
            idx.reshape(n, -1, 1), axis=1)
        g = g.reshape(n, oh, ow, k * k, c)
        return g * valid[..., None].astype(x.dtype)

    v00 = at(y0, x0)
    v01 = at(y0, x0 + 1)
    v10 = at(y0 + 1, x0)
    v11 = at(y0 + 1, x0 + 1)
    fy = fy[..., None]
    fx = fx[..., None]
    return ((1 - fy) * (1 - fx) * v00 + (1 - fy) * fx * v01
            + fy * (1 - fx) * v10 + fy * fx * v11)


@partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def modulated_deform_conv(x, offset, mask, w, b,
                          stride: int = 1, pad: int = 1, dilation: int = 1):
    """ModulatedDeformConv (DCNv2) forward.

    x [N,H,W,C], offset [N,OH,OW,2K²], mask [N,OH,OW,K²] (post-sigmoid),
    w [K,K,C,O], b [O] or None.

    On TPU the forward dispatches to the Pallas block-local one-hot GEMM
    kernel (ops/pallas_deform.py; the r4/r5 device tables in BASELINE.md
    put the XLA-gather form at fwd MFU 0.04-1.69%).  The kernel clamps
    per-tap displacements to a static |d| <= CFEN_DCN_MAXDISP (default 12)
    window — exact whenever offsets stay inside it (always, for trained
    DCN packs); CFEN_PALLAS_DCN=0 restores the unclamped XLA path."""
    k = w.shape[0]
    from .pallas_deform import use_pallas_dcn, modulated_deform_conv_pallas
    if (use_pallas_dcn() and stride == 1 and dilation == 1
            and pad == k // 2 and x.shape[-1] % 8 == 0):
        interp = jax.devices()[0].platform not in ("tpu", "axon")
        return modulated_deform_conv_pallas(x, offset, mask, w, b,
                                            stride, pad, dilation,
                                            interpret=interp)
    patches = _sample_patches(x, offset, k, stride, pad, dilation)
    patches = patches * mask[..., None]
    out = jnp.einsum("nhwkc,kco->nhwo",
                     patches, w.reshape(k * k, w.shape[2], w.shape[3]),
                     preferred_element_type=jnp.float32).astype(x.dtype)
    if b is not None:
        out = out + b
    return out


def _mdc_fwd(x, offset, mask, w, b, stride, pad, dilation):
    out = modulated_deform_conv(x, offset, mask, w, b, stride, pad, dilation)
    return out, (x, offset, mask, w, b is not None)


def _mdc_bwd(stride, pad, dilation, res, g):
    x, offset, mask, w, has_b = res
    k = w.shape[0]
    wk = w.reshape(k * k, w.shape[2], w.shape[3])

    # d(out)/d(patches*mask): [N,OH,OW,K²,C]
    gpm = jnp.einsum("nhwo,kco->nhwkc", g, wk)

    # weight / bias grads (the im2col+GEMM of the CUDA weight backward)
    patches = _sample_patches(x, offset, k, stride, pad, dilation)
    gw = jnp.einsum("nhwkc,nhwo->kco", patches * mask[..., None], g)
    gw = gw.reshape(w.shape)
    gb = jnp.sum(g, axis=(0, 1, 2)) if has_b else None

    # mask grad: sampled value dotted with upstream
    gmask = jnp.sum(gpm * patches, axis=-1)

    # input + offset grads: vjp through the sampling (linear in x =>
    # col2im scatter-add; analytic in coords => col2im_coord)
    gp = gpm * mask[..., None]
    _, vjp = jax.vjp(
        lambda xx, oo: _sample_patches(xx, oo, k, stride, pad, dilation),
        x, offset)
    gx, goff = vjp(gp)
    return gx, goff, gmask, gw, gb


modulated_deform_conv.defvjp(_mdc_fwd, _mdc_bwd)


def deform_conv(x, offset, w, b=None, stride: int = 1, pad: int = 1,
                dilation: int = 1):
    """DeformConv (DCNv1): the mask==1 case (ref dcn/deform_conv.py:15-94)."""
    k2 = w.shape[0] * w.shape[1]
    mask = jnp.ones(offset.shape[:3] + (k2,), x.dtype)
    return modulated_deform_conv(x, offset, mask, w, b, stride, pad,
                                 dilation)


# -- module-style packs (ref dcn/deform_conv.py:161-329) --------------------

def modulated_deform_conv_pack_init(key, cin: int, cout: int,
                                    kernel: int = 3):
    """DCNv2 'Pack': offsets+mask predicted by a plain conv from the input
    (ref ModulatedDeformConvPack :221-283; its conv_offset_mask is
    zero-initialized so training starts as a plain conv)."""
    from . import nn as N
    k1, k2 = jax.random.split(key)
    n_out = 3 * kernel * kernel
    return {
        "w": N.kaiming_normal(k1, (kernel, kernel, cin, cout),
                              kernel * kernel * cin),
        "b": jnp.zeros((cout,)),
        "conv_offset_mask": {
            "w": jnp.zeros((kernel, kernel, cin, n_out)),
            "b": jnp.zeros((n_out,)),
        },
    }


def modulated_deform_conv_pack_apply(p, x, stride: int = 1, pad: int = 1,
                                     dilation: int = 1):
    from . import nn as N
    k = p["w"].shape[0]
    om = N.conv2d(p["conv_offset_mask"], x, stride=stride, padding=pad)
    o1, o2, m = jnp.split(om, 3, axis=-1)
    # CUDA pack interleaves (dy, dx) per tap: o1 = dys, o2 = dxs
    offset = jnp.stack([o1, o2], axis=-1).reshape(
        om.shape[0], om.shape[1], om.shape[2], 2 * k * k)
    mask = jax.nn.sigmoid(m)
    return modulated_deform_conv(x, offset, mask, p["w"], p["b"],
                                 stride, pad, dilation)
