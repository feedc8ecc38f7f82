"""Deformable-conv correctness: conv equivalence, shift equivalence,
and custom-VJP grads vs plain autodiff.

The reference's CUDA extension cannot run here (no GPU, and it is dead code
in the reference main path — SURVEY.md section 2.8), so correctness is
established through mathematical invariants the CUDA kernels also satisfy.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cfen_vit_tpu.ops.deform_conv import (
    modulated_deform_conv, deform_conv, _sample_patches,
    modulated_deform_conv_pack_init, modulated_deform_conv_pack_apply)
from cfen_vit_tpu.ops import nn as N


def _conv_ref(x, w, b, stride=1, pad=1):
    return N.conv2d({"w": w, "b": b} if b is not None else {"w": w},
                    x, stride=stride, padding=pad)


def test_zero_offset_equals_conv(rng):
    x = jnp.asarray(rng.randn(2, 9, 10, 4).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 4, 6).astype(np.float32))
    b = jnp.asarray(rng.randn(6).astype(np.float32))
    off = jnp.zeros((2, 9, 10, 18), jnp.float32)
    mask = jnp.ones((2, 9, 10, 9), jnp.float32)
    got = modulated_deform_conv(x, off, mask, w, b, 1, 1, 1)
    ref = _conv_ref(x, w, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_zero_offset_stride2(rng):
    x = jnp.asarray(rng.randn(1, 8, 8, 3).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 3, 5).astype(np.float32))
    off = jnp.zeros((1, 4, 4, 18), jnp.float32)
    got = deform_conv(x, off, w, None, stride=2, pad=1)
    ref = _conv_ref(x, w, None, stride=2, pad=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_integer_offset_shifts_sampling(rng):
    """A constant integer offset (dy=1) equals sampling the shifted image."""
    x = jnp.asarray(rng.randn(1, 12, 12, 2).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 2, 4).astype(np.float32))
    off = jnp.zeros((1, 12, 12, 18), jnp.float32)
    off = off.at[..., 0::2].set(1.0)          # dy = +1 for every tap
    got = deform_conv(x, off, w, None)
    x_shift = jnp.pad(x, ((0, 0), (0, 1), (0, 0), (0, 0)))[:, 1:]
    ref = _conv_ref(x_shift, w, None)
    # interior rows (receptive fields away from both zero-pad boundaries,
    # where the shifted-image conv and the offset conv see identical data)
    np.testing.assert_allclose(np.asarray(got)[:, 1:10],
                               np.asarray(ref)[:, 1:10], atol=1e-4)


def test_fractional_offset_bilinear(rng):
    """dy=0.5 equals the average of dy=0 and dy=1 (bilinear linearity)."""
    x = jnp.asarray(rng.randn(1, 10, 10, 3).astype(np.float32))
    off0 = jnp.zeros((1, 10, 10, 18), jnp.float32)
    off1 = off0.at[..., 0::2].set(1.0)
    offh = off0.at[..., 0::2].set(0.5)
    p0 = _sample_patches(x, off0, 3, 1, 1, 1)
    p1 = _sample_patches(x, off1, 3, 1, 1, 1)
    ph = _sample_patches(x, offh, 3, 1, 1, 1)
    np.testing.assert_allclose(np.asarray(ph),
                               np.asarray((p0 + p1) / 2), atol=1e-5)


def test_custom_vjp_matches_autodiff(rng):
    x = jnp.asarray(rng.randn(1, 6, 6, 3).astype(np.float32))
    off = jnp.asarray(0.3 * rng.randn(1, 6, 6, 18).astype(np.float32))
    mask = jax.nn.sigmoid(jnp.asarray(rng.randn(1, 6, 6, 9)
                                      .astype(np.float32)))
    w = jnp.asarray(rng.randn(3, 3, 3, 4).astype(np.float32))
    b = jnp.asarray(rng.randn(4).astype(np.float32))

    def plain(x, off, mask, w, b):
        """Same math without custom_vjp."""
        p = _sample_patches(x, off, 3, 1, 1, 1) * mask[..., None]
        out = jnp.einsum("nhwkc,kco->nhwo", p, w.reshape(9, 3, 4)) + b
        return jnp.sum(out * jnp.cos(out))

    def custom(x, off, mask, w, b):
        out = modulated_deform_conv(x, off, mask, w, b, 1, 1, 1)
        return jnp.sum(out * jnp.cos(out))

    g_plain = jax.grad(plain, argnums=(0, 1, 2, 3, 4))(x, off, mask, w, b)
    g_custom = jax.grad(custom, argnums=(0, 1, 2, 3, 4))(x, off, mask, w, b)
    for a, c, name in zip(g_plain, g_custom,
                          ("x", "offset", "mask", "w", "b")):
        np.testing.assert_allclose(np.asarray(c), np.asarray(a), atol=2e-4,
                                   err_msg=name)


def test_pack_initial_state_is_plain_conv(rng):
    """conv_offset_mask is zero-init => pack == conv with sigmoid(0)=0.5
    mask scaling (matching the reference Pack's init semantics)."""
    p = modulated_deform_conv_pack_init(jax.random.PRNGKey(0), 3, 5)
    x = jnp.asarray(rng.randn(1, 8, 8, 3).astype(np.float32))
    got = modulated_deform_conv_pack_apply(p, x)
    ref = _conv_ref(x, p["w"], p["b"] if "b" in p else None) * 0.5 \
        + 0.5 * p["b"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_against_naive_torch_loop_golden(rng):
    """VERDICT r1 weak #6: an independent, obviously-correct reference.

    Implements deformable_im2col's bilinear-sampling semantics
    (/root/reference/dcn/src/deform_conv_cuda_kernel.cu:190-279: sample
    contributes iff the point is inside (-1, H)x(-1, W); each of the 4
    corners contributes iff its integer index is in bounds) as plain torch
    loops with autograd, and checks our forward and ALL grads (x, offset,
    mask, w, b) against it — including out-of-bounds boundary samples
    (offsets drawn wide enough to push taps outside the map).
    """
    import torch
    from cfen_vit_tpu.ops.deform_conv import modulated_deform_conv

    n, h, w_, c, o, k = 2, 6, 5, 3, 4, 3
    stride, pad, dil = 1, 1, 1
    oh = (h + 2 * pad - (dil * (k - 1) + 1)) // stride + 1
    ow = (w_ + 2 * pad - (dil * (k - 1) + 1)) // stride + 1

    x_np = rng.randn(n, h, w_, c).astype(np.float32)
    off_np = (rng.randn(n, oh, ow, 2 * k * k) * 2.0).astype(np.float32)
    mask_np = rng.rand(n, oh, ow, k * k).astype(np.float32)
    w_np = rng.randn(k, k, c, o).astype(np.float32)
    b_np = rng.randn(o).astype(np.float32)
    g_np = rng.randn(n, oh, ow, o).astype(np.float32)

    # ---- naive torch loop reference --------------------------------------
    xt = torch.tensor(x_np, requires_grad=True)
    ot = torch.tensor(off_np, requires_grad=True)
    mt = torch.tensor(mask_np, requires_grad=True)
    wt = torch.tensor(w_np, requires_grad=True)
    bt = torch.tensor(b_np, requires_grad=True)

    def bilinear(img, y, x):
        """img [H,W,C]; CUDA dmcn_im2col_bilinear + outer bounds check."""
        if not (-1 < float(y) < h and -1 < float(x) < w_):
            return torch.zeros(c)
        y0 = int(np.floor(float(y.detach())))
        x0 = int(np.floor(float(x.detach())))
        val = torch.zeros(c)
        for (yy, xx) in ((y0, x0), (y0, x0 + 1), (y0 + 1, x0),
                         (y0 + 1, x0 + 1)):
            if 0 <= yy < h and 0 <= xx < w_:
                wgt = (1 - abs(y - yy)) * (1 - abs(x - xx))
                val = val + wgt * img[yy, xx]
        return val

    out_ref = torch.zeros(n, oh, ow, o)
    for ni in range(n):
        for oy in range(oh):
            for ox in range(ow):
                acc = torch.zeros(o)
                for ky in range(k):
                    for kx in range(k):
                        t = ky * k + kx
                        y = (oy * stride - pad + ky * dil
                             + ot[ni, oy, ox, 2 * t])
                        x = (ox * stride - pad + kx * dil
                             + ot[ni, oy, ox, 2 * t + 1])
                        v = bilinear(xt[ni], y, x) * mt[ni, oy, ox, t]
                        acc = acc + v @ wt[ky, kx]
                out_ref[ni, oy, ox] = acc + bt
    (out_ref * torch.tensor(g_np)).sum().backward()

    # ---- ours -------------------------------------------------------------
    args = tuple(map(jnp.asarray, (x_np, off_np, mask_np, w_np, b_np)))
    out = modulated_deform_conv(*args, stride, pad, dil)
    np.testing.assert_allclose(np.asarray(out),
                               out_ref.detach().numpy(), atol=2e-4)

    def loss(xx, oo, mm, ww, bb):
        y = modulated_deform_conv(xx, oo, mm, ww, bb, stride, pad, dil)
        return jnp.sum(y * jnp.asarray(g_np))

    grads = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(*args)
    for got, ref_t, name in zip(
            grads, (xt, ot, mt, wt, bt), ("x", "offset", "mask", "w", "b")):
        np.testing.assert_allclose(np.asarray(got), ref_t.grad.numpy(),
                                   atol=3e-4, err_msg=f"grad {name}")
