"""Pooling / resize ops matching the reference's torch semantics.

  * avg_pool2          <- nn.AvgPool2d(2, stride=2) (ref v3:115-116, 1236-1237)
  * upsample_bilinear2 <- nn.Upsample(scale_factor=2, mode='bilinear',
                          align_corners=False) (ref v3:117-118, 1238-1239)

PyTorch bilinear with align_corners=False uses half-pixel source centers,
which for an exact 2x upscale reduces to the fixed 4-tap [1/4, 3/4] stencil
implemented here with pad+slice arithmetic — cheaper and more precisely
specified than a general resize, and fully fusable by XLA.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def avg_pool2(x):
    """2x2 mean pool, stride 2, NHWC."""
    out = lax.reduce_window(x, 0.0, lax.add, (1, 2, 2, 1), (1, 2, 2, 1),
                            "VALID")
    return out * 0.25


def _up2_1d(x, axis: int):
    # torch align_corners=False 2x: out[2i] = 0.25*in[i-1] + 0.75*in[i]
    #                               out[2i+1] = 0.75*in[i] + 0.25*in[i+1]
    # with edge clamping.
    left = jnp.concatenate(
        [lax.slice_in_dim(x, 0, 1, axis=axis), x], axis=axis)
    prev = lax.slice_in_dim(left, 0, x.shape[axis], axis=axis)
    nxt_src = jnp.concatenate(
        [x, lax.slice_in_dim(x, x.shape[axis] - 1, x.shape[axis], axis=axis)],
        axis=axis)
    nxt = lax.slice_in_dim(nxt_src, 1, x.shape[axis] + 1, axis=axis)
    even = 0.25 * prev + 0.75 * x
    odd = 0.75 * x + 0.25 * nxt
    stacked = jnp.stack([even, odd], axis=axis + 1)
    new_shape = list(x.shape)
    new_shape[axis] = 2 * x.shape[axis]
    return stacked.reshape(new_shape)


def upsample_bilinear2(x):
    """2x bilinear upsample, align_corners=False, NHWC."""
    return _up2_1d(_up2_1d(x, 1), 2)
