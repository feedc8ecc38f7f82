"""Color-gradient op mirroring the reference's GradientColor_Net.

Ref models/gradient.py:25-62: per-RGB-channel central differences with fixed
3x3 kernels, padding=2 (note: the reference pads by 2 with a 3x3 kernel, so
the output is H+2 x W+2 — reproduced here since the gradient loss compares
two such maps), then sqrt(gx^2 + gy^2 + 1e-6) per channel.

Rather than six single-channel convs we compute the two shifts directly:
the kernels are pure +/-1 taps, i.e. gv[i,j] = x[i+1,j] - x[i-1,j] on the
zero-padded map, which XLA fuses into a couple of vector ops.
"""

from __future__ import annotations

import jax.numpy as jnp


def color_gradient(x):
    """x: [N,H,W,3] -> [N,H+2,W+2,3] gradient magnitude per channel."""
    # zero-pad by 2 on each side, then 3x3 valid conv => out = H+2.
    xp = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)))
    # vertical kernel [[0,-1,0],[0,0,0],[0,1,0]]: out[i,j] = xp[i+2,j+1]-xp[i,j+1]
    gv = xp[:, 2:, 1:-1, :] - xp[:, :-2, 1:-1, :]
    # horizontal kernel [[0,0,0],[-1,0,1],[0,0,0]]: out[i,j] = xp[i+1,j+2]-xp[i+1,j]
    gh = xp[:, 1:-1, 2:, :] - xp[:, 1:-1, :-2, :]
    return jnp.sqrt(gv * gv + gh * gh + 1e-6)
