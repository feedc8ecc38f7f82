"""Auxiliary losses/ops from the reference's util/ (inventory completeness).

  * adain          <- util/adain.py:4-24 (AdaIN style transfer: re-normalize
                      content statistics to style statistics per channel;
                      note the reference computes mu/sigma per (n, c) — the
                      eps 2.3e-8 inside the sqrt is reproduced)
  * mind / mind_loss <- util/mindloss.py:5-113 (MIND self-similarity
                      descriptor: shifted-image L2 patch distances gaussian-
                      weighted over a 9x9 non-local region, normalized by
                      local neighborhood variance; loss = mean-ish L1 of
                      descriptors).  Shift/patch convs become XLA ops:
                      shifts are pad+slice, the gaussian patch sum is one
                      depthwise conv.

Both are unused by the reference's main training path (SURVEY.md section
2.10) but part of its surface; here they are usable loss plugins.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
from jax import lax

_DN = lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                 ("NHWC", "HWIO", "NHWC"))


def adain(x, y, eps: float = 2.3e-8):
    """x: content [N,H,W,C], y: style [N,H,W,C] -> x re-styled."""
    def mu(t):
        return jnp.mean(t, axis=(1, 2), keepdims=True)

    def sigma(t):
        return jnp.sqrt(jnp.sum(jnp.square(t - mu(t)), axis=(1, 2),
                                keepdims=True) / (t.shape[1] * t.shape[2])
                        + eps)

    return sigma(y) * (x - mu(x)) / sigma(x) + mu(y)


def _shifts(x, k: int):
    """All k*k integer shifts of a 1-channel map: [N,H,W,1] -> [N,H,W,k*k].

    Equals the reference's one-hot 'image_shifter' conv
    (util/mindloss.py:16-26); channel i holds the (dx=i%k, dy=i//k) shift
    to match its weight layout t[0, i%k, i//k] = 1."""
    r = (k - 1) // 2
    xp = jnp.pad(x[..., 0], ((0, 0), (r, r), (r, r)))
    h, w = x.shape[1], x.shape[2]
    outs = []
    for i in range(k * k):
        ky, kx = i % k, i // k   # reference layout: t[0, i%k, i//k]
        outs.append(xp[:, ky:ky + h, kx:kx + w])
    return jnp.stack(outs, axis=-1)


def _gaussian_patch_sum(d, p: int, sigma2: float):
    """Depthwise conv with the reference's gaussian patch kernel
    (exp(-||offset||_2 / sigma^2) — note: distance, not squared)."""
    c = d.shape[-1]
    cx = (p - 1) // 2
    g = jnp.zeros((p, p))
    for j in range(p * p):
        x, y = j % p, j // p
        d2 = math.sqrt((x - cx) ** 2 + (y - cx) ** 2)
        g = g.at[x, y].set(math.exp(-d2 / sigma2))
    k = jnp.tile(g[:, :, None, None], (1, 1, 1, c)).astype(d.dtype)
    return lax.conv_general_dilated(
        d, k, (1, 1), ((cx, cx), (cx, cx)), dimension_numbers=_DN,
        feature_group_count=c)


def mind(x, nl_size: int = 9, patch_size: int = 7, neighbor_size: int = 3,
         sigma: float = 3.0):
    """MIND descriptor of a 1-channel image [N,H,W,1] -> [N,H,W,nl^2]."""
    sigma2 = sigma * sigma
    shifted = _shifts(x, nl_size)
    diff = shifted - x
    dx_alpha = _gaussian_patch_sum(jnp.square(diff), patch_size, sigma2)
    neigh = _shifts(x, neighbor_size)
    # box patch-sum over the same patch window (all-ones kernel)
    c = neigh.shape[-1]
    cx = (patch_size - 1) // 2
    ones = jnp.ones((patch_size, patch_size, 1, c), x.dtype)
    neigh_sum = lax.conv_general_dilated(
        neigh, ones, (1, 1), ((cx, cx), (cx, cx)), dimension_numbers=_DN,
        feature_group_count=c)
    vx = jnp.var(neigh_sum, axis=-1, keepdims=True, ddof=1)  # torch unbiased
    nume = jnp.exp(-dx_alpha / (vx + 1e-8))
    return nume / jnp.sum(nume, axis=-1, keepdims=True)


def mind_loss(pred, target, nl_size: int = 9, **kw):
    """L1 between MIND descriptors, normalized like the reference
    (util/mindloss.py:98-113)."""
    m1 = mind(pred, nl_size=nl_size, **kw)
    m2 = mind(target, nl_size=nl_size, **kw)
    l1 = jnp.sum(jnp.abs(m1 - m2))
    return l1 / (pred.shape[1] * pred.shape[2] * nl_size * nl_size)
