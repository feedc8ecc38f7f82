"""GAN loss (ref models/networks.py:119-138).

LS-GAN by default: MSE against an expanded 1.0/0.0 target; BCE when
`--no_lsgan` (discriminator then outputs sigmoid probabilities).
"""

from __future__ import annotations

import jax.numpy as jnp


def gan_loss(pred, target_is_real: bool, use_lsgan: bool = True):
    target = 1.0 if target_is_real else 0.0
    if use_lsgan:
        return jnp.mean(jnp.square(pred - target))
    eps = 1e-12
    p = jnp.clip(pred, eps, 1.0 - eps)
    return -jnp.mean(target * jnp.log(p) + (1.0 - target) * jnp.log(1.0 - p))
