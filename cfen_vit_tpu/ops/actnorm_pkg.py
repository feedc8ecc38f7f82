"""The vendored `actnorm` pip package's parameterization (1d/2d/3d).

The reference ships TWO ActNorm implementations (SURVEY.md section 2.5):
models/actnorm.py (`y=(x+bias)*exp(weight)`, log-variance init, used by the
generators — ours lives in ops/nn.py) and this standalone package
(actnorm/actnorm/actnorm.py:7-55: `y = scale*x + bias`, scale = 1/std with
the *biased* std, bias = -scale*mean), which nothing on the main path
imports but whose pytest suite is the reference's only real test coverage
(actnorm/tests/test_actnorm.py).  Provided for API parity, channel-last:
the channel axis is the LAST axis for any rank >= 2 (the torch version
transposes dim 1 <-> -1 internally; NHWC makes that a no-op here).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def actnorm_pkg_init(num_features: int):
    return {"scale": jnp.zeros((num_features,)),
            "bias": jnp.zeros((num_features,)),
            "initialized": jnp.zeros((), jnp.float32)}


def actnorm_pkg_reset(p):
    """reset_() parity: next apply re-initializes from its batch."""
    return {**p, "initialized": jnp.zeros((), jnp.float32)}


def actnorm_pkg_apply(p, x, rank: int = 0) -> Tuple[jnp.ndarray, dict]:
    """Returns (y, params) — params updated on first (uninitialized) call.

    rank: expected spatial rank for dim checking (0 = skip; 1d accepts
    2/3-D, 2d requires 4-D, 3d requires 5-D like the torch classes)."""
    if rank == 1 and x.ndim not in (2, 3):
        raise ValueError(f"expected 2D or 3D input (got {x.ndim}D input)")
    if rank == 2 and x.ndim != 4:
        raise ValueError(f"expected 4D input (got {x.ndim}D input)")
    if rank == 3 and x.ndim != 5:
        raise ValueError(f"expected 5D input (got {x.ndim}D input)")
    flat = x.reshape(-1, x.shape[-1])
    std = jnp.std(flat, axis=0)          # biased (torch unbiased=False)
    mean = jnp.mean(flat, axis=0)
    new_scale = 1.0 / std
    new_bias = -new_scale * mean
    done = p["initialized"] > 0
    scale = jnp.where(done, p["scale"], new_scale)
    bias = jnp.where(done, p["bias"], new_bias)
    y = scale * x + bias
    return y, {"scale": scale, "bias": bias,
               "initialized": jnp.ones((), jnp.float32)}
