"""Channel-first fused stem kernel vs the plain composition (interpreter)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cfen_vit_tpu.ops import nn as N
from cfen_vit_tpu.ops import pallas_stem as ps
from cfen_vit_tpu.models.generator import _stem_plain, _stem_fused


def _head(key=3):
    k = jax.random.PRNGKey(key)
    k1, k2, k3 = jax.random.split(k, 3)
    return {"conv": N.conv_init(k1, 5, 5, 3, 12),
            "res": {"c1": N.conv_init(k2, 3, 3, 12, 12),
                    "c2": N.conv_init(k3, 3, 3, 12, 12)}}


@pytest.mark.parametrize("hh", [64, 128])
def test_fused_stem_matches_plain(rng, hh, monkeypatch):
    """hh=128 runs 2 strips — exercises the slab halo and edge row masks."""
    p = _head()
    x = jnp.asarray(rng.randn(2, hh, hh, 3).astype(np.float32))
    ref = _stem_plain(x, p)
    monkeypatch.setattr(ps, "_INTERPRET", True)
    got = ps.fused_stem(x, p)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-5, rtol=1e-4)


def test_fused_stem_grads_match_plain(rng, monkeypatch):
    p = _head()
    x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    monkeypatch.setattr(ps, "_INTERPRET", True)
    gf = jax.grad(lambda xx, pp: jnp.sum(jnp.square(
        _stem_fused(xx, pp))), argnums=(0, 1))(x, p)
    gp = jax.grad(lambda xx, pp: jnp.sum(jnp.square(
        _stem_plain(xx, pp))), argnums=(0, 1))(x, p)
    fa, _ = jax.tree_util.tree_flatten(gf)
    fb, _ = jax.tree_util.tree_flatten(gp)
    for a, b in zip(fa, fb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-3, rtol=2e-3)
