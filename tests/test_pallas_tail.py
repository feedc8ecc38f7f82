"""Fused Pallas tail kernel vs the plain composition (interpreter on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cfen_vit_tpu.ops import nn as N
from cfen_vit_tpu.ops import pallas_tail as pt
from cfen_vit_tpu.models.generator import _tail_plain


def _params(rng, with_an2=True, out_c=3):
    key = jax.random.PRNGKey(11)
    ks = jax.random.split(key, 4)
    us = {"conv": N.conv_transpose_init(ks[0], 4, 4, 24, 12),
          "an": {"w": jnp.asarray(rng.randn(12).astype(np.float32)) * 0.1,
                 "b": jnp.asarray(rng.randn(12).astype(np.float32)) * 0.1,
                 "initialized": jnp.ones(())}}
    tail = {"conv1": N.conv_init(ks[1], 3, 3, 12, 12),
            "conv2": N.conv_init(ks[2], 7, 7, 12, out_c)}
    if with_an2:
        tail["an"] = {"w": jnp.asarray(rng.randn(12).astype(np.float32))
                      * 0.1,
                      "b": jnp.asarray(rng.randn(12).astype(np.float32))
                      * 0.1,
                      "initialized": jnp.ones(())}
    return us, tail


@pytest.mark.parametrize("with_an2,out_c", [(True, 3), (False, 1)])
def test_fused_tail_matches_plain(rng, with_an2, out_c, monkeypatch):
    us, tail = _params(rng, with_an2, out_c)
    x = jnp.asarray(rng.randn(2, 16, 16, 24).astype(np.float32))
    ref = _tail_plain(x, us, tail, out_c)
    monkeypatch.setattr(pt, "_INTERPRET", True)
    got = pt.fused_tail(x, us, tail, out_c)
    assert got.shape == (2, 32, 32, out_c)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=3e-5, rtol=1e-4)


def test_fused_tail_grads_match_plain(rng, monkeypatch):
    from cfen_vit_tpu.models.generator import _tail_fused
    us, tail = _params(rng, True, 3)
    x = jnp.asarray(rng.randn(1, 8, 8, 24).astype(np.float32))
    monkeypatch.setattr(pt, "_INTERPRET", True)

    gf = jax.grad(lambda xx, uu, tt: jnp.sum(
        jnp.square(_tail_fused(xx, uu, tt, 3))), argnums=(0, 1, 2))(
        x, us, tail)
    gp = jax.grad(lambda xx, uu, tt: jnp.sum(
        jnp.square(_tail_plain(xx, uu, tt, 3))), argnums=(0, 1, 2))(
        x, us, tail)
    fa, _ = jax.tree_util.tree_flatten(gf)
    fb, _ = jax.tree_util.tree_flatten(gp)
    for a, b in zip(fa, fb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-3, rtol=2e-3)
