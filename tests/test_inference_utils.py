"""chop/self-ensemble inference utilities."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cfen_vit_tpu.models.inference_utils import (
    self_ensemble_x8, chop_forward, _dihedral, _dihedral_inv)


def test_dihedral_roundtrip(rng):
    x = jnp.asarray(rng.randn(2, 6, 6, 3).astype(np.float32))
    for i in range(8):
        back = _dihedral_inv(_dihedral(x, i), i)
        np.testing.assert_allclose(np.asarray(back), np.asarray(x))


def test_self_ensemble_of_equivariant_fn_is_identity(rng):
    """For an elementwise fn, every ensemble member equals the plain
    output, so the average does too."""
    x = jnp.asarray(rng.randn(1, 8, 8, 3).astype(np.float32))
    fwd = lambda v: jnp.tanh(v) * 2.0
    np.testing.assert_allclose(np.asarray(self_ensemble_x8(fwd, x)),
                               np.asarray(fwd(x)), atol=1e-6)


def test_chop_identity_reconstructs(rng):
    x = jnp.asarray(rng.randn(1, 50, 70, 3).astype(np.float32))
    got = chop_forward(lambda v: v, x, tile=32, overlap=8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(x), atol=1e-5)


def test_chop_matches_full_forward_for_local_fn(rng):
    """A 3x3 mean filter is local, so tiled output == full output away
    from tile-local boundary effects; with blending the interior must
    agree tightly."""
    from cfen_vit_tpu.ops import nn as N
    w = jnp.ones((3, 3, 1, 1), jnp.float32) / 9.0

    def fwd(v):
        return N.conv2d({"w": w}, v, padding=1)

    x = jnp.asarray(rng.randn(1, 64, 96, 1).astype(np.float32))
    full = fwd(x)
    tiled = chop_forward(fwd, x, tile=32, overlap=8)
    diff = np.abs(np.asarray(full) - np.asarray(tiled))
    # only tile borders can differ (conv halo); interior of seams is blended
    assert np.median(diff) < 1e-6
    assert diff.mean() < 0.02


def test_chop_on_generator(rng):
    """End to end: run the tiny canonical generator on a 2x-larger image
    via chopping (the big-image capability the reference's vit_model.py
    chop path provided)."""
    from dataclasses import replace
    from cfen_vit_tpu.models.registry import generator_spec
    from cfen_vit_tpu.models.generator import generator_init, generator_forward

    spec = replace(generator_spec("iid_hlgvit_crs_gd4_cfs_v3"), n_feats=8,
                   load_size=64, patch_size=8, num_heads=2,
                   hidden_dim_ratio=2)
    params = generator_init(jax.random.PRNGKey(0), spec)
    fwd = jax.jit(lambda xx: generator_forward(params, spec, xx)["d"])
    x = jnp.asarray(rng.randn(1, 256, 256, 3).astype(np.float32))
    out = chop_forward(fwd, x, tile=128, overlap=32)
    assert out.shape == (1, 256, 256, 3)
    assert bool(jnp.all(jnp.isfinite(out)))
