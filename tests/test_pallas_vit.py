"""Fused ViT-block Pallas kernel vs the plain jnp token pipeline.

Runs the kernel through the Pallas interpreter on CPU (the same kernel
compiles for TPU via Mosaic).  Covers forward equality at fp32, the
custom_vjp backward (must equal grads of the plain path), and the bn>1
token-block grouping.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cfen_vit_tpu.models.vit import ViTSpec, vit_init, vit_tokens_apply
from cfen_vit_tpu.ops import pallas_vit as pv
from cfen_vit_tpu.ops.patch import unfold_tokens


def _mk(rng, n_tiles, img_dim=16, pd=2, c=24, heads=4, ratio=4):
    spec = ViTSpec(img_dim=img_dim, patch_dim=pd, num_channels=c,
                   embedding_dim=c * pd * pd, num_heads=heads, num_layers=1,
                   hidden_dim=c * pd * pd * ratio)
    p = vit_init(jax.random.PRNGKey(3), spec)
    t = jnp.asarray(rng.randn(n_tiles, spec.seq_length,
                              spec.flatten_dim).astype(np.float32))
    return spec, p, t


@pytest.mark.parametrize("n_tiles", [3, 8])
def test_fused_vit_matches_plain(rng, n_tiles, monkeypatch):
    spec, p, t = _mk(rng, n_tiles)
    ref = vit_tokens_apply(p, spec, t, allow_pallas=False)
    monkeypatch.setattr(pv, "_INTERPRET", True)
    got = pv.fused_vit_tokens(p, spec, t)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-5, rtol=1e-4)


def test_fused_vit_grads_match_plain(rng, monkeypatch):
    spec, p, t = _mk(rng, 2, img_dim=8, c=8, heads=2, ratio=2)
    monkeypatch.setattr(pv, "_INTERPRET", True)

    def loss_fused(pp, tt):
        return jnp.sum(jnp.square(pv.fused_vit_tokens(pp, spec, tt)))

    def loss_plain(pp, tt):
        return jnp.sum(jnp.square(
            vit_tokens_apply(pp, spec, tt, allow_pallas=False)))

    gf_p, gf_t = jax.grad(loss_fused, argnums=(0, 1))(p, t)
    gp_p, gp_t = jax.grad(loss_plain, argnums=(0, 1))(p, t)
    np.testing.assert_allclose(np.asarray(gf_t), np.asarray(gp_t),
                               atol=1e-3, rtol=1e-3)
    flat_f, _ = jax.tree_util.tree_flatten(gf_p)
    flat_p, _ = jax.tree_util.tree_flatten(gp_p)
    for a, b in zip(flat_f, flat_p):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-3, rtol=1e-3)


def test_supported_matrix():
    mk = lambda **kw: ViTSpec(**{**dict(
        img_dim=32, patch_dim=2, num_channels=24, embedding_dim=96,
        num_heads=4, num_layers=1, hidden_dim=384), **kw})
    p = None
    # the measured dispatch threshold excludes small-E blocks (E<256:
    # XLA's fused einsums win there — BASELINE.md r2)
    assert not pv.supported(p, mk())
    # canonical LViT L3 / GViT L1 size fits
    assert pv.supported(p, mk(num_channels=96, embedding_dim=384,
                              hidden_dim=1536))
    # GViT L3: seq 16 -> einsum path
    assert not pv.supported(p, mk(img_dim=16, patch_dim=4,
                                  embedding_dim=1536, hidden_dim=6144))
    # flag variants fall back
    assert not pv.supported(p, mk(no_norm=True))
    assert not pv.supported(p, mk(no_mlp=True))
    assert not pv.supported(p, mk(pos_every=True))
    assert not pv.supported(p, mk(no_pos=True))
