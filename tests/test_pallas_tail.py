"""Channel-first pad+conv7x7+tanh tail epilogue kernel vs the plain
composition (interpreter on CPU; same kernel compiles via Mosaic on TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cfen_vit_tpu.ops import nn as N
from cfen_vit_tpu.ops import pallas_tail as pt
from cfen_vit_tpu.models.generator import (_tail_epilogue_fused,
                                           _tail_epilogue_plain)


def _conv2(rng, out_c):
    p = N.conv_init(jax.random.PRNGKey(5), 7, 7, 12, out_c)
    return p


@pytest.mark.parametrize("out_c,hh", [(3, 64), (1, 64), (3, 128)])
def test_epilogue_matches_plain(rng, out_c, hh, monkeypatch):
    """hh=128 runs 2 strips of 64 — exercises the strip seam and the
    aligned-slab edge rows."""
    p = _conv2(rng, out_c)
    t2 = jnp.asarray(rng.randn(2, hh, hh, 12).astype(np.float32))
    ref = _tail_epilogue_plain(t2, p)
    monkeypatch.setattr(pt, "_INTERPRET", True)
    got = pt.conv7_tail_epilogue(t2, p["w"], p["b"])
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=3e-5, rtol=1e-4)


def test_epilogue_grads_match_plain(rng, monkeypatch):
    p = _conv2(rng, 3)
    t2 = jnp.asarray(rng.randn(1, 64, 64, 12).astype(np.float32))
    monkeypatch.setattr(pt, "_INTERPRET", True)
    gf = jax.grad(lambda tt, pp: jnp.sum(jnp.square(
        _tail_epilogue_fused(tt, pp))), argnums=(0, 1))(t2, p)
    gp = jax.grad(lambda tt, pp: jnp.sum(jnp.square(
        _tail_epilogue_plain(tt, pp))), argnums=(0, 1))(t2, p)
    fa, _ = jax.tree_util.tree_flatten(gf)
    fb, _ = jax.tree_util.tree_flatten(gp)
    for a, b in zip(fa, fb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-3, rtol=2e-3)


def test_dispatch_policy(monkeypatch):
    monkeypatch.setenv("CFEN_PALLAS_TAIL", "0")
    assert not pt.use_pallas_tail(8)
    # auto only engages at batch>=8 on TPU; on CPU it is always off
    monkeypatch.setenv("CFEN_PALLAS_TAIL", "auto")
    assert not pt.use_pallas_tail(4) or jax.devices()[0].platform != "cpu"
