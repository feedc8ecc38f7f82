"""Flash-MRF kernel correctness (interpreter mode on CPU).

Compares ops/pallas_mrf.py mrf_core — forward AND the hand-derived
custom-vjp backward (dense kernels + rank-1 argmin/argmax epilogues) —
against a straight-line dense jnp implementation of the same core math
differentiated by jax autodiff."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp


@pytest.fixture()
def rng():
    return np.random.RandomState(11)


def _dense_core(o_n, t_n):
    cos = jnp.einsum("nqc,npc->nqp", o_n, t_n,
                     preferred_element_type=jnp.float32)
    # the clamp is part of the spec (losses/vgg.py _mrf_rows): a no-op in
    # exact math, it guards the bf16 cos>1 -> negative-min -> exp-overflow
    # blowup seen on device (r4 trace: p=nan at step 16)
    cd = jnp.maximum(-(cos - 1.0) / 2.0, 0.0)
    rel = cd / (jnp.min(cd, axis=2, keepdims=True) + 1e-5)
    be = jnp.exp((1.0 - rel) / 0.5)
    cs = be / jnp.sum(be, axis=2, keepdims=True)
    k = jnp.max(cs, axis=1)
    return jnp.sum(-jnp.log(jnp.mean(k, axis=1)))


def _norm_rows(x):
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def test_flash_mrf_matches_dense(rng):
    from cfen_vit_tpu.ops.pallas_mrf import mrf_core
    os.environ["CFEN_PALLAS_INTERPRET"] = "1"
    try:
        o = jnp.asarray(_norm_rows(rng.randn(2, 128, 128)).astype(np.float32))
        t = jnp.asarray(_norm_rows(rng.randn(2, 128, 128)).astype(np.float32))
        ref = float(_dense_core(o, t))
        got = float(jax.jit(mrf_core)(o, t))
        assert abs(got - ref) < 1e-4 * max(1.0, abs(ref)), (got, ref)

        gref_o, gref_t = jax.grad(_dense_core, argnums=(0, 1))(o, t)
        got_o, got_t = jax.jit(jax.grad(mrf_core, argnums=(0, 1)))(o, t)
        np.testing.assert_allclose(np.asarray(got_o), np.asarray(gref_o),
                                   atol=2e-4, rtol=2e-3)
        np.testing.assert_allclose(np.asarray(got_t), np.asarray(gref_t),
                                   atol=2e-4, rtol=2e-3)
    finally:
        del os.environ["CFEN_PALLAS_INTERPRET"]


def test_flash_mrf_clamp_degenerate(rng):
    """cos > 1 inputs (the bf16 normalization-roundoff failure mode that
    NaN'd the r4 device trace at step 16): super-unit t rows duplicated
    from o make cd_raw < 0 on 8 of 64 q-rows.  Both paths must stay
    finite, agree in value, and agree on grads (the clamp zeroes d cos
    through the clamped argmin in both)."""
    from cfen_vit_tpu.ops.pallas_mrf import mrf_core
    os.environ["CFEN_PALLAS_INTERPRET"] = "1"
    try:
        o = _norm_rows(rng.randn(2, 64, 128)).astype(np.float32)
        t = _norm_rows(rng.randn(2, 64, 128)).astype(np.float32)
        t[:, :8] = o[:, :8] * 1.008          # cos[q,q] = 1.008 for q < 8
        o, t = jnp.asarray(o), jnp.asarray(t)

        ref = float(_dense_core(o, t))
        got = float(jax.jit(mrf_core)(o, t))
        assert np.isfinite(ref) and np.isfinite(got), (ref, got)
        assert abs(got - ref) < 1e-4 * max(1.0, abs(ref)), (got, ref)

        gref_o, gref_t = jax.grad(_dense_core, argnums=(0, 1))(o, t)
        got_o, got_t = jax.jit(jax.grad(mrf_core, argnums=(0, 1)))(o, t)
        for g in (gref_o, gref_t, got_o, got_t):
            assert bool(jnp.all(jnp.isfinite(g)))
        np.testing.assert_allclose(np.asarray(got_o), np.asarray(gref_o),
                                   atol=2e-4, rtol=2e-3)
        np.testing.assert_allclose(np.asarray(got_t), np.asarray(gref_t),
                                   atol=2e-4, rtol=2e-3)
    finally:
        del os.environ["CFEN_PALLAS_INTERPRET"]


def test_dense_mrf_bf16_features_finite(rng):
    """The public _mrf on IDENTICAL bf16 feature maps (worst case for
    cos > 1: every row's best match is its own bf16-rounded unit vector)
    must be finite with finite grads."""
    from cfen_vit_tpu.losses.vgg import _mrf
    f = rng.randn(1, 16, 16, 128).astype(np.float32)
    o = jnp.asarray(f, jnp.bfloat16)
    loss, g = jax.value_and_grad(
        lambda a: _mrf(a, o, block=128))(o)
    assert np.isfinite(float(loss))
    assert bool(jnp.all(jnp.isfinite(g.astype(jnp.float32))))


def test_flash_mrf_through_mrf_dispatch(rng):
    """losses/vgg.py _mrf with the kernel forced ON == the scan path,
    values and grads (interpreter mode; includes _normalize_feats)."""
    from cfen_vit_tpu.losses.vgg import _mrf
    o = jnp.asarray(rng.randn(1, 32, 32, 128).astype(np.float32))
    t = jnp.asarray(rng.randn(1, 32, 32, 128).astype(np.float32))
    os.environ["CFEN_PALLAS_MRF"] = "0"
    try:
        ref = float(_mrf(o, t, block=256))
        gref = jax.grad(lambda a: _mrf(a, t, block=256))(o)
    finally:
        del os.environ["CFEN_PALLAS_MRF"]
    os.environ["CFEN_PALLAS_MRF"] = "1"
    os.environ["CFEN_PALLAS_INTERPRET"] = "1"
    try:
        got = float(_mrf(o, t))
        g = jax.grad(lambda a: _mrf(a, t))(o)
    finally:
        del os.environ["CFEN_PALLAS_MRF"]
        del os.environ["CFEN_PALLAS_INTERPRET"]
    assert abs(got - ref) < 1e-4 * max(1.0, abs(ref)), (got, ref)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gref),
                               atol=2e-4, rtol=2e-3)
