"""Pallas deformable-conv kernel correctness (interpreter mode on CPU).

Compares ops/pallas_deform.py (block-local one-hot gather GEMM, VERDICT r4
#1) against the XLA-gather reference ops/deform_conv.py — which itself is
golden-tested against a naive torch loop (tests/test_deform_conv.py) — for
the forward and, through the dispatching custom_vjp, all 5 gradients.
Offsets are drawn inside the |d| <= CFEN_DCN_MAXDISP clamp window, where
the kernel's contract is exactness."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cfen_vit_tpu.ops.deform_conv import modulated_deform_conv
from cfen_vit_tpu.ops.pallas_deform import modulated_deform_conv_pallas


@pytest.fixture()
def rng():
    return np.random.RandomState(7)


def _inputs(rng, n=2, h=20, w=28, c=8, o=16, k=3, off_scale=4.0):
    x = jnp.asarray(rng.randn(n, h, w, c), jnp.float32)
    off = jnp.asarray(np.clip(rng.randn(n, h, w, 2 * k * k) * off_scale,
                              -11.5, 11.5), jnp.float32)
    mask = jnp.asarray(rng.rand(n, h, w, k * k), jnp.float32)
    wt = jnp.asarray(rng.randn(k, k, c, o) * 0.1, jnp.float32)
    b = jnp.asarray(rng.randn(o) * 0.1, jnp.float32)
    return x, off, mask, wt, b


def test_forward_matches_xla(rng):
    x, off, mask, wt, b = _inputs(rng)
    ref = modulated_deform_conv(x, off, mask, wt, b, 1, 1, 1)
    got = modulated_deform_conv_pallas(x, off, mask, wt, b, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_forward_k5(rng):
    x, _, _, _, _ = _inputs(rng)
    k = 5
    n, h, w, c = x.shape
    off = jnp.asarray(np.clip(rng.randn(n, h, w, 2 * k * k) * 3.0, -11, 11),
                      jnp.float32)
    mask = jnp.asarray(rng.rand(n, h, w, k * k), jnp.float32)
    wt = jnp.asarray(rng.randn(k, k, c, 8) * 0.1, jnp.float32)
    ref = modulated_deform_conv(x, off, mask, wt, None, 1, 2, 1)
    got = modulated_deform_conv_pallas(x, off, mask, wt, None, 1, 2, 1,
                                       interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_dispatch_all_five_grads(rng):
    """CFEN_PALLAS_DCN=1 routes the custom_vjp primal/forward through the
    kernel (interpret on CPU); the closed-form XLA backward must keep
    producing the same 5 grads as the pure-XLA path."""
    x, off, mask, wt, b = _inputs(rng, h=16, w=16)

    def loss(x, o, m, w, b):
        return jnp.sum(modulated_deform_conv(x, o, m, w, b, 1, 1, 1) ** 2)

    grads_ref = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(x, off, mask, wt, b)
    os.environ["CFEN_PALLAS_DCN"] = "1"
    try:
        out_k = modulated_deform_conv(x, off, mask, wt, b, 1, 1, 1)
        grads_k = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(
            x, off, mask, wt, b)
    finally:
        del os.environ["CFEN_PALLAS_DCN"]
    out_ref = modulated_deform_conv(x, off, mask, wt, b, 1, 1, 1)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_ref),
                               atol=1e-5, rtol=1e-5)
    for gk, gr in zip(grads_k, grads_ref):
        np.testing.assert_allclose(np.asarray(gk), np.asarray(gr),
                                   atol=1e-4, rtol=1e-4)


def test_fallback_on_unsupported_geometry(rng):
    """stride/dilation/pad outside the kernel contract must silently take
    the XLA path even when the kernel is forced on."""
    x, _, _, wt, b = _inputs(rng, h=16, w=16)
    k = 3
    off = jnp.asarray(rng.randn(2, 14, 14, 2 * k * k), jnp.float32)
    mask = jnp.asarray(rng.rand(2, 14, 14, k * k), jnp.float32)
    os.environ["CFEN_PALLAS_DCN"] = "1"
    try:
        # pad != k//2 -> fallback; just needs to run and match the XLA path
        got = modulated_deform_conv(x, off, mask, wt, b, 1, 0, 1)
    finally:
        del os.environ["CFEN_PALLAS_DCN"]
    ref = modulated_deform_conv(x, off, mask, wt, b, 1, 0, 1)
    assert got.shape == (2, 14, 14, 16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)
