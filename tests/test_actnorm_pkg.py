"""Port of the vendored actnorm package's pytest suite
(ref actnorm/tests/test_actnorm.py:6-75): normalization statistics,
re-init via reset_, rank-equivalence between 1d/2d/3d views, and the
error paths on wrong input ranks."""

import numpy as np
import pytest

import jax.numpy as jnp

from cfen_vit_tpu.ops.actnorm_pkg import (
    actnorm_pkg_init, actnorm_pkg_apply, actnorm_pkg_reset)


def test_normalizes_first_batch(rng):
    x = jnp.asarray((rng.randn(64, 5) * 3 + 7).astype(np.float32))
    y, p = actnorm_pkg_apply(actnorm_pkg_init(5), x, rank=1)
    np.testing.assert_allclose(np.asarray(y).mean(0), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(y).std(0), 1.0, atol=1e-4)
    # second batch uses frozen params
    x2 = jnp.asarray((rng.randn(64, 5) * 3 + 7).astype(np.float32))
    y2, p2 = actnorm_pkg_apply(p, x2, rank=1)
    np.testing.assert_allclose(np.asarray(p2["scale"]),
                               np.asarray(p["scale"]))
    assert abs(float(jnp.mean(y2))) < 0.2  # near zero but not exactly (frozen stats)


def test_reset_reinitializes(rng):
    x = jnp.asarray(rng.randn(32, 3).astype(np.float32))
    _, p = actnorm_pkg_apply(actnorm_pkg_init(3), x, rank=1)
    p = actnorm_pkg_reset(p)
    x2 = jnp.asarray((rng.randn(32, 3) * 10).astype(np.float32))
    y2, p2 = actnorm_pkg_apply(p, x2, rank=1)
    np.testing.assert_allclose(np.asarray(y2).std(0), 1.0, atol=1e-4)


def test_rank_equivalence(rng):
    """Same data viewed as 1d/2d/3d normalizes identically
    (ref test_actnorm.py:26-75)."""
    base = rng.randn(2, 6, 4).astype(np.float32)       # [N, L, C]
    y1, _ = actnorm_pkg_apply(actnorm_pkg_init(4), jnp.asarray(base), rank=1)
    as2d = base.reshape(2, 2, 3, 4)                     # [N, H, W, C]
    y2, _ = actnorm_pkg_apply(actnorm_pkg_init(4), jnp.asarray(as2d), rank=2)
    np.testing.assert_allclose(np.asarray(y2).reshape(2, 6, 4),
                               np.asarray(y1), atol=1e-6)
    as3d = base.reshape(2, 1, 2, 3, 4)
    y3, _ = actnorm_pkg_apply(actnorm_pkg_init(4), jnp.asarray(as3d), rank=3)
    np.testing.assert_allclose(np.asarray(y3).reshape(2, 6, 4),
                               np.asarray(y1), atol=1e-6)


def test_wrong_rank_raises(rng):
    x = jnp.asarray(rng.randn(2, 3, 4, 5).astype(np.float32))
    with pytest.raises(ValueError):
        actnorm_pkg_apply(actnorm_pkg_init(5), x, rank=3)
    with pytest.raises(ValueError):
        actnorm_pkg_apply(actnorm_pkg_init(5), x[0], rank=2)


def test_matches_reference_package(rng):
    from tests.ref_utils import has_reference, ref_path
    if not has_reference():
        pytest.skip("no reference")
    import sys
    sys.path.insert(0, "/root/reference/actnorm")
    import torch
    from actnorm import ActNorm2d
    x = (rng.randn(2, 8, 8, 5) * 2 + 1).astype(np.float32)
    m = ActNorm2d(5)
    ref = m(torch.tensor(x.transpose(0, 3, 1, 2))).detach().numpy()
    y, _ = actnorm_pkg_apply(actnorm_pkg_init(5), jnp.asarray(x), rank=2)
    np.testing.assert_allclose(np.asarray(y), ref.transpose(0, 2, 3, 1),
                               atol=1e-5)
