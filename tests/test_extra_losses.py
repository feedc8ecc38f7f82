"""AdaIN / MIND parity vs the reference's util implementations (torch)."""

import numpy as np
import pytest

import jax.numpy as jnp

from tests.ref_utils import has_reference, ref_path

torch = pytest.importorskip("torch")


def _nchw(a):
    return torch.tensor(np.asarray(a).transpose(0, 3, 1, 2))


def test_adain_matches_reference(rng):
    if not has_reference():
        pytest.skip("no reference")
    ref_path()
    from util.adain import AdaIN
    from cfen_vit_tpu.losses.extra import adain
    x = rng.randn(2, 8, 8, 4).astype(np.float32)
    y = rng.randn(2, 8, 8, 4).astype(np.float32) * 2 + 1
    ref = AdaIN()(_nchw(x), _nchw(y)).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(adain(jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_mind_loss_matches_reference(rng):
    if not has_reference():
        pytest.skip("no reference")
    ref_path()
    from util.mindloss import MINDLoss
    from cfen_vit_tpu.losses.extra import mind_loss
    a = rng.rand(1, 24, 24, 1).astype(np.float32)
    b = rng.rand(1, 24, 24, 1).astype(np.float32)
    with torch.no_grad():
        ref = float(MINDLoss()(_nchw(a), _nchw(b)))
    got = float(mind_loss(jnp.asarray(a), jnp.asarray(b)))
    assert abs(ref - got) < 1e-4 * max(1.0, abs(ref))
