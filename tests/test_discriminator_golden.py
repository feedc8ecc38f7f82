"""Discriminator + GANLoss golden parity vs models/networks.py."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.ref_utils import has_reference, ref_path

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.golden

if not has_reference():
    pytest.skip("reference repo unavailable", allow_module_level=True)


def _nchw(a):
    return torch.tensor(np.asarray(a).transpose(0, 3, 1, 2))


def test_nlayer_discriminator_matches_reference(rng):
    ref_path()
    from models import networks as refnet
    from cfen_vit_tpu.models.discriminator import nlayer_disc_apply

    torch.manual_seed(0)
    net = refnet.NLayerDiscriminator(6, ndf=8, n_layers=3,
                                     norm_layer=torch.nn.InstanceNorm2d)
    net.eval()
    convs = [m for m in net.model if isinstance(m, torch.nn.Conv2d)]
    p = {"layers": [
        {"w": m.weight.detach().numpy().transpose(2, 3, 1, 0),
         **({"b": m.bias.detach().numpy()} if m.bias is not None else {})}
        for m in convs]}
    x = rng.randn(2, 64, 64, 6).astype(np.float32)
    with torch.no_grad():
        ref = net(_nchw(x)).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(nlayer_disc_apply(p, jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_gan_loss_matches_reference(rng):
    ref_path()
    from models.networks import GANLoss
    from cfen_vit_tpu.losses.gan import gan_loss

    pred = rng.randn(2, 6, 6, 1).astype(np.float32)
    ref_loss = GANLoss(use_lsgan=True)
    for real in (True, False):
        ref = float(ref_loss(_nchw(pred), real))
        got = float(gan_loss(jnp.asarray(pred), real, use_lsgan=True))
        assert abs(ref - got) < 1e-6

    # vanilla (BCE on sigmoid outputs)
    prob = 1 / (1 + np.exp(-pred))
    ref_loss = GANLoss(use_lsgan=False)
    for real in (True, False):
        ref = float(ref_loss(_nchw(prob), real))
        got = float(gan_loss(jnp.asarray(prob), real, use_lsgan=False))
        assert abs(ref - got) < 1e-5
