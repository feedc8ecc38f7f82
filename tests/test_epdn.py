"""EPDN network family: golden parity for Dehaze + GlobalGenerator +
NLayerDiscriminator vs the reference epdn_networks (torch-cpu with a
stubbed torchvision — the reference file imports it at module level for
its VGG but the generator classes don't need it), plus run/shape tests for
LocalEnhancer and MultiscaleDiscriminator."""

import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.ref_utils import has_reference, ref_path

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.golden

if not has_reference():
    pytest.skip("reference repo unavailable", allow_module_level=True)


@pytest.fixture(scope="module")
def ref_epdn():
    ref_path()
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.models = types.SimpleNamespace(vgg19=None)
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tv.models
    from epdn import epdn_networks
    return epdn_networks


def _nchw(a):
    return torch.tensor(np.asarray(a).transpose(0, 3, 1, 2))


def _conv(m):
    p = {"w": m.weight.detach().numpy().transpose(2, 3, 1, 0)}
    if m.bias is not None:
        p["b"] = m.bias.detach().numpy()
    return p


def _convT(m):
    w = m.weight.detach().numpy()[:, :, ::-1, ::-1]
    return {"w": np.ascontiguousarray(w.transpose(2, 3, 0, 1)),
            "b": m.bias.detach().numpy()}


def test_dehaze_matches_reference(ref_epdn, rng):
    from cfen_vit_tpu.models.epdn import dehaze_apply
    torch.manual_seed(0)
    net = ref_epdn.Dehaze().eval()
    p = {k: _conv(getattr(net, k)) for k in
         ("refine1", "refine2", "conv1010", "conv1020", "conv1030",
          "conv1040", "refine3")}
    x = rng.randn(1, 64, 64, 6).astype(np.float32)
    with torch.no_grad():
        ref = net(_nchw(x)).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(dehaze_apply(p, jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_global_generator_matches_reference(ref_epdn, rng):
    from cfen_vit_tpu.models.epdn import global_generator_apply
    torch.manual_seed(1)
    nd, nb, ngf = 2, 2, 8
    net = ref_epdn.GlobalGenerator(3, 3, ngf, nd, nb,
                                   norm_layer=torch.nn.InstanceNorm2d).eval()
    seq = net.model
    p = {"head": _conv(seq[1]),
         "down": [_conv(seq[4 + 3 * i]) for i in range(nd)],
         "blocks": [{"c1": _conv(seq[4 + 3 * nd + j].conv_block[1]),
                     "c2": _conv(seq[4 + 3 * nd + j].conv_block[5])}
                    for j in range(nb)],
         "up": [_convT(seq[4 + 3 * nd + nb + 3 * i]) for i in range(nd)],
         "tail": _conv(seq[4 + 3 * nd + nb + 3 * nd + 1])}
    x = rng.randn(1, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        ref = net(_nchw(x)).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(global_generator_apply(p, jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_epdn_nlayer_disc_matches_reference(ref_epdn, rng):
    from cfen_vit_tpu.models.epdn import _epdn_nlayer_apply
    torch.manual_seed(2)
    net = ref_epdn.NLayerDiscriminator(
        6, ndf=8, n_layers=3, norm_layer=torch.nn.InstanceNorm2d).eval()
    convs = [m for m in net.model if isinstance(m, torch.nn.Conv2d)]
    p = {"convs": [_conv(m) for m in convs]}
    x = rng.randn(1, 64, 64, 6).astype(np.float32)
    with torch.no_grad():
        ref = net(_nchw(x)).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(_epdn_nlayer_apply(p, jnp.asarray(x))[-1])
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_local_enhancer_and_msd_run(rng):
    from cfen_vit_tpu.models.epdn import (
        local_enhancer_init, local_enhancer_apply,
        multiscale_disc_init, multiscale_disc_apply)
    p = local_enhancer_init(jax.random.PRNGKey(0), ngf=8,
                            n_downsample_global=2, n_blocks_global=2,
                            n_blocks_local=1)
    x = jnp.asarray(rng.randn(1, 128, 128, 3).astype(np.float32))
    out, dh = jax.jit(local_enhancer_apply)(p, x)
    assert out.shape == (1, 128, 128, 3) and dh.shape == (1, 128, 128, 3)

    dp = multiscale_disc_init(jax.random.PRNGKey(1), 6, ndf=8)
    preds = multiscale_disc_apply(dp, jnp.asarray(
        rng.randn(1, 128, 128, 6).astype(np.float32)))
    assert len(preds) == 3 and all(len(s) == 1 for s in preds)
