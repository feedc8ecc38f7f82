"""Golden tests: networks_alt ports vs /root/reference/models/networks.py
(ResnetGenerator, UnetGenerator, Classifier) weight-for-weight."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.ref_utils import has_reference, ref_path

pytestmark = pytest.mark.golden

if not has_reference():
    pytest.skip("reference repo unavailable", allow_module_level=True)

torch = pytest.importorskip("torch")


def _copy_into_torch(tmod, ours):
    """ours: list of (kind, w, b) in torch's named-parameter module order.
    kind: 'conv' | 'convT' | 'linear' | 'norm'."""
    mods = [m for m in tmod.modules()
            if isinstance(m, (torch.nn.Conv2d, torch.nn.ConvTranspose2d,
                              torch.nn.Linear, torch.nn.InstanceNorm2d))
            and any(True for _ in m.parameters(recurse=False))]
    assert len(mods) == len(ours), (len(mods), len(ours))
    with torch.no_grad():
        for m, (kind, w, b) in zip(mods, ours):
            w = np.asarray(w)
            if kind == "conv":
                m.weight.copy_(torch.tensor(w.transpose(3, 2, 0, 1)))
            elif kind == "convT":
                wt = w.transpose(2, 3, 0, 1)[:, :, ::-1, ::-1]
                m.weight.copy_(torch.tensor(np.ascontiguousarray(wt)))
            elif kind == "linear":
                m.weight.copy_(torch.tensor(w.T))
            else:  # norm (affine InstanceNorm): w=g, b=b
                m.weight.copy_(torch.tensor(w))
            if b is not None:
                m.bias.copy_(torch.tensor(np.asarray(b)))


def _nchw(a):
    return torch.tensor(np.asarray(a).transpose(0, 3, 1, 2))


def test_resnet_generator_golden(rng):
    ref_path()
    from models import networks as refnet
    from cfen_vit_tpu.models.networks_alt import (resnet_generator_init,
                                                  resnet_generator_apply)
    p = resnet_generator_init(jax.random.PRNGKey(0), 3, 3, ngf=16,
                              n_blocks=2)
    tnet = refnet.ResnetGenerator(3, 3, ngf=16, n_blocks=2).eval()
    ours = [("conv", p["head"]["w"], p["head"]["b"])]
    ours += [("conv", p[f"down{i}"]["w"], p[f"down{i}"]["b"])
             for i in range(2)]
    for blk in p["blocks"]:
        ours += [("conv", blk["c1"]["w"], blk["c1"]["b"]),
                 ("conv", blk["c2"]["w"], blk["c2"]["b"])]
    ours += [("convT", p[f"up{i}"]["w"], p[f"up{i}"]["b"]) for i in range(2)]
    ours += [("conv", p["tail"]["w"], p["tail"]["b"])]
    _copy_into_torch(tnet, ours)

    x = rng.rand(2, 32, 32, 3).astype(np.float32) * 2 - 1
    got = resnet_generator_apply(p, jnp.asarray(x))
    with torch.no_grad():
        ref = tnet(_nchw(x)).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-5)


def test_unet_generator_golden(rng):
    ref_path()
    from models import networks as refnet
    from cfen_vit_tpu.models.networks_alt import (unet_generator_init,
                                                  unet_generator_apply)
    num_downs = 5   # 32x32 -> 1x1 bottleneck
    p = unet_generator_init(jax.random.PRNGKey(1), 3, 3, num_downs, ngf=8)
    tnet = refnet.UnetGenerator(3, 3, num_downs, ngf=8).eval()

    def collect(blk):
        seq = [("conv", blk["down"]["w"], blk["down"]["b"])]
        if blk["sub"] is not None:
            seq += collect(blk["sub"])
        seq += [("convT", blk["up"]["w"], blk["up"]["b"])]
        return seq

    _copy_into_torch(tnet, collect(p))
    x = rng.rand(2, 32, 32, 3).astype(np.float32) * 2 - 1
    got = unet_generator_apply(p, jnp.asarray(x))
    with torch.no_grad():
        ref = tnet(_nchw(x)).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-5)


def test_classifier_golden(rng):
    ref_path()
    from models import networks as refnet
    from cfen_vit_tpu.models.networks_alt import (classifier_init,
                                                  classifier_apply)
    p = classifier_init(jax.random.PRNGKey(2), 3, ndf=8)
    tnet = refnet.Classifier(3, 8).eval()
    ours = [("conv", p["c0"]["w"], p["c0"]["b"])]
    for n in range(3):
        ours += [("conv", p[f"c{n + 1}"]["w"], p[f"c{n + 1}"]["b"]),
                 ("norm", p[f"in{n + 1}"]["g"], p[f"in{n + 1}"]["b"])]
    ours += [("linear", p["l1"]["w"], p["l1"]["b"]),
             ("linear", p["l2"]["w"], p["l2"]["b"])]
    _copy_into_torch(tnet, ours)

    # The reference Classifier cannot run end-to-end on ANY input size:
    # the Linear stack needs a 1x1 final map (view(bs,-1) -> ndf*4), but
    # InstanceNorm2d raises on 1x1 spatial inputs (torch "Expected more
    # than 1 spatial element").  docs/REFERENCE_DEFECTS.md.  Golden-test
    # the conv tower at 64x64 (last IN sees 3x3), and run-test our full
    # forward at 32x32 where our instance_norm tolerates the 1x1 map.
    x = rng.rand(2, 64, 64, 3).astype(np.float32)
    h = jnp.asarray(x)
    from cfen_vit_tpu.ops import nn as N
    h = N.leaky_relu(N.conv2d(p["c0"], h, stride=2), 0.2)
    for n in range(3):
        h = N.conv2d(p[f"c{n + 1}"], h, stride=2)
        h = (N.instance_norm(h) * p[f"in{n + 1}"]["g"]
             + p[f"in{n + 1}"]["b"])
        h = N.leaky_relu(h, 0.2)
    with torch.no_grad():
        ref = tnet.before_linear(_nchw(x)).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(h), ref, atol=2e-5)

    got = classifier_apply(p, jnp.asarray(
        rng.rand(2, 32, 32, 3).astype(np.float32)))
    assert got.shape == (2, 10)
    assert np.isfinite(np.asarray(got)).all()
