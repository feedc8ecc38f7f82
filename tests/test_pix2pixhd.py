"""EPDN/pix2pixHD trainer: loss math golden vs a torch replica + a full
train-step smoke test (tiny geometry)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cfen_vit_tpu.config import Config
from cfen_vit_tpu.train.pix2pixhd import (EpdnTrainer, epdn_gan_loss,
                                          feature_matching_loss)


def test_feature_matching_math_vs_torch(rng):
    """ref pix2pixHD_model.py:172-180 weights: 4/(n_layers+1) * 1/num_D *
    lambda_feat per (scale, layer<last)."""
    torch = pytest.importorskip("torch")
    num_d, n_layers, lam = 2, 3, 10.0
    fake = [[rng.randn(1, 4, 4, 3).astype(np.float32) for _ in range(5)]
            for _ in range(num_d)]
    real = [[rng.randn(1, 4, 4, 3).astype(np.float32) for _ in range(5)]
            for _ in range(num_d)]
    got = float(feature_matching_loss(
        [[jnp.asarray(a) for a in s] for s in fake],
        [[jnp.asarray(a) for a in s] for s in real], n_layers, num_d, lam))
    crit = torch.nn.L1Loss()
    want = 0.0
    fw, dw = 4.0 / (n_layers + 1), 1.0 / num_d
    for i in range(num_d):
        for j in range(len(fake[i]) - 1):
            want += dw * fw * float(crit(torch.tensor(fake[i][j]),
                                         torch.tensor(real[i][j]))) * lam
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_epdn_gan_loss_sums_scales(rng):
    preds = [[jnp.asarray(rng.randn(1, 3, 3, 1).astype(np.float32))]
             for _ in range(3)]
    got = float(epdn_gan_loss(preds, True, lsgan=True))
    want = sum(float(jnp.mean(jnp.square(p[0] - 1.0))) for p in preds)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_epdn_train_step_smoke(rng, tmp_path):
    cfg = Config(name="ep", isTrain=True, checkpoints_dir=str(tmp_path),
                 ndf=8, epdn_ngf=4, pool_size=2, batchSize=2, num_D=2)
    tr = EpdnTrainer(cfg)
    b = {"B": rng.rand(2, 64, 64, 3).astype(np.float32) * 2 - 1,
         "A": rng.rand(2, 64, 64, 3).astype(np.float32) * 2 - 1}
    tr.set_input(b)
    tr.optimize_parameters(cfg)
    l1 = tr.get_current_losses()
    assert all(np.isfinite(v) for v in l1.values()), l1
    assert {"G_GAN", "G_GAN_Feat", "G_VGG", "G_L2", "D_real",
            "D_fake"} <= set(l1)
    tr.set_input(b)
    tr.optimize_parameters(cfg)
    l2 = tr.get_current_losses()
    assert l2["G"] != l1["G"]  # params actually updated
