"""PatchGAN discriminators (ref models/networks.py:495-539, define_D :84-98).

NLayerDiscriminator ('basic', n_layers=3): k4s2 convs ndf->2ndf->4ndf, then
k4s1 to 8ndf, InstanceNorm(affine=False) + LeakyReLU(0.2) between, final
k4s1 conv to 1 logit map; optional sigmoid (vanilla GAN).  The conditional
GAN input is cat(hazy, image) = 6 channels (ref model_iid_dehazing.py:
101-103, 175-187).

PixelDiscriminator ('pixel'): 1x1 conv stack (ref networks.py:542-566).
"""

from __future__ import annotations

import jax

from ..ops import nn as N


def nlayer_disc_init(key, input_nc: int, ndf: int = 64, n_layers: int = 3):
    """Param tree holds convs only; stride/norm placement is structural
    (derived from position in nlayer_disc_apply) so the pytree stays
    all-float for grad/jit."""
    keys = jax.random.split(key, n_layers + 2)
    layers = [N.conv_init(keys[0], 4, 4, input_nc, ndf)]
    nf_mult = 1
    for n in range(1, n_layers):
        prev, nf_mult = nf_mult, min(2 ** n, 8)
        layers.append(N.conv_init(keys[n], 4, 4, ndf * prev, ndf * nf_mult))
    prev, nf_mult = nf_mult, min(2 ** n_layers, 8)
    layers.append(N.conv_init(keys[n_layers], 4, 4, ndf * prev,
                              ndf * nf_mult))
    layers.append(N.conv_init(keys[n_layers + 1], 4, 4, ndf * nf_mult, 1))
    return {"layers": layers}


def nlayer_disc_apply(p, x, use_sigmoid: bool = False):
    layers = p["layers"]
    last = len(layers) - 1
    for i, conv in enumerate(layers):
        stride = 2 if i < last - 1 else 1
        x = N.conv2d(conv, x, stride=stride, padding=1)
        if i == last:
            break
        if i > 0:
            x = N.instance_norm(x)
        x = N.leaky_relu(x, 0.2)
    return jax.nn.sigmoid(x) if use_sigmoid else x


def pixel_disc_init(key, input_nc: int, ndf: int = 64):
    k1, k2, k3 = jax.random.split(key, 3)
    return {"c1": N.conv_init(k1, 1, 1, input_nc, ndf),
            "c2": N.conv_init(k2, 1, 1, ndf, ndf * 2),
            "c3": N.conv_init(k3, 1, 1, ndf * 2, 1)}


def pixel_disc_apply(p, x, use_sigmoid: bool = False):
    x = N.leaky_relu(N.conv2d(p["c1"], x), 0.2)
    x = N.leaky_relu(N.instance_norm(N.conv2d(p["c2"], x)), 0.2)
    x = N.conv2d(p["c3"], x)
    return jax.nn.sigmoid(x) if use_sigmoid else x


def define_d(key, cfg):
    """Reference define_D parity (networks.py:84-98)."""
    input_nc = cfg.input_nc * 2
    if cfg.which_model_netD == "basic":
        return nlayer_disc_init(key, input_nc, cfg.ndf, 3)
    if cfg.which_model_netD == "n_layers":
        return nlayer_disc_init(key, input_nc, cfg.ndf, cfg.n_layers_D)
    if cfg.which_model_netD == "pixel":
        return pixel_disc_init(key, input_nc, cfg.ndf)
    raise NotImplementedError(
        f"Discriminator model name [{cfg.which_model_netD}] is not recognized")


def apply_d(cfg, p, x):
    use_sigmoid = cfg.no_lsgan
    if cfg.which_model_netD == "pixel":
        return pixel_disc_apply(p, x, use_sigmoid)
    return nlayer_disc_apply(p, x, use_sigmoid)
