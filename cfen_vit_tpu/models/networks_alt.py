"""Unused-in-reference alternate networks from models/networks.py, ported
for inventory completeness (SURVEY.md section 2.5 row 'unused alternates';
VERDICT r1 missing #5): ResnetGenerator (+ResnetBlock), UnetGenerator
(+UnetSkipConnectionBlock), Classifier.

None of these are reachable from the reference's train.py/test.py (no
define_G branch constructs them — verified by grep), but they are live
importable code there, so they get faithful functional ports with golden
tests (tests/test_networks_alt.py) rather than a won't-port note.

Reference: /root/reference/models/networks.py:145-305 (Resnet/Unet),
:567-601 (Classifier).  All use InstanceNorm2d (affine=False except the
Classifier's affine=True), hence biased convs (use_bias=True in the ref's
norm_layer==InstanceNorm2d branch).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import nn as N


# --------------------------------------------------------------------------
# ResnetGenerator (ref networks.py:145-190; ResnetBlock :196-237)
# --------------------------------------------------------------------------

def resnet_generator_init(key, input_nc: int, output_nc: int, ngf: int = 64,
                          n_blocks: int = 6):
    keys = iter(jax.random.split(key, 8 + 2 * n_blocks))
    nxt = lambda: next(keys)
    p = {"head": N.conv_init(nxt(), 7, 7, input_nc, ngf)}
    for i in range(2):
        mult = 2 ** i
        p[f"down{i}"] = N.conv_init(nxt(), 3, 3, ngf * mult, ngf * mult * 2)
    p["blocks"] = [
        {"c1": N.conv_init(nxt(), 3, 3, ngf * 4, ngf * 4),
         "c2": N.conv_init(nxt(), 3, 3, ngf * 4, ngf * 4)}
        for _ in range(n_blocks)]
    for i in range(2):
        mult = 2 ** (2 - i)
        p[f"up{i}"] = N.conv_transpose_init(nxt(), 3, 3, ngf * mult,
                                            ngf * mult // 2)
    p["tail"] = N.conv_init(nxt(), 7, 7, ngf, output_nc)
    return p


def resnet_generator_apply(p, x):
    """x: [N,H,W,C] -> tanh output, H,W preserved (2x down, 2x up)."""
    h = N.conv2d(p["head"], N.reflection_pad(x, 3))
    h = N.relu(N.instance_norm(h))
    for i in range(2):
        h = N.conv2d(p[f"down{i}"], h, stride=2, padding=1)
        h = N.relu(N.instance_norm(h))
    for blk in p["blocks"]:
        y = N.conv2d(blk["c1"], N.reflection_pad(h, 1))
        y = N.relu(N.instance_norm(y))
        y = N.conv2d(blk["c2"], N.reflection_pad(y, 1))
        h = h + N.instance_norm(y)
    for i in range(2):
        # ConvTranspose2d(k=3, s=2, p=1, output_padding=1)
        h = N.conv_transpose2d(p[f"up{i}"], h, stride=2, padding=1,
                               kernel=3, output_padding=1)
        h = N.relu(N.instance_norm(h))
    return jnp.tanh(N.conv2d(p["tail"], N.reflection_pad(h, 3)))


# --------------------------------------------------------------------------
# UnetGenerator (ref networks.py:249-305)
# --------------------------------------------------------------------------

def unet_generator_init(key, input_nc: int, output_nc: int, num_downs: int,
                        ngf: int = 64):
    """Builds the nested UnetSkipConnectionBlock structure as configs,
    innermost first (mirroring the reference's construction order)."""
    keys = iter(jax.random.split(key, 4 * num_downs + 4))
    nxt = lambda: next(keys)

    def block(outer_nc, inner_nc, input_nc_, sub, outermost, innermost):
        up_in = inner_nc if innermost else inner_nc * 2
        return {
            "down": N.conv_init(nxt(), 4, 4, input_nc_, inner_nc),
            "up": N.conv_transpose_init(nxt(), 4, 4, up_in, outer_nc),
            "sub": sub,
            "outermost": outermost, "innermost": innermost,
        }

    b = block(ngf * 8, ngf * 8, ngf * 8, None, False, True)
    for _ in range(num_downs - 5):
        b = block(ngf * 8, ngf * 8, ngf * 8, b, False, False)
    b = block(ngf * 4, ngf * 8, ngf * 4, b, False, False)
    b = block(ngf * 2, ngf * 4, ngf * 2, b, False, False)
    b = block(ngf, ngf * 2, ngf, b, False, False)
    return block(output_nc, ngf, input_nc, b, True, False)


def unet_generator_apply(p, x):
    """Recursive U-Net; skip = channel concat(x, sub(x)) (ref :303-305)."""
    def run(blk, h):
        if blk["outermost"]:
            y = N.conv2d(blk["down"], h, stride=2, padding=1)
            y = run(blk["sub"], y)
            y = N.conv_transpose2d(blk["up"], N.relu(y))
            return jnp.tanh(y)
        if blk["innermost"]:
            y = N.conv2d(blk["down"], N.leaky_relu(h, 0.2),
                         stride=2, padding=1)
            y = N.conv_transpose2d(blk["up"], N.relu(y))
            y = N.instance_norm(y)
            return jnp.concatenate([h, y], axis=-1)
        y = N.conv2d(blk["down"], N.leaky_relu(h, 0.2), stride=2, padding=1)
        y = N.instance_norm(y)
        y = run(blk["sub"], y)
        y = N.conv_transpose2d(blk["up"], N.relu(y))
        y = N.instance_norm(y)
        return jnp.concatenate([h, y], axis=-1)

    return run(p, x)


# --------------------------------------------------------------------------
# Classifier (ref networks.py:567-601)
# --------------------------------------------------------------------------

def classifier_init(key, input_nc: int, ndf: int):
    keys = iter(jax.random.split(key, 8))
    nxt = lambda: next(keys)
    p = {"c0": N.conv_init(nxt(), 3, 3, input_nc, ndf)}
    nf_mult_prev, nf_mult = 1, 1
    for n in range(3):
        nf_mult_prev, nf_mult = nf_mult, min(2 ** n, 8)
        p[f"c{n + 1}"] = N.conv_init(nxt(), 3, 3, ndf * nf_mult_prev,
                                     ndf * nf_mult)
        # InstanceNorm2d(affine=True): learned per-channel scale/shift
        p[f"in{n + 1}"] = {"g": jnp.ones((ndf * nf_mult,)),
                           "b": jnp.zeros((ndf * nf_mult,))}
    p["l1"] = N.linear_init(nxt(), ndf * nf_mult, 1024)
    p["l2"] = N.linear_init(nxt(), 1024, 10)
    return p


def classifier_apply(p, x):
    """Conv tower (k3 s2, VALID padding as in the ref's padding-less
    Conv2d) -> flatten (torch CHW order) -> two Linears, no activation
    between them (ref :590-601 as written)."""
    h = N.leaky_relu(N.conv2d(p["c0"], x, stride=2), 0.2)
    for n in range(3):
        h = N.conv2d(p[f"c{n + 1}"], h, stride=2)
        h = N.instance_norm(h) * p[f"in{n + 1}"]["g"] + p[f"in{n + 1}"]["b"]
        h = N.leaky_relu(h, 0.2)
    n_, hh, ww, c = h.shape
    flat = h.transpose(0, 3, 1, 2).reshape(n_, c * hh * ww)  # torch view order
    return N.linear(p["l2"], N.linear(p["l1"], flat))
