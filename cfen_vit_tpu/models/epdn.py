"""EPDN (pix2pixHD-fork) network family — JAX port of the reference's
vendored epdn/epdn_networks.py.

The reference main path uses only epdn's VGGLoss (SURVEY.md section 2.10),
but the package ships a full enhanced-pix2pixHD dehazer; for capability
parity we provide its compute graph:

  * GlobalGenerator   <- epdn_networks.py:359-387 (c7s1 + n stride-2 downs +
                        resnet blocks + transposed ups + c7s1/tanh, IN+ReLU)
  * LocalEnhancer     <- :152-211 (coarse global trunk + local enhancer
                        branch + TWO chained Dehaze refiners; returns
                        (enhanced, dehazed))
  * Dehaze            <- :313-357 (the "EPDN enhancer": 6ch->20ch refiner,
                        4 avg-pool scales -> 1ch convs -> nearest upsample,
                        concat, 3x3 conv + tanh)
  * MultiscaleDiscriminator <- :569-608 over the epdn NLayerDiscriminator
                        (:611-660; k4 pad2, channel cap 512), pyramid built
                        with AvgPool2d(3,2,1,count_include_pad=False)

All layers use InstanceNorm (affine=False) like the reference's define_G
default.  Param layouts follow ops/nn.py conventions.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..ops import nn as N


# -- building blocks ---------------------------------------------------------

def _resnet_block_init(key, dim: int):
    k1, k2 = jax.random.split(key)
    return {"c1": N.conv_init(k1, 3, 3, dim, dim),
            "c2": N.conv_init(k2, 3, 3, dim, dim)}


def _resnet_block_apply(p, x):
    y = N.relu(N.instance_norm(
        N.conv2d(p["c1"], N.reflection_pad(x, 1))))
    y = N.instance_norm(N.conv2d(p["c2"], N.reflection_pad(y, 1)))
    return x + y


def _avg_pool_3s2(x):
    """AvgPool2d(3, stride=2, padding=1, count_include_pad=False)."""
    s = lax.reduce_window(x, 0.0, lax.add, (1, 3, 3, 1), (1, 2, 2, 1),
                          ((0, 0), (1, 1), (1, 1), (0, 0)))
    ones = jnp.ones(x.shape[:3] + (1,), x.dtype)
    cnt = lax.reduce_window(ones, 0.0, lax.add, (1, 3, 3, 1), (1, 2, 2, 1),
                            ((0, 0), (1, 1), (1, 1), (0, 0)))
    return s / cnt


def _nearest_up_to(x, h, w):
    return jax.image.resize(x, (x.shape[0], h, w, x.shape[3]),
                            method="nearest")


# -- GlobalGenerator ---------------------------------------------------------

def global_generator_init(key, input_nc=3, output_nc=3, ngf=64,
                          n_downsampling=4, n_blocks=9):
    ks = iter(jax.random.split(key, 3 + 2 * n_downsampling + n_blocks))
    p: Dict = {"head": N.conv_init(next(ks), 7, 7, input_nc, ngf)}
    p["down"] = []
    for i in range(n_downsampling):
        mult = 2 ** i
        p["down"].append(N.conv_init(next(ks), 3, 3, ngf * mult,
                                     ngf * mult * 2))
    mult = 2 ** n_downsampling
    p["blocks"] = [_resnet_block_init(next(ks), ngf * mult)
                   for _ in range(n_blocks)]
    p["up"] = []
    for i in range(n_downsampling):
        mult = 2 ** (n_downsampling - i)
        p["up"].append(N.conv_transpose_init(next(ks), 3, 3, ngf * mult,
                                             ngf * mult // 2))
    p["tail"] = N.conv_init(next(ks), 7, 7, ngf, output_nc)
    return p


def global_generator_apply(p, x, include_tail: bool = True):
    x = N.relu(N.instance_norm(
        N.conv2d(p["head"], N.reflection_pad(x, 3))))
    for conv in p["down"]:
        x = N.relu(N.instance_norm(N.conv2d(conv, x, stride=2, padding=1)))
    for blk in p["blocks"]:
        x = _resnet_block_apply(blk, x)
    for conv in p["up"]:
        x = N.relu(N.instance_norm(N.conv_transpose2d(
            conv, x, stride=2, padding=1, kernel=3, output_padding=1)))
    if include_tail:
        x = jnp.tanh(N.conv2d(p["tail"], N.reflection_pad(x, 3)))
    return x


# -- Dehaze refiner (the EPDN enhancer) --------------------------------------

def dehaze_init(key, input_nc: int = 6):
    ks = jax.random.split(key, 7)
    return {"refine1": N.conv_init(ks[0], 3, 3, input_nc, 20),
            "refine2": N.conv_init(ks[1], 3, 3, 20, 20),
            "conv1010": N.conv_init(ks[2], 1, 1, 20, 1),
            "conv1020": N.conv_init(ks[3], 1, 1, 20, 1),
            "conv1030": N.conv_init(ks[4], 1, 1, 20, 1),
            "conv1040": N.conv_init(ks[5], 1, 1, 20, 1),
            "refine3": N.conv_init(ks[6], 3, 3, 24, 3)}


def dehaze_apply(p, x):
    lrelu = lambda v: N.leaky_relu(v, 0.2)
    d = lrelu(N.conv2d(p["refine1"], x, padding=1))
    d = lrelu(N.conv2d(p["refine2"], d, padding=1))
    h, w = d.shape[1], d.shape[2]
    outs = []
    for k, name in ((32, "conv1010"), (16, "conv1020"), (8, "conv1030"),
                    (4, "conv1040")):
        pooled = lax.reduce_window(d, 0.0, lax.add, (1, k, k, 1),
                                   (1, k, k, 1), "VALID") / (k * k)
        outs.append(_nearest_up_to(lrelu(N.conv2d(p[name], pooled)), h, w))
    cat = jnp.concatenate(outs + [d], axis=-1)
    return jnp.tanh(N.conv2d(p["refine3"], cat, padding=1))


# -- LocalEnhancer ------------------------------------------------------------

def local_enhancer_init(key, input_nc=3, output_nc=3, ngf=32,
                        n_downsample_global=4, n_blocks_global=9,
                        n_blocks_local=3):
    ks = jax.random.split(key, 8)
    ngf_global = ngf * 2
    p = {"global": global_generator_init(ks[0], input_nc, output_nc,
                                         ngf_global, n_downsample_global,
                                         n_blocks_global)}
    p["down_head"] = N.conv_init(ks[1], 7, 7, input_nc, ngf)
    p["down_conv"] = N.conv_init(ks[2], 3, 3, ngf, ngf * 2)
    p["local_blocks"] = [_resnet_block_init(jax.random.fold_in(ks[3], i),
                                            ngf * 2)
                         for i in range(n_blocks_local)]
    p["up_conv"] = N.conv_transpose_init(ks[4], 3, 3, ngf * 2, ngf)
    p["tail"] = N.conv_init(ks[5], 7, 7, ngf, output_nc)
    p["dehaze"] = dehaze_init(ks[6], 6)
    p["dehaze2"] = dehaze_init(ks[7], 6)
    return p


def local_enhancer_apply(p, x) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (enhanced pix2pixHD output, Dehaze-refined output) like the
    reference forward (epdn_networks.py:191-211)."""
    x_half = _avg_pool_3s2(x)
    coarse = global_generator_apply(p["global"], x_half, include_tail=False)
    d = N.relu(N.instance_norm(
        N.conv2d(p["down_head"], N.reflection_pad(x, 3))))
    d = N.relu(N.instance_norm(N.conv2d(p["down_conv"], d, stride=2,
                                        padding=1)))
    y = d + coarse
    for blk in p["local_blocks"]:
        y = _resnet_block_apply(blk, y)
    y = N.relu(N.instance_norm(N.conv_transpose2d(
        p["up_conv"], y, stride=2, padding=1, kernel=3, output_padding=1)))
    out = jnp.tanh(N.conv2d(p["tail"], N.reflection_pad(y, 3)))
    dh = dehaze_apply(p["dehaze"], jnp.concatenate([out, x], axis=-1))
    dh = dehaze_apply(p["dehaze2"], jnp.concatenate([out, dh], axis=-1))
    return out, dh


# -- Encoder (pix2pixHD feature encoder) --------------------------------------

def encoder_init(key, input_nc=3, output_nc=3, ngf=32, n_downsampling=4):
    """epdn_networks.py:533-553 trunk: c7s1 + n stride-2 downs + n transposed
    ups + c7s1/tanh (define_G passes InstanceNorm, :54-55)."""
    ks = iter(jax.random.split(key, 2 + 2 * n_downsampling))
    p: Dict = {"head": N.conv_init(next(ks), 7, 7, input_nc, ngf),
               "down": [], "up": []}
    for i in range(n_downsampling):
        mult = 2 ** i
        p["down"].append(N.conv_init(next(ks), 3, 3, ngf * mult,
                                     ngf * mult * 2))
    for i in range(n_downsampling):
        mult = 2 ** (n_downsampling - i)
        p["up"].append(N.conv_transpose_init(next(ks), 3, 3, ngf * mult,
                                             ngf * mult // 2))
    p["tail"] = N.conv_init(next(ks), 7, 7, ngf, output_nc)
    return p


def encoder_apply(p, x, inst, num_labels: int = 32):
    """Encoder forward incl. instance-wise average pooling
    (epdn_networks.py:555-567).

    inst: [B,H,W,1] integer instance map with ids in [0, num_labels) — a
    static bound so the whole thing jits (the reference loops np.unique on
    the host, :560).  The reference's mean for an id pools pixels across
    the WHOLE batch (indices[:,0] spans batch, :564-566); reproduced.  The
    gather/scatter is two one-hot einsums — segment means on the MXU, no
    data-dependent control flow."""
    y = N.relu(N.instance_norm(N.conv2d(p["head"], N.reflection_pad(x, 3))))
    for conv in p["down"]:
        y = N.relu(N.instance_norm(N.conv2d(conv, y, stride=2, padding=1)))
    for conv in p["up"]:
        y = N.relu(N.instance_norm(N.conv_transpose2d(
            conv, y, stride=2, padding=1, kernel=3, output_padding=1)))
    y = jnp.tanh(N.conv2d(p["tail"], N.reflection_pad(y, 3)))
    onehot = jax.nn.one_hot(inst[..., 0], num_labels, dtype=y.dtype)
    sums = jnp.einsum("bhwl,bhwc->lc", onehot, y)
    cnts = jnp.maximum(jnp.sum(onehot, axis=(0, 1, 2))[:, None], 1.0)
    return jnp.einsum("bhwl,lc->bhwc", onehot, sums / cnts)


# -- Omni family (reconstructed; unrunnable in the reference) ------------------
#
# define_G('omnilocal') (epdn_networks.py:51-53) constructs OmniLocalEnhancer
# (:216-311), whose __init__ references OmniFeatureExtractor — but that class
# (and HeightWise_SFF_Model) exists only INSIDE a '''...''' string literal
# (:388-486), and their ConELUBlock import is commented out with no
# epdn/OmniDepth_network.py in the repo (:14).  So 'omnilocal' raises
# NameError at construction: crash-by-construction, no golden possible
# (docs/REFERENCE_DEFECTS.md).  We port the full graph anyway, treating the
# string-literal code as the spec; ConELUBlock is reconstructed as
# Conv2d+ELU (its OmniDepth usage pattern: one conv, explicit per-dim
# padding, ELU activation).

def _conelu_init(key, cin, cout, kh, kw):
    return N.conv_init(key, kh, kw, cin, cout)


def _conelu_apply(p, x, ph, pw):
    return jax.nn.elu(N.conv2d(p, x, padding=(ph, pw)))


def hw_sff_init(key, channels: int, height: int, reduction: int = 4):
    """HeightWise_SFF_Model (:428-443): selective feature fusion where the
    image HEIGHT axis plays the channel role (the torch code transposes
    C<->H then runs 1x1 convs sized by `height`)."""
    d = max(height // reduction, 4)
    ks = jax.random.split(key, 6)
    return {"squeeze": N.linear_init(ks[0], height, d, bias=False),
            "prelu_a": jnp.full((1,), 0.25, jnp.float32),
            "fcs": [N.linear_init(ks[1 + i], d, height, bias=False)
                    for i in range(4)],
            "smooth": _conelu_init(ks[5], channels, channels, 5, 3)}


def hw_sff_apply(p, x0, x1, x2, x3):
    """Forward (:445-484).  NHWC avoids the torch transposes entirely: the
    per-(b,h) statistics are a mean over (W, C), the height-sized 1x1 convs
    are dense matmuls on the H-vector, and the branch softmax runs over the
    4 scores."""
    fuse = x0 + x1 + x2 + x3                       # [B,H,W,C]
    pool = jnp.mean(fuse, axis=(2, 3))             # [B,H] (gap over C,W)
    sq = N.linear(p["squeeze"], pool)
    a = p["prelu_a"].astype(sq.dtype)[0]
    sq = jnp.where(sq >= 0, sq, a * sq)            # PReLU (single alpha)
    scores = jnp.stack([N.linear(f, sq) for f in p["fcs"]], -1)  # [B,H,4]
    att = jax.nn.softmax(scores, axis=-1)
    att = att[:, :, None, None, :]                 # broadcast over W,C
    sel = (att[..., 0] * x0 + att[..., 1] * x1
           + att[..., 2] * x2 + att[..., 3] * x3)
    return _conelu_apply(p["smooth"], sel + fuse, 2, 1)


# (kernel, padding) pairs for the two ConELU filter banks (:397-405)
_OFE_BANK0 = [((3, 9), (1, 4)), ((5, 11), (2, 5)), ((5, 7), (2, 3)),
              ((7, 7), (3, 3))]
_OFE_BANK1 = [((3, 9), (1, 4)), ((3, 7), (1, 3)), ((3, 5), (1, 2)),
              ((5, 5), (2, 2))]


def omni_feature_extractor_init(key, input_nc=3, ngf=32, n_height=128):
    """OmniFeatureExtractor (:389-405): two 4-way multi-aspect ConELU filter
    banks, each fused by a HeightWise SFF sized to the input height."""
    ks = jax.random.split(key, 10)
    return {
        "bank0": [_conelu_init(ks[i], input_nc, ngf // 2, kh, kw)
                  for i, ((kh, kw), _) in enumerate(_OFE_BANK0)],
        "bank1": [_conelu_init(ks[4 + i], ngf // 2, ngf, kh, kw)
                  for i, ((kh, kw), _) in enumerate(_OFE_BANK1)],
        "sff0": hw_sff_init(ks[8], ngf // 2, n_height),
        "sff1": hw_sff_init(ks[9], ngf, n_height)}


def omni_feature_extractor_apply(p, x):
    f0 = [_conelu_apply(c, x, ph, pw)
          for c, (_, (ph, pw)) in zip(p["bank0"], _OFE_BANK0)]
    fuse0 = hw_sff_apply(p["sff0"], *f0)
    f1 = [_conelu_apply(c, fuse0, ph, pw)
          for c, (_, (ph, pw)) in zip(p["bank1"], _OFE_BANK1)]
    return hw_sff_apply(p["sff1"], *f1)


def omni_local_enhancer_init(key, input_nc=3, output_nc=3, ngf=32,
                             n_downsample_global=4, n_blocks_global=9,
                             n_blocks_local=3, n_height=128):
    """OmniLocalEnhancer (:216-289): coarse + fine Omni-extractor trunks
    (each: n stride-2 downs with a ResnetBlock after every down, 9 blocks,
    transposed ups with trailing ResnetBlocks — the fine trunk stops one
    upsample short), fused by a final transposed conv + local blocks + c5/c7
    tail, then the usual two chained Dehaze refiners."""
    nd = n_downsample_global
    ks = iter(jax.random.split(key, 64))
    p: Dict = {
        "ext_coarse": omni_feature_extractor_init(next(ks), input_nc, ngf,
                                                  n_height // 2),
        "ext_fine": omni_feature_extractor_init(next(ks), input_nc, ngf,
                                                n_height)}
    for trunk, n_up in (("coarse", nd), ("fine", nd - 1)):
        down, blocks, up = [], [], []
        for i in range(nd):
            mult = 2 ** i
            down.append({"conv": N.conv_init(next(ks), 3, 3, ngf * mult,
                                             ngf * mult * 2),
                         "block": _resnet_block_init(next(ks),
                                                     ngf * mult * 2)})
        mult = 2 ** nd
        blocks = [_resnet_block_init(next(ks), ngf * mult)
                  for _ in range(n_blocks_global)]
        for i in range(n_up):
            mult = 2 ** (nd - i)
            up.append({"conv": N.conv_transpose_init(next(ks), 3, 3,
                                                     ngf * mult,
                                                     ngf * mult // 2),
                       "block": _resnet_block_init(next(ks),
                                                   ngf * mult // 2)})
        p[trunk] = {"down": down, "blocks": blocks, "up": up}
    # model_final (:274-285): in = fine(2*ngf) ++ coarse(ngf)
    p["final_up"] = N.conv_transpose_init(next(ks), 3, 3, 3 * ngf, 2 * ngf)
    p["final_blocks"] = [_resnet_block_init(next(ks), 2 * ngf)
                         for _ in range(n_blocks_local)]
    p["final_c5"] = N.conv_init(next(ks), 5, 5, 2 * ngf, ngf)
    p["final_c7"] = N.conv_init(next(ks), 7, 7, ngf, output_nc)
    p["dehaze"] = dehaze_init(next(ks), 6)
    p["dehaze2"] = dehaze_init(next(ks), 6)
    return p


def _omni_trunk_apply(t, x):
    for lvl in t["down"]:
        x = N.relu(N.instance_norm(N.conv2d(lvl["conv"], x, stride=2,
                                            padding=1)))
        x = _resnet_block_apply(lvl["block"], x)
    for blk in t["blocks"]:
        x = _resnet_block_apply(blk, x)
    for lvl in t["up"]:
        x = N.relu(N.instance_norm(N.conv_transpose2d(
            lvl["conv"], x, stride=2, padding=1, kernel=3,
            output_padding=1)))
        x = _resnet_block_apply(lvl["block"], x)
    return x


def omni_local_enhancer_apply(p, x) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Forward (:290-311). Returns (enhanced, dehazed) like LocalEnhancer.
    Input height must equal the n_height the SFF denses were sized for."""
    x_half = _avg_pool_3s2(x)
    coarse = _omni_trunk_apply(p["coarse"],
                               omni_feature_extractor_apply(p["ext_coarse"],
                                                            x_half))
    fine = _omni_trunk_apply(p["fine"],
                             omni_feature_extractor_apply(p["ext_fine"], x))
    y = jnp.concatenate([fine, coarse], axis=-1)
    # norm_layer(ngf) on a 2*ngf tensor (:276) — InstanceNorm2d is
    # param-free so torch silently normalizes all channels; same here.
    y = N.relu(N.instance_norm(N.conv_transpose2d(
        p["final_up"], y, stride=2, padding=1, kernel=3, output_padding=1)))
    for blk in p["final_blocks"]:
        y = _resnet_block_apply(blk, y)
    # quirk (:282-283): no norm/activation between the c5 and c7 convs
    y = N.conv2d(p["final_c5"], N.reflection_pad(y, 2))
    out = jnp.tanh(N.conv2d(p["final_c7"], N.reflection_pad(y, 3)))
    dh = dehaze_apply(p["dehaze"], jnp.concatenate([out, x], axis=-1))
    dh = dehaze_apply(p["dehaze2"], jnp.concatenate([out, dh], axis=-1))
    return out, dh


# -- MultiscaleDiscriminator ---------------------------------------------------

def _epdn_nlayer_init(key, input_nc, ndf=64, n_layers=3):
    ks = jax.random.split(key, n_layers + 2)
    convs = [N.conv_init(ks[0], 4, 4, input_nc, ndf)]
    nf = ndf
    for n in range(1, n_layers):
        prev, nf = nf, min(nf * 2, 512)
        convs.append(N.conv_init(ks[n], 4, 4, prev, nf))
    prev, nf = nf, min(nf * 2, 512)
    convs.append(N.conv_init(ks[n_layers], 4, 4, prev, nf))
    convs.append(N.conv_init(ks[n_layers + 1], 4, 4, nf, 1))
    return {"convs": convs}


def _epdn_nlayer_apply(p, x, use_sigmoid=False):
    convs = p["convs"]
    last = len(convs) - 1
    feats = []
    for i, conv in enumerate(convs):
        stride = 2 if i < last - 1 else 1
        x = N.conv2d(conv, x, stride=stride, padding=2)  # padw=2 (epdn quirk)
        if i < last:
            if i > 0:
                x = N.instance_norm(x)
            x = N.leaky_relu(x, 0.2)
        feats.append(x)
    if use_sigmoid:
        feats[-1] = jax.nn.sigmoid(feats[-1])
    return feats


def multiscale_disc_init(key, input_nc, ndf=64, n_layers=3, num_d=3):
    return {"scales": [
        _epdn_nlayer_init(jax.random.fold_in(key, i), input_nc, ndf,
                          n_layers) for i in range(num_d)]}


def multiscale_disc_apply(p, x, use_sigmoid=False,
                          get_interm_feat=False) -> List:
    """Returns a list per scale (finest-trained last like the reference's
    ordering: scale i uses the (num_D-1-i)-th discriminator on the i-times
    downsampled input)."""
    results = []
    cur = x
    num_d = len(p["scales"])
    for i in range(num_d):
        feats = _epdn_nlayer_apply(p["scales"][num_d - 1 - i], cur,
                                   use_sigmoid)
        results.append(feats if get_interm_feat else [feats[-1]])
        if i != num_d - 1:
            cur = _avg_pool_3s2(cur)
    return results
