"""Pyramid Vision Transformer backbone — JAX port of models/pvt.py.

The reference vendors PVT as an (unused) alternative backbone zoo
(models/pvt.py:129-265; it cannot even import there — it requires
timm/mmseg/mmcv which the reference never ships).  Provided here as a
working capability: 4-stage pyramid with strided conv patch embedding,
spatial-reduction attention (SRA: K/V computed on an sr_ratio-downsampled
token map, ref :33-77), GELU MLP blocks, and interpolated positional
embeddings; `forward` returns the 4 feature maps NHWC.

Presets pvt_tiny/small/medium/large follow ref :236-265 (embed dims
[64,128,320,512], heads [1,2,5,8], mlp ratios [8,8,4,4], sr [8,4,2,1]).
Stochastic depth is omitted (inference backbone; drop rates are 0 in the
reference's own usage surface).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Tuple

import jax
import jax.numpy as jnp

from ..ops import nn as N


@dataclass(frozen=True)
class PVTSpec:
    patch_size: int = 4
    in_chans: int = 3
    embed_dims: Tuple[int, ...] = (64, 128, 320, 512)
    num_heads: Tuple[int, ...] = (1, 2, 5, 8)
    mlp_ratios: Tuple[int, ...] = (8, 8, 4, 4)
    depths: Tuple[int, ...] = (2, 2, 2, 2)
    sr_ratios: Tuple[int, ...] = (8, 4, 2, 1)
    img_size: int = 224


PRESETS = {
    "pvt_tiny": PVTSpec(depths=(2, 2, 2, 2)),
    "pvt_small": PVTSpec(depths=(3, 4, 6, 3)),
    "pvt_medium": PVTSpec(depths=(3, 4, 18, 3)),
    "pvt_large": PVTSpec(depths=(3, 8, 27, 3)),
}


def _trunc_normal(key, shape, std=0.02):
    return std * jax.random.truncated_normal(key, -2.0, 2.0, shape)


def _attn_init(key, dim, qkv_bias=True, sr_ratio=1):
    ks = jax.random.split(key, 5)
    p = {"q": {"w": _trunc_normal(ks[0], (dim, dim))},
         "kv": {"w": _trunc_normal(ks[1], (dim, 2 * dim))},
         "proj": {"w": _trunc_normal(ks[2], (dim, dim)),
                  "b": jnp.zeros((dim,))}}
    if qkv_bias:
        p["q"]["b"] = jnp.zeros((dim,))
        p["kv"]["b"] = jnp.zeros((2 * dim,))
    if sr_ratio > 1:
        p["sr"] = N.conv_init(ks[3], sr_ratio, sr_ratio, dim, dim)
        p["sr_norm"] = N.layer_norm_init(dim)
    return p


def _attn_apply(p, x, h, w, num_heads, sr_ratio):
    n, l, c = x.shape
    dh = c // num_heads
    q = N.linear(p["q"], x).reshape(n, l, num_heads, dh)
    if sr_ratio > 1:
        xm = x.reshape(n, h, w, c)
        xm = N.conv2d(p["sr"], xm, stride=sr_ratio)
        xm = N.layer_norm(p["sr_norm"],
                          xm.reshape(n, -1, c), eps=1e-6)
    else:
        xm = x
    kv = N.linear(p["kv"], xm).reshape(n, -1, 2, num_heads, dh)
    k, v = kv[:, :, 0], kv[:, :, 1]
    logits = jnp.einsum("nqhd,nkhd->nhqk", q, k,
                        preferred_element_type=jnp.float32) * (dh ** -0.5)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("nhqk,nkhd->nqhd", probs, v).reshape(n, l, c)
    return N.linear(p["proj"], out)


def _block_init(key, dim, mlp_ratio, qkv_bias, sr_ratio):
    ks = jax.random.split(key, 3)
    hidden = int(dim * mlp_ratio)
    return {"norm1": N.layer_norm_init(dim),
            "attn": _attn_init(ks[0], dim, qkv_bias, sr_ratio),
            "norm2": N.layer_norm_init(dim),
            "fc1": {"w": _trunc_normal(ks[1], (dim, hidden)),
                    "b": jnp.zeros((hidden,))},
            "fc2": {"w": _trunc_normal(ks[2], (hidden, dim)),
                    "b": jnp.zeros((dim,))}}


def _block_apply(p, x, h, w, num_heads, sr_ratio):
    y = N.layer_norm(p["norm1"], x, eps=1e-6)
    x = x + _attn_apply(p["attn"], y, h, w, num_heads, sr_ratio)
    y = N.layer_norm(p["norm2"], x, eps=1e-6)
    y = N.linear(p["fc2"], jax.nn.gelu(N.linear(p["fc1"], y)))
    return x + y


def pvt_init(key, spec: PVTSpec):
    p = {"stages": []}
    cin = spec.in_chans
    size = spec.img_size
    for i in range(4):
        ks = jax.random.split(jax.random.fold_in(key, i),
                              3 + spec.depths[i])
        patch = spec.patch_size if i == 0 else 2
        dim = spec.embed_dims[i]
        size = size // patch
        stage = {
            "proj": N.conv_init(ks[0], patch, patch, cin, dim),
            "embed_norm": N.layer_norm_init(dim),
            "pos": _trunc_normal(ks[1], (size * size, dim)),
            "blocks": [
                _block_init(ks[3 + j], dim, spec.mlp_ratios[i], True,
                            spec.sr_ratios[i])
                for j in range(spec.depths[i])],
        }
        p["stages"].append(stage)
        cin = dim
    return p


def pvt_apply(p, spec: PVTSpec, x) -> List[jnp.ndarray]:
    """x: [N,H,W,3] -> 4 NHWC feature maps at /4, /8, /16, /32."""
    outs = []
    n = x.shape[0]
    for i, stage in enumerate(p["stages"]):
        patch = spec.patch_size if i == 0 else 2
        x = N.conv2d(stage["proj"], x, stride=patch)
        h, w = x.shape[1], x.shape[2]
        t = N.layer_norm(stage["embed_norm"],
                         x.reshape(n, h * w, -1), eps=1e-6)
        pos = stage["pos"]
        if pos.shape[0] != h * w:
            side = int(pos.shape[0] ** 0.5)
            pos2 = jax.image.resize(
                pos.reshape(1, side, side, -1), (1, h, w, pos.shape[-1]),
                method="linear").reshape(h * w, -1)
        else:
            pos2 = pos
        t = t + pos2.astype(t.dtype)
        for blk in stage["blocks"]:
            t = _block_apply(blk, t, h, w, spec.num_heads[i],
                             spec.sr_ratios[i])
        x = t.reshape(n, h, w, -1)
        outs.append(x)
    return outs


def create_pvt(key, name: str = "pvt_tiny", **overrides):
    from dataclasses import replace
    spec = replace(PRESETS[name], **overrides)
    return spec, pvt_init(key, spec)
