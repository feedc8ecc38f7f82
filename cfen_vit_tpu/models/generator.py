"""Parametric HLG-ViT IID generator (all `--model_G` variants, one program).

This is the TPU-native rebuild of the reference generator family
(networks_iid_hlgvit_crs_gd4_cfs_v3.py and its 13 sibling variant files —
the siblings differ only in a handful of structural switches, captured here
by `GenSpec`).  Canonical v3 geometry for a 512x512 input
(n_feats=24, patch_size=32, patch_dim=2, loadSize=256):

  stem   conv5x5 3->12 + ResBlock (ref v3:123-127), stride-2 conv 12->24
         (`ds_conv_e01`, ref :297-298) -> ViT trunk at 256x256x24
  enc    3 levels; per level: batched local ViT over 32px tiles + global ViT
         on the 4x-pooled map, fused by 1x1 conv (+ActNorm+ReLU) + residual
         (ref :403-539); stride-2 convs between levels (ref :292-295)
  dec    three mirrored decoders (R :543-701, S :703-856, D :858-1020); R/S
         use sk_conv skip fusion with encoder features (ref :329-338), the D
         decoder fuses its own upsampled features with R's and S's via the
         CFSM2G channel-attention module (ref :885, :920, :1481-1518)
  tails  transpose-conv back to full res + conv/ActNorm/ReLU/ReflectionPad/
         conv7x7/tanh (ref :301-322, :348-383); S outputs 1 channel

TPU-first deltas (numerics preserved):
  * the reference's Crop2x2/Join2x2 recursion (336 sequential LViT calls per
    forward, ref :403-482) is ONE batched attention per level per branch over
    [B*T, 256, E] tokens — shared weights + disjoint tiles make this exact;
  * NHWC layout; all three branches compile into a single XLA program (the
    cross-branch CFS dependency, ref :885, is just dataflow under jit);
  * ActNorm data-dependent init is an explicit functional init pass
    (`an_ctx`) instead of hidden module state.

Reference defects intentionally NOT reproduced (documented in
docs/REFERENCE_DEFECTS.md): the `add` variant's tuple-typo at its line 536,
and `gd2`'s inconsistent pool/upsample counts (we make it a consistent 2x).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field, replace
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops import nn as N
from ..ops.resize import avg_pool2, upsample_bilinear2
from ..ops.tiles import split_tiles, join_tiles
from .vit import ViTSpec, vit_init, vit_apply


# --------------------------------------------------------------------------
# spec
# --------------------------------------------------------------------------

@dataclass(frozen=True)
class GenSpec:
    name: str = "iid_hlgvit_crs_gd4_cfs_v3"
    n_feats: int = 24
    n_colors: int = 3
    patch_size: int = 32          # LViT tile side
    patch_dim: int = 2
    num_heads: int = 4
    num_layers: int = 1
    hidden_dim_ratio: int = 4
    load_size: int = 256          # trunk feature size (== reference loadSize)
    half_res_trunk: bool = True   # v3/v5: stem downsamples 2x, tails upsample
    use_local: bool = True
    use_global: bool = True
    fusion: str = "cat"           # 'cat' = 1x1 conv on concat; 'add' = sum
    d_skip: str = "cfs"           # 'cfs' | 'cat3' (sk_conv on cat(d,r,s))
    branches: str = "rsd"         # decoders present; order r, s, d
    shrink: int = 1               # v5: 4 (channel bottleneck inside ViTs)
    global_pools: int = 2         # gd4: 2 (4x), gd2: 1 (2x)
    shared_tails: bool = False    # no-cfs gd4: one tail for R and D
    lgcat_norm: str = "actnorm"   # 'actnorm' | 'instance' (add-variant)
    # transformer flags (CLI surface parity)
    no_norm: bool = False
    no_mlp: bool = False
    pos_every: bool = False
    no_pos: bool = False

    # -- derived ----------------------------------------------------------
    def level_channels(self, lvl: int) -> int:          # lvl in {1,2,3}
        return self.n_feats * (1 << (lvl - 1))

    def level_size(self, lvl: int) -> int:
        return self.load_size >> (lvl - 1)

    def stem_channels(self) -> int:
        return self.n_feats // 2 if self.half_res_trunk else self.n_feats

    def lvit_spec(self, lvl: int) -> ViTSpec:
        c = self.level_channels(lvl)
        e = c * self.patch_dim ** 2
        return ViTSpec(
            img_dim=self.patch_size, patch_dim=self.patch_dim,
            num_channels=c, embedding_dim=e // self.shrink,
            num_heads=self.num_heads * (1 << (lvl - 1)),
            num_layers=self.num_layers,
            hidden_dim=e * self.hidden_dim_ratio // self.shrink,
            no_norm=self.no_norm, no_mlp=self.no_mlp,
            pos_every=self.pos_every, no_pos=self.no_pos,
            shrink=self.shrink)

    def gvit_spec(self, lvl: int, encoder: bool) -> ViTSpec:
        c = self.level_channels(lvl)
        pd = self.patch_dim * 2
        e = c * pd * pd
        hidden = e * self.hidden_dim_ratio
        if encoder and lvl == 2:
            # reference quirk: globalvit_encoder_02 computes its hidden dim
            # with patch_dim instead of 2*patch_dim (ref v3:200) — kept for
            # checkpoint compatibility.
            hidden = c * self.patch_dim ** 2 * self.hidden_dim_ratio
        return ViTSpec(
            img_dim=self.level_size(lvl) >> self.global_pools,
            patch_dim=pd, num_channels=c, embedding_dim=e // self.shrink,
            num_heads=self.num_heads * (1 << (lvl - 1)),
            num_layers=self.num_layers,
            hidden_dim=hidden // self.shrink,
            no_norm=self.no_norm, no_mlp=self.no_mlp,
            pos_every=self.pos_every, no_pos=self.no_pos,
            global_pools=self.global_pools, shrink=self.shrink)


# --------------------------------------------------------------------------
# actnorm init context
# --------------------------------------------------------------------------

class ANCtx:
    """Collects data-dependent ActNorm initializations during a forward.

    Mirrors the reference behaviour where every ActNorm2d initializes itself
    from the statistics of its first input batch, *sequentially* within one
    forward pass (models/actnorm.py:25-37)."""

    def __init__(self, init: bool):
        self.init = init
        self.updates: Dict[Tuple, dict] = {}

    def __call__(self, p, x, path: Tuple):
        if not self.init:
            return N.actnorm_apply(p, x)
        y, newp = N.actnorm_apply(p, x, init=True)
        self.updates[path] = newp
        return y

    def merge(self, params):
        for path, newp in self.updates.items():
            node = params
            for k in path[:-1]:
                node = node[k]
            node[path[-1]] = newp
        return params


def _can(key, kh, kw, cin, cout):
    """conv + actnorm param group."""
    return {"conv": N.conv_init(key, kh, kw, cin, cout),
            "an": N.actnorm_init(cout)}


def _apply_can(p, x, an, path, stride=1, padding=0):
    return N.relu(an(p["an"], N.conv2d(p["conv"], x, stride, padding),
                     path + ("an",)))


# --------------------------------------------------------------------------
# init
# --------------------------------------------------------------------------

def generator_init(key, spec: GenSpec):
    keys = iter(jax.random.split(key, 256))
    nxt = lambda: next(keys)
    nf = spec.n_feats
    c0 = spec.stem_channels()
    p: dict = {}

    # stem (ref v3:123-127): conv5x5 + ResBlock(k3)
    p["head"] = {
        "conv": N.conv_init(nxt(), 5, 5, spec.n_colors, c0),
        "res": {"c1": N.conv_init(nxt(), 3, 3, c0, c0),
                "c2": N.conv_init(nxt(), 3, 3, c0, c0)},
    }
    if spec.half_res_trunk:
        p["ds_e01"] = {"conv": N.conv_init(nxt(), 3, 3, c0, nf)}

    # encoder
    for lvl in (1, 2, 3):
        c = spec.level_channels(lvl)
        if lvl > 1:
            p[f"ds_e0{lvl}"] = {"conv": N.conv_init(nxt(), 3, 3, c // 2, c)}
        if spec.use_local:
            p[f"lvit_e0{lvl}"] = vit_init(nxt(), spec.lvit_spec(lvl))
        if spec.use_global:
            p[f"gvit_e0{lvl}"] = vit_init(nxt(), spec.gvit_spec(lvl, True))
        if spec.use_local and spec.use_global and spec.fusion == "cat":
            p[f"lgcat_e0{lvl}"] = _can(nxt(), 1, 1, 2 * c, c)

    # decoders
    for b in spec.branches:
        for lvl in (3, 2, 1):
            c = spec.level_channels(lvl)
            if spec.use_local:
                p[f"lvit_d0{lvl}{b}"] = vit_init(nxt(), spec.lvit_spec(lvl))
            if spec.use_global:
                p[f"gvit_d0{lvl}{b}"] = vit_init(nxt(),
                                                 spec.gvit_spec(lvl, False))
            if spec.use_local and spec.use_global and spec.fusion == "cat":
                p[f"lgcat_d0{lvl}{b}"] = _can(nxt(), 1, 1, 2 * c, c)
        # upsample convs (ref :301-322); d03: InstanceNorm, d02/d01: ActNorm
        p[f"us_d03{b}"] = {"conv": N.conv_transpose_init(nxt(), 4, 4,
                                                         4 * nf, 2 * nf)}
        p[f"us_d02{b}"] = {"conv": N.conv_transpose_init(nxt(), 4, 4,
                                                         2 * nf, nf),
                           "an": N.actnorm_init(nf)}
        if spec.half_res_trunk:
            p[f"us_d01{b}"] = {"conv": N.conv_transpose_init(nxt(), 4, 4,
                                                             nf, nf // 2),
                               "an": N.actnorm_init(nf // 2)}
        # skip fusion
        if b in "rs" or spec.d_skip == "enc":
            p[f"sk_d03{b}"] = _can(nxt(), 1, 1, 4 * nf, 2 * nf)
            p[f"sk_d02{b}"] = _can(nxt(), 1, 1, 2 * nf, nf)
        elif spec.d_skip == "cat3":
            p[f"sk_d03{b}"] = _can(nxt(), 1, 1, 6 * nf, 2 * nf)
            p[f"sk_d02{b}"] = _can(nxt(), 1, 1, 3 * nf, nf)
        elif spec.d_skip == "cat_partner":
            # iidr/iids: 1x1 "ConvTranspose2d"(s1) + InstanceNorm + ReLU
            # (ref networks_iidr_hlgvit_crs_gd4.py:279-282)
            p[f"sk_d03{b}"] = {"conv": N.conv_init(nxt(), 1, 1,
                                                   4 * nf, 2 * nf)}
            p[f"sk_d02{b}"] = {"conv": N.conv_init(nxt(), 1, 1, 2 * nf, nf)}
        elif spec.d_skip == "cfs":
            p["cfs_d03d"] = cfs_init(nxt(), 2 * nf)
            p["cfs_d02d"] = cfs_init(nxt(), nf)

    # tails (ref :348-383)
    ct = c0
    for b in spec.branches:
        if spec.shared_tails and b == "d" and "r" in spec.branches:
            continue  # no-cfs gd4 shares tail_color between R and D
        out_c = 1 if b == "s" else spec.n_colors
        tail = {"conv1": N.conv_init(nxt(), 3, 3, ct, ct),
                "conv2": N.conv_init(nxt(), 7, 7, ct, out_c)}
        if b != "s":
            tail["an"] = N.actnorm_init(ct)
        p[f"tail_{b}"] = tail
    return p


def cfs_init(key, c: int):
    """CFSM2G (ref v3:1481-1518): four bias-free squeeze-excite stacks."""
    ks = jax.random.split(key, 8)
    bk = c // 4
    def fc(i):
        return {"c1": {"w": N.kaiming_normal(ks[i], (1, 1, c, bk), c)},
                "c2": {"w": N.kaiming_normal(ks[i + 1], (1, 1, bk, c), bk)}}
    return {"fc_avg_cf1": fc(0), "fc_avg_cf2": fc(2),
            "fc_max_cf1": fc(4), "fc_max_cf2": fc(6)}


def cfs_apply(p, d, r, s):
    comb = d + r + s
    gavg = jnp.mean(comb, axis=(1, 2), keepdims=True)
    gmax = jnp.max(comb, axis=(1, 2), keepdims=True)

    def se(fc, g):
        h = N.relu(N.conv2d(fc["c1"], g))
        return N.conv2d(fc["c2"], h)

    sig1 = jax.nn.sigmoid(se(p["fc_avg_cf1"], gavg) + se(p["fc_max_cf1"], gmax))
    sig2 = jax.nn.sigmoid(se(p["fc_avg_cf2"], gavg) + se(p["fc_max_cf2"], gmax))
    return d + r * sig1 + s * sig2


# --------------------------------------------------------------------------
# apply
# --------------------------------------------------------------------------

def _local_vit(p, spec: GenSpec, lvl: int, x, an, path):
    """Batched tile attention — replaces the reference Crop2x2/Join2x2 tree."""
    b, h, w, _ = x.shape
    tiles = split_tiles(x, spec.patch_size)
    tiles = vit_apply(p, spec.lvit_spec(lvl), tiles, an_ctx=an, path=path)
    return join_tiles(tiles, b, h, w)


def _fuse(p, spec: GenSpec, key: str, lv, gv, res, an):
    if spec.use_local and spec.use_global:
        if spec.fusion == "cat":
            cat = jnp.concatenate([lv, gv], axis=-1)
            return _apply_can(p[key], cat, an, (key,)) + res
        return lv + gv + res
    return (lv if spec.use_local else gv) + res


def _level(p, spec: GenSpec, x, lvl: int, prefix: str, an):
    lv = (_local_vit(p[f"lvit_{prefix}"], spec, lvl, x, an,
                     (f"lvit_{prefix}",)) if spec.use_local else None)
    gv = (vit_apply(p[f"gvit_{prefix}"],
                    spec.gvit_spec(lvl, prefix.startswith("e")), x,
                    an_ctx=an, path=(f"gvit_{prefix}",))
          if spec.use_global else None)
    return _fuse(p, spec, f"lgcat_{prefix}", lv, gv, x, an)


def generator_apply(p, spec: GenSpec, x, an: Optional[ANCtx] = None):
    """x: [B,H,W,3] in [-1,1]; returns dict of branch outputs in [-1,1].

    Output keys: 'r','s','d' (subset per spec.branches); 's' is 1-channel.
    """
    if an is None:
        an = ANCtx(init=False)

    # stem
    h = N.conv2d(p["head"]["conv"], x, padding=2)
    res = N.conv2d(p["head"]["res"]["c2"],
                   N.relu(N.conv2d(p["head"]["res"]["c1"], h, padding=1)),
                   padding=1)
    xf = h + res
    if spec.half_res_trunk:
        xf = N.relu(N.instance_norm(
            N.conv2d(p["ds_e01"]["conv"], xf, stride=2, padding=1)))

    # shared encoder
    x_e = {}
    cur = xf
    for lvl in (1, 2, 3):
        if lvl > 1:
            cur = N.relu(N.instance_norm(
                N.conv2d(p[f"ds_e0{lvl}"]["conv"], cur, stride=2, padding=1)))
        x_e[lvl] = _level(p, spec, cur, lvl, f"e0{lvl}", an)
        cur = x_e[lvl]

    # decoders: R and S first, D last (consumes their us intermediates,
    # ref v3:885, :920)
    us: Dict[str, Dict[int, jnp.ndarray]] = {}
    d1: Dict[str, jnp.ndarray] = {}
    order = [b for b in "rs" if b in spec.branches] + (
        ["d"] if "d" in spec.branches else [])
    for b in order:
        cur = x_e[3]
        us[b] = {}
        for lvl in (3, 2, 1):
            cur = _level(p, spec, cur, lvl, f"d0{lvl}{b}", an)
            if lvl > 1:
                key = f"us_d0{lvl}{b}"
                u = N.conv_transpose2d(p[key]["conv"], cur)
                if lvl == 3:
                    u = N.relu(N.instance_norm(u))
                else:
                    u = N.relu(an(p[key]["an"], u, (key, "an")))
                us[b][lvl] = u
                if b == "d" and spec.d_skip == "cfs":
                    cur = cfs_apply(p[f"cfs_d0{lvl}d"], u,
                                    us["r"][lvl], us["s"][lvl])
                elif b == "d" and spec.d_skip == "cat3":
                    cat = jnp.concatenate([u, us["r"][lvl], us["s"][lvl]],
                                          axis=-1)
                    cur = _apply_can(p[f"sk_d0{lvl}{b}"], cat, an,
                                     (f"sk_d0{lvl}{b}",))
                elif b == "d" and spec.d_skip == "cat_partner":
                    partner = "r" if "r" in spec.branches else "s"
                    cat = jnp.concatenate([u, us[partner][lvl]], axis=-1)
                    cur = N.relu(N.instance_norm(
                        N.conv2d(p[f"sk_d0{lvl}{b}"]["conv"], cat)))
                else:
                    cat = jnp.concatenate([u, x_e[lvl - 1]], axis=-1)
                    cur = _apply_can(p[f"sk_d0{lvl}{b}"], cat, an,
                                     (f"sk_d0{lvl}{b}",))
        d1[b] = cur

    # tails
    out = {}
    for b in order:
        t = d1[b] + xf
        if spec.half_res_trunk:
            key = f"us_d01{b}"
            t = N.conv_transpose2d(p[key]["conv"], t)
            t = N.relu(an(p[key]["an"], t, (key, "an")))
        tkey = f"tail_{b}"
        if spec.shared_tails and b == "d" and "r" in spec.branches:
            tkey = "tail_r"
        tp = p[tkey]
        t2 = N.conv2d(tp["conv1"], t, padding=1)
        if "an" in tp:
            t2 = an(tp["an"], t2, (tkey, "an"))
        t2 = N.relu(t2)
        t2 = N.reflection_pad(t2, 3)
        out[b] = jnp.tanh(N.conv2d(tp["conv2"], t2))
    return out


def generator_forward(p, spec: GenSpec, x, actnorm_init: bool = False):
    """Convenience wrapper; with actnorm_init returns (outputs, new_params)."""
    an = ANCtx(init=actnorm_init)
    out = generator_apply(p, spec, x, an)
    if actnorm_init:
        return out, an.merge(_deep_copy_containers(p))
    return out


def _deep_copy_containers(tree):
    if isinstance(tree, dict):
        return {k: _deep_copy_containers(v) for k, v in tree.items()}
    if isinstance(tree, list):
        return [_deep_copy_containers(v) for v in tree]
    return tree
