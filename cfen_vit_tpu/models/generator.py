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

from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops import nn as N
from ..ops.patch import unfold_tokens, fold_tokens
from ..ops.tiles import split_tiles, join_tiles
from .vit import (ViTSpec, vit_init, vit_apply, vit_tokens_apply,
                  vit_shrink_apply, vit_apply_ps, permute_vit_params,
                  lvit_s2d_perm)


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
    lgcat_norm: str = "actnorm"   # 'actnorm' | 'instance' (iidr/iids)
    ds_norm: str = "instance"     # down-scale conv norm; 'actnorm' in cnn
    cnn: bool = False             # iid_cnn_crs: ResnetBlocks instead of ViTs
    xdh: bool = False             # iidr/iids: SpatialPyramid refined output
    ipt_style: bool = False       # models/ipt.py (--model vit): add fusion,
                                  # plain residual decoder skips, IN tail,
                                  # no +xf before the tail (ref ipt.py:
                                  # 151-296)
    separate_encoders: bool = False  # models/dec_ipt.py: each branch runs
                                  # its OWN encoder over the shared stem
                                  # (R = unsuffixed modules, S = 's' suffix;
                                  # ref dec_ipt.py:275-871)
    s_dec_from_r_enc: bool = False  # dec_ipt quirk: the S decoder starts
                                  # from the R encoder's level-3 output
                                  # (`x = x_e_03`, ref dec_ipt.py:722 —
                                  # copy-paste bug, silent because shapes
                                  # match; s_e_03 is computed then unused);
                                  # reproduced for checkpoint parity
    s_dec1_ru_zero: bool = False  # dec_ipt quirk #2: in the S decoder's
                                  # level-1 LViT, the top-right quadrant
                                  # join assigns to the stale R-branch
                                  # variable (`xru_lv = join2x2(xru_lv,
                                  # x...)`, ref dec_ipt.py:841), leaving
                                  # sru_lv as Crop2x2's zeros canvas — the
                                  # final local map's ru quadrant is ZERO
                                  # (those 16 tile results are discarded)
    # tail norm varies per variant file: v3/v5/cfs/gd4/cnn use ActNorm on the
    # color tails and none on the 1-channel S tail; lvit/gvit/vit/iidn use
    # ActNorm on ALL tails; add/gd2/iidr/iids (and ipt) use InstanceNorm
    tail_norm: str = "actnorm"    # 'actnorm' | 'instance'
    s_tail_norm: bool = False     # S tail has the norm too
    # lvit/gvit/vit files declare their 1x1 sk convs as ConvTranspose2d
    # (compute-identical; weight layout differs only for the importer)
    sk_conv_transposed: bool = False
    # lvit/gvit/vit/add/gd2/cnn reference files contain a silent typo: the
    # D decoder's level-2 upsample consumes s_d_02 (the S branch's level-2
    # features) instead of d_d_02 (e.g. networks_iid_lvit_crs_gd4.py:791).
    # It does not crash, so trained checkpoints bake it in — reproduced for
    # weight-for-weight parity.
    d02_us_from_s: bool = False
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
        # v5's /4 bottleneck applies to LViT only; its GViT is unchanged
        # (ref networks_iid_hlgvit_crs_gd4_cfs_v5.py GViT class)
        return ViTSpec(
            img_dim=self.level_size(lvl) >> self.global_pools,
            patch_dim=pd, num_channels=c, embedding_dim=e,
            num_heads=self.num_heads * (1 << (lvl - 1)),
            num_layers=self.num_layers,
            hidden_dim=hidden,
            no_norm=self.no_norm, no_mlp=self.no_mlp,
            pos_every=self.pos_every, no_pos=self.no_pos,
            global_pools=self.global_pools, shrink=1)


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

    def level_blocks(lvl):
        """iid_cnn_crs: 2 ResnetBlocks per level instead of ViT branches
        (ref networks_iid_cnn_crs.py:126-146; the reference file's
        ResnetBlock construction crashes on an undefined `padding_type` —
        we implement the intended reflect-padded conv/ActNorm/ReLU blocks)."""
        c = spec.level_channels(lvl)
        return [{"c1": N.conv_init(nxt(), 3, 3, c, c),
                 "an1": N.actnorm_init(c),
                 "c2": N.conv_init(nxt(), 3, 3, c, c),
                 "an2": N.actnorm_init(c)} for _ in range(2)]

    # encoder(s): one shared, or one per branch (dec_ipt)
    enc_suffixes = list(spec.branches) if spec.separate_encoders else [""]
    for be in enc_suffixes:
        for lvl in (1, 2, 3):
            c = spec.level_channels(lvl)
            if lvl > 1:
                p[f"ds_e0{lvl}{be}"] = {"conv": N.conv_init(nxt(), 3, 3,
                                                            c // 2, c)}
                if spec.ds_norm == "actnorm":
                    p[f"ds_e0{lvl}{be}"]["an"] = N.actnorm_init(c)
            if spec.cnn:
                p[f"cnn_e0{lvl}{be}"] = level_blocks(lvl)
                continue
            if spec.use_local:
                p[f"lvit_e0{lvl}{be}"] = vit_init(nxt(), spec.lvit_spec(lvl))
            if spec.use_global:
                p[f"gvit_e0{lvl}{be}"] = vit_init(nxt(),
                                                  spec.gvit_spec(lvl, True))
            if spec.use_local and spec.use_global and spec.fusion == "cat":
                if spec.lgcat_norm == "actnorm":
                    p[f"lgcat_e0{lvl}{be}"] = _can(nxt(), 1, 1, 2 * c, c)
                else:
                    p[f"lgcat_e0{lvl}{be}"] = {"conv": N.conv_init(
                        nxt(), 1, 1, 2 * c, c)}

    # decoders
    for b in spec.branches:
        for lvl in (3, 2, 1):
            c = spec.level_channels(lvl)
            if spec.cnn:
                p[f"cnn_d0{lvl}{b}"] = level_blocks(lvl)
                continue
            if spec.use_local:
                p[f"lvit_d0{lvl}{b}"] = vit_init(nxt(), spec.lvit_spec(lvl))
            if spec.use_global:
                p[f"gvit_d0{lvl}{b}"] = vit_init(nxt(),
                                                 spec.gvit_spec(lvl, False))
            if spec.use_local and spec.use_global and spec.fusion == "cat":
                if spec.lgcat_norm == "actnorm":
                    p[f"lgcat_d0{lvl}{b}"] = _can(nxt(), 1, 1, 2 * c, c)
                else:
                    p[f"lgcat_d0{lvl}{b}"] = {"conv": N.conv_init(
                        nxt(), 1, 1, 2 * c, c)}
        # upsample convs (ref :301-322); d03: InstanceNorm, d02/d01: ActNorm
        # (ipt-style uses InstanceNorm for both, ref ipt.py:189-192)
        p[f"us_d03{b}"] = {"conv": N.conv_transpose_init(nxt(), 4, 4,
                                                         4 * nf, 2 * nf)}
        p[f"us_d02{b}"] = {"conv": N.conv_transpose_init(nxt(), 4, 4,
                                                         2 * nf, nf)}
        if not spec.ipt_style:
            p[f"us_d02{b}"]["an"] = N.actnorm_init(nf)
        if spec.half_res_trunk:
            p[f"us_d01{b}"] = {"conv": N.conv_transpose_init(nxt(), 4, 4,
                                                             nf, nf // 2),
                               "an": N.actnorm_init(nf // 2)}
        # skip fusion
        if spec.d_skip == "res":
            pass  # ipt-style: plain residual with encoder features, no params
        elif b in "rs" or spec.d_skip == "enc":
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
        if (b != "s" or spec.s_tail_norm) and spec.tail_norm == "actnorm":
            tail["an"] = N.actnorm_init(ct)
        p[f"tail_{b}"] = tail

    if spec.xdh:
        # 3 (input) + per-branch output channels (iidr: 3+3+3=9 matching
        # the reference refine1; iids: 3+1+3=7 — the reference hardcodes 9
        # and crashes, we size it consistently)
        in_ch = 3 + sum(1 if b == "s" else spec.n_colors
                        for b in spec.branches)
        p["sp"] = spatial_pyramid_init(nxt(), in_ch)
    return p


def spatial_pyramid_init(key, in_ch: int):
    """SpatialPyramid refiner (ref networks_iidr_hlgvit_crs_gd4.py:1227-1275)
    == the EPDN 'Dehaze' enhancer block (epdn/epdn_networks.py:313-357):
    two 3x3 convs to 32ch, 5 avg-pool scales (32/16/8/4/2) -> 1x1 conv to
    16ch each -> bilinear(align_corners=True) back -> concat -> 3x3 conv to
    RGB + tanh."""
    ks = jax.random.split(key, 8)
    return {
        "refine1": N.conv_init(ks[0], 3, 3, in_ch, 32),
        "refine2": N.conv_init(ks[1], 3, 3, 32, 32),
        "conv1010": N.conv_init(ks[2], 1, 1, 32, 16),
        "conv1020": N.conv_init(ks[3], 1, 1, 32, 16),
        "conv1030": N.conv_init(ks[4], 1, 1, 32, 16),
        "conv1040": N.conv_init(ks[5], 1, 1, 32, 16),
        "conv1050": N.conv_init(ks[6], 1, 1, 32, 16),
        "refine3": N.conv_init(ks[7], 3, 3, 32 + 5 * 16, 3),
    }


def _resize_align_corners(x, h, w):
    """Bilinear resize with align_corners=True (torch F.upsample_bilinear)."""
    import jax.image
    n, ih, iw, c = x.shape
    if ih == 1 and iw == 1:
        return jnp.broadcast_to(x, (n, h, w, c))
    ys = jnp.linspace(0.0, ih - 1.0, h)
    xs = jnp.linspace(0.0, iw - 1.0, w)
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, ih - 1)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, iw - 1)
    y1 = jnp.minimum(y0 + 1, ih - 1)
    x1 = jnp.minimum(x0 + 1, iw - 1)
    fy = (ys - y0).astype(x.dtype)[None, :, None, None]
    fx = (xs - x0).astype(x.dtype)[None, None, :, None]
    g = lambda yi, xi: x[:, yi][:, :, xi]
    top = g(y0, x0) * (1 - fx) + g(y0, x1) * fx
    bot = g(y1, x0) * (1 - fx) + g(y1, x1) * fx
    return top * (1 - fy) + bot * fy


def spatial_pyramid_apply(p, x):
    lrelu = lambda v: N.leaky_relu(v, 0.2)
    d = lrelu(N.conv2d(p["refine1"], x, padding=1))
    d = lrelu(N.conv2d(p["refine2"], d, padding=1))
    n, h, w, c = d.shape
    outs = [d]
    for k, name in ((32, "conv1010"), (16, "conv1020"), (8, "conv1030"),
                    (4, "conv1040"), (2, "conv1050")):
        pooled = jax.lax.reduce_window(d, 0.0, jax.lax.add,
                                       (1, k, k, 1), (1, k, k, 1),
                                       "VALID") / (k * k)
        y = lrelu(N.conv2d(p[name], pooled))
        outs.append(_resize_align_corners(y, h, w))
    cat = jnp.concatenate(outs[1:] + [outs[0]], axis=-1)
    # the reference applies tanh TWICE: refine3 is Sequential(conv, Tanh)
    # and forward wraps it in self.tanh again (`self.tanh(self.refine3(x))`,
    # ref networks_iidr_hlgvit_crs_gd4.py:1277, dec_ipt.py:1362) — silent,
    # baked into any trained checkpoint, so reproduced
    return jnp.tanh(jnp.tanh(N.conv2d(p["refine3"], cat, padding=1)))


def cfs_init(key, c: int):
    """CFSM2G (ref v3:1481-1518): four bias-free squeeze-excite stacks."""
    ks = jax.random.split(key, 8)
    bk = c // 4
    def fc(i):
        return {"c1": {"w": N.kaiming_normal(ks[i], (1, 1, c, bk), c)},
                "c2": {"w": N.kaiming_normal(ks[i + 1], (1, 1, bk, c), bk)}}
    return {"fc_avg_cf1": fc(0), "fc_avg_cf2": fc(2),
            "fc_max_cf1": fc(4), "fc_max_cf2": fc(6)}


def cfs_apply(p, d, r, s, ps: bool = False):
    comb = d + r + s
    if ps:
        # s2d store: global mean over (H, W, phases); global max likewise
        b = comb.shape[0]
        c = comb.shape[-1] // 4
        gavg = jnp.mean(comb, axis=(1, 2)).reshape(b, 4, c).mean(axis=1)
        gmax = jnp.max(comb, axis=(1, 2)).reshape(b, 4, c).max(axis=1)
        gavg = gavg[:, None, None, :]
        gmax = gmax[:, None, None, :]
    else:
        gavg = jnp.mean(comb, axis=(1, 2), keepdims=True)
        gmax = jnp.max(comb, axis=(1, 2), keepdims=True)

    def se(fc, g):
        h = N.relu(N.conv2d(fc["c1"], g))
        return N.conv2d(fc["c2"], h)

    sig1 = jax.nn.sigmoid(se(p["fc_avg_cf1"], gavg) + se(p["fc_max_cf1"], gmax))
    sig2 = jax.nn.sigmoid(se(p["fc_avg_cf2"], gavg) + se(p["fc_max_cf2"], gmax))
    if ps:
        sig1 = jnp.tile(sig1, (1, 1, 1, 4))
        sig2 = jnp.tile(sig2, (1, 1, 1, 4))
    return d + r * sig1 + s * sig2


# --------------------------------------------------------------------------
# apply
# --------------------------------------------------------------------------

def _local_vit(p, spec: GenSpec, lvl: int, x, an, path, ps: bool = False):
    """Batched tile attention — replaces the reference Crop2x2/Join2x2 tree.

    The v5 shrink/extend 1x1 convs are pointwise and applied on the full
    map, which commutes exactly with tiling (same elements per channel, so
    even the data-dependent ActNorm stats match).  Tokenization stays the
    two-step split_tiles+unfold pair: a single fused 8-D transpose was
    measured SLOWER on TPU (1.19 vs 0.78 ms per direction at the canonical
    geometry — the copy engine decomposes 8-D permutes worse than two 6-D
    ones; scripts/profile_hlo.py, r2).

    ps=True: x is the s2d store of the level map (ops/phase_space.py trunk
    section).  With patch_dim == 2 the patchify IS the s2d transform, so
    tokenization reduces to split_tiles at 4C channels + a free reshape;
    the (C,py,px)->(q,C) token-coordinate change is absorbed into the
    block's weights (permute_vit_params), making the pipeline exactly
    equivalent."""
    vs = spec.lvit_spec(lvl)
    b, h, w, _ = x.shape
    if ps:
        from ..ops import phase_space as PH
        tc = spec.patch_size // 2            # tile side in s2d cells
        if vs.shrink > 1:
            # v5 bottleneck: pointwise, so it has an exact s2d form
            sk = p["conv_shrink"]
            x = N.relu(PH.actnorm_ps(sk["an"], PH.conv_1x1_ps(
                x, PH.expand_1x1_ps(sk["conv"]["w"]), sk["conv"].get("b"))))
        tiles = split_tiles(x, tc)
        t = tiles.reshape(tiles.shape[0], tc * tc, tiles.shape[-1])
        pp = permute_vit_params(p, lvit_s2d_perm(vs.embedding_dim // 4))
        t = vit_tokens_apply(pp, vs, t, allow_pallas=False)
        t = t.reshape(t.shape[0], tc, tc, t.shape[-1])
        y = join_tiles(t, b, h, w)
        if vs.shrink > 1:
            ek = p["conv_extend"]
            y = N.relu(PH.actnorm_ps(ek["an"], PH.conv_1x1_ps(
                y, PH.expand_1x1_ps(ek["conv"]["w"]), ek["conv"].get("b"))))
        return y
    if vs.shrink > 1:
        x = vit_shrink_apply(p, "conv_shrink", x, an, path)
    tiles = split_tiles(x, spec.patch_size)
    t = unfold_tokens(tiles, vs.patch_dim)
    t = vit_tokens_apply(p, vs, t)
    x = join_tiles(fold_tokens(t, vs.patch_dim, spec.patch_size,
                               spec.patch_size), b, h, w)
    if vs.shrink > 1:
        x = vit_shrink_apply(p, "conv_extend", x, an, path)
    return x


def _fuse(p, spec: GenSpec, key: str, lv, gv, res, an, ps: bool = False):
    if spec.use_local and spec.use_global:
        if spec.fusion == "cat":
            cat = jnp.concatenate([lv, gv], axis=-1)
            if ps:
                from ..ops import phase_space as PH
                c = lv.shape[-1] // 4
                w_ps = PH.expand_1x1_ps(p[key]["conv"]["w"], (c, c))
                y = PH.conv_1x1_ps(cat, w_ps, p[key]["conv"].get("b"))
                if spec.lgcat_norm == "actnorm":
                    return N.relu(PH.actnorm_ps(p[key]["an"], y)) + res
                return N.relu(PH.instance_norm_ps(y)) + res
            if spec.lgcat_norm == "actnorm":
                return _apply_can(p[key], cat, an, (key,)) + res
            # iidr/iids use InstanceNorm in their lgcat stacks
            # (ref networks_iidr_hlgvit_crs_gd4.py:222)
            y = N.relu(N.instance_norm(N.conv2d(p[key]["conv"], cat)))
            return y + res
        return lv + gv + res
    return (lv if spec.use_local else gv) + res


def _resblock(blocks, x, an, path):
    """iid_cnn_crs level: 2 x (reflect-pad conv/ActNorm/ReLU conv/ActNorm)
    residual blocks, then the level residual is added by the caller."""
    for i, blk in enumerate(blocks):
        y = N.conv2d(blk["c1"], N.reflection_pad(x, 1))
        y = N.relu(an(blk["an1"], y, path + (i, "an1")))
        y = N.conv2d(blk["c2"], N.reflection_pad(y, 1))
        y = an(blk["an2"], y, path + (i, "an2"))
        x = x + y
    return x


def _level(p, spec: GenSpec, x, lvl: int, prefix: str, an,
           vit_ckpt: bool = False, ps: bool = False):
    """vit_ckpt: per-ViT-block rematerialization — only the token pipelines
    (the attention/MLP stacks) recompute in the backward; convs, fusion and
    residuals keep their activations.  Finer than per-level remat.

    ps=True: x (and the level output) is the s2d store of the level map —
    the phase-trunk path (ops/phase_space.py trunk section)."""
    if spec.cnn:
        key = f"cnn_{prefix}"
        return _resblock(p[key], x, an, (key,)) + x
    if vit_ckpt:
        lvit_fn = jax.checkpoint(
            lambda q, v: _local_vit(q, spec, lvl, v, ANCtx(False),
                                    (f"lvit_{prefix}",), ps=ps))
        lv = lvit_fn(p[f"lvit_{prefix}"], x) if spec.use_local else None
    else:
        lv = (_local_vit(p[f"lvit_{prefix}"], spec, lvl, x, an,
                         (f"lvit_{prefix}",), ps=ps)
              if spec.use_local else None)
    if lv is not None and spec.s_dec1_ru_zero and prefix == "d01s":
        # dec_ipt.py:841 quirk: the S decoder level-1 ru quadrant of the
        # local map stays the Crop2x2 zeros canvas (see GenSpec).  The
        # quadrant boundary is at h/2 full-res = h_s2d/2 cells, so the
        # mask is identical in the s2d store.
        h2, w2 = lv.shape[1] // 2, lv.shape[2] // 2
        lv = lv.at[:, :h2, w2:, :].set(0.0)
    gspec = spec.gvit_spec(lvl, prefix.startswith("e"))
    if ps:
        gfn = vit_apply_ps
        if vit_ckpt:
            gfn = jax.checkpoint(lambda q, s_, v: vit_apply_ps(q, s_, v),
                                 static_argnums=(1,))
        gv = (gfn(p[f"gvit_{prefix}"], gspec, x)
              if spec.use_global else None)
    elif vit_ckpt:
        gvit_fn = jax.checkpoint(
            lambda q, v: vit_apply(q, gspec, v, an_ctx=None,
                                   path=(f"gvit_{prefix}",)))
        gv = gvit_fn(p[f"gvit_{prefix}"], x) if spec.use_global else None
    else:
        gv = (vit_apply(p[f"gvit_{prefix}"], gspec, x,
                        an_ctx=an, path=(f"gvit_{prefix}",))
              if spec.use_global else None)
    return _fuse(p, spec, f"lgcat_{prefix}", lv, gv, x, an, ps=ps)


def generator_apply(p, spec: GenSpec, x, an: Optional[ANCtx] = None,
                    remat: bool = False):
    """x: [B,H,W,3] in [-1,1]; returns dict of branch outputs in [-1,1].

    Output keys: 'r','s','d' (subset per spec.branches); 's' is 1-channel.
    remat selects the rematerialization granularity (r1 #6 sweep; measured
    table in BASELINE.md):
      False/"none"  no checkpointing;
      True/"level"  every encoder/decoder level in jax.checkpoint (r1
                    default — mandatory at 512px training, 10x step time
                    without it);
      "level_dots"  per-level checkpoint with the dots_saveable policy
                    (matmul outputs saved, elementwise recomputed);
      "vit"         only the ViT token pipelines recompute (finer: convs
                    and fusions keep activations);
      "branch"      each decoder branch is ONE checkpoint region (coarser:
                    least live memory, most recompute).
    Ignored during the ActNorm init pass (that pass must observe real
    intermediate statistics).
    """
    if an is None:
        an = ANCtx(init=False)
    mode = remat if isinstance(remat, str) else ("level" if remat else
                                                 "none")
    from ..ops import pallas_stem as PS
    from ..ops import phase_space as PH
    trunk_ok = phase_trunk_supported(spec)
    phase = (not an.init and spec.half_res_trunk
             and PH.use_phase_space(x.shape[0], trunk_ok=trunk_ok))
    pst = (phase and trunk_ok and PH.use_phase_trunk(x.shape[0]))

    level_fn = _level
    if mode in ("level", "level_dots", "branch") and not an.init:
        policy = (jax.checkpoint_policies.dots_saveable
                  if mode == "level_dots" else None)

        def level_fn(pp, sspec, xx, lvl, prefix, _an):  # noqa: ANN001
            pure = jax.checkpoint(
                lambda q, v: _level(q, sspec, v, lvl, prefix, ANCtx(False),
                                    ps=pst),
                policy=policy)
            return pure(pp, xx)
    elif mode == "vit" and not an.init:
        def level_fn(pp, sspec, xx, lvl, prefix, _an):  # noqa: ANN001
            return _level(pp, sspec, xx, lvl, prefix, ANCtx(False),
                          vit_ckpt=True, ps=pst)
    elif pst:
        def level_fn(pp, sspec, xx, lvl, prefix, _an):  # noqa: ANN001
            return _level(pp, sspec, xx, lvl, prefix, _an, ps=True)

    # stem.  Preferred TPU path: the whole full-res band (conv5+ResBlock+
    # stride-2 ds conv) in phase space — the pathological C=12 full-res
    # tensors never exist (ops/phase_space.py).  Channel-first Pallas stem
    # kernel and the plain path remain for fallback/parity/init.
    if phase:
        stem_fn = _stem_ds_phase_trunk if pst else _stem_ds_phase
        if mode != "none":
            # under remat, the phase band checkpoints like everything else
            # (unchecked it spills at b>=8 training: 73 s/step vs 1.8)
            stem_fn = jax.checkpoint(stem_fn)
        norm_fn = PH.instance_norm_ps if pst else N.instance_norm
        xf = N.relu(norm_fn(
            stem_fn(x, p["head"], p["ds_e01"]["conv"])))
    else:
        if (not an.init and PS.use_pallas_stem(x.shape[0])
                and PS.supported(spec)):
            xf = _stem_fused(x, p["head"])
        else:
            xf = _stem_plain(x, p["head"])
        if spec.half_res_trunk:
            xf = N.relu(N.instance_norm(
                N.conv2d(p["ds_e01"]["conv"], xf, stride=2, padding=1)))

    # encoder(s): shared, or one per branch over the same stem (dec_ipt,
    # ref dec_ipt.py:275-871 — R uses the unsuffixed modules, S the 's' set)
    enc_suffixes = list(spec.branches) if spec.separate_encoders else [""]
    x_e_by = {}
    for be in enc_suffixes:
        x_e = {}
        cur = xf
        for lvl in (1, 2, 3):
            if lvl > 1:
                key = f"ds_e0{lvl}{be}"
                if pst:
                    cur = PH.conv_ds_trunk(
                        cur, PH.expand_ds_trunk(p[key]["conv"]["w"]),
                        p[key]["conv"].get("b"))
                    cur = (PH.actnorm_ps(p[key]["an"], cur)
                           if spec.ds_norm == "actnorm"
                           else PH.instance_norm_ps(cur))
                else:
                    cur = N.conv2d(p[key]["conv"], cur, stride=2, padding=1)
                    if spec.ds_norm == "actnorm":
                        cur = an(p[key]["an"], cur, (key, "an"))
                    else:
                        cur = N.instance_norm(cur)
                cur = N.relu(cur)
            x_e[lvl] = level_fn(p, spec, cur, lvl, f"e0{lvl}{be}", an)
            cur = x_e[lvl]
        x_e_by[be] = x_e
    enc_of = (lambda b: x_e_by[b]) if spec.separate_encoders else (
        lambda b: x_e_by[""])

    # decoders: R and S first, D last (consumes their us intermediates,
    # ref v3:885, :920)
    us: Dict[str, Dict[int, jnp.ndarray]] = {}
    d1: Dict[str, jnp.ndarray] = {}
    order = [b for b in "rs" if b in spec.branches] + (
        ["d"] if "d" in spec.branches else [])
    lvl_out: Dict[str, Dict[int, jnp.ndarray]] = {}

    def decode_branch(pp, b, cur, encs, partner_us, s2_out, lf, anx):
        """All three decoder levels of one branch.  encs: {2: enc feats of
        level 2, 1: level 1} (skip sources); partner_us: {('r',3): ...}
        cross-branch upsample features consumed by the D branch; s2_out:
        lvl_out['s'][2] for the d02_us_from_s quirk.  Explicit inputs so
        'branch' remat can checkpoint this whole region."""
        us_b: Dict[int, jnp.ndarray] = {}
        l2_out = None
        for lvl in (3, 2, 1):
            cur = lf(pp, spec, cur, lvl, f"d0{lvl}{b}", anx)
            if lvl == 2:
                l2_out = cur
            if lvl > 1:
                key = f"us_d0{lvl}{b}"
                us_src = cur
                if (b == "d" and lvl == 2 and spec.d02_us_from_s
                        and s2_out is not None):
                    us_src = s2_out
                if pst:
                    u = PH.convT_trunk(
                        us_src, PH.expand_convT_trunk(pp[key]["conv"]["w"]),
                        pp[key]["conv"].get("b"))
                    if lvl == 3 or "an" not in pp[key]:
                        u = N.relu(PH.instance_norm_ps(u))
                    else:
                        u = N.relu(PH.actnorm_ps(pp[key]["an"], u))
                else:
                    u = N.conv_transpose2d(pp[key]["conv"], us_src)
                    if lvl == 3 or "an" not in pp[key]:
                        u = N.relu(N.instance_norm(u))
                    else:
                        u = N.relu(anx(pp[key]["an"], u, (key, "an")))
                us_b[lvl] = u

                def sk_ps(skp, parts, norm):
                    cat = jnp.concatenate(parts, axis=-1)
                    w_ps = PH.expand_1x1_ps(
                        skp["conv"]["w"],
                        tuple(q.shape[-1] // 4 for q in parts))
                    y = PH.conv_1x1_ps(cat, w_ps, skp["conv"].get("b"))
                    if norm == "actnorm":
                        return N.relu(PH.actnorm_ps(skp["an"], y))
                    return N.relu(PH.instance_norm_ps(y))

                if b == "d" and spec.d_skip == "cfs":
                    cur = cfs_apply(pp[f"cfs_d0{lvl}d"], u,
                                    partner_us[("r", lvl)],
                                    partner_us[("s", lvl)], ps=pst)
                elif b == "d" and spec.d_skip == "cat3":
                    parts = [u, partner_us[("r", lvl)],
                             partner_us[("s", lvl)]]
                    if pst:
                        cur = sk_ps(pp[f"sk_d0{lvl}{b}"], parts, "actnorm")
                    else:
                        cur = _apply_can(pp[f"sk_d0{lvl}{b}"],
                                         jnp.concatenate(parts, axis=-1),
                                         anx, (f"sk_d0{lvl}{b}",))
                elif spec.d_skip == "res":
                    cur = u + encs[lvl - 1]
                elif b == "d" and spec.d_skip == "cat_partner":
                    pb = "r" if "r" in spec.branches else "s"
                    parts = [u, partner_us[(pb, lvl)]]
                    if pst:
                        cur = sk_ps(pp[f"sk_d0{lvl}{b}"], parts, "instance")
                    else:
                        cur = N.relu(N.instance_norm(
                            N.conv2d(pp[f"sk_d0{lvl}{b}"]["conv"],
                                     jnp.concatenate(parts, axis=-1))))
                else:
                    parts = [u, encs[lvl - 1]]
                    if pst:
                        cur = sk_ps(pp[f"sk_d0{lvl}{b}"], parts, "actnorm")
                    else:
                        cur = _apply_can(pp[f"sk_d0{lvl}{b}"],
                                         jnp.concatenate(parts, axis=-1),
                                         anx, (f"sk_d0{lvl}{b}",))
        return cur, us_b, l2_out

    for b in order:
        cur = enc_of(b)[3]
        if b == "s" and spec.s_dec_from_r_enc and "r" in spec.branches:
            cur = enc_of("r")[3]    # ref dec_ipt.py:722 copy-paste quirk
        encs = {2: enc_of(b)[2], 1: enc_of(b)[1]}
        partner_us = {(pb, lvl): us[pb][lvl] for pb in "rs"
                      if pb in us for lvl in us[pb]}
        s2_out = (lvl_out.get("s", {}).get(2)
                  if (b == "d" and spec.d02_us_from_s
                      and "s" in spec.branches) else None)
        if mode == "branch" and not an.init:
            run = jax.checkpoint(
                lambda pp, c, e, pu, s2, _b=b: decode_branch(
                    pp, _b, c, e, pu, s2,
                    lambda *a: _level(*a, ps=pst), ANCtx(False)))
            cur, us_b, l2_out = run(p, cur, encs, partner_us, s2_out)
        else:
            cur, us_b, l2_out = decode_branch(p, b, cur, encs, partner_us,
                                              s2_out, level_fn, an)
        us[b] = us_b
        lvl_out[b] = {2: l2_out}
        d1[b] = cur

    # tails
    out = {}
    for b in order:
        t = d1[b] if spec.ipt_style else d1[b] + xf
        tkey = f"tail_{b}"
        if spec.shared_tails and b == "d" and "r" in spec.branches:
            tkey = "tail_r"
        tp = p[tkey]
        if phase:
            # whole tail band (convT + norms + conv3x3 + reflect-pad +
            # conv7x7 + tanh) in phase space — see _tail_phase
            tail_fn = _tail_phase
            if mode != "none":
                tail_fn = jax.checkpoint(_tail_phase,
                                         static_argnums=(3, 4, 5))
            out[b] = tail_fn(t, p[f"us_d01{b}"], tp, spec, b, pst)
            continue
        if spec.half_res_trunk:
            key = f"us_d01{b}"
            t = N.conv_transpose2d(p[key]["conv"], t)
            t = N.relu(an(p[key]["an"], t, (key, "an")))
        t2 = N.conv2d(tp["conv1"], t, padding=1)
        if "an" in tp:
            t2 = an(tp["an"], t2, (tkey, "an"))
        elif spec.tail_norm == "instance" and (b != "s" or spec.s_tail_norm):
            t2 = N.instance_norm(t2)
        t2 = N.relu(t2)
        # the reflect-pad + conv7x7 + tanh epilogue dispatches to the
        # channel-first Pallas kernel where XLA's lowering is pathological
        # (batch>=8 layout flip — ops/pallas_tail.py, BASELINE.md cliff)
        from ..ops import pallas_tail as PT
        if (not an.init and PT.use_pallas_tail(t2.shape[0])
                and PT.supported(spec, tp)):
            out[b] = _tail_epilogue_fused(t2, tp["conv2"])
        else:
            out[b] = jnp.tanh(N.conv2d(tp["conv2"],
                                       N.reflection_pad(t2, 3)))

    if spec.xdh:
        # refined dehazed output from input + all branch outputs
        # (ref networks_iidr_hlgvit_crs_gd4.py:771: sp(cat(input, xr, xd)))
        cat = jnp.concatenate([x] + [out[b] for b in order], axis=-1)
        out["dh"] = spatial_pyramid_apply(p["sp"], cat)
    return out


def _stem_ds_phase(x, head_p, ds_conv_p):
    """Stem conv5x5 + ResBlock + stride-2 ds conv entirely in phase space
    (ops/phase_space.py): returns the PRE-InstanceNorm half-res trunk
    tensor.  Exactly equivalent to _stem_plain + ds conv — the full-res
    C=12 tensors never exist."""
    from ..ops import phase_space as PH
    if PH.use_sparse_phase():
        xp = PH.space_to_depth(x)                             # [B,H/2,W/2,12]
        conv = lambda pp, v, _pp=0: PH.conv_s1_sparse(v, pp["w"], pp["b"])
        h = conv(head_p["conv"], xp)
        r1 = N.relu(conv(head_p["res"]["c1"], h))
        r2 = conv(head_p["res"]["c2"], r1)
    else:
        # entry: one stride-2 conv on the RAW image emits the phase-space
        # stem activations directly — the space_to_depth transpose (~0.7 ms
        # of input copies at b8) never materializes
        h = PH.conv_entry(x, PH.expand_entry(head_p["conv"]["w"]),
                          head_p["conv"]["b"])
        c1 = {"w": PH.expand_s1(head_p["res"]["c1"]["w"]),
              "b": PH.tile4(head_p["res"]["c1"]["b"])}
        c2 = {"w": PH.expand_s1(head_p["res"]["c2"]["w"]),
              "b": PH.tile4(head_p["res"]["c2"]["b"])}
        r2 = N.conv2d(c2, N.relu(N.conv2d(c1, h, padding=1)), padding=1)
    xf_ps = h + r2
    ds = PH.conv_ps(xf_ps, PH.expand_ds(ds_conv_p["w"]),
                    ((1, 0), (1, 0)))
    return ds + ds_conv_p["b"].astype(ds.dtype)


def _stem_ds_phase_trunk(x, head_p, ds_conv_p):
    """_stem_ds_phase emitting the s2d store of the half-res trunk (the
    phase-trunk entry): the ds conv becomes an s2d-to-s2d stride-2 conv,
    so the plain trunk tensor never materializes either."""
    from ..ops import phase_space as PH
    h = PH.conv_entry(x, PH.expand_entry(head_p["conv"]["w"]),
                      head_p["conv"]["b"])
    c1 = {"w": PH.expand_s1(head_p["res"]["c1"]["w"]),
          "b": PH.tile4(head_p["res"]["c1"]["b"])}
    c2 = {"w": PH.expand_s1(head_p["res"]["c2"]["w"]),
          "b": PH.tile4(head_p["res"]["c2"]["b"])}
    r2 = N.conv2d(c2, N.relu(N.conv2d(c1, h, padding=1)), padding=1)
    return PH.conv_ds_trunk(h + r2, PH.expand_ds_trunk(ds_conv_p["w"]),
                            ds_conv_p.get("b"))


def phase_trunk_supported(spec: GenSpec) -> bool:
    """Phase-trunk (s2d levels) support gate — covers the half-res
    family (v3 AND v5: the v5 shrink/extend bottlenecks are pointwise and
    have exact s2d forms): patch_dim 2 (so LViT patchify == s2d), pooled
    GViT.  Unsupported specs silently run the band-only phase path."""
    return (spec.half_res_trunk and not spec.cnn
            and spec.patch_dim == 2 and spec.patch_size % 2 == 0
            and (not spec.use_global or spec.global_pools >= 1)
            and spec.level_size(3) % 2 == 0
            and (spec.level_size(3) // 2) % (spec.patch_size // 2) == 0)


def _tail_phase(t, us_p, tail_p, spec: GenSpec, b: str,
                t_is_ps: bool = False):
    """Full tail band in phase space: convT(4,s2,p1) + ActNorm + ReLU +
    conv3x3 (+norm) + ReLU + ReflectionPad(3) + conv7x7 + tanh, all on
    half-res [B,H,W,4C] tensors; one depth_to_space at the very end.
    Numerically equivalent to the plain tail (fp reassociation only).

    t_is_ps: t is the s2d store of the trunk output (phase-trunk path) —
    the convT consumes it via the s2d-to-s2d trunk form."""
    from ..ops import phase_space as PH
    dt = t.dtype
    sparse = PH.use_sparse_phase() and not t_is_ps
    if t_is_ps:
        y = PH.convT_trunk(t, PH.expand_convT_trunk(us_p["conv"]["w"]),
                           us_p["conv"]["b"])
    elif sparse:
        y = PH.convT_sparse(t, us_p["conv"]["w"], us_p["conv"]["b"])
    else:
        y = PH.conv_ps(t, PH.expand_convT(us_p["conv"]["w"]), 1)
        y = y + PH.tile4(us_p["conv"]["b"]).astype(dt)
    # us ActNorm + ReLU (per-channel affine -> params tiled over phases)
    y = (y + PH.tile4(us_p["an"]["b"]).astype(dt)) \
        * jnp.exp(PH.tile4(us_p["an"]["w"])).astype(dt)
    y = N.relu(y)
    if sparse:
        t2 = PH.conv_s1_sparse(y, tail_p["conv1"]["w"],
                               tail_p["conv1"]["b"])
    else:
        c1 = {"w": PH.expand_s1(tail_p["conv1"]["w"]),
              "b": PH.tile4(tail_p["conv1"]["b"])}
        t2 = N.conv2d(c1, y, padding=1)
    if "an" in tail_p:
        t2 = (t2 + PH.tile4(tail_p["an"]["b"]).astype(dt)) \
            * jnp.exp(PH.tile4(tail_p["an"]["w"])).astype(dt)
    elif spec.tail_norm == "instance" and (b != "s" or spec.s_tail_norm):
        t2 = PH.instance_norm_ps(t2)
    t2 = N.relu(t2)
    t2 = PH.reflect_pad_ps(t2, 2)   # full-res reflect 3 ⊂ phase cells ±2
    if sparse:
        o = jnp.tanh(PH.conv_s1_sparse(t2, tail_p["conv2"]["w"],
                                       tail_p["conv2"]["b"], prepadded=2))
    else:
        c2 = {"w": PH.expand_s1(tail_p["conv2"]["w"]),
              "b": PH.tile4(tail_p["conv2"]["b"])}
        o = jnp.tanh(N.conv2d(c2, t2, padding=0))
    return PH.depth_to_space(o)


def _stem_plain(x, head_p):
    """Reference stem: conv5x5 + ResBlock (ref v3:123-127); also the fused
    kernel's backward recompute."""
    h = N.conv2d(head_p["conv"], x, padding=2)
    res = N.conv2d(head_p["res"]["c2"],
                   N.relu(N.conv2d(head_p["res"]["c1"], h, padding=1)),
                   padding=1)
    return h + res


@jax.custom_vjp
def _stem_fused(x, head_p):
    from ..ops.pallas_stem import fused_stem
    return fused_stem(x, head_p)


def _stem_fused_fwd(x, head_p):
    return _stem_fused(x, head_p), (x, head_p)


def _stem_fused_bwd(res, g):
    x, head_p = res
    _, vjp = jax.vjp(_stem_plain, x, head_p)
    return vjp(g)


_stem_fused.defvjp(_stem_fused_fwd, _stem_fused_bwd)


def _tail_epilogue_plain(t2, conv2_p):
    """Reference epilogue (also the fused kernel's backward recompute)."""
    return jnp.tanh(N.conv2d(conv2_p, N.reflection_pad(t2, 3)))


@jax.custom_vjp
def _tail_epilogue_fused(t2, conv2_p):
    from ..ops.pallas_tail import conv7_tail_epilogue
    return conv7_tail_epilogue(t2, conv2_p["w"].astype(t2.dtype),
                               conv2_p["b"])


def _tail_epilogue_fwd(t2, conv2_p):
    return _tail_epilogue_fused(t2, conv2_p), (t2, conv2_p)


def _tail_epilogue_bwd(res, g):
    t2, conv2_p = res
    _, vjp = jax.vjp(_tail_epilogue_plain, t2, conv2_p)
    return vjp(g)


_tail_epilogue_fused.defvjp(_tail_epilogue_fwd, _tail_epilogue_bwd)


def generator_forward(p, spec: GenSpec, x, actnorm_init: bool = False,
                      remat: bool = False):
    """Convenience wrapper; with actnorm_init returns (outputs, new_params)."""
    an = ANCtx(init=actnorm_init)
    out = generator_apply(p, spec, x, an, remat=remat)
    if actnorm_init:
        return out, an.merge(_deep_copy_containers(p))
    return out


def _deep_copy_containers(tree):
    if isinstance(tree, dict):
        return {k: _deep_copy_containers(v) for k, v in tree.items()}
    if isinstance(tree, list):
        return [_deep_copy_containers(v) for v in tree]
    return tree
