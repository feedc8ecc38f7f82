"""Local/Global ViT blocks (LViT / GViT) and the 1-layer pre-norm encoder.

Mirrors the reference's LViT/GViT (networks_iid_hlgvit_crs_gd4_cfs_v3.py:
1062-1325) and TransformerEncoder(Layer) (:1344-1390), with two structural
changes that preserve numerics:

  * batch-first [N, S, E] token tensors instead of torch's seq-first;
  * LViT is applied to ALL tiles of a level at once ([B*T, S, E]) — the
    reference calls the same shared-weight module once per tile (336
    calls/forward, ref :403-482).  Disjoint tiles + shared weights make the
    batched form bit-identical per tile.

The reference also constructs a TransformerDecoder and query_embed that are
never called (ref :1116, :1121-1122, :1393-1447); their weights exist in
checkpoints and are ignored by our importer rather than re-created here.

Attention = torch nn.MultiheadAttention(bias=False) semantics: packed
q/k/v projections without bias, scaling 1/sqrt(head_dim), out-proj without
bias (ref :1364).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..ops import nn as N
from ..ops.patch import unfold_tokens, fold_tokens
from ..ops.resize import avg_pool2, upsample_bilinear2


# --------------------------------------------------------------------------
# multi-head attention (torch MultiheadAttention, bias=False)
# --------------------------------------------------------------------------

def mha_init(key, dim: int, num_heads: int):
    kq, kk, kv, ko = jax.random.split(key, 4)
    # in_proj: kaiming_uniform(a=sqrt(5)) over the packed [3E, E] weight
    # (ref :1377); fan_in = E.  out_proj gets kaiming-normal via the global
    # init_weights pass (classname contains 'Linear', ref :49-74).
    del num_heads  # static: threaded through apply, not stored in the pytree
    return {
        "wq": N.kaiming_uniform_a5(kq, (dim, dim), dim),
        "wk": N.kaiming_uniform_a5(kk, (dim, dim), dim),
        "wv": N.kaiming_uniform_a5(kv, (dim, dim), dim),
        "wo": N.kaiming_normal(ko, (dim, dim), dim),
    }


def use_headmajor_attention() -> bool:
    """CFEN_ATTN_HEADMAJOR: 1 forces the head-major MHA (head-split folded
    into the projection dots), 0/auto (default) = packed — MEASURED
    REJECTION on v5e (BASELINE.md r3): head-major is 0.51-0.83x at every
    LViT level; the [E,h,dh] projection fragments into per-head dots that
    cost more than the transposes they remove."""
    import os
    flag = os.environ.get("CFEN_ATTN_HEADMAJOR", "auto")
    return flag == "1"


def mha_apply(p, q_in, k_in, v_in, num_heads):
    """[N,S,E] batch-first self-attention.

    The score/softmax/PV core dispatches to the fused Pallas block-attention
    kernel on TPU (ops/pallas_attn.py) and to plain einsums elsewhere."""
    nh = num_heads
    n, s, e = q_in.shape
    dh = e // nh
    if use_headmajor_attention():
        return mha_apply_headmajor(p, q_in, k_in, v_in, num_heads)
    q = q_in @ p["wq"].astype(q_in.dtype)
    k = k_in @ p["wk"].astype(q_in.dtype)
    v = v_in @ p["wv"].astype(q_in.dtype)

    from ..ops.pallas_attn import fused_block_attention, use_pallas_attention
    if use_pallas_attention():
        out = fused_block_attention(q, k, v, nh)
    else:
        out = attention_core(q, k, v, nh)
    return out @ p["wo"].astype(q_in.dtype)


def mha_apply_headmajor(p, q_in, k_in, v_in, num_heads):
    """MHA with the head split/merge folded into the projection dots.

    The packed form reshapes [N,S,E]->[N,S,h,dh] and the score einsum then
    needs [N,h,S,dh] — XLA materializes the [N,S,E]-sized transposes (3 in,
    1 out per block; a top-HLO sink at the canonical geometry,
    scripts/profile_hlo.py r2).  Projecting with the weight pre-reshaped to
    [E,h,dh] emits q/k/v head-major straight from the dot, and the out-proj
    contracts [N,h,S,dh] x [h,dh,E] directly, so no standalone transpose
    remains.  Same contractions over the same axes => numerically identical
    to the packed path (f32 bit-exact up to XLA dot tiling).

    MEASURED REJECTION (v5e, BASELINE.md r3 table): 0.51-0.83x vs packed on
    the LViT levels — kept opt-in as the receipt, not dispatched."""
    n, s, e = q_in.shape
    nh = num_heads
    dh = e // nh
    dt = q_in.dtype
    wq = p["wq"].astype(dt).reshape(e, nh, dh)
    wk = p["wk"].astype(dt).reshape(e, nh, dh)
    wv = p["wv"].astype(dt).reshape(e, nh, dh)
    wo = p["wo"].astype(dt).reshape(nh, dh, e)
    q = jnp.einsum("nse,ehd->nhsd", q_in, wq)
    k = jnp.einsum("nse,ehd->nhsd", k_in, wk)
    v = jnp.einsum("nse,ehd->nhsd", v_in, wv)
    scale = 1.0 / math.sqrt(dh)
    pt = jnp.float64 if dt == jnp.float64 else jnp.float32
    logits = jnp.einsum("nhqd,nhkd->nhqk", q * scale, k,
                        preferred_element_type=pt)
    if v.dtype == jnp.bfloat16:   # bf16-probs trick, see attention_core
        m = jnp.max(logits, axis=-1, keepdims=True)
        ex = jnp.exp(logits - m)
        denom = jnp.sum(ex, axis=-1, keepdims=True)
        probs = ex.astype(jnp.bfloat16) / denom.astype(jnp.bfloat16)
    else:
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("nhqk,nhkd->nhqd", probs, v)
    return jnp.einsum("nhqd,hde->nqe", out, wo)


def attention_core(q, k, v, num_heads):
    """Reference einsum attention: softmax(QK^T/sqrt(dh))V per head.

    Softmax statistics (max, exp, denominator) are computed in f32; under
    bf16 the exp values are stored bf16 before normalization, halving the
    materialized [N,h,S,S] probability traffic — the f32 probs buffers
    were two of the top-ten HLO sinks at the canonical geometry, and this
    is worth +10.7% end-to-end (199.9 -> 221.3 img/s at b7 512px, v5e;
    output delta vs f32 probs is ~1 ulp of bf16).  The fp32 path is
    bit-unchanged (golden parity)."""
    n, s, e = q.shape
    dh = e // num_heads
    q = q.reshape(n, s, num_heads, dh)
    k = k.reshape(n, s, num_heads, dh)
    v = v.reshape(n, s, num_heads, dh)
    scale = 1.0 / math.sqrt(dh)
    pt = jnp.float64 if q.dtype == jnp.float64 else jnp.float32
    logits = jnp.einsum("nqhd,nkhd->nhqk", q * scale, k,
                        preferred_element_type=pt)
    if v.dtype == jnp.bfloat16:
        m = jnp.max(logits, axis=-1, keepdims=True)
        ex = jnp.exp(logits - m)
        denom = jnp.sum(ex, axis=-1, keepdims=True)
        probs = ex.astype(jnp.bfloat16) / denom.astype(jnp.bfloat16)
    else:
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("nhqk,nkhd->nqhd", probs, v)
    return out.reshape(n, s, e)


# --------------------------------------------------------------------------
# pre-norm encoder layer  (ref TransformerEncoderLayer :1359-1390)
# --------------------------------------------------------------------------

def encoder_layer_init(key, dim: int, num_heads: int, hidden: int,
                       no_norm: bool = False):
    ka, k1, k2 = jax.random.split(key, 3)
    p = {
        "attn": mha_init(ka, dim, num_heads),
        "linear1": {"w": N.kaiming_normal(k1, (dim, hidden), dim),
                    "b": jnp.zeros((hidden,))},
        "linear2": {"w": N.kaiming_normal(k2, (hidden, dim), hidden),
                    "b": jnp.zeros((dim,))},
    }
    if not no_norm:
        p["norm1"] = N.layer_norm_init(dim)
        p["norm2"] = N.layer_norm_init(dim)
    return p


def encoder_layer_apply(p, src, num_heads, pos=None):
    src2 = N.layer_norm(p["norm1"], src) if "norm1" in p else src
    qk = src2 if pos is None else src2 + pos
    src = src + mha_apply(p["attn"], qk, qk, src2, num_heads)
    src2 = N.layer_norm(p["norm2"], src) if "norm2" in p else src
    src2 = N.linear(p["linear2"], N.relu(N.linear(p["linear1"], src2)))
    return src + src2


# --------------------------------------------------------------------------
# LViT / GViT
# --------------------------------------------------------------------------

@dataclass(frozen=True)
class ViTSpec:
    img_dim: int          # spatial size the token grid covers
    patch_dim: int
    num_channels: int
    embedding_dim: int
    num_heads: int
    num_layers: int
    hidden_dim: int
    no_norm: bool = False
    no_mlp: bool = False
    pos_every: bool = False
    no_pos: bool = False
    global_pools: int = 0  # GViT: #avg-pool-2x before / bilinear-2x after
    shrink: int = 1        # v5 variant: channel shrink factor inside the ViT

    @property
    def seq_length(self) -> int:
        return (self.img_dim // self.patch_dim) ** 2

    @property
    def inner_channels(self) -> int:
        """Channels tokenized (v5 shrinks by 4 via a 1x1 conv first)."""
        return self.num_channels // self.shrink

    @property
    def flatten_dim(self) -> int:
        return self.patch_dim * self.patch_dim * self.inner_channels


def vit_init(key, spec: ViTSpec):
    keys = jax.random.split(key, 4 + spec.num_layers)
    p = {}
    c_in = spec.num_channels
    if spec.shrink > 1:
        c_sh = spec.inner_channels
        p["conv_shrink"] = {"conv": N.conv_init(keys[0], 1, 1, c_in, c_sh),
                            "an": N.actnorm_init(c_sh)}
        p["conv_extend"] = {"conv": N.conv_init(keys[1], 1, 1, c_sh, c_in),
                            "an": N.actnorm_init(c_in)}
    if not spec.no_mlp:
        p["linear_encoding"] = N.linear_init(keys[2], spec.flatten_dim,
                                             spec.embedding_dim)
        kh1, kh2 = jax.random.split(keys[3])
        p["mlp_head"] = {
            "l1": N.linear_init(kh1, spec.embedding_dim, spec.hidden_dim),
            "l2": N.linear_init(kh2, spec.hidden_dim, spec.flatten_dim),
        }
    p["layers"] = [
        encoder_layer_init(keys[4 + i], spec.embedding_dim, spec.num_heads,
                           spec.hidden_dim, spec.no_norm)
        for i in range(spec.num_layers)
    ]
    if not spec.no_pos:
        # LearnedPositionalEncoding = nn.Embedding(seq, dim) (ref :1327-1342),
        # torch default init: N(0, 1).
        kpe = jax.random.fold_in(key, 7)
        p["pos"] = jax.random.normal(kpe,
                                     (spec.seq_length, spec.embedding_dim))
    return p


def vit_tokens_apply(p, spec: ViTSpec, t, allow_pallas: bool = True):
    """The token pipeline: linear_encoding -> pos -> encoder layers ->
    mlp_head, on [N, S, flatten] tokens (ref LViT.forward :1140-1186 minus
    the fold/unfold, which callers own).

    On TPU the whole pipeline dispatches to the fully-fused Pallas kernel
    (ops/pallas_vit.py) when the block's weights fit in VMEM; the plain
    jnp path below is the reference implementation, the off-TPU fallback,
    and the kernel's backward-pass recompute."""
    if allow_pallas:
        from ..ops import pallas_vit as PV
        if PV.use_pallas_vit() and PV.supported(p, spec):
            return PV.fused_vit_tokens(p, spec, t)
    if not spec.no_mlp:
        t = N.linear(p["linear_encoding"], t) + t
    pos = p.get("pos")
    if pos is not None and not spec.pos_every:
        t = t + pos.astype(t.dtype)
    for layer in p["layers"]:
        t = encoder_layer_apply(
            layer, t, spec.num_heads, pos=pos.astype(t.dtype)
            if (spec.pos_every and pos is not None) else None)
    if not spec.no_mlp:
        t = N.linear(p["mlp_head"]["l2"],
                     N.relu(N.linear(p["mlp_head"]["l1"], t))) + t
    return t


def vit_shrink_apply(p, key, x, an_ctx=None, path=()):
    """v5 1x1 conv + ActNorm + ReLU bottleneck (key: conv_shrink or
    conv_extend).  Pointwise, so it commutes with tile split/join — the
    generator applies it on the full map before/after tokenization."""
    y = N.conv2d(p[key]["conv"], x)
    y = (an_ctx(p[key]["an"], y, path + (key, "an"))
         if an_ctx else N.actnorm_apply(p[key]["an"], y))
    return N.relu(y)


def vit_apply(p, spec: ViTSpec, x, an_ctx=None, path=()):
    """Apply the ViT block to NHWC maps.

    x: [N, img_dim*(2**global_pools), ..., C].  Returns same shape.
    an_ctx: optional ActNorm context (see generator._ANCtx) used by the v5
    shrink convs — the only stateful norm inside a ViT block.
    """
    if spec.global_pools:
        for _ in range(spec.global_pools):
            x = avg_pool2(x)

    if spec.shrink > 1:
        x = vit_shrink_apply(p, "conv_shrink", x, an_ctx, path)

    n, h, w, c = x.shape
    t = unfold_tokens(x, spec.patch_dim)          # [N, S, flatten]
    t = vit_tokens_apply(p, spec, t)
    x = fold_tokens(t, spec.patch_dim, h, w)

    if spec.shrink > 1:
        x = vit_shrink_apply(p, "conv_extend", x, an_ctx, path)

    if spec.global_pools:
        for _ in range(spec.global_pools):
            x = upsample_bilinear2(x)
    return x


# --------------------------------------------------------------------------
# phase-space (s2d) trunk support — see ops/phase_space.py trunk section
# --------------------------------------------------------------------------

def lvit_s2d_perm(c: int):
    """Token-dim permutation for LViT patch_dim=2 tokens read from the s2d
    store.  unfold_tokens flattens (C, py, px) C-major (index c*4 + q);
    the s2d channel packing is phase-major (index q*C + c).  perm[i] =
    unfold index feeding s2d slot i, i.e. perm[q*C+c] = c*4 + q."""
    import numpy as np
    idx = np.empty(4 * c, np.int32)
    for q in range(4):
        for i in range(c):
            idx[q * c + i] = i * 4 + q
    return idx


def permute_vit_params(p, perm):
    """Re-express a ViT token pipeline for permuted token coordinates:
    with tokens t' = t[..., perm] the pipeline below is EXACTLY equivalent
    to the original on t (same contractions, fp-identical up to XLA dot
    tiling), because every E-dim weight absorbs the permutation:

      linear_encoding  W' = W[perm][:, perm] (the residual `+ t` forces
                       both sides; E == flatten_dim by construction)
      pos, layer norms, biases: index by perm
      attention        wq/wk/wv rows permuted (q/k/v stay in ORIGINAL
                       coordinates, so head split is untouched), wo
                       columns permuted back to token coordinates
      mlp l1/linear1   rows permuted; l2/linear2 columns permuted

    Cost: a handful of [E,E] weight gathers per block per step — noise
    next to the token matmuls they enable (the s2d store makes LViT
    tokenization a free reshape)."""
    perm = jnp.asarray(perm)
    out = dict(p)
    if "linear_encoding" in p:
        le = p["linear_encoding"]
        out["linear_encoding"] = {"w": le["w"][perm][:, perm],
                                  "b": le["b"][perm]}
    if "mlp_head" in p:
        mh = p["mlp_head"]
        out["mlp_head"] = {
            "l1": {"w": mh["l1"]["w"][perm], "b": mh["l1"]["b"]},
            "l2": {"w": mh["l2"]["w"][:, perm], "b": mh["l2"]["b"][perm]},
        }
    if "pos" in p:
        out["pos"] = p["pos"][:, perm]
    layers = []
    for lp in p["layers"]:
        lq = dict(lp)
        at = lp["attn"]
        lq["attn"] = {"wq": at["wq"][perm], "wk": at["wk"][perm],
                      "wv": at["wv"][perm], "wo": at["wo"][:, perm]}
        lq["linear1"] = {"w": lp["linear1"]["w"][perm],
                         "b": lp["linear1"]["b"]}
        lq["linear2"] = {"w": lp["linear2"]["w"][:, perm],
                         "b": lp["linear2"]["b"][perm]}
        for nk in ("norm1", "norm2"):
            if nk in lp:
                lq[nk] = {"g": lp[nk]["g"][perm], "b": lp[nk]["b"][perm]}
        layers.append(lq)
    out["layers"] = layers
    return out


def vit_apply_ps(p, spec: ViTSpec, x_ps):
    """GViT applied to the s2d store of its input map (global_pools >= 1).

    The first avg_pool2 IS the phase mean of the s2d store
    (ops/phase_space.py pool_phase_mean); the remaining pools, the token
    pipeline, and all but the last upsample run on the small plain maps
    unchanged; the final upsample_bilinear2 emits the s2d store directly
    (up2_ps).  Token values are bit-identical to the plain path."""
    from ..ops import phase_space as PH
    assert spec.global_pools >= 1 and spec.shrink == 1
    x = PH.pool_phase_mean(x_ps)
    for _ in range(spec.global_pools - 1):
        x = avg_pool2(x)
    n, h, w, c = x.shape
    t = unfold_tokens(x, spec.patch_dim)
    t = vit_tokens_apply(p, spec, t)
    x = fold_tokens(t, spec.patch_dim, h, w)
    for _ in range(spec.global_pools - 1):
        x = upsample_bilinear2(x)
    return PH.up2_ps(x)
