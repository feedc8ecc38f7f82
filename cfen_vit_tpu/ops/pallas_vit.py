"""Fully-fused ViT token block (Pallas/TPU): the whole LViT/GViT token
pipeline — linear_encoding + residual, positional add, pre-norm attention
layer, MLP, mlp_head + residual — in ONE kernel.

Round 1 shipped an attention-core-only kernel (ops/pallas_attn.py) that won
its microbenchmark but LOST end-to-end: the pallas_call boundary stopped
XLA from fusing the q/k/v projections and residuals around it (BASELINE.md
attention table; VERDICT r1 weak #4).  This kernel moves the boundary OUT:
everything between unfold_tokens and fold_tokens runs in VMEM, so per token
block HBM sees exactly one read of the tokens, one write of the result, and
a one-time load of the (grid-invariant, hence VMEM-resident) weights.  The
f32 [N*h, S, S] attention-probability round-trip of the einsum path —
two of the top-ten HLO time sinks at the canonical geometry
(scripts/profile_hlo.py) — never exists.

Used for blocks whose weights fit comfortably in VMEM (all LViT levels and
GViT level 1; GViT levels 2-3 have E up to 1536 / hidden 6144 with tiny
token counts, where the einsum path is already fine).  Numerics: matmuls
accumulate in f32 and round to the compute dtype after each linear, same
as the XLA einsum lowering; layernorm/softmax run in f32.

Reference semantics mirrored: nn.MultiheadAttention(bias=False) + pre-norm
TransformerEncoderLayer (ref networks_iid_hlgvit_crs_gd4_cfs_v3.py:
1344-1390), LViT.forward token pipeline (:1140-1186).
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except ImportError:  # pragma: no cover
    _HAS_PALLAS = False

# weight budget for keeping a block's weights VMEM-resident (bytes of bf16)
_VMEM_WEIGHT_BUDGET = 9 * 1024 * 1024

# tests flip this to run the kernel through the Pallas interpreter on CPU
_INTERPRET = False


def _kernel(num_heads: int, scale: float, bn: int,
            t_ref, enc_w, enc_b, pos, ln1g, ln1b, wq, wk, wv, wo,
            ln2g, ln2b, l1w, l1b, l2w, l2b, mh1w, mh1b, mh2w, mh2b, o_ref):
    dt = t_ref.dtype
    s, e = t_ref.shape[-2], t_ref.shape[-1]
    dh = e // num_heads
    f32 = jnp.float32

    def lin(x, w, b=None):
        y = jax.lax.dot_general(x, w[:], (((1,), (0,)), ((), ())),
                                preferred_element_type=f32)
        if b is not None:
            y = y + b[:].astype(f32)
        return y.astype(dt)

    def ln(x, g, b):
        x32 = x.astype(f32)
        mu = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
        y = (x32 - mu) * jax.lax.rsqrt(var + 1e-5)
        return (y * g[:].astype(f32) + b[:].astype(f32)).astype(dt)

    t0 = t_ref[:].reshape(bn * s, e)
    # linear_encoding + residual, then positional embedding
    t1 = lin(t0, enc_w, enc_b) + t0
    t1 = t1 + jnp.tile(pos[:].astype(dt), (bn, 1))
    # pre-norm attention
    src2 = ln(t1, ln1g, ln1b)
    q = lin(src2, wq)                                     # [bn*S, E]
    k = lin(src2, wk)
    v = lin(src2, wv)
    outs = []
    # Head split slices the lane dim and reshapes only sublanes
    # (Mosaic rejects lane-splitting shape casts like [.,E]->[.,.,h,dh]).
    for h in range(num_heads):
        sl = slice(h * dh, (h + 1) * dh)
        qh = q[:, sl].reshape(bn, s, dh).astype(f32) * scale
        kh = k[:, sl].reshape(bn, s, dh).astype(f32)
        logits = jax.lax.dot_general(
            qh, kh, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=f32)                   # [bn,S,S]
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(dt)
        oh = jax.lax.dot_general(
            p, v[:, sl].reshape(bn, s, dh),
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=f32).astype(dt)        # [bn,S,dh]
        outs.append(oh.reshape(bn * s, dh))
    attn = jnp.concatenate(outs, axis=-1)                 # [bn*S, E]
    src = t1 + lin(attn, wo)
    # MLP sublayer
    src2 = ln(src, ln2g, ln2b)
    src = src + lin(jnp.maximum(lin(src2, l1w, l1b), 0), l2w, l2b)
    # mlp_head + residual
    out = lin(jnp.maximum(lin(src, mh1w, mh1b), 0), mh2w, mh2b) + src
    o_ref[:] = out.reshape(bn, s, e)


def _flat_weights(p):
    """p: the vit param dict (linear_encoding, pos, layers[0], mlp_head)."""
    layer = p["layers"][0]
    at = layer["attn"]
    return (p["linear_encoding"]["w"], p["linear_encoding"]["b"][None, :],
            p["pos"],
            layer["norm1"]["g"][None, :], layer["norm1"]["b"][None, :],
            at["wq"], at["wk"], at["wv"], at["wo"],
            layer["norm2"]["g"][None, :], layer["norm2"]["b"][None, :],
            layer["linear1"]["w"], layer["linear1"]["b"][None, :],
            layer["linear2"]["w"], layer["linear2"]["b"][None, :],
            p["mlp_head"]["l1"]["w"], p["mlp_head"]["l1"]["b"][None, :],
            p["mlp_head"]["l2"]["w"], p["mlp_head"]["l2"]["b"][None, :])


def supported(p, spec) -> bool:
    """Kernel covers the canonical flag set and VMEM-resident weights."""
    if not _HAS_PALLAS:
        return False
    if (spec.no_norm or spec.no_mlp or spec.no_pos or spec.pos_every
            or spec.num_layers != 1):
        return False
    if spec.seq_length < 64:
        return False
    e, h = spec.embedding_dim, spec.hidden_dim
    if e < int(os.environ.get("CFEN_PALLAS_VIT_MIN_E", "256")):
        # measured r2 (512px canonical, v5e): the kernel loses on the many
        # small-E level-1/2 tile blocks (XLA's fused einsums win at E<=192)
        # and wins on the fat E>=384 blocks; see BASELINE.md
        return False
    wbytes = 2 * (5 * e * e + 4 * e * h + spec.seq_length * e)
    return wbytes <= _VMEM_WEIGHT_BUDGET


def _run(t, weights, num_heads: int, bn: int):
    n, s, e = t.shape
    dh = e // num_heads
    h = weights[11].shape[1]
    kernel = functools.partial(_kernel, num_heads, 1.0 / math.sqrt(dh), bn)
    tok_spec = pl.BlockSpec((bn, s, e), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    w_specs = [pl.BlockSpec(w.shape, lambda i, _nd=w.ndim: (0,) * _nd,
                            memory_space=pltpu.VMEM) for w in weights]
    flops_tile = (2 * s * e * e * 5 + 4 * s * s * e + 4 * s * e * h)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, s, e), t.dtype),
        grid=(n // bn,),
        in_specs=[tok_spec] + w_specs,
        out_specs=tok_spec,
        cost_estimate=pl.CostEstimate(
            flops=n * flops_tile,
            bytes_accessed=2 * n * s * e * t.dtype.itemsize,
            transcendentals=n * num_heads * s * s),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_INTERPRET,
    )(t, *weights)


def _block_vmem_bytes(bn: int, s: int, e: int, h: int) -> int:
    """Rough live-buffer bytes per program: ~6 bf16 token-sized temps
    (t0/t1/src2/q/k/v...), 2 MLP hiddens, 2 f32 [bn,S,S] score buffers."""
    return bn * s * (12 * e + 4 * h + 8 * s)


def _pick_bn(n: int, s: int, e: int, h: int) -> int:
    """Largest power-of-two group dividing n whose buffers fit comfortably
    (Mosaic's scoped-VMEM stack OOM'd at L2 with bn=8 — measured r2)."""
    for bn in (8, 4, 2, 1):
        if n % bn == 0 and _block_vmem_bytes(bn, s, e, h) <= 24 * 1024 * 1024:
            return bn
    return 1


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _fused(t, weights, num_heads):
    n, s, e = t.shape
    h = weights[11].shape[1]
    return _run(t, weights, num_heads, _pick_bn(n, s, e, h))


def _ref_tokens(t, weights, num_heads):
    """einsum reference of the same pipeline (for the backward pass)."""
    (enc_w, enc_b, pos, ln1g, ln1b, wq, wk, wv, wo, ln2g, ln2b,
     l1w, l1b, l2w, l2b, mh1w, mh1b, mh2w, mh2b) = weights
    from ..models import vit as V
    p = {"linear_encoding": {"w": enc_w, "b": enc_b[0]},
         "pos": pos,
         "layers": [{
             "attn": {"wq": wq, "wk": wk, "wv": wv, "wo": wo},
             "norm1": {"g": ln1g[0], "b": ln1b[0]},
             "norm2": {"g": ln2g[0], "b": ln2b[0]},
             "linear1": {"w": l1w, "b": l1b[0]},
             "linear2": {"w": l2w, "b": l2b[0]},
         }],
         "mlp_head": {"l1": {"w": mh1w, "b": mh1b[0]},
                      "l2": {"w": mh2w, "b": mh2b[0]}}}

    nh = num_heads

    class _S:  # minimal spec stand-in for vit_tokens_apply
        no_mlp = False
        no_pos = False
        pos_every = False
        num_heads = nh

    return V.vit_tokens_apply(p, _S(), t, allow_pallas=False)


def _fused_fwd(t, weights, num_heads):
    return _fused(t, weights, num_heads), (t, weights)


def _fused_bwd(num_heads, res, g):
    t, weights = res
    _, vjp = jax.vjp(lambda tt, ww: _ref_tokens(tt, ww, num_heads),
                     t, weights)
    return vjp(g)


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_vit_tokens(p, spec, t):
    """Run the full token pipeline through the fused kernel.

    p: vit param dict; t: [N, S, E].  Caller must have checked supported().
    """
    return _fused(t, _flat_weights(p), spec.num_heads)


def use_pallas_vit() -> bool:
    """Dispatch policy: CFEN_PALLAS_VIT=1 forces the kernel on TPU, =0
    forces the einsum path; 'auto' (default) is OFF by measurement: the r2
    end-to-end table (BASELINE.md "fused ViT-block kernel") showed XLA's
    einsum pipeline beats this kernel at the tuned operating point, so the
    kernel is retired to opt-in.  Full policy: docs/ARCHITECTURE.md
    "Kernel dispatch policy"."""
    flag = os.environ.get("CFEN_PALLAS_VIT", "auto")
    if flag != "1" or not _HAS_PALLAS:
        return False
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False
