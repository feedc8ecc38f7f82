"""Fused block attention (Pallas/TPU) for the LViT/GViT token blocks.

The model's attention is tiny by LLM standards — sequences of at most 256
tokens (SURVEY.md section 5.7: the Crop2x2 tiling bounds LViT to 256 tokens,
GViT to 256/64/16) — but there are many blocks per step ([B*T, S, E] with
T up to 64 tiles).  The whole (S,S) score matrix fits in VMEM, so instead
of a streaming flash-attention we fuse QK^T -> softmax -> PV into ONE
kernel instance per (batch row), eliminating the [N*h, S, S] logits
round-trip through HBM that the unfused XLA lowering can incur.

The kernel computes all heads of one batch row per grid step: a static
Python loop over heads (4-16) keeps each matmul on the MXU with S=256
operands; softmax runs on the VPU in fp32.

Falls back to the jnp einsum path off-TPU (CPU tests run the fallback and
a correctness test runs the kernel in interpreter mode).
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


def _attn_kernel(num_heads: int, scale: float, q_ref, k_ref, v_ref, o_ref):
    s, e = q_ref.shape[-2], q_ref.shape[-1]
    dh = e // num_heads
    for h in range(num_heads):
        q = q_ref[0, :, h * dh:(h + 1) * dh]
        k = k_ref[0, :, h * dh:(h + 1) * dh]
        v = v_ref[0, :, h * dh:(h + 1) * dh]
        logits = jax.lax.dot_general(
            q.astype(jnp.float32) * scale, k.astype(jnp.float32),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        o_ref[0, :, h * dh:(h + 1) * dh] = jnp.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32
        ).astype(o_ref.dtype)


def fused_block_attention(q, k, v, num_heads: int):
    """q,k,v: [N, S, E] -> [N, S, E]; full (non-causal) attention."""
    n, s, e = q.shape
    dh = e // num_heads
    scale = 1.0 / math.sqrt(dh)
    kernel = functools.partial(_attn_kernel, num_heads, scale)
    block = pl.BlockSpec((1, s, e), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, s, e), q.dtype),
        grid=(n,),
        in_specs=[block, block, block],
        out_specs=block,
        cost_estimate=pl.CostEstimate(
            flops=4 * n * num_heads * s * s * dh,
            bytes_accessed=4 * n * s * e * q.dtype.itemsize,
            transcendentals=n * num_heads * s * s),
    )(q, k, v)


def use_pallas_attention() -> bool:
    """Dispatch policy, set by measurement on TPU v5e (bench_attention.py +
    bench.py, 512x512 canonical model, bf16):

      isolated kernels: pallas wins up to 4.6x on the level-3 LViT blocks
      ([16,256,384]x16h) and is ~par elsewhere; BUT the full model runs
      ~8% FASTER with the plain einsum path (107.9 vs 99.6 img/s @ batch 4)
      because the pallas_call boundary blocks XLA from fusing the q/k/v
      projections and residual adds around the attention core.

    Hence auto = OFF; CFEN_PALLAS_ATTN=1 forces the fused kernel (useful if
    a future XLA regression changes the balance, or for larger seq/dims)."""
    flag = os.environ.get("CFEN_PALLAS_ATTN", "auto")
    if flag != "1" or not _HAS_PALLAS:
        return False
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False
