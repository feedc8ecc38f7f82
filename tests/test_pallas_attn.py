"""Pallas fused block-attention vs the einsum reference (interpreter mode
on CPU; the same kernel compiles for TPU via Mosaic)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.mark.parametrize("n,s,e,h", [(3, 64, 32, 4), (2, 256, 96, 4)])
def test_fused_attention_matches_einsum(rng, n, s, e, h):
    from jax.experimental import pallas as pl
    from cfen_vit_tpu.ops import pallas_attn as pa
    from cfen_vit_tpu.models.vit import attention_core

    q = jnp.asarray(rng.randn(n, s, e).astype(np.float32))
    k = jnp.asarray(rng.randn(n, s, e).astype(np.float32))
    v = jnp.asarray(rng.randn(n, s, e).astype(np.float32))

    ref = attention_core(q, k, v, h)

    import functools
    import math
    kernel = functools.partial(pa._attn_kernel, h, 1.0 / math.sqrt(e // h))
    from jax.experimental.pallas import tpu as pltpu
    block = pl.BlockSpec((1, s, e), lambda i: (i, 0, 0))
    got = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, s, e), q.dtype),
        grid=(n,),
        in_specs=[block, block, block],
        out_specs=block,
        interpret=True,
    )(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)
