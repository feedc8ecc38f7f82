"""PVT backbone run/shape test (the reference's models/pvt.py cannot even
import — it requires timm/mmseg/mmcv which it never ships — so there is no
golden path; see docs/REFERENCE_DEFECTS.md)."""

import numpy as np

import jax
import jax.numpy as jnp


def test_pvt_tiny_pyramid_shapes(rng):
    from cfen_vit_tpu.models.pvt import create_pvt, pvt_apply
    spec, params = create_pvt(jax.random.PRNGKey(0), "pvt_tiny",
                              img_size=64)
    x = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))
    outs = jax.jit(lambda p, xx: pvt_apply(p, spec, xx))(params, x)
    assert [tuple(o.shape) for o in outs] == [
        (2, 16, 16, 64), (2, 8, 8, 128), (2, 4, 4, 320), (2, 2, 2, 512)]
    for o in outs:
        assert bool(jnp.all(jnp.isfinite(o)))


def test_pvt_pos_embed_interpolates(rng):
    """Different input size than img_size: pos embeddings resize."""
    from cfen_vit_tpu.models.pvt import create_pvt, pvt_apply
    spec, params = create_pvt(jax.random.PRNGKey(0), "pvt_tiny",
                              img_size=64)
    x = jnp.asarray(rng.randn(1, 96, 96, 3).astype(np.float32))
    outs = pvt_apply(params, spec, x)
    assert outs[0].shape == (1, 24, 24, 64)
