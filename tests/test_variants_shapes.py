"""Run/shape tests for ALL registry variants — including the ones whose
reference files crash (documented in docs/REFERENCE_DEFECTS.md) and so
cannot be golden-tested weight-for-weight."""

import numpy as np
import pytest


ALL = ["iid_hlgvit_crs_gd4_cfs_v3", "iid_hlgvit_crs_gd4_cfs",
       "iid_hlgvit_crs_gd4_cfs_v2", "iid_hlgvit_crs_gd4_cfs_pe",
       "iid_hlgvit_crs_gd4_cfs_v5", "iid_hlgvit_crs_gd4",
       "iid_hlgvit_add_gd4", "iid_hlgvit_crs_gd2", "iid_lvit_crs_gd4",
       "iid_gvit_crs_gd4", "iid_vit_crs_gd4", "iid_cnn_crs",
       "iidr_hlgvit_crs_gd4", "iids_hlgvit_crs_gd4", "iidn_hlgvit_crs_gd4",
       "ipt"]

_EXPECT = {
    "rsd": {"r": 3, "s": 1, "d": 3},
    "rd": {"r": 3, "d": 3, "dh": 3},
    "sd": {"s": 1, "d": 3, "dh": 3},
    "d": {"d": 3},
}


@pytest.mark.parametrize("name", ALL)
def test_variant_forward_shapes(name):
    import jax
    import jax.numpy as jnp
    from dataclasses import replace
    from cfen_vit_tpu.models.registry import generator_spec
    from cfen_vit_tpu.models.generator import generator_init, generator_forward

    spec = replace(generator_spec(name), n_feats=8, load_size=64,
                   patch_size=8, num_heads=2, hidden_dim_ratio=2)
    size = 128 if spec.half_res_trunk else 64
    params = generator_init(jax.random.PRNGKey(0), spec)
    x = jnp.asarray(np.random.RandomState(0).randn(1, size, size, 3),
                    jnp.float32)
    out, params = jax.jit(
        lambda p, xx: generator_forward(p, spec, xx, actnorm_init=True)
    )(params, x)
    expect = dict(_EXPECT[spec.branches])
    if not spec.xdh:
        expect.pop("dh", None)
    assert set(out) == set(expect), (name, set(out))
    for k, ch in expect.items():
        assert out[k].shape == (1, size, size, ch), (name, k, out[k].shape)
        assert bool(jnp.all(jnp.isfinite(out[k])))
