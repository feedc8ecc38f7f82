"""Nightly: canonical full-geometry checks (512x512, n_feats=24, ratio=4).

Run with: python -m pytest tests/test_nightly_full_geometry.py -m nightly
"""

import numpy as np
import pytest

from tests.ref_utils import has_reference, ref_path

pytestmark = pytest.mark.nightly


@pytest.mark.skipif(not has_reference(), reason="reference unavailable")
def test_full_canonical_golden():
    """Weight-for-weight parity at the exact README eval geometry."""
    import torch
    import types
    import jax
    import jax.numpy as jnp
    from dataclasses import replace
    from cfen_vit_tpu.models.registry import generator_spec
    from cfen_vit_tpu.models.generator import generator_forward
    from cfen_vit_tpu.interop.torch_import import import_generator_state_dict

    ref_path()
    from models import networks_iid_hlgvit_crs_gd4_cfs_v3 as refmod
    from models import common as ref_common

    o = types.SimpleNamespace(
        n_feats=24, n_colors=3, patch_size=32, patch_dim=2, num_heads=4,
        num_layers=1, hidden_dim_ratio=4, num_queries=1, dropout_rate=0.0,
        no_mlp=False, pos_every=False, no_pos=False, no_norm=False,
        loadSize=256, rgb_range=255, gpu_ids=[], init_type="kaiming",
        scale=[1])
    torch.manual_seed(0)
    net = refmod.define_G(o, ref_common.default_conv).eval()
    x = torch.tensor(np.random.RandomState(0)
                     .rand(1, 3, 512, 512).astype(np.float32) * 2 - 1)
    with torch.no_grad():
        net(x)
        ref = [t.numpy() for t in net(x)]

    spec = replace(generator_spec("iid_hlgvit_crs_gd4_cfs_v3"),
                   n_feats=24, hidden_dim_ratio=4, load_size=256,
                   patch_size=32, num_heads=4)
    params = import_generator_state_dict(net.state_dict(), spec)
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    out = jax.jit(lambda p, xx: generator_forward(p, spec, xx))(params, xj)
    got = {k: np.asarray(v).transpose(0, 3, 1, 2) for k, v in out.items()}
    for k, i in (("r", 0), ("s", 1), ("d", 2)):
        diff = np.abs(got[k] - ref[i]).max()
        assert diff < 5e-4, f"branch {k}: {diff}"


def test_bf16_inference_quality():
    """bf16 compute (the bench default) stays close to fp32 output —
    PSNR(bf16, fp32) must clear 35 dB on the canonical model."""
    import jax
    import jax.numpy as jnp
    from dataclasses import replace
    from cfen_vit_tpu.models.registry import generator_spec
    from cfen_vit_tpu.models.generator import generator_init, generator_forward
    from cfen_vit_tpu.ops.ssim import psnr

    spec = replace(generator_spec("iid_hlgvit_crs_gd4_cfs_v3"),
                   n_feats=24, hidden_dim_ratio=4, load_size=256,
                   patch_size=32, num_heads=4)
    params = generator_init(jax.random.PRNGKey(0), spec)
    x = jnp.asarray(np.random.RandomState(1)
                    .rand(1, 512, 512, 3) * 2 - 1, jnp.float32)
    _, params = jax.jit(lambda p, xx: generator_forward(
        p, spec, xx, actnorm_init=True))(params, x)
    f32 = jax.jit(lambda p, xx: generator_forward(p, spec, xx))(params, x)
    pb = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if a.dtype == jnp.float32 else a, params)
    b16 = jax.jit(lambda p, xx: generator_forward(p, spec, xx))(
        pb, x.astype(jnp.bfloat16))
    val = float(psnr(f32["d"], b16["d"].astype(jnp.float32)))
    assert val > 35.0, f"bf16 PSNR vs fp32 too low: {val:.2f} dB"
