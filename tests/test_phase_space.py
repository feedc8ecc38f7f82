"""Phase-space reformulation equivalence (ops/phase_space.py).

The phase path must be numerically equivalent (fp reassociation only) to
the plain full-res band — these tests pin that op by op and end to end,
including gradients, so the TPU fast path can ship as the default without
a golden-parity risk."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cfen_vit_tpu.ops import nn as N
from cfen_vit_tpu.ops import phase_space as PH


def test_s2d_roundtrip(rng):
    x = jnp.asarray(rng.randn(2, 8, 10, 3).astype(np.float32))
    ps = PH.space_to_depth(x)
    assert ps.shape == (2, 4, 5, 12)
    # channel packing: (py*2+px)*C + c
    np.testing.assert_allclose(np.asarray(ps[0, 0, 0, 3 * 3 + 1]),
                               np.asarray(x[0, 1, 1, 1]))
    np.testing.assert_allclose(np.asarray(PH.depth_to_space(ps)),
                               np.asarray(x))


@pytest.mark.parametrize("k", [3, 5, 7])
def test_phase_conv_s1_matches_full_res(rng, k):
    ci, co = 4, 5
    x = jnp.asarray(rng.randn(2, 16, 16, ci).astype(np.float32))
    p = {"w": jnp.asarray(rng.randn(k, k, ci, co).astype(np.float32) * 0.2),
         "b": jnp.asarray(rng.randn(co).astype(np.float32))}
    ref = N.conv2d(p, x, padding=(k - 1) // 2)
    wp = PH.expand_s1(p["w"])
    pad = (wp.shape[0] - 1) // 2
    got = N.conv2d({"w": wp, "b": PH.tile4(p["b"])},
                   PH.space_to_depth(x), padding=pad)
    np.testing.assert_allclose(np.asarray(PH.depth_to_space(got)),
                               np.asarray(ref), atol=1e-5)


def test_phase_convT_matches_full_res(rng):
    ci, co = 6, 4
    x = jnp.asarray(rng.randn(2, 8, 8, ci).astype(np.float32))
    p = {"w": jnp.asarray(rng.randn(4, 4, ci, co).astype(np.float32) * 0.2),
         "b": jnp.asarray(rng.randn(co).astype(np.float32))}
    ref = N.conv_transpose2d(p, x, stride=2, padding=1, kernel=4)
    got = PH.conv_ps(x, PH.expand_convT(p["w"]), 1) \
        + PH.tile4(p["b"])
    np.testing.assert_allclose(np.asarray(PH.depth_to_space(got)),
                               np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("k", [3, 5, 7])
def test_sparse_phase_conv_matches_dense(rng, k):
    ci, co = 4, 5
    x = jnp.asarray(rng.randn(2, 16, 16, ci).astype(np.float32))
    p = {"w": jnp.asarray(rng.randn(k, k, ci, co).astype(np.float32) * 0.2),
         "b": jnp.asarray(rng.randn(co).astype(np.float32))}
    ref = N.conv2d(p, x, padding=(k - 1) // 2)
    got = PH.conv_s1_sparse(PH.space_to_depth(x), p["w"], p["b"])
    np.testing.assert_allclose(np.asarray(PH.depth_to_space(got)),
                               np.asarray(ref), atol=1e-5)


def test_sparse_phase_conv_prepadded(rng):
    """conv7 over the reflect-padded tensor: sparse VALID slices must equal
    full-res reflect-pad + conv."""
    ci, co = 3, 2
    x = jnp.asarray(rng.randn(1, 16, 16, ci).astype(np.float32))
    w = jnp.asarray(rng.randn(7, 7, ci, co).astype(np.float32) * 0.2)
    b = jnp.asarray(rng.randn(co).astype(np.float32))
    ref = N.conv2d({"w": w, "b": b}, N.reflection_pad(x, 3), padding=0)
    padded = PH.reflect_pad_ps(PH.space_to_depth(x), 2)
    got = PH.conv_s1_sparse(padded, w, b, prepadded=2)
    np.testing.assert_allclose(np.asarray(PH.depth_to_space(got)),
                               np.asarray(ref), atol=1e-5)


def test_sparse_phase_convT_matches_full_res(rng):
    ci, co = 6, 4
    x = jnp.asarray(rng.randn(2, 8, 8, ci).astype(np.float32))
    p = {"w": jnp.asarray(rng.randn(4, 4, ci, co).astype(np.float32) * 0.2),
         "b": jnp.asarray(rng.randn(co).astype(np.float32))}
    ref = N.conv_transpose2d(p, x, stride=2, padding=1, kernel=4)
    got = PH.convT_sparse(x, p["w"], p["b"])
    np.testing.assert_allclose(np.asarray(PH.depth_to_space(got)),
                               np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("k", [3, 5])
def test_phase_entry_conv_matches_s2d_form(rng, k):
    """Direct stride-2 entry conv on the raw image == s2d + dense phase
    conv (the s2d transpose folded into the conv)."""
    ci, co = 3, 6
    x = jnp.asarray(rng.randn(2, 16, 20, ci).astype(np.float32))
    p = {"w": jnp.asarray(rng.randn(k, k, ci, co).astype(np.float32) * 0.2),
         "b": jnp.asarray(rng.randn(co).astype(np.float32))}
    wp = PH.expand_s1(p["w"])
    pad = (wp.shape[0] - 1) // 2
    ref = N.conv2d({"w": wp, "b": PH.tile4(p["b"])},
                   PH.space_to_depth(x), padding=pad)
    got = PH.conv_entry(x, PH.expand_entry(p["w"]), p["b"])
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_phase_ds_conv_matches_full_res(rng):
    ci, co = 3, 7
    x = jnp.asarray(rng.randn(2, 16, 16, ci).astype(np.float32))
    p = {"w": jnp.asarray(rng.randn(3, 3, ci, co).astype(np.float32) * 0.2),
         "b": jnp.asarray(rng.randn(co).astype(np.float32))}
    ref = N.conv2d(p, x, stride=2, padding=1)
    got = PH.conv_ps(PH.space_to_depth(x), PH.expand_ds(p["w"]),
                     ((1, 0), (1, 0))) + p["b"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_phase_reflect_pad_matches_full_res(rng):
    x = jnp.asarray(rng.randn(1, 16, 12, 2).astype(np.float32))
    # full-res reflect 3/4 both live inside phase cells +-2 — compare the
    # phase pad's full-res view on the region reflect-4 defines
    ref = jnp.pad(x, ((0, 0), (4, 4), (4, 4), (0, 0)), mode="reflect")
    got = PH.depth_to_space(PH.reflect_pad_ps(PH.space_to_depth(x), 2))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=0)


def test_phase_instance_norm_matches_full_res(rng):
    x = jnp.asarray(rng.randn(2, 16, 16, 5).astype(np.float32))
    ref = N.instance_norm(x)
    got = PH.depth_to_space(PH.instance_norm_ps(PH.space_to_depth(x)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def _tiny_spec():
    from dataclasses import replace
    from cfen_vit_tpu.models.registry import generator_spec
    return replace(generator_spec("iid_hlgvit_crs_gd4_cfs_v3"), n_feats=8,
                   load_size=64, patch_size=8, num_heads=2,
                   hidden_dim_ratio=2)


@pytest.mark.slow
@pytest.mark.parametrize("sparse", ["0", "1"])
def test_generator_phase_space_equivalence(rng, sparse):
    """Full generator: CFEN_PHASE_SPACE=1 vs =0 — outputs and grads —
    for both the dense and the per-phase (sparse) kernel forms."""
    from cfen_vit_tpu.models.generator import (generator_init,
                                               generator_forward)
    os.environ["CFEN_PHASE_SPARSE"] = sparse
    os.environ["CFEN_PHASE_TRUNK"] = "0"   # pin band-only (trunk tested below)
    spec = _tiny_spec()
    p = generator_init(jax.random.PRNGKey(0), spec)
    x = jnp.asarray(rng.rand(2, 128, 128, 3).astype(np.float32) * 2 - 1)
    _, p = jax.jit(lambda q, v: generator_forward(
        q, spec, v, actnorm_init=True))(p, x)

    def run(q, v):
        return generator_forward(q, spec, v)

    def loss(q, v):
        o = run(q, v)
        return sum(jnp.sum(jnp.square(t)) for t in o.values())

    # f32 forward equivalence (reassociation-level)
    os.environ["CFEN_PHASE_SPACE"] = "0"
    try:
        ref = jax.jit(run)(p, x)
    finally:
        os.environ["CFEN_PHASE_SPACE"] = "1"
    try:
        got = jax.jit(run)(p, x)
    finally:
        del os.environ["CFEN_PHASE_SPACE"]
    for k in ref:
        d = float(jnp.max(jnp.abs(got[k] - ref[k])))
        assert d < 2e-5, (k, d)

    del os.environ["CFEN_PHASE_SPARSE"]
    del os.environ["CFEN_PHASE_TRUNK"]


_F64_GRAD_CHECK = r"""
import os, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_enable_x64", True)
from dataclasses import replace
from cfen_vit_tpu.models.registry import generator_spec
from cfen_vit_tpu.models.generator import generator_init, generator_forward
spec = replace(generator_spec("iid_hlgvit_crs_gd4_cfs_v3"), n_feats=8,
               load_size=64, patch_size=8, num_heads=2, hidden_dim_ratio=2)
p = generator_init(jax.random.PRNGKey(0), spec)
x = jnp.asarray(np.random.RandomState(5).rand(1, 128, 128, 3) * 2 - 1,
                jnp.float64)
_, p = jax.jit(lambda q, v: generator_forward(
    q, spec, v, actnorm_init=True))(p, x)
p = jax.tree_util.tree_map(
    lambda a: a.astype(jnp.float64) if a.dtype != jnp.float64 else a, p)
def loss(q, v):
    o = generator_forward(q, spec, v)
    return sum(jnp.sum(jnp.square(t)) for t in o.values())
os.environ["CFEN_PHASE_SPACE"] = "0"
ref_g = jax.jit(jax.grad(loss))(p, x)
os.environ["CFEN_PHASE_SPACE"] = "1"
os.environ.setdefault("CFEN_PHASE_TRUNK", "0")
got_g = jax.jit(jax.grad(loss))(p, x)
worst = max(float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(a)) + 1.0))
            for a, b in zip(jax.tree_util.tree_leaves(ref_g),
                            jax.tree_util.tree_leaves(got_g)))
assert worst < 1e-7, worst
print("F64GRAD_OK", worst)
"""


@pytest.mark.slow
def test_generator_phase_space_grads_f64_subprocess():
    """Gradient equivalence in float64 — the formulations are EXACT, so
    the f64 backward must agree to near machine precision (f32 grads
    differ by reassociation noise amplified through 3 levels of
    IN/ActNorm).  Runs in a fresh interpreter: toggling x64 mid-process
    after many f32 compiles segfaulted XLA-CPU in the full-tier run."""
    import subprocess
    import sys
    env = dict(os.environ, PYTHONPATH=os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), JAX_PLATFORMS="cpu")
    r = subprocess.run([sys.executable, "-c", _F64_GRAD_CHECK], env=env,
                       capture_output=True, text=True, timeout=900)
    assert r.returncode == 0 and "F64GRAD_OK" in r.stdout, (
        r.stdout[-2000:], r.stderr[-2000:])


# --------------------------------------------------------------------------
# phase TRUNK (s2d levels) — ops/phase_space.py trunk section
# --------------------------------------------------------------------------

def test_phase_ds_trunk_matches_full_res(rng):
    """k3 s2 p1 downsample with BOTH sides stored s2d."""
    ci, co = 4, 6
    x = jnp.asarray(rng.randn(2, 16, 16, ci).astype(np.float32))
    p = {"w": jnp.asarray(rng.randn(3, 3, ci, co).astype(np.float32) * 0.2),
         "b": jnp.asarray(rng.randn(co).astype(np.float32))}
    ref = N.conv2d(p, x, stride=2, padding=1)               # [2,8,8,co]
    got = PH.conv_ds_trunk(PH.space_to_depth(x),
                           PH.expand_ds_trunk(p["w"]), p["b"])
    np.testing.assert_allclose(np.asarray(PH.depth_to_space(got)),
                               np.asarray(ref), atol=1e-5)


def test_phase_convT_trunk_matches_full_res(rng):
    """ConvTranspose2d(4,s2,p1) with BOTH sides stored s2d."""
    ci, co = 6, 4
    x = jnp.asarray(rng.randn(2, 8, 8, ci).astype(np.float32))
    p = {"w": jnp.asarray(rng.randn(4, 4, ci, co).astype(np.float32) * 0.2),
         "b": jnp.asarray(rng.randn(co).astype(np.float32))}
    ref = N.conv_transpose2d(p, x, stride=2, padding=1, kernel=4)
    got = PH.convT_trunk(PH.space_to_depth(x),
                         PH.expand_convT_trunk(p["w"]), p["b"])
    np.testing.assert_allclose(np.asarray(PH.depth_to_space(got)),
                               np.asarray(ref), atol=1e-5)


def test_phase_1x1_concat_matches_full_res(rng):
    """1x1 conv over an s2d CONCAT: the (phases-of-a)(phases-of-b) stored
    order is baked into the dense kernel's input axis."""
    a, b_, co = 3, 5, 4
    xa = jnp.asarray(rng.randn(2, 8, 8, a).astype(np.float32))
    xb = jnp.asarray(rng.randn(2, 8, 8, b_).astype(np.float32))
    p = {"w": jnp.asarray(rng.randn(1, 1, a + b_, co).astype(np.float32)),
         "b": jnp.asarray(rng.randn(co).astype(np.float32))}
    ref = N.conv2d(p, jnp.concatenate([xa, xb], axis=-1))
    cat_ps = jnp.concatenate([PH.space_to_depth(xa), PH.space_to_depth(xb)],
                             axis=-1)
    got = PH.conv_1x1_ps(cat_ps, PH.expand_1x1_ps(p["w"], (a, b_)), p["b"])
    np.testing.assert_allclose(np.asarray(PH.depth_to_space(got)),
                               np.asarray(ref), atol=1e-5)


def test_pool_phase_mean_matches_avg_pool2(rng):
    from cfen_vit_tpu.ops.resize import avg_pool2
    x = jnp.asarray(rng.randn(2, 12, 12, 5).astype(np.float32))
    ref = avg_pool2(x)
    got = PH.pool_phase_mean(PH.space_to_depth(x))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_up2_ps_matches_upsample_bilinear2(rng):
    from cfen_vit_tpu.ops.resize import upsample_bilinear2
    x = jnp.asarray(rng.randn(2, 7, 9, 5).astype(np.float32))
    ref = upsample_bilinear2(x)
    got = PH.depth_to_space(PH.up2_ps(x))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_permute_vit_params_equivalence(rng):
    """The permuted token pipeline on permuted tokens == original pipeline
    (then permuted), for the LViT s2d coordinate change."""
    from cfen_vit_tpu.models.vit import (ViTSpec, vit_init,
                                         vit_tokens_apply,
                                         permute_vit_params, lvit_s2d_perm)
    c, pd = 5, 2
    spec = ViTSpec(img_dim=8, patch_dim=pd, num_channels=c,
                   embedding_dim=c * pd * pd, num_heads=2, num_layers=2,
                   hidden_dim=2 * c * pd * pd)
    p = vit_init(jax.random.PRNGKey(3), spec)
    t = jnp.asarray(rng.randn(3, spec.seq_length,
                              c * pd * pd).astype(np.float32))
    perm = lvit_s2d_perm(c)
    ref = vit_tokens_apply(p, spec, t, allow_pallas=False)
    got = vit_tokens_apply(permute_vit_params(p, perm), spec,
                           t[..., perm], allow_pallas=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref)[..., perm],
                               atol=2e-5)


@pytest.mark.slow
@pytest.mark.parametrize("remat", [False, "branch", "v5"])
def test_generator_phase_trunk_equivalence(rng, remat):
    """Full generator with the TRUNK s2d path (CFEN_PHASE_TRUNK=1) vs the
    plain path — the canonical v3 spec family with and without remat, and
    the v5 shrink-bottleneck family (pointwise shrink/extend in s2d
    form)."""
    from cfen_vit_tpu.models.generator import (generator_init,
                                               generator_forward,
                                               phase_trunk_supported)
    if remat == "v5":
        from dataclasses import replace
        from cfen_vit_tpu.models.registry import generator_spec
        spec = replace(generator_spec("iid_hlgvit_crs_gd4_cfs_v5"),
                       n_feats=8, load_size=64, patch_size=8, num_heads=2,
                       hidden_dim_ratio=2)
        remat = False
    else:
        spec = _tiny_spec()
    assert phase_trunk_supported(spec)
    p = generator_init(jax.random.PRNGKey(0), spec)
    x = jnp.asarray(rng.rand(2, 128, 128, 3).astype(np.float32) * 2 - 1)
    _, p = jax.jit(lambda q, v: generator_forward(
        q, spec, v, actnorm_init=True))(p, x)

    def run(q, v):
        return generator_forward(q, spec, v, remat=remat)

    os.environ["CFEN_PHASE_SPACE"] = "0"
    try:
        ref = jax.jit(run)(p, x)
    finally:
        os.environ["CFEN_PHASE_SPACE"] = "1"
    os.environ["CFEN_PHASE_TRUNK"] = "1"
    try:
        got = jax.jit(run)(p, x)
    finally:
        del os.environ["CFEN_PHASE_SPACE"]
        del os.environ["CFEN_PHASE_TRUNK"]
    for k in ref:
        d = float(jnp.max(jnp.abs(got[k] - ref[k])))
        assert d < 2e-5, (k, d)


_F64_TRUNK_GRAD_CHECK = _F64_GRAD_CHECK.replace(
    'os.environ.setdefault("CFEN_PHASE_TRUNK", "0")',
    'os.environ["CFEN_PHASE_TRUNK"] = "1"')


@pytest.mark.slow
def test_generator_phase_trunk_grads_f64_subprocess():
    """f64 gradient exactness through the full trunk s2d path (the
    formulation is exact, so grads must agree to ~1e-7 relative)."""
    import subprocess
    import sys
    env = dict(os.environ, PYTHONPATH=os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), JAX_PLATFORMS="cpu")
    r = subprocess.run([sys.executable, "-c", _F64_TRUNK_GRAD_CHECK],
                       env=env, capture_output=True, text=True, timeout=900)
    assert r.returncode == 0 and "F64GRAD_OK" in r.stdout, (
        r.stdout[-2000:], r.stderr[-2000:])
