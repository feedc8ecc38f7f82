"""Data-parallel semantics on the virtual 8-device CPU mesh.

The reference's DataParallel scatter/gather (SURVEY.md section 2.12) has an
exact SPMD analogue: replicated params, batch-sharded inputs, psum-reduced
grads inserted by XLA.  These tests pin that down: sharded execution must be
numerically equivalent to single-device execution.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P


def test_mesh_helpers():
    from cfen_vit_tpu.parallel.mesh import make_mesh, shard_batch, replicate
    mesh = make_mesh()
    assert mesh.shape["data"] == len(jax.devices())
    mesh2 = make_mesh("4,2")
    assert mesh2.shape == {"data": 4, "model": 2}

    batch = {"B": np.ones((8, 4, 4, 3), np.float32)}
    sb = shard_batch(mesh, batch)
    assert sb["B"].sharding.spec == P("data", None, None, None)
    params = {"w": np.ones((3, 3), np.float32)}
    rp = replicate(mesh, params)
    assert rp["w"].sharding.spec == P()


def test_sharded_forward_matches_single_device(rng):
    from dataclasses import replace
    from cfen_vit_tpu.models.registry import generator_spec
    from cfen_vit_tpu.models.generator import generator_init, generator_forward
    from cfen_vit_tpu.parallel.mesh import make_mesh, shard_batch, replicate

    spec = replace(generator_spec("iid_hlgvit_crs_gd4_cfs_v3"), n_feats=8,
                   load_size=64, patch_size=8, num_heads=2,
                   hidden_dim_ratio=2)
    params = generator_init(jax.random.PRNGKey(0), spec)
    x = rng.randn(8, 128, 128, 3).astype(np.float32)

    fwd = jax.jit(lambda p, xx: generator_forward(p, spec, xx))
    ref = fwd(params, jnp.asarray(x))

    mesh = make_mesh()
    ps = replicate(mesh, params)
    xs = shard_batch(mesh, {"x": x})["x"]
    got = fwd(ps, xs)
    for k in ref:
        # tiny reassociation differences from sharded fusion layouts
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(ref[k]),
                                   atol=2e-4)


def test_dp_train_step_matches_single_device(rng, tmp_path):
    """One GAN step on an 8-way mesh == the same step on 1 device (grads
    are mean-reduced over the same global batch either way).

    Default tier (promoted from nightly per VERDICT r1 #10) so every run
    exercises mesh>1 through the full jitted GAN step; remat off keeps the
    two compiles cheap at this geometry."""
    from cfen_vit_tpu.config import Config
    from cfen_vit_tpu.train.trainer import GanTrainer

    def batch():
        r = np.random.RandomState(7)
        return {
            "B": r.rand(8, 128, 128, 3).astype(np.float32) * 2 - 1,
            "A": r.rand(8, 128, 128, 3).astype(np.float32) * 2 - 1,
            "R": r.rand(8, 128, 128, 3).astype(np.float32) * 2 - 1,
            "S": r.rand(8, 128, 128, 1).astype(np.float32) * 2 - 1,
            "B_paths": [f"{i}.png" for i in range(8)],
        }

    def run(mesh_shape):
        cfg = Config(dataroot=str(tmp_path), name=f"m{mesh_shape}",
                     isTrain=True, checkpoints_dir=str(tmp_path / "c"),
                     n_feats=8, loadSize=64, patch_size=8, num_heads=2,
                     hidden_dim_ratio=2, batchSize=8, pool_size=2,
                     mesh_shape=mesh_shape, sb=True, remat=False)
        tr = GanTrainer(cfg)
        tr.setup(cfg)
        tr.set_input(batch())
        tr.optimize_parameters(cfg)
        return tr.get_current_losses()

    l1 = run("1")
    l8 = run("8")
    for k in l1:
        assert abs(l1[k] - l8[k]) < 5e-3 * max(1.0, abs(l1[k])), (
            k, l1[k], l8[k])


def test_dp_trunk_forced_forward_matches_single_device(rng, monkeypatch):
    """VERDICT r3 #4: the production dispatch path — the phase TRUNK —
    auto-gates OFF on CPU, so without forcing it no multi-device test ever
    runs the ops real multi-chip TPUs execute.  Force it and pin 8-way DP
    equivalence of the trunk forward."""
    monkeypatch.setenv("CFEN_PHASE_SPACE", "1")
    monkeypatch.setenv("CFEN_PHASE_TRUNK", "1")
    from dataclasses import replace
    from cfen_vit_tpu.ops import phase_space as PH
    from cfen_vit_tpu.models.registry import generator_spec
    from cfen_vit_tpu.models.generator import (generator_init,
                                               generator_forward,
                                               phase_trunk_supported)
    from cfen_vit_tpu.parallel.mesh import make_mesh, shard_batch, replicate

    spec = replace(generator_spec("iid_hlgvit_crs_gd4_cfs_v3"), n_feats=8,
                   load_size=64, patch_size=8, num_heads=2,
                   hidden_dim_ratio=2)
    # the force must engage on CPU (that is the point of the test)
    assert phase_trunk_supported(spec)
    assert PH.use_phase_space(1, trunk_ok=True) and PH.use_phase_trunk(1)

    params = generator_init(jax.random.PRNGKey(0), spec)
    x = rng.randn(8, 128, 128, 3).astype(np.float32)
    fwd = jax.jit(lambda p, xx: generator_forward(p, spec, xx))
    ref = fwd(params, jnp.asarray(x))

    mesh = make_mesh()
    got = fwd(replicate(mesh, params), shard_batch(mesh, {"x": x})["x"])
    for k in ref:
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(ref[k]),
                                   atol=2e-4)


def test_dp_trunk_forced_train_step_matches_single_device(
        rng, tmp_path, monkeypatch):
    """Same coverage for the full jitted GAN step: phase-trunk ops under a
    sharded batch axis (grads psum-reduced through the s2d forms) must
    match the single-device step."""
    monkeypatch.setenv("CFEN_PHASE_SPACE", "1")
    monkeypatch.setenv("CFEN_PHASE_TRUNK", "1")
    from cfen_vit_tpu.config import Config
    from cfen_vit_tpu.train.trainer import GanTrainer

    def batch():
        r = np.random.RandomState(13)
        return {
            "B": r.rand(8, 128, 128, 3).astype(np.float32) * 2 - 1,
            "A": r.rand(8, 128, 128, 3).astype(np.float32) * 2 - 1,
            "R": r.rand(8, 128, 128, 3).astype(np.float32) * 2 - 1,
            "S": r.rand(8, 128, 128, 1).astype(np.float32) * 2 - 1,
            "B_paths": [f"{i}.png" for i in range(8)],
        }

    def run(mesh_shape):
        cfg = Config(dataroot=str(tmp_path), name=f"pt{mesh_shape}",
                     isTrain=True, checkpoints_dir=str(tmp_path / "c"),
                     n_feats=8, loadSize=64, patch_size=8, num_heads=2,
                     hidden_dim_ratio=2, batchSize=8, pool_size=2,
                     mesh_shape=mesh_shape, sb=True, remat=False)
        tr = GanTrainer(cfg)
        tr.setup(cfg)
        tr.set_input(batch())
        tr.optimize_parameters(cfg)
        return tr.get_current_losses()

    l1 = run("1")
    l8 = run("8")
    for k in l1:
        assert abs(l1[k] - l8[k]) < 5e-3 * max(1.0, abs(l1[k])), (
            k, l1[k], l8[k])


def test_dp_flash_mrf_forced_matches_single_device(rng, monkeypatch):
    """flash-MRF ships auto-ON on TPU (r4), so real multi-chip training
    runs the Pallas kernels under a sharded batch axis — same coverage gap
    class as the trunk tests above.  Force the kernel (interpret mode on
    CPU) and pin 8-way DP value+grad equivalence of _mrf at a supported
    geometry (P = 32*32 = 1024, C = 256)."""
    monkeypatch.setenv("CFEN_PALLAS_MRF", "1")
    monkeypatch.setenv("CFEN_PALLAS_INTERPRET", "1")
    from cfen_vit_tpu.losses.vgg import _mrf
    from cfen_vit_tpu.ops import pallas_mrf as PM
    from cfen_vit_tpu.parallel.mesh import make_mesh, shard_batch

    assert PM.use_pallas_mrf() and PM.supported(1024, 256)
    o = rng.randn(8, 32, 32, 256).astype(np.float32)
    t = rng.randn(8, 32, 32, 256).astype(np.float32)

    # _mrf sums over the batch, so sharded == single-device exactly
    f = jax.jit(jax.value_and_grad(lambda a, b: _mrf(a, b)))
    ref_v, ref_g = f(jnp.asarray(o), jnp.asarray(t))

    mesh = make_mesh()
    sb = shard_batch(mesh, {"o": o, "t": t})
    got_v, got_g = f(sb["o"], sb["t"])
    assert abs(float(got_v) - float(ref_v)) < 1e-4 * max(1.0, abs(float(ref_v)))
    np.testing.assert_allclose(np.asarray(got_g), np.asarray(ref_g),
                               atol=2e-4, rtol=2e-3)


@pytest.mark.nightly
def test_dp_train_step_canonical_geometry(rng, tmp_path):
    """VERDICT r2 #8: sharded-vs-single train-step parity at the shapes
    users actually run — 512px inputs, n_feats=24 canonical v3 — on a
    2-way mesh.  Nightly: two full-geometry train compiles on 1 CPU core."""
    from cfen_vit_tpu.config import Config
    from cfen_vit_tpu.train.trainer import GanTrainer

    def batch():
        r = np.random.RandomState(11)
        return {
            "B": r.rand(2, 512, 512, 3).astype(np.float32) * 2 - 1,
            "A": r.rand(2, 512, 512, 3).astype(np.float32) * 2 - 1,
            "R": r.rand(2, 512, 512, 3).astype(np.float32) * 2 - 1,
            "S": r.rand(2, 512, 512, 1).astype(np.float32) * 2 - 1,
            "B_paths": [f"{i}.png" for i in range(2)],
        }

    def run(mesh_shape):
        cfg = Config(dataroot=str(tmp_path), name=f"cg{mesh_shape}",
                     isTrain=True, checkpoints_dir=str(tmp_path / "c"),
                     n_feats=24, loadSize=256, patch_size=32, num_heads=4,
                     hidden_dim_ratio=4, batchSize=2, pool_size=2,
                     mesh_shape=mesh_shape, sb=True, remat=False)
        tr = GanTrainer(cfg)
        tr.setup(cfg)
        tr.set_input(batch())
        tr.optimize_parameters(cfg)
        return tr.get_current_losses()

    l1 = run("1")
    l2 = run("2")
    for k in l1:
        assert abs(l1[k] - l2[k]) < 5e-3 * max(1.0, abs(l1[k])), (
            k, l1[k], l2[k])
