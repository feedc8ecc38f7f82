"""Training smoke tests: one jitted GAN step end-to-end on tiny geometry.

Checks the full 7-term G loss + 3-discriminator D loss step runs, losses
are finite, params actually change, checkpoints round-trip, and the
device-side ImagePool honours the reference's sampling semantics.
"""

import os

import numpy as np
import pytest


def _tiny_cfg(tmp_path, **kw):
    from cfen_vit_tpu.config import Config
    base = dict(dataroot=str(tmp_path), name="t", isTrain=True,
                checkpoints_dir=str(tmp_path / "ckpt"),
                n_feats=8, loadSize=64, patch_size=8, num_heads=2,
                hidden_dim_ratio=2, batchSize=2, pool_size=4, sb=True)
    base.update(kw)
    return Config(**base)


def _batch(rng, n=2, size=128):
    return {
        "B": rng.rand(n, size, size, 3).astype(np.float32) * 2 - 1,
        "A": rng.rand(n, size, size, 3).astype(np.float32) * 2 - 1,
        "R": rng.rand(n, size, size, 3).astype(np.float32) * 2 - 1,
        "S": rng.rand(n, size, size, 1).astype(np.float32) * 2 - 1,
        "B_paths": [f"x{i}.png" for i in range(n)],
    }


@pytest.mark.slow
def test_train_step_runs_and_updates(rng, tmp_path):
    import jax
    from cfen_vit_tpu.train.trainer import GanTrainer

    cfg = _tiny_cfg(tmp_path)
    tr = GanTrainer(cfg)
    tr.setup(cfg)
    batch = _batch(rng)
    tr.set_input(batch)
    tr.optimize_parameters(cfg)
    g0 = jax.tree_util.tree_map(np.asarray, tr.state["g"])
    losses1 = tr.get_current_losses()
    assert all(np.isfinite(v) for v in losses1.values()), losses1
    expected = {"G", "GAN_a", "GAN_r", "GAN_s", "vgg_a", "vgg_r", "vgg_s",
                "L2_a", "L2_r", "L2_s", "gradient_fake_a", "gradient_fake_r",
                "gradient_fake_s", "ssim_a", "ssim_r", "ssim_s", "p", "s",
                "DA", "DR", "DS"}
    assert expected <= set(losses1), set(losses1)

    tr.set_input(_batch(rng))
    tr.optimize_parameters(cfg)
    g1 = tr.state["g"]
    moved = np.abs(np.asarray(g1["head"]["conv"]["w"])
                   - g0["head"]["conv"]["w"]).max()
    assert moved > 0, "G params did not update"

    vis = tr.get_current_visuals()
    assert {"real_B", "fake_A", "fake_R", "fake_S", "real_A"} <= set(vis)

    tr.save_networks(1)
    d = os.path.join(cfg.checkpoints_dir, cfg.name)
    assert os.path.exists(os.path.join(d, "1_net_G.msgpack"))
    assert os.path.exists(os.path.join(d, "1_net_D_A.msgpack"))

    # lr schedule steps like the reference lambda rule
    lr0 = tr.lr
    tr.update_learning_rate()
    assert tr.lr <= lr0


def test_image_pool_semantics(rng):
    """Below capacity the pool returns the input and stores it; at capacity
    it returns either the input or a swapped-out buffer entry."""
    import jax
    import jax.numpy as jnp
    from cfen_vit_tpu.train.trainer import pool_init, pool_query

    imgs = jnp.asarray(rng.randn(3, 4, 4, 1).astype(np.float32))
    pool = pool_init(4, (4, 4, 1))
    key = jax.random.PRNGKey(0)
    pool, out = pool_query(pool, imgs, key)
    np.testing.assert_allclose(np.asarray(out), np.asarray(imgs))
    assert int(pool["n"]) == 3
    np.testing.assert_allclose(np.asarray(pool["buf"][:3]),
                               np.asarray(imgs))

    # fill to capacity, then query: each output is input or a buffer entry
    more = jnp.asarray(rng.randn(3, 4, 4, 1).astype(np.float32))
    pool, _ = pool_query(pool, more, jax.random.PRNGKey(1))
    assert int(pool["n"]) == 4
    buf_before = np.asarray(pool["buf"])
    probe = jnp.asarray(rng.randn(2, 4, 4, 1).astype(np.float32))
    pool, out = pool_query(pool, probe, jax.random.PRNGKey(2))
    for i in range(2):
        o = np.asarray(out[i])
        candidates = [np.asarray(probe[i])] + list(buf_before)
        assert any(np.allclose(o, c) for c in candidates)


def test_lr_schedule_matches_reference_lambda():
    from cfen_vit_tpu.train.schedule import lr_for_epoch
    from cfen_vit_tpu.config import Config
    cfg = Config(lr=1e-4, niter=100, niter_decay=200, epoch_count=1)
    # flat for the first niter epochs
    assert lr_for_epoch(cfg, 0) == pytest.approx(1e-4)
    assert lr_for_epoch(cfg, 98) == pytest.approx(1e-4)
    # linear decay afterwards, hitting ~0 at the end
    assert lr_for_epoch(cfg, 99) < 1e-4
    assert lr_for_epoch(cfg, 299) == pytest.approx(0.0, abs=1e-12)


@pytest.mark.slow
def test_train_step_bf16_remat(rng, tmp_path):
    """Mixed precision (bf16 compute, fp32 master) + per-level remat."""
    from cfen_vit_tpu.train.trainer import GanTrainer

    cfg = _tiny_cfg(tmp_path, compute_dtype="bfloat16", remat=True)
    tr = GanTrainer(cfg)
    tr.setup(cfg)
    tr.set_input(_batch(rng))
    tr.optimize_parameters(cfg)
    losses = tr.get_current_losses()
    assert all(np.isfinite(v) for v in losses.values()), losses
    # master params stayed fp32
    import jax.numpy as jnp
    assert tr.state["g"]["head"]["conv"]["w"].dtype == jnp.float32


def _wrapper_step(rng, tmp_path, model, expect_d):
    from cfen_vit_tpu.train.trainer import GanTrainer

    cfg = _tiny_cfg(tmp_path, model=model,
                    dataset_mode="vit" if model == "vit" else "dec_vit")
    tr = GanTrainer(cfg)
    tr.setup(cfg)
    size = 128 if tr.spec.half_res_trunk else 64
    tr.set_input(_batch(rng, size=size))
    tr.optimize_parameters(cfg)
    losses = tr.get_current_losses()
    assert all(np.isfinite(v) for v in losses.values()), losses
    assert set(tr.branches.values()) == expect_d


@pytest.mark.slow
def test_dec_mgvit_train_step(rng, tmp_path):
    """Default-tier coverage for a non-dec_vit trainer loss set (VERDICT r2
    weak #6): dec_mgvit exercises the DECMGVIT branch structure + losses.
    The full wrapper sweep stays nightly below."""
    _wrapper_step(rng, tmp_path, "dec_mgvit", {"A", "R", "S"})


@pytest.mark.nightly
@pytest.mark.parametrize("model,expect_d", [
    ("decr_vit", {"A", "R"}), ("decs_vit", {"A", "S"}),
    ("decn_vit", {"A"}), ("vit", {"A"})])
def test_wrapper_models_train_step(rng, tmp_path, model, expect_d):
    """One GAN step for each reference wrapper model (--model decr_vit /
    decs_vit / decn_vit / vit). The reference's own wrappers crash on
    missing ECLoss/TVLoss imports (docs/REFERENCE_DEFECTS.md); ours run."""
    _wrapper_step(rng, tmp_path, model, expect_d)


@pytest.mark.slow
def test_grad_accumulation(rng, tmp_path):
    """grad_accum=2: step runs, pools advance by the FULL batch, and for
    mean losses grads match the one-shot step closely."""
    import jax
    from cfen_vit_tpu.train.trainer import GanTrainer

    b = _batch(rng, n=4)
    def run(accum, name):
        cfg = _tiny_cfg(tmp_path, batchSize=4, grad_accum=accum, name=name)
        tr = GanTrainer(cfg)
        tr.setup(cfg)
        tr.set_input({k: (v.copy() if hasattr(v, "copy") else v)
                      for k, v in b.items()})
        tr.optimize_parameters(cfg)
        return tr

    t1 = run(1, "a1")
    t2 = run(2, "a2")
    l1, l2 = t1.get_current_losses(), t2.get_current_losses()
    assert all(np.isfinite(v) for v in l2.values()), l2
    # pools saw all 4 images either way
    assert int(np.asarray(t1.state["pools"]["A"]["n"])) == 4
    assert int(np.asarray(t2.state["pools"]["A"]["n"])) == 4
    # mean-normalized losses agree (sum-normalized 'p' is scaled by 1/accum)
    for k in ("L2_a", "ssim_a", "GAN_a", "vgg_a"):
        assert abs(l1[k] - l2[k]) < 5e-3 * max(1.0, abs(l1[k])), (k, l1[k],
                                                                  l2[k])
    # updated G params are close (identical up to p-term rescale + fp noise)
    w1 = np.asarray(t1.state["g"]["head"]["conv"]["w"])
    w2 = np.asarray(t2.state["g"]["head"]["conv"]["w"])
    assert np.abs(w1 - w2).max() < 5e-4


@pytest.mark.slow
def test_u8_wire_train_equivalence(rng, tmp_path, monkeypatch):
    """Loader-style batches (u8/127.5-1 floats) ride the uint8 wire (4x less
    host->device traffic over the relay); the on-device denormalize must
    reproduce the float-wire step exactly."""
    import cfen_vit_tpu.train.trainer as T
    from cfen_vit_tpu.train.trainer import GanTrainer, _u8_wire

    u8 = {k: rng.randint(0, 256, (2, 128, 128, 3 if k != "S" else 1))
          .astype(np.uint8) for k in ("B", "A", "R", "S")}
    b = {k: v.astype(np.float32) / 127.5 - 1.0 for k, v in u8.items()}
    b["B_paths"] = ["x0.png", "x1.png"]

    # the wire detects loader floats as losslessly u8-representable
    assert _u8_wire(b["B"]).dtype == np.uint8
    assert np.array_equal(_u8_wire(b["B"]), u8["B"])
    # ... and leaves synthetic floats alone
    arb = rng.rand(2, 8, 8, 3).astype(np.float32) * 2 - 1
    assert _u8_wire(arb).dtype == np.float32

    def run(name, force_float):
        if force_float:
            monkeypatch.setattr(T, "_u8_wire", lambda v: v)
        else:
            monkeypatch.setattr(T, "_u8_wire", _u8_wire)
        cfg = _tiny_cfg(tmp_path, name=name)
        tr = GanTrainer(cfg)
        tr.setup(cfg)
        tr.set_input({k: (v.copy() if hasattr(v, "copy") else v)
                      for k, v in b.items()})
        assert (tr._batch["B"].dtype == (np.float32 if force_float
                                         else np.uint8))
        tr.optimize_parameters(cfg)
        return tr

    t_f = run("wf", True)
    t_u = run("wu", False)
    lf, lu = t_f.get_current_losses(), t_u.get_current_losses()
    for k in lf:
        assert abs(lf[k] - lu[k]) <= 1e-6 * max(1.0, abs(lf[k])), (
            k, lf[k], lu[k])
    wf = np.asarray(t_f.state["g"]["head"]["conv"]["w"])
    wu = np.asarray(t_u.state["g"]["head"]["conv"]["w"])
    np.testing.assert_allclose(wf, wu, rtol=0, atol=1e-6)
    # visuals give back the exact original bytes through tensor2im
    from cfen_vit_tpu.utils.images import tensor2im
    vis = t_u.get_current_visuals()
    assert np.array_equal(tensor2im(np.asarray(vis["real_B"])[0]), u8["B"][0])


def test_skip_threshold_select_gating(rng, tmp_path):
    """A diverged batch must leave params, Adam moments and pools EXACTLY
    unchanged — the old multiplicative gate turned 0*NaN into NaN and the
    r5 device overfit run poisoned the whole state through the 'skip'.
    Also: a non-finite G loss (NaN inputs) must itself trigger the skip."""
    import jax
    import jax.numpy as jnp
    from cfen_vit_tpu.train.trainer import GanTrainer

    cfg = _tiny_cfg(tmp_path, skip_threshold=-1.0)   # always skip
    tr = GanTrainer(cfg)
    tr.setup(cfg)
    b = _batch(rng)
    tr.set_input(b)
    tr.optimize_parameters(cfg)                      # init + first step
    snap = jax.tree_util.tree_map(
        np.asarray, {k: tr.state[k] for k in ("g", "d", "g_opt", "d_opt",
                                              "pools")})
    tr.set_input(b)
    tr.optimize_parameters(cfg)                      # skipped step
    for key in snap:
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                       np.asarray(b)),
            tr.state[key], snap[key])

    # NaN batch with a normal threshold: loss goes non-finite, state must
    # stay finite and unchanged
    cfg2 = _tiny_cfg(tmp_path, name="t2")
    tr2 = GanTrainer(cfg2)
    tr2.setup(cfg2)
    tr2.set_input(b)
    tr2.optimize_parameters(cfg2)
    snap2 = jax.tree_util.tree_map(np.asarray, tr2.state["g"])
    bad = dict(b)
    bad["B"] = b["B"] + np.float32("nan")
    tr2.set_input(bad)
    tr2.optimize_parameters(cfg2)
    jax.tree_util.tree_map(
        lambda a, c: np.testing.assert_array_equal(np.asarray(a), c),
        tr2.state["g"], snap2)
    # and a following healthy step still updates
    tr2.set_input(b)
    tr2.optimize_parameters(cfg2)
    changed = jax.tree_util.tree_reduce(
        lambda acc, leaf: acc or bool(np.any(leaf)),
        jax.tree_util.tree_map(
            lambda a, c: np.asarray(a) != c, tr2.state["g"], snap2),
        False)
    assert changed
    assert np.isfinite(float(tr2.get_current_losses()["G"]))


def test_skip_threshold_gates_minus_inf(rng, tmp_path, monkeypatch):
    """-inf G loss must skip too: (gl < thr) is TRUE for -inf, so the
    gate needs isfinite(gl) as well (r5 device overfit: a bf16 SSIM
    denominator hit exactly 0 -> ssim_r = -inf -> G = -inf; pre-fix the
    'skip' valve would have applied the inf gradients).  Force the loss
    to -inf by patching the trainer's ssim to +inf (loss = (1-ssim)*3)."""
    import jax
    import jax.numpy as jnp
    from cfen_vit_tpu.train import trainer as T

    monkeypatch.setattr(
        T, "ssim", lambda a, b, **kw: jnp.float32(jnp.inf))
    cfg = _tiny_cfg(tmp_path, name="tinf")
    tr = T.GanTrainer(cfg)
    tr.setup(cfg)
    b = _batch(rng)
    tr.set_input(b)
    tr.optimize_parameters(cfg)      # builds + runs the step, G = -inf
    assert float(tr.get_current_losses()["G"]) == -np.inf
    snap = jax.tree_util.tree_map(np.asarray, tr.state["g"])
    tr.set_input(b)
    tr.optimize_parameters(cfg)      # must be a no-op on params
    jax.tree_util.tree_map(
        lambda a, c: np.testing.assert_array_equal(np.asarray(a), c),
        tr.state["g"], snap)
    finite = jax.tree_util.tree_reduce(
        lambda acc, leaf: acc and bool(np.all(np.isfinite(leaf))),
        tr.state["g"], True)
    assert finite
