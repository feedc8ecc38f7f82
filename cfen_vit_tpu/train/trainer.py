"""Conditional-GAN trainer (the reference's DECHLGVIT, model_iid_dehazing.py).

One jit-compiled `train_step` per batch contains, in reference order
(ref :272-287):
  1. generator forward + 7-term G loss (ref :190-270) + Adam update;
  2. ImagePool advance with the PRE-update fakes — NOTE the reference's
     backward_D queries the pool but then builds fake_*_cat from the
     CURRENT self.fake_* (ref :173-187: the query result is assigned to a
     discarded local), so D trains on un-pooled fakes while the pool still
     mutates; we reproduce that exactly (advisor r1 finding);
  3. LS-GAN D loss (0.5*(real+fake), ref :160-171) on the current fakes +
     joint Adam update over D_A/D_R/D_S (one optimizer chain, ref :121).

G loss terms and weights (ref :190-270):
  GAN (conditional, cat(hazy, img)) x0.0618/branch; VGG x2*lambda_vgg/branch;
  gradient MSE x2/branch; L1 ("L2") x2/branch; (1-SSIM) x3/branch;
  IDMRF x0.06 (dehazed only); semantic consistency x2 (dehazed only).
  S is expanded 1->3 channels first (ref :147-155).

TPU-first deltas: the ImagePool is a device-side ring buffer updated inside
the jit with jax PRNG (equivalent sampling semantics to util/image_pool.py:
5-32 — per-image: fill while below capacity, else p=0.5 swap-with-random-
slot); Adam moments + LR are part of the checkpointable state; the whole
step is one XLA program, data-parallel over the mesh with psum-reduced
grads inserted by the compiler.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..losses.gan import gan_loss
from ..losses.vgg import (vgg19_init, vgg_perceptual_loss,
                          semantic_consistency_loss, idmrf_loss)
from ..models.discriminator import define_d, apply_d
from ..models.generator import generator_forward, generator_init
from ..models.registry import generator_spec
from ..ops.gradient import color_gradient
from ..ops.ssim import ssim
from ..parallel.mesh import make_mesh, shard_batch, replicate
from .checkpoint import save_net, save_train_state, load_train_state
from .schedule import lr_for_epoch

def _u8_wire(v: np.ndarray) -> np.ndarray:
    """float [-1,1] -> uint8 iff exactly recoverable (see set_input)."""
    if v.dtype != np.float32 or v.ndim != 4:
        return v
    u8 = np.rint((v + 1.0) * 127.5)
    if u8.min() < 0 or u8.max() > 255:
        return v
    u8 = u8.astype(np.uint8)
    if np.array_equal(u8.astype(np.float32) / 127.5 - 1.0, v):
        return u8
    return v


def _denorm_batch(batch: Dict, dt):
    """uint8-wire arrays -> [-1,1] floats on device (inside the jit)."""
    out = {}
    for k, v in batch.items():
        if hasattr(v, "dtype") and v.dtype == jnp.uint8:
            out[k] = v.astype(dt or jnp.float32) / 127.5 - 1.0
        else:
            out[k] = v
    return out


_MODEL_DEFAULT_G = {
    "decr_vit": "iidr_hlgvit_crs_gd4",
    "decs_vit": "iids_hlgvit_crs_gd4",
    "decn_vit": "iidn_hlgvit_crs_gd4",
    "vit": "ipt",
    "dec_mgvit": "dec_ipt",
}


# --------------------------------------------------------------------------
# device-side ImagePool
# --------------------------------------------------------------------------

def pool_init(pool_size: int, shape, dtype=jnp.float32) -> Dict:
    """Ring buffer with ONE extra scratch slot (index pool_size): the
    per-image update always writes exactly one slot, and the no-op case
    targets the scratch row, so the scan body is O(image) — the original
    two-variant + where(...) form materialized three full copies of the
    50x512x512x3 buffer per image (~19 ms/pool/step at b8, r3b train
    profile).  dtype: pass the compute dtype — fakes arrive bf16 under
    bf16 runs, so a bf16 pool stores them losslessly at half the HBM
    traffic (the reference pool holds whatever D consumes,
    util/image_pool.py:12-31)."""
    if pool_size == 0:
        return {"buf": jnp.zeros((0,) + tuple(shape), dtype),
                "n": jnp.zeros((), jnp.int32)}
    return {"buf": jnp.zeros((pool_size + 1,) + tuple(shape), dtype),
            "n": jnp.zeros((), jnp.int32)}


def pool_query(pool: Dict, images, rng):
    """Sequential per-image semantics of util/image_pool.py:12-31.

    pool["buf"] has size+1 rows; the last row is write-only scratch and
    never sampled (rid ranges over [0, size))."""
    size = pool["buf"].shape[0] - 1
    if size <= 0:
        return pool, images
    images = images.astype(pool["buf"].dtype)

    def body(carry, inp):
        buf, n, key = carry
        img, = inp
        key, k1, k2 = jax.random.split(key, 3)
        below = n < size
        p = jax.random.uniform(k1)
        rid = jax.random.randint(k2, (), 0, size)
        old = jax.lax.dynamic_index_in_dim(buf, rid, 0, keepdims=False)
        swap = p > 0.5
        # fill slot n while filling; swap slot rid; else the scratch row
        idx = jnp.where(below, jnp.minimum(n, size - 1),
                        jnp.where(swap, rid, size))
        new_buf = jax.lax.dynamic_update_index_in_dim(buf, img, idx, 0)
        out = jnp.where(below, img, jnp.where(swap, old, img))
        new_n = jnp.where(below, n + 1, n)
        return (new_buf, new_n, key), out

    (buf, n, _), outs = jax.lax.scan(
        body, (pool["buf"], pool["n"], rng), (images,))
    return {"buf": buf, "n": n}, outs


# --------------------------------------------------------------------------
# trainer
# --------------------------------------------------------------------------

class GanTrainer:
    """Reference-wrapper-shaped trainer: set_input / optimize_parameters /
    get_current_losses / get_current_visuals / save_networks /
    update_learning_rate."""

    def __init__(self, cfg):
        self.cfg = cfg
        g_name = _MODEL_DEFAULT_G.get(cfg.model) or cfg.model_G
        self.spec = generator_spec(g_name, cfg)
        # MGVIT (--model vit, ref mgvit_model.py:90-123) trains the single-
        # output ipt generator with GAN+VGG+gradient+L1 only, one D.
        self.mgvit = cfg.model == "vit"
        # DECMGVIT (ref dec_mgvit_model.py — no factory entry there, its
        # imports crash; capability provided here): dec_ipt's refined xdh
        # plays fake_A (ref :90), loss set GAN+VGG+gradient(x1)+L1 per
        # branch, no SSIM/IDMRF/semantic (ref :141-182)
        self.decmgvit = cfg.model == "dec_mgvit"
        self.branches = {}
        if "d" in self.spec.branches:
            self.branches["d"] = "A"
        elif self.spec.xdh:
            self.branches["dh"] = "A"
        if "r" in self.spec.branches:
            self.branches["r"] = "R"
        if "s" in self.spec.branches:
            self.branches["s"] = "S"
        if cfg.mesh_shape:
            self.mesh = make_mesh(cfg.mesh_shape)
        else:
            # data axis must divide the global batch; use the largest
            # divisor of batchSize that fits the device count
            nd = len(jax.devices())
            d = max(k for k in range(1, nd + 1) if cfg.batchSize % k == 0)
            self.mesh = make_mesh(str(d))
        self.use_lsgan = not cfg.no_lsgan
        self.adam = optax.scale_by_adam(b1=cfg.beta1, b2=0.999, eps=1e-8)
        self.state = None
        self.epoch = cfg.epoch_count
        self.lr = lr_for_epoch(cfg, 0)
        self._step_fn = None
        self._losses: Dict[str, float] = {}
        self._visuals: Dict[str, np.ndarray] = {}
        self.image_paths = []
        self._batch = None

    # -- state setup --------------------------------------------------------
    def init_state(self, batch: Dict, seed: int = 0):
        cfg = self.cfg
        key = jax.random.PRNGKey(seed)
        kg, kd, kp = jax.random.split(key, 3)
        g = generator_init(kg, self.spec)
        # data-dependent ActNorm init from the first batch (ref
        # models/actnorm.py:25-37 initializes on first forward)
        x = jnp.asarray(batch["B"])
        if x.dtype == jnp.uint8:     # u8 wire (see set_input)
            x = x.astype(jnp.float32) / 127.5 - 1.0
        _, g = jax.jit(lambda p, xx: generator_forward(
            p, self.spec, xx, actnorm_init=True))(g, x)
        d = {name: define_d(jax.random.fold_in(kd, i), cfg)
             for i, name in enumerate(self.branches.values())}
        img_shape = tuple(x.shape[1:])
        pdt = (jnp.bfloat16 if cfg.compute_dtype == "bfloat16"
               else jnp.float32)
        pools = {name: pool_init(cfg.pool_size, img_shape, dtype=pdt)
                 for name in self.branches.values()}
        state = {
            "g": g, "d": d,
            "g_opt": self.adam.init(g), "d_opt": self.adam.init(d),
            "pools": pools, "rng": kp,
            "step": jnp.zeros((), jnp.int32),
        }
        self.state = replicate(self.mesh, state)
        self.vgg = replicate(self.mesh, vgg19_init(
            npz_path=getattr(cfg, "vgg19_npz", "") or None))
        return self.state

    def setup(self, cfg=None):
        cfg = cfg or self.cfg
        self._resume = None
        if cfg.continue_train:
            # pools are intentionally not checkpointed (the reference never
            # persists its ImagePool either); they refill within 50 steps.
            self._resume = load_train_state(cfg, cfg.which_epoch)

    # -- loss functions ------------------------------------------------------
    def _expand_s(self, s):
        return jnp.tile(s, (1, 1, 1, 3)) if s.shape[-1] == 1 else s

    def _vgg_losses(self, vgg, fakes, reals):
        """Per-branch epdn VGGLoss values, {name: loss}.

        CFEN_VGG_BATCHED=1 stacks the branches into ONE tower pass per
        side (fakes with grad, reals stop-grad) — identical math (the
        per-branch means are taken on batch slices of the same convs),
        3x fewer conv ops for the A/R/S loss set.  Default off pending
        the device A/B (VERDICT r4 #5)."""
        import os as _os
        names = list(fakes)
        if (_os.environ.get("CFEN_VGG_BATCHED", "0") != "1"
                or len(names) < 2):
            return {n: vgg_perceptual_loss(vgg, fakes[n], reals[n])
                    for n in names}
        from ..losses.vgg import vgg19_features
        taps = ("relu1_1", "relu2_1", "relu3_1", "relu4_1", "relu5_1")
        wts = (1 / 32, 1 / 16, 1 / 8, 1 / 4, 1.0)
        fx = vgg19_features(
            vgg, jnp.concatenate([fakes[n] for n in names], 0), taps)
        fy = jax.tree_util.tree_map(
            jax.lax.stop_gradient,
            vgg19_features(
                vgg, jnp.concatenate([reals[n] for n in names], 0), taps))
        nb = fakes[names[0]].shape[0]
        out = {n: 0.0 for n in names}
        for w, t in zip(wts, taps):
            diff = jnp.abs(fx[t] - fy[t])
            for i, n in enumerate(names):
                out[n] = out[n] + w * jnp.mean(diff[i * nb:(i + 1) * nb])
        return out

    def _g_loss(self, g, d, vgg, batch):
        cfg = self.cfg
        cdt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None
        if cdt is not None:
            # mixed precision: params/activations in bf16 for the loss,
            # master params + Adam moments stay fp32 (grads come out fp32)
            cast = lambda t: jax.tree_util.tree_map(
                lambda a: a.astype(cdt)
                if hasattr(a, "dtype") and a.dtype == jnp.float32 else a, t)
            g, d, vgg = cast(g), cast(d), cast(vgg)
            batch = {k: (v.astype(cdt) if hasattr(v, "astype") else v)
                     for k, v in batch.items()}
        out = generator_forward(
            g, self.spec, batch["B"],
            remat=(getattr(cfg, "remat_mode", "level") or "level")
            if cfg.remat else "none")
        fakes, reals = {}, {}
        # dec_ipt has no raw 'd' decoder; its SpatialPyramid-refined xdh is
        # the dehazed output (ref dec_mgvit_model.py:90)
        fakes["A"] = out["d"] if "d" in out else out["dh"]
        reals["A"] = batch["A"]
        if "r" in out:
            fakes["R"], reals["R"] = out["r"], batch["R"]
        if "s" in out:
            fakes["S"] = self._expand_s(out["s"])
            reals["S"] = self._expand_s(batch["S"])
        losses = {}
        hazy = batch["B"]
        if self.mgvit:
            # ref mgvit_model.py:90-123: GAN*0.0618 + VGG*2l + grad*0.2 + L1*3
            fake, real = fakes["A"], reals["A"]
            pred = apply_d(cfg, d["A"], jnp.concatenate([hazy, fake], -1))
            losses["GAN"] = gan_loss(pred, True, self.use_lsgan) * 0.0618
            losses["vgg"] = (vgg_perceptual_loss(vgg, fake, real)
                             * cfg.lambda_vgg * 2)
            losses["gradient_fake_A"] = 0.2 * jnp.mean(jnp.square(
                color_gradient(real) - color_gradient(fake)))
            losses["L1"] = jnp.mean(jnp.abs(real - fake)) * 3
            total = sum(losses.values())
            losses["G"] = total
            return total, (losses, fakes, reals)
        if self.decmgvit:
            # DECMGVIT loss set (ref dec_mgvit_model.py:141-182): per branch
            # GAN*0.0618 + VGG*2*lambda_vgg + gradient MSE*1 + L1*2; no
            # SSIM/IDMRF/semantic terms
            vggl = self._vgg_losses(vgg, fakes, reals)
            for name, fake in fakes.items():
                real = reals[name]
                lk = name.lower()
                pred = apply_d(cfg, d[name],
                               jnp.concatenate([hazy, fake], -1))
                losses[f"GAN_{lk}"] = gan_loss(pred, True,
                                               self.use_lsgan) * 0.0618
                losses[f"vgg_{lk}"] = vggl[name] * cfg.lambda_vgg * 2
                losses[f"gradient_fake_{lk}"] = jnp.mean(jnp.square(
                    color_gradient(real) - color_gradient(fake)))
                losses[f"L2_{lk}"] = jnp.mean(jnp.abs(real - fake)) * 2
            losses = {k: v.astype(jnp.float32) for k, v in losses.items()}
            total = sum(losses.values())
            losses["G"] = total
            return total, (losses, fakes, reals)
        vggl = self._vgg_losses(vgg, fakes, reals)
        for name, fake in fakes.items():
            real = reals[name]
            lk = name.lower()
            pred = apply_d(cfg, d[name], jnp.concatenate([hazy, fake], -1))
            losses[f"GAN_{lk}"] = gan_loss(pred, True, self.use_lsgan) * 0.0618
            losses[f"vgg_{lk}"] = vggl[name] * cfg.lambda_vgg * 2
            losses[f"gradient_fake_{lk}"] = jnp.mean(jnp.square(
                color_gradient(real) - color_gradient(fake))) * 2
            losses[f"L2_{lk}"] = jnp.mean(jnp.abs(real - fake)) * 2
            losses[f"ssim_{lk}"] = (1.0 - ssim(real, fake)) * 3
        # NOTE arg order: the reference passes (real, fake) — criterionPer/
        # criterionSty(self.real_A, self.fake_A) (ref :249-253) — and ID-MRF
        # is asymmetric (the 2nd arg supplies mean-shift, patch bank and the
        # min axis), so the order is observable semantics (advisor r1).
        losses["p"] = idmrf_loss(vgg, reals["A"], fakes["A"]) * 0.06
        losses["s"] = semantic_consistency_loss(
            vgg, reals["A"], fakes["A"]) * 2
        losses = {k: v.astype(jnp.float32) for k, v in losses.items()}
        total = sum(losses.values())
        losses["G"] = total
        return total, (losses, fakes, reals)

    def _d_loss(self, d, batch, fakes, reals):
        """D trains on the CURRENT fakes (ref :173-187 discards the pool
        query result when building fake_*_cat); the pool still advances in
        grads_and_pools for exact ImagePool state parity."""
        cfg = self.cfg
        hazy = batch["B"]
        losses = {}
        total = 0.0
        for name, fake in fakes.items():
            real_cat = jnp.concatenate([hazy, reals[name]], -1)
            fake_cat = jnp.concatenate([hazy,
                                        jax.lax.stop_gradient(fake)], -1)
            l_real = gan_loss(apply_d(cfg, d[name], real_cat), True,
                              self.use_lsgan)
            l_fake = gan_loss(apply_d(cfg, d[name], fake_cat), False,
                              self.use_lsgan)
            losses[f"D{name}"] = (l_real + l_fake) * 0.5
            total = total + losses[f"D{name}"]
        return total, losses

    # -- the jitted step -----------------------------------------------------
    def _make_step(self):
        adam = self.adam

        skip_thr = float(self.cfg.skip_threshold)
        accum = max(1, int(getattr(self.cfg, "grad_accum", 1)))

        def grads_and_pools(state, batch, vgg):
            """G grads + pool updates + pooled fakes + D grads, either in one
            shot or accumulated over micro-batches (lax.scan keeps a single
            micro-batch of activations live -> effective batches beyond the
            one-shot HBM limit).  Mean losses are exactly equivalent to the
            one-shot step; the sum-normalized ID-MRF term is scaled by
            1/accum (documented)."""
            if accum == 1:
                rng, rng_pool = jax.random.split(state["rng"])
                (gl, (losses, fakes, reals)), grads = jax.value_and_grad(
                    self._g_loss, has_aux=True)(
                    state["g"], state["d"], vgg, batch)
                pools = {}
                for i, name in enumerate(fakes):
                    # advance the pool; the query RESULT is discarded, as in
                    # the reference's backward_D (ref :173-187)
                    pools[name], _ = pool_query(
                        state["pools"][name], fakes[name],
                        jax.random.fold_in(rng_pool, i))
                (dl, d_losses), d_grads = jax.value_and_grad(
                    self._d_loss, has_aux=True)(
                    state["d"], batch, fakes, reals)
                return (gl, grads, d_grads, losses, d_losses, fakes, pools,
                        rng)

            b = batch["B"].shape[0]
            mb = b // accum
            micro_in = {k: v.reshape((accum, mb) + v.shape[1:])
                        for k, v in batch.items()}

            def body(carry, mbatch):
                gsum, dsum, pools, rng = carry
                rng, rp = jax.random.split(rng)
                (gl, (losses, fakes, reals)), ggr = jax.value_and_grad(
                    self._g_loss, has_aux=True)(
                    state["g"], state["d"], vgg, mbatch)
                new_pools = {}
                for i, name in enumerate(fakes):
                    new_pools[name], _ = pool_query(
                        pools[name], fakes[name], jax.random.fold_in(rp, i))
                (dl, d_losses), dgr = jax.value_and_grad(
                    self._d_loss, has_aux=True)(
                    state["d"], mbatch, fakes, reals)
                gsum = jax.tree_util.tree_map(jnp.add, gsum, ggr)
                dsum = jax.tree_util.tree_map(jnp.add, dsum, dgr)
                return (gsum, dsum, new_pools, rng), (gl, losses, d_losses,
                                                      fakes)

            zeros_like = lambda t: jax.tree_util.tree_map(
                lambda a: jnp.zeros(a.shape, jnp.float32), t)
            carry0 = (zeros_like(state["g"]), zeros_like(state["d"]),
                      state["pools"], state["rng"])
            (gsum, dsum, pools, rng), (gls, losses, d_losses, fakes) = (
                jax.lax.scan(body, carry0, micro_in))
            inv = 1.0 / accum
            grads = jax.tree_util.tree_map(lambda a: a * inv, gsum)
            d_grads = jax.tree_util.tree_map(lambda a: a * inv, dsum)
            losses = jax.tree_util.tree_map(lambda a: jnp.mean(a), losses)
            d_losses = jax.tree_util.tree_map(lambda a: jnp.mean(a),
                                              d_losses)
            last_fakes = jax.tree_util.tree_map(lambda a: a[-1], fakes)
            return (jnp.mean(gls), grads, d_grads, losses, d_losses,
                    last_fakes, pools, rng)

        def step(state, batch, vgg, lr):
            batch = _denorm_batch(batch, jnp.float32)
            (gl, grads, d_grads, losses, d_losses, fakes, pools,
             rng) = grads_and_pools(state, batch, vgg)
            # honor --skip_threshold (declared-but-dead in the reference,
            # base_options.py:164-165): a diverged batch applies NEITHER
            # the G nor the D update.  Gate by SELECT, not multiply —
            # 0 * NaN = NaN, so the r5 device overfit run poisoned params,
            # Adam moments AND the image pools straight through the old
            # multiplicative skip.  (gl < thr) is False for NaN but TRUE
            # for -inf (the r5 ssim_r = -inf blow-up would have sailed
            # through), so gate on isfinite explicitly; moments and pools
            # keep their previous values on a skipped step.
            ok = jnp.isfinite(gl) & (gl < skip_thr)

            def gate(new, old):
                return jax.tree_util.tree_map(
                    lambda a, b: jnp.where(ok, a, b), new, old)

            up, g_opt = adam.update(grads, state["g_opt"], state["g"])
            up = jax.tree_util.tree_map(
                lambda u: jnp.where(ok, -lr * u, jnp.zeros_like(u)), up)
            g = optax.apply_updates(state["g"], up)
            g_opt = gate(g_opt, state["g_opt"])

            dup, d_opt = adam.update(d_grads, state["d_opt"], state["d"])
            dup = jax.tree_util.tree_map(
                lambda u: jnp.where(ok, -lr * u, jnp.zeros_like(u)), dup)
            d = optax.apply_updates(state["d"], dup)
            d_opt = gate(d_opt, state["d_opt"])
            pools = gate(pools, state["pools"])

            losses = dict(losses)
            losses.update(d_losses)
            new_state = {"g": g, "d": d, "g_opt": g_opt, "d_opt": d_opt,
                         "pools": pools, "rng": rng,
                         "step": state["step"] + 1}
            return new_state, losses, fakes

        return jax.jit(step, donate_argnums=(0,))

    # -- reference-wrapper API ------------------------------------------------
    def set_input(self, batch: Dict):
        arrays = {k: v for k, v in batch.items()
                  if isinstance(v, np.ndarray)}
        # uint8 wire when lossless: loader floats are u8/127.5-1, so the
        # original bytes are recoverable exactly and the normalize moves
        # on-device — 4x less host->device traffic.  On this dev box the
        # TPU relay (24-37 MB/s) made the f32 upload ~300 ms of a 900 ms
        # b4 train step (r3 train profile).  Non-u8-representable floats
        # (synthetic data) keep the float wire untouched.
        arrays = {k: _u8_wire(v) for k, v in arrays.items()}
        self._batch = shard_batch(self.mesh, arrays)
        self.image_paths = batch.get("B_paths", [])

    def optimize_parameters(self, cfg=None):
        if self.state is None:
            self.init_state({k: np.asarray(v) for k, v in
                             self._batch.items()})
            if getattr(self, "_resume", None):
                from flax import serialization as _ser
                keys = ("g", "d", "g_opt", "d_opt", "rng", "step")
                template = {k: self.state[k] for k in keys}
                restored = _ser.from_state_dict(template, self._resume)
                merged = dict(self.state)
                merged.update(replicate(self.mesh, restored))
                self.state = merged
                self._resume = None
        if self._step_fn is None:
            self._step_fn = self._make_step()
        self.state, losses, fakes = self._step_fn(
            self.state, self._batch, self.vgg,
            jnp.asarray(self.lr, jnp.float32))
        self._losses = losses
        self._fakes = fakes

    def get_current_losses(self) -> Dict[str, float]:
        return {k: float(v) for k, v in self._losses.items()}

    def get_current_visuals(self) -> Dict[str, np.ndarray]:
        vis = {"real_B": np.asarray(self._batch["B"])}
        names = {"A": "fake_A", "R": "fake_R", "S": "fake_S"}
        for k, fake in self._fakes.items():
            vis[names[k]] = np.asarray(fake)
            rk = {"A": "A", "R": "R", "S": "S"}[k]
            if rk in self._batch:
                vis[f"real_{k}"] = np.asarray(self._batch[rk])
        return vis

    def get_image_paths(self):
        return self.image_paths

    def save_networks(self, epoch):
        save_net(self.cfg, epoch, "G", self.state["g"])
        for name, dp in self.state["d"].items():
            save_net(self.cfg, epoch, f"D_{name}", dp)
        save_train_state(self.cfg, str(epoch), {
            k: self.state[k] for k in
            ("g", "d", "g_opt", "d_opt", "rng", "step")})

    def update_learning_rate(self):
        self.epoch += 1
        old = self.lr
        self.lr = lr_for_epoch(self.cfg, self.epoch - self.cfg.epoch_count)
        print(f"learning rate = {self.lr:.7f} (was {old:.7f})")
