"""Model wrappers: the reference's `create_model` layer (models/__init__.py:3-29).

`--model` names map to wrappers over the parametric generator:
  dec_vit  -> DECHLGVIT-equivalent (IID, 3 branches; ref model_iid_dehazing.py)
  decr_vit -> reflectance-only (ref model_iidr_dehazing.py; netG iidr_*)
  decs_vit -> shading-only (ref model_iids_dehazing.py)
  decn_vit -> no-IID (single decoder; the reference wrapper file is missing —
              a documented defect — but the network exists; we support it)
  vit      -> MGVIT-equivalent single-output trainer (ref mgvit_model.py)
  test     -> generator-only eval wrapper

Inference contract matches the reference: visuals are named
real_B / fake_A / fake_R / fake_S (+ real_* in train), S is expanded
1->3 channels for losses/display (ref model_iid_dehazing.py:147-155), and
`test()` is a no-grad jitted forward (ref base_model.py:53-55).
"""

from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from .generator import generator_forward, generator_init
from .registry import generator_spec
from ..train.checkpoint import load_net, save_net, latest_epoch

_MODEL_DEFAULT_G = {
    "dec_vit": None,                      # uses cfg.model_G
    "decr_vit": "iidr_hlgvit_crs_gd4",
    "decs_vit": "iids_hlgvit_crs_gd4",
    "decn_vit": "iidn_hlgvit_crs_gd4",
    "vit": "ipt",
    "dec_mgvit": "dec_ipt",
    "test": None,
}

# branch -> reference visual name
_VISUAL = {"d": "fake_A", "r": "fake_R", "s": "fake_S", "dh": "fake_A_refined"}


class DehazingModel:
    """Generator wrapper for inference / evaluation (training lives in
    cfen_vit_tpu.train.trainer, which composes this with discriminators)."""

    def __init__(self, cfg):
        self.cfg = cfg
        g_name = _MODEL_DEFAULT_G.get(cfg.model) or cfg.model_G
        self.spec = generator_spec(g_name, cfg)
        self.params = None
        self.image_paths = []
        self.real_B = None
        # --out_all keeps only fake_A downstream (ref test.py:47-55 computes
        # all branches then discards); returning only 'd' from the jitted
        # function lets XLA dead-code-eliminate the R/S level-1 blocks and
        # tails — measured 170 vs 109 img/s at 512x512 bf16 on v5e.
        self._d_only = bool(getattr(cfg, "out_all", False)
                            and "d" in self.spec.branches)
        # uint8 on the host<->device wire (normalize / tensor2im on device):
        # 4x less transfer than float32 — the host link dominates small-batch
        # eval latency. Disabled under chop/self_ensemble (they compose the
        # float forward).
        self._u8_io = not (getattr(cfg, "chop", False)
                           or getattr(cfg, "self_ensemble", False))
        dt = (jnp.bfloat16 if getattr(cfg, "compute_dtype", "")
              == "bfloat16" else jnp.float32)
        self._fwd = jax.jit(partial(self._forward_impl, self.spec,
                                    self._d_only, self._u8_io, dt))

    @staticmethod
    def _forward_impl(spec, d_only, u8_io, dt, params, x):
        if u8_io:   # uint8 [0,255] -> [-1,1] (ref ToTensor+Normalize)
            x = x.astype(dt) / 127.5 - 1.0
        out = generator_forward(params, spec, x)
        if d_only:
            out = {"d": out["d"]}
        if u8_io:   # tensor2im on device (ref util/util.py:12-24, truncating)
            out = {k: ((v.astype(jnp.float32) + 1.0) * 127.5)
                   .astype(jnp.uint8) for k, v in out.items()}
        return out

    # -- lifecycle ---------------------------------------------------------
    def init_params(self, seed: int = 0):
        self.params = generator_init(jax.random.PRNGKey(seed), self.spec)
        return self.params

    def setup(self, cfg=None):
        cfg = cfg or self.cfg
        epoch = cfg.which_epoch
        if epoch == "latest" and latest_epoch(cfg) and not _exists(cfg,
                                                                   "latest"):
            epoch = latest_epoch(cfg)
        params = load_net(cfg, epoch, "G", self.spec)
        if getattr(cfg, "compute_dtype", "float32") == "bfloat16":
            params = jax.tree_util.tree_map(
                lambda a: a.astype(jnp.bfloat16)
                if hasattr(a, "dtype") and a.dtype == np.float32 else a,
                params)
        self.params = jax.device_put(params)

    def save(self, epoch):
        return save_net(self.cfg, epoch, "G", self.params)

    # -- inference ---------------------------------------------------------
    def set_input(self, batch: Dict):
        dt = (jnp.bfloat16 if getattr(self.cfg, "compute_dtype", "")
              == "bfloat16" else jnp.float32)
        if self._u8_io:
            b = batch["B"]
            # rint recovers the original pixels exactly from the loader's
            # v/255*2-1 floats (a truncating cast would be off by one)
            u8 = (b if b.dtype == np.uint8 else
                  np.rint((b + 1.0) * 127.5).astype(np.uint8))
            self.real_B = jnp.asarray(u8)
        else:
            self.real_B = jnp.asarray(batch["B"], dt)
        self.image_paths = batch["B_paths"]

    def test(self, cfg=None) -> Dict[str, np.ndarray]:
        cfg = cfg or self.cfg
        fwd = self._fwd
        branches = ["d"] if self._d_only else list(self.spec.branches)

        if getattr(cfg, "self_ensemble", False):
            # x8 dihedral ensemble (reference --self_ensemble surface,
            # vit_model.py:54; dihedral math in inference_utils)
            from .inference_utils import self_ensemble_x8
            base = fwd

            def fwd(p, x, _base=base):
                return {k: self_ensemble_x8(
                    lambda v, kk=k: _base(p, v)[kk], x) for k in branches}

        if getattr(cfg, "chop", False):
            # overlap-tiled eval for inputs larger than the compiled
            # geometry (the reference's forward_chop capability)
            from .inference_utils import chop_forward
            tile = cfg.input_size()
            base = fwd

            def fwd(p, x, _base=base, _tile=tile):
                if x.shape[1] == _tile and x.shape[2] == _tile:
                    return _base(p, x)
                return {k: chop_forward(
                    lambda v, kk=k: _base(p, v)[kk], x, _tile,
                    cfg.chop_overlap) for k in branches}

        out = fwd(self.params, self.real_B)
        # uint8-wire path keeps uint8 end to end (tensor2im passes it
        # through); float path casts bf16 -> f32 for the host tools.
        def host(a):
            a = np.asarray(a)
            return a if a.dtype == np.uint8 else a.astype(np.float32)
        # --out_all discards every non-fake_A visual including real_B
        # (ref test.py:47-55 deletes them post-hoc); the d-only program
        # skips materializing it — downloading the input again was ~30%
        # of the steady per-batch time over this relay (r5 e2e diagnosis)
        self.visuals = {} if self._d_only else {"real_B": host(self.real_B)}
        for b, arr in out.items():
            name = _VISUAL[b]
            if b == "dh" and "d" not in self.spec.branches:
                # dec_ipt: the refined xdh IS the dehazed output
                # (ref dec_mgvit_model.py:90 unpacks it as fake_A)
                name = "fake_A"
            self.visuals[name] = host(arr)
        return self.visuals

    def get_current_visuals(self) -> Dict[str, np.ndarray]:
        return dict(self.visuals)

    def get_image_paths(self):
        return self.image_paths


def _exists(cfg, epoch):
    import os
    d = os.path.join(cfg.checkpoints_dir, cfg.name)
    return (os.path.exists(os.path.join(d, f"{epoch}_net_G.msgpack"))
            or os.path.exists(os.path.join(d, f"{epoch}_net_G.pth")))


def create_model(cfg):
    """Reference-parity factory (models/__init__.py:3-29)."""
    if cfg.model in ("dec_vit", "decr_vit", "decs_vit", "decn_vit", "test",
                     "vit", "dec_mgvit"):
        if cfg.isTrain:
            from ..train.trainer import GanTrainer
            return GanTrainer(cfg)
        return DehazingModel(cfg)
    raise NotImplementedError(f"model [{cfg.model}] not implemented.")
