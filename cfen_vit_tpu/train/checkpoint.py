"""Checkpoint save/load.

Native format: msgpack param trees named `<epoch>_net_<name>.msgpack` in
`checkpoints/<cfg.name>/` — same naming scheme as the reference's
`<epoch>_net_<name>.pth` (ref base_model.py:89-101) so `--which_epoch N`
and `latest` work identically.  Loading falls back to importing a reference
`.pth` in the same slot, validating released-checkpoint compatibility.

Unlike the reference (which drops optimizer state on resume — SURVEY.md
section 5.4), `save_train_state` also checkpoints optimizer state + step,
making resume exact.
"""

from __future__ import annotations

import os
import re
from typing import Optional

import numpy as np

try:
    from flax import serialization
except ImportError:  # pragma: no cover
    serialization = None


def _path(cfg, epoch, net_name, ext="msgpack"):
    return os.path.join(cfg.checkpoints_dir, cfg.name,
                        f"{epoch}_net_{net_name}.{ext}")


def save_net(cfg, epoch, net_name: str, params) -> str:
    path = _path(cfg, epoch, net_name)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    params = _to_numpy(params)
    with open(path, "wb") as fh:
        fh.write(serialization.msgpack_serialize(params))
    return path


def load_net(cfg, epoch, net_name: str, spec=None):
    """Load native msgpack, or import a reference .pth if present."""
    mp = _path(cfg, epoch, net_name)
    if os.path.exists(mp):
        with open(mp, "rb") as fh:
            return serialization.msgpack_restore(fh.read())
    pth = _path(cfg, epoch, net_name, ext="pth")
    if os.path.exists(pth):
        import torch
        from ..interop.torch_import import import_generator_state_dict
        sd = torch.load(pth, map_location="cpu")
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        if spec is None:
            raise ValueError(".pth import requires the generator spec")
        return import_generator_state_dict(sd, spec)
    raise FileNotFoundError(
        f"no checkpoint for epoch '{epoch}' net '{net_name}' under "
        f"{os.path.dirname(mp)} (looked for .msgpack and .pth)")


def latest_epoch(cfg, net_name: str = "G") -> Optional[str]:
    d = os.path.join(cfg.checkpoints_dir, cfg.name)
    if not os.path.isdir(d):
        return None
    eps = []
    for f in os.listdir(d):
        m = re.match(rf"(\w+)_net_{net_name}\.(msgpack|pth)$", f)
        if m and m.group(1).isdigit():
            eps.append(int(m.group(1)))
    return str(max(eps)) if eps else None


def _to_numpy(tree):
    if isinstance(tree, dict):
        return {k: _to_numpy(v) for k, v in tree.items()}
    if isinstance(tree, list):
        return [_to_numpy(v) for v in tree]
    return np.asarray(tree)


def save_train_state(cfg, tag: str, state_tree) -> str:
    """Serializes via flax to_state_dict so optax namedtuple states become
    plain dicts; restore with `from_state_dict` against a freshly
    initialized state template."""
    path = os.path.join(cfg.checkpoints_dir, cfg.name,
                        f"{tag}_train_state.msgpack")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    sd = serialization.to_state_dict(state_tree)
    with open(path, "wb") as fh:
        fh.write(serialization.msgpack_serialize(_to_numpy(sd)))
    return path


def load_train_state(cfg, tag: str):
    path = os.path.join(cfg.checkpoints_dir, cfg.name,
                        f"{tag}_train_state.msgpack")
    with open(path, "rb") as fh:
        return serialization.msgpack_restore(fh.read())
