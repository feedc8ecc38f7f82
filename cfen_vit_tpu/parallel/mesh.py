"""Device mesh + sharding helpers — the DataParallel replacement.

The reference's only parallelism is single-process torch DataParallel
(ref networks_iid_hlgvit_crs_gd4_cfs_v3.py:77-83, SURVEY.md section 2.12).
Here: a 1-D `data` mesh (extensible to ('data','model')), params replicated,
batches sharded on the leading axis.  Gradients are reduced by XLA's
automatic collectives under jit — psum over ICI, no NCCL-style code.

Works identically on 1 real TPU chip, N chips, or the virtual 8-device CPU
mesh used in tests.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(mesh_shape: str = "", devices: Optional[Sequence] = None,
              axis_names: Optional[Sequence[str]] = None) -> Mesh:
    """mesh_shape: '' => all devices on 'data'; '4,2' => ('data','model')."""
    devices = list(devices if devices is not None else jax.devices())
    if mesh_shape:
        shape = tuple(int(s) for s in mesh_shape.split(","))
    else:
        shape = (len(devices),)
    names = tuple(axis_names or ("data", "model")[:len(shape)])
    arr = np.asarray(devices[:int(np.prod(shape))]).reshape(shape)
    return Mesh(arr, names)


def shard_batch(mesh: Mesh, tree):
    """Put a host batch onto the mesh, sharded on the leading (batch) axis."""
    def put(x):
        spec = P("data", *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map(put, tree)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params/opt state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree)


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
