"""Device mesh helpers.

The reference scales with torch DDP over NCCL (dator/train.py:64-66,
dist_train.sh) plus a manual 2-GPU model split of FourDNet's towers
(make_model.py:460-463). The TPU-native equivalent is one 2-D
`jax.sharding.Mesh`:

* axis "data"  — batch-sharded data parallelism (the DDP replacement);
* axis "model" — the FourDNet tower axis (the two ViT towers are stacked on
  a leading axis of size 2 and sharded here, reproducing the reference's
  model parallelism without a single explicit transfer).

Collectives ride ICI within a slice; the sampler's shared-seed gloo broadcast
(datasets/sampler_ddp.py:12-35) becomes deterministic key folding — every
host derives the same permutation from fold_in(key, epoch), no communication.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int | None = None, n_model: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n_total = len(devices)
    if n_data is None:
        n_data = n_total // n_model
    assert n_data * n_model <= n_total, (n_data, n_model, n_total)
    grid = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, axis_names=("data", "model"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch axis sharded over "data", everything else replicated."""
    return NamedSharding(mesh, P("data"))


def tower_sharding(mesh: Mesh) -> NamedSharding:
    """Leading tower axis (the two FourDNet towers) sharded over "model"."""
    return NamedSharding(mesh, P("model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host batch with the batch axis sharded over "data"."""
    sh = data_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)
