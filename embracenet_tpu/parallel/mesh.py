"""Device mesh and sharding layout.

The reference has no distribution story (SURVEY.md §2/§5.8); the TPU-native
scale axes here are:

  * ``trial`` — hyperparameter-population parallelism: the vmapped trial axis
    of params/opt-state/hyperparams is sharded across devices; trials never
    communicate, so this axis scales embarrassingly over ICI.
  * ``data``  — batch parallelism inside each trial: batch-plan columns are
    sharded, so per-batch matmuls/convs split over devices and the
    batch-statistics reductions (INS loss weights, BatchNorm moments, metric
    counts — all ``jnp.sum`` over the batch axis) become XLA all-reduces over
    ICI automatically.

Models here are < 12 M params, so TP/PP/EP are counterproductive (SURVEY.md
§5.8); the mesh abstraction still leaves DCN-level axes addable later.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_trial: int | None = None, n_data: int | None = None,
              devices=None) -> Mesh:
    """Build a ('trial', 'data') mesh.  Defaults: all devices on 'trial'."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n_trial is None and n_data is None:
        n_trial, n_data = n, 1
    elif n_trial is None:
        n_trial = n // n_data
    elif n_data is None:
        n_data = n // n_trial
    if n_trial * n_data != n:
        raise ValueError(f"mesh {n_trial}x{n_data} != {n} devices")
    arr = np.asarray(devices).reshape(n_trial, n_data)
    return Mesh(arr, ("trial", "data"))


def trial_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (trial) axis sharded, remaining dims replicated."""
    return NamedSharding(mesh, P("trial"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-plan layout [n_batches, batch_width]: width over 'data'."""
    return NamedSharding(mesh, P(None, "data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_population(mesh: Mesh, *trees):
    """device_put each pytree with its leading axis over 'trial'."""
    s = trial_sharding(mesh)
    return tuple(jax.device_put(t, s) for t in trees)
