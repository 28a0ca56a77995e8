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


def init_distributed(coordinator_address: str, num_processes: int,
                     process_id: int):
    """Join a multi-host runtime (call BEFORE any other backend use).

    On TPU pods `jax.distributed.initialize()` discovers everything from the
    environment; this explicit form also serves multi-process CPU testing.
    Afterwards ``jax.devices()`` spans all hosts and ``make_mesh`` can carve
    a 'dcn' axis across them.
    """
    import jax

    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def make_mesh(n_trial: int | None = None, n_data: int | None = None,
              devices=None, n_dcn: int | None = None) -> Mesh:
    """Build a ('trial', 'data') — or ('dcn', 'trial', 'data') — mesh.

    Defaults: all devices on 'trial'.  ``n_dcn`` > 1 adds a leading
    cross-host axis: trials are embarrassingly parallel, so the population
    shards over ('dcn', 'trial') and NO collective ever crosses the DCN
    (data-parallel reductions stay on the per-host ICI 'data' axis).
    Device order from ``jax.devices()`` is grouped by process, so the
    reshape puts each host's devices in one dcn slice.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n_dcn is not None and n_dcn > 1:
        per = n // n_dcn
        if n_dcn * per != n:
            raise ValueError(f"{n} devices not divisible by n_dcn={n_dcn}")
        if n_trial is None and n_data is None:
            n_trial, n_data = per, 1
        elif n_trial is None:
            n_trial = per // n_data
        elif n_data is None:
            n_data = per // n_trial
        if n_trial * n_data != per:
            raise ValueError(
                f"mesh dcn={n_dcn} x {n_trial}x{n_data} != {n} devices")
        arr = np.asarray(devices).reshape(n_dcn, n_trial, n_data)
        return Mesh(arr, ("dcn", "trial", "data"))
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


def trial_axes(mesh: Mesh):
    """The axes the population shards over (('dcn','trial') on multi-host)."""
    return ("dcn", "trial") if "dcn" in mesh.axis_names else ("trial",)


def trial_device_count(mesh: Mesh) -> int:
    return int(np.prod([mesh.shape[a] for a in trial_axes(mesh)]))


def trial_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (trial) axis sharded, remaining dims replicated."""
    axes = trial_axes(mesh)
    return NamedSharding(mesh, P(axes if len(axes) > 1 else axes[0]))


def global_from_host_local(tree, mesh: Mesh, spec: P):
    """device_put that also works when the mesh spans processes.

    Single-process: plain ``jax.device_put``.  Multi-process: each host
    passes its host-local piece (for specs touching 'dcn', the caller's
    slice of the global array; otherwise the full replicated array) and the
    result is a global jax.Array over the whole mesh.
    """
    sharding = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.device_put(tree, sharding)
    from jax.experimental import multihost_utils

    return jax.tree.map(
        lambda a: multihost_utils.host_local_array_to_global_array(
            np.asarray(a), mesh, spec), tree)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-plan layout [n_batches, batch_width]: width over 'data'."""
    return NamedSharding(mesh, P(None, "data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_population(mesh: Mesh, *trees):
    """device_put each pytree with its leading axis over 'trial'."""
    s = trial_sharding(mesh)
    return tuple(jax.device_put(t, s) for t in trees)
