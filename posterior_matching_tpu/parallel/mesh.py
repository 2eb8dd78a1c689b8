"""Device mesh and sharding utilities.

The reference's only parallelism is single-host data parallelism via
``jax.pmap`` (bax Trainer ``num_devices``, reference train_pm_vdvae.py:150 and
hand-rolled eval pmaps, reference eval_pm_vqvae.py:142-152). The TPU-native
equivalent is a 1-D ``Mesh`` over the data axis with ``jit`` +
``NamedSharding``: gradients are reduced by XLA-inserted collectives over ICI,
params stay replicated, and the same program runs unchanged on 1..N chips
(and on a forced-host-device CPU mesh for tests).

Multi-host: call :func:`maybe_initialize_distributed` first; the mesh then
spans all processes and per-host batches are assembled with
``jax.make_array_from_process_local_data``.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def maybe_initialize_distributed():
    """Initializes jax.distributed when a multi-host environment is detected
    (no-op on a single host)."""
    import os

    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()


def create_mesh(
    num_devices: Optional[int] = None, axis_name: str = DATA_AXIS
) -> Mesh:
    """1-D data-parallel mesh over the first ``num_devices`` devices
    (default: all)."""
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Shards the leading (batch) axis across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def put_with_sharding(tree, sharding: NamedSharding):
    """Device-puts a host pytree under a sharding, correctly on one host AND
    multi-host. Single-host: a plain sharded ``device_put``. Multi-host
    (after :func:`maybe_initialize_distributed`): each process contributes
    its local shard and the result is a global array spanning the mesh
    (``jax.make_array_from_process_local_data`` — host data rides DCN only
    to its own chips). For a replicated sharding multi-host, every process
    must hold the identical full array."""
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)
        ),
        tree,
    )


def shard_batch(batch, mesh: Mesh, axis_name: str = DATA_AXIS):
    """Device-puts a host batch with the leading axis sharded over the mesh
    (see :func:`put_with_sharding` for multi-host semantics)."""
    return put_with_sharding(batch, batch_sharding(mesh, axis_name))
