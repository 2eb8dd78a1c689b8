"""Worker process for the two-process multi-host test.

Run as: python multihost_worker.py <coordinator_port> <process_id> <num_procs>

Each process brings 4 forced CPU devices (global mesh = num_procs * 4
devices), initializes jax.distributed against a local coordinator, and then
exercises the REAL multi-host code paths of the framework:

- ``put_with_sharding`` batch sharding via
  ``jax.make_array_from_process_local_data`` (each process contributes its
  local rows);
- a jitted global-mean reduction over the sharded batch (a genuine
  cross-process collective);
- two ``Trainer.fit`` optimizer steps over the multi-process mesh, with
  per-process local datasets.

Prints machine-checkable lines the parent test asserts on.
"""
import os
import sys

port, pid, nprocs = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

# The parent test also passes these via env (the axon sitecustomize imports
# jax at interpreter startup, before this body runs); set them here too for
# standalone invocation. Backend initialization is lazy, so config updates
# below still apply.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
# Multi-process CPU needs an explicit cross-process collectives impl; without
# it the CPU client is created single-process and process_count() stays 1.
jax.config.update("jax_cpu_collectives_implementation", "gloo")

jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}",
    num_processes=nprocs,
    process_id=pid,
)

import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from posterior_matching_tpu.data.datasets import ArrayDataset
from posterior_matching_tpu.parallel.mesh import (
    create_mesh,
    put_with_sharding,
    batch_sharding,
    replicated_sharding,
)
from posterior_matching_tpu.train import Trainer

assert jax.process_count() == nprocs, jax.process_count()
assert jax.device_count() == 4 * nprocs, jax.device_count()
print(f"TOPOLOGY procs={jax.process_count()} devices={jax.device_count()}",
      flush=True)

mesh = create_mesh()

# -- cross-process collective: global mean of a batch-sharded array ---------
global_rows = np.arange(16 * nprocs * 3, dtype=np.float32).reshape(
    16 * nprocs, 3
)
local_rows = global_rows[pid * 16 : (pid + 1) * 16]
sharded = put_with_sharding(local_rows, batch_sharding(mesh))
assert sharded.shape == global_rows.shape, sharded.shape

mean = jax.jit(
    lambda x: jnp.mean(x),
    out_shardings=replicated_sharding(mesh),
)(sharded)
print(f"GLOBAL_MEAN {float(mean):.6f} EXPECT {global_rows.mean():.6f}",
      flush=True)

# -- replicated put across processes ----------------------------------------
rep = put_with_sharding(np.full((5,), 7.5, np.float32),
                        replicated_sharding(mesh))
print(f"REPLICATED_SUM {float(jnp.sum(rep)):.6f}", flush=True)


# -- Trainer.fit over the multi-process mesh --------------------------------
class Tiny(nn.Module):
    @nn.compact
    def __call__(self, x):
        return nn.Dense(x.shape[-1])(jax.nn.relu(nn.Dense(8)(x)))


model = Tiny()


def loss_fn(params, state, key, step, batch, is_training):
    pred = model.apply({"params": params}, batch["features"])
    return jnp.mean((pred - batch["features"]) ** 2), {}, state


def init_fn(key, batch):
    return model.init(key, batch["features"])["params"], {}


data = np.random.RandomState(0).randn(32 * nprocs, 4).astype(np.float32)
local = data[pid * 32 : (pid + 1) * 32]
ds = ArrayDataset({"features": local}, batch_size=8, shuffle=False)

trainer = Trainer(loss_fn, init_fn, optax.adam(1e-2), seed=3)
ts = trainer.fit(ds, steps=2, validation_freq=100)

leaves = jax.tree.leaves(jax.device_get(ts.params))
digest = float(sum(np.sum(np.abs(l)) for l in leaves))
print(f"PARAM_DIGEST {digest:.8f}", flush=True)
print("WORKER_OK", flush=True)
