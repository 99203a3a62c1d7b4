"""Device mesh and sharding helpers.

The reference's only parallelism is NCCL data-parallel DDP (1 process per GPU,
ref: train_net.py:284-291, SURVEY §2.7). The TPU-native equivalent is a single
`jax.sharding.Mesh` over all chips with the batch axis sharded on "data":
gradients all-reduce implicitly inside the jitted train step (XLA inserts the
psum), parameters are replicated, and metric reductions are plain jnp ops on
globally-sharded arrays. Multi-host (DCN) extends the same mesh via
`jax.distributed.initialize` — no code change in the step function.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), ("data",))


def local_mesh(mesh: Mesh) -> Mesh:
    """This host's slice of `mesh` as a standalone Mesh(("data",)).

    Multi-host eval shards RECORDS per host, then fans each host's batches
    out over its own chips (the reference's one-eval-process-per-GPU,
    ref: pred.py:231-238) — that per-host stage needs a mesh of local
    devices only."""
    local = [d for d in mesh.devices.flat
             if d.process_index == jax.process_index()]
    if not local:  # the passed mesh has no devices on this host
        local = jax.local_devices()
    return Mesh(np.asarray(local), ("data",))


def spans_processes(mesh: Mesh) -> bool:
    return len({d.process_index for d in mesh.devices.flat}) > 1


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place every array in `batch` with its leading axis sharded on "data".

    Single-host: a plain device_put. Multi-host: each process holds only its
    slice of the global batch (TrainLoader shards by process), so the global
    array is assembled from per-process locals — the TPU-native replacement
    for the reference's per-rank DDP loader (ref: train_net.py:284-291)."""
    sh = data_sharding(mesh)
    # branch on the MESH spanning processes, not on process_count: a
    # host-local mesh inside a multi-host run (the per-host eval fan-out)
    # is a plain local device_put
    if not spans_processes(mesh):
        return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
        batch,
    )


def replicate(tree, mesh: Mesh):
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
