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
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
        batch,
    )


def replicate(tree, mesh: Mesh):
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
