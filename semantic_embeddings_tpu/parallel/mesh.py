"""Device mesh and sharding specs — the framework's communication backend.

The reference's entire distribution story is single-host data parallelism
via ``keras.utils.multi_gpu_model`` (``/root/reference/learn_image_embeddings
.py:133,148``).  Here the equivalent is declarative: a 1-D ``data`` mesh over
all chips, batches sharded along it, parameters replicated.  XLA GSPMD
inserts the gradient all-reduce (``psum``) over ICI; BatchNorm statistics
become global-batch statistics automatically because the batch-axis
reductions are lowered to cross-replica collectives.  ``--gpus``/``--gpu_merge``
flags map onto the mesh size (see the CLIs).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

DATA_AXIS = "data"


def get_mesh(n_devices=None, devices=None) -> Mesh:
    """A 1-D data-parallel mesh over (a prefix of) the available devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"Requested {n_devices} devices but only {len(devices)} present."
            )
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across the data axis."""
    return NamedSharding(mesh, PartitionSpec(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())


def shard_batch(mesh: Mesh, batch):
    """Places a pytree of host arrays on the mesh, batch-axis sharded
    (scalars and rank-0 leaves are replicated)."""
    data = batch_sharding(mesh)
    rep = replicated(mesh)

    def put(x):
        x = np.asarray(x)
        return jax.device_put(x, data if x.ndim >= 1 else rep)

    return jax.tree_util.tree_map(put, batch)


def replicate(mesh: Mesh, tree):
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
