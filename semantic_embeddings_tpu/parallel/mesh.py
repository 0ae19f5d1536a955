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
SPATIAL_AXIS = "spatial"


def get_mesh(n_devices=None, devices=None, spatial=1) -> Mesh:
    """A data-parallel mesh over (a prefix of) the available devices.

    ``spatial > 1`` folds the devices into a 2-D ``(data, spatial)`` mesh
    for spatial partitioning: image batches are sharded along BOTH the
    batch axis (``data``) and the image-height axis (``spatial``), and XLA
    GSPMD inserts the halo exchanges every spatially-partitioned
    convolution/pool needs plus the cross-shard reductions for BatchNorm
    statistics and global pooling.  This is the TPU-native way to scale a
    SINGLE large-image batch across chips — the 448 px fine-tune recipes
    run at their throughput optimum at per-chip batch 24 (SPEED.md), so
    more chips can only help via batch DP (changes the recipe's global
    batch) or spatial sharding (doesn't).  No reference counterpart:
    ``multi_gpu_model`` (learn_image_embeddings.py:133) only splits the
    batch axis.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"Requested {n_devices} devices but only {len(devices)} present."
            )
        devices = devices[:n_devices]
    spatial = max(1, int(spatial))
    if spatial > 1:
        if len(devices) % spatial:
            raise ValueError(
                f"{len(devices)} devices do not fold into spatial={spatial} "
                f"columns; device count must be a multiple of spatial."
            )
        grid = np.asarray(devices).reshape(len(devices) // spatial, spatial)
        return Mesh(grid, (DATA_AXIS, SPATIAL_AXIS))
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def spatial_size(mesh) -> int:
    """Number of spatial shards (1 when the mesh has no spatial axis)."""
    if mesh is None or SPATIAL_AXIS not in mesh.axis_names:
        return 1
    return mesh.shape[SPATIAL_AXIS]


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across the data axis."""
    return NamedSharding(mesh, PartitionSpec(DATA_AXIS))


def image_sharding(mesh: Mesh) -> NamedSharding:
    """NHWC image batches: batch axis on ``data``, height on ``spatial``
    (identical to :func:`batch_sharding` on a 1-D mesh)."""
    if SPATIAL_AXIS in mesh.axis_names:
        return NamedSharding(mesh, PartitionSpec(DATA_AXIS, SPATIAL_AXIS))
    return batch_sharding(mesh)


def constrain_spatial(mesh, images):
    """Inside-jit sharding constraint pinning an NHWC activation batch to
    ``(data, spatial)``.  The step builders apply it right after
    ``prepare`` so the conv stack is spatially partitioned even when the
    raw batch carries only indices (the in-HBM dataset path) and sharding
    could not propagate from the inputs.  No-op without a spatial mesh."""
    if mesh is None or SPATIAL_AXIS not in mesh.axis_names:
        return images
    return jax.lax.with_sharding_constraint(images, image_sharding(mesh))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())


def initialize_distributed():
    """Multi-host bring-up: call once at program start on every host.

    No-op when single-process (the common case here).  On a multi-host
    TPU slice, ``jax.distributed.initialize()`` picks up the coordinator
    from the TPU environment (or ``JAX_COORDINATOR_ADDRESS`` /
    ``JAX_NUM_PROCESSES`` / ``JAX_PROCESS_ID``); afterwards
    ``jax.devices()`` spans every host, so ``get_mesh()`` builds the
    global mesh and the same pjit-sharded step runs SPMD across hosts —
    gradient psum over ICI within a slice, DCN across slices, all
    through XLA collectives.

    Trigger condition: we call ``initialize()`` when either the explicit
    coordinator env vars are set OR a multi-host TPU environment is
    detectable (Cloud TPU / megascale metadata env vars) — on standard
    pods ``jax.distributed.initialize()`` auto-discovers the coordinator
    from the TPU metadata with no JAX_* vars set, so gating on those
    alone would silently leave every host a single-process job.
    """
    import os

    explicit = (os.environ.get("JAX_COORDINATOR_ADDRESS")
                or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS"))
    # Cloud TPU pod environments export worker topology metadata; any of
    # these indicates a multi-host slice whose coordinator initialize()
    # can auto-detect (jax.distributed's cluster detection covers
    # GCE/GKE TPU environments).
    hostnames = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    tpu_pod = (
        "," in hostnames  # >1 worker in the slice
        or os.environ.get("MEGASCALE_NUM_SLICES")
        or os.environ.get("CLOUD_TPU_TASK_ID")
    )
    if not (explicit or tpu_pod):
        return
    # CRITICAL ordering: do NOT query jax.process_count()/jax.devices()
    # first — that initializes the XLA backend, after which
    # jax.distributed.initialize() raises ("backends are initialized").
    try:
        jax.distributed.initialize()
    except RuntimeError as e:
        # Idempotent startup paths (initialize() called twice) land here.
        if "already" not in str(e).lower():
            raise


def process_slice(n: int, process_index=None, process_count=None):
    """The contiguous [start, stop) rows of a global batch of ``n`` that
    THIS process must provide (hosts feed equal contiguous slices, in
    process order, matching the device order of :func:`get_mesh`).

    Pure math so the multi-host layout is unit-testable without a
    multi-process run; ``n`` must divide evenly across processes (the
    batch builders pad to full batches already).
    """
    idx = jax.process_index() if process_index is None else process_index
    cnt = jax.process_count() if process_count is None else process_count
    if n % cnt:
        raise ValueError(f"global batch {n} not divisible by {cnt} hosts")
    per = n // cnt
    return idx * per, (idx + 1) * per


def shard_batch(mesh: Mesh, batch, global_batch=None):
    """Places a pytree of host arrays on the mesh, batch-axis sharded
    (scalars and rank-0 leaves are replicated).

    Single-process: plain ``device_put`` of the full batch.  Multi-host:
    each process passes either the FULL global batch (its local slice is
    taken via :func:`process_slice`) or just its local rows (then
    ``global_batch`` must give the global leading dim), and the global
    array is assembled with ``jax.make_array_from_process_local_data`` —
    no cross-host data movement.
    """
    data = batch_sharding(mesh)
    rep = replicated(mesh)

    if jax.process_count() > 1:
        cnt = jax.process_count()

        def put_local(x):
            x = np.asarray(x)
            if x.ndim == 0:
                return jax.device_put(x, rep)
            n = x.shape[0] if global_batch is None else int(global_batch)
            if x.shape[0] == n:  # full global batch on this host: slice it
                start, stop = process_slice(n)
                x = x[start:stop]
            elif x.shape[0] != n // cnt:
                raise ValueError(
                    f"leaf leading dim {x.shape[0]} is neither the global "
                    f"batch {n} nor the local share {n // cnt}"
                )
            return jax.make_array_from_process_local_data(data, x)

        return jax.tree_util.tree_map(put_local, batch)

    img = image_sharding(mesh)
    n_sp = spatial_size(mesh)

    def put(x):
        x = np.asarray(x)
        if x.ndim == 0:
            return jax.device_put(x, rep)
        # NHWC image leaves additionally shard H on the spatial axis when it
        # divides evenly (the in-jit constrain_spatial reshards otherwise).
        if x.ndim == 4 and n_sp > 1 and x.shape[1] % n_sp == 0:
            return jax.device_put(x, img)
        return jax.device_put(x, data)

    return jax.tree_util.tree_map(put, batch)


def replicate(mesh: Mesh, tree):
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
