"""Subprocess entry for the two-process multi-host test.

Usage: python _multihost_worker.py <coordinator> <num_processes> <pid> <out.npz> [spatial]

Each worker owns 4 virtual CPU devices; ``jax.distributed.initialize``
joins them into one 8-device global mesh, and the SAME ``fit`` recipe as
the single-process baseline runs SPMD across both processes (gloo-backed
cross-process collectives).  ``spatial > 1`` folds the global mesh into
(data, spatial) — multi-host AND height-sharded at once.
"""

import json
import os
import sys


def main():
    coord, n_proc, pid, out = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
    spatial = int(sys.argv[5]) if len(sys.argv) > 5 else 1
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    # The environment's sitecustomize pins the axon TPU backend; undo
    # (same dance as tests/conftest.py) BEFORE the distributed bring-up.
    jax.config.update("jax_platforms", "cpu")
    try:
        from jax.extend.backend import clear_backends

        clear_backends()
    except Exception:
        pass
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_compile_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    jax.distributed.initialize(coord, num_processes=n_proc, process_id=pid)
    assert jax.process_count() == n_proc, jax.process_count()
    assert len(jax.devices()) == 4 * n_proc
    assert len(jax.local_devices()) == 4

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from _multihost_common import run_fit

    from semantic_embeddings_tpu.parallel import get_mesh

    params, logged = run_fit(get_mesh(spatial=spatial))

    import numpy as np

    np.savez(out, **params)
    with open(out + ".metrics.json", "w") as f:
        json.dump(logged, f)
    print(f"worker {pid} done", flush=True)


if __name__ == "__main__":
    main()
