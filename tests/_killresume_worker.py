"""Subprocess entry for the SIGKILL fault-injection test.

Usage: python _killresume_worker.py <snapshot_path> <epochs>

Runs the real learner CLI (simple arch, synthetic data, one snapshot per
epoch) on the CPU backend until killed.  The parent test SIGKILLs this
process at an arbitrary moment after snapshots start appearing and then
asserts the snapshot on disk is loadable (atomic tmp+rename write,
``train/state.py:save_checkpoint``) and resumable.
"""

import os
import sys


def main():
    snap, epochs = sys.argv[1], int(sys.argv[2])
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    # The environment's sitecustomize pins the axon TPU backend; undo
    # (same dance as tests/conftest.py).
    jax.config.update("jax_platforms", "cpu")
    try:
        from jax.extend.backend import clear_backends

        clear_backends()
    except Exception:
        pass
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_compile_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from semantic_embeddings_tpu.cli.learn_image_embeddings import main as learn

    learn([
        "--dataset", "synthetic-10", "--data_root", "x",
        "--embedding", "onehot", "--architecture", "simple",
        "--loss", "inv_corr", "--lr_schedule", "SGD",
        "--sgd_schedule", f"1:0.02,{epochs}", "--batch_size", "256",
        "--snapshot", snap, "--no_progress",
    ])


if __name__ == "__main__":
    main()
