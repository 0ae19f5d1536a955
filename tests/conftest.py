"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Sharded code paths (pjit over a ``data`` mesh axis) are exercised on fake CPU
devices so the full multi-chip program compiles and executes in CI without
TPU hardware (see SURVEY.md §4 point 3).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# The Keras-oracle tests compare tf_keras numerics against ours; oneDNN's
# blocked conv algorithms add ~1e-4-scale drift that compounds across train
# steps (test_train_trajectory_oracle).  Must be set before TF is imported.
os.environ.setdefault("TF_ENABLE_ONEDNN_OPTS", "0")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The environment's sitecustomize force-registers the axon TPU backend and
# pins jax_platforms; undo that so tests run on the virtual 8-device CPU mesh.
jax.config.update("jax_platforms", "cpu")
try:
    from jax.extend.backend import clear_backends

    clear_backends()
except Exception:  # pragma: no cover - older jax
    pass

# Persistent compilation cache: model-init compiles one tiny XLA program per
# unique parameter shape (~150ms each here); caching makes re-runs much
# faster (measured: 6:08 warm vs 16:46 cold for the default suite on this
# 1-core host).  Lives under ~/.cache (not /tmp) so it survives reboots.
#
# Keyed by a CPU-feature fingerprint: these rounds run on hosts whose CPU
# capabilities differ, and XLA:CPU happily LOADS cached AOT executables
# compiled for a different machine type ("Target machine feature ... is
# not supported on the host machine ... could lead to execution errors
# such as SIGILL" warnings) — different vectorization means different
# float summation order, which shifts f64 rounding and destabilizes the
# chaos-sensitive trajectory oracles between sessions.  A per-CPU cache
# directory makes every session execute code compiled FOR its own host.


def _cpu_fingerprint():
    import hashlib

    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.sha256(
                        " ".join(sorted(line.split()[2:])).encode()
                    ).hexdigest()[:12]
    except OSError:
        pass
    import platform

    return platform.machine()


jax.config.update(
    "jax_compilation_cache_dir",
    os.path.expanduser(f"~/.cache/jax_test_compile_cache_{_cpu_fingerprint()}"),
)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np
import pytest

REFERENCE = "/root/reference"


@pytest.fixture(scope="session")
def reference_dir():
    if not os.path.isdir(REFERENCE):
        pytest.skip("reference checkout not available")
    return REFERENCE


@pytest.fixture(scope="module")
def rng():
    """Fresh fixed-seed generator per MODULE (some module-scoped data
    fixtures consume it): with the old session-scoped shared generator,
    each test file's draws depended on how many other files ran before
    it, so data varied with test selection/order."""
    return np.random.default_rng(0)
