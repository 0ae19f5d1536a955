"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Sharded code paths (pjit over a ``data`` mesh axis) are exercised on fake CPU
devices so the full multi-chip program compiles and executes in CI without
TPU hardware (see SURVEY.md §4 point 3).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest

REFERENCE = "/root/reference"


@pytest.fixture(scope="session")
def reference_dir():
    if not os.path.isdir(REFERENCE):
        pytest.skip("reference checkout not available")
    return REFERENCE


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
