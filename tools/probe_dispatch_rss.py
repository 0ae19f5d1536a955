"""Minimal repro: does a bare jit-call loop on the axon TPU backend leak RSS?

No serving code involved: deserialize the artifact, loop device calls on a
fixed batch, sample RSS. Linear growth here = backend dispatch leak.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_bench")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

ART = sys.argv[1] if len(sys.argv) > 1 else "/tmp/serve_fix_tpu/model_f32.shlo"
BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 32
CALLS = int(sys.argv[3]) if len(sys.argv) > 3 else 1500
FRESH = len(sys.argv) > 4 and sys.argv[4] == "fresh"  # new host array per call


def rss_mb():
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0


from jax import export as jexport

with open(ART, "rb") as f:
    exported = jexport.deserialize(f.read())
fn = jax.jit(lambda x: exported.call(x))
size = 32
x_host = np.random.default_rng(0).normal(
    size=(BATCH, size, size, 3)).astype(np.float32)
fn(x_host)  # compile
print(f"compiled; start rss={rss_mb():.1f} MB", flush=True)
for i in range(5):
    for _ in range(CALLS):
        xb = (np.array(x_host) if FRESH else x_host)
        np.asarray(fn(xb))  # host sync each call, like a serving request
    print(f"after {(i + 1) * CALLS} calls (batch {BATCH}, fresh={FRESH}): "
          f"rss={rss_mb():.1f} MB", flush=True)
