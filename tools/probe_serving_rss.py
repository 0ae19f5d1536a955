"""Multi-phase RSS probe for the serving stack: leak vs allocator warm-up."""
import gc
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_bench")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from semantic_embeddings_tpu.cli.serve_model import build_parser, make_server
from semantic_embeddings_tpu.serving import ServingClient

ART = sys.argv[1] if len(sys.argv) > 1 else "/tmp/serve_fix_cpu/model_f32.shlo"
PHASES = int(sys.argv[2]) if len(sys.argv) > 2 else 4
N = int(sys.argv[3]) if len(sys.argv) > 3 else 6000
CONC = 32

srv = make_server(build_parser().parse_args(
    ["--artifact", ART, "--port", "0", "--max_batch", "64",
     "--batch_timeout_ms", "2.0", "--mean", "0,0,0", "--std", "1,1,1"]))
srv.start()
size = srv.engine.input_tail[0]
x = np.random.default_rng(0).normal(size=(1, size, size, 3)).astype(np.float32)
srv.engine.warmup()


def rss_mb():
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0


def phase(n):
    per = n // CONC
    def worker():
        c = ServingClient(f"http://127.0.0.1:{srv.port}", timeout=300.0)
        for _ in range(per):
            c.predict(x)
    ts = [threading.Thread(target=worker) for _ in range(CONC)]
    t0 = time.perf_counter()
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    return time.perf_counter() - t0


print(f"start rss={rss_mb():.1f} MB", flush=True)
for i in range(PHASES):
    dt = phase(N)
    gc.collect()
    print(f"phase {i}: {N} req in {dt:.1f}s ({N/dt:.0f} req/s)  "
          f"rss={rss_mb():.1f} MB", flush=True)
srv.stop()
