#!/usr/bin/env python3
"""Build a random-init resnet-110-wfc checkpoint + f32/bf16 StableHLO
artifacts for serving benchmarks (weights don't affect serving perf).

    python tools/make_serving_fixture.py OUTDIR [--cpu] [--arch A] [--size N]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("outdir")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--arch", default="resnet-110-wfc")
    ap.add_argument("--size", type=int, default=32)
    ap.add_argument("--embed_dim", type=int, default=100)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_bench")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    from semantic_embeddings_tpu.cli import common
    from semantic_embeddings_tpu.cli.export_model import export_checkpoint
    from semantic_embeddings_tpu.train.state import save_checkpoint

    os.makedirs(args.outdir, exist_ok=True)
    model, _spec = common.build_embedding_model(
        args.embed_dim, args.arch, "inv_corr", 0)
    state = common.init_model_state(model, args.size, 3)
    ckpt = os.path.join(args.outdir, "model.ckpt")
    save_checkpoint(ckpt, state, {
        "architecture": args.arch, "embed_dim": args.embed_dim,
        "loss": "inv_corr", "cls_classes": 0,
    })
    print("checkpoint:", ckpt, flush=True)
    for tag, bf16 in (("f32", False), ("bf16", True)):
        out = os.path.join(args.outdir, f"model_{tag}.shlo")
        export_checkpoint(ckpt, out, layer="l2norm", input_size=args.size,
                          batch=-1, platforms=("tpu", "cpu"), bf16=bf16)
        print(f"artifact {tag}:", out, os.path.getsize(out), "bytes",
              flush=True)


if __name__ == "__main__":
    main()
