"""CLI: serve a trained model over HTTP with dynamic micro-batching.

Production-serving frontend for the artifacts written by
``export_model.py`` (StableHLO, no model code needed) or for a raw
checkpoint.  Beyond-parity subsystem: the reference pipeline stops at
``model.save('.h5')`` (``/root/reference/learn_image_embeddings.py:257``)
and offline ``predict_generator`` dumps; this serves the same forward
online, coalescing concurrent requests into bucketed device batches
(see ``serving/engine.py``).

    python serve_model.py --artifact model.shlo --port 8000
    python serve_model.py --checkpoint model.ckpt --layer l2norm

    curl -s localhost:8000/healthz
    curl -s -X POST -H 'Content-Type: application/json' \
        -d '{"instances": [[[..32x32x3 pixels..]]]}' \
        localhost:8000/v1/predict
    curl -s -X POST -H 'Content-Type: image/jpeg' \
        --data-binary @img.jpg localhost:8000/v1/predict

Normalization: pass ``--dataset`` to use that dataset's channel stats
(e.g. ``cifar-100`` / ``ilsvrc``), or explicit ``--mean``/``--std`` CSV
values; JSON requests may bypass it with ``"normalized": true``.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def build_parser():
    parser = argparse.ArgumentParser(
        description="Serves a trained model over HTTP with dynamic "
                    "micro-batching.",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    src = parser.add_argument_group("model source")
    src.add_argument("--artifact", type=str, default=None,
                     help="StableHLO artifact from export_model.py "
                          "(reads the .json sidecar when present).")
    src.add_argument("--checkpoint", type=str, default=None,
                     help="Model dump / snapshot to serve directly.")
    src.add_argument("--architecture", type=str, default=None,
                     help="Backbone architecture (checkpoints without "
                          "metadata only).")
    src.add_argument("--layer", type=str, default=None,
                     help="Feature tap (l2norm / embedding / prob / "
                          "avg_pool); checkpoint source only.")
    src.add_argument("--input_size", type=int, default=None,
                     help="Input image height/width (default: sidecar "
                          "value, else 32).")
    src.add_argument("--input_channels", type=int, default=3)
    src.add_argument("--bf16", action="store_true", default=False,
                     help="Run the forward in bfloat16 (MXU-rate "
                          "inference; checkpoint source only — artifacts "
                          "bake their dtype at export, see export_model "
                          "--bf16).")

    srv = parser.add_argument_group("server")
    srv.add_argument("--host", type=str, default="127.0.0.1")
    srv.add_argument("--port", type=int, default=8000)
    srv.add_argument("--max_batch", type=int, default=256,
                     help="Largest device batch (and request size cap).")
    srv.add_argument("--batch_timeout_ms", type=float, default=2.0,
                     help="How long the batcher waits to fill a batch "
                          "after the first request arrives.")
    srv.add_argument("--request_timeout_s", type=float, default=60.0)
    srv.add_argument("--decode_threads", type=int, default=4,
                     help="Native JPEG decoder threads per request.")
    srv.add_argument("--gpus", type=int, default=1,
                     help="Shard every device batch across this many chips "
                          "(data-parallel SPMD serving on a mesh; batch "
                          "buckets become multiples of the chip count).")
    srv.add_argument("--max_queue", type=int, default=None,
                     help="Pending-image cap; beyond it requests get HTTP "
                          "503 + Retry-After instead of queueing unbounded "
                          "(default: 16 full batches).")
    srv.add_argument("--warmup", action="store_true", default=False,
                     help="Pre-compile every batch bucket before accepting "
                          "traffic, so no live request pays a first-hit "
                          "XLA compile.")

    prep = parser.add_argument_group("preprocessing")
    prep.add_argument("--dataset", type=str, default=None,
                      help="Use this dataset's channel mean/std for "
                           "normalization (name conventions as in the "
                           "learners).")
    prep.add_argument("--data_root", type=str, default=None,
                      help="Dataset root (only needed when --dataset "
                           "stats require reading the data).")
    prep.add_argument("--mean", type=str, default=None,
                      help="Channel mean as CSV, e.g. 125.3,123.0,113.9.")
    prep.add_argument("--std", type=str, default=None,
                      help="Channel std as CSV.")
    prep.add_argument("--target_size", type=int, default=None,
                      help="Shorter-side resize target for JPEG requests "
                           "before the center crop (default: crop size).")
    prep.add_argument("--device_preproc", action="store_true", default=False,
                      help="Transfer uint8 pixels and run mean/std "
                           "normalization on device (fused into the jitted "
                           "forward): 4x less host->device bandwidth per "
                           "image and no per-image host float math. "
                           "Requests must carry raw pixel values (JPEG or "
                           "un-normalized arrays).")
    return parser


def _csv_floats(text):
    return [float(v) for v in text.split(",") if v.strip()]


def build_model_fn(args):
    """Returns (fn, meta): ``fn`` maps (B, H, W, C) float32 -> pytree."""
    import jax
    import jax.numpy as jnp

    from . import common

    if bool(args.artifact) == bool(args.checkpoint):
        raise SystemExit("pass exactly one of --artifact / --checkpoint")

    if args.artifact:
        from jax import export as jexport

        if args.bf16:
            raise SystemExit(
                "--bf16 applies to --checkpoint serving only; artifacts "
                "bake their compute dtype at export time "
                "(export_model.py --bf16).")
        with open(args.artifact, "rb") as f:
            exported = jexport.deserialize(f.read())
        meta = {"artifact": os.path.abspath(args.artifact)}
        sidecar = args.artifact + ".json"
        if os.path.exists(sidecar):
            with open(sidecar) as f:
                meta.update(json.load(f))
        input_size = args.input_size or abs(
            meta.get("input_shape", [0, 32])[1]) or 32
        fn = jax.jit(lambda x: exported.call(x))
    else:
        model, variables, ckpt_meta = common.rebuild_model_from_checkpoint(
            args.checkpoint, args.architecture,
            dtype=jnp.bfloat16 if args.bf16 else None)
        variables = {k: v for k, v in variables.items()
                     if k in ("params", "batch_stats")}
        layer = args.layer
        meta = {"checkpoint": os.path.abspath(args.checkpoint),
                "layer": layer,
                "compute_dtype": "bfloat16" if args.bf16 else "float32"}
        meta.update({k: v for k, v in ckpt_meta.items()
                     if isinstance(v, (str, int, float, bool, type(None)))})
        input_size = args.input_size or 32

        def forward(images):
            if layer is None:
                return model.apply(variables, images, train=False)
            out, inter = model.apply(
                variables, images, train=False, mutable=["intermediates"])
            return common.resolve_tap(inter.get("intermediates", {}), layer)

        fn = jax.jit(forward)

    meta["input_size"] = input_size
    meta["input_channels"] = args.input_channels
    return fn, meta


#: Published channel statistics (``/root/reference/README.md:350-355``)
#: so serving does not need the training data on disk.
PUBLISHED_STATS = {
    "cifar-100": ([129.30386353, 124.06987, 112.43356323],
                  [68.17019653, 65.39176178, 70.4180603]),
    "nab": ([125.30513277, 129.66606421, 118.45121113],
            [57.0045467, 56.70059436, 68.44430446]),
}


def resolve_stats(args):
    if args.mean or args.std:
        return (_csv_floats(args.mean) if args.mean else None,
                _csv_floats(args.std) if args.std else None)
    if args.dataset:
        import numpy as np

        from .. import data as data_mod

        name = args.dataset.lower()
        if name in PUBLISHED_STATS:
            return PUBLISHED_STATS[name]
        if name in ("cub", "cub-large"):
            return data_mod.CUB_STATS
        if name in ("ilsvrc", "imagenet") or name.endswith("-ilsvrcmean"):
            return data_mod.IMAGENET_MEAN, data_mod.IMAGENET_STD
        if name.endswith("-caffe"):
            return data_mod.CAFFE_MEAN, data_mod.CAFFE_STD
        if args.data_root:
            ds = data_mod.get_data_generator(name, args.data_root)
            return (list(np.asarray(ds.mean).ravel() * 255.0),
                    list(np.asarray(ds.std).ravel() * 255.0))
        raise SystemExit(
            f"no published stats for dataset '{args.dataset}'; pass "
            "--data_root to compute them or give --mean/--std directly")
    return None, None


def make_server(args):
    from ..serving import BatchingEngine, Preprocessor, ServingServer
    from . import common

    fn, meta = build_model_fn(args)
    mean, std = resolve_stats(args)
    meta["mean"], meta["std"] = mean, std
    mesh = common.resolve_mesh(getattr(args, "gpus", 1))
    if mesh is not None:
        meta["devices"] = int(mesh.devices.size)
    device_preproc = bool(getattr(args, "device_preproc", False))
    engine_dtype = np.float32
    if device_preproc:
        # uint8 on the wire; cast + mean/std fold into the jitted forward
        # (XLA fuses them with the stem conv's input read).
        import jax
        import jax.numpy as jnp

        mean_dev = jnp.asarray(mean if mean is not None else 0.0, jnp.float32)
        std_dev = jnp.asarray(std if std is not None else 1.0, jnp.float32)
        base_fn = fn

        def normalized_fn(u8):
            return base_fn(
                (u8.astype(jnp.float32) - mean_dev) / std_dev)

        fn = jax.jit(normalized_fn)
        engine_dtype = np.uint8
        meta["device_preproc"] = True
    preproc = Preprocessor(
        meta["input_size"], args.input_channels, mean=mean, std=std,
        target_size=args.target_size, n_threads=args.decode_threads,
        device_norm=device_preproc)
    engine = BatchingEngine(
        fn, (meta["input_size"], meta["input_size"], args.input_channels),
        max_batch=args.max_batch, timeout_ms=args.batch_timeout_ms,
        mesh=mesh, max_queue=args.max_queue, dtype=engine_dtype)
    return ServingServer(engine, preproc, meta, host=args.host,
                         port=args.port,
                         request_timeout=args.request_timeout_s)


def main(argv=None):
    import signal
    import threading

    from . import common

    args = build_parser().parse_args(argv)
    common.ensure_compile_cache()
    server = make_server(args)
    if args.warmup:
        print(f"warming up buckets {server.engine.buckets} ...", flush=True)
        timings = server.engine.warmup()
        print(f"warmup done: {timings} s per bucket", flush=True)
    print(f"serving on http://{args.host}:{server.port}  "
          f"(max_batch {args.max_batch}, "
          f"timeout {args.batch_timeout_ms} ms)", flush=True)
    # Graceful SIGTERM (the signal orchestrators send): stop accepting,
    # drain in-flight requests, then exit 0.  shutdown() must come from
    # another thread than serve_forever's.
    signal.signal(
        signal.SIGTERM,
        lambda *_: threading.Thread(target=server.httpd.shutdown,
                                    daemon=True).start())
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.stop()
    print("serving stopped", flush=True)


if __name__ == "__main__":
    main()
