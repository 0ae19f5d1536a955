"""CLI: export a trained model as a serialized StableHLO serving artifact.

Production-serving counterpart of the reference's ``model.save('.h5')``
dumps (``learn_image_embeddings.py:257-267``), done the TPU-native way:
the inference function (inference-mode forward at a chosen feature tap,
weights baked in) is lowered once with ``jax.export`` and serialized as a
portable StableHLO artifact that any JAX ≥ the export version can
``deserialize`` and ``call`` on TPU or CPU — no Python model code, flax, or
this package needed at serving time.

- The batch dimension is symbolic by default (``--batch -1``): one artifact
  serves any batch size.  Pass a fixed ``--batch N`` to let the serving
  compiler specialize.
- ``--layer`` picks the feature tap exactly like
  ``evaluate_classification_accuracy --layer`` (l2norm / embedding / prob /
  avg_pool); default is the model's final output.
- ``--platforms`` lowers for multiple targets in one artifact
  (default ``tpu,cpu``).
- ``--validate`` round-trips the artifact (deserialize + call on this
  host) and compares against the direct flax forward.

    python export_model.py --checkpoint model.ckpt --out model.shlo \
        --layer l2norm --input_size 32 [--batch -1] [--validate]

Loading at serving time:

    from jax import export
    fn = export.deserialize(open("model.shlo", "rb").read())
    embeddings = fn.call(images)          # (B, H, W, C) float32
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def build_parser():
    parser = argparse.ArgumentParser(
        description="Exports a trained checkpoint as a serialized StableHLO "
                    "serving artifact (jax.export).",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.add_argument("--checkpoint", type=str, required=True,
                        help="Model dump written by the learners "
                             "(--model_dump / --snapshot).")
    parser.add_argument("--architecture", type=str, default=None,
                        help="Backbone architecture (only needed when the "
                             "checkpoint lacks metadata).")
    parser.add_argument("--out", type=str, required=True,
                        help="Output artifact path; a .json sidecar with "
                             "the input spec is written next to it.")
    parser.add_argument("--layer", type=str, default=None,
                        help="Feature tap to export (l2norm / embedding / "
                             "prob / avg_pool); default: final output.")
    parser.add_argument("--input_size", type=int, default=32,
                        help="Input image height/width.")
    parser.add_argument("--input_channels", type=int, default=3)
    parser.add_argument("--batch", type=int, default=-1,
                        help="Batch size to specialize for; -1 exports a "
                             "batch-polymorphic artifact.")
    parser.add_argument("--platforms", type=str, default="tpu,cpu",
                        help="Comma-separated lowering targets.")
    parser.add_argument("--validate", action="store_true", default=False,
                        help="Deserialize and compare against the direct "
                             "forward on this host.")
    parser.add_argument("--bf16", action="store_true", default=False,
                        help="Bake bfloat16 compute into the artifact "
                             "(MXU-rate inference; inputs/outputs stay "
                             "float32).")
    return parser


def export_checkpoint(checkpoint, out, architecture=None, layer=None,
                      input_size=32, input_channels=3, batch=-1,
                      platforms=("tpu", "cpu"), validate=False, bf16=False):
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from . import common

    model, variables, meta = common.rebuild_model_from_checkpoint(
        checkpoint, architecture, dtype=jnp.bfloat16 if bf16 else None,
    )
    variables = {k: v for k, v in variables.items()
                 if k in ("params", "batch_stats")}

    def forward(images):
        if layer is None:
            return model.apply(variables, images, train=False)
        out_val, inter = model.apply(
            variables, images, train=False, mutable=["intermediates"]
        )
        return common.resolve_tap(inter.get("intermediates", {}), layer)

    if batch == -1:
        scope = jexport.SymbolicScope()
        (b,) = jexport.symbolic_shape("b", scope=scope)
    else:
        b = int(batch)
    spec = jax.ShapeDtypeStruct(
        (b, input_size, input_size, input_channels), jnp.float32
    )
    exported = jexport.export(
        jax.jit(forward), platforms=list(platforms)
    )(spec)
    blob = exported.serialize()
    with open(out, "wb") as f:
        f.write(blob)
    sidecar = {
        "architecture": meta.get("architecture", architecture),
        "layer": layer,
        "input_shape": [batch, input_size, input_size, input_channels],
        "input_dtype": "float32",
        "compute_dtype": "bfloat16" if bf16 else "float32",
        "platforms": list(platforms),
        "embed_dim": meta.get("embed_dim"),
        "cls_classes": meta.get("cls_classes"),
        "checkpoint": checkpoint,
        "jax_version": jax.__version__,
    }
    with open(out + ".json", "w") as f:
        json.dump(sidecar, f, indent=2)
    print(f"Exported {len(blob):,} bytes ({','.join(platforms)}) to {out}")

    if validate:
        restored = jexport.deserialize(blob)
        rng = np.random.default_rng(0)
        x = rng.normal(
            size=(2 if batch == -1 else batch, input_size, input_size,
                  input_channels)
        ).astype(np.float32)
        got = restored.call(x)
        # jit the reference forward: eager execution would dispatch one
        # tunneled op per layer on this backend.
        want = jax.jit(forward)(jnp.asarray(x))
        # On TPU the two lowerings (export pipeline vs direct jit) fuse
        # differently and f32 convs run through bf16 MXU passes by default,
        # so only CPU validation can expect near-bit equality.
        tol = (dict(rtol=1e-5, atol=1e-5)
               if jax.default_backend() == "cpu" and not bf16
               else dict(rtol=2e-2, atol=1e-3))
        for g, w in zip(jax.tree_util.tree_leaves(got),
                        jax.tree_util.tree_leaves(want)):
            np.testing.assert_allclose(np.asarray(g), np.asarray(w), **tol)
        print("Validated: deserialized artifact matches the direct forward.")
    return out


def main(argv=None):
    from . import common

    # Parse first: --help / flag errors must not touch the (remote) backend.
    args = build_parser().parse_args(argv)
    common.ensure_compile_cache()
    export_checkpoint(
        args.checkpoint, args.out, architecture=args.architecture,
        layer=args.layer, input_size=args.input_size,
        input_channels=args.input_channels, batch=args.batch,
        platforms=tuple(p.strip() for p in args.platforms.split(",") if p.strip()),
        validate=args.validate, bf16=args.bf16,
    )


if __name__ == "__main__":
    main()
