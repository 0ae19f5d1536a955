"""Shared CLI plumbing: argument groups, model assembly, feature dumps.

Keeps every learner script's flag surface identical to its reference
counterpart (flag names are part of the public API per BASELINE.json).
"""

from __future__ import annotations

import json
import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np

from ..embeddings import save_features
from ..models import EmbeddingModel, build_network
from ..parallel import get_mesh
from ..train import LOSS_OUTPUT, new_train_state


def ensure_compile_cache():
    """Per-CLI startup: multi-host init + persistent compilation cache.

    Multi-host first — ``jax.distributed.initialize`` must run before any
    device query (no-op single-process).  Then the compile cache: on this
    class of environment XLA compiles can take minutes (remote compile
    service); caching makes every rerun of a CLI start hot.  Honours
    JAX_COMPILATION_CACHE_DIR; defaults under ~/.cache.
    """
    from ..parallel import initialize_distributed

    initialize_distributed()
    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.expanduser("~/.cache/semantic_embeddings_tpu/xla"),
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


def add_lr_schedule_arguments(parser):
    """Reference ``utils.add_lr_schedule_arguments`` (``utils.py:402-418``)."""
    group = parser.add_argument_group("Parameters for --lr_schedule=SGD")
    group.add_argument("--sgd_patience", type=int, default=None,
                       help="Patience of learning rate reduction in epochs.")
    group.add_argument("--sgd_lr", type=float, default=0.1,
                       help="Initial learning rate.")
    group.add_argument("--sgd_min_lr", type=float, default=None,
                       help="Minimum learning rate.")
    group.add_argument("--sgd_schedule", type=str, default=None,
                       help="Comma-separated list of `epoch:lr` pairs, defining "
                            "a learning rate schedule. The total number of "
                            "epochs can be appended to this list, separated by "
                            "a comma as well.")
    group = parser.add_argument_group("Parameters for --lr_schedule=SGDR")
    group.add_argument("--sgdr_base_len", type=int, default=None,
                       help="Length of first cycle in epochs.")
    group.add_argument("--sgdr_mul", type=int, default=None,
                       help="Multiplier for cycle length after each cycle.")
    group.add_argument("--sgdr_max_lr", type=float, default=None,
                       help="Maximum learning rate.")
    group = parser.add_argument_group("Parameters for --lr_schedule=CLR")
    group.add_argument("--clr_step_len", type=int, default=None,
                       help="Length of each step in epochs.")
    group.add_argument("--clr_min_lr", type=float, default=None,
                       help="Minimum learning rate.")
    group.add_argument("--clr_max_lr", type=float, default=None,
                       help="Maximum learning rate.")


def add_common_train_arguments(group):
    group.add_argument("--gpus", type=int, default=1,
                       help="Number of devices (mesh size) to be used.")
    group.add_argument("--read_workers", type=int, default=8,
                       help="Number of parallel data pre-processing threads.")
    group.add_argument("--queue_size", type=int, default=100,
                       help="Maximum size of data queue.")
    group.add_argument("--gpu_merge", action="store_true", default=False,
                       help="Accepted for interface parity (gradient merge "
                            "placement is handled by XLA collectives).")
    group.add_argument("--bn_per_replica", action="store_true", default=False,
                       help="Compute BatchNorm statistics per data-parallel "
                            "shard (the reference's per-tower BN under "
                            "multi_gpu_model) instead of the default "
                            "global-batch sync BN. See PARITY.md.")
    group.add_argument("--spatial", type=int, default=1,
                       help="Spatial partitioning factor: fold the --gpus "
                            "devices into a (data, spatial) mesh and shard "
                            "the image HEIGHT axis across the spatial "
                            "columns (XLA inserts the conv halo exchanges). "
                            "Scales a single large-image batch across chips "
                            "- for the 448px fine-tune recipes whose "
                            "per-chip-optimal batch is small. Must divide "
                            "--gpus.")


def schedule_args_from(args):
    return {
        name: value
        for name, value in vars(args).items()
        if value is not None
    }


def load_class_embedding(path_or_onehot):
    """Loads an embedding pickle, or None for 'onehot'
    (``learn_image_embeddings.py:104-117``)."""
    if path_or_onehot == "onehot":
        return None, None
    with open(path_or_onehot, "rb") as f:
        dump = pickle.load(f)
    return dump["ind2label"], np.asarray(dump["embedding"], dtype=np.float32)


def str2bool(v):
    """The reference's flexible boolean flag parser (used by --norm)."""
    if isinstance(v, bool):
        return v
    if v.lower() in ("yes", "true", "t", "y", "1"):
        return True
    if v.lower() in ("no", "false", "f", "n", "0"):
        return False
    import argparse

    raise argparse.ArgumentTypeError("Boolean value expected.")


def check_mesh_batch(mesh, *batch_sizes):
    """Batch axes must divide the mesh: jnp sharding raises a cryptic
    error deep inside the first step otherwise (the default batch size 100
    does not divide an 8-chip mesh)."""
    if mesh is None:
        return
    # only the DATA axis splits the batch; spatial columns split the image
    n = dict(mesh.shape).get("data", mesh.devices.size)
    for b in batch_sizes:
        if b and b % n:
            raise SystemExit(
                f"batch size {b} is not divisible by the {n}-way data axis "
                f"of the device mesh; choose a multiple of {n}."
            )


def check_label_range(dataset, n_rows, what="embedding"):
    """Dataset labels index the embedding/one-hot tables inside jit, and
    jnp gathers CLAMP out of range — training would silently regress every
    out-of-range class onto the last table row (the reference's numpy
    gather raises).  Validate on host up front."""
    import numpy as np

    mx = int(max(np.max(dataset.labels_train), np.max(dataset.labels_test)))
    if mx >= n_rows:
        raise SystemExit(
            f"Dataset labels go up to {mx} but the {what} has only "
            f"{n_rows} rows; pass an embedding matching the dataset's "
            "class enumeration (e.g. the right class subset)."
        )


def resolve_mesh(gpus, bn_per_replica=False, spatial=1):
    """Maps the reference's --gpus flag onto the data-parallel mesh.  Uses
    all visible devices when they divide evenly; 1 device otherwise.

    ``spatial`` folds the devices into a 2-D (data, spatial) mesh for
    spatially-partitioned training (see parallel.get_mesh).

    ``bn_per_replica`` switches BatchNorm to per-shard statistics (the
    reference's per-tower BN) — must be set before the steps are traced,
    which is why it rides along here."""
    n = max(1, int(gpus))
    spatial = max(1, int(spatial))
    avail = len(jax.devices())
    if n > avail:
        print(f"Requested {n} devices but only {avail} present; using {avail}.")
        n = avail
    if n % spatial:
        raise SystemExit(
            f"--spatial {spatial} must divide the device count ({n}).")
    if bn_per_replica:
        from ..models.layers import set_default_bn_groups

        # per-tower = per DATA shard; spatial columns jointly compute one
        # tower's statistics (they hold slices of the same images).
        set_default_bn_groups(n // spatial)
        if n // spatial > 1:
            print(f"BatchNorm: per-replica statistics over {n // spatial} shards")
    elif n // spatial > 1:
        # The reference's multi_gpu_model computes BN statistics per tower;
        # our default is global-batch sync BN (usually better, but different
        # semantics at small per-shard batches — measured in
        # tests/test_bn_modes.py).  Say so whenever a multi-GPU recipe is
        # reproduced without opting in, so the divergence is a decision.
        print(
            f"NOTE: --gpus {n} uses global-batch (sync) BatchNorm statistics; "
            "the reference's multi_gpu_model computes them per tower. Pass "
            "--bn_per_replica to reproduce published multi-GPU recipes "
            "exactly (see PARITY.md / RECIPES.md)."
        )
    return get_mesh(n, spatial=spatial) if n > 1 else None


def build_embedding_model(embed_dim, architecture, loss, cls_classes, dtype=None,
                          remat=False, cls_input="output", cls_base=None):
    """Backbone + output transform + optional cls head
    (``learn_image_embeddings.py:125-148``)."""
    spec = build_network(embed_dim, architecture, dtype=dtype, remat=remat)
    model = EmbeddingModel(
        backbone=spec.module,
        output=LOSS_OUTPUT[loss],
        cls_classes=cls_classes,
        cls_input=cls_input,
        cls_base=cls_base,
        dtype=dtype,
    )
    return model, spec


def print_model_summary(state, architecture):
    """Parameter-count summary (the reference prints model.summary() when
    progress display is on, ``learn_image_embeddings.py:157-158``)."""
    import jax

    leaves = jax.tree_util.tree_leaves(state.params)
    n_params = sum(int(np.prod(l.shape)) for l in leaves)
    n_stats = sum(
        int(np.prod(l.shape))
        for l in jax.tree_util.tree_leaves(state.batch_stats)
    )
    print(
        f"Model: {architecture} — {n_params:,} trainable parameters in "
        f"{len(leaves)} tensors (+{n_stats:,} batch-norm statistics)"
    )


def init_model_state(model, input_size, channels, seed=0):
    variables = jax.jit(
        lambda k: model.init(
            k, jnp.zeros((1, input_size, input_size, channels)), train=False
        )
    )(jax.random.PRNGKey(seed))
    return new_train_state(variables)


def apply_pipeline_args(dataset, args):
    """Wires ``--read_workers`` / ``--queue_size`` onto file datasets.

    Mirrors the reference's ``fit_generator(..., workers=N,
    max_queue_size=Q)`` knobs (``learn_image_embeddings.py:84-85,238-243``):
    ``queue_size`` counts BATCHES, exactly like Keras's max_queue_size."""
    if hasattr(dataset, "read_workers"):
        dataset.read_workers = getattr(args, "read_workers",
                                       dataset.read_workers)
        dataset.queue_size = getattr(args, "queue_size", dataset.queue_size)
    return dataset


def extract_test_features(model, state, dataset, batch_size=100, pick=None):
    """Predicts the model output for every test image, in dataset order.

    Equivalent of ``par_model.predict_generator(flow_test(1, False))``
    (``learn_image_embeddings.py:271``) as masked fixed-size batches.
    """
    prepare = dataset.make_prepare()

    @jax.jit
    def forward(state, raw):
        images, _ = prepare(raw, jax.random.PRNGKey(0), False)
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            images,
            train=False,
        )
        return out

    # Enqueue all batches, fetch once: per-batch np.asarray forces a
    # host<->device round trip per batch (expensive on a tunneled backend).
    pending, valids = [], []
    for raw in dataset.test_batches(batch_size):
        out = forward(state, raw)
        if pick is not None:
            out = out[pick]
        pending.append(out)
        valids.append(np.asarray(raw["valid"]) > 0)
    fetched = jax.device_get(pending)
    return np.concatenate([o[v] for o, v in zip(fetched, valids)])


def dump_artifacts(args, state, model, dataset, cls_weight=0.0, meta=None,
                   features=None):
    """--model_dump / --weight_dump / --feature_dump handling
    (``learn_image_embeddings.py:257-275``).  Model dumps carry the model
    configuration so evaluation CLIs can rebuild the module without flags.

    ``features``: already-extracted test features to dump (skips the
    extra forward pass when the caller computed them anyway)."""
    from ..train.state import save_checkpoint, save_weights

    metadata = {"architecture": getattr(args, "architecture", None)}
    if meta:
        metadata.update(meta)

    if getattr(args, "weight_dump", None):
        try:
            save_weights(args.weight_dump, state.params)
        except Exception as e:  # noqa: BLE001 - parity with reference
            print(f"An error occurred while saving the model weights: {e}")
    if getattr(args, "model_dump", None):
        try:
            save_checkpoint(args.model_dump, state, metadata)
        except Exception as e:  # noqa: BLE001
            print(f"An error occurred while saving the model: {e}")
    if getattr(args, "feature_dump", None):
        feats = features if features is not None else extract_test_features(
            model, state, dataset,
            batch_size=getattr(args, "val_batch_size", 100) or 100,
            pick=0 if cls_weight > 0 else None,
        )
        save_features(args.feature_dump, feats)


def resolve_tap(taps, layer):
    """Finds the named feature tap in an intermediates tree; raises with
    the available names otherwise.  Shared by feature extraction and the
    serving export so both resolve taps identically."""
    import jax

    flat = jax.tree_util.tree_flatten_with_path(taps)[0]
    for path, leaf in flat:
        names = [str(getattr(p, "key", getattr(p, "name", p))) for p in path]
        if layer in names:
            return leaf
    available = sorted(
        {n for path, _ in flat
         for n in (str(getattr(p, "key", getattr(p, "name", p)))
                   for p in path)
         if not n.isdigit()}
    )
    raise ValueError(f"No feature tap named {layer!r}; available: {available}")


def extract_by_tap(model, variables, prepare, batches, layer=None,
                   train_branch=False, pick=None, seed=0):
    """Extracts features at a named tap (avg_pool / embedding / l2norm /
    prob / softmax) — the TPU equivalent of the reference's ``--layer``
    sub-model extraction (``evaluate_classification_accuracy.py:27``).

    With ``layer=None`` the model's final output is used (``pick`` selects a
    tuple element for multi-output models).  With ``train_branch=True`` the
    augmentation RNG advances per batch, so repeated passes over the data
    (``--augmentation_epochs``) see fresh augmentations like the
    reference's generator does — a fixed key would silently produce
    identical copies of every feature row.
    """
    import jax

    @jax.jit
    def forward(variables, raw, key):
        images, _ = prepare(raw, key, train_branch)
        out, inter = model.apply(
            variables, images, train=False, mutable=["intermediates"]
        )
        return out, inter.get("intermediates", {})

    base_key = jax.random.PRNGKey(seed)
    chunks = []
    for i, raw in enumerate(batches):
        out, taps = forward(variables, raw, jax.random.fold_in(base_key, i))
        if layer is None:
            if isinstance(out, tuple):
                # Multi-output model (embedding, prob): default to the
                # embedding output — callers that want the softmax pass
                # pick=1 or layer='prob'.
                feats = out[0 if pick is None else pick]
            else:
                feats = out
        else:
            feats = resolve_tap(taps, layer)
        valid = np.asarray(raw["valid"]) > 0 if "valid" in raw else None
        chunks.append((feats, valid))  # device array; fetched in one go
    fetched = jax.device_get([f for f, _ in chunks])
    return np.concatenate([
        f[v] if v is not None else f
        for f, (_, v) in zip(fetched, chunks)
    ])


def rebuild_model_from_checkpoint(path, architecture=None, dtype=None):
    """Loads a model dump and reconstructs the module from its metadata.

    ``dtype``: compute dtype for the rebuilt module (e.g. ``jnp.bfloat16``
    for MXU-rate inference; params/stats stay f32 as stored).
    Returns ``(model, variables, metadata)``.
    """
    from ..train.state import load_checkpoint_raw

    variables, meta = load_checkpoint_raw(path)
    arch = meta.get("architecture") or architecture
    if arch is None:
        raise ValueError(
            f"Checkpoint {path} has no architecture metadata; pass "
            "--architecture."
        )
    params = variables["params"]
    if "backbone" in params:
        if "loss" not in meta:
            import warnings

            warnings.warn(
                f"Checkpoint {path} lacks 'loss' metadata; assuming "
                "'inv_corr' (l2norm output). Features from a model trained "
                "with mse/unnorm_corr/center-loss would be silently "
                "L2-normalized — re-dump with current learners, which "
                "record the loss.", RuntimeWarning,
            )
        embed_dim = meta.get("embed_dim")
        if embed_dim is None:
            top = params["backbone"].get("top", {})
            embed_dim = (
                int(np.asarray(top["kernel"]).shape[-1]) if top else 0
            )
        cls_classes = meta.get("cls_classes", 0)
        if not cls_classes and "cls_top" in params:
            cls_classes = int(np.asarray(params["cls_top"]["kernel"]).shape[-1])
        model, _ = build_embedding_model(
            embed_dim, arch, meta.get("loss", "inv_corr"), cls_classes,
            cls_base=meta.get("cls_base"), dtype=dtype,
        )
    else:
        spec = build_network(
            _classifier_outputs(params), arch, classification=True,
            dtype=dtype,
        )
        model = spec.module
    return model, variables, meta


def _classifier_outputs(params):
    top = params.get("top")
    if top is not None:
        return int(np.asarray(top["kernel"]).shape[-1])
    raise ValueError("Cannot infer the classifier output width from params.")


class MetricsLogger:
    """Per-epoch metrics log for ``--log_dir``
    (``learn_image_embeddings.py:212-215``): TensorBoard scalar event files
    like the reference's ``keras.callbacks.TensorBoard``, plus a
    ``metrics.jsonl`` for grep-ability.  The directory is recreated like
    the reference wipes its log dir.  TensorBoard output degrades
    gracefully to JSONL-only if tensorflow isn't importable."""

    def __init__(self, log_dir):
        import shutil

        if os.path.isdir(log_dir):
            shutil.rmtree(log_dir, ignore_errors=True)
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, "metrics.jsonl")
        self._tb = None
        try:
            import tensorflow as tf

            self._tb = tf.summary.create_file_writer(log_dir)
        except Exception:
            pass

    def __call__(self, epoch, metrics):
        vals = {k: float(v) for k, v in metrics.items()}
        with open(self.path, "a") as f:
            f.write(json.dumps({"epoch": epoch, **vals}) + "\n")
        if self._tb is not None:
            import tensorflow as tf

            with self._tb.as_default(step=epoch):
                for k, v in vals.items():
                    tf.summary.scalar(f"epoch_{k}", v)
            self._tb.flush()
