"""The jitted training engine: step builders + the epoch-driving fit loop.

TPU-first counterpart of the reference's ``model.compile`` +
``fit_generator`` flow (``/root/reference/learn_image_embeddings.py:
228-243``):

- ONE jitted train step fuses on-device augmentation (provided by the
  dataset as a ``prepare``-inside-jit function), the forward pass, the loss
  (including Keras-style L2 kernel regularization), the backward pass and
  the Keras-exact SGD update.  Nothing but a batch of indices / raw pixels
  and a scalar learning rate crosses the host->device boundary per step.
- The learning rate is a traced scalar argument, so epoch-level schedule
  logic (SGDR restarts, plateau drops, CLR per-batch cycling) never causes
  recompilation.
- Under a multi-chip mesh the batch is sharded on the ``data`` axis and the
  parameters replicated; XLA inserts the gradient all-reduce over ICI.
  BatchNorm reductions see the global batch (sync-BN semantics).
"""

from __future__ import annotations

import time
import warnings
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..parallel import constrain_spatial, replicate, shard_batch
from . import losses as L
from .optimizer import sgd_update
from .state import TrainState

#: Device-side running sum for per-epoch metric averaging (fit()): one tiny
#: fixed-shape jitted dispatch per step, accumulator buffers donated.
_tree_add = jax.jit(
    lambda acc, new: jax.tree_util.tree_map(jnp.add, acc, new),
    donate_argnums=(0,),
)

EMB_LOSSES = {
    "mse": L.squared_distance,
    "inv_corr": L.inv_correlation,
    "unnorm_corr": L.inv_correlation,
    "softmax_corr": L.inv_correlation,
}

#: output transform the EmbeddingModel applies for each loss
#: (learn_image_embeddings.py:127-130)
LOSS_OUTPUT = {
    "mse": "linear",
    "inv_corr": "l2norm",
    "unnorm_corr": "linear",
    "softmax_corr": "softmax",
}


def finish_sgd_step(state, grads, new_bs, lr, *, momentum=0.9,
                    nesterov=False, clipnorm=10.0, trainable_fn=None):
    """Shared step tail: trainable-mask -> Keras-exact SGD -> new state.
    Used by every SGD-based step builder so fixes to the update sequence
    (donation, clipnorm, masking) apply everywhere at once."""
    if trainable_fn is not None:
        mask = _trainable_mask(state.params, trainable_fn)
        grads = jax.tree_util.tree_map(lambda g, m: g * m, grads, mask)
    new_params, new_vel = sgd_update(
        state.params, state.velocity, grads, lr,
        momentum=momentum, nesterov=nesterov, clipnorm=clipnorm,
    )
    return state.replace(
        params=new_params, velocity=new_vel, batch_stats=new_bs,
        step=state.step + 1,
    )


def _trainable_mask(params, trainable_fn):
    """Pytree of {0,1} masks from a path-predicate."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    leaves = []
    for path, leaf in flat:
        names = "/".join(
            str(getattr(p, "key", getattr(p, "name", p))) for p in path
        )
        leaves.append(
            jnp.ones_like(leaf) if trainable_fn(names) else jnp.zeros_like(leaf)
        )
    return jax.tree_util.tree_unflatten(treedef, leaves)


def make_train_step(
    model,
    prepare: Callable,
    *,
    loss_name: str = "inv_corr",
    class_embedding=None,
    cls_weight: float = 0.0,
    l2_penalty_fn: Callable | None = None,
    momentum: float = 0.9,
    nesterov: bool = False,
    clipnorm: float = 10.0,
    trainable_fn: Callable | None = None,
    metric_fn: Callable | None = None,
    mesh=None,
    donate: bool = False,
    loss_fn_override: Callable | None = None,
    optimizer: str = "sgd",
    num_classes: int | None = None,
    l2_coef_tree=None,
):
    """Builds the jitted train step.

    ``l2_coef_tree``: per-leaf L2 coefficients (see
    ``optimizer.l2_coef_tree``) applied as gradient terms instead of a
    loss-side penalty — mathematically identical, substantially faster on
    TPU (avoids per-kernel scalar reductions in the differentiated graph).
    Mutually exclusive with ``l2_penalty_fn``.

    ``prepare(raw_batch, rng, train)`` runs *inside* jit and must return
    ``(images, labels)``; ``class_embedding`` (n_classes, d) provides the
    per-sample regression targets via an on-device gather (the reference's
    host-side ``transform_inputs``, ``learn_image_embeddings.py:48-50``).

    ``loss_fn_override``: per-sample loss ``(targets, emb_out) -> (B,)``
    replacing the named loss (used by DeViSE's ranking loss).
    ``optimizer``: 'sgd' (Keras-exact) or 'adagrad' (DeViSE); the state's
    ``velocity`` tree doubles as the Adagrad accumulator.
    """
    if l2_penalty_fn is not None and l2_coef_tree is not None:
        raise ValueError(
            "Pass either l2_penalty_fn or l2_coef_tree, not both — "
            "together they would apply the regularization twice."
        )
    emb_loss = (
        loss_fn_override if loss_fn_override is not None
        else EMB_LOSSES[loss_name]
    )
    # Captured by the jitted step; ships with the remote-compile request
    # (biggest real case: iNat 8k x 1024 = 33 MB — fine; see the capture-size
    # note in data/cifar.py::make_prepare).
    class_embedding = (
        None
        if class_embedding is None
        else jnp.asarray(class_embedding, dtype=jnp.float32)
    )
    if num_classes is None:
        # classification-head width; the dataset's class count can be
        # smaller than the embedding table (e.g. class-subset training)
        num_classes = None if class_embedding is None else class_embedding.shape[0]

    def step(state: TrainState, raw_batch, lr, rng):
        images, labels = prepare(raw_batch, rng, True)
        images = constrain_spatial(mesh, images)
        targets = class_embedding[labels]
        onehot = (
            jax.nn.one_hot(labels, num_classes) if cls_weight > 0 else None
        )

        def loss_fn(params):
            out, mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                images,
                train=True,
                mutable=["batch_stats"],
                rngs={"dropout": rng},
            )
            metrics = {}
            if cls_weight > 0:
                emb_out, prob = out
                cls_l = L.categorical_crossentropy(onehot, prob).mean()
                metrics["cls_loss"] = cls_l
                metrics["cls_acc"] = (
                    (jnp.argmax(prob, -1) == labels).astype(jnp.float32).mean()
                )
            else:
                emb_out, prob, cls_l = out, None, 0.0
            e_l = emb_loss(targets, emb_out).mean()
            total = e_l + cls_weight * cls_l
            if l2_penalty_fn is not None:
                total = total + l2_penalty_fn(params)
            metrics["emb_loss"] = e_l
            metrics["loss"] = total
            if metric_fn is not None:
                if isinstance(metric_fn, dict):
                    for mname, fn in metric_fn.items():
                        metrics[mname] = fn(targets, emb_out).mean()
                else:
                    metrics["emb_acc"] = metric_fn(targets, emb_out).mean()
            return total, (mut["batch_stats"], metrics)

        grads, (new_bs, metrics) = jax.grad(loss_fn, has_aux=True)(state.params)
        if l2_coef_tree is not None:
            from .optimizer import apply_l2_grads

            grads = apply_l2_grads(state.params, grads, l2_coef_tree)
        if trainable_fn is not None:
            mask = _trainable_mask(state.params, trainable_fn)
            grads = jax.tree_util.tree_map(lambda g, m: g * m, grads, mask)
        if optimizer == "adagrad":
            from .optimizer import adagrad_update

            new_params, new_vel = adagrad_update(
                state.params, state.velocity, grads, lr
            )
        else:
            new_params, new_vel = sgd_update(
                state.params,
                state.velocity,
                grads,
                lr,
                momentum=momentum,
                nesterov=nesterov,
                clipnorm=clipnorm,
            )
        new_state = state.replace(
            params=new_params,
            velocity=new_vel,
            batch_stats=new_bs,
            step=state.step + 1,
        )
        return new_state, metrics

    kwargs = {}
    if donate:
        kwargs["donate_argnums"] = (0,)
    # Sharding propagates from the committed input arrays (state replicated,
    # batch sharded on the data axis by `shard_batch`); GSPMD inserts the
    # gradient all-reduce, so no explicit in/out_shardings are needed.
    return jax.jit(step, **kwargs)


def make_eval_step(
    model,
    prepare: Callable,
    *,
    loss_name: str = "inv_corr",
    class_embedding=None,
    cls_weight: float = 0.0,
    metric_fn: Callable | None = None,
    mesh=None,
    loss_fn_override: Callable | None = None,
    num_classes: int | None = None,
    l2_penalty_fn: Callable | None = None,
):
    """Validation step: running BN stats, no update; returns summed metrics
    and the batch size so ragged final batches average correctly."""
    emb_loss = (
        loss_fn_override if loss_fn_override is not None
        else EMB_LOSSES[loss_name]
    )
    class_embedding = (
        None
        if class_embedding is None
        else jnp.asarray(class_embedding, dtype=jnp.float32)
    )
    if num_classes is None:
        num_classes = None if class_embedding is None else class_embedding.shape[0]

    def step(state: TrainState, raw_batch, rng):
        images, labels = prepare(raw_batch, rng, False)
        images = constrain_spatial(mesh, images)
        # Optional validity mask: datasets pad the ragged final batch to keep
        # shapes static; padded rows carry valid=0 and don't affect metrics.
        valid = raw_batch.get("valid")
        mask = (
            jnp.ones(images.shape[0], jnp.float32)
            if valid is None
            else valid.astype(jnp.float32)
        )
        targets = class_embedding[labels]
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            images,
            train=False,
        )
        metrics = {}
        if cls_weight > 0:
            emb_out, prob = out
            onehot = jax.nn.one_hot(labels, num_classes)
            metrics["cls_loss"] = (
                L.categorical_crossentropy(onehot, prob) * mask
            ).sum()
            metrics["cls_correct"] = (
                (jnp.argmax(prob, -1) == labels).astype(jnp.float32) * mask
            ).sum()
            metrics["pred"] = jnp.argmax(prob, -1)
        else:
            emb_out = out
        metrics["emb_loss"] = (emb_loss(targets, emb_out) * mask).sum()
        # Monitored total: embedding loss + weighted CE, like the reference's
        # compiled multi-output val_loss (learn_image_embeddings.py:229-232).
        # Keras's evaluate ALSO folds model.losses (the L2 kernel penalty)
        # into val_loss, and --snapshot_best / plateau monitor that total —
        # add penalty * batch-count so the per-count mean gains it once.
        metrics["total_loss"] = metrics["emb_loss"] + cls_weight * metrics.get(
            "cls_loss", 0.0
        )
        if l2_penalty_fn is not None:
            metrics["total_loss"] = metrics["total_loss"] + (
                l2_penalty_fn(state.params) * mask.sum()
            )
        if metric_fn is not None:
            if isinstance(metric_fn, dict):
                for mname, fn in metric_fn.items():
                    metrics[f"{mname}_correct"] = (
                        fn(targets, emb_out) * mask
                    ).sum()
            else:
                metrics["emb_correct"] = (metric_fn(targets, emb_out) * mask).sum()
        metrics["count"] = mask.sum()
        return metrics

    return jax.jit(step)


def make_classifier_train_step(
    model,
    prepare: Callable,
    *,
    num_classes: int,
    label_smoothing: float = 0.0,
    l2_penalty_fn: Callable | None = None,
    momentum: float = 0.9,
    nesterov: bool = False,
    clipnorm: float = 10.0,
    trainable_fn: Callable | None = None,
    mesh=None,
    donate: bool = False,
):
    """Plain softmax-classifier training (``learn_classifier.py``): CE on the
    model's softmax output with optional label smoothing
    (``learn_classifier.py:17-22``)."""

    def step(state: TrainState, raw_batch, lr, rng):
        images, labels = prepare(raw_batch, rng, True)
        images = constrain_spatial(mesh, images)
        onehot = L.label_smoothing(
            jax.nn.one_hot(labels, num_classes), label_smoothing
        )

        def loss_fn(params):
            prob, mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                images,
                train=True,
                mutable=["batch_stats"],
                rngs={"dropout": rng},
            )
            ce = L.categorical_crossentropy(onehot, prob).mean()
            total = ce
            if l2_penalty_fn is not None:
                total = total + l2_penalty_fn(params)
            metrics = {
                "loss": total,
                "ce": ce,
                "acc": (jnp.argmax(prob, -1) == labels).astype(jnp.float32).mean(),
            }
            return total, (mut["batch_stats"], metrics)

        grads, (new_bs, metrics) = jax.grad(loss_fn, has_aux=True)(state.params)
        new_state = finish_sgd_step(
            state, grads, new_bs, lr, momentum=momentum, nesterov=nesterov,
            clipnorm=clipnorm, trainable_fn=trainable_fn,
        )
        return new_state, metrics

    kwargs = {"donate_argnums": (0,)} if donate else {}
    return jax.jit(step, **kwargs)


def make_classifier_eval_step(
    model,
    prepare: Callable,
    *,
    num_classes: int,
    label_smoothing: float = 0.0,
    mesh=None,
    l2_penalty_fn: Callable | None = None,
):
    def step(state: TrainState, raw_batch, rng):
        images, labels = prepare(raw_batch, rng, False)
        images = constrain_spatial(mesh, images)
        valid = raw_batch.get("valid")
        mask = (
            jnp.ones(images.shape[0], jnp.float32)
            if valid is None
            else valid.astype(jnp.float32)
        )
        onehot = L.label_smoothing(
            jax.nn.one_hot(labels, num_classes), label_smoothing
        )
        prob = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            images,
            train=False,
        )
        out = {
            "emb_loss": (L.categorical_crossentropy(onehot, prob) * mask).sum(),
            "cls_correct": (
                (jnp.argmax(prob, -1) == labels).astype(jnp.float32) * mask
            ).sum(),
            "pred": jnp.argmax(prob, -1),
            "count": mask.sum(),
        }
        # Keras folds the L2 kernel penalty into val_loss; --snapshot_best /
        # plateau monitor that total (see make_eval_step above).
        if l2_penalty_fn is not None:
            out["total_loss"] = out["emb_loss"] + (
                l2_penalty_fn(state.params) * mask.sum()
            )
        return out

    return jax.jit(step)


def make_forward_fn(model, taps=False):
    """Inference forward over already-prepared (normalized) images; with
    ``taps=True`` also returns the intermediates tree (named feature taps:
    avg_pool / embedding / l2norm / prob).  Input preparation/sharding is
    the caller's job (see cli.common.extract_by_tap for the full path)."""

    def forward(state_params, batch_stats, images):
        variables = {"params": state_params, "batch_stats": batch_stats}
        if taps:
            out, inter = model.apply(
                variables, images, train=False, mutable=["intermediates"]
            )
            return out, inter["intermediates"]
        return model.apply(variables, images, train=False)

    return jax.jit(forward)


def run_validation(eval_step, state, batches, rng):
    """Drives the eval step over an iterator of raw batches.

    All batches are enqueued before anything is fetched: dispatch is
    async, so the device pipelines the steps and the host<->device round
    trip (expensive on a tunneled backend) is paid once, not per batch.
    """
    totals = {}
    preds = []
    pending = [eval_step(state, raw, rng) for raw in batches]
    for m in jax.device_get(pending):
        if "pred" in m:
            preds.append(m.pop("pred"))
        for k, v in m.items():
            totals[k] = totals.get(k, 0.0) + float(v)
    count = max(totals.pop("count", 1.0), 1.0)
    out = {}
    for k, v in totals.items():
        if k.endswith("_correct"):
            out[k.replace("_correct", "_acc")] = v / count
        else:
            out[k] = v / count
    out["val_loss"] = out.get("total_loss", out.get("emb_loss", 0.0))
    out.pop("total_loss", None)
    if preds:
        out["predictions"] = np.concatenate(preds)
    return out


def fit(
    state: TrainState,
    train_step,
    eval_step,
    dataset,
    schedule,
    *,
    epochs: int,
    batch_size: int,
    val_batch_size: int | None = None,
    initial_epoch: int = 0,
    decay: float = 0.0,
    seed: int = 0,
    snapshot: str | None = None,
    snapshot_best: str | None = None,
    verbose: bool = True,
    mesh=None,
    log_fn=None,
    profile_dir: str | None = None,
    profile_steps=(10, 30),
    snapshot_meta: dict | None = None,
):
    """Epoch loop with schedule driving, validation, and snapshotting.

    ``dataset`` must provide ``train_batches(batch_size, epoch, seed)`` and
    ``test_batches(batch_size)`` iterators of raw batches consumable by the
    jitted steps, plus ``steps_per_epoch(batch_size)``.
    """
    from .optimizer import effective_lr
    from .state import save_checkpoint

    val_batch_size = val_batch_size or batch_size
    if mesh is not None:
        state = replicate(mesh, state)
    # Keras ModelCheckpoint(mode='auto') semantics (the reference's
    # --snapshot_best path, utils.py:422-465 + keras callbacks): metrics
    # whose name contains 'acc' or starts with 'fmeasure' are maximized,
    # everything else (losses) minimized; a missing metric warns and skips.
    maximize = snapshot_best is not None and (
        "acc" in snapshot_best or snapshot_best.startswith("fmeasure")
    )
    best_metric = -np.inf if maximize else np.inf
    base_key = jax.random.PRNGKey(seed)
    steps_per_epoch = dataset.steps_per_epoch(batch_size)
    # Host-side mirror of state.step: reading the device scalar every batch
    # would force a sync and serialize dispatch against compute.
    global_step = int(state.step)
    start_step = global_step
    profiling = False

    for epoch in range(initial_epoch, epochs):
        t0 = time.time()
        epoch_lr = schedule.lr(epoch, global_step)
        n_batches = 0
        metric_sums = None
        for raw in dataset.train_batches(batch_size, epoch, seed):
            if schedule.per_batch:
                lr = schedule.lr(epoch, global_step)
            else:
                lr = epoch_lr
            lr = effective_lr(lr, decay, global_step)
            rng = jax.random.fold_in(base_key, global_step)
            if mesh is not None:
                raw = shard_batch(mesh, raw)
            if profile_dir is not None:
                # Device-level trace of a window of steady-state steps
                # (jax.profiler; view with tensorboard or xprof).  Window
                # offsets are relative to THIS run's first step, so
                # resuming from a snapshot past the window still profiles
                # (absolute step matching either crashed stop_trace on
                # resume or never started).
                done_steps = global_step - start_step
                if done_steps == profile_steps[0]:
                    jax.profiler.start_trace(profile_dir)
                    profiling = True
                elif profiling and done_steps >= profile_steps[1]:
                    jax.block_until_ready(state.params)
                    jax.profiler.stop_trace()
                    print(f"Wrote device trace to {profile_dir}", flush=True)
                    profile_dir = None
                    profiling = False
            state, metrics = train_step(state, raw, lr, rng)
            # Epoch-mean train metrics (Keras reports running epoch
            # averages, not the last batch).  Accumulated as a device-side
            # running sum via one small jitted add per step: never read per
            # step (a sync would serialize dispatch), fixed shapes (a
            # stack-at-epoch-end would compile an N-ary concat per distinct
            # epoch length), fetched once per epoch.
            metric_sums = (
                metrics if metric_sums is None
                else _tree_add(metric_sums, metrics)
            )
            global_step += 1
            n_batches += 1
        train_metrics = {
            k: float(v) / n_batches
            for k, v in jax.device_get(metric_sums).items()
        } if n_batches else {}

        val_batches = dataset.test_batches(val_batch_size)
        if mesh is not None:
            # Shard validation like training: otherwise every chip (and,
            # multi-host, every host) redundantly evaluates the full set.
            val_batches = (shard_batch(mesh, raw) for raw in val_batches)
        val_metrics = run_validation(eval_step, state, val_batches, base_key)
        val_metrics.pop("predictions", None)
        schedule.observe(val_metrics)
        state = state.replace(epoch=epoch + 1)

        if snapshot:
            if snapshot_best:
                monitored = val_metrics.get(snapshot_best)
                if monitored is None:
                    warnings.warn(
                        f"Can save best model only with {snapshot_best} "
                        f"available, skipping.", RuntimeWarning,
                    )
                elif (monitored > best_metric if maximize
                      else monitored < best_metric):
                    best_metric = monitored
                    save_checkpoint(
                        snapshot, state,
                        {"epoch": epoch + 1, **(snapshot_meta or {})})
            else:
                save_checkpoint(
                    snapshot, state,
                    {"epoch": epoch + 1, **(snapshot_meta or {})})

        if verbose:
            msg = " ".join(
                f"{k}={v:.4f}" for k, v in {**train_metrics, **val_metrics}.items()
            )
            print(
                f"epoch {epoch + 1}/{epochs} lr={epoch_lr:.5f} "
                f"[{time.time() - t0:.1f}s {steps_per_epoch} steps] {msg}",
                flush=True,
            )
        if log_fn is not None:
            log_fn(epoch, {**train_metrics, **val_metrics, "lr": epoch_lr})

    if profiling:
        # Runs shorter than the window still get their trace written.
        jax.block_until_ready(state.params)
        jax.profiler.stop_trace()
        print(f"Wrote device trace to {profile_dir}", flush=True)
    elif profile_dir is not None:
        # profile_dir was set but the run ended before reaching the window's
        # first step — say so instead of silently writing nothing.
        warnings.warn(
            f"--profile_dir was set but the run finished after "
            f"{global_step - start_step} steps, before the profile window "
            f"start (step {profile_steps[0]}); no trace was written. "
            f"Lower profile_steps or run more steps.",
            RuntimeWarning,
        )
    return state
