"""CLI: label-embedding network baseline (Sun et al.).

Flag surface mirrors ``/root/reference/learn_labelembedding.py:65-99``.
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from ..data import get_data_generator
from ..models import ARCHITECTURES, build_network
from ..models.learners import LabelEmbedModel
from ..train import (
    fit,
    get_lr_schedule,
    load_weights_by_name,
    new_train_state,
    run_validation,
)
from ..train.metrics import balanced_accuracy
from ..train.optimizer import decay_from_max_decay
from ..train.schedules import LR_SCHEDULES, PiecewiseSchedule
from ..train.special import (
    make_labelembed_eval_step,
    make_labelembed_train_step,
)
from .learn_classifier import read_class_list
from . import common


def build_parser():
    parser = argparse.ArgumentParser(
        description="Trains a label embedding network (Sun et al.).",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    group = parser.add_argument_group("Data parameters")
    group.add_argument("--dataset", type=str, required=True)
    group.add_argument("--data_root", type=str, required=True)
    group.add_argument("--class_list", type=str, default=None)
    group = parser.add_argument_group("Label embedding parameters")
    group.add_argument("--embed_dim", type=int, default=100,
                       help="Embedding dimensionality.")
    group.add_argument("--tau", type=float, default=2.0,
                       help="Softmax temperature.")
    group.add_argument("--alpha", type=float, default=0.9)
    group.add_argument("--beta", type=float, default=0.5)
    group = parser.add_argument_group("Training parameters")
    group.add_argument("--architecture", type=str, default="simple",
                       choices=ARCHITECTURES)
    group.add_argument("--lr_schedule", type=str, default="SGDR",
                       choices=LR_SCHEDULES)
    group.add_argument("--clipgrad", type=float, default=10.0)
    group.add_argument("--max_decay", type=float, default=0.0)
    group.add_argument("--nesterov", action="store_true", default=False)
    group.add_argument("--epochs", type=int, default=None)
    group.add_argument("--batch_size", type=int, default=100)
    group.add_argument("--val_batch_size", type=int, default=None)
    group.add_argument("--finetune", type=str, default=None)
    group.add_argument("--finetune_init", type=int, default=3)
    common.add_common_train_arguments(group)
    group = parser.add_argument_group("Output parameters")
    group.add_argument("--model_dump", type=str, default=None)
    group.add_argument("--weight_dump", type=str, default=None)
    group.add_argument("--feature_dump", type=str, default=None)
    group.add_argument("--log_dir", type=str, default=None)
    group.add_argument("--no_progress", action="store_true", default=False)
    common.add_lr_schedule_arguments(parser)
    return parser


def main(argv=None):
    args = build_parser().parse_args(argv)
    common.ensure_compile_cache()
    if args.val_batch_size is None:
        args.val_batch_size = args.batch_size

    class_list = read_class_list(args.class_list) if args.class_list else None
    dataset = get_data_generator(args.dataset, args.data_root, classes=class_list)
    common.apply_pipeline_args(dataset, args)
    mesh = common.resolve_mesh(
        args.gpus, bn_per_replica=getattr(args, "bn_per_replica", False))
    common.check_mesh_batch(mesh, args.batch_size, args.val_batch_size)
    common.check_label_range(dataset, dataset.num_classes,
                             what="label-embedding table")

    spec = build_network(args.embed_dim, args.architecture)
    model = LabelEmbedModel(
        backbone=spec.module, num_classes=dataset.num_classes
    )
    variables = jax.jit(
        lambda k: model.init(
            k,
            jnp.zeros((1, spec.input_size, spec.input_size,
                       dataset.num_channels)),
            jnp.zeros((1,), jnp.int32),
            train=False,
        )
    )(jax.random.PRNGKey(0))
    state = new_train_state(variables)

    prepare = dataset.make_prepare()
    # Keras kernel regularization: the reference backbone carries per-arch
    # l2 regularizers (utils.build_network); the learner's added heads
    # (prob/out2/label embeddings) are unregularized there — scope the
    # penalty to the backbone subtree.
    loss_kw = dict(tau=args.tau, alpha=args.alpha, beta=args.beta,
                   l2_penalty_fn=lambda p: spec.l2_penalty(p["backbone"]))
    eval_step = make_labelembed_eval_step(model, prepare, **loss_kw)

    if args.finetune:
        print(f"Loading pre-trained weights from {args.finetune}")
        state = state.replace(
            params=load_weights_by_name(args.finetune, state.params)
        )
        if args.finetune_init > 0:
            print("Pre-training new layers")
            heads = ("top", "embedding_bn", "prob_head", "out2",
                     "labelembeddings")
            warm = make_labelembed_train_step(
                model, prepare, **loss_kw,
                nesterov=args.nesterov, clipnorm=args.clipgrad,
                trainable_fn=lambda p: any(h in p for h in heads),
            )
            # Reference warm-up: fresh SGD at a CONSTANT sgd_lr with no
            # schedule callbacks.
            warm_sched = PiecewiseSchedule([(0, args.sgd_lr)])
            state = fit(
                state, warm, eval_step, dataset, warm_sched,
                epochs=args.finetune_init, batch_size=args.batch_size,
                val_batch_size=args.val_batch_size,
                verbose=not args.no_progress, mesh=mesh,
            )
            # Reference re-compiles a fresh SGD for full training: zero
            # momentum velocity, optimizer iterations restart at 0.
            from ..train.optimizer import init_velocity

            state = state.replace(
                epoch=0, step=0, velocity=init_velocity(state.params))
            print("Full model training")

    schedule, num_epochs = get_lr_schedule(
        args.lr_schedule, dataset.num_train, args.batch_size,
        common.schedule_args_from(args),
    )
    epochs = args.epochs if args.epochs else num_epochs
    decay = decay_from_max_decay(
        args.max_decay, dataset.num_train // args.batch_size, epochs
    )
    train_step = make_labelembed_train_step(
        model, prepare, **loss_kw, nesterov=args.nesterov,
        clipnorm=args.clipgrad, donate=True,
    )
    log_fn = common.MetricsLogger(args.log_dir) if args.log_dir else None
    state = fit(
        state, train_step, eval_step, dataset, schedule,
        epochs=epochs, batch_size=args.batch_size,
        val_batch_size=args.val_batch_size, decay=decay,
        verbose=not args.no_progress, log_fn=log_fn, mesh=mesh,
    )

    final_batches = dataset.test_batches(args.val_batch_size)
    if mesh is not None:
        from ..parallel import shard_batch

        final_batches = (shard_batch(mesh, raw) for raw in final_batches)
    final = run_validation(
        eval_step, state, final_batches, jax.random.PRNGKey(0),
    )
    preds = final.pop("predictions", None)
    print({k: round(float(v), 6) for k, v in final.items()})
    if preds is not None:
        y = np.asarray(dataset.labels_test)
        preds = preds[: dataset.num_test]
        print(f"Accuracy: {np.mean(preds == y):.4f}")
        print(
            f"Average Accuracy: "
            f"{balanced_accuracy(preds, y, dataset.num_classes):.4f}"
        )

    if args.feature_dump:
        feats = _extract_embeddings(model, state, dataset, args.val_batch_size)
        from ..embeddings import save_features

        save_features(args.feature_dump, feats)
        args.feature_dump = None  # already dumped the custom features
    common.dump_artifacts(args, state, model, dataset)
    return state


def _extract_embeddings(model, state, dataset, batch_size):
    prepare = dataset.make_prepare()

    @jax.jit
    def forward(state, raw):
        images, labels = prepare(raw, jax.random.PRNGKey(0), False)
        emb, *_ = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            images, labels, train=False,
        )
        return emb

    # Enqueue all batches, fetch once: a per-batch np.asarray would pay a
    # host<->device round trip per batch (see common.extract_test_features).
    pending, valids = [], []
    for raw in dataset.test_batches(batch_size):
        pending.append(forward(state, raw))
        valids.append(np.asarray(raw["valid"]) > 0)
    fetched = jax.device_get(pending)
    return np.concatenate([e[v] for e, v in zip(fetched, valids)])


if __name__ == "__main__":
    main()
