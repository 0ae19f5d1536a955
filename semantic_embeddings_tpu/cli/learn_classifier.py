"""CLI: plain softmax classifier baseline (+ label smoothing).

Flag surface mirrors ``/root/reference/learn_classifier.py:26-60``.
"""

from __future__ import annotations

import argparse
import os
from collections import OrderedDict

import jax
import numpy as np

from ..data import get_data_generator
from ..models import ARCHITECTURES, build_network
from ..train import (
    fit,
    get_lr_schedule,
    load_checkpoint,
    load_weights_by_name,
    make_classifier_eval_step,
    make_classifier_train_step,
    run_validation,
)
from ..train.metrics import balanced_accuracy
from ..train.optimizer import decay_from_max_decay
from ..train.schedules import LR_SCHEDULES, PiecewiseSchedule
from . import common


def build_parser():
    parser = argparse.ArgumentParser(
        description="Learns an image classifier.",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    group = parser.add_argument_group("Data parameters")
    group.add_argument("--dataset", type=str, required=True)
    group.add_argument("--data_root", type=str, required=True)
    group.add_argument("--class_list", type=str, default=None,
                       help="Path to a file containing the IDs of the subset "
                            "of classes to be used (as first words per line).")
    group = parser.add_argument_group("Training parameters")
    group.add_argument("--architecture", type=str, default="simple",
                       choices=ARCHITECTURES)
    group.add_argument("--label_smoothing", type=float, default=0.0,
                       help="Smooth the target distribution by subtracting "
                            "this value from the target probability of the "
                            "ground-truth class.")
    group.add_argument("--lr_schedule", type=str, default="SGDR",
                       choices=LR_SCHEDULES)
    group.add_argument("--clipgrad", type=float, default=10.0)
    group.add_argument("--max_decay", type=float, default=0.0)
    group.add_argument("--nesterov", action="store_true", default=False)
    group.add_argument("--bf16", action="store_true", default=False,
                       help="bfloat16 compute (float32 params).")
    group.add_argument("--epochs", type=int, default=None)
    group.add_argument("--batch_size", type=int, default=100)
    group.add_argument("--seed", type=int, default=0,
                       help="PRNG seed (init, shuffling, augmentation).")
    group.add_argument("--val_batch_size", type=int, default=None)
    group.add_argument("--snapshot", type=str, default=None)
    group.add_argument("--snapshot_best", type=str, nargs="?", default=None,
                       const="val_loss")
    group.add_argument("--initial_epoch", type=int, default=0)
    group.add_argument("--finetune", type=str, default=None)
    group.add_argument("--finetune_init", type=int, default=3)
    common.add_common_train_arguments(group)
    group = parser.add_argument_group("Output parameters")
    group.add_argument("--model_dump", type=str, default=None)
    group.add_argument("--weight_dump", type=str, default=None)
    group.add_argument("--feature_dump", type=str, default=None)
    group.add_argument("--log_dir", type=str, default=None)
    group.add_argument("--top_k_acc", type=int, nargs="+", default=[])
    group.add_argument("--no_progress", action="store_true", default=False)
    common.add_lr_schedule_arguments(parser)
    return parser


def read_class_list(path):
    """First word per line; numeric if possible (``learn_classifier.py:71-77``)."""
    with open(path) as f:
        class_list = list(
            OrderedDict(
                (line.strip().split()[0], None) for line in f if line.strip()
            ).keys()
        )
    try:
        return [int(c) for c in class_list]
    except ValueError:
        return class_list


def main(argv=None):
    args = build_parser().parse_args(argv)
    common.ensure_compile_cache()
    if args.val_batch_size is None:
        args.val_batch_size = args.batch_size

    class_list = read_class_list(args.class_list) if args.class_list else None
    dataset = get_data_generator(args.dataset, args.data_root, classes=class_list)
    common.apply_pipeline_args(dataset, args)

    mesh = common.resolve_mesh(
        args.gpus, bn_per_replica=getattr(args, "bn_per_replica", False),
        spatial=getattr(args, "spatial", 1))
    common.check_mesh_batch(mesh, args.batch_size, args.val_batch_size)
    common.check_label_range(dataset, dataset.num_classes, what="classifier")
    import jax.numpy as jnp

    spec = build_network(
        dataset.num_classes, args.architecture, classification=True,
        dtype=jnp.bfloat16 if args.bf16 else None,
    )
    model = spec.module

    state = common.init_model_state(model, spec.input_size,
                                    dataset.num_channels, seed=args.seed)
    if args.snapshot and os.path.exists(args.snapshot):
        print(f"Resuming from snapshot {args.snapshot}")
        state, _ = load_checkpoint(args.snapshot, state)
    if not args.no_progress:
        common.print_model_summary(state, args.architecture)

    prepare = dataset.make_prepare()
    step_kwargs = dict(
        num_classes=dataset.num_classes,
        label_smoothing=args.label_smoothing,
        l2_penalty_fn=spec.l2_penalty,
        nesterov=args.nesterov,
        clipnorm=args.clipgrad,
        mesh=mesh,
    )
    eval_step = make_classifier_eval_step(
        model, prepare, num_classes=dataset.num_classes,
        label_smoothing=args.label_smoothing, mesh=mesh,
        l2_penalty_fn=spec.l2_penalty,
    )

    if args.finetune:
        print(f"Loading pre-trained weights from {args.finetune}")
        state = state.replace(
            params=load_weights_by_name(args.finetune, state.params)
        )
        if args.finetune_init > 0:
            print("Pre-training last layer")
            warm = make_classifier_train_step(
                model, prepare, trainable_fn=lambda p: "top" in p, **step_kwargs
            )
            # Reference warm-up: fresh SGD at a CONSTANT sgd_lr with no
            # schedule callbacks.
            warm_sched = PiecewiseSchedule([(0, args.sgd_lr)])
            state = fit(
                state, warm, eval_step, dataset, warm_sched,
                epochs=args.finetune_init, batch_size=args.batch_size,
                val_batch_size=args.val_batch_size, seed=args.seed,
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
    train_step = make_classifier_train_step(model, prepare, donate=True,
                                            **step_kwargs)
    log_fn = common.MetricsLogger(args.log_dir) if args.log_dir else None

    state = fit(
        state, train_step, eval_step, dataset, schedule,
        epochs=epochs, batch_size=args.batch_size,
        val_batch_size=args.val_batch_size,
        initial_epoch=args.initial_epoch, decay=decay, seed=args.seed,
        snapshot=args.snapshot, snapshot_best=args.snapshot_best,
        verbose=not args.no_progress, mesh=mesh, log_fn=log_fn,
    )

    final_batches = dataset.test_batches(args.val_batch_size)
    if mesh is not None:
        # Shard like fit()'s per-epoch validation: the same jitted program
        # (no recompile) and no N-times redundant replicated evaluation.
        from ..parallel import shard_batch

        final_batches = (shard_batch(mesh, raw) for raw in final_batches)
    final = run_validation(
        eval_step, state, final_batches, jax.random.PRNGKey(0),
    )
    preds = final.pop("predictions", None)
    print({k: round(float(v), 6) for k, v in final.items()})
    if preds is not None:
        avg = balanced_accuracy(
            preds[: dataset.num_test], np.asarray(dataset.labels_test),
            dataset.num_classes,
        )
        print(f"Average Accuracy: {avg:.4f}")

    # Feature dump: penultimate features = the avg_pool tap
    # (learn_classifier.py:178-182 takes the pre-softmax layer's input).
    if args.feature_dump:
        feats = common.extract_by_tap(
            model, {"params": state.params, "batch_stats": state.batch_stats},
            prepare, dataset.test_batches(args.val_batch_size),
            layer="avg_pool",
        )
        from ..embeddings import save_features

        save_features(args.feature_dump, feats)
        args.feature_dump = None  # already dumped the custom features

    common.dump_artifacts(args, state, model, dataset)
    return state


if __name__ == "__main__":
    main()
