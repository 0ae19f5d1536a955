"""Every CLI's argparse surface stays constructable and documented."""

import pytest

SURFACES = [
    ("compute_class_embedding", ["--hierarchy", "--out", "--method",
                                 "--num_dim", "--norm", "--is_a", "--str_ids",
                                 "--class_list"]),
    ("learn_image_embeddings", ["--dataset", "--data_root", "--embedding",
                                "--architecture", "--loss", "--cls_weight",
                                "--cls_base", "--lr_schedule", "--clipgrad",
                                "--max_decay", "--nesterov", "--epochs",
                                "--batch_size", "--val_batch_size",
                                "--snapshot", "--snapshot_best",
                                "--initial_epoch", "--finetune",
                                "--finetune_init", "--gpus", "--read_workers",
                                "--queue_size", "--gpu_merge", "--model_dump",
                                "--weight_dump", "--feature_dump", "--log_dir",
                                "--no_progress", "--top_k_acc", "--sgd_lr",
                                "--sgdr_base_len", "--sgdr_mul",
                                "--sgdr_max_lr", "--clr_step_len",
                                "--clr_min_lr", "--clr_max_lr",
                                "--sgd_patience", "--sgd_min_lr",
                                "--sgd_schedule"]),
    ("learn_classifier", ["--dataset", "--data_root", "--class_list",
                          "--label_smoothing", "--architecture"]),
    ("learn_devise", ["--embedding", "--init_weights", "--init_epochs",
                      "--ft_epochs", "--init_lr", "--ft_lr", "--margin"]),
    ("learn_labelembedding", ["--embed_dim", "--tau", "--alpha", "--beta"]),
    ("learn_center_loss", ["--embed_dim", "--centroids",
                           "--center_loss_weight"]),
    ("evaluate_retrieval", ["--hierarchy", "--feat", "--label", "--norm",
                            "--plot_max", "--prec_type", "--clip_ahp",
                            "--csv", "--no_ap"]),
    ("evaluate_classification_accuracy", ["--hierarchy", "--classes_from",
                                          "--augmentation_epochs", "--C",
                                          "--model", "--layer",
                                          "--prob_features", "--centroids"]),
    ("plot_recall_precision", ["--feat", "--bins"]),
    ("plot_hierarchy", ["--hierarchy", "--class_names", "--out"]),
    ("encode_hierarchy", ["--format", "--meta_file", "--one_based"]),
    ("import_keras_weights", ["--h5", "--architecture", "--embed_dim",
                              "--out"]),
    ("export_model", ["--checkpoint", "--architecture", "--out", "--layer",
                      "--input_size", "--input_channels", "--batch",
                      "--platforms", "--validate", "--bf16"]),
    ("serve_model", ["--artifact", "--checkpoint", "--layer", "--bf16",
                     "--host", "--port", "--max_batch", "--batch_timeout_ms",
                     "--gpus", "--max_queue", "--dataset", "--mean", "--std",
                     "--target_size"]),
]


@pytest.mark.parametrize("module,flags", SURFACES,
                         ids=[name for name, _ in SURFACES])
def test_cli_flags_present(module, flags):
    """The reference's flag names are part of the public API
    (BASELINE.json); losing one is a regression."""
    import importlib

    mod = importlib.import_module(f"semantic_embeddings_tpu.cli.{module}")
    parser = mod.build_parser()
    known = set()
    for action in parser._actions:
        known.update(action.option_strings)
    missing = [f for f in flags if f not in known]
    assert not missing, f"{module} lost flags: {missing}"
    # --help renders without crashing
    helptext = parser.format_help()
    assert len(helptext) > 100


def test_metrics_logger_writes_tensorboard_events(tmp_path):
    """--log_dir parity: TensorBoard scalar event files + JSONL."""
    import glob

    pytest.importorskip("tensorflow")
    from semantic_embeddings_tpu.cli.common import MetricsLogger

    log = MetricsLogger(str(tmp_path / "logs"))
    log(0, {"loss": 1.5})
    assert glob.glob(str(tmp_path / "logs" / "events.out.tfevents.*"))
    assert (tmp_path / "logs" / "metrics.jsonl").exists()
