"""Fault injection: SIGKILL a real training run, prove the snapshot
survives and resumes (SURVEY §5.3 failure recovery).

The reference's only recovery story is Keras ModelCheckpoint files; here
the claim under test is stronger: ``save_checkpoint`` writes atomically
(tmp + ``os.replace``), so a process killed at ANY moment — including
mid-write — leaves either the previous or the new snapshot on disk, never
a torn file, and training resumes from it through the real CLI.
"""

import os
import signal
import subprocess
import sys
import time

import pytest

pytestmark = pytest.mark.slow

_WORKER = os.path.join(os.path.dirname(__file__), "_killresume_worker.py")


def test_sigkill_mid_training_snapshot_survives_and_resumes(tmp_path):
    snap = str(tmp_path / "snap.ckpt")
    epochs = 500  # far more than the kill window allows; never finishes

    env = dict(os.environ)
    # File, not PIPE: the CPU backend's AOT-loader warnings alone overflow
    # a 64 KB pipe with no reader and deadlock the worker.
    log_path = str(tmp_path / "worker.log")
    log = open(log_path, "wb")
    proc = subprocess.Popen(
        [sys.executable, _WORKER, snap, str(epochs)],
        stdout=log, stderr=subprocess.STDOUT, env=env,
    )
    try:
        # Wait for the first snapshot, then let a few more epochs write
        # over it so the kill lands at an arbitrary phase of the
        # write/replace cycle.
        deadline = time.time() + 600
        first_mtime = None
        rewrites = 0
        while time.time() < deadline and rewrites < 2:
            if proc.poll() is not None:
                out = open(log_path, "rb").read().decode(errors="replace")
                pytest.fail(f"worker exited early ({proc.returncode}):\n"
                            f"{out[-2000:]}")
            if os.path.exists(snap):
                m = os.path.getmtime(snap)
                if first_mtime is None:
                    first_mtime = m
                elif m != first_mtime:
                    first_mtime = m
                    rewrites += 1
            time.sleep(0.05)
        assert rewrites >= 2, "snapshot never (re)written; cannot test kill"
        proc.send_signal(signal.SIGKILL)
        proc.wait(timeout=30)
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait(timeout=30)
        log.close()

    # 1. The snapshot on disk is intact (atomic write survived the kill).
    from semantic_embeddings_tpu.train.state import load_checkpoint_raw

    variables, meta = load_checkpoint_raw(snap)
    assert "params" in variables and variables["params"]
    epoch = int(meta.get("epoch", 0))
    assert epoch >= 1
    # Any in-flight temp file is at worst leftover garbage, never the
    # snapshot itself.
    assert not os.path.exists(snap + ".tmp") or epoch >= 1

    # 2. Training resumes from it through the real CLI (in-process, on the
    # test session's CPU backend) and completes two more epochs.
    from semantic_embeddings_tpu.cli.learn_image_embeddings import main as learn

    learn([
        "--dataset", "synthetic-10", "--data_root", "x",
        "--embedding", "onehot", "--architecture", "simple",
        "--loss", "inv_corr", "--lr_schedule", "SGD",
        "--sgd_schedule", f"1:0.02,{epoch + 2}", "--batch_size", "256",
        "--snapshot", snap, "--initial_epoch", str(epoch),
        "--no_progress",
    ])
    _, meta2 = load_checkpoint_raw(snap)
    assert int(meta2.get("epoch", 0)) == epoch + 2
