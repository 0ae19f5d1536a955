"""Training core: schedule traces, Keras-SGD update math, jitted train step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from semantic_embeddings_tpu.models import EmbeddingModel, build_network
from semantic_embeddings_tpu.train import (
    CLRSchedule,
    PiecewiseSchedule,
    PlateauSchedule,
    SGDRSchedule,
    TrainState,
    fit,
    get_lr_schedule,
    load_checkpoint,
    make_eval_step,
    make_train_step,
    new_train_state,
    save_checkpoint,
    sgd_update,
)
from semantic_embeddings_tpu.train.metrics import nn_accuracy
from semantic_embeddings_tpu.train.optimizer import (
    clip_by_per_tensor_norm,
    decay_from_max_decay,
    effective_lr,
)


def _reference_sgdr_trace(min_lr, max_lr, base, mul, n_epochs):
    """Oracle reimplementation of the reference callback's state machine
    (sgdr_callback.py:63-87): on_train_begin sets max_lr; each epoch end
    increments the counter and either restarts or applies the cosine."""
    lrs, cycles, ci = [], 0, 0
    lr = max_lr
    for _ in range(n_epochs):
        lrs.append(lr)
        ci += 1
        if ci >= base * (mul ** cycles):
            cycles += 1
            ci = 0
            lr = max_lr
        else:
            lr = min_lr + 0.5 * (max_lr - min_lr) * (
                1 + np.cos(np.pi * (ci + 1) / (base * mul ** cycles))
            )
    return lrs


def test_sgdr_matches_reference_trace():
    sched = SGDRSchedule(min_lr=1e-6, max_lr=0.1, base_len=12, mul=2)
    oracle = _reference_sgdr_trace(1e-6, 0.1, 12, 2, 100)
    ours = [sched.lr(e) for e in range(100)]
    np.testing.assert_allclose(ours, oracle, rtol=1e-12)


def test_sgdr_epoch_count():
    sched, epochs = get_lr_schedule("SGDR", 50000, 100)
    assert epochs == 12 + 24 + 48 + 96 + 192  # 372
    assert sched.lr(0) == 0.1
    assert sched.lr(12) == 0.1  # restart


def _reference_clr_trace(base_lr, max_lr, step_size, n_iters):
    """Oracle for clr_callback.py:106-133 (triangular mode)."""
    lrs, lr = [], base_lr
    for it in range(n_iters):
        lrs.append(lr)
        ci = it + 1
        cycle = np.floor(1 + ci / (2 * step_size))
        x = np.abs(ci / step_size - 2 * cycle + 1)
        lr = base_lr + (max_lr - base_lr) * max(0.0, 1 - x)
    return lrs


def test_clr_matches_reference_trace():
    sched = CLRSchedule(base_lr=1e-5, max_lr=0.1, step_size=10)
    oracle = _reference_clr_trace(1e-5, 0.1, 10, 50)
    ours = [sched.lr(0, it) for it in range(50)]
    np.testing.assert_allclose(ours, oracle, rtol=1e-12)


def test_piecewise_schedule():
    sched, epochs = get_lr_schedule(
        "SGD", 50000, 100, {"sgd_schedule": "1:0.1,31:0.01,41:0.001,50"}
    )
    assert epochs == 50
    assert sched.lr(0) == 0.1
    assert sched.lr(29) == 0.1
    assert sched.lr(30) == 0.01
    assert sched.lr(40) == 0.001
    assert sched.lr(49) == 0.001


def test_plateau_schedule():
    sched = PlateauSchedule(initial_lr=0.1, patience=2, min_lr=1e-4)
    assert sched.lr(0) == 0.1
    sched.observe({"val_loss": 1.0})
    sched.observe({"val_loss": 1.0})  # no improvement -> wait 1
    sched.observe({"val_loss": 1.0})  # wait 2 -> reduce
    assert sched.lr(3) == pytest.approx(0.01)


def test_keras_sgd_update_math():
    params = {"w": jnp.array([1.0])}
    vel = {"w": jnp.array([0.0])}
    grads = {"w": jnp.array([0.5])}
    p1, v1 = sgd_update(params, vel, grads, lr=0.1, momentum=0.9)
    assert v1["w"][0] == pytest.approx(-0.05)
    assert p1["w"][0] == pytest.approx(0.95)
    p2, v2 = sgd_update(p1, v1, grads, lr=0.1, momentum=0.9)
    # v2 = 0.9*(-0.05) - 0.1*0.5 = -0.095 ; p2 = 0.95 - 0.095
    assert v2["w"][0] == pytest.approx(-0.095)
    assert p2["w"][0] == pytest.approx(0.855)


def test_keras_sgd_nesterov():
    params = {"w": jnp.array([1.0])}
    vel = {"w": jnp.array([0.2])}
    grads = {"w": jnp.array([0.5])}
    p1, v1 = sgd_update(params, vel, grads, lr=0.1, momentum=0.9, nesterov=True)
    v_new = 0.9 * 0.2 - 0.1 * 0.5
    assert v1["w"][0] == pytest.approx(v_new)
    assert p1["w"][0] == pytest.approx(1.0 + 0.9 * v_new - 0.05)


def test_per_tensor_clipnorm():
    grads = {"a": jnp.array([3.0, 4.0]), "b": jnp.array([30.0, 40.0])}
    clipped = clip_by_per_tensor_norm(grads, 10.0)
    np.testing.assert_allclose(clipped["a"], [3.0, 4.0])  # norm 5 < 10: kept
    np.testing.assert_allclose(clipped["b"], [6.0, 8.0])  # norm 50 -> 10


def test_time_decay():
    # learn_image_embeddings.py:224-227: final lr = max_decay * initial lr.
    decay = decay_from_max_decay(0.1, steps_per_epoch=100, epochs=10)
    assert effective_lr(1.0, decay, 0) == 1.0
    assert effective_lr(1.0, decay, 100 * 10) == pytest.approx(0.1)


class _ToyData:
    """16 samples, 4 classes, images whose mean encodes the class."""

    def __init__(self):
        rng = np.random.default_rng(0)
        self.labels = np.tile(np.arange(4), 4).astype(np.int32)
        self.images = (
            rng.normal(0, 0.05, (16, 8, 8, 3)).astype(np.float32)
            + self.labels[:, None, None, None] / 4.0
        )

    def steps_per_epoch(self, batch_size):
        return 16 // batch_size

    def train_batches(self, batch_size, epoch, seed):
        order = np.random.default_rng(seed + epoch).permutation(16)
        for i in range(0, 16, batch_size):
            idx = order[i : i + batch_size]
            yield {"image": self.images[idx], "label": self.labels[idx]}

    def test_batches(self, batch_size):
        for i in range(0, 16, batch_size):
            yield {
                "image": self.images[i : i + batch_size],
                "label": self.labels[i : i + batch_size],
            }


def _prepare(raw, rng, train):
    return raw["image"], raw["label"]


@pytest.fixture(scope="module")
def toy_setup():
    class_emb = np.eye(4, dtype=np.float32)
    spec = build_network(4, "simple", input_channels=3)
    model = EmbeddingModel(backbone=spec.module, output="l2norm")
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((2, 8, 8, 3)), train=False
    )
    return model, spec, class_emb, variables


def test_train_step_learns(toy_setup):
    model, spec, class_emb, variables = toy_setup
    data = _ToyData()
    state = new_train_state(variables)
    train_step = make_train_step(
        model,
        _prepare,
        loss_name="inv_corr",
        class_embedding=class_emb,
        l2_penalty_fn=spec.l2_penalty,
        metric_fn=nn_accuracy(class_emb, dot_prod_sim=True),
    )
    rng = jax.random.PRNGKey(1)
    first_loss = None
    for epoch in range(12):
        for raw in data.train_batches(8, epoch, 0):
            state, metrics = train_step(state, raw, 0.05, rng)
            if first_loss is None:
                first_loss = float(metrics["emb_loss"])
    final_loss = float(metrics["emb_loss"])
    assert final_loss < first_loss * 0.7
    assert int(state.step) == 12 * 2


def test_eval_and_fit_loop(toy_setup, tmp_path):
    model, spec, class_emb, variables = toy_setup
    data = _ToyData()
    state = new_train_state(variables)
    train_step = make_train_step(
        model, _prepare, loss_name="inv_corr", class_embedding=class_emb,
        l2_penalty_fn=spec.l2_penalty,
    )
    eval_step = make_eval_step(
        model, _prepare, loss_name="inv_corr", class_embedding=class_emb,
        metric_fn=nn_accuracy(class_emb, dot_prod_sim=True),
    )
    sched = PiecewiseSchedule([(0, 0.05)])
    snapshot = str(tmp_path / "snap.ckpt")
    state = fit(
        state, train_step, eval_step, data, sched,
        epochs=2, batch_size=8, snapshot=snapshot, verbose=False,
    )
    assert int(state.epoch) == 2
    # Resume from the snapshot.
    template = new_train_state(variables)
    restored, meta = load_checkpoint(snapshot, template)
    assert meta["epoch"] == 2
    assert int(restored.step) == int(state.step)


def test_frozen_params_stay_fixed(toy_setup):
    model, spec, class_emb, variables = toy_setup
    data = _ToyData()
    state = new_train_state(variables)
    train_step = make_train_step(
        model, _prepare, loss_name="inv_corr", class_embedding=class_emb,
        trainable_fn=lambda path: "top" in path,
    )
    raw = next(data.train_batches(8, 0, 0))
    new_state, _ = train_step(state, raw, 0.1, jax.random.PRNGKey(0))
    before = state.params["backbone"]["conv1"]["kernel"]
    after = new_state.params["backbone"]["conv1"]["kernel"]
    np.testing.assert_array_equal(np.asarray(before), np.asarray(after))
    top_b = state.params["backbone"]["top"]["kernel"]
    top_a = new_state.params["backbone"]["top"]["kernel"]
    assert not np.allclose(np.asarray(top_b), np.asarray(top_a))


def test_checkpoint_roundtrip(toy_setup, tmp_path):
    model, spec, class_emb, variables = toy_setup
    state = new_train_state(variables)
    path = str(tmp_path / "ck.msgpack")
    save_checkpoint(path, state, {"note": "x"})
    restored, meta = load_checkpoint(path, new_train_state(variables))
    assert meta["note"] == "x"
    a = jax.tree_util.tree_leaves(state.params)
    b = jax.tree_util.tree_leaves(restored.params)
    assert all(np.array_equal(x, y) for x, y in zip(a, b))


def test_resume_reproduces_straight_run(toy_setup, tmp_path):
    """Snapshot at epoch 1 + resume must equal a straight 2-epoch run:
    optimizer state, BN stats, step counter and the RNG/shuffle streams all
    restore exactly (stronger than the reference, which resets the
    optimizer on resume)."""
    model, spec, class_emb, variables = toy_setup
    data = _ToyData()
    kwargs = dict(loss_name="inv_corr", class_embedding=class_emb)
    train_step = make_train_step(model, _prepare, **kwargs)
    eval_step = make_eval_step(model, _prepare, **kwargs)
    sched = PiecewiseSchedule([(0, 0.05)])

    straight = fit(
        new_train_state(variables), train_step, eval_step, data, sched,
        epochs=2, batch_size=8, verbose=False, seed=7,
    )

    snap = str(tmp_path / "resume.ckpt")
    st = fit(
        new_train_state(variables), train_step, eval_step, data, sched,
        epochs=1, batch_size=8, verbose=False, seed=7, snapshot=snap,
    )
    restored, _ = load_checkpoint(snap, new_train_state(variables))
    resumed = fit(
        restored, train_step, eval_step, data,
        PiecewiseSchedule([(0, 0.05)]),
        epochs=2, batch_size=8, verbose=False, seed=7, initial_epoch=1,
    )

    for a, b in zip(
        jax.tree_util.tree_leaves(straight.params),
        jax.tree_util.tree_leaves(resumed.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    assert int(straight.step) == int(resumed.step)
