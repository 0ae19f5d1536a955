"""StableHLO serving export: round-trip equality, taps, batch polymorphism."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from semantic_embeddings_tpu.cli import common
from semantic_embeddings_tpu.cli.export_model import export_checkpoint, main
from semantic_embeddings_tpu.train.state import save_checkpoint


@pytest.fixture(scope="module")
def model_dump(tmp_path_factory):
    """A tiny trained-shape checkpoint in the learners' dump format."""
    model, spec = common.build_embedding_model(16, "simple", "inv_corr", 4)
    state = common.init_model_state(model, 8, 3)
    path = str(tmp_path_factory.mktemp("export") / "model.ckpt")
    save_checkpoint(path, state, {
        "architecture": "simple", "embed_dim": 16, "loss": "inv_corr",
        "cls_classes": 4,
    })
    return path


def test_export_round_trip_polymorphic_batch(model_dump, tmp_path):
    from jax import export as jexport

    out = str(tmp_path / "model.shlo")
    export_checkpoint(model_dump, out, input_size=8, batch=-1,
                      platforms=("cpu",), validate=True)
    sidecar = json.load(open(out + ".json"))
    assert sidecar["architecture"] == "simple"
    assert sidecar["input_shape"] == [-1, 8, 8, 3]

    restored = jexport.deserialize(open(out, "rb").read())
    model, variables, _ = common.rebuild_model_from_checkpoint(model_dump)
    variables = {k: v for k, v in variables.items()
                 if k in ("params", "batch_stats")}
    rng = np.random.default_rng(1)
    # Batch polymorphism: one artifact serves several batch sizes.
    for b in (1, 3, 7):
        x = rng.normal(size=(b, 8, 8, 3)).astype(np.float32)
        got = restored.call(x)
        want = model.apply(variables, jnp.asarray(x), train=False)
        for g, w in zip(jax.tree_util.tree_leaves(got),
                        jax.tree_util.tree_leaves(want)):
            np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                       rtol=1e-5, atol=1e-5)


def test_export_named_tap(model_dump, tmp_path):
    from jax import export as jexport

    out = str(tmp_path / "tap.shlo")
    export_checkpoint(model_dump, out, layer="avg_pool", input_size=8,
                      batch=2, platforms=("cpu",), validate=True)
    restored = jexport.deserialize(open(out, "rb").read())
    y = restored.call(np.zeros((2, 8, 8, 3), np.float32))
    leaf = jax.tree_util.tree_leaves(y)[0]
    assert np.asarray(leaf).shape[0] == 2


def test_export_unknown_tap_raises(model_dump, tmp_path):
    with pytest.raises(ValueError, match="No feature tap"):
        export_checkpoint(model_dump, str(tmp_path / "x.shlo"),
                          layer="nonexistent", input_size=8, batch=1,
                          platforms=("cpu",))


def test_export_bf16_compute(model_dump, tmp_path):
    """--bf16 bakes bfloat16 compute into the artifact: outputs track the
    f32 forward within bf16 tolerance and the sidecar records the dtype."""
    from jax import export as jexport

    out = str(tmp_path / "bf16.shlo")
    export_checkpoint(model_dump, out, input_size=8, batch=2,
                      platforms=("cpu",), validate=True, bf16=True)
    assert json.load(open(out + ".json"))["compute_dtype"] == "bfloat16"
    restored = jexport.deserialize(open(out, "rb").read())
    model, variables, _ = common.rebuild_model_from_checkpoint(model_dump)
    variables = {k: v for k, v in variables.items()
                 if k in ("params", "batch_stats")}
    x = np.random.default_rng(2).normal(size=(2, 8, 8, 3)).astype(np.float32)
    got = np.asarray(
        jax.tree_util.tree_leaves(restored.call(x))[0], np.float32)
    want = np.asarray(jax.tree_util.tree_leaves(
        model.apply(variables, jnp.asarray(x), train=False))[0])
    np.testing.assert_allclose(got, want, rtol=3e-2, atol=3e-2)


def test_export_cli_surface(model_dump, tmp_path):
    out = str(tmp_path / "cli.shlo")
    main(["--checkpoint", model_dump, "--out", out, "--input_size", "8",
          "--batch", "2", "--platforms", "cpu", "--validate"])
    assert json.load(open(out + ".json"))["platforms"] == ["cpu"]
