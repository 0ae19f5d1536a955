"""Serving runtime: batching engine, HTTP frontend, serve CLI wiring.

Beyond-parity subsystem (the reference stops at ``model.save('.h5')``,
``/root/reference/learn_image_embeddings.py:257-267``).
"""

import io
import json
import os
import threading
import urllib.request

import numpy as np
import pytest

import jax.numpy as jnp

from semantic_embeddings_tpu.serving import (
    BatchingEngine, EngineOverloaded, Preprocessor, PreprocessError,
    ServingServer, default_buckets,
)


# ---------------------------------------------------------------------------
# engine


def test_default_buckets():
    assert default_buckets(256) == [1, 2, 4, 8, 16, 32, 64, 128, 256]
    assert default_buckets(6) == [1, 2, 4, 6]
    assert default_buckets(1) == [1]


def make_engine(fn=None, seen=None, **kw):
    def default_fn(x):
        if seen is not None:
            seen.append(x.shape[0])
        return {"emb": x * 2.0, "sum": x.sum(axis=(1, 2, 3))}

    kw.setdefault("max_batch", 8)
    kw.setdefault("timeout_ms", 1.0)
    return BatchingEngine(fn or default_fn, (4, 4, 3), **kw)


def test_engine_single_request_roundtrip():
    seen = []
    with make_engine(seen=seen) as eng:
        x = np.arange(2 * 4 * 4 * 3, dtype=np.float32).reshape(2, 4, 4, 3)
        out = eng.predict(x, timeout=10)
        np.testing.assert_array_equal(out["emb"], x * 2.0)
        np.testing.assert_allclose(out["sum"], x.sum(axis=(1, 2, 3)))
    # a 2-image request runs in the 2-bucket: no padding waste
    assert seen == [2]


def test_engine_pads_to_bucket():
    seen = []
    with make_engine(seen=seen) as eng:
        out = eng.predict(np.ones((3, 4, 4, 3), np.float32), timeout=10)
        assert out["emb"].shape == (3, 4, 4, 3)  # padding rows trimmed
    assert seen == [4]  # 3 -> next power-of-two bucket


def test_engine_coalesces_concurrent_requests():
    seen = []
    # Long fill window so every submitted request lands in one pack.
    eng = make_engine(seen=seen, timeout_ms=300.0)
    rng = np.random.default_rng(0)
    reqs = [rng.normal(size=(n, 4, 4, 3)).astype(np.float32)
            for n in (1, 2, 1, 3)]
    futures = [eng.submit(r) for r in reqs]
    eng.start()
    outs = [f.result(timeout=10) for f in futures]
    eng.stop()
    # One device call for all 7 images, padded to the 8-bucket.
    assert seen == [8]
    stats = eng.stats()
    assert stats["batches"] == 1
    assert stats["images"] == 7
    assert stats["padded_images"] == 1
    assert stats["requests"] == 4
    # and each requester got exactly its own slice back
    for r, o in zip(reqs, outs):
        np.testing.assert_array_equal(o["emb"], r * 2.0)


def test_engine_respects_max_batch_split():
    seen = []
    eng = make_engine(seen=seen, max_batch=4, timeout_ms=300.0)
    futures = [eng.submit(np.full((3, 4, 4, 3), i, np.float32))
               for i in range(2)]
    eng.start()
    for i, f in enumerate(futures):
        out = f.result(timeout=10)
        np.testing.assert_array_equal(out["emb"], np.full((3, 4, 4, 3),
                                                          2.0 * i))
    eng.stop()
    # 3 + 3 > max_batch=4: two packs, each padded 3 -> 4.
    assert seen == [4, 4]


def test_engine_validates_requests():
    with make_engine() as eng:
        with pytest.raises(ValueError, match="bad input shape"):
            eng.submit(np.zeros((1, 5, 4, 3), np.float32))
        with pytest.raises(ValueError, match="outside"):
            eng.submit(np.zeros((9, 4, 4, 3), np.float32))
        with pytest.raises(ValueError, match="outside"):
            eng.submit(np.zeros((0, 4, 4, 3), np.float32))


def test_engine_delivers_model_errors():
    def boom(x):
        raise RuntimeError("device on fire")

    with make_engine(fn=boom) as eng:
        with pytest.raises(RuntimeError, match="device on fire"):
            eng.predict(np.zeros((1, 4, 4, 3), np.float32), timeout=10)
        assert eng.stats()["errors"] == 1


def test_engine_stop_fails_queued_requests():
    eng = make_engine()
    fut = eng.submit(np.zeros((1, 4, 4, 3), np.float32))
    eng.stop()  # never started: queued item must be failed, not hang
    with pytest.raises(RuntimeError, match="engine stopped"):
        fut.result(timeout=5)


def test_engine_backpressure_503_semantics():
    import time

    release = threading.Event()

    def slow(x):
        release.wait(10)
        return {"emb": x * 2.0}

    eng = make_engine(fn=slow, max_batch=4, max_queue=6, timeout_ms=1.0)
    eng.start()
    try:
        futs = [eng.submit(np.ones((2, 4, 4, 3), np.float32))
                for _ in range(3)]  # 6 pending images = exactly max_queue
        with pytest.raises(EngineOverloaded, match="retry later"):
            eng.submit(np.ones((1, 4, 4, 3), np.float32))
        release.set()
        for f in futs:
            assert f.result(timeout=10)["emb"].shape == (2, 4, 4, 3)
        # drained: capacity is back
        deadline = time.time() + 5
        while time.time() < deadline:
            try:
                fut = eng.submit(np.ones((4, 4, 4, 3), np.float32))
                break
            except EngineOverloaded:
                time.sleep(0.01)
        else:
            pytest.fail("queue never drained")
        assert fut.result(timeout=10)["emb"].shape == (4, 4, 4, 3)
    finally:
        eng.stop()


def test_engine_mesh_sharded_equals_single_device():
    """Mesh mode: one frontend drives all 8 (virtual) chips SPMD and the
    results equal the unsharded forward."""
    import jax

    from semantic_embeddings_tpu.parallel import get_mesh

    mesh = get_mesh(8)

    @jax.jit
    def fn(x):
        return {"emb": x * 2.0, "sum": x.sum(axis=(1, 2, 3))}

    eng = BatchingEngine(fn, (4, 4, 3), max_batch=16, timeout_ms=200.0,
                         mesh=mesh)
    # buckets are multiples of the 8-way data axis so every call shards
    assert eng.buckets == [8, 16]
    rng = np.random.default_rng(7)
    reqs = [rng.normal(size=(n, 4, 4, 3)).astype(np.float32)
            for n in (1, 3, 2)]
    futs = [eng.submit(r) for r in reqs]
    eng.start()
    try:
        for r, f in zip(reqs, futs):
            out = f.result(timeout=30)
            np.testing.assert_array_equal(out["emb"], r * 2.0)
            np.testing.assert_allclose(out["sum"], r.sum(axis=(1, 2, 3)),
                                       rtol=1e-6)
    finally:
        eng.stop()
    # 6 images padded into one 8-bucket call
    assert eng.stats()["batches"] == 1


def test_engine_spatial_mesh_sharded_equals_single_device():
    """A (data, spatial) mesh: batches shard on batch AND image height."""
    import jax

    from semantic_embeddings_tpu.parallel import get_mesh

    mesh = get_mesh(8, spatial=2)

    @jax.jit
    def fn(x):
        return {"sum": x.sum(axis=(1, 2, 3)), "emb": x * 3.0}

    eng = BatchingEngine(fn, (4, 4, 3), max_batch=8, timeout_ms=200.0,
                         mesh=mesh)
    assert eng.buckets == [4, 8]  # data axis is 4-way
    rng = np.random.default_rng(11)
    r = rng.normal(size=(3, 4, 4, 3)).astype(np.float32)
    with eng:
        out = eng.predict(r, timeout=30)
    np.testing.assert_array_equal(out["emb"], r * 3.0)
    np.testing.assert_allclose(out["sum"], r.sum(axis=(1, 2, 3)), rtol=1e-6)


def test_engine_mesh_rejects_bad_max_batch():
    from semantic_embeddings_tpu.parallel import get_mesh

    with pytest.raises(ValueError, match="multiple of the mesh"):
        BatchingEngine(lambda x: x, (4, 4, 3), max_batch=12,
                       mesh=get_mesh(8))


def test_serve_cli_mesh_end_to_end(tmp_path):
    """--gpus 8: the served forward runs SPMD over the CPU mesh and still
    matches the single-device model output."""
    from semantic_embeddings_tpu.cli import common
    from semantic_embeddings_tpu.cli.serve_model import build_parser, \
        make_server
    from semantic_embeddings_tpu.train.state import save_checkpoint

    model, spec = common.build_embedding_model(16, "simple", "inv_corr", 4)
    state = common.init_model_state(model, 8, 3)
    ckpt = str(tmp_path / "model.ckpt")
    save_checkpoint(ckpt, state, {
        "architecture": "simple", "embed_dim": 16, "loss": "inv_corr",
        "cls_classes": 4,
    })
    args = build_parser().parse_args([
        "--checkpoint", ckpt, "--layer", "l2norm", "--input_size", "8",
        "--port", "0", "--max_batch", "16", "--gpus", "8",
        "--mean", "0,0,0", "--std", "1,1,1",
    ])
    srv = make_server(args)
    srv.start()
    try:
        assert _get(srv, "/v1/meta")[1]["devices"] == 8
        rng = np.random.default_rng(5)
        x = rng.normal(size=(3, 8, 8, 3)).astype(np.float32)
        code, _, body = _post(srv, json.dumps(
            {"instances": x.tolist(), "normalized": True}).encode(),
            "application/json")
        assert code == 200
        got = np.asarray(json.loads(body)["predictions"], np.float32)
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        _, inter = model.apply(variables, jnp.asarray(x), train=False,
                               mutable=["intermediates"])
        want = common.resolve_tap(inter.get("intermediates", {}), "l2norm")
        np.testing.assert_allclose(got, np.asarray(want), rtol=1e-4,
                                   atol=1e-5)
    finally:
        srv.stop()


def test_serve_cli_device_preproc_matches_host_norm(tmp_path):
    """--device_preproc (uint8 on the wire, mean/std fused into the jitted
    forward) must produce the SAME predictions as the host-normalize server
    for identical raw-pixel inputs, for both npy and JPEG bodies; and it
    must reject pre-normalized requests instead of double-normalizing."""
    import io

    from PIL import Image

    from semantic_embeddings_tpu.cli import common
    from semantic_embeddings_tpu.cli.serve_model import build_parser, \
        make_server
    from semantic_embeddings_tpu.train.state import save_checkpoint

    model, spec = common.build_embedding_model(16, "simple", "inv_corr", 0)
    state = common.init_model_state(model, 8, 3)
    ckpt = str(tmp_path / "model.ckpt")
    save_checkpoint(ckpt, state, {
        "architecture": "simple", "embed_dim": 16, "loss": "inv_corr",
        "cls_classes": 0,
    })
    base = ["--checkpoint", ckpt, "--layer", "l2norm", "--input_size", "8",
            "--port", "0", "--max_batch", "8",
            "--mean", "120.5,118.2,105.0", "--std", "60.0,59.5,61.2"]
    rng = np.random.default_rng(11)
    pixels = rng.integers(0, 256, (2, 8, 8, 3)).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(pixels[0]).save(buf, "JPEG", quality=95)
    jpeg_blob = buf.getvalue()

    def npy_body(arr):
        b = io.BytesIO()
        np.save(b, arr, allow_pickle=False)
        return b.getvalue()

    results = {}
    for tag, extra in (("host", []), ("device", ["--device_preproc"])):
        srv = make_server(build_parser().parse_args(base + extra))
        srv.start()
        try:
            assert srv.engine.dtype == (
                np.uint8 if tag == "device" else np.float32)
            code, _, body = _post(srv, npy_body(pixels), "application/x-npy",
                                  accept="application/x-npy")
            assert code == 200, body
            code2, _, body2 = _post(srv, jpeg_blob, "image/jpeg")
            assert code2 == 200, body2
            results[tag] = (
                np.load(io.BytesIO(body), allow_pickle=False),
                np.asarray(json.loads(body2)["predictions"], np.float32))
            if tag == "device":
                code3, _, body3 = _post(srv, json.dumps(
                    {"instances": pixels.tolist(), "normalized": True}
                ).encode(), "application/json")
                assert code3 == 400 and b"device" in body3
        finally:
            srv.stop()
    # uint8-wire predictions == host-normalized predictions (both paths
    # compute (x - mean)/std in f32; the device does it inside the jit)
    np.testing.assert_allclose(results["device"][0], results["host"][0],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(results["device"][1], results["host"][1],
                               rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# preprocessor


def test_preprocessor_normalizes_arrays():
    prep = Preprocessor(4, mean=[1.0, 2.0, 3.0], std=[2.0, 2.0, 2.0])
    x = np.ones((4, 4, 3), np.float32) * 5.0
    got = prep.from_array(x)
    assert got.shape == (1, 4, 4, 3)
    np.testing.assert_allclose(got[0, 0, 0], [(5 - 1) / 2, (5 - 2) / 2,
                                              (5 - 3) / 2])
    np.testing.assert_array_equal(prep.from_array(x, normalized=True)[0], x)
    with pytest.raises(PreprocessError, match="bad input shape"):
        prep.from_array(np.zeros((2, 5, 4, 3)))


def test_preprocessor_jpeg_matches_file_decoder(tmp_path):
    from PIL import Image

    from semantic_embeddings_tpu import native

    rng = np.random.default_rng(3)
    arr = rng.integers(0, 256, (60, 80, 3)).astype(np.uint8)
    path = str(tmp_path / "img.jpg")
    Image.fromarray(arr).save(path, quality=95)
    blob = open(path, "rb").read()

    prep = Preprocessor(32, target_size=40)
    got = prep.from_jpeg(blob)
    assert got.shape == (1, 32, 32, 3)
    if native.loader() is not None:
        # in-memory decode must equal the file-path decoder bit-for-bit
        want, ok = native.decode_batch([path], [40], [1], False, 32, 32)
        assert ok[0]
        np.testing.assert_array_equal(got[0], want[0].astype(np.float32))
    with pytest.raises(PreprocessError):
        prep.from_jpeg(b"not a jpeg at all")


# ---------------------------------------------------------------------------
# HTTP server


@pytest.fixture()
def server():
    eng = BatchingEngine(
        lambda x: jnp.asarray(x).sum(axis=(1, 2, 3)), (4, 4, 3),
        max_batch=8, timeout_ms=1.0)
    prep = Preprocessor(4, mean=[0.0, 0.0, 0.0], std=[1.0, 1.0, 1.0])
    srv = ServingServer(eng, prep, {"architecture": "test"},
                        host="127.0.0.1", port=0)
    srv.start()
    yield srv
    srv.stop()


def _post(srv, body, ctype, accept=None, path="/v1/predict"):
    req = urllib.request.Request(
        f"http://127.0.0.1:{srv.port}{path}", data=body, method="POST",
        headers={"Content-Type": ctype, **({"Accept": accept} if accept
                                           else {})})
    try:
        with urllib.request.urlopen(req, timeout=30) as resp:
            return resp.status, resp.headers.get("Content-Type"), resp.read()
    except urllib.error.HTTPError as e:
        return e.code, e.headers.get("Content-Type"), e.read()


def _get(srv, path):
    with urllib.request.urlopen(
            f"http://127.0.0.1:{srv.port}{path}", timeout=30) as resp:
        return resp.status, json.loads(resp.read())


def test_http_health_meta_stats(server):
    assert _get(server, "/healthz") == (200, {"status": "ok"})
    assert _get(server, "/v1/meta")[1]["architecture"] == "test"
    code, stats = _get(server, "/v1/stats")
    assert code == 200 and "requests" in stats


def test_http_predict_json(server):
    x = np.ones((2, 4, 4, 3), np.float32)
    code, _, body = _post(server, json.dumps(
        {"instances": x.tolist()}).encode(), "application/json")
    assert code == 200
    np.testing.assert_allclose(json.loads(body)["predictions"],
                               [48.0, 48.0])
    # single HWC image is auto-batched
    code, _, body = _post(server, json.dumps(
        {"instances": x[0].tolist()}).encode(), "application/json")
    assert code == 200
    assert json.loads(body)["predictions"] == [48.0]


def test_http_predict_npy_roundtrip(server):
    buf = io.BytesIO()
    np.save(buf, np.full((3, 4, 4, 3), 2.0, np.float32))
    code, ctype, body = _post(server, buf.getvalue(), "application/x-npy",
                              accept="application/x-npy")
    assert code == 200 and ctype == "application/x-npy"
    np.testing.assert_allclose(np.load(io.BytesIO(body)), [96.0] * 3)


def test_http_predict_jpeg(server):
    from PIL import Image

    arr = np.full((4, 4, 3), 10, np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, "JPEG", quality=100)
    code, _, body = _post(server, buf.getvalue(), "image/jpeg")
    assert code == 200
    (pred,) = json.loads(body)["predictions"]
    # JPEG is lossy; a flat image survives nearly exactly
    assert abs(pred - 10.0 * 48) < 0.1 * 48


def test_http_errors(server):
    code, _, body = _post(server, b"{}", "application/json")
    assert code == 400 and "instances" in json.loads(body)["error"]
    code, _, body = _post(server, json.dumps(
        {"instances": [[1.0]]}).encode(), "application/json")
    assert code == 400
    code, _, body = _post(server, b"", "application/json",
                          path="/v1/nothere")
    assert code == 404


def test_http_concurrent_requests_batched():
    calls = []

    def fn(x):
        calls.append(x.shape[0])
        return x[..., 0, 0, 0]

    eng = BatchingEngine(fn, (4, 4, 3), max_batch=8, timeout_ms=250.0)
    prep = Preprocessor(4)
    srv = ServingServer(eng, prep, {}, host="127.0.0.1", port=0)
    srv.start()
    try:
        results = {}

        def worker(i):
            x = np.full((1, 4, 4, 3), float(i), np.float32)
            code, _, body = _post(srv, json.dumps(
                {"instances": x.tolist()}).encode(), "application/json")
            results[i] = (code, json.loads(body)["predictions"])

        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for i in range(4):
            assert results[i] == (200, [float(i)])
        stats = eng.stats()
        # 4 concurrent 1-image posts share device calls (the 250 ms fill
        # window guarantees at least two land in one pack even on a slow
        # host; typically all four do).
        assert stats["batches"] < 4, stats
    finally:
        srv.stop()


def test_serve_cli_artifact_mesh(tmp_path):
    """A StableHLO artifact served with --gpus 8: the exported module is
    partitioned over the mesh (output stays batch-sharded) and matches."""
    from semantic_embeddings_tpu.cli import common
    from semantic_embeddings_tpu.cli.export_model import export_checkpoint
    from semantic_embeddings_tpu.cli.serve_model import build_parser, \
        make_server
    from semantic_embeddings_tpu.train.state import save_checkpoint

    model, spec = common.build_embedding_model(16, "simple", "inv_corr", 4)
    state = common.init_model_state(model, 8, 3)
    ckpt = str(tmp_path / "model.ckpt")
    save_checkpoint(ckpt, state, {
        "architecture": "simple", "embed_dim": 16, "loss": "inv_corr",
        "cls_classes": 4,
    })
    art = str(tmp_path / "model.shlo")
    export_checkpoint(ckpt, art, layer="l2norm", input_size=8, batch=-1,
                      platforms=("cpu",))
    args = build_parser().parse_args([
        "--artifact", art, "--port", "0", "--max_batch", "16",
        "--gpus", "8", "--mean", "0,0,0", "--std", "1,1,1",
    ])
    srv = make_server(args)
    srv.start()
    try:
        x = np.random.default_rng(9).normal(size=(2, 8, 8, 3)).astype(
            np.float32)
        code, _, body = _post(srv, json.dumps(
            {"instances": x.tolist(), "normalized": True}).encode(),
            "application/json")
        assert code == 200
        got = np.asarray(json.loads(body)["predictions"], np.float32)
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        _, inter = model.apply(variables, jnp.asarray(x), train=False,
                               mutable=["intermediates"])
        want = np.asarray(common.resolve_tap(
            inter.get("intermediates", {}), "l2norm"))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    finally:
        srv.stop()


def test_serve_cli_bf16(tmp_path):
    """--bf16 checkpoint serving: JSON-serializable output tracking f32."""
    from semantic_embeddings_tpu.cli import common
    from semantic_embeddings_tpu.cli.serve_model import build_parser, \
        make_server
    from semantic_embeddings_tpu.train.state import save_checkpoint

    model, spec = common.build_embedding_model(16, "simple", "inv_corr", 4)
    state = common.init_model_state(model, 8, 3)
    ckpt = str(tmp_path / "model.ckpt")
    save_checkpoint(ckpt, state, {
        "architecture": "simple", "embed_dim": 16, "loss": "inv_corr",
        "cls_classes": 4,
    })
    args = build_parser().parse_args([
        "--checkpoint", ckpt, "--layer", "l2norm", "--input_size", "8",
        "--port", "0", "--max_batch", "4", "--bf16",
        "--mean", "0,0,0", "--std", "1,1,1",
    ])
    srv = make_server(args)
    srv.start()
    try:
        assert _get(srv, "/v1/meta")[1]["compute_dtype"] == "bfloat16"
        x = np.random.default_rng(4).normal(size=(2, 8, 8, 3)).astype(
            np.float32)
        code, _, body = _post(srv, json.dumps(
            {"instances": x.tolist(), "normalized": True}).encode(),
            "application/json")
        assert code == 200
        got = np.asarray(json.loads(body)["predictions"], np.float32)
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        _, inter = model.apply(variables, jnp.asarray(x), train=False,
                               mutable=["intermediates"])
        from semantic_embeddings_tpu.cli.common import resolve_tap
        want = np.asarray(resolve_tap(inter.get("intermediates", {}),
                                      "l2norm"))
        np.testing.assert_allclose(got, want, rtol=3e-2, atol=3e-2)
    finally:
        srv.stop()


def test_serve_bf16_rejected_for_artifacts(tmp_path):
    from semantic_embeddings_tpu.cli.serve_model import build_model_fn, \
        build_parser

    args = build_parser().parse_args(
        ["--artifact", str(tmp_path / "x.shlo"), "--bf16"])
    with pytest.raises(SystemExit, match="bake"):
        build_model_fn(args)


def test_http_burst_of_32_connections_all_served():
    """A connect burst beyond Python's default listen backlog (5) must not
    get TCP resets — the batching server EXPECTS bursts (request_queue_size
    raised in serving/server.py)."""
    eng = BatchingEngine(lambda x: x.sum(axis=(1, 2, 3)), (4, 4, 3),
                         max_batch=32, timeout_ms=50.0)
    srv = ServingServer(eng, Preprocessor(4), {}, host="127.0.0.1", port=0)
    srv.start()
    try:
        results, errors = [], []

        def worker(i):
            try:
                x = np.full((1, 4, 4, 3), float(i), np.float32)
                code, _, body = _post(srv, json.dumps(
                    {"instances": x.tolist()}).encode(), "application/json")
                results.append((i, code, json.loads(body)["predictions"]))
            except Exception as e:  # noqa: BLE001
                errors.append((i, repr(e)))

        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(32)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errors, errors[:4]
        assert len(results) == 32
        for i, code, pred in results:
            assert code == 200 and pred == [float(i) * 48.0]
    finally:
        srv.stop()


def test_client_roundtrips(server):
    from semantic_embeddings_tpu.serving import ServingClient, ServingError

    c = ServingClient(f"http://127.0.0.1:{server.port}")
    assert c.health() == {"status": "ok"}
    assert c.meta()["architecture"] == "test"
    x = np.full((2, 4, 4, 3), 2.0, np.float32)
    # npy path (binary round trip)
    np.testing.assert_allclose(c.predict(x), [96.0, 96.0])
    # JSON path incl. the normalized flag
    np.testing.assert_allclose(c.predict_json(x, normalized=True),
                               [96.0, 96.0])
    # JPEG path
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(np.full((4, 4, 3), 10, np.uint8)).save(
        buf, "JPEG", quality=100)
    (pred,) = c.predict_jpeg(buf.getvalue())
    assert abs(pred - 480.0) < 48.0
    # server errors surface with code + message
    with pytest.raises(ServingError, match="bad input shape") as ei:
        c.predict(np.zeros((1, 5, 4, 3), np.float32))
    assert ei.value.code == 400
    assert "batches" in c.stats()


@pytest.mark.slow
def test_serve_cli_sigterm_graceful(tmp_path):
    """SIGTERM (what orchestrators send) stops the server cleanly: the
    process drains and exits 0 after printing the stop line."""
    import signal
    import subprocess
    import sys as _sys
    import time
    import urllib.request

    from semantic_embeddings_tpu.cli import common
    from semantic_embeddings_tpu.train.state import save_checkpoint

    model, _ = common.build_embedding_model(16, "simple", "inv_corr", 4)
    state = common.init_model_state(model, 8, 3)
    ckpt = str(tmp_path / "model.ckpt")
    save_checkpoint(ckpt, state, {
        "architecture": "simple", "embed_dim": 16, "loss": "inv_corr",
        "cls_classes": 4,
    })
    port = 8917
    code = (
        "import sys; sys.path.insert(0, %r)\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "from semantic_embeddings_tpu.cli.serve_model import main\n"
        "main(['--checkpoint', %r, '--layer', 'l2norm', '--input_size',"
        " '8', '--port', '%d', '--mean', '0,0,0', '--std', '1,1,1'])\n"
    ) % (os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
         ckpt, port)
    log = open(str(tmp_path / "serve.log"), "wb")
    proc = subprocess.Popen([_sys.executable, "-c", code], stdout=log,
                            stderr=subprocess.STDOUT)
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            try:
                with urllib.request.urlopen(
                        f"http://127.0.0.1:{port}/healthz", timeout=5) as r:
                    if r.status == 200:
                        break
            except Exception:  # noqa: BLE001 - not up yet
                time.sleep(0.2)
        else:
            pytest.fail("server never came up")
        proc.send_signal(signal.SIGTERM)
        assert proc.wait(timeout=60) == 0
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait(timeout=30)
        log.close()
    out = open(str(tmp_path / "serve.log"), "rb").read().decode(
        errors="replace")
    assert "serving stopped" in out, out[-2000:]


# ---------------------------------------------------------------------------
# serve CLI wiring


def test_serve_cli_resolve_stats():
    from semantic_embeddings_tpu import data as data_mod
    from semantic_embeddings_tpu.cli.serve_model import (
        PUBLISHED_STATS,
        build_parser,
        resolve_stats,
    )

    def stats(args_list):
        return resolve_stats(build_parser().parse_args(args_list))

    # explicit CSV wins over everything
    mean, std = stats(["--mean", "1,2,3", "--std", "4,5,6",
                       "--dataset", "cifar-100"])
    assert mean == [1.0, 2.0, 3.0] and std == [4.0, 5.0, 6.0]
    # published channel stats by dataset name
    assert stats(["--dataset", "cifar-100"]) == PUBLISHED_STATS["cifar-100"]
    assert stats(["--dataset", "ilsvrc"]) == (
        data_mod.IMAGENET_MEAN, data_mod.IMAGENET_STD)
    assert stats(["--dataset", "nab-caffe"]) == (
        data_mod.CAFFE_MEAN, data_mod.CAFFE_STD)
    assert stats(["--dataset", "cub"]) == data_mod.CUB_STATS
    # unknown dataset without data_root: explicit error, not silence
    with pytest.raises(SystemExit, match="no published stats"):
        stats(["--dataset", "mit67"])
    # no flags: no normalization
    assert stats([]) == (None, None)


def test_serve_cli_end_to_end(tmp_path):
    from semantic_embeddings_tpu.cli import common
    from semantic_embeddings_tpu.cli.serve_model import build_parser, \
        make_server
    from semantic_embeddings_tpu.train.state import save_checkpoint

    model, spec = common.build_embedding_model(16, "simple", "inv_corr", 4)
    state = common.init_model_state(model, 8, 3)
    ckpt = str(tmp_path / "model.ckpt")
    save_checkpoint(ckpt, state, {
        "architecture": "simple", "embed_dim": 16, "loss": "inv_corr",
        "cls_classes": 4,
    })

    args = build_parser().parse_args([
        "--checkpoint", ckpt, "--layer", "l2norm", "--input_size", "8",
        "--port", "0", "--max_batch", "4", "--mean", "0,0,0",
        "--std", "1,1,1",
    ])
    srv = make_server(args)
    srv.start()
    try:
        code, meta = _get(srv, "/v1/meta")
        assert code == 200
        assert meta["architecture"] == "simple"
        assert meta["input_size"] == 8

        rng = np.random.default_rng(0)
        x = rng.normal(size=(2, 8, 8, 3)).astype(np.float32)
        code, _, body = _post(srv, json.dumps(
            {"instances": x.tolist(), "normalized": True}).encode(),
            "application/json")
        assert code == 200
        got = np.asarray(json.loads(body)["predictions"], np.float32)
        assert got.shape == (2, 16)
        # served output is the true l2norm tap of the checkpointed model
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        _, inter = model.apply(variables, jnp.asarray(x), train=False,
                               mutable=["intermediates"])
        want = common.resolve_tap(inter.get("intermediates", {}), "l2norm")
        np.testing.assert_allclose(got, np.asarray(want), rtol=1e-4,
                                   atol=1e-5)
        np.testing.assert_allclose(np.linalg.norm(got, axis=1), 1.0,
                                   rtol=1e-4)
    finally:
        srv.stop()


# -- round-3 hardening: exception copies, warmup, client retries ------------


def test_future_exception_delivered_as_independent_copies():
    """A pack-wide device error reaches every waiter as a DISTINCT
    exception object chained to the shared original, so concurrent
    waiters cannot mutate each other's traceback."""

    def boom(x):
        raise RuntimeError("device on fire")

    eng = make_engine(fn=boom, timeout_ms=300.0)
    futs = [eng.submit(np.zeros((1, 4, 4, 3), np.float32)) for _ in range(2)]
    eng.start()
    raised = []
    for f in futs:
        with pytest.raises(RuntimeError, match="device on fire") as ei:
            f.result(timeout=10)
        raised.append(ei.value)
    eng.stop()
    assert raised[0] is not raised[1]
    # both chain to the one original exception raised inside the device call
    assert raised[0].__cause__ is raised[1].__cause__
    assert isinstance(raised[0].__cause__, RuntimeError)


def test_engine_warmup_precompiles_every_bucket():
    seen = []
    eng = make_engine(seen=seen, max_batch=8)
    timings = eng.warmup()
    # one call per bucket, largest included, without starting the loop
    assert seen == [1, 2, 4, 8]
    assert sorted(timings) == [1, 2, 4, 8]
    assert all(t >= 0 for t in timings.values())
    # warmed engine serves normally afterwards
    with eng:
        out = eng.predict(np.ones((3, 4, 4, 3), np.float32), timeout=10)
        assert out["emb"].shape == (3, 4, 4, 3)


def test_client_retries_5xx_and_connection_errors(monkeypatch):
    from semantic_embeddings_tpu.serving.client import (ServingClient,
                                                        ServingError)

    client = ServingClient("http://example.invalid", retries=3,
                           retry_backoff=0.0)
    calls = {"n": 0}

    def flaky(path, body=None, ctype=None, accept=None):
        calls["n"] += 1
        if calls["n"] < 3:
            raise ServingError(503, "queue full; retry later")
        return "application/json", b'{"status": "ok"}'

    monkeypatch.setattr(client, "_request_once", flaky)
    assert client.health() == {"status": "ok"}
    assert calls["n"] == 3

    # 4xx is the caller's bug: never retried
    calls["n"] = 0

    def bad_request(path, body=None, ctype=None, accept=None):
        calls["n"] += 1
        raise ServingError(400, "bad body")

    monkeypatch.setattr(client, "_request_once", bad_request)
    with pytest.raises(ServingError, match="bad body"):
        client.health()
    assert calls["n"] == 1

    # retries exhausted: the last error propagates
    calls["n"] = 0

    def always_503(path, body=None, ctype=None, accept=None):
        calls["n"] += 1
        raise ServingError(503, "still full")

    monkeypatch.setattr(client, "_request_once", always_503)
    with pytest.raises(ServingError, match="still full"):
        client.health()
    assert calls["n"] == 4  # 1 + 3 retries


def test_client_default_is_no_retry(monkeypatch):
    from semantic_embeddings_tpu.serving.client import (ServingClient,
                                                        ServingError)

    client = ServingClient("http://example.invalid")
    calls = {"n": 0}

    def always_503(path, body=None, ctype=None, accept=None):
        calls["n"] += 1
        raise ServingError(503, "full")

    monkeypatch.setattr(client, "_request_once", always_503)
    with pytest.raises(ServingError):
        client.health()
    assert calls["n"] == 1
