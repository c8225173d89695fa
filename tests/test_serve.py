"""Serving layer: micro-batching service + HTTP endpoints.

The reference stops at offline eval scripts; serving is a framework
extension (tapclip_tpu/serve.py docstring).
"""

import base64
import io
import json
import threading
import urllib.request

import numpy as np
import pytest

from tapclip_tpu.models.model_wrapper import FullModel
from tapclip_tpu.serve import PredictService, decode_image_payload, make_http_server

CLASSES = ["Backpack", "Pen", "Monitor"]


@pytest.fixture()
def model(tiny_cfg, tiny_params, tiny_prompt_cfg):
    return FullModel(CLASSES, tiny_params, tiny_cfg, prompt_cfg=tiny_prompt_cfg)


@pytest.fixture()
def service(model):
    svc = PredictService(model, batch_size=4, max_latency_ms=5.0)
    # First predict jit-compiles the tiny tower (~20 s; slower under a loaded
    # xdist run) — warm it here so per-test predicts use a short timeout.
    svc.predict(np.zeros((model.clip_cfg.image_size,) * 2 + (3,), np.float32),
                timeout=300)
    yield svc
    svc.close()


def _rand_pixels(size, seed=0):
    return np.random.default_rng(seed).standard_normal((size, size, 3)).astype(
        np.float32
    )


def test_predict_single(service, tiny_cfg):
    out = service.predict(_rand_pixels(tiny_cfg.image_size))
    assert out["class"] in CLASSES
    assert 0 <= out["index"] < len(CLASSES)
    assert abs(sum(out["probs"].values()) - 1.0) < 1e-3
    assert set(out["probs"]) == set(CLASSES)


def test_predict_batches_concurrent(service, tiny_cfg):
    """Concurrent requests aggregate into batches; every caller gets its own
    answer, and answers match a direct model call on the same image."""
    results = {}

    def call(i):
        results[i] = service.predict(_rand_pixels(tiny_cfg.image_size, seed=i))

    threads = [threading.Thread(target=call, args=(i,)) for i in range(9)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
    assert len(results) == 9
    # determinism: same image -> same class whichever batch it landed in
    again = service.predict(_rand_pixels(tiny_cfg.image_size, seed=3))
    assert again["index"] == results[3]["index"]
    np.testing.assert_allclose(
        sorted(again["probs"].values()), sorted(results[3]["probs"].values()),
        atol=2e-3,
    )


def test_sharded_serving_matches_single_device(model, tiny_cfg):
    """A PredictService over a data-parallel mesh serves identical
    predictions to the single-device service (virtual 8-device CPU mesh)."""
    import jax
    import pytest as _pytest

    if len(jax.devices()) < 8:
        _pytest.skip("needs 8 virtual devices")
    from tapclip_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(dp=8, tp=1)
    svc = PredictService(model, batch_size=8, max_latency_ms=5.0, mesh=mesh)
    try:
        px = [_rand_pixels(tiny_cfg.image_size, seed=50 + i) for i in range(8)]
        results = {}

        def call(i):
            results[i] = svc.predict(px[i], timeout=300)

        threads = [threading.Thread(target=call, args=(i,)) for i in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        assert len(results) == 8
        import jax.numpy as jnp

        for i in range(8):
            direct = model(jnp.asarray(px[i][None]))
            idx = int(np.asarray(direct["logits"]).argmax())
            assert results[i]["index"] == idx, i
    finally:
        svc.close()

    # batch size must divide the data axis
    with pytest.raises(ValueError, match="divisible"):
        PredictService(model, batch_size=6, mesh=mesh).close()


def test_sharded_serving_uint8_transport(model, tiny_cfg):
    """Sharded serving composes with the raw-uint8 transport: a uint8 batch
    device_put with a data sharding predicts like the direct model."""
    import jax
    import pytest as _pytest

    if len(jax.devices()) < 8:
        _pytest.skip("needs 8 virtual devices")
    import jax.numpy as jnp

    from tapclip_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(dp=8, tp=1)
    svc = PredictService(model, batch_size=8, max_latency_ms=5.0, mesh=mesh)
    try:
        rng = np.random.default_rng(9)
        raws = [rng.integers(0, 256, (tiny_cfg.image_size,) * 2 + (3,))
                .astype(np.uint8) for _ in range(8)]
        results = {}

        def call(i):
            results[i] = svc.predict(raws[i], timeout=300)

        threads = [threading.Thread(target=call, args=(i,)) for i in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        assert len(results) == 8
        for i in (0, 7):
            direct = model(jnp.asarray(raws[i][None]))
            idx = int(np.asarray(direct["logits"]).argmax())
            assert results[i]["index"] == idx, i
    finally:
        svc.close()


def test_uint8_transport_matches_f32(service, model, tiny_cfg):
    """Raw-uint8 payloads (normalized on device) must predict identically to
    the host-normalized f32 path — the 4x-less-transfer serving mode."""
    from tapclip_tpu.config import IMAGE_MEAN, IMAGE_STD
    from tapclip_tpu.serve import decode_image_payload

    size = tiny_cfg.image_size
    rng = np.random.default_rng(5)
    raw = rng.integers(0, 256, (size, size, 3)).astype(np.uint8)

    # decode: keep_uint8 passes raw bytes through; default normalizes.
    u8 = decode_image_payload({"pixels": raw.tolist()}, size, keep_uint8=True)
    assert u8.dtype == np.uint8
    np.testing.assert_array_equal(u8, raw)
    f32 = decode_image_payload({"pixels": raw.tolist()}, size)
    assert f32.dtype == np.float32

    out_u8 = service.predict(u8)
    out_f32 = service.predict(f32)
    assert out_u8["index"] == out_f32["index"]
    for k in out_u8["probs"]:
        assert abs(out_u8["probs"][k] - out_f32["probs"][k]) < 1e-3

    # explain() accepts uint8 too
    ex = service.explain(u8)
    assert ex["index"] == out_u8["index"]


def test_sustained_concurrent_load(service, model, tiny_cfg):
    """Closed-loop load (scripts/serve_bench.py shape): N client threads each
    streaming requests back-to-back. Every response must be correct against
    a direct model call, and the batcher must actually aggregate (mean
    batch fill > 1 under concurrent load)."""
    import jax.numpy as jnp

    n_clients, per_client = 4, 6
    base = service.stats()
    results = {}
    lock = threading.Lock()

    def client(cid):
        for r in range(per_client):
            seed = 100 + cid * per_client + r
            out = service.predict(_rand_pixels(tiny_cfg.image_size, seed=seed),
                                  timeout=120)
            with lock:
                results[seed] = out

    threads = [threading.Thread(target=client, args=(i,)) for i in range(n_clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=240)
    assert len(results) == n_clients * per_client

    stats = service.stats()
    served = stats["requests"] - base["requests"]
    batches = stats["batches"] - base["batches"]
    assert served == n_clients * per_client
    # 4 concurrent streams against batch_size=4 must aggregate: strictly
    # fewer batches than requests.
    assert batches < served, (batches, served)

    # Correctness of every response vs a direct (unbatched) model call.
    for seed in (100, 107, 115, 123):
        direct = model(jnp.asarray(
            _rand_pixels(tiny_cfg.image_size, seed=seed)[None]))
        idx = int(np.asarray(direct["logits"]).argmax())
        assert results[seed]["index"] == idx, seed


def test_cached_text_path_matches_full_model(service, model, tiny_cfg):
    """The serving hot path (cached text feats + image tower + logits GEMM)
    must equal the full forward (image-independence identity)."""
    import jax.numpy as jnp

    px = _rand_pixels(tiny_cfg.image_size, seed=7)
    served = service.predict(px)
    direct = model(jnp.asarray(px[None]))
    direct_probs = np.exp(np.asarray(direct["logits"][0], np.float64))
    direct_probs /= direct_probs.sum()
    for j, name in enumerate(model.class_names):
        assert abs(served["probs"][name] - direct_probs[j]) < 1e-3, name


def test_explain_returns_attribution(service, model, tiny_cfg, tiny_prompt_cfg):
    out = service.explain(_rand_pixels(tiny_cfg.image_size, seed=5))
    assert out["class"] in CLASSES
    P = tiny_prompt_cfg.prompt_len
    assert set(out["attribution"]) == set(CLASSES)
    for name, row in out["attribution"].items():
        assert len(row) == P
        assert abs(sum(row) - 1.0) < 1e-3  # softmax-normalized per class


def test_add_class_live(service, tiny_cfg):
    names = service.add_class("Clipboards")
    assert names[-1] == "Clipboards"
    out = service.predict(_rand_pixels(tiny_cfg.image_size))
    assert set(out["probs"].keys()) == set(CLASSES) | {"Clipboards"}


def test_decode_image_payload_base64(tiny_cfg):
    from PIL import Image

    rng = np.random.default_rng(0)
    img = Image.fromarray(rng.integers(0, 255, (40, 52, 3), np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    b64 = base64.b64encode(buf.getvalue()).decode()
    px = decode_image_payload({"image": b64}, tiny_cfg.image_size)
    assert px.shape == (tiny_cfg.image_size, tiny_cfg.image_size, 3)
    assert px.dtype == np.float32


def test_decode_image_payload_pixels(tiny_cfg):
    s = tiny_cfg.image_size
    px = decode_image_payload(
        {"pixels": np.zeros((s, s, 3), np.uint8).tolist()}, s
    )
    # zeros -> (0 - mean)/std, CLIP-normalized
    assert px.min() < 0
    with pytest.raises(ValueError):
        decode_image_payload({"pixels": np.zeros((s + 1, s, 3)).tolist()}, s)
    with pytest.raises(ValueError):
        decode_image_payload({}, s)


def test_http_endpoints(service, tiny_cfg):
    server = make_http_server(service, "127.0.0.1", 0)  # ephemeral port
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{port}"
    try:
        def get(path):
            with urllib.request.urlopen(base + path, timeout=30) as r:
                return json.loads(r.read())

        def post(path, obj):
            req = urllib.request.Request(
                base + path, json.dumps(obj).encode(),
                {"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=60) as r:
                return json.loads(r.read())

        h = get("/health")
        assert h["status"] == "ok" and h["classes"] == len(CLASSES)
        assert h["requests"] >= 1 and h["batches"] >= 1  # fixture warm-up
        assert h["mean_batch_ms"] > 0
        assert get("/classes")["classes"] == CLASSES

        s = tiny_cfg.image_size
        out = post("/predict", {"pixels": np.zeros((s, s, 3), np.uint8).tolist()})
        assert out["class"] in CLASSES

        out = post("/classes", {"name": "Clipboards"})
        assert "Clipboards" in out["classes"]

        # bad payload -> 400 with error body
        req = urllib.request.Request(
            base + "/predict", b"{}", {"Content-Type": "application/json"}
        )
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req, timeout=30)
        assert e.value.code == 400
    finally:
        server.shutdown()
        server.server_close()


def test_serving_image_conditioned_model(tiny_cfg, tiny_params, tiny_prompt_cfg):
    """The conditioned model serves through the full-forward path (the text
    cache is bypassed — its text pass is per-sample by definition)."""
    import dataclasses

    cfg_p = dataclasses.replace(tiny_prompt_cfg, image_conditioned=True)
    model = FullModel(CLASSES, tiny_params, tiny_cfg, prompt_cfg=cfg_p)
    svc = PredictService(model, batch_size=2, max_latency_ms=5.0)
    try:
        out = svc.predict(_rand_pixels(tiny_cfg.image_size), timeout=300)
        assert out["class"] in CLASSES
        assert abs(sum(out["probs"].values()) - 1.0) < 1e-3
    finally:
        svc.close()


def test_decode_dark_integer_pixels(tiny_cfg):
    """Regression: all-dark 0-255 integer payloads (max <= 2) must still be
    scaled by 1/255, not treated as already-normalized floats."""
    s = tiny_cfg.image_size
    dark = np.full((s, s, 3), 2, np.int64)
    px = decode_image_payload({"pixels": dark.tolist()}, s)
    from tapclip_tpu.config import IMAGE_MEAN, IMAGE_STD

    expected = (2 / 255.0 - np.asarray(IMAGE_MEAN, np.float32)) / np.asarray(
        IMAGE_STD, np.float32
    )
    np.testing.assert_allclose(px[0, 0], expected, rtol=1e-5)


def test_hot_reload_weights(service, model, tiny_cfg, tmp_path):
    """POST-free direct reload: new tower weights swap in with no retrace,
    predictions change, class vocabulary and trained prompt state persist,
    and a wrong-geometry tree is rejected leaving the service intact."""
    import jax
    import orbax.checkpoint as ocp

    from tapclip_tpu.models import clip as C

    px = _rand_pixels(tiny_cfg.image_size, seed=3)
    before = service.predict(px)

    new_tree = C.init_clip_params(jax.random.PRNGKey(99), tiny_cfg)
    ckpt = tmp_path / "reloaded"
    ocp.PyTreeCheckpointer().save(
        str(ckpt), jax.tree.map(np.asarray, new_tree)
    )
    out = service.reload_weights(str(ckpt))
    assert out["reloaded"] is True and out["classes"] == CLASSES

    after = service.predict(px)
    assert set(after["probs"]) == set(CLASSES)
    assert any(
        abs(after["probs"][c] - before["probs"][c]) > 1e-6 for c in CLASSES
    )

    # wrong geometry -> loud error, service keeps working on the new weights
    bad_cfg = tiny_cfg.replace(embed_dim=tiny_cfg.embed_dim * 2)
    bad = C.init_clip_params(jax.random.PRNGKey(1), bad_cfg)
    with pytest.raises(ValueError, match="shape mismatch"):
        service.reload_weights(bad)
    again = service.predict(px)
    assert again["probs"] == after["probs"]


def test_hot_reload_http_route(service, tiny_cfg, tmp_path):
    import jax
    import orbax.checkpoint as ocp

    from tapclip_tpu.models import clip as C

    server = make_http_server(service, port=0)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        tree = C.init_clip_params(jax.random.PRNGKey(5), tiny_cfg)
        ckpt = tmp_path / "http_reload"
        ocp.PyTreeCheckpointer().save(str(ckpt), jax.tree.map(np.asarray, tree))
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/reload",
            data=json.dumps({"path": str(ckpt)}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=60) as r:
            out = json.loads(r.read())
        assert out["reloaded"] is True
    finally:
        server.shutdown()


def test_embed_image(service, model, tiny_cfg):
    """/embed returns the L2-normalized image feature and matches a direct
    tower call (it rides the predict executable)."""
    import jax.numpy as jnp

    from tapclip_tpu.models import clip as C

    px = _rand_pixels(tiny_cfg.image_size, seed=11)
    emb = np.asarray(service.embed(px)["embedding"], np.float32)
    assert emb.shape == (tiny_cfg.embed_dim,)
    assert abs(float(np.linalg.norm(emb)) - 1.0) < 1e-2
    ref = C.l2_normalize(
        C.encode_image(model.clip_params, tiny_cfg, jnp.asarray(px[None]))
    )[0]
    np.testing.assert_allclose(emb, np.asarray(ref, np.float32), atol=2e-3)


def test_embed_and_predict_share_batches(service, tiny_cfg):
    """Mixed /embed + /predict traffic batches together; each caller gets
    its own result kind."""
    results = {}

    def call(i):
        px = _rand_pixels(tiny_cfg.image_size, seed=100 + i)
        results[i] = (service.embed(px) if i % 2 else service.predict(px))

    threads = [threading.Thread(target=call, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
    assert len(results) == 8
    for i, out in results.items():
        assert ("embedding" in out) == bool(i % 2)


def test_embed_text(service, model, tiny_cfg):
    """/embed_text: unit-norm rows, one per input, pad rows never leak, and
    the power-of-two padding doesn't change any row's value."""
    texts = ["a photo of a backpack", "a pen", "a monitor on a desk"]
    out = service.embed_text(texts)
    embs = np.asarray(out["embeddings"], np.float32)
    assert embs.shape == (3, tiny_cfg.embed_dim)
    np.testing.assert_allclose(
        np.linalg.norm(embs, axis=-1), np.ones(3), atol=1e-2
    )
    solo = np.asarray(service.embed_text([texts[0]])["embeddings"],
                      np.float32)
    np.testing.assert_allclose(solo[0], embs[0], atol=1e-4)
    assert service.embed_text([]) == {"embeddings": []}


def test_http_embed_routes(service, tiny_cfg):
    server = make_http_server(service, "127.0.0.1", 0)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{port}"
    try:
        def post(path, obj):
            req = urllib.request.Request(
                base + path, json.dumps(obj).encode(),
                {"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=60) as r:
                return json.loads(r.read())

        s = tiny_cfg.image_size
        out = post("/embed", {"pixels": np.zeros((s, s, 3), np.uint8).tolist()})
        assert len(out["embedding"]) == tiny_cfg.embed_dim
        out = post("/embed_text", {"texts": ["a pen", "a backpack"]})
        assert len(out["embeddings"]) == 2
        assert len(out["embeddings"][0]) == tiny_cfg.embed_dim
    finally:
        server.shutdown()
        server.server_close()


def test_http_metrics_prometheus(service, tiny_cfg):
    """GET /metrics serves the traffic counters in Prometheus text format."""
    server = make_http_server(service, "127.0.0.1", 0)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{port}"
    try:
        s = tiny_cfg.image_size
        req = urllib.request.Request(
            base + "/predict",
            json.dumps({"pixels": np.zeros((s, s, 3), np.uint8).tolist()}).encode(),
            {"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=60):
            pass
        with urllib.request.urlopen(base + "/metrics", timeout=30) as r:
            assert r.headers["Content-Type"].startswith("text/plain")
            body = r.read().decode()
        lines = dict(
            l.split(" ", 1) for l in body.strip().splitlines()
            if not l.startswith("#")
        )
        assert float(lines["tapclip_requests_total"]) >= 1
        assert float(lines["tapclip_classes"]) == len(service.model.class_names)
        assert "tapclip_batch_ms_mean" in lines
    finally:
        server.shutdown()
        server.server_close()


def test_predict_batch_position_invariant(service, tiny_cfg):
    """The same image gives the same probabilities regardless of which slot
    of the micro-batch it lands in or what else shares the batch — the
    determinism contract production scoring relies on."""
    px = _rand_pixels(tiny_cfg.image_size, seed=7)
    solo = service.predict(px)

    results = {}

    def call(i):
        if i == 3:
            results[i] = service.predict(px)
        else:
            results[i] = service.predict(
                _rand_pixels(tiny_cfg.image_size, seed=200 + i))

    threads = [threading.Thread(target=call, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
    assert results[3]["index"] == solo["index"]
    for name, p in solo["probs"].items():
        assert abs(results[3]["probs"][name] - p) < 1e-5


def test_temperature_scales_probs_not_ranking(model):
    px = _rand_pixels(model.clip_cfg.image_size, seed=42)
    base = PredictService(model, batch_size=2, max_latency_ms=5.0)
    try:
        r1 = base.predict(px, timeout=300)
    finally:
        base.close()
    hot = PredictService(model, batch_size=2, max_latency_ms=5.0,
                         temperature=2.0)
    try:
        r2 = hot.predict(px, timeout=300)
    finally:
        hot.close()
    assert r2["class"] == r1["class"]  # argmax invariant
    p1 = np.array([r1["probs"][n] for n in CLASSES])
    p2 = np.array([r2["probs"][n] for n in CLASSES])
    # T=2 flattens: re-derive p2 from p1 (softmax of logits/2 == softmax of
    # (log p1)/2 up to the shared constant)
    expect = np.exp(np.log(np.maximum(p1, 1e-9)) / 2.0)
    expect /= expect.sum()
    np.testing.assert_allclose(p2, expect, atol=2e-3)
    with pytest.raises(ValueError, match="temperature"):
        PredictService(model, temperature=0.0)
