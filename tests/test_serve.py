"""Serving: real HTTP round-trips against a live server — predict (path and
inline mask modes), model selection, batching under concurrency, error paths,
stats endpoint."""

import json
import http.client
import os
import threading

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from mdeical_image_segmentation_tpu.models import UNetConfig, UNetModel
from mdeical_image_segmentation_tpu.serve import ModelRegistry, SegmentationServer


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    root = tmp_path_factory.mktemp("serve")
    registry = ModelRegistry()
    for name, base in [("small", 4), ("tiny", 2)]:
        model = UNetModel(
            UNetConfig(in_channels=1, out_channels=1, unet_type="UNet",
                       base_features=base)
        )
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 1)))
        path = str(root / name)
        model.save_pretrained(path, variables)
        registry.register_unet2d(name, path, resolution=64)

    srv = SegmentationServer(registry, output_dir=str(root / "masks"),
                             max_batch=4, max_wait_ms=10.0)
    httpd = srv.start(host="127.0.0.1", port=0)
    port = httpd.server_address[1]
    yield srv, port, root
    srv.stop()


def _post(port, payload):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
    conn.request("POST", "/", json.dumps(payload),
                 {"Content-Type": "application/json"})
    resp = conn.getresponse()
    body = json.loads(resp.read())
    conn.close()
    return resp.status, body


def _get(port, path):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
    conn.request("GET", path)
    resp = conn.getresponse()
    body = json.loads(resp.read())
    conn.close()
    return resp.status, body


@pytest.fixture(scope="module")
def image_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("imgs") / "scan.png"
    rs = np.random.RandomState(0)
    Image.fromarray((rs.rand(80, 100) * 255).astype(np.uint8)).save(p)
    return str(p)


def test_health_and_models(server):
    _, port, _ = server
    status, body = _get(port, "/health")
    assert status == 200 and body["status"] == "ok"
    status, body = _get(port, "/models")
    assert body["models"] == ["small", "tiny"]
    assert body["default"] == "small"


def test_predict_returns_mask_path(server, image_path):
    _, port, _ = server
    status, body = _post(port, {"image_path": image_path})
    assert status == 200, body
    assert body["model"] == "small"
    mask_path = body["response"]
    assert os.path.exists(mask_path)
    mask = np.asarray(Image.open(mask_path))
    assert mask.shape == (64, 64)
    assert set(np.unique(mask)) <= {0, 255}


def test_model_selection(server, image_path):
    _, port, _ = server
    status, body = _post(port, {"image_path": image_path, "model": "tiny"})
    assert status == 200 and body["model"] == "tiny"


def test_inline_mask(server, image_path):
    _, port, _ = server
    status, body = _post(port, {"image_path": image_path, "return": "mask"})
    assert status == 200
    mask = np.asarray(body["response"])
    assert mask.shape == (64, 64)


def test_inline_png_mask_matches_list_mask(server, image_path):
    """'return': 'png' sends the raw label mask as base64 PNG — identical
    content to the nested-list return at a fraction of the payload size."""
    import base64
    import io

    _, port, _ = server
    status, body = _post(port, {"image_path": image_path, "return": "png"})
    assert status == 200
    png_bytes = base64.b64decode(body["response"])
    decoded = np.asarray(Image.open(io.BytesIO(png_bytes)))
    assert decoded.shape == (64, 64)

    status, body2 = _post(port, {"image_path": image_path, "return": "mask"})
    np.testing.assert_array_equal(decoded, np.asarray(body2["response"]))
    # the whole point: payload far smaller than the JSON list encoding
    assert len(body["response"]) < len(json.dumps(body2["response"])) / 10


def test_unknown_model_400(server, image_path):
    _, port, _ = server
    status, body = _post(port, {"image_path": image_path, "model": "nope"})
    assert status == 400
    assert "unknown model" in body["response"]


def test_missing_image_404(server):
    _, port, _ = server
    status, body = _post(port, {"image_path": "/does/not/exist.png"})
    assert status == 404


def test_invalid_json_400(server):
    _, port, _ = server
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
    conn.request("POST", "/", "{not json", {"Content-Type": "application/json"})
    resp = conn.getresponse()
    assert resp.status == 400
    conn.close()


def test_concurrent_requests_batched(server, image_path):
    _, port, _ = server
    results = []

    def hit():
        results.append(_post(port, {"image_path": image_path, "return": "mask"}))

    threads = [threading.Thread(target=hit) for _ in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert all(s == 200 for s, _ in results)


def test_engine_pads_batches_to_pow2():
    """Non-pow2 coalesced batches reach the forward padded (3 → 4) and each
    request still gets its own sample's result back."""
    from mdeical_image_segmentation_tpu.serve.app import (
        BatchingInferenceEngine, ModelEntry, ModelRegistry)

    seen = []

    def forward(x):
        seen.append(x.shape[0])
        return x * 2.0

    registry = ModelRegistry()
    registry.register(
        ModelEntry(name="echo", forward=forward, in_channels=1,
                   resolution=2, threshold=0.5),
        default=True,
    )
    engine = BatchingInferenceEngine(registry, max_batch=8, max_wait_ms=200.0)
    try:
        payloads = [np.full((2, 2, 1), float(i), np.float32) for i in range(3)]
        out = [None] * 3

        def hit(i):
            out[i] = engine.infer("echo", payloads[i])

        threads = [threading.Thread(target=hit, args=(i,)) for i in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for i in range(3):
            np.testing.assert_array_equal(out[i], payloads[i] * 2.0)
        # every device batch the forward saw was a power of two
        assert seen and all(b & (b - 1) == 0 for b in seen)
        assert sum(min(b, 3) for b in seen) >= 3
    finally:
        engine.stop()


def test_engine_pipelined_dispatch_fetch():
    """Entries with dispatch/fetch run the two-stage pipeline: the worker
    keeps one batch in flight and syncs it only after dispatching the next
    (or immediately when the queue is idle).  Asserts correctness across
    many overlapping batches, that dispatch really was used, and that a
    lone request isn't deferred waiting for a successor."""
    import time as _time

    from mdeical_image_segmentation_tpu.serve.app import (
        BatchingInferenceEngine, ModelEntry, ModelRegistry)

    dispatched, fetched = [], []

    def dispatch(x):
        dispatched.append(x.shape[0])
        return ("handle", x * 2.0)

    def fetch(handle):
        tag, arr = handle
        assert tag == "handle"
        fetched.append(arr.shape[0])
        _time.sleep(0.01)  # simulated device time, overlapped by the worker
        return arr

    def forward(x):  # must NOT be called when dispatch/fetch are set
        raise AssertionError("serial forward used despite dispatch/fetch")

    registry = ModelRegistry()
    registry.register(
        ModelEntry(name="pipe", forward=forward, in_channels=1, resolution=2,
                   threshold=0.5, dispatch=dispatch, fetch=fetch),
        default=True,
    )
    engine = BatchingInferenceEngine(registry, max_batch=4, max_wait_ms=2.0)
    try:
        n = 16
        payloads = [np.full((2, 2, 1), float(i), np.float32) for i in range(n)]
        out = [None] * n

        def hit(i):
            out[i] = engine.infer("pipe", payloads[i])

        threads = [threading.Thread(target=hit, args=(i,)) for i in range(n)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for i in range(n):
            np.testing.assert_array_equal(out[i], payloads[i] * 2.0)
        assert dispatched and fetched  # pipeline path exercised
        assert sum(fetched) == sum(dispatched)

        # a lone request finalizes promptly (no successor batch needed)
        t0 = _time.monotonic()
        lone = engine.infer("pipe", payloads[0], timeout=5.0)
        assert _time.monotonic() - t0 < 2.0
        np.testing.assert_array_equal(lone, payloads[0] * 2.0)
    finally:
        engine.stop()


def test_engine_fill_drain_coalesces_while_in_flight():
    """drain_policy='fill': while a dispatched batch is in flight (ready
    probe False), the worker keeps coalescing batch k+1 past max_wait_ms —
    requests trickling in with gaps >> max_wait land in ONE batch instead
    of fragmenting (the round-4 eager policy's occupancy collapse).

    Deterministic choreography: dispatch() blocks on a gate, so the test
    controls exactly which requests are queued when the worker collects."""
    import time as _time

    from mdeical_image_segmentation_tpu.serve.app import (
        BatchingInferenceEngine, ModelEntry, ModelRegistry)

    dispatched = []            # batch sizes, in dispatch order
    dispatch_gate = threading.Semaphore(0)   # test releases each dispatch
    dispatch_seen = threading.Semaphore(0)   # worker announces each arrival
    device_done = threading.Event()          # ready-probe flag

    def dispatch(x):
        dispatch_seen.release()
        assert dispatch_gate.acquire(timeout=10.0)
        dispatched.append(x.shape[0])
        return x

    registry = ModelRegistry()
    registry.register(
        ModelEntry(name="fill", forward=lambda x: x, in_channels=1,
                   resolution=2, dispatch=dispatch, fetch=np.asarray,
                   ready=lambda h: device_done.is_set()),
        default=True,
    )
    engine = BatchingInferenceEngine(
        registry, max_batch=8, max_wait_ms=2.0, pad_to_pow2=False,
        drain_policy="fill", pipeline_fill_cap_ms=5000.0)
    try:
        results = []

        def hit():
            results.append(engine.infer("fill", np.zeros((2, 2, 1),
                                                         np.float32),
                                        timeout=30.0))

        threads = [threading.Thread(target=hit) for _ in range(4)]
        threads[0].start()
        assert dispatch_seen.acquire(timeout=10.0)  # batch [A] collecting
        # queue B BEFORE releasing A's dispatch, so the worker's next
        # q.get(timeout=0) deterministically grabs it (no finalize race)
        threads[1].start()
        _time.sleep(0.2)
        dispatch_gate.release()          # A goes in flight (ready: False)
        # C and D trickle in with gaps far beyond max_wait_ms=2 — the fill
        # policy must hold B and keep coalescing because A isn't ready
        _time.sleep(0.2)
        threads[2].start()
        _time.sleep(0.2)
        threads[3].start()
        _time.sleep(0.2)
        device_done.set()                # A's result is ready → dispatch now
        assert dispatch_seen.acquire(timeout=10.0)
        dispatch_gate.release()          # [B, C, D] goes in flight
        for t in threads:
            t.join(timeout=30.0)
        assert dispatched == [1, 3], (
            f"fill policy fragmented the trickle: {dispatched}")
        assert len(results) == 4
        occ = engine.occupancy()["fill"]
        assert occ["batches"] == 2 and occ["requests"] == 4
    finally:
        dispatch_gate.release()
        engine.stop()


def test_engine_fill_drain_coalesces_when_probe_already_ready():
    """Regression (r5 review): when the ready probe is ALREADY True at the
    moment batch k+1 starts collecting (the common case right after a device
    completion), 'fill' must degrade to an eager max_wait window — the
    original break-on-ready dispatched size-1 batches and measured 0.939x
    vs eager at c16."""
    import time as _time

    from mdeical_image_segmentation_tpu.serve.app import (
        BatchingInferenceEngine, ModelEntry, ModelRegistry)

    dispatched = []
    dispatch_gate = threading.Semaphore(0)
    dispatch_seen = threading.Semaphore(0)
    device_done = threading.Event()

    def dispatch(x):
        dispatch_seen.release()
        assert dispatch_gate.acquire(timeout=10.0)
        dispatched.append(x.shape[0])
        return x

    registry = ModelRegistry()
    registry.register(
        ModelEntry(name="fill2", forward=lambda x: x, in_channels=1,
                   resolution=2, dispatch=dispatch, fetch=np.asarray,
                   ready=lambda h: device_done.is_set()),
        default=True,
    )
    engine = BatchingInferenceEngine(
        registry, max_batch=8, max_wait_ms=50.0, pad_to_pow2=False,
        drain_policy="fill", pipeline_fill_cap_ms=5000.0)
    try:
        results = []

        def hit():
            results.append(engine.infer("fill2", np.zeros((2, 2, 1),
                                                          np.float32),
                                        timeout=30.0))

        threads = [threading.Thread(target=hit) for _ in range(4)]
        threads[0].start()
        assert dispatch_seen.acquire(timeout=10.0)  # A collected, gated
        # B, C, D all queued while A's dispatch is gate-blocked; the probe
        # reads ready=True from the very first poll of the next collection
        for t in threads[1:]:
            t.start()
        _time.sleep(0.3)
        device_done.set()
        dispatch_gate.release()          # A in flight; worker collects next
        assert dispatch_seen.acquire(timeout=10.0)
        dispatch_gate.release()          # must be ONE batch [B, C, D]
        for t in threads:
            t.join(timeout=30.0)
        assert dispatched == [1, 3], (
            f"ready-at-start fragmented the queue: {dispatched}")
        assert len(results) == 4
    finally:
        dispatch_gate.release()
        engine.stop()


def test_stats_percentiles(server):
    _, port, _ = server
    status, body = _get(port, "/stats")
    assert status == 200
    assert body["count"] >= 10
    assert "p50_ms" in body and body["p50_ms"] > 0


def test_register_unet3d_slice_model(tmp_path):
    """3D-family 2D-variant model (UNet2D) served from a training checkpoint."""
    import jax

    from mdeical_image_segmentation_tpu.models import get_model
    from mdeical_image_segmentation_tpu.serve import ModelRegistry, SegmentationServer
    from mdeical_image_segmentation_tpu.train import save_checkpoint

    mc = {"name": "UNet2D", "in_channels": 1, "out_channels": 1, "f_maps": 8,
          "num_levels": 2}
    model = get_model(mc)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 1)), False)
    save_checkpoint(
        {"num_epochs": 0, "num_iterations": 0,
         "model_state_dict": {"params": variables["params"], "batch_stats": {}},
         "best_eval_score": 0.0, "optimizer_state_dict": {}},
        is_best=True, checkpoint_dir=str(tmp_path / "ck"),
    )
    registry = ModelRegistry()
    registry.register_unet3d(
        "slice3d", str(tmp_path / "ck" / "best_checkpoint.msgpack"), mc,
        resolution=64,
    )
    srv = SegmentationServer(registry, output_dir=str(tmp_path / "masks"))
    httpd = srv.start(host="127.0.0.1", port=0)
    port = httpd.server_address[1]
    try:
        img = tmp_path / "img.png"
        Image.fromarray(
            (np.random.RandomState(0).rand(64, 64) * 255).astype(np.uint8)
        ).save(img)
        status, body = _post(port, {"image_path": str(img), "model": "slice3d"})
        assert status == 200, body
        assert os.path.exists(body["response"])
    finally:
        srv.stop()


def test_promptable_sam_serving(tmp_path):
    """SAM served over HTTP: point and box prompts, padding, error paths."""
    import jax

    from mdeical_image_segmentation_tpu.models.sam import SAMMed2D, save_sam
    from mdeical_image_segmentation_tpu.serve import ModelRegistry, SegmentationServer

    model = SAMMed2D(img_size=64, in_channels=1, embed_dim=64, encoder_depth=2,
                     encoder_heads=4, prompt_embed_dim=64)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 1)),
        jnp.zeros((1, 1, 2)), jnp.ones((1, 1), jnp.int32),
    )
    save_sam(str(tmp_path / "sam"), model, variables)

    registry = ModelRegistry()
    registry.register_sam("sam", str(tmp_path / "sam"))
    # threshold 0.0 → sigmoid probs all exceed it → all-ones mask, which
    # pins the PNG gray scaling below
    registry.register_sam("samall", str(tmp_path / "sam"), threshold=0.0)
    srv = SegmentationServer(registry, output_dir=str(tmp_path / "masks"))
    httpd = srv.start(host="127.0.0.1", port=0)
    port = httpd.server_address[1]
    try:
        img = tmp_path / "img.png"
        Image.fromarray(
            (np.random.RandomState(0).rand(64, 64) * 255).astype(np.uint8)
        ).save(img)

        # point prompt
        status, body = _post(port, {"image_path": str(img), "model": "sam",
                                    "points": [[32, 32]]})
        assert status == 200, body
        assert os.path.exists(body["response"])

        # mask PNG gray scaling: promptable probs are 2D (H, W), so the
        # class count is 2 and a positive binary mask must render as 255 —
        # NOT 255 // (width - 1) (review finding, round 3)
        status, body = _post(port, {"image_path": str(img),
                                    "model": "samall",
                                    "points": [[32, 32]]})
        assert status == 200, body
        vis = np.asarray(Image.open(body["response"]))
        assert vis.max() == 255 and set(np.unique(vis)) <= {0, 255}, (
            np.unique(vis))

        # point + box prompt (second program variant)
        status, body = _post(port, {"image_path": str(img), "model": "sam",
                                    "points": [[20, 20], [40, 40]],
                                    "point_labels": [1, 0],
                                    "box": [[8, 8], [56, 56]],
                                    "return": "mask"})
        assert status == 200, body
        assert np.asarray(body["response"]).shape == (64, 64)

        # no prompts at all → 400
        status, body = _post(port, {"image_path": str(img), "model": "sam"})
        assert status == 400
        # too many points → 400
        status, body = _post(port, {"image_path": str(img), "model": "sam",
                                    "points": [[1, 1]] * 20})
        assert status == 400
    finally:
        srv.stop()


def test_register_unet3d_true_3d_model(tmp_path):
    """A TRUE 3D model (is3d) serves 2D slices as depth-1 volumes over HTTP
    (regression: the rank-4 server batch used to crash 3D conv stacks)."""
    import jax

    from mdeical_image_segmentation_tpu.models import get_model
    from mdeical_image_segmentation_tpu.serve import ModelRegistry, SegmentationServer
    from mdeical_image_segmentation_tpu.train import save_checkpoint

    mc = {"name": "UNet3D", "in_channels": 1, "out_channels": 1, "f_maps": 8,
          "num_levels": 2, "layer_order": "gcr"}
    model = get_model(mc)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 2, 64, 64, 1)), False
    )
    save_checkpoint(
        {"num_epochs": 0, "num_iterations": 0,
         "model_state_dict": {"params": variables["params"], "batch_stats": {}},
         "best_eval_score": 0.0, "optimizer_state_dict": {}},
        is_best=True, checkpoint_dir=str(tmp_path / "ck"),
    )
    registry = ModelRegistry()
    registry.register_unet3d(
        "vol3d", str(tmp_path / "ck" / "best_checkpoint.msgpack"), mc,
        resolution=64,
    )
    srv = SegmentationServer(registry, output_dir=str(tmp_path / "masks"))
    httpd = srv.start(host="127.0.0.1", port=0)
    port = httpd.server_address[1]
    try:
        img = tmp_path / "img.png"
        Image.fromarray(
            (np.random.RandomState(0).rand(64, 64) * 255).astype(np.uint8)
        ).save(img)
        status, body = _post(port, {"image_path": str(img), "model": "vol3d"})
        assert status == 200, body
        assert os.path.exists(body["response"])
    finally:
        srv.stop()


def test_multiclass_mask_is_argmax(tmp_path):
    """out_channels > 1: the served mask is the argmax label map, not a
    threshold of channel 0 (which is background)."""
    from mdeical_image_segmentation_tpu.serve import ModelRegistry, SegmentationServer
    from mdeical_image_segmentation_tpu.serve.app import ModelEntry

    def fake_forward(x):  # (N, H, W, C_in) -> 3-class probs, class 2 wins
        n, h, w, _ = x.shape
        probs = np.zeros((n, h, w, 3), np.float32)
        probs[..., 0] = 0.8  # background confidently high — the old
        probs[..., 2] = 0.9  # threshold-on-channel-0 path returned all-1s
        return probs

    registry = ModelRegistry()
    registry.register(ModelEntry(name="mc", forward=fake_forward,
                                 in_channels=1, resolution=16), default=True)
    srv = SegmentationServer(registry, output_dir=str(tmp_path / "masks"))
    img = tmp_path / "img.png"
    Image.fromarray(np.zeros((16, 16), np.uint8)).save(img)
    out = srv.handle_predict({"image_path": str(img), "return": "mask"})
    assert out["status"] == 200
    mask = np.asarray(out["response"])
    assert mask.shape == (16, 16)
    assert (mask == 2).all()  # argmax label, not background threshold


def test_prompt_coordinates_rescaled(tmp_path):
    """Points/box in original-image pixel space are scaled into the model
    frame when the image is resized."""
    from mdeical_image_segmentation_tpu.serve import ModelRegistry, SegmentationServer
    from mdeical_image_segmentation_tpu.serve.app import ModelEntry

    registry = ModelRegistry()
    entry = ModelEntry(name="p", forward=lambda x: x, in_channels=1,
                       resolution=64, kind="promptable", max_points=4)
    registry.register(entry, default=True)
    srv = SegmentationServer(registry, output_dir=str(tmp_path / "m"))
    pts, lbl, box = srv._build_prompts(
        {"points": [[256, 128]], "box": [[0, 0], [512, 256]]},
        entry, orig_hw=(256, 512),  # height 256, width 512
    )
    np.testing.assert_allclose(pts[0], [32.0, 32.0])  # x: *64/512, y: *64/256
    np.testing.assert_allclose(box, [[0, 0], [64, 64]])
    assert lbl[0] == 1 and lbl[1] == -1


def test_register_unet2d_int8_quantized(tmp_path):
    """quantize='int8' (ops/quant.py): the first calib_batches forwards run
    float while collecting activation scales, later forwards take the s8
    conv path; masks must track the float registration closely."""
    model = UNetModel(
        UNetConfig(in_channels=1, out_channels=1, unet_type="UNet",
                   base_features=16)
    )
    variables = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 1)))
    path = str(tmp_path / "bundle")
    model.save_pretrained(path, variables)

    registry = ModelRegistry()
    registry.register_unet2d("float", path, resolution=64)
    registry.register_unet2d("int8", path, resolution=64, quantize="int8",
                            calib_batches=1)
    with pytest.raises(ValueError, match="quantize"):
        registry.register_unet2d("bad", path, quantize="fp8")

    rs = np.random.RandomState(7)
    x1 = rs.rand(2, 64, 64, 1).astype(np.float32)
    x2 = rs.rand(2, 64, 64, 1).astype(np.float32)
    f = registry.get("float").forward
    q = registry.get("int8").forward
    # request 1 calibrates (float path) — must match the float model exactly
    np.testing.assert_allclose(q(x1), f(x1), atol=1e-5)
    # request 2 runs int8 — probabilities close, thresholded masks agree
    pf, pq = f(x2), q(x2)
    assert np.abs(pf - pq).max() < 0.1
    assert ((pf > 0.5) == (pq > 0.5)).mean() > 0.98


def test_register_unet2d_tta_mirror(tmp_path):
    """tta=True serves sigmoid(mean over the 4 H/W flip-ensemble logits),
    each pass un-flipped back into place — verified against a hand-computed
    ensemble; composes with quantize='int8' (calibration pass = float)."""
    model = UNetModel(
        UNetConfig(in_channels=1, out_channels=1, unet_type="UNet",
                   base_features=16)
    )
    variables = model.init(jax.random.PRNGKey(2), jnp.zeros((1, 64, 64, 1)))
    path = str(tmp_path / "bundle")
    model.save_pretrained(path, variables)

    registry = ModelRegistry()
    registry.register_unet2d("tta", path, resolution=64, tta=True)
    registry.register_unet2d("tta_int8", path, resolution=64, tta=True,
                             quantize="int8")

    x = np.random.RandomState(9).rand(2, 64, 64, 1).astype(np.float32)
    # entries are transfer-compact (forward = uint8 mask); the float
    # probability contract lives on probs_forward (serve/app.py ModelEntry)
    got = registry.get("tta").probs_forward(x)

    outs = []
    for c in ([], [1], [2], [1, 2]):
        xa = jnp.flip(jnp.asarray(x), axis=c) if c else jnp.asarray(x)
        o = model.apply(variables, xa, None, train=False).logits
        outs.append(np.asarray(jnp.flip(o, axis=c) if c else o))
    want = jax.nn.sigmoid(jnp.asarray(np.mean(outs, axis=0)))
    np.testing.assert_allclose(got, np.asarray(want), rtol=2e-5, atol=2e-5)
    # ensemble must differ from the plain single-pass serving forward
    single = np.asarray(jax.nn.sigmoid(
        model.apply(variables, jnp.asarray(x), None, train=False).logits))
    assert np.abs(got - single).max() > 1e-4
    # int8+tta: probs_forward is the un-quantized fidelity reference —
    # matches the float ensemble exactly
    np.testing.assert_allclose(
        registry.get("tta_int8").probs_forward(x), got, atol=1e-5)
    # the compact serving forward (uint8 in, uint8 mask out) must agree
    # with thresholding the float ensemble probabilities
    xu = (x * 255.0).astype(np.uint8)
    mask = registry.get("tta").forward(xu)
    want_mask = (np.asarray(
        registry.get("tta").probs_forward(xu.astype(np.float32) / 255.0)
    )[..., 0] > 0.5).astype(np.uint8)
    np.testing.assert_array_equal(mask, want_mask)


def test_compact_transfer_mask_matches_host_math(tmp_path):
    """Transfer-compact entries (uint8 in, uint8 label mask out — the /255
    normalize and threshold/argmax run on device) must produce the exact
    mask the old float/probs path computed on host, for both binary
    (threshold) and multi-class (argmax) models."""
    registry = ModelRegistry()
    rs = np.random.RandomState(7)
    img = rs.randint(0, 256, (32, 32, 1), np.uint8)

    for out_ch, name in ((1, "bin"), (3, "multi")):
        model = UNetModel(
            UNetConfig(in_channels=1, out_channels=out_ch, unet_type="UNet",
                       base_features=4)
        )
        variables = model.init(jax.random.PRNGKey(out_ch),
                               jnp.zeros((1, 32, 32, 1)))
        path = str(tmp_path / name)
        model.save_pretrained(path, variables)
        registry.register_unet2d(name, path, resolution=32, threshold=0.5)

        entry = registry.get(name)
        assert entry.input_mode == "uint8" and entry.output_mode == "mask"
        assert entry.n_classes == max(out_ch, 2)

        got = entry.forward(img[None])
        assert got.dtype == np.uint8 and got.shape == (1, 32, 32)

        # host-side reference: float /255 image -> logits -> probs -> mask
        x = img[None].astype(np.float32) / 255.0
        logits = np.asarray(
            model.apply(variables, x, None, train=False).logits
        )
        if out_ch > 1:
            e = np.exp(logits - logits.max(-1, keepdims=True))
            expect = np.argmax(e / e.sum(-1, keepdims=True), -1)
        else:
            expect = (1 / (1 + np.exp(-logits[..., 0]))) > 0.5
        np.testing.assert_array_equal(got[0], expect[0].astype(np.uint8))


def test_compact_transfer_http_roundtrip(tmp_path):
    """A compact-transfer model still answers HTTP with the same mask
    contract (uint8 labels in JSON) end-to-end."""
    registry = ModelRegistry()
    model = UNetModel(UNetConfig(in_channels=1, out_channels=1,
                                 unet_type="UNet", base_features=2))
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1)))
    bundle = str(tmp_path / "m")
    model.save_pretrained(bundle, variables)
    registry.register_unet2d("m", bundle, resolution=32)

    srv = SegmentationServer(registry, output_dir=str(tmp_path / "masks"),
                             max_batch=4, max_wait_ms=5.0)
    httpd = srv.start(host="127.0.0.1", port=0)
    port = httpd.server_address[1]
    try:
        img_path = str(tmp_path / "img.png")
        Image.fromarray(
            (np.random.RandomState(1).rand(32, 32) * 255).astype(np.uint8)
        ).save(img_path)
        status, body = _post(port, {"image_path": img_path, "return": "mask"})
        assert status == 200
        mask = np.asarray(body["response"])
        assert mask.shape == (32, 32) and set(np.unique(mask)) <= {0, 1}
    finally:
        srv.stop()
