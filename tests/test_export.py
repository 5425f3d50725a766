"""AOT export artifacts (export.py): serialized forwards match the live
model at multiple batch sizes (symbolic batch), logits/probs variants,
meta contents, 3D bundles, serving an artifact end-to-end over HTTP, and
the tpuseg-export CLI."""

import http.client
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mdeical_image_segmentation_tpu.export import (
    detect_bundle_kind,
    export_bundle,
    load_exported,
)
from mdeical_image_segmentation_tpu.models import (
    UNet3DConfig,
    UNet3DForMedicalSegmentation,
    UNetConfig,
    UNetModel,
)
from mdeical_image_segmentation_tpu.serve import ModelRegistry, SegmentationServer

RES = (32, 32)
PATCH = (8, 16, 16)


@pytest.fixture(scope="module")
def bundle2d(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("exp") / "unet2d")
    model = UNetModel(
        UNetConfig(in_channels=1, out_channels=1, unet_type="UNet",
                   base_features=4)
    )
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1,) + RES + (1,)))
    model.save_pretrained(path, variables)
    return path, model, variables


@pytest.fixture(scope="module")
def bundle3d(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("exp3") / "unet3d")
    model = UNet3DForMedicalSegmentation(
        UNet3DConfig(unet_type="UNet3D", in_channels=1, out_channels=1,
                     f_maps=8, num_levels=2, num_groups=4,
                     final_sigmoid=True)
    )
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1,) + PATCH + (1,))
    )
    model.save_pretrained(path, variables)
    return path, model, variables


def test_detect_bundle_kind(bundle2d, bundle3d):
    assert detect_bundle_kind(bundle2d[0]) == "2d"
    assert detect_bundle_kind(bundle3d[0]) == "3d"


def test_export_2d_symbolic_batch_matches_live(bundle2d, tmp_path):
    path, model, variables = bundle2d
    out = export_bundle(path, str(tmp_path / "art"), resolution=RES,
                        platforms=("cpu",))
    loaded = load_exported(out)
    assert loaded.meta["input_shape"] == ["b", 32, 32, 1]
    rs = np.random.RandomState(0)
    for b in (2, 5):  # two batches through ONE symbolic-batch program
        x = rs.rand(b, *RES, 1).astype(np.float32)
        live = jax.nn.sigmoid(
            model.apply(variables, x, None, train=False).logits
        )
        np.testing.assert_allclose(loaded(x), np.asarray(live),
                                   rtol=1e-5, atol=1e-6)


def test_export_logits_variant(bundle2d, tmp_path):
    path, model, variables = bundle2d
    out = export_bundle(path, str(tmp_path / "art"), resolution=RES,
                        platforms=("cpu",), output="logits", batch=2)
    loaded = load_exported(out)
    assert loaded.meta["output"] == "logits"
    assert loaded.meta["input_shape"][0] == 2
    x = np.random.RandomState(1).rand(2, *RES, 1).astype(np.float32)
    live = model.apply(variables, x, None, train=False).logits
    np.testing.assert_allclose(loaded(x), np.asarray(live),
                               rtol=1e-5, atol=1e-6)


def test_export_3d_activated_output(bundle3d, tmp_path):
    path, model, variables = bundle3d
    out = export_bundle(path, str(tmp_path / "art"), patch_shape=PATCH,
                        platforms=("cpu",))
    loaded = load_exported(out)
    x = np.random.RandomState(2).rand(2, *PATCH, 1).astype(np.float32)
    live = model.apply(variables, x, train=False).logits  # activated (quirk)
    np.testing.assert_allclose(loaded(x), np.asarray(live),
                               rtol=1e-5, atol=1e-6)
    assert loaded.meta["kind"] == "3d"


def test_meta_and_artifact_files(bundle2d, tmp_path):
    out = export_bundle(bundle2d[0], str(tmp_path / "art"), resolution=RES,
                        platforms=("cpu",))
    meta = json.load(open(os.path.join(out, "export_meta.json")))
    blob = open(os.path.join(out, "model.jaxexport"), "rb").read()
    assert meta["artifact_bytes"] == len(blob)
    assert meta["platforms"] == ["cpu"]
    assert meta["unet_type"] == "UNet" and meta["output"] == "probs"


def test_serve_exported_artifact_http(bundle2d, tmp_path):
    """A tpuseg-export artifact serves over HTTP with no model code in the
    registry path (reference envelope: api/api.py:52-82)."""
    out = export_bundle(bundle2d[0], str(tmp_path / "art"), resolution=RES,
                        platforms=("cpu",))
    registry = ModelRegistry()
    registry.register_exported("aot", out)
    entry = registry.get("aot")
    assert entry.resolution == 32 and entry.in_channels == 1

    srv = SegmentationServer(registry, output_dir=str(tmp_path / "masks"),
                             max_batch=4, max_wait_ms=5.0)
    httpd = srv.start(host="127.0.0.1", port=0)
    port = httpd.server_address[1]
    try:
        from PIL import Image

        img_path = str(tmp_path / "img.png")
        Image.fromarray(
            (np.random.RandomState(3).rand(32, 32) * 255).astype(np.uint8)
        ).save(img_path)
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
        conn.request("POST", "/",
                     json.dumps({"image_path": img_path, "return": "mask"}),
                     {"Content-Type": "application/json"})
        resp = conn.getresponse()
        body = json.loads(resp.read())
        conn.close()
        assert resp.status == 200
        mask = np.asarray(body["response"])
        assert mask.shape == (32, 32) and set(np.unique(mask)) <= {0, 1}
    finally:
        srv.stop()


def test_register_exported_rejects_wrong_artifacts(bundle2d, bundle3d, tmp_path):
    registry = ModelRegistry()
    out3d = export_bundle(bundle3d[0], str(tmp_path / "a3"), patch_shape=PATCH,
                          platforms=("cpu",))
    with pytest.raises(ValueError, match="kind"):
        registry.register_exported("x", out3d)
    logits = export_bundle(bundle2d[0], str(tmp_path / "al"), resolution=RES,
                           platforms=("cpu",), output="logits")
    with pytest.raises(ValueError, match="probab"):
        registry.register_exported("x", logits)
    pinned = export_bundle(bundle2d[0], str(tmp_path / "ap"), resolution=RES,
                           platforms=("cpu",), batch=4)
    with pytest.raises(ValueError, match="batch"):
        registry.register_exported("x", pinned)


def test_cli_main(bundle2d, tmp_path, capsys):
    from mdeical_image_segmentation_tpu.cli.export import main

    out = str(tmp_path / "cli_art")
    main(["--model_dir", bundle2d[0], "--output", out,
          "--resolution", "32", "32", "--platforms", "cpu"])
    meta = json.loads(capsys.readouterr().out.strip())
    assert meta["kind"] == "2d" and os.path.exists(
        os.path.join(out, "model.jaxexport")
    )
