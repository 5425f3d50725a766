"""AOT model export — serialized StableHLO deployment artifacts (jax.export).

TPU extension with no reference counterpart: the reference "deploys" by
importing its model code and loading a torch checkpoint inside the FastAPI
process (/root/reference/api/api.py:20-50), so serving is pinned to the
training code tree.  Here ``tpuseg-export`` lowers the *inference forward*
(params baked in as program constants) to a serialized ``jax.export``
artifact that:

- runs in any process with jax installed — no model code, no flax, no
  checkpoint plumbing (``load_exported(...)(images)``);
- pins the exact compiled-from program that was validated (StableHLO with
  jax.export's calling-convention/custom-call compatibility guarantees);
- is lowered for BOTH ``tpu`` and ``cpu`` by default, so one artifact
  serves on TPU and smoke-tests on a dev machine;
- supports a *symbolic* batch dimension (export once, serve any batch —
  the serving engine's coalesced batches vary per tick), while spatial
  dims stay static (XLA/TPU wants static shapes on the hot path).

2D artifacts emit exactly what the serving path needs: probabilities
(sigmoid / multi-class softmax / CGM pass-through — the same dispatch as
``serve.app.ModelRegistry.register_unet2d``).  3D artifacts emit the
wrapper's activated output (the reference returns the *activated* tensor
from its 3D forward, UNet3D.py:151-154 — quirk preserved).  ``output=
"logits"`` skips the activation for consumers that compose their own.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Optional, Sequence, Tuple

import numpy as np

from .logging_utils import get_logger

logger = get_logger("export")

ARTIFACT_FILE = "model.jaxexport"
META_FILE = "export_meta.json"


def detect_bundle_kind(bundle_dir: str) -> str:
    """'2d' | '3d' from a saved bundle's config.json ``unet_type``."""
    from .models import MODELS_3D, UNET_TYPES

    with open(os.path.join(bundle_dir, "config.json")) as f:
        cfg = json.load(f)
    unet_type = cfg.get("unet_type", "")
    if unet_type in UNET_TYPES:
        return "2d"
    if unet_type in MODELS_3D:
        return "3d"
    raise ValueError(
        f"unrecognized unet_type {unet_type!r} in {bundle_dir}/config.json"
    )


def _probs_2d(model):
    """Probability head matching serve.app.register_unet2d's dispatch."""
    import jax

    def probs(logits):
        if model.config.unet_type.endswith("CGM"):
            return logits  # CGM forward is already sigmoided
        if model.config.out_channels > 1:
            return jax.nn.softmax(logits, axis=-1)
        return jax.nn.sigmoid(logits)

    return probs


def export_bundle(
    bundle_dir: str,
    out_dir: str,
    *,
    batch: Optional[int] = None,
    resolution: Tuple[int, int] = (512, 512),
    patch_shape: Tuple[int, int, int] = (32, 64, 64),
    platforms: Sequence[str] = ("cpu", "tpu"),
    output: str = "probs",
    compute_dtype: Optional[str] = None,
) -> str:
    """Lower a saved bundle's inference forward and serialize it.

    ``batch=None`` exports a symbolic batch dimension ``b``; an int pins
    it.  ``resolution`` (2D, H×W) / ``patch_shape`` (3D, D×H×W) set the
    static spatial dims.  ``compute_dtype`` overrides the bundle's conv
    compute dtype (e.g. ``"bfloat16"`` for MXU-native serving) without
    touching the fp32 params.  Returns ``out_dir``.
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jax_export

    if output not in ("probs", "logits"):
        raise ValueError(f"output={output!r}: expected 'probs' or 'logits'")
    kind = detect_bundle_kind(bundle_dir)

    if kind == "2d":
        from .models import UNetModel

        model, variables = UNetModel.from_pretrained(bundle_dir)
        if compute_dtype:
            model = UNetModel(
                dataclasses.replace(model.config, compute_dtype=compute_dtype)
            )
        probs = _probs_2d(model)

        def fn(x):
            logits = model.apply(variables, x, None, train=False).logits
            return probs(logits) if output == "probs" else logits

        spatial = tuple(resolution)
    else:
        from .models import UNet3DForMedicalSegmentation

        model, variables = UNet3DForMedicalSegmentation.from_pretrained(
            bundle_dir
        )
        if compute_dtype:
            model = UNet3DForMedicalSegmentation(
                dataclasses.replace(model.config, compute_dtype=compute_dtype)
            )
        if output == "probs":
            # wrapper.apply returns the ACTIVATED tensor in the logits slot
            # (reference quirk, UNet3D.py:151-154)
            def fn(x):
                return model.apply(variables, x, train=False).logits
        else:
            def fn(x):
                return model.module.apply(variables, x, False).astype(
                    jnp.float32
                )

        spatial = tuple(patch_shape) if model.config.is3d else tuple(
            patch_shape[-2:]
        )

    in_channels = int(model.config.in_channels)
    if batch is None:
        (b,) = jax_export.symbolic_shape("b")
        batch_dim: Any = b
    else:
        batch_dim = int(batch)
    spec = jax.ShapeDtypeStruct(
        (batch_dim,) + spatial + (in_channels,), jnp.float32
    )
    logger.info(
        f"exporting {bundle_dir} ({kind}, {model.config.unet_type}) "
        f"input {spec.shape} for platforms {tuple(platforms)}"
    )
    exported = jax_export.export(jax.jit(fn), platforms=tuple(platforms))(spec)
    blob = exported.serialize()

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, ARTIFACT_FILE), "wb") as f:
        f.write(blob)
    meta = {
        "kind": kind,
        "unet_type": model.config.unet_type,
        "in_channels": in_channels,
        "out_channels": int(model.config.out_channels),
        "input_shape": ["b" if batch is None else int(batch)]
        + [int(s) for s in spatial]
        + [in_channels],
        "input_dtype": "float32",
        "output": output,
        "platforms": list(platforms),
        "jax_version": jax.__version__,
        "calling_convention_version": int(
            exported.calling_convention_version
        ),
        "artifact_bytes": len(blob),
    }
    with open(os.path.join(out_dir, META_FILE), "w") as f:
        json.dump(meta, f, indent=2)
    logger.info(
        f"wrote {out_dir}/{ARTIFACT_FILE} ({len(blob) / 2**20:.2f} MiB)"
    )
    return out_dir


class ExportedModel:
    """A deserialized export artifact: ``model(images) -> np.ndarray``.

    Needs only jax at run time (params are constants inside the program).
    ``dispatch``/``fetch`` expose the non-blocking halves for the
    pipelined serving engine.
    """

    def __init__(self, exported, meta: Dict[str, Any]):
        import jax

        self.meta = meta
        self._exported = exported
        # exp.call retraces per call; jit caches per concrete input shape
        # (one compile per distinct batch under a symbolic-batch export)
        self._call = jax.jit(exported.call)

    @property
    def in_channels(self) -> int:
        return int(self.meta["in_channels"])

    @property
    def out_channels(self) -> int:
        return int(self.meta["out_channels"])

    @property
    def input_shape(self) -> Tuple[Any, ...]:
        return tuple(self.meta["input_shape"])

    def dispatch(self, x):
        import jax.numpy as jnp

        return self._call(jnp.asarray(x, jnp.float32))

    @staticmethod
    def fetch(handle) -> np.ndarray:
        return np.asarray(handle)

    def __call__(self, x) -> np.ndarray:
        return self.fetch(self.dispatch(x))


def load_exported(path: str) -> ExportedModel:
    """Load an artifact directory written by :func:`export_bundle`."""
    from jax import export as jax_export

    with open(os.path.join(path, META_FILE)) as f:
        meta = json.load(f)
    with open(os.path.join(path, ARTIFACT_FILE), "rb") as f:
        exported = jax_export.deserialize(f.read())
    return ExportedModel(exported, meta)
