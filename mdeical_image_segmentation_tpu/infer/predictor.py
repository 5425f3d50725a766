"""Sliding-window volumetric predictors with overlap-averaged recomposition.

Reference: /root/reference/model/unet3d/predictor.py.  The pipeline:

1. the test-phase HDF5 dataset yields halo-padded patches + their spatial
   slice indices;
2. a jitted batched forward runs each patch batch on device (UNet2D models
   get the z-squeeze treatment, predictor.py:119-128); the variable tail
   batch is padded to the full batch size so XLA compiles exactly one
   program;
3. the halo is stripped (remove_padding, predictor.py:131) and patches are
   accumulated into a (C, D, H, W) prediction map with a visit-count
   normalization mask (predictor.py:147-149);
4. the averaged map (optionally argmax → uint16 segmentation) is written as
   gzip H5 (predictor.py:164-168).

Parity note: like the reference, the *raw network output* (logits — the
final activation is constructed but not applied in forward) is accumulated;
pass ``apply_activation=True`` to average probabilities instead.

``LazyPredictor`` keeps the maps in chunked H5 datasets and normalizes in
1/27-volume slices (predictor.py:189-223); ``DSB2018Predictor`` runs per-image
2D predictions with threaded async writes + threshold/connected-components
segmentation (predictor.py:226-281 — with its missing-argument submit bug
fixed, as flagged in SURVEY.md §7).
"""

from __future__ import annotations

import os
import time
from concurrent import futures
from pathlib import Path
from typing import Any, Dict, Optional

import h5py
import jax
import jax.numpy as jnp
import numpy as np

from ..data.hdf5 import AbstractHDF5Dataset
from ..data.slice_builder import SliceBuilder
from ..logging_utils import get_logger
from ..transforms.skimage_compat import label as cc_label

logger = get_logger("UNetPredictor")


def _get_output_file(dataset, suffix="_predictions", output_dir=None) -> Path:
    input_dir, file_name = os.path.split(dataset.file_path)
    if output_dir is None:
        output_dir = input_dir
    return Path(output_dir) / (os.path.splitext(file_name)[0] + suffix + ".h5")


def _unpad_channels_last(batch: np.ndarray, halo) -> np.ndarray:
    """Strip spatial halo from (N, D, H, W, C) patches."""
    if halo is None or all(p == 0 for p in halo):
        return batch
    sl = (slice(None),) + tuple(slice(p, -p or None) for p in halo) + (slice(None),)
    return batch[sl]


class _AbstractPredictor:
    def __init__(
        self,
        model,
        variables,
        output_dir: str,
        out_channels: int,
        output_dataset: str = "predictions",
        save_segmentation: bool = False,
        prediction_channel: Optional[int] = None,
        apply_activation: bool = False,
        quantize: Optional[str] = None,
        calib_batches: int = 1,
        tta: Optional[str] = None,
        **kwargs,
    ):
        if kwargs:
            # strict config contract (same policy as the env knobs): a typo
            # like 'prediction_channels' must not silently disable a feature
            raise ValueError(
                f"unknown predictor config keys: {sorted(kwargs)}"
            )
        self.model = model
        self.variables = variables
        self.output_dir = output_dir
        self.out_channels = out_channels
        self.output_dataset = output_dataset
        self.save_segmentation = save_segmentation
        self.prediction_channel = prediction_channel
        self.apply_activation = apply_activation
        if quantize not in (None, "int8"):
            raise ValueError(f"predictor quantize={quantize!r}: expected 'int8'")
        # int8 PTQ (ops/quant.py): the first `calib_batches` batches run the
        # float forward while collecting activation scales, then the
        # s8×s8→s32 conv path takes over (measured 1.5-1.7× conv speedup on
        # v5e — PERF.md).  The reference has no quantized inference.
        self.quantize = quantize
        self.calib_batches = max(1, int(calib_batches))
        # Mirror test-time augmentation (TPU extension — the reference has no
        # TTA): the patch forward averages the raw network output over every
        # combination of spatial flips, flipped back into place.  Flips are
        # free layout ops on device and the whole ensemble stays inside one
        # jitted program.  'mirror' = all spatial axes (8 passes for 3D, 4
        # for 2D); 'mirror-hw' = H/W only (4 passes — the right choice for
        # anisotropic volumes where a z-flip is not a symmetry).  Averaging
        # is in the accumulated-output space (logits unless
        # apply_activation): probabilities derived from the averaged logits.
        if tta not in (None, "mirror", "mirror-hw"):
            raise ValueError(
                f"predictor tta={tta!r}: expected 'mirror' or 'mirror-hw'"
            )
        self.tta = tta
        self._quant_scales: Dict[str, Any] = {}
        self._calib_seen = 0
        self._forward = None
        self._batch_size = None

    def _compile_forward(self, batch_size: int):
        model = self.model
        is2d = not getattr(model, "is3d", True)
        apply_activation = self.apply_activation
        tta = self.tta

        if tta is None:
            flip_combos = None
        else:
            from ..ops.tta import mirror_combos

            # model-rank spatial axes: (N, H, W, C) for 2D (z squeezed),
            # (N, D, H, W, C) for 3D; 'mirror-hw' skips the depth axis.
            if is2d:
                axes = (1, 2)
            else:
                axes = (2, 3) if tta == "mirror-hw" else (1, 2, 3)
            flip_combos = mirror_combos(axes)

        def raw_apply(variables, x, **kw):
            if is2d:
                x = jnp.squeeze(x, axis=1)
            if flip_combos is None:
                return model.apply(variables, x, False, **kw)
            # mirror TTA (ops/tta.py): mean over the flip ensemble, each
            # output un-flipped; threads the calib quant collection.
            from ..ops.tta import flip_ensemble

            return flip_ensemble(
                lambda v, xx, **k: model.apply(v, xx, False, **k),
                flip_combos, variables, x, **kw,
            )

        def postprocess(out):
            if is2d:
                out = jnp.expand_dims(out, axis=1)
            if apply_activation:
                act = model.final_activation()
                if act is not None:
                    out = act(out)
            return out

        def forward(variables, x):
            return postprocess(raw_apply(variables, x))

        self._forward = jax.jit(forward)
        if self.quantize == "int8":
            from ..ops import quant as _q

            def calib(variables, qcoll, x):
                out, upd = _q.wrap_apply(raw_apply, "calib")(
                    {**variables, "quant": qcoll}, x, mutable=["quant"]
                )
                return postprocess(out), upd["quant"]

            def int8_fwd(variables, qcoll, x):
                return postprocess(
                    _q.wrap_apply(raw_apply, "int8")(
                        {**variables, "quant": qcoll}, x
                    )
                )

            self._calib_forward = jax.jit(calib)
            self._int8_forward = jax.jit(int8_fwd)
        self._batch_size = batch_size

    def _predict_batch_device(self, input) -> tuple:
        """Jitted forward with tail-padding to a single static batch shape.

        Returns ``(device_out, n_valid)`` WITHOUT fetching to host — the
        device-accumulate path chains the overlap-add directly on the
        output (padded tail rows included; callers mask them with
        ``n_valid``), so patch predictions never cross the tunnel.
        ``input`` may be a numpy array or an already-uploaded jax.Array
        (H2D prefetch).
        """
        n = input.shape[0]
        if self._forward is None:
            self._compile_forward(n)
        if n < self._batch_size:
            input = np.asarray(input)
            pad = np.repeat(input[-1:], self._batch_size - n, axis=0)
            input = np.concatenate([input, pad], axis=0)
        if self.quantize == "int8":
            if self._calib_seen < self.calib_batches:
                out_dev, self._quant_scales = self._calib_forward(
                    self.variables, self._quant_scales, jnp.asarray(input)
                )
                self._calib_seen += 1
            else:
                out_dev = self._int8_forward(
                    self.variables, self._quant_scales, jnp.asarray(input)
                )
            return out_dev, n
        return self._forward(self.variables, jnp.asarray(input)), n

    def _predict_batch(self, input: np.ndarray) -> np.ndarray:
        """Host-side variant (reference semantics): fetch + drop padded rows."""
        out_dev, n = self._predict_batch_device(input)
        return np.asarray(jax.device_get(out_dev))[:n]

    def __call__(self, test_loader):
        raise NotImplementedError


class StandardPredictor(_AbstractPredictor):
    """In-memory overlap-averaging predictor (reference predictor.py:65-168).

    With ``accumulate_on_device=True`` (default) the overlap-add runs on the
    accelerator via the Pallas/XLA kernel in ops.overlap — the prediction map
    never round-trips patches through the host; only the final averaged
    volume is fetched.  ``False`` gives the reference's host-accumulation
    behavior (also used by LazyPredictor's H5-backed maps).
    """

    def __init__(self, *args, accumulate_on_device: bool = True, **kwargs):
        super().__init__(*args, **kwargs)
        self.accumulate_on_device = accumulate_on_device

    def _prefetch_device_batches(self, test_loader, depth: int = 2):
        """Iterate ``(input_device_or_host, indices)`` with host assembly +
        H2D upload running one batch ahead in a worker thread (the trainer3d
        double-buffering pattern, applied to inference — round-4 verdict
        item 7).  Upload of batch k+1 overlaps device compute of batch k;
        with the device-side accumulate chain there is no per-batch D2H to
        hide at all."""
        import queue as _queue
        import threading as _threading

        q: "_queue.Queue" = _queue.Queue(maxsize=depth)
        stop = object()

        def producer():
            try:
                for input, indices in test_loader:
                    arr = np.asarray(input)
                    try:
                        arr = jax.device_put(arr)  # async H2D
                    except Exception:  # pragma: no cover - upload races
                        pass  # fall back to uploading on the consumer side
                    q.put((arr, indices))
                q.put(stop)
            except BaseException as exc:  # noqa: BLE001 - re-raised below
                q.put(exc)

        t = _threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                return
            if isinstance(item, BaseException):
                raise item
            yield item

    def _device_accumulate(self, test_loader, volume_shape, patch_halo):
        """Stream batches through forward + device overlap-add; returns the
        (C, D, H, W) numpy sum/count maps.

        The whole per-batch chain (forward → halo strip → channel select →
        overlap-add) stays on device: patch predictions are never fetched to
        host (the reference round-trips every patch through numpy,
        predictor.py:131-149), and the only H2D — the input patches — is
        prefetched a batch ahead.  Host↔device traffic per volume is one
        upload of the patches plus one download of the final averaged map.
        """
        import jax.numpy as jnp

        from ..ops.overlap import overlap_add_into

        n_ch = 1 if self.prediction_channel is not None else self.out_channels
        acc = jnp.zeros((*volume_shape, n_ch), jnp.float32)
        cnt = jnp.zeros((*volume_shape, n_ch), jnp.float32)
        # the first call probes WITHOUT donation: a pallas failure after
        # donation would have invalidated acc/cnt and made the XLA retry
        # impossible.  Donation kicks in from the second batch on.
        accumulate_probe = jax.jit(overlap_add_into)
        accumulate = jax.jit(overlap_add_into, donate_argnums=(0, 1))

        pc = self.prediction_channel

        @jax.jit
        def postpatch(pred):
            # device-side halo strip + channel select on the full (padded)
            # batch — padded tail rows ride along, masked by `valid`
            pred = _unpad_channels_last(pred, patch_halo)
            if pc is not None:
                pred = pred[..., pc : pc + 1]
            return pred

        batch_size = None
        for input, indices in self._prefetch_device_batches(test_loader):
            n = input.shape[0]
            if batch_size is None:
                batch_size = n
            out_dev, n = self._predict_batch_device(input)
            prediction = postpatch(out_dev)  # (B, pd', ph', pw', C) on device
            starts = np.array(
                [[idx[0].start, idx[1].start, idx[2].start] for idx in indices],
                np.int32,
            )
            valid = np.ones((n,), np.float32)
            if n < batch_size:  # pad the host-side metadata to the static shape
                pad = batch_size - n
                starts = np.concatenate(
                    [starts, np.repeat(starts[-1:], pad, axis=0)], axis=0
                )
                valid = np.concatenate([valid, np.zeros((pad,), np.float32)])
            args = (prediction, jnp.asarray(starts), jnp.asarray(valid))
            if accumulate_probe is not None:  # first batch: probe, no donate
                try:
                    new_acc, new_cnt = accumulate_probe(acc, cnt, *args)
                    new_acc.block_until_ready()
                    acc, cnt = new_acc, new_cnt
                except Exception as exc:
                    # pallas path unavailable (e.g. a remote-compile service
                    # that can't build DMA kernels): fall back to the XLA
                    # overlap-add for the rest of the run.  acc/cnt are
                    # intact — the probe call does not donate.
                    from ..ops.overlap import overlap_add_into_xla

                    logger.warning(
                        "pallas overlap-add failed "
                        f"({type(exc).__name__}: {str(exc)[:200]}); falling "
                        "back to the XLA accumulate path"
                    )
                    accumulate = jax.jit(
                        overlap_add_into_xla, donate_argnums=(0, 1)
                    )
                    acc, cnt = accumulate(acc, cnt, *args)
                accumulate_probe = None
            else:
                acc, cnt = accumulate(acc, cnt, *args)
        acc_np = np.moveaxis(np.asarray(jax.device_get(acc)), -1, 0)
        cnt_np = np.moveaxis(np.asarray(jax.device_get(cnt)), -1, 0)
        return acc_np, cnt_np

    def __call__(self, test_loader):
        assert isinstance(test_loader.dataset, AbstractHDF5Dataset)
        logger.info(f"Processing '{test_loader.dataset.file_path}'...")
        start = time.perf_counter()
        logger.info(f"Running inference on {len(test_loader)} batches")

        volume_shape = test_loader.dataset.volume_shape()
        if self.prediction_channel is not None:
            prediction_maps_shape = (1,) + tuple(volume_shape)
        else:
            prediction_maps_shape = (self.out_channels,) + tuple(volume_shape)

        output_file = _get_output_file(
            dataset=test_loader.dataset, output_dir=self.output_dir
        )
        os.makedirs(os.path.dirname(str(output_file)) or ".", exist_ok=True)
        with h5py.File(output_file, "w") as h5_output_file:
            patch_halo = test_loader.dataset.halo_shape

            if self.accumulate_on_device and type(self) is StandardPredictor:
                prediction_map, normalization_mask = self._device_accumulate(
                    test_loader, tuple(volume_shape), patch_halo
                )
            else:
                logger.info("Allocating prediction and normalization arrays...")
                prediction_map, normalization_mask = self._allocate_prediction_maps(
                    prediction_maps_shape, h5_output_file
                )
                for input, indices in test_loader:
                    prediction = self._predict_batch(np.asarray(input))
                    prediction = _unpad_channels_last(prediction, patch_halo)
                    # channels-last patches → channel-first accumulation layout
                    prediction = np.moveaxis(prediction, -1, 1)  # (N, C, D, H, W)
                    for pred, index in zip(prediction, indices):
                        if self.prediction_channel is None:
                            channel_slice = slice(0, self.out_channels)
                        else:
                            channel_slice = slice(0, 1)
                            pred = np.expand_dims(
                                pred[self.prediction_channel], axis=0
                            )
                        index = (channel_slice,) + tuple(index)
                        prediction_map[index] += pred
                        normalization_mask[index] += 1

            logger.info(
                f"Finished inference in {time.perf_counter() - start:.2f} seconds"
            )
            output_type = (
                "segmentation" if self.save_segmentation else "probability maps"
            )
            logger.info(f"Saving {output_type} to: {output_file}")
            self._save_results(
                prediction_map, normalization_mask, h5_output_file,
                test_loader.dataset,
            )
        return output_file

    def _allocate_prediction_maps(self, output_shape, output_file):
        prediction_map = np.zeros(output_shape, dtype="float32")
        normalization_mask = np.zeros(output_shape, dtype="uint8")
        return prediction_map, normalization_mask

    def _save_results(self, prediction_map, normalization_mask, output_file, dataset):
        result = prediction_map / normalization_mask
        if self.save_segmentation:
            result = np.argmax(result, axis=0).astype("uint16")
        output_file.create_dataset(
            self.output_dataset, data=result, compression="gzip"
        )


class LazyPredictor(StandardPredictor):
    """H5-backed maps normalized in 1/27-volume slices
    (reference predictor.py:171-223) — for volumes larger than RAM."""

    def _allocate_prediction_maps(self, output_shape, output_file):
        prediction_map = output_file.create_dataset(
            self.output_dataset, shape=output_shape, dtype="float32",
            chunks=True, compression="gzip",
        )
        normalization_mask = output_file.create_dataset(
            "normalization", shape=output_shape, dtype="uint8",
            chunks=True, compression="gzip",
        )
        return prediction_map, normalization_mask

    def _save_results(self, prediction_map, normalization_mask, output_file, dataset):
        z, y, x = prediction_map.shape[1:]
        patch_shape = (z // 3, y // 3, x // 3)
        if self.save_segmentation:
            output_file.create_dataset(
                "segmentation", shape=(z, y, x), dtype="uint16", chunks=True,
                compression="gzip",
            )
        for index in SliceBuilder._build_slices(
            prediction_map, patch_shape=patch_shape, stride_shape=patch_shape
        ):
            logger.info(f"Normalizing slice: {index}")
            prediction_map[index] /= normalization_mask[index]
            normalization_mask[index] = 1
            if self.save_segmentation:
                output_file["segmentation"][index[1:]] = np.argmax(
                    prediction_map[index], axis=0
                ).astype("uint16")
        del output_file["normalization"]
        if self.save_segmentation:
            del output_file[self.output_dataset]


def dsb_save_batch(
    output_dir, path, pred, save_segmentation=True, pmaps_thershold=0.5
):
    """Write per-image predictions (+ CC segmentation) to H5
    (reference predictor.py:259-281; the reference's call site dropped the
    ``pred`` argument — fixed here)."""

    def _pmaps_to_seg(p):
        mask = p > pmaps_thershold
        return cc_label(mask).astype("uint16")

    for single_pred, single_path in zip(pred, path):
        logger.info(f"Processing {single_path}")
        single_pred = np.squeeze(np.asarray(single_pred))
        out_file = os.path.splitext(single_path)[0] + "_predictions.h5"
        if output_dir is not None:
            out_file = os.path.join(output_dir, os.path.split(out_file)[1])
        with h5py.File(out_file, "w") as f:
            f.create_dataset("predictions", data=single_pred, compression="gzip")
            if save_segmentation:
                f.create_dataset(
                    "segmentation", data=_pmaps_to_seg(single_pred),
                    compression="gzip",
                )


class DSB2018Predictor(_AbstractPredictor):
    """Per-image 2D predictions with async H5 writes
    (reference predictor.py:226-257; thread pool instead of a 32-process
    pool — the writes are IO-bound and numpy arrays needn't be pickled)."""

    def __init__(self, model, variables, output_dir, out_channels=1,
                 save_segmentation=True, pmaps_thershold=0.5, **kwargs):
        super().__init__(model, variables, output_dir, out_channels, **kwargs)
        # this predictor builds its own per-image forward and would silently
        # ignore these flags otherwise
        if self.tta is not None:
            raise ValueError("tta is not supported by DSB2018Predictor")
        if self.quantize is not None:
            raise ValueError("quantize is not supported by DSB2018Predictor")
        self.pmaps_threshold = pmaps_thershold
        self.save_segmentation = save_segmentation

    def __call__(self, test_loader):
        executor = futures.ThreadPoolExecutor(max_workers=8)
        pending = []

        # One jitted forward reused across batches — jax.jit caches on the
        # function object, so constructing the lambda per batch would
        # retrace/recompile every image.
        model = self.model
        act = model.final_activation()

        @jax.jit
        def forward(variables, x):
            out = model.apply(variables, x, False)
            return act(out) if act is not None else out

        for img, path in test_loader:
            img = np.asarray(img)
            if img.ndim == 5 and img.shape[1] == 1:
                # DSB pipelines emit (N, Z=1, H, W, C); 2D models take NHWC
                img = np.squeeze(img, axis=1)
            pred = np.asarray(
                jax.device_get(forward(self.variables, jnp.asarray(img)))
            )
            pending.append(
                executor.submit(
                    dsb_save_batch, self.output_dir, path, pred,
                    self.save_segmentation, self.pmaps_threshold,
                )
            )
        print("Waiting for all predictions to be saved to disk...")
        executor.shutdown(wait=True)
        for p in pending:
            p.result()  # surface worker exceptions


PREDICTORS = {
    "StandardPredictor": StandardPredictor,
    "LazyPredictor": LazyPredictor,
    "DSB2018Predictor": DSB2018Predictor,
}


def get_predictor(model, variables, output_dir, config: Dict[str, Any]):
    """Build a predictor from ``config['predictor']`` (name + kwargs)."""
    predictor_config = dict(config.get("predictor", {}))
    cls_name = predictor_config.pop("name", "StandardPredictor")
    out_channels = config["model"].get("out_channels")
    return PREDICTORS[cls_name](
        model, variables, output_dir, out_channels, **predictor_config
    )
