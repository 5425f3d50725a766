"""Last/best checkpointing for the 3D trainer.

Reference: save_checkpoint / load_checkpoint
(/root/reference/model/unet3d/utils.py:13-57): every validation writes
``last_checkpoint`` and copies it to ``best_checkpoint`` when the eval score
improves; resume restores model+optimizer+counters+best-score.  Serialized
with flax msgpack (the torch.save equivalent); filenames keep the reference
scheme with a ``.msgpack`` extension.
"""

from __future__ import annotations

import os
import shutil
from typing import Any, Dict, Optional

import flax
import numpy as np

from .logging_utils import get_logger

logger = get_logger("CheckpointUtils")

LAST_NAME = "last_checkpoint.msgpack"
BEST_NAME = "best_checkpoint.msgpack"


def save_checkpoint(state: Dict[str, Any], is_best: bool, checkpoint_dir: str) -> str:
    """Write ``last_checkpoint``; copy to ``best_checkpoint`` when best."""
    if not os.path.exists(checkpoint_dir):
        logger.info(
            f"Checkpoint directory does not exist. Creating {checkpoint_dir}"
        )
        os.makedirs(checkpoint_dir, exist_ok=True)
    last_file_path = os.path.join(checkpoint_dir, LAST_NAME)
    # to_state_dict flattens optimizer namedtuples (e.g. inject_hyperparams
    # states) into plain dicts that msgpack can serialize.
    serializable = flax.serialization.to_state_dict(_to_numpy(state))
    with open(last_file_path, "wb") as f:
        f.write(flax.serialization.msgpack_serialize(serializable))
    if is_best:
        shutil.copyfile(last_file_path, os.path.join(checkpoint_dir, BEST_NAME))
    return last_file_path


def load_checkpoint(
    checkpoint_path: str, template: Optional[Dict[str, Any]] = None
) -> Dict[str, Any]:
    """Restore a checkpoint dict; with a ``template`` the tree structure and
    dtypes are validated against it (flax from_state_dict semantics)."""
    if not os.path.exists(checkpoint_path):
        raise IOError(f"Checkpoint '{checkpoint_path}' does not exist")
    with open(checkpoint_path, "rb") as f:
        raw = flax.serialization.msgpack_restore(f.read())
    if template is not None:
        return flax.serialization.from_state_dict(template, raw)
    return raw


def save_network_output(output_path: str, output: np.ndarray) -> None:
    """Gzip H5 dump of a network output (reference utils.py:60-65)."""
    import h5py

    dirname = os.path.dirname(output_path)
    if dirname and not os.path.exists(dirname):
        os.makedirs(dirname, exist_ok=True)
    with h5py.File(output_path, "w") as f:
        logger.info(f"Saving network output to: {output_path}...")
        f.create_dataset("predictions", data=np.asarray(output), compression="gzip")


def _to_numpy(tree):
    import jax

    return jax.tree_util.tree_map(
        lambda x: np.asarray(x) if hasattr(x, "shape") else x, tree
    )
