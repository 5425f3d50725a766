"""Orbax checkpoint backend — sharded/async-capable alternative to msgpack.

The default last/best scheme (train/checkpoint.py) serializes the gathered
state with flax msgpack — simple and portable, but single-host and
synchronous.  This backend wraps Orbax's PyTreeCheckpointer for:

- sharded multi-host checkpoints (each host writes its shards; restoring
  re-shards onto the current mesh),
- atomic directory commits (no torn checkpoints on preemption),
- the same last/best retention contract as the msgpack scheme.

Usage::

    ckpt = OrbaxCheckpointer(checkpoint_dir)
    ckpt.save(state_dict, step=1234, is_best=True)
    restored = ckpt.restore(template=state_dict)      # latest
    restored = ckpt.restore(template=..., best=True)  # best
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import orbax.checkpoint as ocp

from .logging_utils import get_logger

logger = get_logger("OrbaxCheckpointer")

LAST_DIR = "last"
BEST_DIR = "best"


def _normalize(tree):
    """numpy scalar leaves → 0-d arrays (orbax restore_args requirement)."""
    import jax
    import numpy as np

    return jax.tree_util.tree_map(
        lambda x: np.asarray(x) if isinstance(x, np.generic) else x, tree
    )


class OrbaxCheckpointer:
    def __init__(self, checkpoint_dir: str):
        self.checkpoint_dir = os.path.abspath(checkpoint_dir)
        os.makedirs(self.checkpoint_dir, exist_ok=True)
        self._ckpt = ocp.PyTreeCheckpointer()

    def _path(self, best: bool) -> str:
        return os.path.join(self.checkpoint_dir, BEST_DIR if best else LAST_DIR)

    def save(self, state: Dict[str, Any], *, is_best: bool = False) -> str:
        """Write the ``last`` checkpoint; duplicate into ``best`` when best."""
        state = _normalize(state)
        last = self._path(False)
        logger.info(f"Saving checkpoint to '{last}'")
        self._ckpt.save(last, state, force=True)
        if is_best:
            self._ckpt.save(self._path(True), state, force=True)
        return last

    def restore(
        self, template: Optional[Dict[str, Any]] = None, *, best: bool = False
    ) -> Dict[str, Any]:
        path = self._path(best)
        if not os.path.exists(path):
            raise IOError(f"Checkpoint '{path}' does not exist")
        if template is not None:
            template = _normalize(template)
            restore_args = ocp.checkpoint_utils.construct_restore_args(template)
            return self._ckpt.restore(
                path, restore_args=restore_args, item=template
            )
        return self._ckpt.restore(path)

    def exists(self, best: bool = False) -> bool:
        return os.path.exists(self._path(best))
