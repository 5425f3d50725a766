"""Mirror test-time augmentation: flip-ensemble forward passes.

Shared by the sliding-window predictor (``infer/predictor.py``) and 2D
serving (``serve/app.py``).  A TPU extension — the reference has no TTA;
flips are free layout ops on device and the whole ensemble stays inside
one jitted program.
"""

from __future__ import annotations

from itertools import combinations
from typing import Callable, List, Sequence

import jax.numpy as jnp


def mirror_combos(axes: Sequence[int]) -> List[List[int]]:
    """All 2^k subsets of ``axes`` (as lists, [] = identity pass first)."""
    return [list(c) for r in range(len(axes) + 1)
            for c in combinations(axes, r)]


def flip_ensemble(apply_fn: Callable, combos: Sequence[Sequence[int]],
                  variables, x, pick: Callable = lambda o: o, **kw):
    """Mean of ``pick(apply_fn(variables, flip(x, c), **kw))`` un-flipped
    back into place, over every axis-combination ``c`` in ``combos``.

    If ``kw`` carries flax's ``mutable=[...]`` (the int8 'calib' quant mode
    does — ops/quant.py), each pass's updated collections are threaded into
    the next pass's variables, so e.g. activation-absmax calibration
    observes every flip variant; returns ``(mean, last_updates)`` then.
    The averaging space is whatever ``pick`` returns (logits for the
    predictor/serving call sites — probabilities for CGM-type models whose
    forward already applies the gate).
    """
    mutable = kw.pop("mutable", False)
    vs, upd, acc = variables, None, None
    for c in combos:
        xa = jnp.flip(x, axis=c) if c else x
        if mutable:
            o, upd = apply_fn(vs, xa, mutable=mutable, **kw)
            vs = {**vs, **upd}
        else:
            o = apply_fn(vs, xa, **kw)
        o = pick(o)
        o = jnp.flip(o, axis=c) if c else o
        acc = o if acc is None else acc + o
    out = acc / len(combos)
    return (out, upd) if mutable else out
