"""Rematerialization checkpoint policies for the model families.

Whole-block ``nn.remat`` (the round-2/3 default for the 512² UNet-3+ config
of record) recomputes the convs themselves in the backward pass — and the
measured root cause of the remat throughput tax (PERF.md remat sweep) is
precisely that recomputing a conv re-reads its full-res HBM inputs.  A
name-based checkpoint policy keeps the conv outputs (the expensive,
HBM-heavy results) and recomputes only the cheap elementwise tail
(BN/GN/ReLU/concat/pool) from them, so remat still bounds the live-activation
set and the backward program size without re-running convolutions.

Conv outputs are tagged ``conv_out`` at the source (layers2d.TorchConv /
TorchConvTranspose — which also covers the 3D families' slab convs);
``resolve_policy`` maps the config-level string to a jax checkpoint policy:

- ``None`` — save nothing (full recompute; the previous behavior).
- ``"save_convs"`` — ``save_only_these_names("conv_out")``.
- ``"save_convs_norms"`` — also keep the tagged norm outputs (BatchNorm /
  GroupNorm), so the backward recomputes only ReLU/concat/resize.  More
  residual HBM than ``save_convs`` but less recompute — the right point on
  the curve when the program fits comfortably.
- ``"everything"`` — ``everything_saveable``: zero recompute.  Remat then
  acts purely as a *structural* lever (the blocks still compile as separate
  subcomputations, which is what keeps the 25-branch 512² UNet-3+ program
  inside the remote compiler's limits) while the backward reads saved
  residuals like an un-remated program.

Strict like the env knobs: unknown names raise.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax

CONV_OUT = "conv_out"
NORM_OUT = "norm_out"


def tag_conv_out(x: jax.Array) -> jax.Array:
    """Tag a conv output for name-based checkpoint policies (identity op;
    XLA drops it outside of jax.checkpoint)."""
    from jax.ad_checkpoint import checkpoint_name

    return checkpoint_name(x, CONV_OUT)


def tag_norm_out(x: jax.Array) -> jax.Array:
    """Tag a normalization output (BN/GN) for the 'save_convs_norms' policy."""
    from jax.ad_checkpoint import checkpoint_name

    return checkpoint_name(x, NORM_OUT)


def resolve_policy(name: Optional[str]) -> Optional[Callable]:
    if name is None or name == "none":
        return None
    if name == "save_convs":
        return jax.checkpoint_policies.save_only_these_names(CONV_OUT)
    if name == "save_convs_norms":
        return jax.checkpoint_policies.save_only_these_names(
            CONV_OUT, NORM_OUT
        )
    if name == "everything":
        return jax.checkpoint_policies.everything_saveable
    raise ValueError(
        f"remat_policy={name!r}: expected None/'none', 'save_convs', "
        "'save_convs_norms', or 'everything'"
    )
