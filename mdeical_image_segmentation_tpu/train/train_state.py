"""Train state: params + BN stats + optimizer state + step, as one pytree.

The functional analog of the reference's mutable (model, optimizer) pair.
Kept as a flax struct so the whole state threads through the jitted train
step with buffer donation (zero-copy updates in HBM).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax
import jax
import optax


@flax.struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    batch_stats: Any  # {} when the model has no BN
    opt_state: Any

    @property
    def variables(self) -> Dict[str, Any]:
        v = {"params": self.params}
        if self.batch_stats:
            v["batch_stats"] = self.batch_stats
        return v


def create_train_state(
    model,
    rng: jax.Array,
    sample_images,
    optimizer: optax.GradientTransformation,
) -> TrainState:
    # jit both inits: un-jitted they dispatch one device round-trip PER OP,
    # which costs minutes of startup on a remote-attached TPU (measured
    # ~150 s for a UNet3D init through the axon tunnel, r5); jitted they
    # are one cacheable program each (train flag static).
    variables = jax.jit(model.init, static_argnums=2)(
        rng, sample_images, True)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    opt_state = jax.jit(optimizer.init)(params)
    import jax.numpy as jnp

    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=opt_state,
    )
