"""Multi-host initialization — DCN scale-out for the same SPMD programs.

The reference never crosses a host boundary (SURVEY.md §2b: no process
groups, no NCCL/MPI anywhere).  Here, multi-host is the same program: once
``initialize()`` has been called on every process, ``jax.devices()`` spans
all hosts, ``make_mesh()`` builds a global mesh, and the existing jitted
train steps shard over it — XLA routes intra-slice collectives over ICI and
cross-slice/host traffic over DCN.  No framework code changes.

Launch pattern (one process per host)::

    COORD=host0:1234 python -c '
    from mdeical_image_segmentation_tpu.parallel import distributed
    distributed.initialize(coordinator_address=..., num_processes=..., process_id=...)
    ' train.py ...

On Cloud TPU / GKE the arguments are auto-detected from the environment and
``initialize()`` can be called with no arguments.
"""

from __future__ import annotations

import os
from typing import Optional

import jax

from ..logging_utils import get_logger

logger = get_logger("distributed")

_initialized = False


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    **kwargs,
) -> None:
    """Bring this process into the global JAX runtime.

    Thin wrapper over ``jax.distributed.initialize`` with idempotence and
    env-var fallbacks (COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID for
    manual launches; Cloud TPU metadata is auto-detected by jax itself).
    """
    global _initialized
    if _initialized:
        logger.info("jax.distributed already initialized; skipping")
        return
    coordinator_address = coordinator_address or os.environ.get(
        "COORDINATOR_ADDRESS"
    )
    if num_processes is None and "NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["NUM_PROCESSES"])
    if process_id is None and "PROCESS_ID" in os.environ:
        process_id = int(os.environ["PROCESS_ID"])

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        **kwargs,
    )
    _initialized = True
    logger.info(
        f"distributed runtime up: process {jax.process_index()}/"
        f"{jax.process_count()}, {jax.local_device_count()} local / "
        f"{jax.device_count()} global devices"
    )


def is_primary() -> bool:
    """True on the process that should write checkpoints/logs."""
    return jax.process_index() == 0


def process_info() -> dict:
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": jax.local_device_count(),
        "global_devices": jax.device_count(),
    }
