"""Multi-host launch.

Counterpart of detectron2/engine/launch.py (launch:24 — mp.spawn one
process per GPU + NCCL init). The TPU-native model is inverted: ONE
process per host drives all local chips; multi-host jobs initialize
``jax.distributed`` so every host sees the global device mesh, and SPMD
collectives ride ICI/DCN with no explicit backend.
"""
from __future__ import annotations

import logging
import os
from typing import Callable, Optional, Tuple

logger = logging.getLogger(__name__)


def launch(
    main_func: Callable,
    num_gpus_per_machine: int = 1,  # accepted for CLI compat; unused
    num_machines: int = 1,
    machine_rank: int = 0,
    dist_url: Optional[str] = None,
    args: Tuple = (),
):
    """Initialize multi-host jax if needed, then call ``main_func(*args)``
    in this process.

    - single machine: no distributed init; jax uses all local devices.
    - multi machine: ``jax.distributed.initialize(coordinator, n, rank)``.
      ``dist_url`` accepts the reference's ``tcp://host:port`` form. On
      managed TPU pods where the environment provides coordination
      (megascale), initialize() is called with no arguments.
    """
    import jax

    if num_machines > 1:
        kwargs = {}
        if dist_url and dist_url not in ("auto", "env://"):
            coordinator = dist_url.replace("tcp://", "")
            kwargs = dict(
                coordinator_address=coordinator,
                num_processes=num_machines,
                process_id=machine_rank,
            )
        logger.info("jax.distributed.initialize(%s)", kwargs)
        jax.distributed.initialize(**kwargs)
        logger.info(
            "process %d/%d up: %d local / %d global devices",
            jax.process_index(),
            jax.process_count(),
            jax.local_device_count(),
            jax.device_count(),
        )
    return main_func(*args)


def get_rank() -> int:
    """Global process rank (comm.get_rank counterpart)."""
    import jax

    return jax.process_index()


def get_world_size() -> int:
    """Process count (comm.get_world_size counterpart; note device-level
    parallelism is jax.device_count())."""
    import jax

    return jax.process_count()


def is_main_process() -> bool:
    return get_rank() == 0
