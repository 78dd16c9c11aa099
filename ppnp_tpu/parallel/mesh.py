"""Device mesh construction and multi-controller initialization.

The TPU-native communication backend (SURVEY.md §5, "Distributed
communication backend" row): ``jax.distributed.initialize()`` for the
multi-controller runtime, a 1-D ``Mesh`` over all devices named ``"data"``
(the node axis is both the data-parallel and the model/row-sharding axis
for this workload), and XLA collectives compiled over ICI/DCN. No custom
transport code.
"""

from __future__ import annotations

import logging
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

logger = logging.getLogger(__name__)

__all__ = ["make_mesh", "initialize_distributed", "NODE_AXIS"]

# The single mesh axis: nodes are sharded along it; MLP weights are
# replicated across it.
NODE_AXIS = "data"


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Initialize the JAX multi-controller runtime (no-op single-process).

    On TPU pods the arguments are auto-detected from the environment; pass
    them explicitly only for CPU/GPU multi-process testing.
    """
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
        logger.info("jax.distributed initialized: process %d/%d",
                    jax.process_index(), jax.process_count())


def make_mesh(n_devices: Optional[int] = None,
              devices: Optional[Sequence[jax.Device]] = None,
              axis_name: str = NODE_AXIS) -> Mesh:
    """A 1-D mesh over ``n_devices`` (default: all available devices)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"requested {n_devices} devices, only {len(devices)} "
                "available")
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))
