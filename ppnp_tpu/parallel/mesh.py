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
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh

logger = logging.getLogger(__name__)

__all__ = ["make_mesh", "make_hier_mesh", "initialize_distributed",
           "NODE_AXIS", "DCN_AXIS", "ICI_AXIS"]

# The single mesh axis: nodes are sharded along it; MLP weights are
# replicated across it.
NODE_AXIS = "data"

# The hierarchical 2-axis mesh (BASELINE.json:5 / SURVEY.md §5 comm
# row: boundary exchange "over ICI intra-slice and DCN across
# slices"): the outer axis enumerates pod slices (collectives over it
# ride the data-center network), the inner axis enumerates chips
# within a slice (collectives ride the on-chip interconnect). Nodes
# are row-sharded over BOTH axes jointly: P((DCN_AXIS, ICI_AXIS), ...).
DCN_AXIS = "dcn"
ICI_AXIS = "ici"


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


def make_hier_mesh(n_slices: int, per_slice: int,
                   devices: Optional[Sequence[jax.Device]] = None,
                   axis_names: Tuple[str, str] = (DCN_AXIS, ICI_AXIS)
                   ) -> Mesh:
    """A 2-axis ``(n_slices, per_slice)`` mesh: DCN outer, ICI inner.

    On a real multi-slice pod the device order from ``jax.devices()``
    groups chips by slice, so reshaping to ``(n_slices, per_slice)``
    puts each slice's chips on one row of the mesh — collectives over
    the inner axis stay on ICI, collectives over the outer axis cross
    DCN. Shard ``d = s·per_slice + i`` (slice ``s``, intra-slice
    position ``i``) matches ``P((dcn, ici))``'s row-major placement.
    """
    if devices is None:
        devices = jax.devices()
    need = n_slices * per_slice
    if need > len(devices):
        raise ValueError(
            f"requested {n_slices}x{per_slice} devices, only "
            f"{len(devices)} available")
    grid = np.asarray(devices[:need]).reshape(n_slices, per_slice)
    return Mesh(grid, axis_names)
