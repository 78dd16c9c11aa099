"""Failure detection for multi-host runs.

Reference analog: none — the reference is single-process; its only
"recovery" is early stopping (SURVEY.md §5 "Failure detection" row). The
TPU-native plan is fail-fast + restart-from-checkpoint (no elastic resize
in v1): a cheap cross-device heartbeat collective surfaces dead hosts
as a timeout/exception, the trainer checkpoints at chunk boundaries
(``ppnp_tpu.train``), and a relaunched job resumes with ``resume=True``.
"""

from __future__ import annotations

import logging
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ppnp_tpu.parallel.mesh import NODE_AXIS

logger = logging.getLogger(__name__)

__all__ = ["heartbeat", "assert_devices_healthy"]


def heartbeat(mesh, axis: str = NODE_AXIS, timeout_s: float = 60.0) -> float:
    """Run one tiny psum across the mesh; returns elapsed seconds.

    On a healthy mesh this completes in microseconds–milliseconds; a dead
    or wedged participant surfaces as a runtime error or a hang that the
    caller bounds with ``timeout_s`` (the collective itself cannot be
    interrupted from Python, so the timeout is advisory: we time the call
    and raise if it exceeded the budget — the fail-fast signal for the
    process supervisor).
    """
    n = mesh.shape[axis]

    def f():
        # No inputs, replicated output: valid and addressable from every
        # process in the multi-controller runtime. An (8,) vector, not a
        # scalar: the tunneled axon platform's single-element download
        # path is pathologically slow (seconds per transfer — see
        # train._host_scalars), and the heartbeat must stay cheap.
        return jax.lax.psum(jnp.ones((8,), jnp.float32), axis)

    t0 = time.perf_counter()
    out = jax.jit(jax.shard_map(f, mesh=mesh, in_specs=(),
                                out_specs=P(), check_vma=False))()
    total = np.asarray(out)
    elapsed = time.perf_counter() - t0
    if not np.allclose(total, n):
        raise RuntimeError(
            f"heartbeat psum returned {total.tolist()}, expected {n} — "
            "a mesh participant is unhealthy")
    if elapsed > timeout_s:
        raise TimeoutError(
            f"heartbeat took {elapsed:.1f}s (> {timeout_s}s budget)")
    return elapsed


def assert_devices_healthy(mesh=None, axis: str = NODE_AXIS,
                           timeout_s: float = 60.0) -> None:
    """Fail fast if the mesh cannot complete a collective."""
    if mesh is None:
        from ppnp_tpu.parallel.mesh import make_mesh
        mesh = make_mesh()
    elapsed = heartbeat(mesh, axis, timeout_s)
    logger.info("mesh healthy: %d devices, heartbeat %.1f ms",
                mesh.size, elapsed * 1e3)
