"""Checkpoint / resume via orbax.

The reference keeps its best weights only in memory (``EarlyStopping``
snapshots a ``state_dict``; nothing survives the process — SURVEY.md §5
"Checkpoint" row). Here training state {params, opt_state, epoch, PRNG
key, early-stopping bookkeeping} is saved with orbax-checkpoint (async
tensorstore backend, shards handled transparently for sharded arrays) and
the trainer can resume mid-run.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np

logger = logging.getLogger(__name__)

__all__ = ["save_checkpoint", "restore_checkpoint", "latest_step"]


def _checkpointer():
    import orbax.checkpoint as ocp
    return ocp.PyTreeCheckpointer()


def save_checkpoint(directory: str, step: int, state: Dict[str, Any]
                    ) -> None:
    """Save a pytree state dict under ``directory/step_<step>``."""
    path = Path(directory).absolute() / f"step_{step}"
    ckpt = _checkpointer()
    ckpt.save(path, state, force=True)
    logger.info("saved checkpoint %s", path)


def latest_step(directory: str) -> Optional[int]:
    d = Path(directory)
    if not d.exists():
        return None
    steps = []
    for p in d.iterdir():
        if p.name.startswith("step_"):
            try:
                steps.append(int(p.name.split("_", 1)[1]))
            except ValueError:
                continue
    return max(steps) if steps else None


def restore_checkpoint(directory: str, step: Optional[int] = None,
                       target: Optional[Dict[str, Any]] = None
                       ) -> Optional[Dict[str, Any]]:
    """Restore the given (default: latest) step; None if absent."""
    if step is None:
        step = latest_step(directory)
        if step is None:
            return None
    path = Path(directory).absolute() / f"step_{step}"
    if not path.exists():
        return None
    ckpt = _checkpointer()
    state = ckpt.restore(path, item=target)
    logger.info("restored checkpoint %s", path)
    return jax.tree.map(
        lambda x: np.asarray(x) if isinstance(x, np.generic) else x, state)
