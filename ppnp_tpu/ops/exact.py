"""Exact PPNP: dense personalized-PageRank matrix Π = α(I − (1−α)Â)^{-1}.

Reference analog: ``ppnp/pytorch/propagation.py`` ``calc_ppr_exact`` (~L22)
and ``PPRExact`` (~L30) — SURVEY.md §3.4. TPU-native changes:

- The inverse is computed as a **solve** (``jnp.linalg.solve(I-(1-α)Â, αI)``)
  rather than an explicit ``np.linalg.inv`` — better conditioned and maps
  to XLA's batched LU on device.
- Training-time dropout is applied to the selected Π rows (the reference's
  ``dropout(Π[idx]) @ H`` — row selection BEFORE the matmul, so train cost
  scales with |idx| not n; SURVEY.md §3.4 notes this asymmetry).
"""

from __future__ import annotations

from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp
from flax import struct

from ppnp_tpu.ops.dropout import dropout

__all__ = ["calc_ppr_exact", "PPRExact"]


def calc_ppr_exact(a_hat: Union[sp.spmatrix, np.ndarray, jnp.ndarray],
                   alpha: float) -> jnp.ndarray:
    """Dense Π = α·(I − (1−α)Â)^{-1} via an on-device linear solve."""
    if sp.issparse(a_hat):
        a_hat = np.asarray(a_hat.todense())
    a_hat = jnp.asarray(a_hat, dtype=jnp.float32)
    n = a_hat.shape[0]
    eye = jnp.eye(n, dtype=jnp.float32)
    return jnp.linalg.solve(eye - (1.0 - alpha) * a_hat, alpha * eye)


@struct.dataclass
class PPRExact:
    """Exact-PPNP propagation: Z = dropout(Π[idx]) @ H_local."""

    ppr: jnp.ndarray  # float32 [n, n]
    drop_prob: float = struct.field(pytree_node=False, default=0.5)

    @property
    def n_rows(self) -> int:
        return self.ppr.shape[0]

    def __call__(self, h_local: jnp.ndarray,
                 idx: Optional[jnp.ndarray] = None, *,
                 key: Optional[jax.Array] = None,
                 train: bool = False) -> jnp.ndarray:
        rows = self.ppr if idx is None else jnp.take(self.ppr, idx, axis=0)
        if train and self.drop_prob > 0.0 and key is not None:
            rows = dropout(key, rows, self.drop_prob)
        # HIGHEST precision: this is the exact reference path — don't let
        # the MXU's fast bf16 passes blur the parity contract
        # (BASELINE.json:8 exact-vs-iterative agreement).
        return jnp.dot(rows, h_local, precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=h_local.dtype)

    def propagate(self, h0: jnp.ndarray, *, key=None,
                  train: bool = False) -> jnp.ndarray:
        """Full-table propagation (retrieval path): Π @ H⁰."""
        return self(h0, None, key=key, train=train)
