"""Exact PPNP: dense personalized-PageRank matrix Π = α(I − (1−α)Â)^{-1}.

Reference analog: ``ppnp/pytorch/propagation.py`` ``calc_ppr_exact`` (~L22)
and ``PPRExact`` (~L30) — SURVEY.md §3.4. TPU-native changes:

- Small graphs: the inverse is computed as a **solve**
  (``jnp.linalg.solve(I-(1-α)Â, αI)``) rather than an explicit
  ``np.linalg.inv`` — better conditioned, maps to XLA's LU on device.
- Paper-scale graphs (PubMed, n≈19.7k): XLA:TPU factorizations are
  sequential and unusable at this size — LU fails to compile above
  n≈8k (the compile helper OOMs) and Cholesky+triangular-solve executes
  at ~1 GFLOPS (~17 min at n=8k, measured 2026-08-20). The TPU-native
  path is **Newton–Schulz inversion** (``method="newton"``): M =
  I−(1−α)Â is SPD with eigenvalues in [α, 2−α] (Â symmetric-normalized
  with self-loops has spectrum in [−1, 1]), so X₀ = I gives
  ‖I−MX₀‖₂ ≤ 1−α and X_{k+1} = 2X_k − X_k(MX_k) converges
  QUADRATICALLY: the residual is (1−α)^(2^k) — 9 iterations reach f32
  machine precision at α=0.1. Every iteration is two n×n matmuls, i.e.
  pure MXU work that XLA tiles natively at any n — no factorization,
  no sequential triangular solves.
- Training-time dropout is applied to the selected Π rows (the reference's
  ``dropout(Π[idx]) @ H`` — row selection BEFORE the matmul, so train cost
  scales with |idx| not n; SURVEY.md §3.4 notes this asymmetry).
"""

from __future__ import annotations

import math
from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp
from flax import struct

from ppnp_tpu.ops.dropout import dropout

__all__ = ["calc_ppr_exact", "PPRExact"]

# XLA:TPU's LU compile cliff is between n=8192 and n=16384 (measured
# 2026-08-20); switch to the matmul-only Newton path well below it.
_NEWTON_MIN_N = 4096


def newton_schulz_iters(alpha: float, eps: float = 1e-7) -> int:
    """Iterations until the Newton residual (1−α)^(2^k) < eps."""
    r0 = max(1e-6, 1.0 - alpha)
    # (1-α)^(2^k) < eps  ⇔  2^k > log eps / log r0
    return max(1, math.ceil(math.log2(math.log(eps) / math.log(r0))) + 1)


def calc_ppr_exact(a_hat: Union[sp.spmatrix, np.ndarray, jnp.ndarray],
                   alpha: float, method: str = "auto") -> jnp.ndarray:
    """Dense Π = α·(I − (1−α)Â)^{-1} on device.

    ``method``: "solve" (XLA LU — small n), "newton" (Newton–Schulz,
    matmul-only — any n, the TPU path), "auto" (newton at n ≥ 4096).
    """
    if sp.issparse(a_hat):
        a_hat = np.asarray(a_hat.todense())
    a_hat = jnp.asarray(a_hat, dtype=jnp.float32)
    n = a_hat.shape[0]
    if method == "auto":
        method = "newton" if n >= _NEWTON_MIN_N else "solve"
    eye = jnp.eye(n, dtype=jnp.float32)
    m = eye - (1.0 - alpha) * a_hat
    if method == "solve":
        return jnp.linalg.solve(m, alpha * eye)
    if method != "newton":
        raise ValueError(f"unknown method {method!r} "
                         "(expected 'auto', 'solve' or 'newton')")

    iters = newton_schulz_iters(alpha)

    @jax.jit
    def _invert(m):
        def step(x, _):
            # X ← 2X − X(MX); HIGHEST precision: quadratic convergence
            # is self-correcting but the FINAL iterations' accuracy is
            # bounded by the matmul rounding, and this is the "exact"
            # parity path (BASELINE.json:8).
            mx = jnp.dot(m, x, precision=jax.lax.Precision.HIGHEST)
            x = 2.0 * x - jnp.dot(x, mx,
                                  precision=jax.lax.Precision.HIGHEST)
            return x, None
        x, _ = jax.lax.scan(step, eye, None, length=iters)
        return alpha * x

    return _invert(m)


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
