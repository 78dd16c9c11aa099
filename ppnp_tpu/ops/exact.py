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

import functools
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

# Above this row count, PPRExact selects Π rows via a one-hot dot
# instead of gather — the gather's XLA:TPU compile time grows with the
# row width (minutes at n≈20k), the dot's does not.
_ONEHOT_SELECT_MIN_N = 8192


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
        # Densify M = I − (1−α)Â ON DEVICE: ship only sparse triplets
        # (≈12B/nnz) and expand them there. At paper scale the dense Â
        # is 1.5GB, and the tunneled host→device link moves it in
        # minutes — while the triplets cross in milliseconds. The
        # expansion is row-block one-hot MATMULS (scan-of-dots — the
        # same program shape as the Newton iteration itself): both a
        # direct ``.at[rows, cols].add`` scatter and a scan-of-
        # segment_sum take minutes of XLA:TPU compile even at n=4096
        # (measured 2026-08-20), while dots compile in seconds.
        n = a_hat.shape[0]
        m_sp = (sp.identity(n, dtype=np.float32, format="csr")
                - np.float32(1.0 - alpha) * a_hat.tocsr())
        m = _dense_from_scipy(m_sp)
    else:
        a_hat = jnp.asarray(a_hat, dtype=jnp.float32)
        n = a_hat.shape[0]
        m = jnp.eye(n, dtype=jnp.float32) - (1.0 - alpha) * a_hat
    if method == "auto":
        method = "newton" if n >= _NEWTON_MIN_N else "solve"
    if method == "solve":
        return jnp.linalg.solve(m, alpha * jnp.eye(n, dtype=jnp.float32))
    if method != "newton":
        raise ValueError(f"unknown method {method!r} "
                         "(expected 'auto', 'solve' or 'newton')")

    return _newton_invert(m, jnp.float32(alpha),
                          iters=newton_schulz_iters(alpha))


def _dense_from_scipy(mat: sp.spmatrix, block: int = 256) -> jnp.ndarray:
    """Expand a scipy sparse matrix to a dense device array, on device.

    Per 256-row block b with S padded triplets (local_row, col, val):
    ``dense[256b:256(b+1)] = one_hot(local_row).T @ (val·one_hot(col))``
    — a scan of two iota-compares and one MXU dot per block. Pure-dot
    programs compile in seconds on this toolchain where scatter /
    scan-of-segment_sum take minutes (see calc_ppr_exact). HIGHEST
    precision keeps the expansion EXACT: one_hot entries are 0/1, each
    output element receives exactly one nonzero product.
    """
    csr = mat.tocsr().astype(np.float32)
    csr.sum_duplicates()
    n_rows, n_cols = csr.shape
    nb = -(-n_rows // block)
    counts = np.diff(csr.indptr)
    block_counts = np.add.reduceat(
        counts, np.arange(0, n_rows, block)) if n_rows else np.array([0])
    s = max(8, int(-(-max(int(block_counts.max()), 1) // 8) * 8))
    local_r = np.zeros((nb, s), np.int32)
    cols = np.zeros((nb, s), np.int32)
    vals = np.zeros((nb, s), np.float32)  # padding: val 0 → contributes 0
    coo = csr.tocoo()  # CSR→COO is row-major: block rows are contiguous
    starts = csr.indptr[np.arange(0, n_rows, block)]
    ends = np.append(csr.indptr[np.arange(block, n_rows, block)], csr.nnz)
    for b in range(nb):
        lo, hi = int(starts[b]), int(ends[b])
        k = hi - lo
        local_r[b, :k] = coo.row[lo:hi] - b * block
        cols[b, :k] = coo.col[lo:hi]
        vals[b, :k] = coo.data[lo:hi]
    out = _dense_rowblocks(jnp.asarray(local_r), jnp.asarray(cols),
                           jnp.asarray(vals), block=block, n_cols=n_cols)
    return out[:n_rows]


@functools.partial(jax.jit, static_argnames=("block", "n_cols"))
def _dense_rowblocks(local_r: jnp.ndarray, cols: jnp.ndarray,
                     vals: jnp.ndarray, *, block: int,
                     n_cols: int) -> jnp.ndarray:
    def body(_, rcv):
        rr, cc, vv = rcv
        p = jax.nn.one_hot(rr, block, dtype=jnp.float32)        # (S, block)
        q = jax.nn.one_hot(cc, n_cols, dtype=jnp.float32) * vv[:, None]
        rows = jnp.dot(p.T, q, precision=jax.lax.Precision.HIGHEST)
        return None, rows

    _, blocks = jax.lax.scan(body, None, (local_r, cols, vals))
    return blocks.reshape(-1, n_cols)


@functools.partial(jax.jit, static_argnames=("iters",))
def _newton_invert(m: jnp.ndarray, alpha: jnp.ndarray, *,
                   iters: int) -> jnp.ndarray:
    """α·M^{-1} via ``iters`` Newton–Schulz steps (module-level so repeat
    calls at the same (n, iters) hit the jit cache — a fresh closure per
    call would retrace and recompile every time)."""
    eye = jnp.eye(m.shape[0], dtype=m.dtype)

    def step(x, _):
        # X ← 2X − X(MX); HIGHEST precision: quadratic convergence
        # is self-correcting but the FINAL iterations' accuracy is
        # bounded by the matmul rounding, and this is the "exact"
        # parity path (BASELINE.json:8).
        mx = jnp.dot(m, x, precision=jax.lax.Precision.HIGHEST)
        x = 2.0 * x - jnp.dot(x, mx, precision=jax.lax.Precision.HIGHEST)
        return x, None

    x, _ = jax.lax.scan(step, eye, None, length=iters)
    return alpha * x


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
        apply_drop = bool(train and self.drop_prob > 0.0
                          and key is not None)
        large = self.ppr.shape[0] >= _ONEHOT_SELECT_MIN_N
        if idx is not None and large and not apply_drop:
            # Eval at paper scale: reassociate to (Π @ H)[idx] — exactly
            # the same values (no dropout between selection and matmul),
            # but the select moves to a c-wide gather that XLA:TPU
            # compiles instantly, where both a row-wide gather and the
            # one-hot selection dot on the n-wide Π take minutes of
            # remote compile (measured 2026-08-20 at n=19.6k).
            z = jnp.dot(self.ppr, h_local,
                        precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=h_local.dtype)
            return jnp.take(z, idx, axis=0)
        if idx is None:
            rows = self.ppr
        elif large:
            # Train-mode selection as a one-hot MXU dot: the reference
            # applies dropout to the SELECTED Π rows (SURVEY.md §3.4),
            # so selection must come first here. XLA:TPU's gather
            # compile time explodes with the gathered row width; the
            # dot compiles once (minutes, persistently cached) and runs
            # fast. one_hot rows are exact 0/1, so HIGHEST-precision
            # selection is bit-exact.
            # Clamp like jnp.take does (one_hot would instead zero the
            # row for an out-of-range index — a silently different
            # failure mode on either side of the size threshold).
            idx_c = jnp.clip(idx, 0, self.ppr.shape[0] - 1)
            onehot = jax.nn.one_hot(idx_c, self.ppr.shape[0],
                                    dtype=self.ppr.dtype)
            rows = jnp.dot(onehot, self.ppr,
                           precision=jax.lax.Precision.HIGHEST)
        else:
            rows = jnp.take(self.ppr, idx, axis=0)
        if apply_drop:
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
