"""Inverted dropout on dense arrays and on edge values.

Reference analog: ``ppnp/pytorch/utils.py`` MixedDropout / SparseDropout
(~L15, SURVEY.md §2.1): drop values with prob p and rescale survivors by
1/(1-p). On TPU everything is dense/static-shape, so "sparse dropout" is
simply dropout on the nnz value vector of Â (the reference's edge dropout,
BASELINE.json:9) or on dense rows. Dropping structural zeros is a no-op
(0·scale = 0), so dense dropout on a densified sparse matrix is exactly
the reference's mixed dropout.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["dropout", "edge_dropout", "edge_dropout_by_id",
           "edge_dropout_by_id_grouped"]


def dropout(key: jax.Array, x: jnp.ndarray, rate: float) -> jnp.ndarray:
    """Inverted dropout: zero with prob ``rate``, scale kept by 1/(1-rate).

    The Bernoulli draws are 8-bit quantized and packed four-per-threefry
    word: ``jax.random.bernoulli`` spends a full 32 random bits per
    element, which makes the mask generation the dominant cost of a
    training step on wide inputs (measured 90ms/epoch for the 125M-value
    MS Academic attribute matrix on v5e). One byte per element is a 4×
    cheaper stream; the keep probability is rounded to a multiple of
    1/256 (exact for the reference's p=0.5) and the survivor rescale
    uses the quantized probability so the estimator stays unbiased.
    """
    if rate <= 0.0:
        return x
    keep_q = round((1.0 - rate) * 256.0) / 256.0
    thresh = int(keep_q * 256.0)
    if thresh >= 256:
        return x
    lead, last = x.shape[:-1], x.shape[-1]
    nwords = -(-last // 4)
    words = jax.random.bits(key, lead + (nwords,), dtype=jnp.uint32)
    shifts = jnp.arange(0, 32, 8, dtype=jnp.uint32)
    bytes_ = ((words[..., None] >> shifts) & np.uint32(0xFF)) \
        .astype(jnp.uint8)
    flat = bytes_.reshape(lead + (4 * nwords,))[..., :last]
    return jnp.where(flat < jnp.uint8(thresh), x / keep_q,
                     jnp.zeros_like(x))


def edge_dropout(key: jax.Array, w: jnp.ndarray, rate: float) -> jnp.ndarray:
    """Dropout on the nnz values of Â — a fresh mask per power iteration.

    Padding entries have w == 0 and stay 0 under any mask.
    """
    return dropout(key, w, rate)


def edge_dropout_by_id(key: jax.Array, pc, rate: float) -> jnp.ndarray:
    """Edge dropout whose mask is keyed by CANONICAL edge id, not slot.

    The same (key, edge) pair draws the same Bernoulli in ANY packing
    that stores matching edge ids — in particular a forward packing and
    its transpose packing regenerate identical masks with zero
    cross-layout gathers (see ops/hashrng.py for why this matters).
    Returns the masked, rescaled per-slot weights of ``pc``.
    """
    if rate <= 0.0:
        return pc.e_w
    from ppnp_tpu.ops.hashrng import uniform_bits
    keep = 1.0 - rate
    bits = uniform_bits(key, pc.eid_hi, pc.eid_lo)
    thresh = np.uint32(min(int(keep * 2 ** 32), 2 ** 32 - 1))
    return jnp.where(bits < thresh, pc.e_w / keep,
                     jnp.zeros_like(pc.e_w))


def edge_dropout_by_id_grouped(keys: jax.Array, pc,
                               rate: float) -> jnp.ndarray:
    """G id-keyed edge-dropout mask sets → (n_mid, MID, G), the grouped
    SpMM kernel's weight layout (``stack_group_weights``), in ONE fused
    threefry pass.

    Per (key, edge) the Bernoulli draw is BIT-IDENTICAL to
    ``edge_dropout_by_id(keys[g], pc, rate)`` — the hash depends only
    on the canonical edge id — so per-seed parity with the sequential
    path holds. Generating directly in kernel order matters for speed:
    stacking G per-slot mask sets with ``stack_group_weights`` inside
    the training scan transposes ~nnz·G key-DEPENDENT values every
    power iteration (measured +9 ms/epoch at MS Academic scale),
    whereas here only the constant id/weight arrays are re-laid-out —
    loop-invariant work XLA hoists out of the scan.
    """
    G = keys.shape[0]
    n_mid, mid = pc.n_mid, pc.mid
    w_mid = pc.e_w.T.reshape(n_mid, mid)          # loop-invariant
    if rate <= 0.0:
        return jnp.broadcast_to(w_mid[:, :, None], (n_mid, mid, G))
    from ppnp_tpu.ops.hashrng import threefry2x32
    keep = 1.0 - rate
    c0 = pc.eid_hi.T.reshape(n_mid, mid)[:, :, None]   # loop-invariant
    c1 = pc.eid_lo.T.reshape(n_mid, mid)[:, :, None]
    k = jnp.asarray(keys, jnp.uint32).reshape(G, -1)
    bits, _ = threefry2x32(k[:, 0][None, None, :],
                           k[:, 1][None, None, :], c0, c1)
    thresh = np.uint32(min(int(keep * 2 ** 32), 2 ** 32 - 1))
    return jnp.where(bits < thresh, (w_mid / keep)[:, :, None],
                     jnp.zeros_like(bits, jnp.float32))
