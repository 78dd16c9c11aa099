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

import jax
import jax.numpy as jnp

__all__ = ["dropout", "edge_dropout"]


def dropout(key: jax.Array, x: jnp.ndarray, rate: float) -> jnp.ndarray:
    """Inverted dropout: zero with prob ``rate``, scale kept by 1/(1-rate)."""
    if rate <= 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, p=keep, shape=x.shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x))


def edge_dropout(key: jax.Array, w: jnp.ndarray, rate: float) -> jnp.ndarray:
    """Dropout on the nnz values of Â — a fresh mask per power iteration.

    Padding entries have w == 0 and stay 0 under any mask.
    """
    return dropout(key, w, rate)
