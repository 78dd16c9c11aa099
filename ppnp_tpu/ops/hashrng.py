"""Stateless counter-keyed RNG: Threefry-2x32 over explicit counters.

Why this exists: APPNP edge dropout needs the SAME Bernoulli draw for a
given edge in two different static packings (the forward operator and
its transpose — SURVEY.md §3.3's Â_drop / Â_dropᵀ pair). Gathering the
forward mask into the transpose slot order costs a ~nnz scalar gather
per power-iteration step on TPU (measured 2.6ms/step on MS Academic);
regenerating the mask from a per-edge COUNTER (the canonical edge id,
stored in both packings at pack time) is a pure VPU bit-op pass with no
gather at all.

The generator is the standard Threefry-2x32 (Salmon et al., SC'11) —
the same algorithm behind ``jax.random`` — applied to a 64-bit counter
split into two 32-bit words. Quality is that of the underlying cipher;
determinism depends only on (key, edge id), not on slot order.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

__all__ = ["threefry2x32", "uniform_bits"]

_ROT_A = (13, 15, 26, 6)
_ROT_B = (17, 29, 16, 24)
# numpy (not device) constant: a module-level device array would
# be re-lifted as a fresh constant per trace, and a uint32 scalar
# appearing in many traces is exactly the shape of value that JAX
# constant caches can hand back as a STALE tracer across traces
# (seen as 'Shouldn't have any non-shard_map tracers' in
# grad-of-shard_map after an eager forward).
_PARITY = np.uint32(0x1BD11BDA)


def _rotl(x, r):
    return (x << r) | (x >> (32 - r))


def _rounds(x0, x1, rots):
    for r in rots:
        x0 = x0 + x1
        x1 = _rotl(x1, r)
        x1 = x1 ^ x0
    return x0, x1


def threefry2x32(k0, k1, c0, c1):
    """Threefry-2x32(key=(k0,k1), counter=(c0,c1)) → two uint32 blocks.

    All inputs uint32 (arrays broadcast); 20 rounds with the standard
    key-schedule injections.
    """
    k0 = jnp.asarray(k0, jnp.uint32)
    k1 = jnp.asarray(k1, jnp.uint32)
    x0 = jnp.asarray(c0, jnp.uint32)
    x1 = jnp.asarray(c1, jnp.uint32)
    ks = (k0, k1, k0 ^ k1 ^ _PARITY)

    x0 = x0 + ks[0]
    x1 = x1 + ks[1]
    for i, rots in enumerate((_ROT_A, _ROT_B, _ROT_A, _ROT_B, _ROT_A)):
        x0, x1 = _rounds(x0, x1, rots)
        x0 = x0 + ks[(i + 1) % 3]
        x1 = x1 + ks[(i + 2) % 3] + np.uint32(i + 1)
    return x0, x1


def uniform_bits(key, c0, c1):
    """uint32 uniform bits keyed by a (2,)-uint32 key and a counter pair.

    ``key`` is a legacy ``jax.random`` key (shape (2,), uint32) — the
    kind produced by ``jax.random.PRNGKey``/``split`` in this codebase.
    """
    key = jnp.asarray(key, jnp.uint32).reshape(-1)
    out, _ = threefry2x32(key[0], key[1], c0, c1)
    return out
