"""Top-k candidate retrieval over the (sharded) propagated embedding table.

No reference analog — this is the new capability from BASELINE.json:5,11:
"the trained propagated embeddings back a top-k candidate-retrieval path
(batched dot-product scoring over the sharded embedding table)".

Design:

- ``build_embedding_table`` materializes the propagated table once at eval
  time: either the propagated hidden activations (``level='hidden'``, the
  embedding used for retrieval) or propagated logits (``level='logits'``).
- Unsharded scoring: one ``Q @ Tᵀ`` + ``lax.top_k``.
- Sharded scoring (``retrieve_topk_sharded``): the table stays row-sharded
  over the mesh; each shard scores locally on its rows, takes a local
  top-k, and the per-shard candidates (k·n_shards of them) are merged with
  one small ``all_gather`` + global top-k — communication is O(q·k·nd),
  never O(q·n).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ppnp_tpu.models.appnp import mlp_forward
from ppnp_tpu.parallel.mesh import NODE_AXIS

__all__ = ["build_embedding_table", "retrieve_topk",
           "retrieve_topk_sharded", "retrieve_topk_qsharded"]


def build_embedding_table(params, x: jnp.ndarray, propagator,
                          level: str = "hidden") -> jnp.ndarray:
    """Propagated node-embedding table (eval mode, full graph).

    ``level='hidden'``: propagate the last hidden activations (the
    retrieval embedding). ``level='logits'``: propagate the local logits
    (the classifier's table, same as the model forward).
    """
    if level == "hidden":
        # Run the MLP up to (and including) the last hidden layer.
        h = x
        for i, w in enumerate(params[:-1]):
            h = jax.nn.relu(h @ w)
        h_local = h
    elif level == "logits":
        h_local = mlp_forward(params, x, train=False)
    else:
        raise ValueError(f"unknown level {level!r}")
    return propagator.propagate(h_local, train=False)


from functools import partial


@partial(jax.jit, static_argnames=("k",))
def retrieve_topk(queries: jnp.ndarray, table: jnp.ndarray, k: int = 10
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(scores, indices) of the top-k table rows per query row."""
    scores = queries @ table.T
    return jax.lax.top_k(scores, k)


def retrieve_topk_sharded(queries: jnp.ndarray, table: jnp.ndarray,
                          k: int, mesh, axis: str = NODE_AXIS,
                          n_valid: Optional[int] = None,
                          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Global top-k over a row-sharded table: local top-k + merge.

    ``table`` is (n_pad, d) sharded P(axis, None); ``queries`` (q, d)
    replicated. Returns replicated (scores, indices), indices global.
    ``n_valid`` masks the zero padding rows at the table's tail (they
    would otherwise outscore negative matches).
    """
    n_shards = mesh.shape[axis]
    shard_rows = table.shape[0] // n_shards
    if n_valid is None:
        n_valid = table.shape[0]

    def shard_fn(q, t_loc):
        scores = jnp.dot(q, t_loc.T,
                         preferred_element_type=jnp.float32)  # (q, S)
        me = jax.lax.axis_index(axis)
        row_ids = me * shard_rows + jnp.arange(shard_rows)
        scores = jnp.where(row_ids[None, :] < n_valid, scores, -jnp.inf)
        loc_s, loc_i = jax.lax.top_k(scores, k)
        glob_i = loc_i + me * shard_rows
        # Gather every shard's candidates: (nd*k) per query.
        all_s = jax.lax.all_gather(loc_s, axis, axis=1, tiled=True)
        all_i = jax.lax.all_gather(glob_i, axis, axis=1, tiled=True)
        best_s, pos = jax.lax.top_k(all_s, k)
        best_i = jnp.take_along_axis(all_i, pos, axis=1)
        return best_s, best_i

    f = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(axis, None)),
        out_specs=(P(), P()), check_vma=False)
    return f(queries, table)


def retrieve_topk_qsharded(queries: jnp.ndarray, table: jnp.ndarray,
                           k: int, mesh, axis: str = NODE_AXIS,
                           n_valid: Optional[int] = None,
                           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Many-query retrieval: queries AND results sharded over the mesh.

    ``retrieve_topk_sharded`` replicates the queries and the merged
    result — right for few queries, wasteful for a large batch: its
    all_gather moves q·k·n_shards candidates to EVERY device and every
    device redundantly merges all of them. This path keeps the query
    batch sharded ``P(axis, None)`` end-to-end with a TRANSPOSED merge:

    1. all_gather the (small, d-wide) query shards so each shard can
       score the full batch against its local table rows — comm q·d;
    2. local top-k per shard over its rows, for all q queries;
    3. ``all_to_all`` the (q, k) candidate block along the query axis —
       shard i receives every shard's candidates for ITS q/n_shards
       queries (comm q·k per device, independent of n_shards);
    4. each shard merges only its own query block.

    Returns (scores, indices) sharded ``P(axis, None)``; ``q`` must be
    divisible by ``n_shards``. Per-device merge compute and result
    memory drop by n_shards vs the replicated path.
    """
    n_shards = mesh.shape[axis]
    shard_rows = table.shape[0] // n_shards
    if queries.shape[0] % n_shards:
        raise ValueError(f"query count {queries.shape[0]} not divisible "
                         f"by n_shards={n_shards}")
    if n_valid is None:
        n_valid = table.shape[0]

    def shard_fn(q_loc, t_loc):
        me = jax.lax.axis_index(axis)
        q_all = jax.lax.all_gather(q_loc, axis, axis=0, tiled=True)
        scores = jnp.dot(q_all, t_loc.T,
                         preferred_element_type=jnp.float32)  # (q, S)
        row_ids = me * shard_rows + jnp.arange(shard_rows)
        scores = jnp.where(row_ids[None, :] < n_valid, scores, -jnp.inf)
        loc_s, loc_i = jax.lax.top_k(scores, k)          # (q, k)
        glob_i = loc_i + me * shard_rows
        # Transposed merge: split the query axis, concatenate the
        # candidate axis — shard i ends with (q/nd, nd·k) candidates
        # for exactly its own query block.
        mrg_s = jax.lax.all_to_all(loc_s, axis, split_axis=0,
                                   concat_axis=1, tiled=True)
        mrg_i = jax.lax.all_to_all(glob_i, axis, split_axis=0,
                                   concat_axis=1, tiled=True)
        best_s, pos = jax.lax.top_k(mrg_s, k)
        best_i = jnp.take_along_axis(mrg_i, pos, axis=1)
        return best_s, best_i

    f = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(axis, None), P(axis, None)),
        out_specs=(P(axis, None), P(axis, None)), check_vma=False)
    return f(queries, table)
