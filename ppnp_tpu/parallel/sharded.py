"""Row-sharded APPNP power iteration under ``shard_map``.

No reference analog (SURVEY.md §2.2). Per BASELINE.json:5: each
power-iteration step is (1) boundary-row exchange — ``all_to_all`` of the
precomputed send lists (or a plain ``all_gather`` fallback) — then (2) a
local SpMM over the shard's edges, then (3) the α-mix with the local slice
of H⁰. The XLA path splits (2) at the partition's static
``interior_pad`` mark: interior edges read only local H rows, so the
exchange overlaps with the interior SpMM (comm/compute latency hiding);
only the boundary edges wait on ``recv``. The node axis is simultaneously the data-parallel and the
model/row-sharding axis (the graph analog of sequence parallelism —
SURVEY.md §5 "long-context" row).

The operator implements the same callable protocol as
``PPRPowerIteration`` / ``PPRExact`` so it drops into the same training
loop; the single-device mesh case degenerates to the unsharded math and is
tested against the unsharded oracle (SURVEY.md §4).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ppnp_tpu.ops.dropout import edge_dropout, edge_dropout_by_id
from ppnp_tpu.parallel.mesh import NODE_AXIS
from ppnp_tpu.parallel.partition import ShardedGraph

__all__ = ["ShardedPowerIteration"]


@struct.dataclass
class ShardedPowerIteration:
    """K sharded steps of H ← (1-α)ÂH + αH⁰ with boundary exchange.

    ``backend="pallas"`` runs each shard's local SpMM through the
    pair-chunk MXU kernel (``ppnp_tpu.kernels.spmm``) instead of XLA
    gather+segment-sum: pass the stacked per-shard packings from
    ``ppnp_tpu.parallel.partition.build_sharded_pair_chunks``. The α-mix
    is fused into the kernel (α·H⁰ seeds the accumulator, (1-α) folds
    into the edge weights) and the backward pass runs each shard's
    transpose packing — the boundary-exchange cotangent rides XLA's
    ``all_to_all`` autodiff. Requires ``exchange="alltoall"``.
    """

    graph: ShardedGraph
    mesh: Mesh = struct.field(pytree_node=False)
    # (interior, boundary) tuples of stacked per-shard packings /
    # transpose packings / slot permutations, from
    # partition.build_sharded_pair_chunks.
    pair_chunks: Optional[object] = None
    pair_chunks_t: Optional[object] = None
    w_perm: Optional[object] = None
    alpha: float = struct.field(pytree_node=False, default=0.1)
    niter: int = struct.field(pytree_node=False, default=10)
    drop_prob: float = struct.field(pytree_node=False, default=0.5)
    exchange: str = struct.field(pytree_node=False, default="alltoall")
    backend: str = struct.field(pytree_node=False, default="xla")
    axis: str = struct.field(pytree_node=False, default=NODE_AXIS)

    @property
    def n_rows(self) -> int:
        """Padded row count the caller must supply H⁰ with."""
        return self.graph.n_pad

    def propagate(self, h0: jnp.ndarray, *, key: Optional[jax.Array] = None,
                  train: bool = False) -> jnp.ndarray:
        if self.backend == "pallas":
            return self._propagate_pallas(h0, key=key, train=train)
        g = self.graph
        c = h0.shape[-1]
        apply_drop = bool(train and self.drop_prob > 0.0 and key is not None)
        alpha = self.alpha

        ip = g.interior_pad  # static [interior | boundary] edge split

        def shard_fn(h0_loc, dst, src, srcg, w, send_idx, keys):
            # Per-device slices keep a leading length-1 shard axis.
            dst, src, srcg, w = dst[0], src[0], srcg[0], w[0]
            send_idx = send_idx[0]
            me = jax.lax.axis_index(self.axis)
            alpha_h0 = alpha * h0_loc

            def segsum(gathered, w_part, dst_part):
                return jax.ops.segment_sum(
                    gathered * w_part[:, None], dst_part,
                    num_segments=g.shard_rows, indices_are_sorted=True)

            def step(h_loc, k):
                if apply_drop:
                    # Decorrelate shards: each owns a disjoint edge set.
                    w_it = edge_dropout(jax.random.fold_in(k, me), w,
                                        self.drop_prob)
                else:
                    w_it = w
                if self.exchange == "allgather":
                    table = jax.lax.all_gather(h_loc, self.axis, axis=0,
                                               tiled=True)
                    # Interior edges read only local rows (src[:ip] is
                    # the local index), so the all_gather overlaps with
                    # the interior segsum exactly like the alltoall path;
                    # only the boundary segsum waits on the table.
                    out = (segsum(jnp.take(h_loc, src[:ip], axis=0),
                                  w_it[:ip], dst[:ip])
                           + segsum(jnp.take(table, srcg[ip:], axis=0),
                                    w_it[ip:], dst[ip:]))
                else:
                    # Boundary exchange: send the precomputed row lists,
                    # receive every other shard's contribution. The
                    # interior SpMM reads only h_loc, so XLA's async
                    # collectives overlap the all_to_all with it; only
                    # the (small) boundary SpMM waits for recv.
                    send = jnp.take(h_loc, send_idx, axis=0)  # (nd, B, c)
                    recv = jax.lax.all_to_all(
                        send, self.axis, split_axis=0, concat_axis=0,
                        tiled=False)
                    out = segsum(jnp.take(h_loc, src[:ip], axis=0),
                                 w_it[:ip], dst[:ip])
                    out = out + segsum(
                        jnp.take(recv.reshape(-1, c),
                                 src[ip:] - g.shard_rows, axis=0),
                        w_it[ip:], dst[ip:])
                return (1.0 - alpha) * out + alpha_h0, None

            h_loc, _ = jax.lax.scan(step, h0_loc, keys)
            return h_loc

        if apply_drop:
            keys = jax.random.split(key, self.niter)
        else:
            keys = jnp.zeros((self.niter, 2), dtype=jnp.uint32)

        a = self.axis
        f = jax.shard_map(
            shard_fn, mesh=self.mesh,
            in_specs=(P(a, None), P(a), P(a), P(a), P(a), P(a), P()),
            out_specs=P(a, None), check_vma=False)
        return f(h0, g.dst, g.src, g.src_global, g.w, g.send_idx, keys)

    def _propagate_pallas(self, h0: jnp.ndarray, *, key, train):
        """Sharded propagation with the pair-chunk MXU kernel per shard.

        Same exchange schedule as the XLA path, including the overlap
        decomposition: the interior operator reads only ``H_loc`` so the
        all_to_all hides behind its (large) kernel, and the boundary
        operator chains through the kernel's fused ``init`` accumulator:
        ``out = A_b @ recv + (A_i @ H_loc + α·H⁰_loc)``.
        """
        if self.exchange != "alltoall":
            raise ValueError("pallas sharded propagation requires "
                             "exchange='alltoall'")
        if self.pair_chunks is None:
            raise ValueError(
                "backend='pallas' requires the stacked per-shard packings "
                "(ppnp_tpu.parallel.partition.build_sharded_pair_chunks)")
        from ppnp_tpu.kernels.spmm import _spmm_vjp

        g = self.graph
        c = h0.shape[-1]
        apply_drop = bool(train and self.drop_prob > 0.0 and key is not None)
        alpha = self.alpha
        differentiable = self.pair_chunks_t is not None

        def shard_fn(h0_loc, pcs, pcs_t, w_perms, send_idx, keys):
            pc_i, pc_b = jax.tree.map(lambda x: x[0], pcs)
            send_idx = send_idx[0]
            if differentiable:
                pc_i_t, pc_b_t = jax.tree.map(lambda x: x[0], pcs_t)
                perm_i, perm_b = w_perms[0][0], w_perms[1][0]
            else:
                pc_i_t = pc_b_t = perm_i = perm_b = None
            me = jax.lax.axis_index(self.axis)
            alpha_h0 = alpha * h0_loc  # fused α-mix accumulator seed
            use_ids = (differentiable and pc_i.eid_hi is not None
                       and pc_i_t.eid_hi is not None)

            def local_spmm(pc, pc_t, perm, table, w_it, w_t, init):
                if differentiable:
                    return _spmm_vjp(table, w_it, init, pc, pc_t, perm,
                                     w_t, False)
                from ppnp_tpu.kernels import spmm as spmm_mod
                return spmm_mod.spmm_pair_chunks(
                    pc, table, w_it, init=init, assume_permuted=True)

            def part_weights(k_part, pc, pc_t):
                """(forward, transpose) weights for one operator part."""
                w_t = None
                if apply_drop:
                    if use_ids:
                        # Id-keyed masks regenerate identically in the
                        # transpose packing — gather-free backward.
                        w_it = edge_dropout_by_id(k_part, pc,
                                                  self.drop_prob)
                        w_t = (1.0 - alpha) * edge_dropout_by_id(
                            k_part, pc_t, self.drop_prob)
                    else:
                        w_it = edge_dropout(k_part, pc.e_w, self.drop_prob)
                else:
                    w_it = pc.e_w
                    if differentiable:
                        w_t = (1.0 - alpha) * pc_t.e_w
                return (1.0 - alpha) * w_it, w_t

            def step(h_loc, k):
                if apply_drop:
                    # Decorrelate shards (disjoint edge sets) and the two
                    # operator parts (their per-matrix edge ids overlap).
                    k_me = jax.random.fold_in(k, me)
                    k_i = jax.random.fold_in(k_me, 0)
                    k_b = jax.random.fold_in(k_me, 1)
                else:
                    k_i = k_b = None
                w_i, w_i_t = part_weights(k_i, pc_i, pc_i_t)
                w_b, w_b_t = part_weights(k_b, pc_b, pc_b_t)
                send = jnp.take(h_loc, send_idx, axis=0)  # (nd, B, c)
                recv = jax.lax.all_to_all(
                    send, self.axis, split_axis=0, concat_axis=0,
                    tiled=False)
                # Interior kernel depends only on h_loc — the all_to_all
                # overlaps with it; the boundary kernel waits on recv.
                out = local_spmm(pc_i, pc_i_t, perm_i, h_loc, w_i, w_i_t,
                                 alpha_h0)
                out = local_spmm(pc_b, pc_b_t, perm_b, recv.reshape(-1, c),
                                 w_b, w_b_t, out)
                return out, None

            h_loc, _ = jax.lax.scan(step, h0_loc, keys)
            return h_loc

        if apply_drop:
            keys = jax.random.split(key, self.niter)
        else:
            keys = jnp.zeros((self.niter, 2), dtype=jnp.uint32)

        a = self.axis
        f = jax.shard_map(
            shard_fn, mesh=self.mesh,
            in_specs=(P(a, None), P(a), P(a), P(a), P(a), P()),
            out_specs=P(a, None), check_vma=False)
        return f(h0, self.pair_chunks, self.pair_chunks_t, self.w_perm,
                 g.send_idx, keys)

    def __call__(self, h_local: jnp.ndarray,
                 idx: Optional[jnp.ndarray] = None, *,
                 key: Optional[jax.Array] = None,
                 train: bool = False) -> jnp.ndarray:
        h = self.propagate(h_local, key=key, train=train)
        if idx is not None:
            h = jnp.take(h, idx, axis=0)
        return h

    def input_sharding(self) -> NamedSharding:
        """The sharding H⁰ (and X) should carry: rows over the mesh."""
        return NamedSharding(self.mesh, P(self.axis, None))
