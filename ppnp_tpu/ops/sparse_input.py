"""Sparse first layer: fc1 = dropout(X_sparse) @ W through the SpMM kernel.

Reference analog: ``ppnp/pytorch/utils.py`` MixedLinear (~L40) +
MixedDropout/SparseDropout (~L15) — SURVEY.md §2.1: the reference NEVER
densifies the bag-of-words attribute matrix; its first layer multiplies a
sparse X by W and its input dropout drops X's nnz VALUES (rescaling
survivors by 1/(1-p)).

The previous TPU design densified X (dense matmuls beat sparse ops on the
MXU *per FLOP*), but at MS Academic scale the densified matrix is a 500MB
f32 array whose HBM streams dominate the epoch: the dropout copy
(read+write), fc1's forward read, the backward Xᵀ@dH read, and the
stopping-eval read — ~3GB/epoch for a matrix holding only ~150k nonzeros
(~0.1% dense). This module routes the first layer through the same
pair-chunks MXU kernel the propagation uses (``ppnp_tpu.kernels.spmm``):

- ``pc`` packs X (n×f, banded layout — rectangular operands are
  first-class in the packer); ``pc_t`` packs Xᵀ for the backward
  ``dW = X_dropᵀ @ dH`` (the custom VJP in kernels/spmm.py);
- input dropout is EDGE dropout on X's packed values, keyed by canonical
  edge id (``ops/hashrng.py``) so the forward and transpose packings
  regenerate the identical mask with zero cross-layout gathers — the
  exact fwd/bwd mask-consistency mechanism the propagation operator uses;
- per SpMM the kernel streams ~12B per nnz slot instead of 4B per DENSE
  entry — at 0.1% density that is ~250× less HBM traffic per X pass, and
  the dense dropout copy disappears entirely.

Semantics are identical to the reference's MixedDropout∘MixedLinear:
dropping a structural zero is a no-op, so masking only the nnz values is
the same distribution the dense path sampled (mask draws differ at the
RNG-stream level only — seed-class variance).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp
from flax import struct

from ppnp_tpu.ops.dropout import edge_dropout_by_id
from ppnp_tpu.ops.pairchunks import (PairChunks, packer_for,
                                     select_geometry, slot_permutation,
                                     to_device, transpose_ids)

__all__ = ["SparseInput", "build_sparse_input", "ShardedSparseInput",
           "build_sharded_sparse_input"]


@struct.dataclass
class SparseInput:
    """The attribute matrix X packed for the kernel, with its adjoint.

    Drop-in replacement for the densified X in ``mlp_forward``: carries
    the packed forward operator (X), the transpose packing (Xᵀ, the
    backward operator), and the slot permutation fallback. A registered
    pytree, so it rides through jitted train steps exactly like the
    dense array it replaces.
    """

    pc: PairChunks          # packing of X (n_rows × n_features)
    pc_t: PairChunks        # packing of Xᵀ (n_features × n_rows)
    w_perm: jnp.ndarray     # slot perm pc→pc_t (custom-VJP fallback)
    n_rows: int = struct.field(pytree_node=False)
    n_features: int = struct.field(pytree_node=False)
    nnz: int = struct.field(pytree_node=False)

    @property
    def shape(self):
        return (self.n_rows, self.n_features)

    @property
    def dtype(self):
        return self.pc.e_w.dtype

    def matmul(self, w: jnp.ndarray, *, key: Optional[jax.Array] = None,
               train: bool = False, drop_prob: float = 0.5) -> jnp.ndarray:
        """``dropout(X) @ w`` — differentiable w.r.t. ``w``.

        Train mode draws a fresh id-keyed Bernoulli mask over X's nnz
        values (the reference's input MixedDropout); eval mode uses the
        stored (L1-normalized) values. Returns (n_rows, w.shape[1]).
        """
        from ppnp_tpu.kernels.spmm import _spmm_vjp
        pc, pc_t = self.pc, self.pc_t
        if train and drop_prob > 0.0 and key is not None:
            e_w = edge_dropout_by_id(key, pc, drop_prob)
            e_w_t = edge_dropout_by_id(key, pc_t, drop_prob)
        else:
            e_w, e_w_t = pc.e_w, pc_t.e_w
        if w.dtype != jnp.float32:
            w = w.astype(jnp.float32)  # kernel operands/accum are f32
        wp = jnp.pad(w, ((0, pc.n_cols_pad - self.n_features), (0, 0)))
        return _spmm_vjp(wp, e_w, None, pc, pc_t, self.w_perm, e_w_t,
                         False)


def build_sparse_input(attr: sp.spmatrix, n_rows: Optional[int] = None,
                       layout: str = "auto", **geo) -> SparseInput:
    """Pack an (already L1-normalized) sparse attribute matrix.

    ``n_rows``: target row count ≥ attr rows (sharded/padded propagators
    need H⁰ padded to their row grid; the extra rows are structurally
    empty — zero pack cost, zero kernel cost beyond output padding).

    ``layout="auto"`` runs the issue-cost geometry model independently
    for X and Xᵀ (their shapes/banding differ — X is n×f, Xᵀ f×n);
    explicit geometry kwargs pin both. X is rectangular so no RCM
    reorder applies; bag-of-words matrices need none — a 256-row dst
    band already pools enough sorted srcs that segments pack full.
    """
    csr = attr.tocsr().astype(np.float32)
    n, f = csr.shape
    n_rows = int(n_rows or n)
    if n_rows < n:
        raise ValueError(f"n_rows={n_rows} < attribute rows {n}")
    if n_rows > n:
        csr = sp.csr_matrix((csr.data, csr.indices, np.pad(
            csr.indptr, (0, n_rows - n), mode="edge")), shape=(n_rows, f))

    geo_f = dict(geo)
    geo_t = dict(geo)
    if layout == "auto":
        layout = "banded"
        if not geo:
            if jax.default_backend() == "cpu":
                # Interpret mode (CPU tests / the multichip dryrun):
                # the TPU-tuned geometry inlines 512 dots per grid step
                # — minutes of XLA:CPU compile. Use the same reduced
                # unroll the sharded dryrun packs with; performance is
                # irrelevant off-TPU.
                geo_f = geo_t = dict(window=128, window_src=128,
                                     chunk=8, seg_per_mid=8,
                                     mids_per_step=4)
            else:
                geo_f = select_geometry(csr)
                geo_f.pop("cost")
                geo_t = select_geometry(csr.T.tocsr())
                geo_t.pop("cost")
    packer = packer_for(layout)
    pc = packer(csr, edge_ids="direct", device=False, **geo_f)
    pc_t = packer(csr.T.tocsr(), edge_ids=transpose_ids("direct"),
                  device=False, **geo_t)
    w_perm = jnp.asarray(slot_permutation(pc, pc_t))
    return SparseInput(pc=to_device(pc), pc_t=to_device(pc_t),
                       w_perm=w_perm, n_rows=n_rows, n_features=f,
                       nnz=int(csr.nnz))


@struct.dataclass
class ShardedSparseInput:
    """Row-sharded sparse X: per-shard pair-chunk packings, stacked.

    The pod-scale twin of ``SparseInput`` (VERDICT r4 Weak #7: the
    sharded MLP tower previously re-densified X per shard, re-creating
    the HBM-stream problem the sparse first layer solved on one chip).
    Each shard owns rows ``[d·S, (d+1)·S)`` of X — the SAME row grid as
    the sharded propagator — so fc1 is embarrassingly parallel: no
    exchange, ``fc1_d = dropout_id(X_d) @ W`` per shard inside
    ``shard_map`` with W replicated. ``shard_map``'s transpose rule
    psums the replicated W's cotangent, giving the correct
    ``dW = Σ_d X_dᵀ @ dH_d`` without explicit collectives.

    Works on flat 1-axis meshes (``axes=("data",)``) and hierarchical
    DCN×ICI meshes (``axes=("dcn", "ici")``) alike — the output carries
    ``P(axes, None)``, matching the propagator's input sharding.
    """

    pc: PairChunks          # stacked per-shard packings of X rows
    pc_t: PairChunks        # stacked per-shard packings of X_dᵀ
    w_perm: jnp.ndarray     # stacked slot perms (leading shard axis)
    mesh: object = struct.field(pytree_node=False)
    axes: tuple = struct.field(pytree_node=False)
    n_rows: int = struct.field(pytree_node=False)       # padded n
    n_features: int = struct.field(pytree_node=False)
    nnz: int = struct.field(pytree_node=False)
    shard_rows: int = struct.field(pytree_node=False)
    n_shards: int = struct.field(pytree_node=False)

    @property
    def shape(self):
        return (self.n_rows, self.n_features)

    @property
    def dtype(self):
        return self.pc.e_w.dtype

    def matmul(self, w: jnp.ndarray, *, key: Optional[jax.Array] = None,
               train: bool = False, drop_prob: float = 0.5) -> jnp.ndarray:
        """``dropout(X) @ w`` sharded over the node axis.

        Same contract as ``SparseInput.matmul``; the result is
        row-sharded ``P(axes, None)`` over the mesh. Per-shard dropout
        keys fold in the global shard id so shards draw independent
        masks on their disjoint X rows (per-shard packings reuse local
        edge-id space).
        """
        from jax.sharding import PartitionSpec as P
        from ppnp_tpu.kernels.spmm import _spmm_vjp

        apply_drop = bool(train and drop_prob > 0.0 and key is not None)
        axes = self.axes
        ax = axes if len(axes) > 1 else axes[0]
        mesh_shape = dict(self.mesh.shape)
        if w.dtype != jnp.float32:
            w = w.astype(jnp.float32)
        wp = jnp.pad(w, ((0, self.pc.n_cols_pad - self.n_features),
                         (0, 0)))
        if key is None:
            key = jnp.zeros((2,), dtype=jnp.uint32)

        def shard_fn(pcs, pcs_t, perms, wp, key):
            pc = jax.tree.map(lambda a: a[0], pcs)
            pc_t = jax.tree.map(lambda a: a[0], pcs_t)
            perm = perms[0]
            if apply_drop:
                me = jnp.int32(0)
                for name in axes:
                    me = me * mesh_shape[name] + jax.lax.axis_index(name)
                k_me = jax.random.fold_in(key, me)
                e_w = edge_dropout_by_id(k_me, pc, drop_prob)
                e_w_t = edge_dropout_by_id(k_me, pc_t, drop_prob)
            else:
                e_w, e_w_t = pc.e_w, pc_t.e_w
            return _spmm_vjp(wp, e_w, None, pc, pc_t, perm, e_w_t, False)

        f = jax.shard_map(
            shard_fn, mesh=self.mesh,
            in_specs=(P(ax), P(ax), P(ax), P(), P()),
            out_specs=P(ax, None), check_vma=False)
        return f(self.pc, self.pc_t, self.w_perm, wp, key)


def build_sharded_sparse_input(attr: sp.spmatrix, *, shard_rows: int,
                               n_shards: int, mesh, axes=("data",),
                               layout: str = "auto",
                               **geo) -> ShardedSparseInput:
    """Pack sparse X row-sliced on the sharded propagator's row grid.

    ``shard_rows``/``n_shards`` come from the partition
    (``ShardedGraph``/``HierShardedGraph``) so X's row ownership matches
    H⁰'s exactly. Geometry must be shard-invariant for stacking: one
    static (window, chunk, spm) serves every shard (auto = the packer's
    TPU defaults; the reduced unroll on CPU, as ``build_sparse_input``).
    """
    from ppnp_tpu.ops.pairchunks import (pad_stack_pair_chunks,
                                         stack_slot_permutations)

    csr = attr.tocsr().astype(np.float32)
    n, f = csr.shape
    n_pad = shard_rows * n_shards
    if n_pad < n:
        raise ValueError(f"shard grid {n_pad} rows < attribute rows {n}")
    if n_pad > n:
        csr = sp.csr_matrix((csr.data, csr.indices, np.pad(
            csr.indptr, (0, n_pad - n), mode="edge")), shape=(n_pad, f))

    if layout == "auto":
        layout = "banded"
        if not geo:
            if jax.default_backend() == "cpu":
                geo = dict(window=128, window_src=128, chunk=8,
                           seg_per_mid=8, mids_per_step=4)
    packer = packer_for(layout)
    pcs, pcts, perms = [], [], []
    for d in range(n_shards):
        sub = csr[d * shard_rows:(d + 1) * shard_rows]
        pcs.append(packer(sub, edge_ids="direct", device=False, **geo))
        pcts.append(packer(sub.T.tocsr(),
                           edge_ids=transpose_ids("direct"),
                           device=False, **geo))
        perms.append(slot_permutation(pcs[-1], pcts[-1]))
    pc = pad_stack_pair_chunks(pcs)
    pc_t = pad_stack_pair_chunks(pcts)
    n_slots_t = int(pc_t.e_src.shape[-1]) * pcts[0].chunk
    w_perm = jnp.asarray(stack_slot_permutations(perms, n_slots_t))
    return ShardedSparseInput(
        pc=pc, pc_t=pc_t, w_perm=w_perm, mesh=mesh, axes=tuple(axes),
        n_rows=n_pad, n_features=f, nnz=int(csr.nnz),
        shard_rows=shard_rows, n_shards=n_shards)
