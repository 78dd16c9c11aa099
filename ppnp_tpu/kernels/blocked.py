"""Blocked (HBM-streaming) pair-chunk SpMM for graphs larger than VMEM.

The single-kernel SpMM (``ppnp_tpu.kernels.spmm``) keeps H, init and out
fully VMEM-resident — every reference graph fits (SURVEY.md §2.1 dataset
table), but a production-scale graph at n ≳ 150k·(128/c) does not. The
reference's answer at any scale is torch.sparse on one device
(ppnp/pytorch/propagation.py ~L45); this module is the TPU-native answer
for ONE chip: H stays HBM-resident (BASELINE.json:2 "HBM-resident CSR")
and the operator is split into row blocks whose working set fits VMEM.

Key structural fact: after the global RCM reorder the matrix is banded,
so the src support of any row block ``[b·R, (b+1)·R)`` spans a bounded
column window ``[lo_b, lo_b + HW)`` with ``HW ≈ R + 2·bandwidth``. Each
block is packed as its own banded pair-chunk operator over that window;
propagation scans the blocks, ``dynamic_slice``-ing the H window from
HBM (XLA pipelines the slice DMA with the previous block's kernel) and
running the standard MXU kernel per block:

    out[b·R:(b+1)·R] = A_b @ H[lo_b:lo_b+HW] + init[b·R:(b+1)·R]

This is the single-chip twin of the mesh row-sharding in
``ppnp_tpu.parallel`` — same decomposition, sequential-in-time instead
of parallel-in-space, with HBM→VMEM streaming instead of ICI exchange.
HBM traffic per step ≈ nnz·12B (edge stream) + Σ HW·c·4 (H windows,
≈ n·c·4 + 2·bandwidth·c·4·B overlap) + n·c·4 (out) — near the
speed-of-light bytes of BASELINE.md for banded graphs.

Differentiable end-to-end: each block carries its transpose packing, the
``dynamic_slice`` adjoint scatter-adds the per-block dH windows, and the
block scan's reverse pass reuses the same machinery.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp
from flax import struct

from ppnp_tpu.utils.padding import round_up_to_multiple

__all__ = ["BlockedPairChunks", "build_blocked_pair_chunks",
           "spmm_blocked"]


@struct.dataclass
class BlockedPairChunks:
    """Per-row-block banded packings, stacked over a leading block axis.

    Array leaves of ``pcs``/``pcs_t`` have shape ``(n_blocks, ...)`` with
    one common static geometry (max over blocks, zero-padded — padding
    segments stream through the kernel and contribute exact zeros).
    """

    pcs: object                              # stacked PairChunks
    col_lo: jnp.ndarray                      # int32 (B,) H-window starts
    pcs_t: Optional[object] = None           # stacked transpose packings
    w_perms: Optional[jnp.ndarray] = None    # (B, n_slots_t) slot perms
    perm: Optional[jnp.ndarray] = None       # global row/col reorder
    iperm: Optional[jnp.ndarray] = None
    hw: int = struct.field(pytree_node=False, default=0)  # H-window rows
    rows_per_block: int = struct.field(pytree_node=False, default=0)
    n_blocks: int = struct.field(pytree_node=False, default=0)
    n_rows: int = struct.field(pytree_node=False, default=0)   # original n
    n_pad: int = struct.field(pytree_node=False, default=0)    # B·R

    @property
    def nnz(self) -> int:
        return self._nnz

    _nnz: int = struct.field(pytree_node=False, default=0)


def build_blocked_pair_chunks(
    mat: sp.spmatrix,
    rows_per_block: int = 16384,
    reorder: Optional[str] = "rcm",
    perm: Optional[np.ndarray] = None,
    with_adjoint: bool = True,
    geometry: Optional[str] = None,
    c: int = 128,
    **pack_kwargs,
) -> BlockedPairChunks:
    """Split a square Â into row blocks and pack each banded operator.

    ``reorder="rcm"`` (default) bounds the bandwidth so every block's
    column support fits one common window ``hw``; without it ``hw`` can
    degenerate to n and the point of blocking is lost.
    ``pack_kwargs`` forward to ``pair_chunks_banded`` (window geometry,
    edge_ids, use_native, ...).

    ``geometry="auto"`` runs the issue-cost model
    (``ppnp_tpu.ops.pairchunks.select_geometry``) on ONE representative
    block sub-operator — the actual (rows_per_block × hw) rectangular
    shape the packer sees, not the full matrix — and pins the pick for
    every block. After RCM the blocks share one bandwidth-bounded shape,
    so one pick per graph suffices; the middle block is used (first/last
    blocks have clipped bands). ``c`` is the feature width of the H
    operand (the model's lane-tile term). Explicit geometry kwargs in
    ``pack_kwargs`` override the model's pick.
    """
    from ppnp_tpu.ops.pairchunks import (_resolve_perm, pair_chunks_banded,
                                         pad_stack_pair_chunks,
                                         slot_permutation,
                                         stack_slot_permutations,
                                         transpose_ids, transpose_pair)

    csr = mat.tocsr()
    if csr is mat and not csr.has_canonical_format:
        csr = csr.copy()  # sum_duplicates would mutate the caller's matrix
    csr.sum_duplicates()
    n = csr.shape[0]
    if csr.shape[0] != csr.shape[1]:
        raise ValueError("blocked packing requires a square matrix")
    gperm = _resolve_perm(csr, reorder, perm)
    if gperm is not None:
        coo = csr.tocoo()
        inv = np.empty(n, dtype=np.int64)
        inv[gperm] = np.arange(n)
        csr = sp.coo_matrix(
            (coo.data, (inv[coo.row], inv[coo.col])),
            shape=csr.shape).tocsr()

    if rows_per_block % 8:
        raise ValueError("rows_per_block must be sublane (8) aligned")
    r = rows_per_block
    n_blocks = max(1, -(-n // r))
    n_pad = r * n_blocks

    # One CSR slice per block, reused for the window measurement and the
    # packing. Common H-window size: max block column span, 8-aligned,
    # clamped to the padded node count (tiny graphs: one window covers
    # everything).
    subs = [csr[b * r: min((b + 1) * r, n)].tocoo() for b in range(n_blocks)]
    spans, lo_list = [], []
    for sub in subs:
        if sub.nnz:
            lo = int(sub.col.min()) >> 3 << 3
            spans.append(int(sub.col.max()) + 1 - lo)
        else:
            lo = 0
            spans.append(8)
        lo_list.append(lo)
    hw = min(round_up_to_multiple(max(spans), 8), n_pad)
    col_lo = np.asarray([min(lo, n_pad - hw) for lo in lo_list],
                        dtype=np.int32)

    if geometry == "auto":
        from ppnp_tpu.ops.pairchunks import select_geometry
        nnz_per_block = np.asarray([sub.nnz for sub in subs])
        # Middle-most block among those within 2x of the densest: shape-
        # representative (unclipped band) without being an empty outlier.
        dense_enough = np.flatnonzero(nnz_per_block >= nnz_per_block.max()
                                      / 2)
        b0 = int(dense_enough[len(dense_enough) // 2])
        a_b0 = sp.coo_matrix(
            (subs[b0].data, (subs[b0].row, subs[b0].col - col_lo[b0])),
            shape=(r, hw)).tocsr()
        geo = select_geometry(
            a_b0, c=c, mids_per_step=pack_kwargs.get("mids_per_step", 16))
        geo.pop("cost")
        for k in tuple(geo):
            if k in pack_kwargs:
                geo.pop(k)  # explicit kwargs win
        pack_kwargs.update(geo)
    elif geometry is not None:
        raise ValueError(f"unknown geometry {geometry!r} (use 'auto' or "
                         "explicit pack kwargs)")

    pack_kwargs.setdefault("device", False)
    pack_kwargs.setdefault("use_native", "auto")
    # The transpose packing needs the FLIPPED edge-id orientation or
    # id-keyed dropout draws different masks in the backward operator.
    t_kwargs = dict(pack_kwargs)
    t_kwargs["edge_ids"] = transpose_ids(
        pack_kwargs.get("edge_ids", "direct"))
    pcs, pcts, perms = [], [], []
    for b, sub in enumerate(subs):
        a_b = sp.coo_matrix(
            (sub.data, (sub.row, sub.col - col_lo[b])),
            shape=(r, hw)).tocsr()
        pcs.append(pair_chunks_banded(a_b, **pack_kwargs))
        if with_adjoint:
            pc_t = transpose_pair(a_b, layout="banded", **t_kwargs)
            perms.append(slot_permutation(pcs[-1], pc_t))
            pcts.append(pc_t)
    del subs

    pcs_stacked = pad_stack_pair_chunks(pcs)
    pcts_stacked = w_perms = None
    if with_adjoint:
        pcts_stacked = pad_stack_pair_chunks(pcts)
        n_slots_t = int(pcts_stacked.e_src.shape[-1]) * pcts[0].chunk
        w_perms = jnp.asarray(
            stack_slot_permutations(perms, n_slots_t))

    iperm = None
    if gperm is not None:
        iperm = np.empty_like(gperm)
        iperm[gperm] = np.arange(len(gperm))
    return BlockedPairChunks(
        pcs=pcs_stacked, pcs_t=pcts_stacked, w_perms=w_perms,
        col_lo=jnp.asarray(col_lo),
        perm=None if gperm is None else jnp.asarray(gperm.astype(np.int32)),
        iperm=None if iperm is None else jnp.asarray(iperm.astype(np.int32)),
        hw=hw, rows_per_block=r, n_blocks=n_blocks, n_rows=n, n_pad=n_pad,
        _nnz=int(csr.nnz))


def spmm_blocked(bpc: BlockedPairChunks, h: jnp.ndarray,
                 init: Optional[jnp.ndarray] = None,
                 key: Optional[jax.Array] = None,
                 drop_prob: float = 0.0,
                 scale: float = 1.0) -> jnp.ndarray:
    """One blocked SpMM step: ``out = scale·(A_drop @ H) + init``.

    ``h``/``init``/result are (n_pad, c) in PACKED row order (apply
    ``bpc.perm`` once outside the power-iteration loop). ``key`` draws a
    fresh edge-dropout mask (id-keyed when the packings carry edge ids,
    so the transpose packing regenerates the identical mask for the
    backward pass — gather-free). ``scale`` folds the APPNP (1-α) into
    the edge weights.
    """
    from ppnp_tpu.kernels import spmm as spmm_mod
    from ppnp_tpu.ops.dropout import edge_dropout, edge_dropout_by_id

    c = h.shape[-1]
    r, hw = bpc.rows_per_block, bpc.hw
    differentiable = bpc.pcs_t is not None
    use_ids = (differentiable and bpc.pcs.eid_hi is not None
               and bpc.pcs_t.eid_hi is not None)
    if init is None:
        init = jnp.zeros((bpc.n_pad, c), h.dtype)
    init_blocks = init.reshape(bpc.n_blocks, r, c)
    block_ids = jnp.arange(bpc.n_blocks, dtype=jnp.uint32)

    if differentiable:
        xs = (block_ids, bpc.pcs, bpc.pcs_t, bpc.w_perms, bpc.col_lo,
              init_blocks)
    else:
        xs = (block_ids, bpc.pcs, bpc.col_lo, init_blocks)

    def weights(b, pc_b, pc_t_b):
        w_t = None
        if key is not None and drop_prob > 0.0:
            # Decorrelate blocks: their per-matrix edge ids overlap.
            k_b = jax.random.fold_in(key, b)
            if use_ids:
                w_it = edge_dropout_by_id(k_b, pc_b, drop_prob)
                w_t = scale * edge_dropout_by_id(k_b, pc_t_b, drop_prob)
            else:
                w_it = edge_dropout(k_b, pc_b.e_w, drop_prob)
        else:
            w_it = pc_b.e_w
            if differentiable:
                w_t = scale * pc_t_b.e_w
        return scale * w_it, w_t

    def body(_, xs_b):
        if differentiable:
            b, pc_b, pc_t_b, perm_b, lo, init_b = xs_b
        else:
            b, pc_b, lo, init_b = xs_b
            pc_t_b = perm_b = None
        w_b, w_t_b = weights(b, pc_b, pc_t_b)
        hs = jax.lax.dynamic_slice(h, (lo, 0), (hw, c))
        if differentiable:
            out_b = spmm_mod._spmm_vjp(hs, w_b, init_b, pc_b, pc_t_b,
                                       perm_b, w_t_b, False)
        else:
            out_b = spmm_mod.spmm_pair_chunks(pc_b, hs, w_b, init=init_b,
                                              assume_permuted=True)
        return None, out_b

    _, outs = jax.lax.scan(body, None, xs)
    return outs.reshape(bpc.n_pad, c)
