"""Host-side row partition of Â with a static boundary-exchange plan.

No reference analog (SURVEY.md §2.2). Design per BASELINE.json:5: the
adjacency and the node-embedding matrix are 1-D row-sharded over the mesh;
each power-iteration step every shard needs the H rows of its edges'
source nodes, most of which are local — the remainder (boundary rows) are
exchanged via a single ``all_to_all`` whose send lists are precomputed
here at ingest time and padded to a static max size so jit caching works
(SURVEY.md §7 "hard parts": boundary-exchange plan).

Layout contract (consumed by ``ppnp_tpu.parallel.sharded``):

- nodes padded to ``n_pad = shard_rows * n_shards``; shard d owns rows
  ``[d·S, (d+1)·S)`` with ``S = shard_rows``.
- per-shard edge arrays, dst-local, laid out as TWO independently
  dst-sorted, independently padded parts concatenated along the edge
  axis: ``[interior edges (src owned locally) | boundary edges (src
  remote)]`` with the static split at ``interior_pad``. The interior
  SpMM therefore carries NO data dependence on the ``all_to_all``
  result, so XLA's async collectives hide the boundary exchange behind
  the interior compute (comm/compute overlap).
- ``send_idx[d, e, :]`` = local row indices shard d sends to shard e
  (padded with 0 — padding slots are simply never referenced).
- each shard's local gather table is ``concat([H_local (S rows),
  recv (n_shards·B rows)])``; ``src`` is pre-remapped into this table:
  a local source g → ``g - d·S``; a remote source owned by shard o at
  position p of o's send list to me → ``S + o·B + p``.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp
from flax import struct

from ppnp_tpu.utils.padding import round_up_to_multiple

__all__ = ["ShardedGraph", "build_sharded_graph",
           "build_sharded_pair_chunks"]


@struct.dataclass
class ShardedGraph:
    """Row-sharded Â: per-shard padded edges + boundary-exchange plan.

    All arrays are stacked over shards along axis 0; inside ``shard_map``
    each device sees its own slice.
    """

    dst: jnp.ndarray        # int32 [n_shards, E] local dst row, per-part sorted
    src: jnp.ndarray        # int32 [n_shards, E] remapped into gather table
    src_global: jnp.ndarray  # int32 [n_shards, E] global src (allgather mode)
    w: jnp.ndarray          # float32 [n_shards, E] (0 for padding)
    send_idx: jnp.ndarray   # int32 [n_shards, n_shards, B] local rows to send
    n_rows: int = struct.field(pytree_node=False)      # original n
    n_pad: int = struct.field(pytree_node=False)
    shard_rows: int = struct.field(pytree_node=False)  # S
    n_shards: int = struct.field(pytree_node=False)
    boundary: int = struct.field(pytree_node=False)    # B
    nnz: int = struct.field(pytree_node=False)
    # Static edge-axis split: [:interior_pad] are local-source edges,
    # [interior_pad:] are boundary (remote-source) edges (module
    # docstring layout contract).
    interior_pad: int = struct.field(pytree_node=False)

    @property
    def edges_pad(self) -> int:
        return self.dst.shape[1]


def build_sharded_graph(
    a_hat: sp.spmatrix,
    n_shards: int,
    row_multiple: int = 8,
    edge_pad_multiple: int = 512,
    boundary_pad_multiple: int = 8,
) -> ShardedGraph:
    """Partition Â by destination row into ``n_shards`` shards."""
    csr = a_hat.tocsr()
    csr.sum_duplicates()
    n = csr.shape[0]
    shard_rows = round_up_to_multiple(
        -(-n // n_shards), row_multiple)  # ceil then align
    n_pad = shard_rows * n_shards

    coo = csr.tocoo()
    dst_g = coo.row.astype(np.int64)
    src_g = coo.col.astype(np.int64)
    w_g = coo.data.astype(np.float32)
    owner_dst = dst_g // shard_rows
    owner_src = src_g // shard_rows

    # Group edges ONCE by (owner_dst, owner_src): one stable sort +
    # searchsorted instead of per-(d,o)-pair full-array masks, which
    # would be O(n_shards² · nnz) — catastrophic at pod scale. Stable
    # sort keeps CSR (dst, src) order inside every group, and owners
    # ascend with src, so the per-shard boundary concatenation below
    # stays ascending-src within each dst row — bit-identical output.
    pair_key = owner_dst * n_shards + owner_src
    grouped = np.argsort(pair_key, kind="stable")
    bounds = np.searchsorted(pair_key[grouped],
                             np.arange(n_shards * n_shards + 1))

    def group(d, o):  # edge indices of (owner_dst=d, owner_src=o)
        k = d * n_shards + o
        return grouped[bounds[k]:bounds[k + 1]]

    # --- boundary plan: send_lists[o][d] = sorted unique global rows
    # owned by o that shard d needs from o.
    send_lists: Dict[Tuple[int, int], np.ndarray] = {}
    max_boundary = 1
    for d in range(n_shards):
        for o in range(n_shards):
            if o == d:
                continue
            needed = np.unique(src_g[group(d, o)])
            send_lists[(o, d)] = needed
            max_boundary = max(max_boundary, len(needed))
    boundary = round_up_to_multiple(max_boundary, boundary_pad_multiple)

    # --- per-shard padded edge arrays with remapped sources, laid out as
    # [interior | boundary] with independent padding per part so the
    # interior SpMM is data-independent of the exchange (overlap).
    max_int = max_bnd = 1
    for d in range(n_shards):
        n_int = len(group(d, d))
        n_all = bounds[(d + 1) * n_shards] - bounds[d * n_shards]
        max_int = max(max_int, n_int)
        max_bnd = max(max_bnd, int(n_all) - n_int)
    interior_pad = round_up_to_multiple(max_int, edge_pad_multiple)
    boundary_pad = round_up_to_multiple(max_bnd, edge_pad_multiple)
    edges_pad = interior_pad + boundary_pad

    # Padding slots: w=0; dst = shard_rows-1 (>= every real local dst, so
    # each part's tail keeps it dst-sorted); interior src = 0 (a local
    # row), boundary src = shard_rows (recv row 0) — both in-range.
    dst = np.full((n_shards, edges_pad), shard_rows - 1, dtype=np.int32)
    src = np.zeros((n_shards, edges_pad), dtype=np.int32)
    src[:, interior_pad:] = shard_rows
    srcg = np.zeros((n_shards, edges_pad), dtype=np.int32)
    w = np.zeros((n_shards, edges_pad), dtype=np.float32)
    send_idx = np.zeros((n_shards, n_shards, boundary), dtype=np.int32)

    for d in range(n_shards):
        gi = group(d, d)
        # Boundary: per-owner groups, ascending o (ascending global src
        # within each dst row after the stable dst sort below).
        go = [group(d, o) for o in range(n_shards) if o != d]
        owners = [o for o in range(n_shards) if o != d]
        remaps = []
        for o, g_e in zip(owners, go):
            if len(g_e) == 0:
                remaps.append(np.empty(0, dtype=np.int64))
                continue
            lst = send_lists[(o, d)]
            pos = np.searchsorted(lst, src_g[g_e])
            remaps.append(shard_rows + o * boundary + pos)
        gb = (np.concatenate(go) if go
              else np.empty(0, dtype=np.int64))
        rb = (np.concatenate(remaps) if remaps
              else np.empty(0, dtype=np.int64))
        parts = [(gi, src_g[gi] - d * shard_rows, 0),
                 (gb, rb, interior_pad)]
        for g_e, remap, base in parts:
            e_dst = dst_g[g_e] - d * shard_rows
            order = np.argsort(e_dst, kind="stable")
            ne = len(g_e)
            dst[d, base:base + ne] = e_dst[order]
            src[d, base:base + ne] = remap[order]
            srcg[d, base:base + ne] = src_g[g_e][order]
            w[d, base:base + ne] = w_g[g_e][order]
        for e in range(n_shards):
            if e == d:
                continue
            lst = send_lists[(d, e)]
            send_idx[d, e, :len(lst)] = lst - d * shard_rows

    return ShardedGraph(
        dst=jnp.asarray(dst), src=jnp.asarray(src),
        src_global=jnp.asarray(srcg), w=jnp.asarray(w),
        send_idx=jnp.asarray(send_idx),
        n_rows=n, n_pad=n_pad, shard_rows=shard_rows,
        n_shards=n_shards, boundary=boundary, nnz=int(csr.nnz),
        interior_pad=interior_pad)


def build_sharded_pair_chunks(sg: ShardedGraph,
                              with_adjoint: bool = True,
                              **pack_kwargs):
    """Per-shard Pallas packings of the LOCAL operators, stacked.

    Shard d's local SpMM is split at the partition's static
    ``interior_pad`` mark into TWO operators (the comm/compute-overlap
    decomposition, same as the XLA sharded path):

    - interior ``A_i: (shard_rows × shard_rows)`` over the local H rows
      only — no data dependence on the exchange, so the all_to_all
      overlaps with this (large) kernel;
    - boundary ``A_b: (shard_rows × n_shards·boundary)`` over the recv
      rows only (columns shifted by ``-shard_rows``), chained through
      the interior result via the kernel's fused ``init`` accumulator.

    Each shard's forward packing, transpose packing (for the SpMM
    adjoint), and slot-permutation are built host-side, padded to one
    common static geometry per part, and stacked along a leading shard
    axis so ``shard_map`` hands every device its own slice.

    Returns ``((pc_i, pc_b), (pc_i_t, pc_b_t), (perm_i, perm_b))`` —
    PairChunks pytrees whose array leaves have a leading ``n_shards``
    dimension (static fields are shard-invariant by construction).
    ``with_adjoint=False`` skips the transpose packings and slot
    permutations (eval-only uses, e.g. the scaling benchmark) and
    returns ``((pc_i, pc_b), None, None)``.
    """
    dst = np.asarray(sg.dst)
    src = np.asarray(sg.src)
    w = np.asarray(sg.w)
    ip = sg.interior_pad
    interior = _pack_stacked_operators(
        dst, src, w, sg.n_shards, sg.shard_rows, slice(None, ip),
        sg.shard_rows, 0, with_adjoint=with_adjoint, **dict(pack_kwargs))
    boundary = _pack_stacked_operators(
        dst, src, w, sg.n_shards, sg.shard_rows, slice(ip, None),
        sg.n_shards * sg.boundary, sg.shard_rows,
        with_adjoint=with_adjoint, **dict(pack_kwargs))
    if not with_adjoint:
        return (interior[0], boundary[0]), None, None
    return ((interior[0], boundary[0]), (interior[1], boundary[1]),
            (interior[2], boundary[2]))


def _pack_stacked_operators(dst, src, w, n_shards, shard_rows, sl, n_cols,
                            col_off, *, with_adjoint=True, **pack_kwargs):
    """Pack ONE per-shard operator part for every shard and stack.

    ``sl`` selects the part's static edge-axis range in the per-shard
    arrays; the part's matrix is ``(shard_rows × n_cols)`` with columns
    shifted by ``-col_off`` (into the part's gather-table region).
    Shared by the flat (``build_sharded_pair_chunks``) and hierarchical
    (``hier.build_hier_pair_chunks``) builders. Returns
    ``(pc_stacked, pc_t_stacked, perm)`` with ``None`` tails when
    ``with_adjoint`` is off.
    """
    import jax.numpy as jnp
    from ppnp_tpu.ops.pairchunks import (packer_for, pad_stack_pair_chunks,
                                         slot_permutation,
                                         stack_slot_permutations,
                                         transpose_ids, transpose_pair)

    # Pack host-side; slot_permutation below reads the slot arrays, and
    # device round-trips are very slow on tunneled platforms. The
    # stacking step uploads everything once.
    pack_kwargs.setdefault("device", False)
    layout = pack_kwargs.pop("layout", "banded")
    packer = packer_for(layout)
    # The transpose packing needs the FLIPPED edge-id orientation or
    # id-keyed dropout draws different masks in the backward operator.
    t_kwargs = dict(pack_kwargs)
    t_kwargs["edge_ids"] = transpose_ids(
        pack_kwargs.get("edge_ids", "direct"))

    pcs, pcts, perms = [], [], []
    for d in range(n_shards):
        real = w[d, sl] != 0
        a_d = sp.coo_matrix(
            (w[d, sl][real],
             (dst[d, sl][real], src[d, sl][real] - col_off)),
            shape=(shard_rows, n_cols)).tocsr()
        pcs.append(packer(a_d, **pack_kwargs))
        if with_adjoint:
            pc_t = transpose_pair(a_d, layout=layout, **t_kwargs)
            perms.append(slot_permutation(pcs[-1], pc_t))
            pcts.append(pc_t)
    pc_stacked = pad_stack_pair_chunks(pcs)
    if not with_adjoint:
        return pc_stacked, None, None
    pcts_stacked = pad_stack_pair_chunks(pcts)
    n_slots_t = int(pcts_stacked.e_src.shape[-1]) * pcts[0].chunk
    perm = stack_slot_permutations(perms, n_slots_t)
    return pc_stacked, pcts_stacked, jnp.asarray(perm)
