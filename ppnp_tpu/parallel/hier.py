"""Hierarchical ICI×DCN row sharding with a two-level boundary exchange.

No reference analog (SURVEY.md §2.2 — the reference is single-device).
This is the multi-slice generalization of ``parallel/{partition,
sharded}.py``'s flat 1-D plan, per BASELINE.json:5 / SURVEY.md §5's
comm row: boundary rows move "over ICI intra-slice and DCN across
slices". On a flat plan every chip-pair exchange crosses whatever
network separates the pair — on a multi-slice pod that hits the DCN at
ICI-grade frequency (K exchanges per epoch) with per-chip-pair
duplication (a hub row needed by many chips of a remote slice crosses
the DCN once per needing chip). The hierarchical plan fixes both:

- devices form a 2-axis mesh ``(DCN_AXIS, ICI_AXIS)`` =
  ``(n_slices D, per_slice I)`` (``mesh.make_hier_mesh``); shard
  ``d = s·I + i`` owns contiguous rows ``[d·S, (d+1)·S)``;
- per-shard edges are laid out in THREE independently padded,
  independently dst-sorted parts ``[interior | ici-boundary |
  dcn-boundary]`` (static splits ``interior_pad`` / ``ici_pad``), so
  the interior SpMM overlaps with BOTH exchange levels and the
  ici-boundary SpMM waits only on the ICI exchange;
- level 1 (intra-slice): ``all_to_all`` over the ICI axis of the
  per-chip-pair send lists — identical to the flat plan restricted to
  a slice;
- level 2 (inter-slice): each chip ``(s, i)`` ships ONE deduplicated
  row block per remote slice ``t`` — the union of the rows any chip of
  ``t`` needs from ``(s, i)`` — via ``all_to_all`` over the DCN axis
  (between co-positioned chips ``(s, i) → (t, i)``), then a cheap
  ``all_gather`` over the ICI axis fans the received blocks out within
  the destination slice. A row crosses the DCN exactly once per
  (owner chip, destination slice), however many chips need it.

Degenerate meshes reproduce the flat plan bit-exactly: at ``D == 1``
the DCN part is empty (skipped at trace time — mesh shape is static)
and the ICI level IS the flat plan; at ``I == 1`` the ICI part is
empty, the per-slice dedup degenerates to per-chip-pair lists, and the
ICI all_gather is an identity over a size-1 axis. Both are asserted
bitwise against ``ShardedPowerIteration`` in ``tests/test_hier.py``.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ppnp_tpu.ops.dropout import edge_dropout, edge_dropout_by_id
from ppnp_tpu.parallel.mesh import DCN_AXIS, ICI_AXIS
from ppnp_tpu.utils.padding import round_up_to_multiple

__all__ = ["HierShardedGraph", "build_hier_sharded_graph",
           "build_hier_pair_chunks", "HierShardedPowerIteration"]


@struct.dataclass
class HierShardedGraph:
    """Row-sharded Â over a (D slices × I chips) mesh, three-part edges.

    All arrays are stacked over shards (``d = s·I + i``) along axis 0;
    inside ``shard_map`` each device sees its own slice. The per-shard
    gather table is ``concat([H_local (S rows), recv_ici (I·B_i rows),
    recv_dcn (I·D·B_d rows)])``; ``src`` is pre-remapped into it:
    local source g → ``g − d·S``; same-slice source owned by chip j at
    position p of (j→me)'s send list → ``S + j·B_i + p``; remote-slice
    source owned by chip (s, j) at position p of ((s,j)→my-slice)'s
    send list → ``S + I·B_i + (j·D + s)·B_d + p``.
    """

    dst: jnp.ndarray          # int32 [n_shards, E] local dst, per-part sorted
    src: jnp.ndarray          # int32 [n_shards, E] remapped into gather table
    src_global: jnp.ndarray   # int32 [n_shards, E] global src (validation)
    w: jnp.ndarray            # float32 [n_shards, E] (0 for padding)
    send_idx_ici: jnp.ndarray  # int32 [n_shards, I, B_i] local rows → peer j
    send_idx_dcn: jnp.ndarray  # int32 [n_shards, D, B_d] local rows → slice t
    n_rows: int = struct.field(pytree_node=False)
    n_pad: int = struct.field(pytree_node=False)
    shard_rows: int = struct.field(pytree_node=False)   # S
    n_slices: int = struct.field(pytree_node=False)     # D
    per_slice: int = struct.field(pytree_node=False)    # I
    b_ici: int = struct.field(pytree_node=False)        # B_i (0 if I == 1)
    b_dcn: int = struct.field(pytree_node=False)        # B_d (0 if D == 1)
    nnz: int = struct.field(pytree_node=False)
    # Static edge-axis splits: [:interior_pad] local-source edges,
    # [interior_pad:interior_pad+ici_pad] same-slice boundary edges,
    # [interior_pad+ici_pad:] remote-slice boundary edges.
    interior_pad: int = struct.field(pytree_node=False)
    ici_pad: int = struct.field(pytree_node=False)
    # Per-axis comm accounting (host metadata, not traced): see
    # ``build_hier_sharded_graph``.
    comm: Dict[str, float] = struct.field(pytree_node=False, default=None)

    @property
    def n_shards(self) -> int:
        return self.n_slices * self.per_slice

    @property
    def edges_pad(self) -> int:
        return self.dst.shape[1]


def build_hier_sharded_graph(
    a_hat: sp.spmatrix,
    n_slices: int,
    per_slice: int,
    row_multiple: int = 8,
    edge_pad_multiple: int = 512,
    boundary_pad_multiple: int = 8,
) -> HierShardedGraph:
    """Partition Â by destination row over a (D × I) hierarchical mesh.

    Same owner rule and padding rules as ``partition.build_sharded_graph``
    (so the degenerate meshes produce identical edge layouts), plus the
    slice-level deduplicated DCN send lists.
    """
    D, I = int(n_slices), int(per_slice)
    n_shards = D * I
    csr = a_hat.tocsr()
    csr.sum_duplicates()
    n = csr.shape[0]
    S = round_up_to_multiple(-(-n // n_shards), row_multiple)
    n_pad = S * n_shards

    coo = csr.tocoo()
    dst_g = coo.row.astype(np.int64)
    src_g = coo.col.astype(np.int64)
    w_g = coo.data.astype(np.float32)
    owner_dst = dst_g // S
    owner_src = src_g // S

    # One stable sort + searchsorted groups edges by (owner_dst,
    # owner_src) — O(nnz log nnz), not O(n_shards²·nnz); stable keeps
    # CSR (dst, src) order inside every group (same as the flat builder).
    pair_key = owner_dst * n_shards + owner_src
    grouped = np.argsort(pair_key, kind="stable")
    bounds = np.searchsorted(pair_key[grouped],
                             np.arange(n_shards * n_shards + 1))

    def group(d, o):  # edge indices of (owner_dst=d, owner_src=o)
        k = d * n_shards + o
        return grouped[bounds[k]:bounds[k + 1]]

    empty = np.empty(0, dtype=np.int64)

    # --- level-1 plan: per-chip-pair send lists within each slice.
    send_ici: Dict[Tuple[int, int], np.ndarray] = {}
    max_bi = 1 if I > 1 else 0
    for s in range(D):
        for i in range(I):
            d = s * I + i
            for j in range(I):
                if j == i:
                    continue
                o = s * I + j
                needed = np.unique(src_g[group(d, o)])
                send_ici[(o, d)] = needed
                max_bi = max(max_bi, len(needed))
    b_ici = (round_up_to_multiple(max_bi, boundary_pad_multiple)
             if I > 1 else 0)

    # --- level-2 plan: per-(owner chip, destination slice) DEDUPLICATED
    # send lists — the union over the destination slice's chips.
    send_dcn: Dict[Tuple[int, int], np.ndarray] = {}
    max_bd = 1 if D > 1 else 0
    # Also account what a flat per-chip-pair plan would ship across
    # slices (for the comm table): sum of per-pair unique list lengths.
    flat_dcn_rows = 0
    for o in range(n_shards):
        s_o = o // I
        for t in range(D):
            if t == s_o:
                continue
            per_pair = [np.unique(src_g[group(t * I + i, o)])
                        for i in range(I)]
            flat_dcn_rows += sum(len(p) for p in per_pair)
            needed = (np.unique(np.concatenate(per_pair))
                      if per_pair else empty)
            send_dcn[(o, t)] = needed
            max_bd = max(max_bd, len(needed))
    b_dcn = (round_up_to_multiple(max_bd, boundary_pad_multiple)
             if D > 1 else 0)
    hier_dcn_rows = sum(len(v) for v in send_dcn.values())

    # --- per-shard padded edge arrays, three independently padded parts.
    max_int = 1
    max_ici = 1 if I > 1 else 0
    max_dcn = 1 if D > 1 else 0
    for d in range(n_shards):
        s_d = d // I
        n_int = len(group(d, d))
        n_slice = sum(len(group(d, s_d * I + j)) for j in range(I))
        n_all = int(bounds[(d + 1) * n_shards] - bounds[d * n_shards])
        max_int = max(max_int, n_int)
        max_ici = max(max_ici, n_slice - n_int)
        max_dcn = max(max_dcn, n_all - n_slice)
    interior_pad = round_up_to_multiple(max_int, edge_pad_multiple)
    ici_pad = (round_up_to_multiple(max_ici, edge_pad_multiple)
               if I > 1 else 0)
    dcn_pad = (round_up_to_multiple(max_dcn, edge_pad_multiple)
               if D > 1 else 0)
    edges_pad = interior_pad + ici_pad + dcn_pad

    # Padding slots: w=0; dst = S-1 (each part's tail stays dst-sorted);
    # src points at an in-range row of the part's table region.
    dst = np.full((n_shards, edges_pad), S - 1, dtype=np.int32)
    src = np.zeros((n_shards, edges_pad), dtype=np.int32)
    src[:, interior_pad:interior_pad + ici_pad] = S
    src[:, interior_pad + ici_pad:] = S + I * b_ici
    srcg = np.zeros((n_shards, edges_pad), dtype=np.int32)
    w = np.zeros((n_shards, edges_pad), dtype=np.float32)
    send_idx_ici = np.zeros((n_shards, I, max(b_ici, 1)), dtype=np.int32)
    send_idx_dcn = np.zeros((n_shards, D, max(b_dcn, 1)), dtype=np.int32)

    for d in range(n_shards):
        t, i = divmod(d, I)
        # Interior edges.
        gi = group(d, d)
        # ICI part: same-slice owners, ascending j (ascending global o).
        go_i, remaps_i = [], []
        for j in range(I):
            if j == i:
                continue
            o = t * I + j
            g_e = group(d, o)
            if len(g_e) == 0:
                continue
            lst = send_ici[(o, d)]
            pos = np.searchsorted(lst, src_g[g_e])
            go_i.append(g_e)
            remaps_i.append(S + j * b_ici + pos)
        # DCN part: remote-slice owners, ascending slice s then chip j
        # (for I == 1 this is ascending o — the flat builder's order).
        go_d, remaps_d = [], []
        for s in range(D):
            if s == t:
                continue
            for j in range(I):
                o = s * I + j
                g_e = group(d, o)
                if len(g_e) == 0:
                    continue
                lst = send_dcn[(o, t)]
                pos = np.searchsorted(lst, src_g[g_e])
                go_d.append(g_e)
                remaps_d.append(S + I * b_ici + (j * D + s) * b_dcn + pos)
        parts = [
            (gi, src_g[gi] - d * S, 0),
            (np.concatenate(go_i) if go_i else empty,
             np.concatenate(remaps_i) if remaps_i else empty,
             interior_pad),
            (np.concatenate(go_d) if go_d else empty,
             np.concatenate(remaps_d) if remaps_d else empty,
             interior_pad + ici_pad),
        ]
        for g_e, remap, base in parts:
            e_dst = dst_g[g_e] - d * S
            order = np.argsort(e_dst, kind="stable")
            ne = len(g_e)
            dst[d, base:base + ne] = e_dst[order]
            src[d, base:base + ne] = remap[order]
            srcg[d, base:base + ne] = src_g[g_e][order]
            w[d, base:base + ne] = w_g[g_e][order]
        # Send tables (local row indices).
        for j in range(I):
            dest = t * I + j
            if dest == d:
                continue
            lst = send_ici.get((d, dest), empty)
            send_idx_ici[d, j, :len(lst)] = lst - d * S
        for u in range(D):
            if u == t:
                continue
            lst = send_dcn.get((d, u), empty)
            send_idx_dcn[d, u, :len(lst)] = lst - d * S

    # Per-axis comm accounting, in ROWS per step (×c×4 for bytes): the
    # flat-plan column is what a 1-axis per-chip-pair plan would ship
    # across slices — the dedup saving is flat − hier.
    ici_rows = sum(len(v) for v in send_ici.values())
    comm = {
        "ici_exchange_rows": float(ici_rows),
        "dcn_rows": float(hier_dcn_rows),
        "dcn_rows_flat_plan": float(flat_dcn_rows),
        "ici_fanout_rows": float((I - 1) * hier_dcn_rows if I > 1 else 0),
        "dedup_factor": (float(flat_dcn_rows) / hier_dcn_rows
                         if hier_dcn_rows else 1.0),
    }

    return HierShardedGraph(
        dst=jnp.asarray(dst), src=jnp.asarray(src),
        src_global=jnp.asarray(srcg), w=jnp.asarray(w),
        send_idx_ici=jnp.asarray(send_idx_ici),
        send_idx_dcn=jnp.asarray(send_idx_dcn),
        n_rows=n, n_pad=n_pad, shard_rows=S,
        n_slices=D, per_slice=I, b_ici=b_ici, b_dcn=b_dcn,
        nnz=int(csr.nnz), interior_pad=interior_pad, ici_pad=ici_pad,
        comm=comm)


def build_hier_pair_chunks(hg: HierShardedGraph,
                           with_adjoint: bool = True, **pack_kwargs):
    """Per-shard Pallas packings of the THREE local operators, stacked.

    Shard d's local SpMM splits at the static ``interior_pad`` /
    ``ici_pad`` marks into interior ``A_i: (S × S)``, ici-boundary
    ``A_ici: (S × I·B_i)`` and dcn-boundary ``A_dcn: (S × I·D·B_d)``
    operators, chained through the kernel's fused ``init`` accumulator
    so both exchange levels overlap with the interior kernel. Empty
    parts (degenerate meshes) return ``None`` in their slot.

    Returns ``(pcs, pcs_t, perms)`` — 3-tuples over
    (interior, ici, dcn), matching ``partition.build_sharded_pair_chunks``'s
    per-part format.
    """
    from ppnp_tpu.parallel.partition import _pack_stacked_operators

    S, I, D = hg.shard_rows, hg.per_slice, hg.n_slices
    ip, ip2 = hg.interior_pad, hg.interior_pad + hg.ici_pad
    parts = [
        (slice(None, ip), S, 0),
        (slice(ip, ip2), I * hg.b_ici, S) if hg.ici_pad else None,
        (slice(ip2, None), I * D * hg.b_dcn, S + I * hg.b_ici)
        if hg.edges_pad > ip2 else None,
    ]
    out = []
    for part in parts:
        if part is None:
            out.append((None, None, None))
            continue
        sl, n_cols, col_off = part
        out.append(_pack_stacked_operators(
            np.asarray(hg.dst), np.asarray(hg.src), np.asarray(hg.w),
            hg.n_shards, S, sl, n_cols, col_off,
            with_adjoint=with_adjoint, **dict(pack_kwargs)))
    pcs = tuple(o[0] for o in out)
    if not with_adjoint:
        return pcs, None, None
    return (pcs, tuple(o[1] for o in out), tuple(o[2] for o in out))


@struct.dataclass
class HierShardedPowerIteration:
    """K hierarchically-sharded steps of H ← (1−α)ÂH + αH⁰.

    Same callable protocol as ``PPRPowerIteration`` /
    ``ShardedPowerIteration`` so it drops into the same training loop.
    ``backend="pallas"`` routes each part's local SpMM through the
    pair-chunk MXU kernel (pass the stacked packings from
    ``build_hier_pair_chunks``).
    """

    graph: HierShardedGraph
    mesh: Mesh = struct.field(pytree_node=False)
    # 3-tuples over (interior, ici, dcn) of stacked per-shard packings /
    # transpose packings / slot permutations (None for empty parts).
    pair_chunks: Optional[object] = None
    pair_chunks_t: Optional[object] = None
    w_perm: Optional[object] = None
    alpha: float = struct.field(pytree_node=False, default=0.1)
    niter: int = struct.field(pytree_node=False, default=10)
    drop_prob: float = struct.field(pytree_node=False, default=0.5)
    backend: str = struct.field(pytree_node=False, default="xla")
    dcn_axis: str = struct.field(pytree_node=False, default=DCN_AXIS)
    ici_axis: str = struct.field(pytree_node=False, default=ICI_AXIS)

    @property
    def n_rows(self) -> int:
        """Padded row count the caller must supply H⁰ with."""
        return self.graph.n_pad

    def _me(self):
        """Global shard id s·I + i — the dropout decorrelation key."""
        return (jax.lax.axis_index(self.dcn_axis) * self.graph.per_slice
                + jax.lax.axis_index(self.ici_axis))

    def _exchange(self, h_loc, send_idx_ici, send_idx_dcn, c):
        """Two-level boundary exchange → (recv_ici, recv_dcn) tables.

        Level 1 rides the ICI axis; level 2 is the DCN all_to_all
        between co-positioned chips followed by the ICI all_gather
        fan-out. Either level vanishes at trace time on a degenerate
        mesh (static shapes).
        """
        g = self.graph
        recv_ici = recv_dcn = None
        if g.ici_pad:
            send = jnp.take(h_loc, send_idx_ici, axis=0)   # (I, B_i, c)
            recv_ici = jax.lax.all_to_all(
                send, self.ici_axis, split_axis=0, concat_axis=0,
                tiled=False).reshape(-1, c)                # (I·B_i, c)
        if g.edges_pad > g.interior_pad + g.ici_pad:
            send = jnp.take(h_loc, send_idx_dcn, axis=0)   # (D, B_d, c)
            recv = jax.lax.all_to_all(
                send, self.dcn_axis, split_axis=0, concat_axis=0,
                tiled=False)                               # (D, B_d, c)
            gath = jax.lax.all_gather(recv, self.ici_axis, axis=0,
                                      tiled=False)         # (I, D, B_d, c)
            recv_dcn = gath.reshape(-1, c)                 # (I·D·B_d, c)
        return recv_ici, recv_dcn

    def propagate(self, h0: jnp.ndarray, *, key: Optional[jax.Array] = None,
                  train: bool = False) -> jnp.ndarray:
        if self.backend == "pallas":
            return self._propagate_pallas(h0, key=key, train=train)
        g = self.graph
        c = h0.shape[-1]
        apply_drop = bool(train and self.drop_prob > 0.0 and key is not None)
        alpha = self.alpha
        ip, ip2 = g.interior_pad, g.interior_pad + g.ici_pad
        S, I = g.shard_rows, g.per_slice

        def shard_fn(h0_loc, dst, src, w, send_ici, send_dcn, keys):
            dst, src, w = dst[0], src[0], w[0]
            send_ici, send_dcn = send_ici[0], send_dcn[0]
            me = self._me()
            alpha_h0 = alpha * h0_loc

            def segsum(gathered, w_part, dst_part):
                return jax.ops.segment_sum(
                    gathered * w_part[:, None], dst_part,
                    num_segments=S, indices_are_sorted=True)

            def step(h_loc, k):
                if apply_drop:
                    w_it = edge_dropout(jax.random.fold_in(k, me), w,
                                        self.drop_prob)
                else:
                    w_it = w
                recv_ici, recv_dcn = self._exchange(
                    h_loc, send_ici, send_dcn, c)
                # The interior SpMM reads only h_loc — XLA's async
                # collectives hide both exchange levels behind it.
                out = segsum(jnp.take(h_loc, src[:ip], axis=0),
                             w_it[:ip], dst[:ip])
                if recv_ici is not None:
                    out = out + segsum(
                        jnp.take(recv_ici, src[ip:ip2] - S, axis=0),
                        w_it[ip:ip2], dst[ip:ip2])
                if recv_dcn is not None:
                    out = out + segsum(
                        jnp.take(recv_dcn, src[ip2:] - S - I * g.b_ici,
                                 axis=0),
                        w_it[ip2:], dst[ip2:])
                return (1.0 - alpha) * out + alpha_h0, None

            h_loc, _ = jax.lax.scan(step, h0_loc, keys)
            return h_loc

        if apply_drop:
            keys = jax.random.split(key, self.niter)
        else:
            keys = jnp.zeros((self.niter, 2), dtype=jnp.uint32)

        ax = (self.dcn_axis, self.ici_axis)
        f = jax.shard_map(
            shard_fn, mesh=self.mesh,
            in_specs=(P(ax, None), P(ax), P(ax), P(ax), P(ax), P(ax), P()),
            out_specs=P(ax, None), check_vma=False)
        return f(h0, g.dst, g.src, g.w, g.send_idx_ici, g.send_idx_dcn,
                 keys)

    def _propagate_pallas(self, h0: jnp.ndarray, *, key, train):
        """Hierarchical propagation with the pair-chunk MXU kernel.

        Three chained kernels per step: ``out = A_dcn @ recv_dcn +
        (A_ici @ recv_ici + (A_i @ H_loc + α·H⁰))`` — both exchange
        levels overlap with the (large) interior kernel; per-part
        dropout keys fold positionally over the PRESENT parts so the
        degenerate meshes reproduce the flat pallas path bit-exactly.
        """
        if self.pair_chunks is None:
            raise ValueError(
                "backend='pallas' requires the stacked per-shard packings "
                "(ppnp_tpu.parallel.hier.build_hier_pair_chunks)")
        from ppnp_tpu.kernels.spmm import _spmm_vjp

        g = self.graph
        c = h0.shape[-1]
        apply_drop = bool(train and self.drop_prob > 0.0 and key is not None)
        alpha = self.alpha
        differentiable = self.pair_chunks_t is not None
        present = [p is not None for p in self.pair_chunks]

        def shard_fn(h0_loc, pcs, pcs_t, w_perms, send_ici, send_dcn,
                     keys):
            pcs = [None if p is None else jax.tree.map(lambda x: x[0], p)
                   for p in pcs]
            if differentiable:
                pcs_t = [None if p is None
                         else jax.tree.map(lambda x: x[0], p)
                         for p in pcs_t]
                perms = [None if p is None else p[0] for p in w_perms]
            else:
                pcs_t = perms = [None, None, None]
            send_ici, send_dcn = send_ici[0], send_dcn[0]
            me = self._me()
            alpha_h0 = alpha * h0_loc
            use_ids = (differentiable
                       and all(p is None or p.eid_hi is not None
                               for p in pcs)
                       and all(p is None or p.eid_hi is not None
                               for p in pcs_t))

            def local_spmm(pc, pc_t, perm, table, w_it, w_t, init):
                if differentiable:
                    return _spmm_vjp(table, w_it, init, pc, pc_t, perm,
                                     w_t, False)
                from ppnp_tpu.kernels import spmm as spmm_mod
                return spmm_mod.spmm_pair_chunks(
                    pc, table, w_it, init=init, assume_permuted=True)

            def part_weights(k_part, pc, pc_t):
                w_t = None
                if apply_drop:
                    if use_ids:
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
                    k_me = jax.random.fold_in(k, me)
                    # Positional folds over PRESENT parts: on degenerate
                    # meshes the two live parts get folds (0, 1) exactly
                    # like the flat pallas path.
                    part_keys, nxt = [], 0
                    for pres in present:
                        if pres:
                            part_keys.append(
                                jax.random.fold_in(k_me, nxt))
                            nxt += 1
                        else:
                            part_keys.append(None)
                else:
                    part_keys = [None, None, None]
                recv_ici, recv_dcn = self._exchange(
                    h_loc, send_ici, send_dcn, c)
                tables = [h_loc, recv_ici, recv_dcn]
                out = alpha_h0
                for idx in range(3):
                    if not present[idx]:
                        continue
                    w_p, w_p_t = part_weights(part_keys[idx], pcs[idx],
                                              pcs_t[idx])
                    out = local_spmm(pcs[idx], pcs_t[idx], perms[idx],
                                     tables[idx], w_p, w_p_t, out)
                return out, None

            h_loc, _ = jax.lax.scan(step, h0_loc, keys)
            return h_loc

        if apply_drop:
            keys = jax.random.split(key, self.niter)
        else:
            keys = jnp.zeros((self.niter, 2), dtype=jnp.uint32)

        ax = (self.dcn_axis, self.ici_axis)
        # One spec per part slot; empty (None) parts carry no array
        # leaves, so the spec for those slots is vacuous.
        part_spec = (P(ax), P(ax), P(ax))
        f = jax.shard_map(
            shard_fn, mesh=self.mesh,
            in_specs=(P(ax, None), part_spec, part_spec, part_spec,
                      P(ax), P(ax), P()),
            out_specs=P(ax, None), check_vma=False)
        return f(h0, tuple(self.pair_chunks),
                 tuple(self.pair_chunks_t) if differentiable
                 else (None, None, None),
                 tuple(self.w_perm) if differentiable
                 else (None, None, None),
                 g.send_idx_ici, g.send_idx_dcn, keys)

    def __call__(self, h_local: jnp.ndarray,
                 idx: Optional[jnp.ndarray] = None, *,
                 key: Optional[jax.Array] = None,
                 train: bool = False) -> jnp.ndarray:
        h = self.propagate(h_local, key=key, train=train)
        if idx is not None:
            h = jnp.take(h, idx, axis=0)
        return h

    def input_sharding(self) -> NamedSharding:
        """The sharding H⁰ (and X) should carry: rows over both axes."""
        return NamedSharding(self.mesh,
                             P((self.dcn_axis, self.ici_axis), None))
