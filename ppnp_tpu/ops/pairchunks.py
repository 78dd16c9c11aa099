"""PairChunks: the Pallas SpMM kernel's edge packing.

No reference analog — the reference's SpMM is ``torch.sparse.mm`` on
CPU/GPU (ppnp/pytorch/propagation.py ~L45). On TPU, scatter/gather of
irregular rows is the enemy; this packing reformulates SpMM so the kernel
only ever does

  - static dynamic-slices of a VMEM-resident H (one 128-row *src window*
    per chunk),
  - on-the-fly one-hot expansion matrices (built with iota compares on the
    VPU), and
  - small MXU matmuls: ``C = E @ H[sw:sw+W]`` (gather-as-matmul) and
    ``out[dw:dw+W] += Dᵀ @ C`` (scatter-as-matmul),

with zero per-edge scalar loops. Layout:

- edges are lexsorted by (dst window, src window); each (dw, sw) pair's
  edges are padded to a multiple of CHUNK (one *segment* = CHUNK edges of
  one pair);
- segments of one dst window are padded to a multiple of SEG_PER_MID
  (one *midchunk* = MID = CHUNK·SEG_PER_MID edge slots, all with the same
  dst window) so the scatter matmul runs once per MID edges;
- per-segment arrays are stored pre-transposed — (CHUNK, n_seg) — so the
  kernel's per-segment slice is a natural (CHUNK, 1) sublane vector;
- padding slots carry w = 0 (they multiply to zero wherever they land);
- optionally the matrix is packed under a bandwidth-reducing row/col
  permutation (reverse Cuthill-McKee): clustering edges near the diagonal
  densifies (dst-window, src-window) pairs and cuts padding slots. The
  permutation is stored on the packing (``perm``/``iperm``); the kernel
  wrapper applies it transparently, and hot loops apply it once outside.

Geometry defaults (CHUNK=16, SEG_PER_MID=32, MIDS_PER_STEP=16) are tuned
on TPU v5e where the kernel is MXU-issue-bound — see the measured design
notes in ``ppnp_tpu.kernels.spmm``.
"""

from __future__ import annotations

import os
from typing import Optional

import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp
from flax import struct

from ppnp_tpu.utils.padding import round_up_to_multiple

__all__ = ["PairChunks", "pair_chunks_from_scipy", "pair_chunks_banded",
           "pair_chunks_auto", "select_geometry", "validate_pair_chunks",
           "packer_for", "transpose_pair", "slot_permutation",
           "rcm_permutation", "to_device"]


@struct.dataclass
class PairChunks:
    seg_bs: jnp.ndarray    # int32 [n_seg]          src-window base row
    mid_bd: jnp.ndarray    # int32 [n_mid]          dst-window base row
    e_src: jnp.ndarray     # int32 [CHUNK, n_seg]   src local in [0, W)
    e_w: jnp.ndarray       # f32   [CHUNK, n_seg]   edge weight (0 = pad)
    e_dst: jnp.ndarray     # int32 [n_mid, MID]     dst local in [0, W)
    n_rows: int = struct.field(pytree_node=False)   # original rows
    n_rows_pad: int = struct.field(pytree_node=False)
    n_cols_pad: int = struct.field(pytree_node=False)
    window: int = struct.field(pytree_node=False)       # dst window
    window_src: int = struct.field(pytree_node=False)   # src window (E width)
    chunk: int = struct.field(pytree_node=False)
    seg_per_mid: int = struct.field(pytree_node=False)
    nnz: int = struct.field(pytree_node=False)
    mids_per_step: int = struct.field(pytree_node=False, default=16)
    # Unpadded column count (rows is n_rows): max(n_rows, n_cols) is
    # transpose-invariant, which the edge-id span relies on. 0 = unknown
    # (legacy packings) — falls back to the padded dims.
    n_cols: int = struct.field(pytree_node=False, default=0)
    # Row/col reordering under which the matrix was packed (None = packed
    # in original order). perm maps packed row -> original row.
    perm: Optional[jnp.ndarray] = None    # int32 [n_rows] or None
    iperm: Optional[jnp.ndarray] = None   # int32 [n_rows] or None
    # Canonical 64-bit edge id per slot (hi/lo uint32 words): identical
    # for the same edge in this packing and its transpose packing, so
    # per-iteration dropout masks can be REGENERATED (counter-keyed
    # threefry, ops/hashrng.py) in either layout with no cross-layout
    # gather. Padding slots carry id 0 (their w is 0 anyway).
    eid_hi: Optional[jnp.ndarray] = None  # uint32 [CHUNK, n_seg] or None
    eid_lo: Optional[jnp.ndarray] = None  # uint32 [CHUNK, n_seg] or None
    # Alignment guarantee of seg_bs/mid_bd values: 0 = window-aligned
    # grid packing (bases are multiples of window/window_src), 8 =
    # banded packing with sliding 8-aligned window bases (see
    # pair_chunks_banded). The kernel passes this to pl.multiple_of.
    align: int = struct.field(pytree_node=False, default=0)

    @property
    def n_seg(self) -> int:
        return self.seg_bs.shape[0]

    @property
    def n_mid(self) -> int:
        return self.mid_bd.shape[0]

    @property
    def mid(self) -> int:
        return self.chunk * self.seg_per_mid


def rcm_permutation(mat: sp.spmatrix) -> np.ndarray:
    """Bandwidth-reducing reverse Cuthill-McKee row/col permutation."""
    from scipy.sparse.csgraph import reverse_cuthill_mckee
    return np.asarray(reverse_cuthill_mckee(mat.tocsr(),
                                            symmetric_mode=True))


def _resolve_perm(mat: sp.spmatrix, reorder: Optional[str],
                  perm: Optional[np.ndarray]) -> Optional[np.ndarray]:
    """One perm/reorder semantics for BOTH packers: exclusive args,
    square-only, length-checked. Returns the row/col permutation
    (packed position -> original index) or None."""
    if reorder is not None and perm is not None:
        raise ValueError("pass either reorder or perm, not both")
    if reorder is not None:
        if reorder != "rcm":
            raise ValueError(f"unknown reorder {reorder!r}")
        if mat.shape[0] != mat.shape[1]:
            raise ValueError("reorder requires a square matrix")
        return rcm_permutation(mat)
    if perm is not None:
        perm = np.asarray(perm)
        if mat.shape[0] != mat.shape[1]:
            raise ValueError("perm packing requires a square matrix")
        if len(perm) != mat.shape[0]:
            raise ValueError(f"perm has {len(perm)} entries for a "
                             f"{mat.shape[0]}-row matrix")
        return perm
    return None


def pair_chunks_from_scipy(
    mat: sp.spmatrix,
    window: int = 128,
    chunk: int = 16,
    seg_per_mid: int = 32,
    mids_per_step: int = 16,
    use_native: str = "auto",
    window_src: int = None,
    reorder: Optional[str] = None,
    perm: Optional[np.ndarray] = None,
    edge_ids: Optional[str] = "direct",
    device: bool = True,
) -> PairChunks:
    """Pack a scipy sparse matrix into PairChunks (host-side, runs once).

    ``use_native``: "auto" uses the C++ packer (ppnp_tpu.native) when its
    shared library builds, "never" forces the numpy path, "require" errors
    if the native path is unavailable. Both produce equivalent packings
    (within-pair slot order may differ — mathematically irrelevant).

    ``reorder="rcm"`` packs the matrix under a reverse Cuthill-McKee
    row/col permutation (square matrices only) — see module docstring;
    ``perm`` supplies an explicit permutation instead (packed row i is
    original row ``perm[i]``). The stored ``perm``/``iperm`` let the
    kernel wrapper map operands between original and packed order.

    ``edge_ids``: attach canonical per-slot edge ids ("direct" for a
    forward packing, "transpose" for a packing of Mᵀ so ids match the
    forward packing's, None to skip) — see the ``eid_hi/eid_lo`` fields.

    ``device=False`` returns numpy leaves (callers that post-process the
    packing host-side — e.g. slot_permutation — upload once afterwards
    with ``to_device``; device round-trips are very slow on tunneled
    platforms).
    """
    if window_src is None:
        window_src = window
    perm = _resolve_perm(mat, reorder, perm)
    perm_arrays = {}
    if perm is not None:
        mat = mat.tocsr()[perm][:, perm]
        iperm = np.empty_like(perm)
        iperm[perm] = np.arange(len(perm))
        perm_arrays = {"perm": perm.astype(np.int32),
                       "iperm": iperm.astype(np.int32)}
    if use_native in ("auto", "require"):
        from ppnp_tpu import native
        csr = mat.tocsr()  # returns mat itself when already CSR
        if csr is mat and not csr.has_canonical_format:
            csr = csr.copy()  # sum_duplicates would mutate the caller's mat
        csr.sum_duplicates()
        packed = native.pack_pair_chunks_native(
            csr, window, chunk, seg_per_mid, mids_per_step,
            window_src=window_src)
        if packed is not None:
            seg_bs, seg_dw_rows, e_src, e_dst, e_w, n_seg_pad = packed
            n_rows, n_cols = csr.shape
            mid = chunk * seg_per_mid
            n_mid = n_seg_pad // seg_per_mid
            mid_bd = seg_dw_rows.reshape(n_mid, seg_per_mid)[:, 0]
            pc = PairChunks(
                seg_bs=np.asarray(seg_bs),
                mid_bd=np.asarray(mid_bd),
                e_src=e_src.T.copy(),
                e_w=e_w.T.copy(),
                e_dst=e_dst.reshape(n_mid, mid),
                n_rows=n_rows,
                n_rows_pad=round_up_to_multiple(n_rows, window),
                n_cols_pad=round_up_to_multiple(n_cols, window_src),
                window=window, window_src=window_src, chunk=chunk,
                seg_per_mid=seg_per_mid, nnz=int(csr.nnz),
                mids_per_step=mids_per_step, n_cols=n_cols,
                **perm_arrays)
            pc = _maybe_validate(_attach_edge_ids(pc, edge_ids))
            return to_device(pc) if device else pc
        if use_native == "require":
            raise RuntimeError("native packer unavailable "
                               "(csrc build failed and use_native='require')")

    coo = mat.tocoo()  # returns mat itself when already COO
    if coo is mat and not coo.has_canonical_format:
        coo = coo.copy()  # sum_duplicates would mutate the caller's mat
    coo.sum_duplicates()
    n_rows, n_cols = coo.shape
    n_rows_pad = round_up_to_multiple(n_rows, window)
    n_cols_pad = round_up_to_multiple(n_cols, window_src)
    nnz = coo.nnz

    dst = coo.row.astype(np.int64)
    src = coo.col.astype(np.int64)
    w = coo.data.astype(np.float32)
    dw = dst // window
    sw = src // window_src

    if nnz == 0:  # degenerate: one all-padding midchunk block
        mid = chunk * seg_per_mid
        n_mid = mids_per_step
        n_seg_pad = n_mid * seg_per_mid
        pc0 = _attach_edge_ids(PairChunks(
            seg_bs=np.zeros(n_seg_pad, np.int32),
            mid_bd=np.zeros(n_mid, np.int32),
            e_src=np.zeros((chunk, n_seg_pad), np.int32),
            e_w=np.zeros((chunk, n_seg_pad), np.float32),
            e_dst=np.zeros((n_mid, mid), np.int32),
            n_rows=n_rows, n_rows_pad=n_rows_pad, n_cols_pad=n_cols_pad,
            window=window, window_src=window_src, chunk=chunk,
            seg_per_mid=seg_per_mid, nnz=0,
            mids_per_step=mids_per_step, n_cols=n_cols,
            **perm_arrays), edge_ids)
        return to_device(pc0) if device else pc0

    order = np.lexsort((src, sw, dw))
    dst, src, w, dw, sw = dst[order], src[order], w[order], dw[order], sw[order]

    # --- pair-level padding to CHUNK (vectorized) ---------------------- #
    pair_key = dw * (n_cols_pad // window_src) + sw
    pair_change = np.concatenate([[True], pair_key[1:] != pair_key[:-1]])
    pair_start = np.where(pair_change)[0]
    pair_m = np.diff(np.append(pair_start, nnz))
    pair_slots = chunk * -(-pair_m // chunk)  # padded edge count per pair
    pair_off = np.concatenate([[0], np.cumsum(pair_slots)[:-1]])
    # rank of each edge within its pair
    rank = np.arange(nnz) - np.repeat(pair_start, pair_m)
    slot_of_edge = np.repeat(pair_off, pair_m) + rank

    total_slots = int(pair_slots.sum())
    slot_src = np.zeros(total_slots, dtype=np.int32)
    slot_dst = np.zeros(total_slots, dtype=np.int32)
    slot_w = np.zeros(total_slots, dtype=np.float32)
    slot_src[slot_of_edge] = (src % window_src).astype(np.int32)
    slot_dst[slot_of_edge] = (dst % window).astype(np.int32)
    slot_w[slot_of_edge] = w

    n_seg0 = total_slots // chunk
    seg_dw = np.repeat(dw[pair_start], pair_slots // chunk)
    seg_sw = np.repeat(sw[pair_start], pair_slots // chunk)

    # --- per-dst-window padding of segment counts to SEG_PER_MID ------- #
    # (so every midchunk's MID slots share one dst window)
    seg_src = slot_src.reshape(n_seg0, chunk)
    seg_dst = slot_dst.reshape(n_seg0, chunk)
    seg_w = slot_w.reshape(n_seg0, chunk)

    out_src, out_dst, out_w, out_bs, out_dw = [], [], [], [], []
    dw_change = np.concatenate([[True], seg_dw[1:] != seg_dw[:-1]]) \
        if n_seg0 else np.array([], dtype=bool)
    dw_starts = np.where(dw_change)[0]
    dw_counts = np.diff(np.append(dw_starts, n_seg0))
    for start, count, d in zip(dw_starts, dw_counts,
                               seg_dw[dw_starts] if n_seg0 else []):
        pad = (-count) % seg_per_mid
        out_src.append(seg_src[start:start + count])
        out_dst.append(seg_dst[start:start + count])
        out_w.append(seg_w[start:start + count])
        out_bs.append(seg_sw[start:start + count] * window_src)
        out_dw.append(np.full(count + pad, d * window, dtype=np.int32))
        if pad:
            out_src.append(np.zeros((pad, chunk), dtype=np.int32))
            out_dst.append(np.zeros((pad, chunk), dtype=np.int32))
            out_w.append(np.zeros((pad, chunk), dtype=np.float32))
            out_bs.append(np.zeros(pad, dtype=np.int32))

    if out_src:
        seg_src = np.concatenate(out_src)
        seg_dst = np.concatenate(out_dst)
        seg_w = np.concatenate(out_w)
        seg_bs = np.concatenate(out_bs).astype(np.int32)
        seg_dw_rows = np.concatenate(out_dw)
    else:  # empty matrix
        seg_src = np.zeros((0, chunk), dtype=np.int32)
        seg_dst = np.zeros((0, chunk), dtype=np.int32)
        seg_w = np.zeros((0, chunk), dtype=np.float32)
        seg_bs = np.zeros(0, dtype=np.int32)
        seg_dw_rows = np.zeros(0, dtype=np.int32)

    # --- global padding: whole midchunks, to a multiple of
    # mids_per_step midchunks per grid step ------------------------------ #
    n_seg = seg_src.shape[0]
    mid = chunk * seg_per_mid
    n_mid = -(-n_seg // seg_per_mid)
    n_mid = round_up_to_multiple(max(n_mid, 1), mids_per_step)
    n_seg_pad = n_mid * seg_per_mid
    pad = n_seg_pad - n_seg
    if pad:
        seg_src = np.pad(seg_src, ((0, pad), (0, 0)))
        seg_dst = np.pad(seg_dst, ((0, pad), (0, 0)))
        seg_w = np.pad(seg_w, ((0, pad), (0, 0)))
        seg_bs = np.pad(seg_bs, (0, pad))
        seg_dw_rows = np.pad(seg_dw_rows, (0, pad))

    mid_bd = seg_dw_rows.reshape(n_mid, seg_per_mid)[:, 0].astype(np.int32)
    e_dst = seg_dst.reshape(n_mid, mid).astype(np.int32)

    pc = _attach_edge_ids(PairChunks(  # numpy path
        seg_bs=seg_bs,
        mid_bd=mid_bd,
        e_src=seg_src.T.copy(),
        e_w=seg_w.T.copy(),
        e_dst=e_dst,
        n_rows=n_rows, n_rows_pad=n_rows_pad, n_cols_pad=n_cols_pad,
        window=window, window_src=window_src, chunk=chunk,
        seg_per_mid=seg_per_mid, nnz=nnz,
        mids_per_step=mids_per_step, n_cols=n_cols,
        **perm_arrays), edge_ids)
    pc = _maybe_validate(pc)
    return to_device(pc) if device else pc


def pair_chunks_banded(
    mat: sp.spmatrix,
    window: int = 256,
    window_src: int = 128,
    chunk: int = 24,
    seg_per_mid: int = 32,
    mids_per_step: int = 16,
    reorder: Optional[str] = None,
    perm: Optional[np.ndarray] = None,
    edge_ids: Optional[str] = "direct",
    device: bool = True,
    use_native: str = "auto",
) -> PairChunks:
    """Banded (sliding-window) packing: denser than the aligned grid.

    The aligned packer bins edges into a fixed (window × window_src)
    grid, so a pair holds whatever edges land in its grid cell — on
    RCM-reordered citation graphs that averages ~13 edges per 128×128
    cell (43% padding at chunk=16). This packer instead:

    - walks dst-sorted edges and takes MAXIMAL dst bands: all edges
      whose dst fits in a ``window``-row span from an 8-aligned base
      (``mid_bd`` is any multiple of 8, not of window);
    - sorts each band's edges by src and cuts greedy segments of up to
      ``chunk`` edges whose src span fits ``window_src`` rows from an
      8-aligned base (``seg_bs`` sliding likewise);
    - emits ceil(n_segs/seg_per_mid) mids per band, all sharing the
      band's base.

    The wide dst band (256 rows ≈ 2-3k edges on these graphs) pools
    enough srcs that most segments pack full: 27% padding vs 43%
    aligned on MS Academic at the chunk=24 default, 293→239 µs/step
    on v5e (see docs/PERFORMANCE.md). The scatter one-hot area grows
    with ``window``, which is why 256 beats both 128 and 384+; the
    odd chunk=24 wins over 16/32 on every measured graph (the gather
    dot's fixed issue cost favors more rows, pad growth caps it).

    Produces the same PairChunks contract as ``pair_chunks_from_scipy``
    (slot coords = base + local offset), so ``slot_permutation``,
    edge-id dropout and the shard stacker work unchanged; ``align=8``
    tells the kernel the bases are only 8-aligned (f32 sublane).

    ``use_native``: "auto" runs the band walk/fill in C++
    (ppnp_tpu.native, bit-identical output — the per-segment Python
    loop is the ingest bottleneck at >10M edges), "never" forces the
    numpy path, "require" errors if the native library is unavailable.
    """
    if window_src is None:
        window_src = window
    if window % 8 or window_src % 8:
        raise ValueError("windows must be sublane (8) aligned")
    perm = _resolve_perm(mat, reorder, perm)
    csr = mat.tocsr()  # returns mat itself when already CSR
    if csr is mat and not csr.has_canonical_format:
        csr = csr.copy()  # sum_duplicates would mutate the caller's matrix
    csr.sum_duplicates()  # one slot per coordinate (edge-id contract)
    n_rows, n_cols = csr.shape
    nnz = int(csr.nnz)
    n_rows_pad = max(round_up_to_multiple(n_rows, 128), window)
    n_cols_pad = max(round_up_to_multiple(n_cols, 128), window_src)
    if n_rows == n_cols:
        # square operators keep square padding so K-step chains (and the
        # fused kernel) can ping-pong one buffer shape
        n_rows_pad = n_cols_pad = max(n_rows_pad, n_cols_pad)
    mid = chunk * seg_per_mid
    perm_arrays = {}
    if perm is not None:
        iperm = np.empty_like(perm)
        iperm[perm] = np.arange(len(perm))
        perm_arrays = {"perm": perm.astype(np.int32),
                       "iperm": iperm.astype(np.int32)}

    def _assemble(packed) -> PairChunks:
        (seg_bs, mid_bd, flat_src, flat_dst, flat_w,
         n_seg_pad, n_mid_pad) = packed
        pc = PairChunks(
            seg_bs=seg_bs,
            mid_bd=mid_bd,
            e_src=flat_src.reshape(n_seg_pad, chunk).T.copy(),
            e_w=flat_w.reshape(n_seg_pad, chunk).T.copy(),
            e_dst=flat_dst.reshape(n_mid_pad, mid),
            n_rows=n_rows, n_rows_pad=n_rows_pad, n_cols_pad=n_cols_pad,
            window=window, window_src=window_src, chunk=chunk,
            seg_per_mid=seg_per_mid, nnz=nnz,
            mids_per_step=mids_per_step,
            n_cols=n_cols, align=8, **perm_arrays)
        pc = _maybe_validate(_attach_edge_ids(pc, edge_ids))
        return to_device(pc) if device else pc

    want_native = use_native in ("auto", "require")
    if want_native and perm is None:
        # Fastest path: canonical CSR is already (dst, src)-lexsorted, so
        # the C++ packer walks indptr directly — no COO expansion, int64
        # casts, or lexsort (the ingest bottleneck at 20M+ edges).
        from ppnp_tpu import native
        packed = native.pack_banded_native_csr(
            csr, n_rows_pad, n_cols_pad,
            window, window_src, chunk, seg_per_mid, mids_per_step)
        if packed is not None:
            return _assemble(packed)
        if use_native == "require":
            raise RuntimeError("native packer unavailable "
                               "(csrc build failed and use_native='require')")

    if perm is None:
        dst = np.repeat(np.arange(n_rows, dtype=np.int64),
                        np.diff(csr.indptr))
        src = csr.indices.astype(np.int64)
        w = csr.data.astype(np.float32)
    else:
        coo = csr.tocoo()
        dst = iperm[coo.row.astype(np.int64)]
        src = iperm[coo.col.astype(np.int64)]
        w = coo.data.astype(np.float32)
        order = np.lexsort((src, dst))
        dst, src, w = dst[order], src[order], w[order]

    if want_native and perm is not None:
        from ppnp_tpu import native
        packed = native.pack_banded_native(
            dst, src, w, n_rows_pad, n_cols_pad,
            window, window_src, chunk, seg_per_mid, mids_per_step)
        if packed is not None:
            return _assemble(packed)
        if use_native == "require":
            raise RuntimeError("native packer unavailable "
                               "(csrc build failed and use_native='require')")

    # Per band: local sorted-by-src edge order, segment cut points and
    # bases. Slot filling is deferred and done in one vectorized pass.
    e_order = []       # per band: global edge idx in band-src order
    seg_bs_l = []      # per band: per-seg src base
    seg_starts_l = []  # per band: per-seg start (band-local position)
    band_bd = []       # per band: dst base
    i = 0
    while i < nnz:
        bd = min((int(dst[i]) >> 3) << 3, n_rows_pad - window)
        j = int(np.searchsorted(dst, bd + window, side="left"))
        o = np.argsort(src[i:j], kind="stable") + i
        s_src = src[o]
        starts, bases = [], []
        k = 0
        while k < len(o):
            bs = min((int(s_src[k]) >> 3) << 3, n_cols_pad - window_src)
            end = int(np.searchsorted(s_src, bs + window_src, side="left"))
            starts.append(k)
            bases.append(bs)
            k = min(end, k + chunk)
        e_order.append(o)
        seg_starts_l.append(np.asarray(starts, np.int64))
        seg_bs_l.append(np.asarray(bases, np.int64))
        band_bd.append(bd)
        i = j

    n_bands = len(band_bd)
    nseg_b = np.array([len(s) for s in seg_bs_l], np.int64)
    # each band's segments padded to a whole number of mids
    nseg_b_pad = np.ceil(nseg_b / seg_per_mid).astype(np.int64) * seg_per_mid
    seg_base = np.concatenate([[0], np.cumsum(nseg_b_pad)])
    n_mid = int(seg_base[-1]) // seg_per_mid
    n_mid_pad = round_up_to_multiple(max(n_mid, 1), mids_per_step)
    n_seg_pad = n_mid_pad * seg_per_mid

    flat_src = np.zeros(n_seg_pad * chunk, np.int32)
    flat_w = np.zeros(n_seg_pad * chunk, np.float32)
    flat_dst = np.zeros(n_seg_pad * chunk, np.int32)
    seg_bs = np.zeros(n_seg_pad, np.int32)
    mid_bd = np.zeros(n_mid_pad, np.int32)
    for b in range(n_bands):
        o = e_order[b]
        starts, bases = seg_starts_l[b], seg_bs_l[b]
        # band-local position -> (segment, rank)
        p = np.arange(len(o))
        segk = np.searchsorted(starts, p, side="right") - 1
        rank = p - starts[segk]
        slot = (seg_base[b] + segk) * chunk + rank
        flat_src[slot] = src[o] - bases[segk]
        flat_dst[slot] = dst[o] - band_bd[b]
        flat_w[slot] = w[o]
        sb = int(seg_base[b])
        seg_bs[sb:sb + len(bases)] = bases
        # bases of this band's padding segments stay 0 (w=0 slots)
        mid_bd[sb // seg_per_mid:
               int(seg_base[b + 1]) // seg_per_mid] = band_bd[b]

    return _assemble((seg_bs, mid_bd, flat_src, flat_dst, flat_w,
                      n_seg_pad, n_mid_pad))


def validate_pair_chunks(pc: PairChunks) -> None:
    """Loud structural validation of a packing (host-side numpy).

    Catches corrupted packings — out-of-range window bases, local
    offsets outside the window, geometry inconsistencies, non-finite
    weights — BEFORE they reach the kernel, where an out-of-bounds
    dynamic slice would silently CLAMP and mis-gather (the checkify/
    sanitizer analog for the index paths; SURVEY.md §5 "sanitizers").
    Runs at pack time on the host arrays; raises ValueError.
    """
    seg_bs = np.asarray(pc.seg_bs)
    mid_bd = np.asarray(pc.mid_bd)
    e_src = np.asarray(pc.e_src)
    e_dst = np.asarray(pc.e_dst)
    e_w = np.asarray(pc.e_w)
    chunk, spm, mid = pc.chunk, pc.seg_per_mid, pc.mid
    n_seg, n_mid = seg_bs.shape[0], mid_bd.shape[0]

    def fail(msg):
        raise ValueError(f"corrupted PairChunks packing: {msg}")

    if e_src.shape != (chunk, n_seg) or e_w.shape != (chunk, n_seg):
        fail(f"slot arrays {e_src.shape}/{e_w.shape} != ({chunk}, {n_seg})")
    if e_dst.shape != (n_mid, mid):
        fail(f"e_dst {e_dst.shape} != ({n_mid}, {mid})")
    if n_seg != n_mid * spm:
        fail(f"n_seg={n_seg} != n_mid*spm={n_mid * spm}")
    if n_mid % pc.mids_per_step:
        fail(f"n_mid={n_mid} not a multiple of "
             f"mids_per_step={pc.mids_per_step}")
    align_s = pc.align or pc.window_src
    align_d = pc.align or pc.window
    if seg_bs.size and (seg_bs.min() < 0
                        or seg_bs.max() > pc.n_cols_pad - pc.window_src):
        fail(f"seg_bs outside [0, {pc.n_cols_pad - pc.window_src}] "
             f"(src window would clamp)")
    if seg_bs.size and (seg_bs % align_s).any():
        fail(f"seg_bs not {align_s}-aligned")
    if mid_bd.size and (mid_bd.min() < 0
                        or mid_bd.max() > pc.n_rows_pad - pc.window):
        fail(f"mid_bd outside [0, {pc.n_rows_pad - pc.window}] "
             f"(dst window would clamp)")
    if mid_bd.size and (mid_bd % align_d).any():
        fail(f"mid_bd not {align_d}-aligned")
    if e_src.size and (e_src.min() < 0 or e_src.max() >= pc.window_src):
        fail(f"e_src outside [0, {pc.window_src})")
    if e_dst.size and (e_dst.min() < 0 or e_dst.max() >= pc.window):
        fail(f"e_dst outside [0, {pc.window})")
    if not np.isfinite(e_w).all():
        fail("non-finite edge weights")
    nnz_slots = int((e_w != 0).sum())
    if nnz_slots > pc.nnz:
        fail(f"{nnz_slots} non-zero slots > declared nnz={pc.nnz}")


def _maybe_validate(pc: PairChunks) -> PairChunks:
    """Pack-time validation hook: always on up to 2M slots; beyond that
    (ingest-scale graphs, where the O(slots) compares would tax the
    measured packing throughput) only when PPNP_TPU_VALIDATE=1.
    PPNP_TPU_VALIDATE=0 disables entirely."""
    mode = os.environ.get("PPNP_TPU_VALIDATE", "auto")
    if mode in ("0", "never"):
        return pc
    if mode == "auto" and pc.n_seg * pc.chunk > 2_000_000:
        return pc
    validate_pair_chunks(pc)
    return pc


# ------------------------- geometry autotuning ------------------------- #
# The kernel is MXU-ISSUE-bound (docs/PERFORMANCE.md "Where the time
# goes"): per step it issues one gather dot per segment and one scatter
# dot per midchunk. The cost model below was FIT to the measured
# 9-point geometry sweep on TPU v5e (docs/PERFORMANCE.md table;
# max 5.3% / mean 2.4% relative error):
#
#   t ∝ n_seg_pad · max(15, chunk/1.5)                      [gather dots]
#     + 16.2 · n_mid_pad · (15 + mid·window/4096)           [scatter dots]
#
# The gather term is the small-dot fixed issue cost (~15 cycles for a
# (M≤16,128)@(128,128) dot, ~1.5 rows/cycle beyond); the scatter term
# grows with the one-hot's window×MID area. The constant offset of the
# fit is geometry-independent and drops out of the argmin.

# (window, window_src, chunk) candidates spanning the measured sweep;
# spm is chosen per (window, chunk) from the per-band counts. The w=64
# rows exist for the wide-c regime (c≥256), where the scatter one-hot's
# window×MID area dominates once it is multiplied by the lane tiles —
# smaller dst bands shrink it at the cost of fuller-segment pooling.
GEOMETRY_CANDIDATES = tuple((w, 128, ch)
                            for w in (64, 128, 256, 320, 384)
                            for ch in (16, 24, 32))
SPM_CANDIDATES = (16, 32, 64)


def banded_segment_counts(dst: np.ndarray, src: np.ndarray,
                          n_rows_pad: int, n_cols_pad: int,
                          window: int, window_src: int,
                          chunk: int) -> np.ndarray:
    """Per-band segment counts of the banded greedy cut.

    Count-only twin of ``pair_chunks_banded``'s band walk (same maximal
    8-aligned dst bands, same greedy src-window/chunk cut) — MUST stay
    in lockstep with it, which ``tests/test_autotune.py`` asserts by
    packing. ``dst`` must be sorted ascending.
    """
    nseg_b = []
    i, nnz = 0, len(dst)
    while i < nnz:
        bd = min((int(dst[i]) >> 3) << 3, n_rows_pad - window)
        j = int(np.searchsorted(dst, bd + window, side="left"))
        s_src = np.sort(src[i:j], kind="stable")
        nseg, k = 0, 0
        while k < len(s_src):
            bs = min((int(s_src[k]) >> 3) << 3, n_cols_pad - window_src)
            end = int(np.searchsorted(s_src, bs + window_src, side="left"))
            nseg += 1
            k = min(end, k + chunk)
        nseg_b.append(nseg)
        i = j
    return np.asarray(nseg_b, np.int64)


def estimate_step_cost(n_seg_pad: int, n_mid_pad: int, chunk: int,
                       window: int, seg_per_mid: int,
                       c: int = 128) -> float:
    """Relative per-step MXU issue cost of a banded geometry (see the
    fitted model above; arbitrary units — valid for argmin only).

    ``c`` adds the lane-tile term: a dot with a >128-wide RHS runs one
    MXU pass per 128-lane tile, so the STREAMING part of both dot costs
    scales with ceil(c/128) while the fixed ~15-cycle issue overhead
    does not. At c=128 this reduces exactly to the fitted model; the
    measured c-sweep (BASELINE.md: 215µs @128 → 446µs @256, i.e. ~2.07×)
    confirms the near-linear scaling the term predicts once dots are
    throughput- rather than issue-bound.
    """
    lanes = max(1, -(-c // 128))
    mid = chunk * seg_per_mid
    gather = n_seg_pad * max(15.0, chunk * lanes / 1.5)
    scatter = 16.2 * n_mid_pad * (15.0 + mid * window * lanes / 4096.0)
    return gather + scatter


def select_geometry(
    mat: sp.spmatrix,
    reorder: Optional[str] = None,
    perm: Optional[np.ndarray] = None,
    mids_per_step: int = 16,
    sample_rows: int = 131_072,
    candidates=GEOMETRY_CANDIDATES,
    spm_candidates=SPM_CANDIDATES,
    c: int = 128,
) -> dict:
    """Pick the banded-packer geometry minimizing the issue-cost model.

    Runs the count-only band walk per (window, window_src, chunk)
    candidate (the spm sweep reuses each walk's per-band counts), on the
    same permuted matrix the packer will see. Graphs beyond
    ``sample_rows`` rows are estimated from a contiguous row slice —
    after RCM the band structure is near-homogeneous, and a uniform
    subsample scales every candidate's cost equally.

    Returns ``{"window", "window_src", "chunk", "seg_per_mid", "cost"}``
    (kwargs for ``pair_chunks_banded``; ``cost`` is the winning model
    score, arbitrary units). Hand-tuned defaults measured within 5% of
    the model's pick on all sweep graphs (tests/test_autotune.py).
    """
    perm = _resolve_perm(mat, reorder, perm)
    csr = mat.tocsr()
    if csr is mat and not csr.has_canonical_format:
        csr = csr.copy()
    csr.sum_duplicates()
    n_rows, n_cols = csr.shape
    if perm is not None:
        iperm = np.empty_like(perm)
        iperm[perm] = np.arange(len(perm))
        coo = csr.tocoo()
        dst = iperm[coo.row.astype(np.int64)]
        src = iperm[coo.col.astype(np.int64)]
        order = np.lexsort((src, dst))
        dst, src = dst[order], src[order]
    else:
        dst = np.repeat(np.arange(n_rows, dtype=np.int64),
                        np.diff(csr.indptr))
        src = csr.indices.astype(np.int64)
    if n_rows > sample_rows:
        lo = (n_rows - sample_rows) // 2
        keep = slice(int(np.searchsorted(dst, lo)),
                     int(np.searchsorted(dst, lo + sample_rows)))
        dst, src = dst[keep], src[keep]

    best = None
    for window, window_src, chunk in candidates:
        n_rows_pad = max(round_up_to_multiple(n_rows, 128), window)
        n_cols_pad = max(round_up_to_multiple(n_cols, 128), window_src)
        if n_rows == n_cols:
            n_rows_pad = n_cols_pad = max(n_rows_pad, n_cols_pad)
        nseg_b = banded_segment_counts(dst, src, n_rows_pad, n_cols_pad,
                                       window, window_src, chunk)
        for spm in spm_candidates:
            n_mid = int(np.ceil(nseg_b / spm).sum())
            n_mid_pad = round_up_to_multiple(max(n_mid, 1), mids_per_step)
            n_seg_pad = n_mid_pad * spm
            cost = estimate_step_cost(n_seg_pad, n_mid_pad, chunk,
                                      window, spm, c=c)
            if best is None or cost < best["cost"]:
                best = {"window": window, "window_src": window_src,
                        "chunk": chunk, "seg_per_mid": spm, "cost": cost}
    return best


def pair_chunks_auto(mat: sp.spmatrix, reorder: Optional[str] = None,
                     perm: Optional[np.ndarray] = None,
                     c: int = 128,
                     **kwargs) -> PairChunks:
    """Banded packing with the geometry autotuned per graph.

    Drop-in for ``pair_chunks_banded``; explicit geometry kwargs
    (window/window_src/chunk/seg_per_mid) override the model's pick.
    ``c`` is the feature width the operand H will carry (the cost
    model's lane-tile term — wide c shifts the optimum toward smaller
    dst windows).
    """
    perm = _resolve_perm(mat, reorder, perm)  # RCM computed ONCE
    geo = select_geometry(mat, perm=perm, c=c,
                          mids_per_step=kwargs.get("mids_per_step", 16))
    geo.pop("cost")
    for k in tuple(geo):
        if k in kwargs:
            geo[k] = kwargs.pop(k)
    return pair_chunks_banded(mat, perm=perm, **geo, **kwargs)


def to_device(pc: PairChunks) -> PairChunks:
    """Upload all array leaves once, at the END of packing.

    Packing stays in numpy throughout: device round-trips mid-pack are
    catastrophically slow on remote-tunneled platforms (measured 480s
    for a 900k-edge graph when _attach_edge_ids re-downloaded the
    just-uploaded slot arrays).
    """
    import jax
    return jax.tree.map(jnp.asarray, pc)


def _attach_edge_ids(pc: PairChunks,
                     orientation: Optional[str]) -> PairChunks:
    """Store canonical 64-bit edge ids per slot (see PairChunks).

    ``orientation="direct"``: id = row·span + col of the packed matrix;
    ``"transpose"``: id = col·span + row, so a packing of Mᵀ assigns each
    edge the SAME id as the forward packing of M (span = max padded dim
    is symmetric under transposition).
    """
    if orientation is None:
        return pc
    if orientation not in ("direct", "transpose"):
        raise ValueError(f"unknown edge_ids orientation {orientation!r}")
    rows, cols, valid = _slot_coords(pc)
    # span must be TRANSPOSE-INVARIANT or the forward and transpose
    # packings assign different ids to the same edge (and id-keyed
    # dropout would silently draw different masks in fwd vs bwd).
    # max(unpadded rows, unpadded cols) is symmetric; the padded dims
    # are not when window != window_src.
    if pc.n_cols:
        span = max(pc.n_rows, pc.n_cols)
    else:  # legacy packing without n_cols
        span = max(pc.n_rows_pad, pc.n_cols_pad)
    r, c = (cols, rows) if orientation == "transpose" else (rows, cols)
    eid = np.where(valid, r.astype(np.int64) * span + c, 0)
    eid = eid.reshape(pc.n_seg, pc.chunk).T
    return pc.replace(
        eid_hi=((eid >> 32) & 0xFFFFFFFF).astype(np.uint32),
        eid_lo=(eid & 0xFFFFFFFF).astype(np.uint32))


def packer_for(layout: str):
    """The packing function for a layout name
    ("banded" | "aligned" | "auto")."""
    if layout == "banded":
        return pair_chunks_banded
    if layout == "aligned":
        return pair_chunks_from_scipy
    if layout == "auto":
        return pair_chunks_auto
    raise ValueError(f"unknown pair-chunk layout {layout!r} "
                     "(expected 'banded', 'aligned' or 'auto')")


def transpose_ids(forward_edge_ids: Optional[str]) -> Optional[str]:
    """The ``transpose_pair`` edge-id orientation matching a FORWARD
    packing's ``edge_ids``, so per-edge dropout masks regenerate
    identically in both packings (see ``_attach_edge_ids``). Use this
    when forwarding a caller's pack kwargs to ``transpose_pair`` —
    passing the forward orientation through unchanged silently draws
    DIFFERENT masks in the backward operator."""
    return {"direct": "transpose", "transpose": "direct",
            None: None}[forward_edge_ids]


def pad_pair_chunks(pc: PairChunks, n_seg_to: int,
                    n_mid_to: int) -> PairChunks:
    """Pad a PairChunks to a given (n_seg, n_mid) geometry.

    Padding segments/midchunks carry w=0 and base row 0 — they stream
    through the kernel and contribute exact zeros, the same invariant
    as the packer's own padding.

    Host (numpy) arrays pad in numpy: one jnp.pad per leaf is a full
    remote-device dispatch on the tunneled platform (~0.6s each —
    measured 44s for a 2-block blocked ingest before this dispatch).
    """
    import jax.numpy as jnp

    def _pad(a, widths):
        mod = np if isinstance(a, np.ndarray) else jnp
        return mod.pad(a, widths)

    dseg = n_seg_to - pc.n_seg
    dmid = n_mid_to - pc.n_mid
    pad_seg = lambda a: (None if a is None  # noqa: E731
                         else _pad(a, ((0, 0), (0, dseg))))
    # replace() pads exactly the geometry-dependent arrays and inherits
    # every other (incl. future) field untouched.
    return pc.replace(
        seg_bs=_pad(pc.seg_bs, (0, dseg)),
        mid_bd=_pad(pc.mid_bd, (0, dmid)),
        e_src=_pad(pc.e_src, ((0, 0), (0, dseg))),
        e_w=pad_seg(pc.e_w),
        e_dst=_pad(pc.e_dst, ((0, dmid), (0, 0))),
        eid_hi=pad_seg(pc.eid_hi), eid_lo=pad_seg(pc.eid_lo))


def pad_stack_pair_chunks(pclist) -> PairChunks:
    """Pad a list of same-layout PairChunks to one common static
    geometry and stack the array leaves along a new leading axis (the
    shard/block axis consumed inside shard_map / the block scan).

    Static fields must be identical to stack; ``nnz`` is metadata only
    (roofline accounting) and is replaced by the per-member max.
    """
    import jax
    import jax.numpy as jnp
    statics = ("window", "window_src", "chunk", "seg_per_mid",
               "mids_per_step", "align", "n_rows_pad", "n_cols_pad")
    ref = {f: getattr(pclist[0], f) for f in statics}
    for i, p in enumerate(pclist[1:], 1):
        bad = {f: (ref[f], getattr(p, f)) for f in statics
               if getattr(p, f) != ref[f]}
        if bad:
            raise ValueError(
                f"cannot stack pair chunks: member {i} diverges from "
                f"member 0 on static geometry {bad}")
    mps = pclist[0].mids_per_step
    n_mid = round_up_to_multiple(max(p.n_mid for p in pclist), mps)
    n_seg = n_mid * pclist[0].seg_per_mid
    nnz = max(p.nnz for p in pclist)
    padded = [pad_pair_chunks(p, n_seg, n_mid).replace(nnz=nnz)
              for p in pclist]
    if len(padded) > 1:
        try:  # chex is a test-extra; the static check above is the gate
            import chex
            chex.assert_trees_all_equal_shapes(*padded)
        except ImportError:
            pass
    # Host leaves stack in numpy (a jnp.stack per leaf is a remote
    # dispatch on the tunneled platform); device leaves stay in jnp.
    return jax.tree.map(
        lambda *xs: (np.stack(xs)
                     if all(isinstance(x, np.ndarray) for x in xs)
                     else jnp.stack(xs)), *padded)


def stack_slot_permutations(perms, n_slots_t: int) -> np.ndarray:
    """Stack per-member slot permutations, -1-padded to a common width
    (matches the padded transpose geometry's slot count)."""
    out = np.full((len(perms), n_slots_t), -1, dtype=np.int64)
    for i, p in enumerate(perms):
        out[i, :len(p)] = p
    return out


def transpose_pair(mat: sp.spmatrix, edge_ids: Optional[str] = "transpose",
                   layout: str = "banded", **kwargs) -> PairChunks:
    """Pack Âᵀ (for the SpMM adjoint — the backward pass's operator).

    Edge ids default to the "transpose" orientation so per-edge dropout
    masks regenerate identically in both packings. ``layout`` picks the
    packer ("banded" sliding windows — the system default — or the
    "aligned" grid) and must match the forward packing's layout: a
    mismatch still computes correctly (slot permutation and edge ids
    are layout-independent) but silently runs the slower geometry.
    """
    return packer_for(layout)(mat.T.tocsr(), edge_ids=edge_ids, **kwargs)


def _slot_coords(pc: PairChunks):
    """Per-slot (row, col, valid) in flat slot order (seg-major, then
    chunk position). Padding slots have w == 0."""
    chunk, spm = pc.chunk, pc.seg_per_mid
    e_src = np.asarray(pc.e_src).T.reshape(-1)               # (n_seg*chunk)
    e_w = np.asarray(pc.e_w).T.reshape(-1)
    e_dst = np.asarray(pc.e_dst).reshape(pc.n_seg, chunk).reshape(-1)
    bs = np.repeat(np.asarray(pc.seg_bs), chunk)
    bd = np.repeat(np.repeat(np.asarray(pc.mid_bd), spm), chunk)
    rows = bd + e_dst
    cols = bs + e_src
    return rows, cols, e_w != 0


def slot_permutation(pc: PairChunks, pc_t: PairChunks) -> np.ndarray:
    """perm[t_slot] = source slot in ``pc`` carrying the same edge, or -1.

    ``pc_t`` packs Âᵀ; its slot (r', c') is the original edge (c', r').
    Used to transfer per-iteration dropout-masked weights onto the
    transposed operator in the SpMM backward pass. Assumes no duplicate
    coordinates (``sum_duplicates`` ran) and no true zero weights.
    """
    rows, cols, valid = _slot_coords(pc)
    rows_t, cols_t, valid_t = _slot_coords(pc_t)
    span = max(pc.n_cols_pad, pc_t.n_cols_pad, pc.n_rows_pad,
               pc_t.n_rows_pad)
    key = rows[valid].astype(np.int64) * span + cols[valid]
    key_t = cols_t[valid_t].astype(np.int64) * span + rows_t[valid_t]
    slot_ids = np.where(valid)[0]
    order = np.argsort(key, kind="stable")
    key_sorted = key[order]
    pos = np.searchsorted(key_sorted, key_t)
    if not (len(key) == len(key_t) and np.array_equal(key_sorted[pos],
                                                      key_t)):
        raise ValueError("pair chunk packings do not describe transposed "
                         "matrices")
    perm = np.full(len(rows_t), -1, dtype=np.int64)
    perm[np.where(valid_t)[0]] = slot_ids[order][pos]
    return perm
