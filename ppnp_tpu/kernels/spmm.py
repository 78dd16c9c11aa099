"""Pallas TPU SpMM over PairChunks: out = A @ H (+ init) with A sparse.

Reference analog: the ``Â_drop @ preds`` torch.sparse matmul at the heart
of APPNP (ppnp/pytorch/propagation.py ~L45, SURVEY.md §3.3) — rebuilt for
the MXU instead of gather/scatter hardware:

- H stays **fully resident in VMEM** (v5e has 128MB; every reference graph
  fits with room to spare), so source rows are free to read.
- Per *segment* (CHUNK edges of one (dst-window, src-window) pair) the
  kernel builds ``E[k, r] = w_k·[src_k == r]`` with one iota-compare and
  computes ``C = E @ H[sw:sw+W]`` — the gather-as-matmul.
- Per *midchunk* (SEG_PER_MID segments' worth of edges, all one dst
  window) it builds the transposed dst one-hot ``Dᵀ[r, k] = [dst_k == r]``
  and accumulates ``out[dw:dw+W] += Dᵀ @ C_buf`` — the scatter-as-matmul.
- Edge data streams HBM→VMEM via the grid pipeline; out is a revisited
  VMEM-resident block written back once.
- All intra-step loops are statically unrolled: Mosaic only allows
  128-aligned dynamic lane offsets, so per-segment lane slices use static
  indices (the grid supplies the dynamic dimension).

Measured design points (1× TPU v5e, MS Academic Â, c=128, in a 10-step
scan so dispatch latency is hidden):

- The kernel is **MXU-issue-bound**, not HBM-bound: each gather dot costs
  ~15 cycles regardless of CHUNK (stationary-load + issue overhead), and
  each scatter dot streams ``window`` rows per midchunk. Hence the tuned
  defaults CHUNK=16 (halves the dot count vs 8 at modest padding cost)
  and SEG_PER_MID=32 (MID=512: 4× fewer scatter dots), worth ~1.5× over
  (8, 16).
- Scalar-prefetch grid specs (``PrefetchScalarGridSpec``) cost ~5-8 µs
  *per grid step* on this platform; the window-base arrays therefore live
  as plain unblocked SMEM inputs instead.
- ``init`` fuses the APPNP α-mix: ``out = A@H + init`` with
  ``init = α·H⁰`` and (1-α) pre-folded into the edge weights makes the
  whole power-iteration step a single kernel.
- Bandwidth-reducing row reordering (RCM, see
  ``ppnp_tpu.ops.pairchunks.pair_chunks_from_scipy(reorder=...)``)
  densifies (dst,src)-window pairs and cuts padding slots ~7-30%.
- The BANDED layout (``pair_chunks_banded``, the default) goes further:
  window bases become sliding 8-aligned offsets (``pc.align == 8`` →
  the ``pl.multiple_of`` hints relax to sublane alignment) and a wide
  256-row dst band pools enough src locality that most chunk=24
  segments pack full — 293→239 µs/step on MS Academic
  (docs/PERFORMANCE.md "Banded packing").

HBM traffic per call ≈ edge stream (~12B/edge-slot) + H load + out store —
the speed-of-light bytes from BASELINE.md — with all per-edge work done as
vectorized VPU compares and MXU matmuls (no scalar loops).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ppnp_tpu.ops.pairchunks import PairChunks

__all__ = ["spmm_pair_chunks", "spmm_pair_chunks_grouped",
           "transfer_weights", "make_spmm_grad", "make_spmm_grad_grouped",
           "stack_group_weights"]

# v5e VMEM is 128MiB; leave headroom for Mosaic's own buffers.
_VMEM_LIMIT_BYTES = 100 * 1024 * 1024


def _spmm_kernel(seg_bs_ref, mid_bd_ref, e_src_ref, e_w_ref, e_dst_ref,
                 h_ref, *rest,
                 window, window_src, chunk, seg_per_mid, mids_per_step,
                 has_init, align):
    if has_init:
        init_ref, out_ref, cbuf = rest
    else:
        out_ref, cbuf = rest
    mid = chunk * seg_per_mid
    sps = mids_per_step * seg_per_mid
    cols_e = jax.lax.broadcasted_iota(jnp.int32, (chunk, window_src), 1)
    rows_d = jax.lax.broadcasted_iota(jnp.int32, (window, mid), 0)
    pid = pl.program_id(0)

    @pl.when(pid == 0)
    def _():
        if has_init:
            out_ref[:] = init_ref[:]
        else:
            out_ref[:] = jnp.zeros_like(out_ref)

    for m in range(mids_per_step):  # static unroll
        for j in range(seg_per_mid):  # static unroll
            s = m * seg_per_mid + j
            bs = pl.multiple_of(seg_bs_ref[pid * sps + s],
                                align or window_src)
            src = e_src_ref[:, s:s + 1]           # (CHUNK, 1), static lane
            w = e_w_ref[:, s:s + 1]               # (CHUNK, 1)
            e = jnp.where(cols_e == src, w, 0.0)  # (CHUNK, W_src)
            hs = h_ref[pl.ds(bs, window_src), :]  # (W_src, c)
            cm = jnp.dot(e, hs, preferred_element_type=jnp.float32)
            cbuf[j * chunk:(j + 1) * chunk, :] = cm

        bd = pl.multiple_of(mid_bd_ref[pid * mids_per_step + m],
                            align or window)
        dloc = e_dst_ref[m:m + 1, :]              # (1, MID), static sublane
        d_t = jnp.where(rows_d == dloc, 1.0, 0.0)  # (W, MID)
        contrib = jnp.dot(d_t, cbuf[:],
                          preferred_element_type=jnp.float32)  # (W, c)
        out_ref[pl.ds(bd, window), :] += contrib


def _spmm_kernel_grouped(seg_bs_ref, mid_bd_ref, e_src_ref, e_w_ref,
                         e_dst_ref, h_ref, *rest,
                         window, window_src, chunk, seg_per_mid,
                         mids_per_step, has_init, align, groups, cg):
    """Seed-batched SpMM: G independent weightings of ONE sparse pattern.

    The H operand stacks G feature groups along the lane axis — group
    g's features in lanes [g·cg, (g+1)·cg) ((n, G·cg), e.g. G seeds'
    local logits); ``e_w_ref`` carries G per-slot weight sets in MID
    layout — (n_mid, MID, G), row ``j·chunk + i`` of mid m holding
    segment ``m·spm + j``'s chunk-row i (``stack_group_weights``), so
    it slices per MID with no lane shuffling. The gather one-hot is
    built UNWEIGHTED — one shared MXU dot serves all G groups — and
    the per-group weights apply as G lane-broadcast VPU multiplies per
    MID, each scaling its group's aligned lane slice of the gathered
    buffer in place just before the scatter dot (padding slots carry
    weight 0, so their garbage gathers still cancel). The scatter
    one-hot is weight-free, so it is shared as-is. Net: the MXU issue
    count of a single-seed call covers G seeds (the kernel is
    issue-bound — module docstring) at ~4·G extra VPU ops per MID —
    amortized over seg_per_mid segments, which keeps both trace and
    Mosaic-compile cost of the unrolled body low. (Measured dead ends
    at production geometry, 1024-segment unroll: a per-SEGMENT
    per-group loop traced in 121s; ``pltpu.repeat`` lane-tiling
    register-spills ~350MB; a per-mid cg-operand lane concat compiled
    but cost 2.7× at runtime from unaligned cross-lane copies.)

    Numerics: per edge the value is (1·h)·w instead of (w·1)·h — the
    same single rounding — so results are bit-identical to G separate
    ``_spmm_kernel`` calls.
    """
    if has_init:
        init_ref, out_ref, cbuf = rest
    else:
        out_ref, cbuf = rest
    mid = chunk * seg_per_mid
    sps = mids_per_step * seg_per_mid
    cols_e = jax.lax.broadcasted_iota(jnp.int32, (chunk, window_src), 1)
    rows_d = jax.lax.broadcasted_iota(jnp.int32, (window, mid), 0)
    pid = pl.program_id(0)

    @pl.when(pid == 0)
    def _():
        if has_init:
            out_ref[:] = init_ref[:]
        else:
            out_ref[:] = jnp.zeros_like(out_ref)

    for m in range(mids_per_step):  # static unroll
        for j in range(seg_per_mid):  # static unroll
            s = m * seg_per_mid + j
            bs = pl.multiple_of(seg_bs_ref[pid * sps + s],
                                align or window_src)
            src = e_src_ref[:, s:s + 1]               # (CHUNK, 1)
            e = jnp.where(cols_e == src, 1.0, 0.0)    # unit gather one-hot
            hs = h_ref[pl.ds(bs, window_src), :]      # (W_src, cg·G)
            cbuf[j * chunk:(j + 1) * chunk, :] = jnp.dot(
                e, hs, preferred_element_type=jnp.float32)

        w = e_w_ref[m]                                # (MID, G)
        for g in range(groups):                       # static unroll
            cbuf[:, g * cg:(g + 1) * cg] = (
                cbuf[:, g * cg:(g + 1) * cg] * w[:, g:g + 1])
        bd = pl.multiple_of(mid_bd_ref[pid * mids_per_step + m],
                            align or window)
        dloc = e_dst_ref[m:m + 1, :]                  # (1, MID)
        d_t = jnp.where(rows_d == dloc, 1.0, 0.0)     # (W, MID)
        contrib = jnp.dot(d_t, cbuf[:],
                          preferred_element_type=jnp.float32)  # (W, G·cg)
        out_ref[pl.ds(bd, window), :] += contrib


def stack_group_weights(ws, pc: PairChunks) -> jnp.ndarray:
    """Stack per-group (CHUNK, n_seg) weight sets into the grouped
    kernel's (n_mid, MID, G) layout: mid m's row ``j·chunk + i`` is
    segment ``m·spm + j``'s chunk-row i — the exact row order of the
    kernel's gathered buffer, so the weights apply as one multiply per
    MID with no in-kernel shuffling."""
    chunk, spm, n_mid = pc.chunk, pc.seg_per_mid, pc.n_mid

    def one(w):
        return w.T.reshape(n_mid, spm * chunk)

    return jnp.stack([one(w) for w in ws], axis=-1)


@functools.partial(jax.jit,
                   static_argnames=("mids_per_step", "interpret",
                                    "keep_padded"))
def spmm_pair_chunks_grouped(pc: PairChunks, h: jnp.ndarray,
                             e_w_g: jnp.ndarray,
                             init: Optional[jnp.ndarray] = None,
                             mids_per_step: Optional[int] = None,
                             interpret: Optional[bool] = None,
                             keep_padded: bool = False) -> jnp.ndarray:
    """``A_wg @ H_g`` for all G groups (+ init) in ONE kernel call.

    ``h`` is (n_cols_pad, G·cg) with group g's features in lanes
    [g·cg, (g+1)·cg); ``e_w_g`` is (n_mid, MID, G) — G per-slot weight
    sets in the gathered buffer's row order (``stack_group_weights``).
    The sparse PATTERN (pc) is shared; only the weights differ per
    group — the seed-batched training case, where each seed draws its
    own edge-dropout mask over the same Â. Operates in packed row
    order (callers permute/pad once outside, as the propagation scan
    does).
    """
    if mids_per_step is None:
        mids_per_step = pc.mids_per_step
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    chunk = pc.chunk
    if e_w_g.ndim != 3 or e_w_g.shape[:2] != (pc.n_mid, pc.mid):
        raise ValueError(
            f"e_w_g shape {e_w_g.shape} != (n_mid={pc.n_mid}, "
            f"mid={pc.mid}, G) — stack_group_weights layout")
    groups = e_w_g.shape[2]
    c_total = h.shape[1]
    if c_total % groups:
        raise ValueError(f"h lanes {c_total} not divisible by G={groups}")
    cg = c_total // groups
    window, spm = pc.window, pc.seg_per_mid
    mid = pc.mid
    n_mid = pc.n_mid
    if n_mid % mids_per_step:
        raise ValueError(f"n_mid={n_mid} not divisible by "
                         f"mids_per_step={mids_per_step}")
    sps = mids_per_step * spm
    if h.shape[0] < pc.n_cols_pad:
        h = jnp.pad(h, ((0, pc.n_cols_pad - h.shape[0]), (0, 0)))
    has_init = init is not None
    if has_init and init.shape[0] < pc.n_rows_pad:
        init = jnp.pad(init, ((0, pc.n_rows_pad - init.shape[0]), (0, 0)))

    if not interpret:
        resident = (pc.n_cols_pad
                    + (2 + has_init) * pc.n_rows_pad) * c_total * 4
        # e_w_g blocks are (mps, MID, G) with G lane-padded to 128 in
        # VMEM tiling — the padding is real allocation.
        e_w_lanes = -(-groups // 128) * 128
        streams = (chunk * sps * 4 + mids_per_step * mid * 4
                   + mids_per_step * mid * e_w_lanes * 4
                   + mid * c_total * 4) * 2
        if resident + streams > _VMEM_LIMIT_BYTES:
            raise ValueError(
                f"grouped SpMM too large for VMEM "
                f"(needs ~{(resident + streams) >> 20}MiB of "
                f"{_VMEM_LIMIT_BYTES >> 20}MiB): lower the group count "
                f"or row-shard over a mesh")

    grid = (n_mid // mids_per_step,)
    kernel = functools.partial(
        _spmm_kernel_grouped, window=window, window_src=pc.window_src,
        chunk=chunk, seg_per_mid=spm, mids_per_step=mids_per_step,
        has_init=has_init, align=pc.align, groups=groups, cg=cg)

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),   # seg_bs
        pl.BlockSpec(memory_space=pltpu.SMEM),   # mid_bd
        pl.BlockSpec((chunk, sps), lambda i: (0, i),
                     memory_space=pltpu.VMEM),   # e_src
        pl.BlockSpec((mids_per_step, mid, groups), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),   # e_w_g, MID rows
        pl.BlockSpec((mids_per_step, mid), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),   # e_dst
        pl.BlockSpec((pc.n_cols_pad, c_total), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),   # H, resident
    ]
    args = [pc.seg_bs, pc.mid_bd, pc.e_src, e_w_g, pc.e_dst, h]
    if has_init:
        in_specs.append(pl.BlockSpec((pc.n_rows_pad, c_total),
                                     lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(init)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((pc.n_rows_pad, c_total), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((pc.n_rows_pad, c_total),
                                       jnp.float32),
        scratch_shapes=[pltpu.VMEM((mid, c_total), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_BYTES),
        cost_estimate=pl.CostEstimate(
            flops=2 * pc.n_seg * chunk * (pc.window_src + window) * c_total,
            bytes_accessed=(pc.n_seg * chunk * (8 + 4 * groups)
                            + pc.n_cols_pad * c_total * 4
                            + pc.n_rows_pad * c_total * 4),
            transcendentals=0),
        interpret=interpret,
    )(*args)
    return out if keep_padded else out[:pc.n_rows]


@functools.partial(jax.jit,
                   static_argnames=("mids_per_step", "interpret",
                                    "assume_permuted", "keep_padded"))
def spmm_pair_chunks(pc: PairChunks, h: jnp.ndarray,
                     e_w: Optional[jnp.ndarray] = None,
                     init: Optional[jnp.ndarray] = None,
                     mids_per_step: Optional[int] = None,
                     interpret: Optional[bool] = None,
                     assume_permuted: bool = False,
                     keep_padded: bool = False) -> jnp.ndarray:
    """``A @ H (+ init)`` through the Pallas kernel.

    - ``e_w`` optionally overrides the packed edge weights (same
      (CHUNK, n_seg) layout) — used for per-iteration edge dropout and
      for folding the APPNP (1-α) scale into the operator.
    - ``init`` optionally seeds the output accumulator (fused α·H⁰ mix);
      shape (n_rows, c) or already padded to (n_rows_pad, c).
    - If the packing was built with a row reordering (``pc.perm``),
      ``h``/``init`` are permuted on entry and the result is restored to
      original row order — unless ``assume_permuted`` (hot loops keep all
      operands in packed order and permute once outside).
    - ``keep_padded`` returns the full (n_rows_pad, c) accumulator
      (useful when the caller chains steps on padded square operands).
    """
    if e_w is None:
        e_w = pc.e_w
    if mids_per_step is None:
        mids_per_step = pc.mids_per_step
    if interpret is None:
        # Auto: compile on TPU-like backends, interpret elsewhere — so the
        # pallas backends run unmodified on the virtual CPU test mesh and
        # in the driver's multichip dryrun.
        interpret = jax.default_backend() == "cpu"
    # pc.align is authoritative: 0 = window-aligned grid packing, 8 =
    # banded sliding bases (pl.multiple_of must not over-promise).
    align = pc.align or None
    if pc.perm is not None and not assume_permuted:
        h = jnp.take(h, pc.perm, axis=0)
        if init is not None:
            init = jnp.take(init, pc.perm, axis=0)
    window, chunk, spm = pc.window, pc.chunk, pc.seg_per_mid
    mid = pc.mid
    n_mid = pc.n_mid
    if n_mid % mids_per_step:
        raise ValueError(f"n_mid={n_mid} not divisible by "
                         f"mids_per_step={mids_per_step}")
    sps = mids_per_step * spm
    c = h.shape[1]
    # H (and init) padded to the row/col grid of A.
    if h.shape[0] < pc.n_cols_pad:
        h = jnp.pad(h, ((0, pc.n_cols_pad - h.shape[0]), (0, 0)))
    has_init = init is not None
    if has_init and init.shape[0] < pc.n_rows_pad:
        init = jnp.pad(init, ((0, pc.n_rows_pad - init.shape[0]), (0, 0)))

    if not interpret:
        # H, init and out are VMEM-resident by design (plus edge blocks
        # and the cbuf scratch); fail early with a pointer to the
        # row-sharded path when a graph outgrows one core's VMEM.
        resident = (pc.n_cols_pad + (2 + has_init) * pc.n_rows_pad) * c * 4
        streams = (2 * pc.chunk * sps * 4 + mids_per_step * mid * 4
                   + mid * c * 4) * 2
        if resident + streams > _VMEM_LIMIT_BYTES:
            raise ValueError(
                f"graph too large for the single-core VMEM-resident SpMM "
                f"(needs ~{(resident + streams) >> 20}MiB of "
                f"{_VMEM_LIMIT_BYTES >> 20}MiB): row-shard it over a mesh "
                f"(ppnp_tpu.parallel, backend='pallas') or use the XLA "
                f"edge-list backend")

    grid = (n_mid // mids_per_step,)
    kernel = functools.partial(
        _spmm_kernel, window=window, window_src=pc.window_src, chunk=chunk,
        seg_per_mid=spm, mids_per_step=mids_per_step, has_init=has_init,
        align=align)

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),   # seg_bs, unblocked
        pl.BlockSpec(memory_space=pltpu.SMEM),   # mid_bd, unblocked
        pl.BlockSpec((chunk, sps), lambda i: (0, i),
                     memory_space=pltpu.VMEM),   # e_src
        pl.BlockSpec((chunk, sps), lambda i: (0, i),
                     memory_space=pltpu.VMEM),   # e_w
        pl.BlockSpec((mids_per_step, mid), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),   # e_dst
        pl.BlockSpec((pc.n_cols_pad, c), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),   # H, resident
    ]
    args = [pc.seg_bs, pc.mid_bd, pc.e_src, e_w, pc.e_dst, h]
    if has_init:
        in_specs.append(pl.BlockSpec((pc.n_rows_pad, c), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(init)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((pc.n_rows_pad, c), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((pc.n_rows_pad, c), jnp.float32),
        scratch_shapes=[pltpu.VMEM((mid, c), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            # H, init and out are all fully VMEM-resident; the default
            # scoped limit is 16MB but v5e has 128MB of VMEM.
            vmem_limit_bytes=_VMEM_LIMIT_BYTES),
        cost_estimate=pl.CostEstimate(
            flops=2 * pc.n_seg * chunk * (pc.window_src + window) * c,
            bytes_accessed=(pc.n_seg * chunk * 12 + pc.n_cols_pad * c * 4
                            + pc.n_rows_pad * c * 4),
            transcendentals=0),
        interpret=interpret,
    )(*args)
    if pc.perm is not None and not assume_permuted:
        out = jnp.take(out[:pc.n_rows], pc.iperm, axis=0)
        if keep_padded:
            out = jnp.pad(out, ((0, pc.n_rows_pad - pc.n_rows), (0, 0)))
        return out
    return out if keep_padded else out[:pc.n_rows]


def transfer_weights(e_w: jnp.ndarray, perm: jnp.ndarray,
                     chunk: int) -> jnp.ndarray:
    """Move per-slot weights of a packing onto its transpose packing.

    ``perm[t_slot]`` indexes the source packing's flat slot order
    (seg-major) or is -1 for padding — see
    ``ppnp_tpu.ops.pairchunks.slot_permutation``.
    """
    flat = e_w.T.reshape(-1)
    vals = jnp.where(perm >= 0, jnp.take(flat, jnp.clip(perm, 0), axis=0),
                     0.0)
    n_seg_t = perm.shape[0] // chunk
    return vals.reshape(n_seg_t, chunk).T


def _zero_cotangent(x):
    """Cotangent for a non-differentiated array arg (float0 for ints)."""
    import numpy as np
    from jax import dtypes
    if jnp.issubdtype(x.dtype, jnp.floating):
        return jnp.zeros_like(x)
    return np.zeros(x.shape, dtypes.float0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def _spmm_vjp(h, e_w, init, pc, pc_t, w_perm, e_w_t, keep_padded):
    """``A_w @ h (+ init)`` with backward through the transpose packing.

    Module-level custom_vjp: the packings are explicit pytree ARGS (not
    closure captures) so the operator can ride through jit boundaries as
    an argument — closures over traced arrays inside a custom_vjp leak
    tracers into the lowered jaxpr.

    ``e_w_t``: the SAME weights in the transpose packing's slot order,
    when the caller can provide them (id-keyed dropout regenerates them
    gather-free — ops/hashrng.py); ``None`` falls back to gathering the
    forward weights through ``w_perm`` (a ~nnz scalar gather per call).
    """
    return spmm_pair_chunks(pc, h, e_w, init, assume_permuted=True,
                            keep_padded=keep_padded)


def _spmm_vjp_fwd(h, e_w, init, pc, pc_t, w_perm, e_w_t, keep_padded):
    out = spmm_pair_chunks(pc, h, e_w, init, assume_permuted=True,
                           keep_padded=keep_padded)
    return out, (e_w, pc, pc_t, w_perm, e_w_t, h.shape[0],
                 None if init is None else init.shape[0])


def _spmm_vjp_bwd(keep_padded, res, g):
    e_w, pc, pc_t, w_perm, e_w_t_in, h_rows, init_rows = res
    e_w_t = (transfer_weights(e_w, w_perm, pc.chunk)
             if e_w_t_in is None else e_w_t_in)
    dh = spmm_pair_chunks(pc_t, g, e_w_t, None, assume_permuted=True,
                          keep_padded=keep_padded)
    if dh.shape[0] < h_rows:
        dh = jnp.pad(dh, ((0, h_rows - dh.shape[0]), (0, 0)))
    elif dh.shape[0] > h_rows:
        dh = dh[:h_rows]
    dinit = None
    if init_rows is not None:
        dinit = g if g.shape[0] == init_rows else (
            jnp.pad(g, ((0, init_rows - g.shape[0]), (0, 0)))
            if g.shape[0] < init_rows else g[:init_rows])
    return (dh, jnp.zeros_like(e_w), dinit,
            jax.tree.map(_zero_cotangent, pc),
            jax.tree.map(_zero_cotangent, pc_t),
            _zero_cotangent(w_perm),
            None if e_w_t_in is None else jnp.zeros_like(e_w_t_in))


_spmm_vjp.defvjp(_spmm_vjp_fwd, _spmm_vjp_bwd)


def make_spmm_grad(pc: PairChunks, pc_t: PairChunks, perm: jnp.ndarray,
                   keep_padded: bool = False):
    """Differentiable SpMM: forward through ``pc``, backward through the
    transpose packing ``pc_t`` with the SAME (possibly dropout-masked)
    edge weights — exactly torch autograd's Â_dropᵀ backward in the
    reference (SURVEY.md §3.3).

    Returns ``f(h, e_w, init) -> A_w @ h + init`` with a custom VJP
    (pass ``init=None`` for a plain SpMM). When the packings carry a row
    reordering the function operates entirely in PACKED row order
    (``assume_permuted``): callers permute once outside their loop. The
    edge-weight cotangent is not propagated (Â is a fixed operator;
    dropout masks are non-differentiable), matching the reference where
    Â requires no grad; the ``init`` cotangent is the output cotangent.
    """

    def wrapper(h, e_w, init=None, e_w_t=None):
        return _spmm_vjp(h, e_w, init, pc, pc_t, perm, e_w_t, keep_padded)

    return wrapper


def transfer_group_weights(e_w_g: jnp.ndarray, perm: jnp.ndarray,
                           pc: PairChunks,
                           pc_t: PairChunks) -> jnp.ndarray:
    """``transfer_weights`` per group of a (n_mid, MID, G) stack
    (``stack_group_weights`` layout), restacked for the transpose
    packing."""
    groups = e_w_g.shape[-1]

    def back(w2):                        # (n_mid, mid) -> (chunk, n_seg)
        return w2.reshape(pc.n_seg, pc.chunk).T

    return stack_group_weights(
        (transfer_weights(back(e_w_g[:, :, g]), perm, pc.chunk)
         for g in range(groups)), pc_t)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def _spmm_vjp_grouped(h, e_w_g, init, pc, pc_t, w_perm, e_w_g_t,
                      keep_padded):
    """Grouped ``[A_wg @ H_g] (+ init)`` with backward through the
    transpose packing — the seed-batched twin of ``_spmm_vjp`` (same
    argument discipline: packings are explicit pytree args)."""
    return spmm_pair_chunks_grouped(pc, h, e_w_g, init,
                                    keep_padded=keep_padded)


def _spmm_vjp_grouped_fwd(h, e_w_g, init, pc, pc_t, w_perm, e_w_g_t,
                          keep_padded):
    out = spmm_pair_chunks_grouped(pc, h, e_w_g, init,
                                   keep_padded=keep_padded)
    return out, (e_w_g, pc, pc_t, w_perm, e_w_g_t, h.shape[0],
                 None if init is None else init.shape[0])


def _spmm_vjp_grouped_bwd(keep_padded, res, g):
    e_w_g, pc, pc_t, w_perm, e_w_g_t_in, h_rows, init_rows = res
    e_w_g_t = (transfer_group_weights(e_w_g, w_perm, pc, pc_t)
               if e_w_g_t_in is None else e_w_g_t_in)
    dh = spmm_pair_chunks_grouped(pc_t, g, e_w_g_t, None,
                                  keep_padded=keep_padded)
    if dh.shape[0] < h_rows:
        dh = jnp.pad(dh, ((0, h_rows - dh.shape[0]), (0, 0)))
    elif dh.shape[0] > h_rows:
        dh = dh[:h_rows]
    dinit = None
    if init_rows is not None:
        dinit = g if g.shape[0] == init_rows else (
            jnp.pad(g, ((0, init_rows - g.shape[0]), (0, 0)))
            if g.shape[0] < init_rows else g[:init_rows])
    return (dh, jnp.zeros_like(e_w_g), dinit,
            jax.tree.map(_zero_cotangent, pc),
            jax.tree.map(_zero_cotangent, pc_t),
            _zero_cotangent(w_perm),
            None if e_w_g_t_in is None else jnp.zeros_like(e_w_g_t_in))


_spmm_vjp_grouped.defvjp(_spmm_vjp_grouped_fwd, _spmm_vjp_grouped_bwd)


def make_spmm_grad_grouped(pc: PairChunks, pc_t: PairChunks,
                           perm: jnp.ndarray, keep_padded: bool = False):
    """Differentiable grouped SpMM (see ``make_spmm_grad``): forward
    through ``pc`` with G per-group weight sets, backward through the
    transpose packing with the same (per-group) weights."""

    def wrapper(h, e_w_g, init=None, e_w_g_t=None):
        return _spmm_vjp_grouped(h, e_w_g, init, pc, pc_t, perm, e_w_g_t,
                                 keep_padded)

    return wrapper
