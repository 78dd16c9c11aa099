"""Pallas TPU SpMM over PairChunks: out = A @ H with A sparse.

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

HBM traffic per call ≈ edge stream (~12B/edge-slot) + H load + out store —
the speed-of-light bytes from BASELINE.md — with all per-edge work done as
vectorized VPU compares and MXU matmuls (no scalar loops).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ppnp_tpu.ops.pairchunks import PairChunks

__all__ = ["spmm_pair_chunks", "transfer_weights", "make_spmm_grad"]


def _spmm_kernel(seg_bs_ref, mid_bd_ref, e_src_ref, e_w_ref, e_dst_ref,
                 h_ref, out_ref, cbuf,
                 *, window, window_src, chunk, seg_per_mid, mids_per_step):
    mid = chunk * seg_per_mid
    cols_e = jax.lax.broadcasted_iota(jnp.int32, (chunk, window_src), 1)
    rows_d = jax.lax.broadcasted_iota(jnp.int32, (window, mid), 0)
    pid = pl.program_id(0)

    @pl.when(pid == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    for m in range(mids_per_step):  # static unroll
        m_glob = pid * mids_per_step + m
        for j in range(seg_per_mid):  # static unroll
            s = m * seg_per_mid + j
            s_glob = m_glob * seg_per_mid + j
            bs = pl.multiple_of(seg_bs_ref[s_glob], window_src)
            src = e_src_ref[:, s:s + 1]           # (CHUNK, 1), static lane
            w = e_w_ref[:, s:s + 1]               # (CHUNK, 1)
            e = jnp.where(cols_e == src, w, 0.0)  # (CHUNK, W_src)
            hs = h_ref[pl.ds(bs, window_src), :]  # (W_src, c)
            cm = jnp.dot(e, hs, preferred_element_type=jnp.float32)
            cbuf[j * chunk:(j + 1) * chunk, :] = cm

        bd = pl.multiple_of(mid_bd_ref[m_glob], window)
        dloc = e_dst_ref[m:m + 1, :]              # (1, MID), static sublane
        d_t = jnp.where(rows_d == dloc, 1.0, 0.0)  # (W, MID)
        contrib = jnp.dot(d_t, cbuf[:],
                          preferred_element_type=jnp.float32)  # (W, c)
        out_ref[pl.ds(bd, window), :] += contrib


@functools.partial(jax.jit, static_argnames=("mids_per_step", "interpret"))
def spmm_pair_chunks(pc: PairChunks, h: jnp.ndarray,
                     e_w: jnp.ndarray | None = None,
                     mids_per_step: int = 8,
                     interpret: bool = False) -> jnp.ndarray:
    """A @ H through the Pallas kernel. Returns (n_rows, c) unpadded.

    ``e_w`` optionally overrides the packed edge weights (same
    (CHUNK, n_seg) layout) — used for per-iteration edge dropout.
    """
    if e_w is None:
        e_w = pc.e_w
    window, chunk, spm = pc.window, pc.chunk, pc.seg_per_mid
    mid = pc.mid
    n_mid = pc.n_mid
    if n_mid % mids_per_step:
        raise ValueError(f"n_mid={n_mid} not divisible by "
                         f"mids_per_step={mids_per_step}")
    segs_per_step = mids_per_step * spm
    c = h.shape[1]
    # H padded to the column grid of A.
    if h.shape[0] < pc.n_cols_pad:
        h = jnp.pad(h, ((0, pc.n_cols_pad - h.shape[0]), (0, 0)))

    grid = (n_mid // mids_per_step,)
    kernel = functools.partial(
        _spmm_kernel, window=window, window_src=pc.window_src, chunk=chunk,
        seg_per_mid=spm, mids_per_step=mids_per_step)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # seg_bs, mid_bd live in SMEM, unblocked
        grid=grid,
        in_specs=[
            pl.BlockSpec((chunk, segs_per_step), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, segs_per_step), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((mids_per_step, mid), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((pc.n_cols_pad, c), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((pc.n_rows_pad, c), lambda i, *_: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((mid, c), jnp.float32)],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((pc.n_rows_pad, c), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            # H and out are both fully VMEM-resident; the default scoped
            # limit is 16MB but v5e has 128MB of VMEM.
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=4 * pc.n_seg * chunk * window * c,
            bytes_accessed=(pc.n_seg * chunk * 12 + pc.n_cols_pad * c * 4
                            + pc.n_rows_pad * c * 4),
            transcendentals=0),
        interpret=interpret,
    )(pc.seg_bs, pc.mid_bd, pc.e_src, e_w, pc.e_dst, h)
    return out[:pc.n_rows]


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


def make_spmm_grad(pc: PairChunks, pc_t: PairChunks, perm: jnp.ndarray):
    """Differentiable SpMM: forward through ``pc``, backward through the
    transpose packing ``pc_t`` with the SAME (possibly dropout-masked)
    edge weights — exactly torch autograd's Â_dropᵀ backward in the
    reference (SURVEY.md §3.3).

    Returns ``f(h, e_w) -> A_w @ h`` with a custom VJP. The edge-weight
    cotangent is not propagated (Â is a fixed operator; dropout masks are
    non-differentiable), matching the reference where Â requires no grad.
    """

    @jax.custom_vjp
    def f(h, e_w):
        return spmm_pair_chunks(pc, h, e_w)

    def fwd(h, e_w):
        return spmm_pair_chunks(pc, h, e_w), (e_w, h.shape[0])

    def bwd(res, g):
        e_w, h_rows = res
        e_w_t = transfer_weights(e_w, perm, pc.chunk)
        dh = spmm_pair_chunks(pc_t, g, e_w_t)  # (pc.n_cols, c)
        if dh.shape[0] < h_rows:
            dh = jnp.pad(dh, ((0, h_rows - dh.shape[0]), (0, 0)))
        elif dh.shape[0] > h_rows:
            dh = dh[:h_rows]
        return dh, jnp.zeros_like(e_w)

    f.defvjp(fwd, bwd)
    return f
