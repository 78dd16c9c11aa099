"""Fused K-step APPNP propagation: the whole power iteration in ONE
Pallas kernel.

Motivation (measured, v5e): one `spmm_pair_chunks` call carries
~160µs of per-call overhead (pipeline warmup/drain + XLA call
sequencing + HBM round-trip of H between calls) even inside a jitted
scan — which dominates small graphs (Cora: 200µs/step for a ~37µs
body) and is ~25% of an MS Academic step. Fusing all K iterations
leaves: edge arrays loaded once (VMEM-resident), H ping-ponging
between two VMEM buffers, α·H⁰ injected per iteration, and only
H⁰-in / H_K-out touching HBM.

Structure: grid = (niter [+1 for the adjoint's final add], n_mid/mps),
both dimensions sequential. Iteration k reads buffer R(k) and writes
W(k) with a strict parity alternation chosen so the LAST iteration
writes the kernel output; k = 0 reads the H⁰ input directly. Each
(k, i==0) step seeds W(k) with α·H⁰ — the fused α-mix.

Adjoint (SURVEY.md §3.3's Â_dropᵀ backward):

- eval mode (shared Â across iterations): K-step APPNP is SELF-ADJOINT
  up to transposition — ∂(H_K)/∂(H⁰)ᵀ g = the same fused kernel run on
  the transpose packing with H⁰ := g. (Unrolling
  H_K = B^K H⁰ + α Σ_{t<K} B^t H⁰ with B = (1-α)Â makes this identity
  immediate.)
- train mode (fresh mask per iteration): with H_{t+1} = A_t H_t + αH⁰,
  the cotangents are M_{s+1} = A_{K-1-s}ᵀ M_s (masks in REVERSE order,
  M_0 = g) and dH⁰ = α·Σ_{s<K} M_s + M_K — the same kernel loop plus an
  output ACCUMULATOR: out starts at α·g, adds α·M_k at the top of every
  later iteration, and adds the final M_K in one extra grid step
  (mode="adjoint"). Per-iteration masks are REGENERATED per layout from
  canonical edge ids (ops/hashrng.py), so forward and adjoint never
  gather weights across layouts.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ppnp_tpu.ops.pairchunks import PairChunks

__all__ = ["appnp_fused", "make_appnp_fused_grad"]

_VMEM_LIMIT_BYTES = 100 * 1024 * 1024


def _body(seg_bs_ref, mid_bd_ref, e_src_ref, e_w_ref, e_dst_ref,
          src_ref, dst_ref, cbuf, *, k, i, window, window_src, chunk,
          seg_per_mid, mids_per_step, align):
    """One grid step's worth of midchunks: dst_ref += A_w[block] @ src_ref.

    ``e_w_ref`` is this iteration's (1, chunk, sps) weight block.
    """
    mid = chunk * seg_per_mid
    sps = mids_per_step * seg_per_mid
    cols_e = jax.lax.broadcasted_iota(jnp.int32, (chunk, window_src), 1)
    rows_d = jax.lax.broadcasted_iota(jnp.int32, (window, mid), 0)
    for m in range(mids_per_step):  # static unroll
        for j in range(seg_per_mid):  # static unroll
            s = m * seg_per_mid + j
            bs = pl.multiple_of(seg_bs_ref[i * sps + s],
                                align or window_src)
            src = e_src_ref[0, :, s:s + 1]
            w = e_w_ref[0, :, s:s + 1]
            e = jnp.where(cols_e == src, w, 0.0)
            hs = src_ref[pl.ds(bs, window_src), :]
            cm = jnp.dot(e, hs, preferred_element_type=jnp.float32)
            cbuf[j * chunk:(j + 1) * chunk, :] = cm

        bd = pl.multiple_of(mid_bd_ref[i * mids_per_step + m],
                            align or window)
        dloc = e_dst_ref[m:m + 1, :]
        d_t = jnp.where(rows_d == dloc, 1.0, 0.0)
        contrib = jnp.dot(d_t, cbuf[:], preferred_element_type=jnp.float32)
        dst_ref[pl.ds(bd, window), :] += contrib


def _fused_kernel(seg_bs_ref, mid_bd_ref, e_src_ref, e_dst_ref, e_w_ref,
                  h0_ref, out_ref, hbuf, cbuf, *,
                  niter, alpha, mode, window, window_src, chunk,
                  seg_per_mid, mids_per_step, align):
    k = pl.program_id(0)
    i = pl.program_id(1)
    adjoint = mode == "adjoint"

    body = functools.partial(
        _body, seg_bs_ref, mid_bd_ref, e_src_ref, e_w_ref, e_dst_ref,
        k=k, i=i, window=window, window_src=window_src, chunk=chunk,
        seg_per_mid=seg_per_mid, mids_per_step=mids_per_step, align=align)

    # Buffer schedule. Iteration k writes W(k), reads W(k-1) (H⁰ at k=0).
    # forward: W(niter-1) must be out_ref → W(k) = out_ref iff
    #   (niter-1-k) is even.
    # adjoint: out_ref is the α-accumulator; M_k ping-pongs hbuf/out?
    #   No — adjoint needs BOTH M buffers distinct from the accumulator,
    #   so it reuses h0_ref? Inputs are read-only. Instead the adjoint
    #   allocates M in (hbuf, out-is-acc...) — see scratch wiring below:
    #   here hbuf is (2, n_pad, c) for the adjoint and (n_pad, c) for
    #   the forward.
    if not adjoint:
        out_parity = (niter - 1) % 2  # W(k) = out_ref iff k % 2 == this

        @pl.when(jnp.logical_and(k == 0, i == 0))
        def _():
            if out_parity == 0:
                out_ref[:] = alpha * h0_ref[:]
            else:
                hbuf[:] = alpha * h0_ref[:]

        @pl.when(jnp.logical_and(k > 0, i == 0))
        def _():
            # seed W(k) = α·H⁰
            @pl.when(k % 2 == out_parity)
            def _():
                out_ref[:] = alpha * h0_ref[:]

            @pl.when(k % 2 != out_parity)
            def _():
                hbuf[:] = alpha * h0_ref[:]

        @pl.when(k == 0)
        def _():
            if out_parity == 0:
                body(src_ref=h0_ref, dst_ref=out_ref, cbuf=cbuf)
            else:
                body(src_ref=h0_ref, dst_ref=hbuf, cbuf=cbuf)

        @pl.when(jnp.logical_and(k > 0, k % 2 == out_parity))
        def _():
            body(src_ref=hbuf, dst_ref=out_ref, cbuf=cbuf)

        @pl.when(jnp.logical_and(k > 0, k % 2 != out_parity))
        def _():
            body(src_ref=out_ref, dst_ref=hbuf, cbuf=cbuf)
        return

    # --- adjoint: M_{k+1} = A_kᵀ M_k (M in hbuf[0]/hbuf[1]),
    # out = α·(M_0 + … + M_{niter-1}) + M_niter; grid has niter+1 k's,
    # the last one only adds the final M into out.
    m_src = hbuf.at[0]
    m_dst = hbuf.at[1]

    @pl.when(jnp.logical_and(k == 0, i == 0))
    def _():
        out_ref[:] = alpha * h0_ref[:]   # α·M_0 (M_0 = g = h0 input)

    # seed M-destination with zeros at i == 0 (no α-injection in M chain)
    @pl.when(jnp.logical_and(k < niter, i == 0))
    def _():
        @pl.when(k % 2 == 0)
        def _():
            m_dst[:] = jnp.zeros_like(m_dst[:])

        @pl.when(k % 2 == 1)
        def _():
            m_src[:] = jnp.zeros_like(m_src[:])

    # α-accumulate M_k for k ≥ 1 (M_0 already seeded out above)
    @pl.when(jnp.logical_and(jnp.logical_and(k > 0, k < niter), i == 0))
    def _():
        @pl.when(k % 2 == 0)
        def _():
            out_ref[:] += alpha * m_src[:]   # M_k sits in hbuf[0]

        @pl.when(k % 2 == 1)
        def _():
            out_ref[:] += alpha * m_dst[:]   # M_k sits in hbuf[1]

    @pl.when(k == 0)
    def _():
        body(src_ref=h0_ref, dst_ref=m_dst, cbuf=cbuf)

    @pl.when(jnp.logical_and(jnp.logical_and(k > 0, k < niter),
                             k % 2 == 0))
    def _():
        body(src_ref=m_src, dst_ref=m_dst, cbuf=cbuf)

    @pl.when(jnp.logical_and(jnp.logical_and(k > 0, k < niter),
                             k % 2 == 1))
    def _():
        body(src_ref=m_dst, dst_ref=m_src, cbuf=cbuf)

    # final: out += M_niter (one extra k, body skipped)
    @pl.when(jnp.logical_and(k == niter, i == 0))
    def _():
        @pl.when(niter % 2 == 0)
        def _():
            out_ref[:] += m_src[:]

        @pl.when(niter % 2 == 1)
        def _():
            out_ref[:] += m_dst[:]


@functools.partial(jax.jit, static_argnames=(
    "alpha", "niter", "mode", "mids_per_step", "interpret"))
def appnp_fused(pc: PairChunks, h0: jnp.ndarray, *,
                alpha: float, niter: int,
                e_w_all: Optional[jnp.ndarray] = None,
                mode: str = "forward",
                mids_per_step: Optional[int] = None,
                interpret: Optional[bool] = None) -> jnp.ndarray:
    """K APPNP steps in one kernel (packed row order, padded shapes).

    ``e_w_all``: (n_iter_planes, CHUNK, n_seg) per-iteration weights
    with (1-α) and any dropout mask already applied; a single plane is
    broadcast across iterations. ``None`` uses (1-α)·pc.e_w.
    ``mode="adjoint"`` computes the train-mode VJP (see module doc) —
    pass the TRANSPOSE packing, the cotangent as ``h0``, and the mask
    planes in reverse iteration order.
    """
    if pc.n_rows_pad != pc.n_cols_pad:
        raise ValueError("fused propagation requires a square packing")
    if mids_per_step is None:
        mids_per_step = pc.mids_per_step
    if interpret is None:
        # Auto: compile on TPU-like backends, interpret on CPU (virtual
        # test mesh / multichip dryrun) — mirrors spmm_pair_chunks.
        interpret = jax.default_backend() == "cpu"
    if e_w_all is None:
        e_w_all = ((1.0 - alpha) * pc.e_w)[None]
    if e_w_all.shape[0] not in (1, niter):
        raise ValueError(
            f"e_w_all has {e_w_all.shape[0]} planes; need 1 (shared) "
            f"or niter={niter}")
    n_pad = pc.n_rows_pad
    chunk, spm = pc.chunk, pc.seg_per_mid
    mid, sps = pc.mid, mids_per_step * spm
    n_mid = pc.n_mid
    if n_mid % mids_per_step:
        raise ValueError(f"n_mid={n_mid} % mids_per_step={mids_per_step}")
    c = h0.shape[1]
    if h0.shape[0] != n_pad:
        h0 = jnp.pad(h0, ((0, n_pad - h0.shape[0]), (0, 0)))

    if not interpret:
        resident = (3 + (1 if mode == "adjoint" else 0)) * n_pad * c * 4 \
            + e_w_all.nbytes + pc.e_src.size * 4 + pc.e_dst.size * 4
        if resident > _VMEM_LIMIT_BYTES:
            raise ValueError(
                f"graph too large for the fused kernel "
                f"(~{resident >> 20}MiB resident); use per-step "
                f"spmm_pair_chunks or the sharded path")

    n_k = niter + (1 if mode == "adjoint" else 0)
    grid = (n_k, n_mid // mids_per_step)
    nw = e_w_all.shape[0]

    kernel = functools.partial(
        _fused_kernel, niter=niter, alpha=alpha, mode=mode,
        window=pc.window, window_src=pc.window_src, chunk=chunk,
        seg_per_mid=spm, mids_per_step=mids_per_step,
        align=pc.align or None)

    hbuf_shape = ((2, n_pad, c) if mode == "adjoint" else (n_pad, c))
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # seg_bs
            pl.BlockSpec(memory_space=pltpu.SMEM),   # mid_bd
            pl.BlockSpec((1, chunk, sps), lambda k, i: (0, 0, i),
                         memory_space=pltpu.VMEM),   # e_src (iter-const)
            pl.BlockSpec((mids_per_step, mid), lambda k, i: (i, 0),
                         memory_space=pltpu.VMEM),   # e_dst
            pl.BlockSpec((1, chunk, sps),
                         lambda k, i, _nw=nw, _ni=niter:
                         (jnp.minimum(k, _ni - 1) if _nw > 1 else 0,
                          0, i),
                         memory_space=pltpu.VMEM),   # e_w plane per iter
            pl.BlockSpec((n_pad, c), lambda k, i: (0, 0),
                         memory_space=pltpu.VMEM),   # h0, resident
        ],
        out_specs=pl.BlockSpec((n_pad, c), lambda k, i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, c), jnp.float32),
        scratch_shapes=[pltpu.VMEM(hbuf_shape, jnp.float32),
                        pltpu.VMEM((mid, c), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_BYTES),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_k * pc.n_seg * chunk
            * (pc.window_src + pc.window) * c,
            bytes_accessed=(n_k * pc.n_seg * chunk * 12
                            + 2 * n_pad * c * 4),
            transcendentals=0),
        interpret=interpret,
    )(pc.seg_bs, pc.mid_bd, pc.e_src[None], pc.e_dst, e_w_all, h0)
    return out


def make_appnp_fused_grad(pc: PairChunks, pc_t: PairChunks, *,
                          alpha: float, niter: int):
    """Differentiable fused propagation: h0 (+ optional per-iteration
    mask planes for BOTH packings) → H_K, with the adjoint running the
    fused kernel on the transpose packing (reverse mask order).

    ``f(h0, e_w_all, e_w_t_all)``; pass ``None`` planes for eval mode.
    Cotangents flow to ``h0`` only (Â and masks are fixed operators).
    """

    @jax.custom_vjp
    def f(h0, e_w_all, e_w_t_all, pc_, pc_t_):
        return appnp_fused(pc_, h0, alpha=alpha, niter=niter,
                           e_w_all=e_w_all)

    def fwd(h0, e_w_all, e_w_t_all, pc_, pc_t_):
        out = appnp_fused(pc_, h0, alpha=alpha, niter=niter,
                          e_w_all=e_w_all)
        return out, (e_w_all, e_w_t_all, pc_, pc_t_)

    def bwd(res, g):
        e_w_all, e_w_t_all, pc_, pc_t_ = res
        rev = (None if e_w_t_all is None
               else jnp.flip(e_w_t_all, axis=0))
        if rev is not None and rev.shape[0] > 1:
            dh0 = appnp_fused(pc_t_, g, alpha=alpha, niter=niter,
                              e_w_all=rev, mode="adjoint")
        else:
            # shared operator across iterations → self-adjoint form
            dh0 = appnp_fused(pc_t_, g, alpha=alpha, niter=niter,
                              e_w_all=rev)
        from ppnp_tpu.kernels.spmm import _zero_cotangent
        return (dh0,
                None if e_w_all is None else jnp.zeros_like(e_w_all),
                None if e_w_t_all is None else jnp.zeros_like(e_w_t_all),
                jax.tree.map(_zero_cotangent, pc_),
                jax.tree.map(_zero_cotangent, pc_t_))

    f.defvjp(fwd, bwd)

    def wrapper(h0, e_w_all=None, e_w_t_all=None):
        return f(h0, e_w_all, e_w_t_all, pc, pc_t)

    return wrapper
