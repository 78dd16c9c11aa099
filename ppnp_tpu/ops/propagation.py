"""Power-iteration PPR propagation (APPNP) — the framework's core operator.

Reference analog: ``ppnp/pytorch/propagation.py::PPRPowerIteration`` (~L45,
SURVEY.md §3.3): ``H ← (1-α)·Â_drop·H + α·H⁰`` repeated K times, with a
fresh edge-dropout mask on Â's values at every iteration during training.

TPU-native design decisions (vs the reference's torch.sparse loop):

- Â lives on device as a static-shape, dst-sorted :class:`EdgeList`
  (and optionally row-blocked ELL for the Pallas kernel).
- SpMM = row gather + ``segment_sum`` — both compile to efficient TPU
  code under XLA and are trivially differentiable; the Pallas kernel
  (``ppnp_tpu.kernels.spmm``) is a drop-in faster backend.
- The K-step loop is a ``lax.scan`` with PRNG keys threaded as scan xs,
  so the whole propagation is one fused XLA computation with no Python
  in the hot path.
- ``idx`` selection happens after propagation (the reference's semantics:
  the MLP and propagation always run over all n nodes — SURVEY.md §3.2).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from ppnp_tpu.ops.dropout import (dropout, edge_dropout,
                                  edge_dropout_by_id,
                                  edge_dropout_by_id_grouped)
from ppnp_tpu.ops.sparse import EdgeList

__all__ = ["spmm_edge_list", "spmm", "PPRPowerIteration",
           "propagate_grouped"]


def spmm_edge_list(edges: EdgeList, h: jnp.ndarray,
                   w: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Â @ H via gather + segment-sum over the padded edge list.

    ``w`` overrides the stored edge values (used for per-iteration edge
    dropout). Padding edges have w == 0 so they contribute nothing.
    """
    if w is None:
        w = edges.w
    gathered = jnp.take(h, edges.src, axis=0) * w[:, None]
    return jax.ops.segment_sum(
        gathered, edges.dst, num_segments=edges.n_rows,
        indices_are_sorted=True)


def spmm(edges: EdgeList, h: jnp.ndarray,
         w: Optional[jnp.ndarray] = None,
         pair_chunks=None,
         backend: str = "xla") -> jnp.ndarray:
    """Backend-dispatching SpMM: 'xla' (gather+segsum) or 'pallas'
    (the PairChunks MXU kernel — see ppnp_tpu.kernels.spmm)."""
    if backend == "pallas":
        if pair_chunks is None:
            raise ValueError("pallas backend requires pair_chunks")
        if w is not None:
            raise ValueError(
                "pallas backend takes per-iteration weights via the "
                "kernel's e_w argument, not the EdgeList w")
        from ppnp_tpu.kernels.spmm import spmm_pair_chunks
        return spmm_pair_chunks(pair_chunks, h)
    return spmm_edge_list(edges, h, w)


@struct.dataclass
class PPRPowerIteration:
    """APPNP propagation operator: K steps of H ← (1-α)ÂH + αH⁰.

    A registered pytree so it can be passed straight into jitted train
    steps; α/K/dropout/backend are static aux data.
    """

    edges: EdgeList
    # backend="pallas": PairChunks (+ transpose packing / slot perm);
    # backend="blocked": a kernels.blocked.BlockedPairChunks in
    # pair_chunks (it carries its own adjoint packings).
    pair_chunks: Optional[object] = None
    pair_chunks_t: Optional[object] = None  # transpose packing (backward)
    w_perm: Optional[jnp.ndarray] = None    # slot perm pc→pc_t weights
    alpha: float = struct.field(pytree_node=False, default=0.1)
    niter: int = struct.field(pytree_node=False, default=10)
    drop_prob: float = struct.field(pytree_node=False, default=0.5)
    backend: str = struct.field(pytree_node=False, default="xla")

    @property
    def n_rows(self) -> int:
        return self.edges.n_rows

    def propagate(self, h0: jnp.ndarray, *, key: Optional[jax.Array] = None,
                  train: bool = False) -> jnp.ndarray:
        """Run K power-iteration steps over all n rows of ``h0``."""
        apply_drop = bool(train and self.drop_prob > 0.0 and key is not None)
        one_minus_alpha = 1.0 - self.alpha

        if self.backend == "pallas":
            return self._propagate_pallas(h0, key=key, apply_drop=apply_drop)
        if self.backend == "blocked":
            return self._propagate_blocked(h0, key=key,
                                           apply_drop=apply_drop)
        if self.backend == "fused":
            return self._propagate_fused(h0, key=key, apply_drop=apply_drop)

        alpha_h0 = self.alpha * h0
        if apply_drop:
            keys = jax.random.split(key, self.niter)

            def step(h, k):
                w = edge_dropout(k, self.edges.w, self.drop_prob)
                ah = spmm_edge_list(self.edges, h, w)
                return one_minus_alpha * ah + alpha_h0, None

            h, _ = jax.lax.scan(step, h0, keys)
        else:
            def step(h, _):
                ah = spmm(self.edges, h, backend="xla")
                return one_minus_alpha * ah + alpha_h0, None

            h, _ = jax.lax.scan(step, h0, None, length=self.niter)
        return h

    def _propagate_pallas(self, h0: jnp.ndarray, *, key, apply_drop):
        """Pallas path: each power-iteration step is ONE fused kernel.

        ``out = A_w @ H + α·H⁰`` with (1-α) folded into the edge weights
        and α·H⁰ seeding the output accumulator inside the kernel (no
        separate XLA mix op). The scan carries the row-padded, packing-
        ordered H; the packing's row permutation (if any) and padding are
        applied once outside the loop.
        """
        pc = self.pair_chunks
        one_minus_alpha = 1.0 - self.alpha
        n = h0.shape[0]

        if pc.perm is not None:
            hp = jnp.take(h0, pc.perm, axis=0)
        else:
            hp = h0
        if pc.n_rows_pad != pc.n_cols_pad:
            raise ValueError("pallas propagation requires a square packing")
        hp = jnp.pad(hp, ((0, pc.n_rows_pad - n), (0, 0)))
        init = self.alpha * hp  # α·H⁰, padded, packed order

        pc_t = self.pair_chunks_t
        if pc_t is not None:
            # Differentiable pallas SpMM: backward runs the transpose
            # packing with the same (possibly masked) edge weights.
            from ppnp_tpu.kernels.spmm import make_spmm_grad
            spmm_fn = make_spmm_grad(pc, pc_t, self.w_perm,
                                     keep_padded=True)
        else:
            from ppnp_tpu.kernels.spmm import spmm_pair_chunks

            def spmm_fn(h, w, init, e_w_t=None):
                return spmm_pair_chunks(pc, h, w, init=init,
                                        assume_permuted=True,
                                        keep_padded=True)

        use_ids = (pc.eid_hi is not None and pc_t is not None
                   and pc_t.eid_hi is not None)

        if apply_drop:
            keys = jax.random.split(key, self.niter)

            def step(h, k):
                # Fresh per-iteration mask on the packed edge weights
                # (padding slots are 0 and stay 0 under any mask). With
                # edge-id-keyed masks the transpose packing regenerates
                # the identical mask for the backward pass — no per-step
                # cross-layout weight gather (ops/hashrng.py).
                if use_ids:
                    w = one_minus_alpha * edge_dropout_by_id(
                        k, pc, self.drop_prob)
                    w_t = one_minus_alpha * edge_dropout_by_id(
                        k, pc_t, self.drop_prob)
                    return spmm_fn(h, w, init, w_t), None
                w = one_minus_alpha * edge_dropout(k, pc.e_w,
                                                   self.drop_prob)
                return spmm_fn(h, w, init), None

            hp, _ = jax.lax.scan(step, hp, keys)
        else:
            w_scaled = one_minus_alpha * pc.e_w
            w_t_scaled = (one_minus_alpha * pc_t.e_w
                          if pc_t is not None else None)

            def step(h, _):
                return spmm_fn(h, w_scaled, init, w_t_scaled), None

            hp, _ = jax.lax.scan(step, hp, None, length=self.niter)

        hp = hp[:n]
        if pc.iperm is not None:
            hp = jnp.take(hp, pc.iperm, axis=0)
        return hp

    def _propagate_blocked(self, h0: jnp.ndarray, *, key, apply_drop):
        """HBM-streaming path for graphs whose H/out outgrow VMEM.

        Each step scans the row blocks of ``kernels.blocked``: slice the
        block's H window from HBM, run the fused MXU kernel, stitch the
        block outputs (module docstring of ``ppnp_tpu.kernels.blocked``).
        """
        from ppnp_tpu.kernels.blocked import spmm_blocked

        bpc = self.pair_chunks
        one_minus_alpha = 1.0 - self.alpha
        n = h0.shape[0]

        hp = jnp.take(h0, bpc.perm, axis=0) if bpc.perm is not None else h0
        hp = jnp.pad(hp, ((0, bpc.n_pad - n), (0, 0)))
        init = self.alpha * hp  # α·H⁰, padded, packed order

        if apply_drop:
            keys = jax.random.split(key, self.niter)

            def step(h, k):
                return spmm_blocked(bpc, h, init=init, key=k,
                                    drop_prob=self.drop_prob,
                                    scale=one_minus_alpha), None

            hp, _ = jax.lax.scan(step, hp, keys)
        else:
            def step(h, _):
                return spmm_blocked(bpc, h, init=init,
                                    scale=one_minus_alpha), None

            hp, _ = jax.lax.scan(step, hp, None, length=self.niter)

        hp = hp[:n]
        if bpc.iperm is not None:
            hp = jnp.take(hp, bpc.iperm, axis=0)
        return hp

    def _propagate_fused(self, h0: jnp.ndarray, *, key, apply_drop):
        """Single-dispatch path: ALL K steps in ONE Pallas kernel.

        ``kernels/fused.py``: the edge arrays load into VMEM once, H
        ping-pongs between two VMEM buffers, only H⁰-in / H_K-out touch
        HBM. Removes the ~160µs per-kernel-call overhead K−1 times —
        the dominant cost of a small-graph SERVING forward (predict /
        retrieval embedding build), where one forward is one dispatch
        chain rather than an amortized epoch chunk. Training-throughput
        measurements show it identical to the per-step scan once chunk
        dispatch is amortized (docs/PERFORMANCE.md), so the scan stays
        the training default; this backend is the latency path.
        """
        from ppnp_tpu.kernels.fused import (appnp_fused,
                                            make_appnp_fused_grad)

        pc, pc_t = self.pair_chunks, self.pair_chunks_t
        if pc is None:
            raise ValueError("fused backend requires pair_chunks")
        one_minus_alpha = 1.0 - self.alpha
        n = h0.shape[0]
        hp = jnp.take(h0, pc.perm, axis=0) if pc.perm is not None else h0
        # Pad BEFORE the custom_vjp: its adjoint returns an n_pad-row
        # cotangent, which must match the primal's shape.
        hp = jnp.pad(hp, ((0, pc.n_rows_pad - n), (0, 0)))

        if apply_drop:
            use_ids = (pc.eid_hi is not None and pc_t is not None
                       and pc_t.eid_hi is not None)
            if not use_ids:
                raise ValueError(
                    "fused train mode requires id-keyed packings "
                    "(forward + transpose with edge ids) so per-"
                    "iteration masks regenerate in the adjoint")
            keys = jax.random.split(key, self.niter)
            planes = one_minus_alpha * jax.vmap(
                lambda k: edge_dropout_by_id(k, pc, self.drop_prob))(keys)
            planes_t = one_minus_alpha * jax.vmap(
                lambda k: edge_dropout_by_id(k, pc_t,
                                             self.drop_prob))(keys)
            f = make_appnp_fused_grad(pc, pc_t, alpha=self.alpha,
                                      niter=self.niter)
            hp = f(hp, planes, planes_t)
        elif pc_t is not None:
            f = make_appnp_fused_grad(pc, pc_t, alpha=self.alpha,
                                      niter=self.niter)
            hp = f(hp)
        else:
            hp = appnp_fused(pc, hp, alpha=self.alpha, niter=self.niter)

        hp = hp[:n]
        if pc.iperm is not None:
            hp = jnp.take(hp, pc.iperm, axis=0)
        return hp

    def __call__(self, h_local: jnp.ndarray, idx: Optional[jnp.ndarray] = None,
                 *, key: Optional[jax.Array] = None,
                 train: bool = False) -> jnp.ndarray:
        """Propagate local predictions; select ``idx`` rows afterwards."""
        h = self.propagate(h_local, key=key, train=train)
        if idx is not None:
            h = jnp.take(h, idx, axis=0)
        return h


def propagate_grouped(prop: PPRPowerIteration, h0: jnp.ndarray,
                      keys: Optional[jax.Array] = None, *,
                      train: bool = False, groups: int = 1) -> jnp.ndarray:
    """K power-iteration steps over G seed groups stacked along lanes.

    Seed-batched training (``ppnp_tpu.multiseed``): ``h0`` is
    (n, G·c) with seed g's local logits in lanes [g·c, (g+1)·c), and
    ``keys`` is a (G,)-stacked PRNG key array — each seed's edge-dropout
    mask stream derives from its own key EXACTLY as the single-seed
    ``prop.propagate(h0_g, key=keys[g])`` would, so per-seed results
    match the sequential path (bit-exactly in interpret mode; at the
    MXU's default-precision level on chip).

    The kernel cost story: the pallas kernel is MXU-issue-bound and flat
    in lane count to 128, so G seeds at c lanes each cost ~one
    single-seed call (kernels/spmm.py ``_spmm_kernel_grouped``) — the
    per-seed masks ride as per-group VPU multiplies.

    Eval mode (no dropout) needs no grouped kernel at all: every seed
    shares Â's weights, so the stacked ``h0`` goes through the ordinary
    propagate path unchanged.
    """
    apply_drop = bool(train and prop.drop_prob > 0.0 and keys is not None)
    if not apply_drop:
        return prop.propagate(h0, train=False)
    if prop.backend == "pallas":
        return _propagate_grouped_pallas(prop, h0, keys, groups)
    if prop.backend == "xla":
        return _propagate_grouped_xla(prop, h0, keys, groups)
    raise NotImplementedError(
        f"grouped train-mode propagation: backend {prop.backend!r} "
        "(use 'pallas' or 'xla')")


def _propagate_grouped_xla(prop, h0, keys, groups):
    edges = prop.edges
    c_total = h0.shape[1]
    cg = c_total // groups
    one_minus_alpha = 1.0 - prop.alpha
    alpha_h0 = prop.alpha * h0
    # (G, niter, 2) -> (niter, G, 2): per-seed streams split exactly as
    # the single-seed path does, stacked per iteration for the scan.
    kiter = jnp.stack([jax.random.split(keys[g], prop.niter)
                       for g in range(groups)], axis=1)

    def step(h, ks):
        w = jax.vmap(lambda k: edge_dropout(k, edges.w, prop.drop_prob))(ks)
        gathered = jnp.take(h, edges.src, axis=0)           # (nnz, G·cg)
        gm = (gathered.reshape(-1, groups, cg)
              * w.T[:, :, None]).reshape(-1, c_total)
        ah = jax.ops.segment_sum(gm, edges.dst,
                                 num_segments=edges.n_rows,
                                 indices_are_sorted=True)
        return one_minus_alpha * ah + alpha_h0, None

    h, _ = jax.lax.scan(step, h0, kiter)
    return h


def _propagate_grouped_pallas(prop, h0, keys, groups):
    from ppnp_tpu.kernels.spmm import make_spmm_grad_grouped

    pc, pc_t = prop.pair_chunks, prop.pair_chunks_t
    if pc_t is None or pc.eid_hi is None or pc_t.eid_hi is None:
        raise ValueError("grouped pallas propagation requires id-keyed "
                         "forward+transpose packings (edge_ids)")
    one_minus_alpha = 1.0 - prop.alpha
    n = h0.shape[0]
    hp = jnp.take(h0, pc.perm, axis=0) if pc.perm is not None else h0
    if pc.n_rows_pad != pc.n_cols_pad:
        raise ValueError("pallas propagation requires a square packing")
    hp = jnp.pad(hp, ((0, pc.n_rows_pad - n), (0, 0)))
    init = prop.alpha * hp

    spmm_fn = make_spmm_grad_grouped(pc, pc_t, prop.w_perm,
                                     keep_padded=True)
    kiter = jnp.stack([jax.random.split(keys[g], prop.niter)
                       for g in range(groups)], axis=1)  # (niter, G, 2)

    def masks(ks, packing):
        return one_minus_alpha * edge_dropout_by_id_grouped(
            ks, packing, prop.drop_prob)

    def step(h, ks):
        w_g = masks(ks, pc)
        w_g_t = masks(ks, pc_t)
        return spmm_fn(h, w_g, init, w_g_t), None

    hp, _ = jax.lax.scan(step, hp, kiter)
    hp = hp[:n]
    if pc.iperm is not None:
        hp = jnp.take(hp, pc.iperm, axis=0)
    return hp
