"""Seed-batched (grouped) SpMM: G weightings of one sparse pattern in
one kernel call — interpreter mode on CPU (SURVEY.md §4).

The grouped kernel backs multi-seed training (ppnp_tpu.multiseed):
G seeds' logits stack along the MXU lane axis and each seed's
edge-dropout mask applies as a per-group VPU multiply, so the MXU
issue count of ONE call covers all G seeds.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from ppnp_tpu.kernels.spmm import (make_spmm_grad, make_spmm_grad_grouped,
                                   spmm_pair_chunks,
                                   spmm_pair_chunks_grouped,
                                   stack_group_weights)
from ppnp_tpu.ops.pairchunks import (packer_for, pair_chunks_from_scipy,
                                     slot_permutation, transpose_ids,
                                     transpose_pair)


@pytest.fixture(autouse=True)
def _clear_caches_per_test():
    # Same guard as test_kernel.py: XLA:CPU segfaults when hundreds of
    # compiled programs accumulate in one process.
    yield
    jax.clear_caches()


def _setup(n=300, density=0.02, cg=8, groups=3, seed=0):
    rng = np.random.RandomState(seed)
    a = sp.random(n, n, density=density, random_state=rng, format="csr",
                  dtype=np.float32)
    pc = pair_chunks_from_scipy(a)
    h = jnp.asarray(rng.randn(n, groups * cg).astype(np.float32))
    # G independent weight sets: per-group random masks of the packed
    # weights (dropout-shaped: zeros + rescaled survivors).
    ws = [jnp.asarray((rng.rand(*np.asarray(pc.e_w).shape) > 0.4)
                      * np.asarray(pc.e_w) * 2.0) for _ in range(groups)]
    return a, pc, h, ws, cg, groups


def test_grouped_matches_per_group_calls():
    """Grouped output is BIT-IDENTICAL to G separate single-group calls
    (the per-edge product reassociation (1·h)·w vs (w·1)·h is a single
    rounding either way)."""
    _, pc, h, ws, cg, groups = _setup()
    out = spmm_pair_chunks_grouped(pc, h, stack_group_weights(ws, pc),
                                   interpret=True)
    for g in range(groups):
        ref = spmm_pair_chunks(pc, h[:, g * cg:(g + 1) * cg], e_w=ws[g],
                               interpret=True)
        np.testing.assert_array_equal(np.asarray(out[:, g * cg:(g + 1) * cg]),
                                      np.asarray(ref))


def test_grouped_matches_scipy():
    a, pc, h, ws, cg, groups = _setup(n=257, density=0.015, cg=4, groups=4,
                                      seed=3)
    out = spmm_pair_chunks_grouped(pc, h, stack_group_weights(ws, pc),
                                   interpret=True)
    # scipy oracle per group: rebuild the masked operator from slot coords
    from ppnp_tpu.ops.pairchunks import _slot_coords
    rows, cols, valid = _slot_coords(pc)
    for g in range(groups):
        w_flat = np.asarray(ws[g]).T.reshape(-1)
        a_g = sp.coo_matrix(
            (w_flat[valid], (rows[valid], cols[valid])),
            shape=a.shape).tocsr()
        np.testing.assert_allclose(
            np.asarray(out[:, g * cg:(g + 1) * cg]),
            a_g @ np.asarray(h[:, g * cg:(g + 1) * cg]),
            rtol=1e-4, atol=1e-5)


def test_grouped_init_fuses_alpha_mix():
    _, pc, h, ws, cg, groups = _setup(seed=5)
    init = jnp.asarray(np.random.RandomState(9).randn(
        pc.n_rows_pad, groups * cg).astype(np.float32))
    out = spmm_pair_chunks_grouped(pc, h, stack_group_weights(ws, pc),
                                   init=init, interpret=True)
    base = spmm_pair_chunks_grouped(pc, h, stack_group_weights(ws, pc),
                                    interpret=True)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(base) + np.asarray(init[:pc.n_rows]),
                               rtol=1e-5, atol=1e-5)


def test_grouped_vjp_matches_per_group_grads():
    """d(loss)/dh through the grouped custom VJP equals the per-group
    VJP gradients on each lane slice."""
    # Mirror the production construction (builders.py): forward and
    # transpose packings share one layout/geometry, so chunk matches.
    rng = np.random.RandomState(7)
    n, cg, groups = 200, 4, 2
    a = sp.random(n, n, density=0.02, random_state=rng, format="csr",
                  dtype=np.float32)
    pc = packer_for("banded")(a, edge_ids="direct", device=False)
    pc_t = transpose_pair(a, layout="banded", device=False)
    perm = jnp.asarray(slot_permutation(pc, pc_t))
    h = jnp.asarray(rng.randn(n, groups * cg).astype(np.float32))
    ws = [jnp.asarray((rng.rand(*np.asarray(pc.e_w).shape) > 0.4)
                      * np.asarray(pc.e_w) * 2.0) for _ in range(groups)]
    ws_t = [jnp.asarray(
        (np.asarray(w).T.reshape(-1)[np.asarray(perm).clip(0)]
         * (np.asarray(perm) >= 0)).reshape(-1, pc_t.chunk).T)
        for w in ws]

    fg = make_spmm_grad_grouped(pc, pc_t, perm)
    f1 = make_spmm_grad(pc, pc_t, perm)

    def loss_grouped(hh):
        return jnp.sum(fg(hh, stack_group_weights(ws, pc), None,
                          stack_group_weights(ws_t, pc_t)) ** 2)

    g_grouped = jax.grad(loss_grouped)(h)
    for g in range(groups):
        hs = h[:, g * cg:(g + 1) * cg]

        def loss_single(hh, g=g):
            return jnp.sum(f1(hh, ws[g], None, ws_t[g]) ** 2)

        g_single = jax.grad(loss_single)(hs)
        np.testing.assert_allclose(
            np.asarray(g_grouped[:, g * cg:(g + 1) * cg]),
            np.asarray(g_single), rtol=1e-4, atol=1e-5)


def _small_geo():
    # Reduced unroll geometry (as dryrun_multichip packs): interpret-mode
    # tracing of the full TPU geometry inlines 512 dots per grid step.
    return dict(window=128, window_src=128, chunk=8, seg_per_mid=8,
                mids_per_step=4)


def _build_pallas_prop(n=220, density=0.02, niter=3, drop_prob=0.4,
                       seed=1):
    from ppnp_tpu.ops.propagation import PPRPowerIteration
    from ppnp_tpu.ops.sparse import edge_list_from_scipy

    rng = np.random.RandomState(seed)
    a = sp.random(n, n, density=density, random_state=rng, format="csr",
                  dtype=np.float32)
    geo = _small_geo()
    pc = packer_for("banded")(a, edge_ids="direct", reorder="rcm",
                              device=False, **geo)
    pc_t = transpose_pair(a, layout="banded", device=False,
                          perm=np.asarray(pc.perm), **geo)
    perm = jnp.asarray(slot_permutation(pc, pc_t))
    return PPRPowerIteration(
        edges=edge_list_from_scipy(a), pair_chunks=pc, pair_chunks_t=pc_t,
        w_perm=perm, alpha=0.1, niter=niter, drop_prob=drop_prob,
        backend="pallas"), a


@pytest.mark.parametrize("backend", ["xla", "pallas"])
def test_propagate_grouped_matches_per_seed(backend):
    """Grouped train-mode propagation == per-seed sequential propagate
    with the same keys (each seed's mask stream derives from its own
    key exactly as the single-seed path)."""
    from ppnp_tpu.ops.propagation import propagate_grouped

    prop, a = _build_pallas_prop()
    if backend == "xla":
        prop = prop.replace(backend="xla", pair_chunks=None,
                            pair_chunks_t=None, w_perm=None)
    n = a.shape[0]
    G, cg = 3, 4
    rng = np.random.RandomState(2)
    h = jnp.asarray(rng.randn(n, G * cg).astype(np.float32))
    keys = jax.random.split(jax.random.PRNGKey(0), G)

    out = propagate_grouped(prop, h, keys, train=True, groups=G)
    assert out.shape == (n, G * cg)
    for g in range(G):
        ref = prop.propagate(h[:, g * cg:(g + 1) * cg], key=keys[g],
                             train=True)
        np.testing.assert_allclose(np.asarray(out[:, g * cg:(g + 1) * cg]),
                                   np.asarray(ref), rtol=1e-5, atol=1e-6)


def test_propagate_grouped_eval_is_plain_stacked():
    """Eval mode shares Â's weights across seeds — grouped == the plain
    propagate on the stacked matrix AND == per-seed propagate."""
    from ppnp_tpu.ops.propagation import propagate_grouped

    prop, a = _build_pallas_prop(drop_prob=0.5)
    n = a.shape[0]
    G, cg = 2, 8
    h = jnp.asarray(np.random.RandomState(4).randn(n, G * cg)
                    .astype(np.float32))
    out = propagate_grouped(prop, h, None, train=False, groups=G)
    for g in range(G):
        ref = prop.propagate(h[:, g * cg:(g + 1) * cg], train=False)
        np.testing.assert_allclose(np.asarray(out[:, g * cg:(g + 1) * cg]),
                                   np.asarray(ref), rtol=1e-5, atol=1e-6)


def test_grouped_vjp_fallback_weight_transfer():
    """Without caller-supplied transpose weights the backward gathers
    them through the slot permutation (transfer_group_weights)."""
    rng = np.random.RandomState(11)
    n, cg, groups = 150, 4, 2
    a = sp.random(n, n, density=0.02, random_state=rng, format="csr",
                  dtype=np.float32)
    pc = packer_for("banded")(a, edge_ids="direct", device=False)
    pc_t = transpose_pair(a, layout="banded", device=False)
    perm = jnp.asarray(slot_permutation(pc, pc_t))
    h = jnp.asarray(rng.randn(n, groups * cg).astype(np.float32))
    ws = [jnp.asarray((rng.rand(*np.asarray(pc.e_w).shape) > 0.4)
                      * np.asarray(pc.e_w) * 2.0) for _ in range(groups)]
    fg = make_spmm_grad_grouped(pc, pc_t, perm)

    def loss(hh, with_t):
        e_w_g = stack_group_weights(ws, pc)
        return jnp.sum(fg(hh, e_w_g, None, None) ** 2)

    g_fallback = jax.grad(lambda hh: loss(hh, False))(h)
    # oracle: per-group dense math
    for g in range(groups):
        from ppnp_tpu.ops.pairchunks import _slot_coords
        rows, cols, valid = _slot_coords(pc)
        w_flat = np.asarray(ws[g]).T.reshape(-1)
        a_g = sp.coo_matrix((w_flat[valid], (rows[valid], cols[valid])),
                            shape=a.shape).tocsr()
        hs = np.asarray(h[:, g * cg:(g + 1) * cg])
        # loss = ||A_g hs||^2 -> grad = 2 A_gᵀ A_g hs
        ref = 2.0 * (a_g.T @ (a_g @ hs))
        np.testing.assert_allclose(
            np.asarray(g_fallback[:, g * cg:(g + 1) * cg]), ref,
            rtol=1e-3, atol=1e-4)
