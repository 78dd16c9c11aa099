"""Blocked (HBM-streaming) SpMM tests — Pallas interpreter mode on CPU.

Covers the ``ppnp_tpu.kernels.blocked`` row-block decomposition for
graphs whose H/out outgrow VMEM: forward vs scipy oracle, gradients vs
the dense operator, PPRPowerIteration backend="blocked" vs the XLA
backend, and train-mode dropout statistics.
"""

import functools
from unittest import mock

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from ppnp_tpu.data.synthetic import make_attributed_sbm
from ppnp_tpu.kernels import spmm as spmm_mod
from ppnp_tpu.kernels.blocked import (build_blocked_pair_chunks,
                                      spmm_blocked)
from ppnp_tpu.ops.normalize import calc_A_hat
from ppnp_tpu.ops.propagation import PPRPowerIteration
from ppnp_tpu.ops.sparse import edge_list_from_scipy

interp = functools.partial(spmm_mod.spmm_pair_chunks, interpret=True)


@pytest.fixture(autouse=True)
def _clear_caches():
    """XLA:CPU segfaults at compile time when hundreds of programs
    accumulate in one process (same mitigation as test_kernel.py)."""
    yield
    jax.clear_caches()


@pytest.fixture(scope="module")
def graph_setup():
    g = make_attributed_sbm(700, 4, 16, 4000, seed=3).standardize()
    a = calc_A_hat(g.adj_matrix)
    h = np.random.RandomState(0).randn(a.shape[0], 8).astype(np.float32)
    return a, h


def _pack_input(bpc, h):
    hp = np.asarray(h)[np.asarray(bpc.perm)] if bpc.perm is not None else h
    return jnp.asarray(np.pad(
        hp, ((0, bpc.n_pad - h.shape[0]), (0, 0))))


def _unpack_output(bpc, out, n):
    out = np.asarray(out)
    if bpc.iperm is not None:
        return out[np.asarray(bpc.iperm)]
    return out[:n]


def test_blocked_forward_matches_scipy(graph_setup):
    a, h = graph_setup
    n = a.shape[0]
    bpc = build_blocked_pair_chunks(a, rows_per_block=256,
                                    use_native="never")
    assert bpc.n_blocks > 1          # actually exercises the block scan
    assert bpc.hw < bpc.n_pad        # RCM keeps the window < the graph
    hp = _pack_input(bpc, h)
    with mock.patch.object(spmm_mod, "spmm_pair_chunks", interp):
        out = spmm_blocked(bpc, hp)
    ref = a @ h
    np.testing.assert_allclose(_unpack_output(bpc, out, n), ref,
                               rtol=1e-4, atol=1e-5)


def test_blocked_init_and_scale(graph_setup):
    a, h = graph_setup
    n = a.shape[0]
    bpc = build_blocked_pair_chunks(a, rows_per_block=256,
                                    use_native="never", with_adjoint=False)
    hp = _pack_input(bpc, h)
    init = 0.1 * hp
    with mock.patch.object(spmm_mod, "spmm_pair_chunks", interp):
        out = spmm_blocked(bpc, hp, init=init, scale=0.9)
    perm = np.asarray(bpc.perm)
    ap = (a[perm][:, perm]).tocsr()
    ref = 0.9 * (ap @ np.asarray(hp)[:n]) + 0.1 * np.asarray(hp)[:n]
    np.testing.assert_allclose(np.asarray(out)[:n], ref,
                               rtol=1e-4, atol=1e-5)


def test_blocked_grad_matches_dense(graph_setup):
    a, h = graph_setup
    bpc = build_blocked_pair_chunks(a, rows_per_block=256,
                                    use_native="never")
    hp = _pack_input(bpc, h)
    cot = jnp.asarray(np.random.RandomState(1).randn(
        bpc.n_pad, h.shape[1]).astype(np.float32))

    with mock.patch.object(spmm_mod, "spmm_pair_chunks", interp):
        gr = jax.grad(lambda x: jnp.vdot(spmm_blocked(bpc, x), cot))(hp)
    perm = np.asarray(bpc.perm)
    n = a.shape[0]
    ap = (a[perm][:, perm]).tocsr()
    ref = np.zeros_like(np.asarray(hp))
    ref[:n] = ap.T @ np.asarray(cot)[:n]
    np.testing.assert_allclose(np.asarray(gr), ref, rtol=1e-4, atol=1e-4)


def test_blocked_propagation_matches_xla_backend(graph_setup):
    a, h = graph_setup
    n = a.shape[0]
    bpc = build_blocked_pair_chunks(a, rows_per_block=256,
                                    use_native="never")
    edges = edge_list_from_scipy(a)
    prop_ref = PPRPowerIteration(edges=edges, alpha=0.1, niter=10)
    prop_blk = PPRPowerIteration(edges=edges, pair_chunks=bpc,
                                 alpha=0.1, niter=10, backend="blocked")
    with mock.patch.object(spmm_mod, "spmm_pair_chunks", interp):
        z_blk = prop_blk(jnp.asarray(h), train=False)
    z_ref = prop_ref(jnp.asarray(h), train=False)
    np.testing.assert_allclose(np.asarray(z_blk), np.asarray(z_ref)[:n],
                               rtol=1e-4, atol=1e-4)


def test_blocked_train_dropout_statistics(graph_setup):
    """Train mode: fresh per-step id-keyed masks; the kept-edge scaling
    1/(1-p) keeps the propagation unbiased in expectation."""
    a, h = graph_setup
    n = a.shape[0]
    bpc = build_blocked_pair_chunks(a, rows_per_block=256,
                                    use_native="never")
    edges = edge_list_from_scipy(a)
    prop = PPRPowerIteration(edges=edges, pair_chunks=bpc, alpha=0.1,
                             niter=1, drop_prob=0.5, backend="blocked")
    hj = jnp.asarray(h)
    with mock.patch.object(spmm_mod, "spmm_pair_chunks", interp):
        # One compile, many keys: trace once with the key as an argument.
        f = jax.jit(lambda k: prop(hj, key=k, train=True))
        zs = [np.asarray(f(jax.random.PRNGKey(s))) for s in range(18)]
        z_eval = np.asarray(prop(hj, train=False))
    # Different keys give different propagations...
    assert not np.allclose(zs[0], zs[1])
    # ...whose mean approaches the eval propagation (unbiased masks).
    mean = np.mean(zs, axis=0)
    err = np.abs(mean - z_eval).max() / np.abs(z_eval).max()
    assert err < 0.25, err


def test_blocked_small_graph_single_block():
    """A graph smaller than one block degenerates to one full window."""
    g = make_attributed_sbm(120, 3, 8, 500, seed=1).standardize()
    a = calc_A_hat(g.adj_matrix)
    n = a.shape[0]
    bpc = build_blocked_pair_chunks(a, rows_per_block=256,
                                    use_native="never", with_adjoint=False)
    assert bpc.n_blocks == 1
    h = np.random.RandomState(0).randn(n, 4).astype(np.float32)
    hp = _pack_input(bpc, h)
    with mock.patch.object(spmm_mod, "spmm_pair_chunks", interp):
        out = spmm_blocked(bpc, hp)
    np.testing.assert_allclose(_unpack_output(bpc, out, n), a @ h,
                               rtol=1e-4, atol=1e-5)


def test_blocked_requires_aligned_blocks(graph_setup):
    a, _ = graph_setup
    with pytest.raises(ValueError, match="sublane"):
        build_blocked_pair_chunks(a, rows_per_block=100)


def test_blocked_id_masks_match_forward_and_transpose(graph_setup):
    """Id-keyed dropout must draw the SAME mask for an edge in the
    forward and transpose packings, including when the caller forwards
    edge_ids explicitly (the orientation is flipped for the transpose)."""
    from ppnp_tpu.kernels.spmm import transfer_weights
    from ppnp_tpu.ops.dropout import edge_dropout_by_id

    a, _ = graph_setup
    bpc = build_blocked_pair_chunks(a, rows_per_block=256,
                                    use_native="never", edge_ids="direct")
    key = jax.random.PRNGKey(7)
    for b in range(bpc.n_blocks):
        pc_b = jax.tree.map(lambda x: x[b], bpc.pcs)
        pc_t_b = jax.tree.map(lambda x: x[b], bpc.pcs_t)
        w_f = edge_dropout_by_id(key, pc_b, 0.5)
        w_t = edge_dropout_by_id(key, pc_t_b, 0.5)
        # Transfer the forward mask onto the transpose layout: it must
        # equal the transpose packing's own id-regenerated mask.
        w_t_ref = transfer_weights(w_f, bpc.w_perms[b], pc_b.chunk)
        np.testing.assert_allclose(np.asarray(w_t), np.asarray(w_t_ref),
                                   rtol=1e-6, atol=1e-6)


def test_blocked_end_to_end_training():
    """Full train_model through the blocked backend (interpret mode):
    builders-style construction, fused epoch chunks, grads through the
    per-block adjoints, early-stopping eval — loss must decrease."""
    from ppnp_tpu.train import train_model

    g = make_attributed_sbm(300, 3, 24, 1500, seed=2).standardize()
    a = calc_A_hat(g.adj_matrix)
    bpc = build_blocked_pair_chunks(a, rows_per_block=128,
                                    use_native="never")
    prop = PPRPowerIteration(edges=edge_list_from_scipy(a), pair_chunks=bpc,
                             alpha=0.1, niter=3, drop_prob=0.3,
                             backend="blocked")
    with mock.patch.object(spmm_mod, "spmm_pair_chunks", interp):
        params, res = train_model(
            g, prop, hidden_units=[16], drop_prob=0.3, seed=0,
            idx_split_args={"ntrain_per_class": 8, "nstopping": 40,
                            "nknown": 150, "seed": 1},
            stopping_args={"max_epochs": 8, "patience": 8},
            epoch_chunk=4, print_interval=0)
    assert 0.0 <= res["early_stopping"]["accuracy"] <= 1.0
    assert res["valtest"]["accuracy"] > 0.3  # learned something in 8 epochs
    assert np.isfinite(res["runtime"])


def test_blocked_auto_geometry_matches_scipy(graph_setup):
    """geometry="auto" tunes on a representative block sub-operator and
    the pick must (a) be a valid packing — forward matches scipy — and
    (b) differ from nothing: the model runs on the (r × hw) block shape
    the packer sees (VERDICT r2 item 6)."""
    a, h = graph_setup
    n = a.shape[0]
    bpc = build_blocked_pair_chunks(a, rows_per_block=256,
                                    geometry="auto", c=8,
                                    use_native="never")
    assert bpc.n_blocks > 1
    hp = _pack_input(bpc, h)
    with mock.patch.object(spmm_mod, "spmm_pair_chunks", interp):
        out = spmm_blocked(bpc, hp)
    np.testing.assert_allclose(_unpack_output(bpc, out, n), a @ h,
                               rtol=1e-4, atol=1e-5)


def test_blocked_auto_geometry_explicit_override(graph_setup):
    """Explicit pack kwargs override the per-block model's pick."""
    a, _ = graph_setup
    bpc = build_blocked_pair_chunks(a, rows_per_block=256,
                                    geometry="auto", chunk=8,
                                    with_adjoint=False,
                                    use_native="never")
    assert bpc.pcs.chunk == 8


def test_blocked_unknown_geometry_rejected(graph_setup):
    a, _ = graph_setup
    with pytest.raises(ValueError, match="unknown geometry"):
        build_blocked_pair_chunks(a, rows_per_block=256,
                                  geometry="fastest")
