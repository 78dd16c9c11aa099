"""Hierarchical ICI×DCN sharding tests on 8 virtual CPU devices.

VERDICT r4 item 1: the 2-axis mesh's two-level boundary exchange must
(a) agree with the unsharded oracle on a genuine 2×4 mesh, (b) reduce
bit-exactly to the flat 1-axis plan on the degenerate 1×N and N×1
meshes, and (c) demonstrably deduplicate DCN traffic at the slice
level (a row wanted by many chips of a remote slice crosses DCN once).
"""

import functools
from unittest import mock

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from ppnp_tpu.ops.normalize import calc_A_hat
from ppnp_tpu.ops.propagation import PPRPowerIteration
from ppnp_tpu.ops.sparse import edge_list_from_scipy
from ppnp_tpu.parallel.hier import (HierShardedPowerIteration,
                                    build_hier_pair_chunks,
                                    build_hier_sharded_graph)
from ppnp_tpu.parallel.mesh import make_hier_mesh, make_mesh
from ppnp_tpu.parallel.partition import build_sharded_graph
from ppnp_tpu.parallel.sharded import ShardedPowerIteration


@pytest.fixture(scope="module")
def setup(small_graph):
    a_hat = calc_A_hat(small_graph.adj_matrix)
    n = a_hat.shape[0]
    h0 = np.random.RandomState(0).randn(n, 16).astype(np.float32)
    oracle = PPRPowerIteration(edges=edge_list_from_scipy(a_hat), alpha=0.1,
                               niter=10)
    z_ref = np.asarray(oracle(jnp.asarray(h0), train=False))
    return a_hat, h0, z_ref


def _run_hier(a_hat, h0, n_slices, per_slice, niter=10, **kw):
    mesh = make_hier_mesh(n_slices, per_slice)
    hg = build_hier_sharded_graph(a_hat, n_slices, per_slice)
    prop = HierShardedPowerIteration(graph=hg, mesh=mesh, alpha=0.1,
                                     niter=niter, **kw)
    h0_pad = np.pad(h0, ((0, hg.n_pad - h0.shape[0]), (0, 0)))
    return prop, jnp.asarray(h0_pad)


@pytest.mark.parametrize("shape", [(2, 4), (4, 2), (2, 2), (8, 1), (1, 8)])
def test_hier_matches_unsharded(setup, shape):
    a_hat, h0, z_ref = setup
    D, I = shape
    if jax.device_count() < D * I:
        pytest.skip("not enough devices")
    prop, h0_pad = _run_hier(a_hat, h0, D, I)
    z = np.asarray(prop(h0_pad, train=False))[:h0.shape[0]]
    np.testing.assert_allclose(z, z_ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("shape", [(1, 8), (8, 1)])
def test_hier_degenerate_bitexact_vs_flat(setup, shape):
    """1×N and N×1 hierarchical meshes reproduce today's flat plan
    BIT-exactly — eval and train mode (same keys → same masks)."""
    a_hat, h0, _ = setup
    D, I = shape
    nd = D * I
    flat_mesh = make_mesh(n_devices=nd)
    sg = build_sharded_graph(a_hat, n_shards=nd)
    flat = ShardedPowerIteration(graph=sg, mesh=flat_mesh, alpha=0.1,
                                 niter=4, drop_prob=0.5)
    prop, h0_pad = _run_hier(a_hat, h0, D, I, niter=4, drop_prob=0.5)

    # The hierarchical partition must produce the identical edge layout.
    assert sg.shard_rows == prop.graph.shard_rows
    assert sg.interior_pad == prop.graph.interior_pad
    np.testing.assert_array_equal(np.asarray(sg.dst),
                                  np.asarray(prop.graph.dst))
    np.testing.assert_array_equal(np.asarray(sg.src),
                                  np.asarray(prop.graph.src))
    np.testing.assert_array_equal(np.asarray(sg.w),
                                  np.asarray(prop.graph.w))

    z_flat = np.asarray(flat(h0_pad, train=False))
    z_hier = np.asarray(prop(h0_pad, train=False))
    np.testing.assert_array_equal(z_flat, z_hier)

    key = jax.random.PRNGKey(11)
    z_flat_t = np.asarray(flat(h0_pad, train=True, key=key))
    z_hier_t = np.asarray(prop(h0_pad, train=True, key=key))
    np.testing.assert_array_equal(z_flat_t, z_hier_t)


def test_hier_plan_consistency(setup):
    """Every remapped src decodes back to the right global row through
    the two-level recv tables."""
    a_hat, _, _ = setup
    hg = build_hier_sharded_graph(a_hat, 2, 4)
    dst = np.asarray(hg.dst)
    src = np.asarray(hg.src)
    srcg = np.asarray(hg.src_global)
    w = np.asarray(hg.w)
    si = np.asarray(hg.send_idx_ici)
    sd = np.asarray(hg.send_idx_dcn)
    S, Bi, Bd = hg.shard_rows, hg.b_ici, hg.b_dcn
    D, I = hg.n_slices, hg.per_slice
    ip, ip2 = hg.interior_pad, hg.interior_pad + hg.ici_pad
    total_real = 0
    for d in range(D * I):
        t = d // I
        real = w[d] != 0
        total_real += int(real.sum())
        for e in np.where(real)[0]:
            r, g = int(src[d, e]), int(srcg[d, e])
            if e < ip:  # interior
                assert r < S and r + d * S == g
            elif e < ip2:  # same-slice boundary
                j, p = divmod(r - S, Bi)
                o = t * I + j
                assert si[o, d % I, p] + o * S == g
            else:  # remote-slice boundary
                j, rem = divmod(r - S - I * Bi, D * Bd)
                s, p = divmod(rem, Bd)
                o = s * I + j
                assert s != t
                assert sd[o, t, p] + o * S == g
        # Each part individually dst-sorted.
        assert (np.diff(dst[d, :ip]) >= 0).all()
        assert (np.diff(dst[d, ip:ip2]) >= 0).all()
        assert (np.diff(dst[d, ip2:]) >= 0).all()
    assert total_real == hg.nnz


def test_hier_dcn_dedup():
    """A hub row needed by EVERY chip of a remote slice crosses the DCN
    once under the slice-aggregated plan (flat plan: once per chip)."""
    # Star graph: node 0 (owned by shard 0, slice 0) feeds every node.
    n = 64  # 2 slices x 4 chips x 8 rows
    rows = np.arange(1, n)
    cols = np.zeros(n - 1, dtype=np.int64)
    a = sp.coo_matrix(
        (np.ones(n - 1, np.float32), (rows, cols)), shape=(n, n)).tocsr()
    a = a.maximum(a.T)
    hg = build_hier_sharded_graph(a + sp.identity(n, format="csr"),
                                  2, 4, row_multiple=8)
    comm = hg.comm
    # Row 0 is needed by all 4 chips of slice 1: the flat plan ships it
    # 4 times across DCN, the hierarchical plan once.
    assert comm["dcn_rows_flat_plan"] > comm["dcn_rows"]
    assert comm["dedup_factor"] > 1.0


def test_hier_train_mode_stochastic(setup):
    a_hat, h0, _ = setup
    prop, h0_pad = _run_hier(a_hat, h0, 2, 4, niter=3, drop_prob=0.5)
    z1 = prop(h0_pad, train=True, key=jax.random.PRNGKey(0))
    z2 = prop(h0_pad, train=True, key=jax.random.PRNGKey(1))
    assert not np.allclose(np.asarray(z1), np.asarray(z2))


def test_hier_grad_matches_unsharded(setup):
    a_hat, h0, _ = setup
    oracle = PPRPowerIteration(edges=edge_list_from_scipy(a_hat),
                               alpha=0.1, niter=3)
    prop, h0_pad = _run_hier(a_hat, h0, 2, 4, niter=3)
    n = h0.shape[0]

    g_ref = jax.grad(lambda h: jnp.sum(oracle(h, train=False) ** 2))(
        jnp.asarray(h0))
    g_hier = jax.grad(lambda h: jnp.sum(prop(h, train=False) ** 2))(
        h0_pad)
    np.testing.assert_allclose(np.asarray(g_hier)[:n], np.asarray(g_ref),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_hier_pallas_matches_oracle(setup):
    """Three chained per-part pallas kernels (interpret) == oracle."""
    from ppnp_tpu.kernels import spmm as spmm_mod

    a_hat, h0, z_ref = setup
    mesh = make_hier_mesh(2, 4)
    hg = build_hier_sharded_graph(a_hat, 2, 4)
    pc, pc_t, w_perm = build_hier_pair_chunks(hg, use_native="never")
    prop = HierShardedPowerIteration(
        graph=hg, mesh=mesh, pair_chunks=pc, pair_chunks_t=pc_t,
        w_perm=w_perm, alpha=0.1, niter=10, backend="pallas")
    h0_pad = jnp.asarray(np.pad(h0, ((0, hg.n_pad - h0.shape[0]), (0, 0))))
    interp = functools.partial(spmm_mod.spmm_pair_chunks, interpret=True)
    with mock.patch.object(spmm_mod, "spmm_pair_chunks", interp):
        z = prop(h0_pad, train=False)
    np.testing.assert_allclose(np.asarray(z)[:h0.shape[0]], z_ref,
                               rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_hier_pallas_grad_and_dropout(setup):
    """Backward through the three per-part transpose packings matches
    the hier XLA grad; train mode traces and stays finite."""
    from ppnp_tpu.kernels import spmm as spmm_mod

    a_hat, h0, _ = setup
    mesh = make_hier_mesh(2, 2)
    hg = build_hier_sharded_graph(a_hat, 2, 2)
    pc, pc_t, w_perm = build_hier_pair_chunks(hg, use_native="never")
    prop_p = HierShardedPowerIteration(
        graph=hg, mesh=mesh, pair_chunks=pc, pair_chunks_t=pc_t,
        w_perm=w_perm, alpha=0.1, niter=3, drop_prob=0.5,
        backend="pallas")
    prop_x = HierShardedPowerIteration(graph=hg, mesh=mesh, alpha=0.1,
                                       niter=3)
    h0_pad = jnp.asarray(np.pad(h0, ((0, hg.n_pad - h0.shape[0]), (0, 0))))
    interp = functools.partial(spmm_mod.spmm_pair_chunks, interpret=True)
    with mock.patch.object(spmm_mod, "spmm_pair_chunks", interp):
        g_p = jax.grad(lambda h: jnp.sum(
            prop_p(h, train=False) ** 2))(h0_pad)
        z_t = prop_p(h0_pad, train=True, key=jax.random.PRNGKey(3))
    g_x = jax.grad(lambda h: jnp.sum(prop_x(h, train=False) ** 2))(h0_pad)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x),
                               rtol=1e-4, atol=1e-4)
    assert np.isfinite(np.asarray(z_t)).all()


@pytest.mark.slow
def test_hier_end_to_end_training(small_graph):
    """Full train_model through the hierarchical propagator: DP MLP
    sharded over BOTH axes + two-level exchange propagation."""
    from ppnp_tpu.train import train_model

    a_hat = calc_A_hat(small_graph.adj_matrix)
    mesh = make_hier_mesh(2, 4)
    hg = build_hier_sharded_graph(a_hat, 2, 4)
    prop = HierShardedPowerIteration(graph=hg, mesh=mesh, alpha=0.1,
                                     niter=3, drop_prob=0.5)
    params, result = train_model(
        small_graph, prop, hidden_units=(32,), seed=0, print_interval=0,
        epoch_chunk=10, stopping_args={"max_epochs": 30, "patience": 100},
        idx_split_args={"ntrain_per_class": 10, "nstopping": 60,
                        "nknown": 200, "seed": 1},
    )
    assert result["early_stopping"]["accuracy"] > 0.3
    assert np.isfinite(result["valtest"]["accuracy"])
