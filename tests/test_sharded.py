"""Distributed propagation tests on 8 virtual CPU devices.

SURVEY.md §4 "distributed-without-a-cluster": the sharded operator must
agree with the unsharded oracle, for both exchange strategies, and its
1-device mesh case must degenerate exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ppnp_tpu.ops.normalize import calc_A_hat
from ppnp_tpu.ops.propagation import PPRPowerIteration
from ppnp_tpu.ops.sparse import edge_list_from_scipy
from ppnp_tpu.parallel.mesh import make_mesh
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


def _run_sharded(a_hat, h0, n_devices, exchange):
    mesh = make_mesh(n_devices=n_devices)
    sg = build_sharded_graph(a_hat, n_shards=n_devices)
    prop = ShardedPowerIteration(graph=sg, mesh=mesh, alpha=0.1, niter=10,
                                 exchange=exchange)
    h0_pad = np.pad(h0, ((0, sg.n_pad - h0.shape[0]), (0, 0)))
    z = prop(jnp.asarray(h0_pad), train=False)
    return np.asarray(z)[:h0.shape[0]]


@pytest.mark.parametrize("exchange", ["alltoall", "allgather"])
@pytest.mark.parametrize("n_devices", [1, 2, 8])
def test_sharded_matches_unsharded(setup, n_devices, exchange):
    a_hat, h0, z_ref = setup
    if jax.device_count() < n_devices:
        pytest.skip("not enough devices")
    z = _run_sharded(a_hat, h0, n_devices, exchange)
    np.testing.assert_allclose(z, z_ref, rtol=1e-4, atol=1e-5)


def test_partition_plan_consistency(setup):
    """Every remapped src index points at the right global row."""
    a_hat, _, _ = setup
    sg = build_sharded_graph(a_hat, n_shards=4)
    dst = np.asarray(sg.dst)
    src = np.asarray(sg.src)
    srcg = np.asarray(sg.src_global)
    w = np.asarray(sg.w)
    send_idx = np.asarray(sg.send_idx)
    S, B, nd = sg.shard_rows, sg.boundary, sg.n_shards
    for d in range(nd):
        real = w[d] != 0
        for e_src_remap, e_src_global in zip(src[d][real], srcg[d][real]):
            if e_src_remap < S:  # local row
                assert e_src_remap + d * S == e_src_global
            else:  # boundary row: decode (owner, position)
                o, p = divmod(e_src_remap - S, B)
                assert send_idx[o, d, p] + o * S == e_src_global
    # Total real edge count is preserved.
    assert int((w != 0).sum()) == sg.nnz


def test_partition_interior_boundary_split(setup):
    """The static [interior | boundary] split: every real interior slot
    reads a local row, every real boundary slot reads a recv row, each
    part is dst-sorted, and the split loses no edges (the overlap layout
    the XLA sharded path slices at ``interior_pad``)."""
    a_hat, _, _ = setup
    sg = build_sharded_graph(a_hat, n_shards=4)
    dst = np.asarray(sg.dst)
    src = np.asarray(sg.src)
    srcg = np.asarray(sg.src_global)
    w = np.asarray(sg.w)
    S, ip = sg.shard_rows, sg.interior_pad
    coo = a_hat.tocoo()
    triples = set(zip(coo.row.tolist(), coo.col.tolist(),
                      np.round(coo.data, 6).tolist()))
    seen = set()
    for d in range(sg.n_shards):
        real_i = w[d, :ip] != 0
        real_b = w[d, ip:] != 0
        assert (src[d, :ip][real_i] < S).all()
        assert (src[d, ip:][real_b] >= S).all()
        # Each part individually dst-sorted (padding included).
        assert (np.diff(dst[d, :ip]) >= 0).all()
        assert (np.diff(dst[d, ip:]) >= 0).all()
        for sl, part in (((slice(None, ip)), real_i),
                         ((slice(ip, None)), real_b)):
            rows = dst[d, sl][part] + d * S
            cols = srcg[d, sl][part]
            vals = np.round(w[d, sl][part], 6)
            seen.update(zip(rows.tolist(), cols.tolist(), vals.tolist()))
    assert seen == triples


def test_sharded_train_mode_stochastic(setup):
    a_hat, h0, _ = setup
    mesh = make_mesh(n_devices=4)
    sg = build_sharded_graph(a_hat, n_shards=4)
    prop = ShardedPowerIteration(graph=sg, mesh=mesh, alpha=0.1, niter=3,
                                 drop_prob=0.5)
    h0_pad = jnp.asarray(np.pad(h0, ((0, sg.n_pad - h0.shape[0]), (0, 0))))
    z1 = prop(h0_pad, train=True, key=jax.random.PRNGKey(0))
    z2 = prop(h0_pad, train=True, key=jax.random.PRNGKey(1))
    assert not np.allclose(np.asarray(z1), np.asarray(z2))


def test_sharded_end_to_end_training(small_graph):
    """Full sharded train step: DP MLP (GSPMD) + sharded propagation."""
    from ppnp_tpu.train import train_model
    a_hat = calc_A_hat(small_graph.adj_matrix)
    mesh = make_mesh(n_devices=8)
    sg = build_sharded_graph(a_hat, n_shards=8)
    prop = ShardedPowerIteration(graph=sg, mesh=mesh, alpha=0.1, niter=5,
                                 drop_prob=0.5)
    _, res = train_model(
        small_graph, prop, test=True, seed=0, print_interval=0,
        idx_split_args={"ntrain_per_class": 20, "nstopping": 60,
                        "nknown": 200, "seed": 11},
        stopping_args={"max_epochs": 60, "patience": 30})
    assert res["valtest"]["accuracy"] > 0.5


def test_heartbeat_healthy_mesh():
    from ppnp_tpu.parallel.health import assert_devices_healthy, heartbeat
    from ppnp_tpu.parallel.mesh import make_mesh
    mesh = make_mesh(n_devices=min(8, jax.device_count()))
    elapsed = heartbeat(mesh)
    assert elapsed < 60.0
    assert_devices_healthy(mesh)


def test_sharded_pallas_matches_oracle(setup):
    """Per-shard pallas SpMM (interpret mode) == unsharded oracle."""
    import functools
    from unittest import mock
    from ppnp_tpu.kernels import spmm as spmm_mod
    from ppnp_tpu.parallel.partition import build_sharded_pair_chunks

    a_hat, h0, z_ref = setup
    nd = 4
    mesh = make_mesh(n_devices=nd)
    sg = build_sharded_graph(a_hat, n_shards=nd)
    pc, pc_t, w_perm = build_sharded_pair_chunks(sg, use_native="never")
    prop = ShardedPowerIteration(graph=sg, mesh=mesh, pair_chunks=pc,
                                 pair_chunks_t=pc_t, w_perm=w_perm,
                                 alpha=0.1, niter=10, backend="pallas")
    h0_pad = np.pad(h0, ((0, sg.n_pad - h0.shape[0]), (0, 0)))
    interp = functools.partial(spmm_mod.spmm_pair_chunks, interpret=True)
    with mock.patch.object(spmm_mod, "spmm_pair_chunks", interp):
        z = prop(jnp.asarray(h0_pad), train=False)
    np.testing.assert_allclose(np.asarray(z)[:h0.shape[0]], z_ref,
                               rtol=1e-4, atol=1e-4)


def test_sharded_pallas_grad_matches_xla(setup):
    """Backward through per-shard transpose packings == XLA-path grad."""
    import functools
    from unittest import mock
    from ppnp_tpu.kernels import spmm as spmm_mod
    from ppnp_tpu.parallel.partition import build_sharded_pair_chunks

    a_hat, h0, _ = setup
    nd = 2
    mesh = make_mesh(n_devices=nd)
    sg = build_sharded_graph(a_hat, n_shards=nd)
    pc, pc_t, w_perm = build_sharded_pair_chunks(sg, use_native="never")
    prop_p = ShardedPowerIteration(graph=sg, mesh=mesh, pair_chunks=pc,
                                   pair_chunks_t=pc_t, w_perm=w_perm,
                                   alpha=0.1, niter=3, backend="pallas")
    prop_x = ShardedPowerIteration(graph=sg, mesh=mesh, alpha=0.1, niter=3)
    h0_pad = jnp.asarray(np.pad(h0, ((0, sg.n_pad - h0.shape[0]), (0, 0))))

    def loss(prop):
        return lambda h: jnp.sum(prop(h, train=False) ** 2)

    interp = functools.partial(spmm_mod.spmm_pair_chunks, interpret=True)
    with mock.patch.object(spmm_mod, "spmm_pair_chunks", interp):
        g_p = jax.grad(loss(prop_p))(h0_pad)
    g_x = jax.grad(loss(prop_x))(h0_pad)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x),
                               rtol=1e-3, atol=1e-4)


def test_sharded_pallas_train_dropout_runs(setup):
    """Train-mode (id-keyed edge dropout) through the sharded pallas
    path: regression for edge_dropout_by_id not being imported in
    sharded.py (the trace raised NameError). Statistical correctness of
    the masks is covered elsewhere; this asserts the path traces, runs
    and stays finite with a key and drop_prob > 0."""
    import functools
    from unittest import mock
    from ppnp_tpu.kernels import spmm as spmm_mod
    from ppnp_tpu.parallel.partition import build_sharded_pair_chunks

    a_hat, h0, _ = setup
    nd = 2
    mesh = make_mesh(n_devices=nd)
    sg = build_sharded_graph(a_hat, n_shards=nd)
    pc, pc_t, w_perm = build_sharded_pair_chunks(sg, use_native="never")
    prop = ShardedPowerIteration(graph=sg, mesh=mesh, pair_chunks=pc,
                                 pair_chunks_t=pc_t, w_perm=w_perm,
                                 alpha=0.1, niter=3, drop_prob=0.5,
                                 backend="pallas")
    h0_pad = jnp.asarray(np.pad(h0, ((0, sg.n_pad - h0.shape[0]), (0, 0))))
    interp = functools.partial(spmm_mod.spmm_pair_chunks, interpret=True)
    with mock.patch.object(spmm_mod, "spmm_pair_chunks", interp):
        z = prop(h0_pad, train=True, key=jax.random.PRNGKey(3))
        g = jax.grad(lambda h: jnp.sum(
            prop(h, train=True, key=jax.random.PRNGKey(3)) ** 2))(h0_pad)
    assert np.isfinite(np.asarray(z)).all()
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def test_bench_scaling_smoke_cpu_mesh():
    """bench_scaling runs functionally on the virtual CPU mesh (xla
    backend; perf numbers are meaningless on CPU, shape/flow is not)."""
    from ppnp_tpu.benchmarks import bench_scaling

    res = bench_scaling(dataset="cora_ml", c=8, niter=2, iters=1,
                        n_shards_list=[1, 2])
    assert set(res["shards"]) == {1, 2}
    for ns, row in res["shards"].items():
        assert row["steps_per_s"] > 0
        assert row["boundary_rows"] >= 1


def test_shard_reorder_rcm_shrinks_boundary():
    """Global RCM relabel before partitioning: on a (scrambled) banded
    graph the boundary shrinks and most edges become interior — i.e.
    overlappable with the exchange (docs/DISTRIBUTED.md)."""
    import scipy.sparse as sp

    from ppnp_tpu.ops.pairchunks import rcm_permutation

    rng = np.random.default_rng(0)
    n, m, bw = 4000, 24000, 150
    d = rng.integers(0, n, m)
    s_ = np.clip(d + (rng.standard_normal(m) * bw).astype(np.int64),
                 0, n - 1)
    a = sp.coo_matrix((np.ones(m, np.float32), (d, s_)),
                      shape=(n, n)).tocsr()
    a = (a + a.T).tocsr()
    scramble = rng.permutation(n)
    a_scr = (a[scramble][:, scramble]).tocsr()

    sg0 = build_sharded_graph(a_scr, n_shards=8)
    perm = rcm_permutation(a_scr)
    sg1 = build_sharded_graph((a_scr[perm][:, perm]).tocsr(), n_shards=8)
    int0 = int((np.asarray(sg0.w)[:, :sg0.interior_pad] != 0).sum())
    int1 = int((np.asarray(sg1.w)[:, :sg1.interior_pad] != 0).sum())
    assert sg1.boundary < sg0.boundary
    assert int1 > 2 * int0  # far more of the SpMM overlaps the exchange


def test_comm_volume_scales_with_cut_not_n():
    """The per-step exchange volume tracks the partition CUT (graph
    bandwidth), not the node count: doubling n at fixed bandwidth keeps
    the boundary ~flat, while widening the band grows it
    (BASELINE.json:5 scaling target's accounting; VERDICT r1 item 6)."""
    import scipy.sparse as sp

    def banded(n, m, bw, seed=0):
        rng = np.random.default_rng(seed)
        d = rng.integers(0, n, m)
        s_ = np.clip(d + (rng.standard_normal(m) * bw).astype(np.int64),
                     0, n - 1)
        a = sp.coo_matrix((np.ones(m, np.float32), (d, s_)),
                          shape=(n, n)).tocsr()
        a.sum_duplicates()
        return a

    ns = 8
    base = build_sharded_graph(banded(4000, 24000, 100), n_shards=ns)
    double_n = build_sharded_graph(banded(8000, 48000, 100), n_shards=ns)
    wide_cut = build_sharded_graph(banded(4000, 24000, 400), n_shards=ns)

    # n doubled, bandwidth fixed: boundary stays ~flat (within padding).
    assert double_n.boundary <= base.boundary * 1.5
    # bandwidth 4x: the cut (and with it the boundary) must grow.
    assert wide_cut.boundary > base.boundary * 1.5
    # comm bytes per step = ns^2 * B * c * 4 — proportional to B only.
    c = 64
    comm = lambda sg: ns * ns * sg.boundary * c * 4  # noqa: E731
    assert comm(double_n) <= comm(base) * 1.5
    assert comm(wide_cut) > comm(base) * 1.5


def test_sparsegraph_permute_consistency():
    """permute() relabels every aligned array together: edges map
    through the permutation and labels follow their nodes."""
    from ppnp_tpu.data.synthetic import make_attributed_sbm

    g = make_attributed_sbm(200, 3, 16, 800, seed=4).standardize()
    n = g.num_nodes()
    adj0 = g.adj_matrix.copy()
    labels0 = g.labels.copy()
    attr0 = np.asarray(g.attr_matrix.todense())
    perm = np.random.RandomState(0).permutation(n)
    g.permute(perm)
    np.testing.assert_array_equal(g.labels, labels0[perm])
    np.testing.assert_array_equal(np.asarray(g.attr_matrix.todense()),
                                  attr0[perm])
    # edge (i, j) in the new numbering == (perm[i], perm[j]) originally
    coo = g.adj_matrix.tocoo()
    for i, j in list(zip(coo.row[:50], coo.col[:50])):
        assert adj0[perm[i], perm[j]] != 0
    assert g.adj_matrix.nnz == adj0.nnz
    with pytest.raises(ValueError):
        g.permute(np.arange(n - 1))
