"""Pallas SpMM kernel tests — interpreter mode on CPU (SURVEY.md §4:
"run in Pallas interpreter mode so it works on CPU CI").
"""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from ppnp_tpu.kernels.spmm import spmm_pair_chunks
from ppnp_tpu.ops.normalize import calc_A_hat
from ppnp_tpu.ops.pairchunks import pair_chunks_from_scipy
from ppnp_tpu.ops.propagation import PPRPowerIteration
from ppnp_tpu.ops.sparse import edge_list_from_scipy

@pytest.fixture(autouse=True)
def _clear_caches_per_test():
    """XLA:CPU segfaults (in backend_compile) have been observed twice in
    this module when many compiled programs accumulate in-process —
    always at compile time, never standalone. Clearing per test keeps the
    backend client small; recompiles here are cheap (interpret mode)."""
    yield
    import jax
    jax.clear_caches()



@pytest.mark.parametrize("n,density,c", [
    (300, 0.02, 16),
    (1000, 0.005, 128),
    (513, 0.01, 64),   # non-multiple-of-window row count
])
def test_kernel_matches_scipy(n, density, c):
    rng = np.random.RandomState(n)
    a = sp.random(n, n, density=density, random_state=rng, format="csr",
                  dtype=np.float32)
    h = rng.randn(n, c).astype(np.float32)
    pc = pair_chunks_from_scipy(a)
    out = spmm_pair_chunks(pc, jnp.asarray(h), interpret=True)
    np.testing.assert_allclose(np.asarray(out), a @ h, rtol=1e-4, atol=1e-4)


def test_kernel_rectangular():
    rng = np.random.RandomState(7)
    a = sp.random(200, 450, density=0.02, random_state=rng, format="csr",
                  dtype=np.float32)
    h = rng.randn(450, 32).astype(np.float32)
    pc = pair_chunks_from_scipy(a)
    out = spmm_pair_chunks(pc, jnp.asarray(h), interpret=True)
    np.testing.assert_allclose(np.asarray(out), a @ h, rtol=1e-4, atol=1e-4)


def test_kernel_empty_rows_and_hubs():
    """Degree skew: hub rows + empty rows exercise pair/midchunk padding."""
    n = 260
    rng = np.random.RandomState(3)
    rows = np.concatenate([np.zeros(200, dtype=np.int64),  # hub row 0
                           rng.randint(0, n // 2, size=300)])
    cols = rng.randint(0, n, size=500)
    w = rng.rand(500).astype(np.float32)
    a = sp.csr_matrix((w, (rows, cols)), shape=(n, n))
    a.sum_duplicates()
    h = rng.randn(n, 16).astype(np.float32)
    pc = pair_chunks_from_scipy(a)
    out = spmm_pair_chunks(pc, jnp.asarray(h), interpret=True)
    np.testing.assert_allclose(np.asarray(out), a @ h, rtol=1e-4, atol=1e-4)


def test_kernel_weight_override():
    """The e_w argument drives per-iteration edge dropout."""
    rng = np.random.RandomState(11)
    a = sp.random(256, 256, density=0.02, random_state=rng, format="csr",
                  dtype=np.float32)
    h = rng.randn(256, 8).astype(np.float32)
    pc = pair_chunks_from_scipy(a)
    out_zero = spmm_pair_chunks(pc, jnp.asarray(h),
                                e_w=jnp.zeros_like(pc.e_w), interpret=True)
    np.testing.assert_allclose(np.asarray(out_zero), 0.0)
    out_double = spmm_pair_chunks(pc, jnp.asarray(h), e_w=2.0 * pc.e_w,
                                  interpret=True)
    np.testing.assert_allclose(np.asarray(out_double), 2 * (a @ h),
                               rtol=1e-4, atol=1e-4)


def test_power_iteration_pallas_backend_matches_xla(small_graph):
    a_hat = calc_A_hat(small_graph.adj_matrix)
    h0 = jnp.asarray(np.random.RandomState(0).randn(
        small_graph.num_nodes(), 8).astype(np.float32))
    edges = edge_list_from_scipy(a_hat)
    xla_prop = PPRPowerIteration(edges=edges, alpha=0.1, niter=4)
    z_ref = np.asarray(xla_prop(h0, train=False))
    # Pallas backend in interpreter mode (CPU).
    import functools
    from unittest import mock
    from ppnp_tpu.kernels import spmm as spmm_mod
    pc = pair_chunks_from_scipy(a_hat)
    pallas_prop = PPRPowerIteration(
        edges=edges, pair_chunks=pc, alpha=0.1, niter=4, backend="pallas")
    interp_spmm = functools.partial(spmm_mod.spmm_pair_chunks,
                                    interpret=True)
    with mock.patch.object(spmm_mod, "spmm_pair_chunks", interp_spmm):
        z = np.asarray(pallas_prop(h0, train=False))
    np.testing.assert_allclose(z, z_ref, rtol=1e-4, atol=1e-4)


def test_native_packer_matches_numpy():
    """C++ ingest tier produces an equivalent packing (semantics checked
    through the kernel; slot order within a pair may differ)."""
    from ppnp_tpu import native
    if not native.native_available():
        pytest.skip("no C++ toolchain")
    rng = np.random.RandomState(21)
    a = sp.random(500, 500, density=0.02, random_state=rng, format="csr",
                  dtype=np.float32)
    h = rng.randn(500, 16).astype(np.float32)
    pc_np = pair_chunks_from_scipy(a, use_native="never")
    pc_cc = pair_chunks_from_scipy(a, use_native="require")
    assert pc_np.n_seg == pc_cc.n_seg
    assert pc_np.n_mid == pc_cc.n_mid
    out_np = spmm_pair_chunks(pc_np, jnp.asarray(h), interpret=True)
    out_cc = spmm_pair_chunks(pc_cc, jnp.asarray(h), interpret=True)
    np.testing.assert_allclose(np.asarray(out_cc), np.asarray(out_np),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out_cc), a @ h, rtol=1e-4,
                               atol=1e-4)


def test_spmm_grad_transpose_packing():
    """Custom VJP through the transpose packing matches the dense grad."""
    import jax
    import functools
    from unittest import mock
    from ppnp_tpu.kernels import spmm as spmm_mod
    from ppnp_tpu.ops.pairchunks import slot_permutation, transpose_pair

    rng = np.random.RandomState(31)
    a = sp.random(300, 300, density=0.02, random_state=rng, format="csr",
                  dtype=np.float32)
    h0 = jnp.asarray(rng.randn(300, 8).astype(np.float32))
    pc = pair_chunks_from_scipy(a)
    pc_t = transpose_pair(a, layout="aligned")
    perm = jnp.asarray(slot_permutation(pc, pc_t))

    interp = functools.partial(spmm_mod.spmm_pair_chunks, interpret=True)
    with mock.patch.object(spmm_mod, "spmm_pair_chunks", interp):
        f = spmm_mod.make_spmm_grad(pc, pc_t, perm)
        g_pallas = jax.grad(lambda h: jnp.sum(f(h, pc.e_w) ** 2))(h0)
    dense = jnp.asarray(a.toarray())

    def loss_dense(h):
        prod = jax.lax.dot(dense, h, precision=jax.lax.Precision.HIGHEST)
        return jnp.sum(prod ** 2)

    g_dense = jax.grad(loss_dense)(h0)
    np.testing.assert_allclose(np.asarray(g_pallas), np.asarray(g_dense),
                               rtol=1e-3, atol=1e-4)


def test_pallas_training_with_dropout(small_graph):
    """End-to-end training through the pallas backend (interpret mode)."""
    import functools
    from unittest import mock
    from ppnp_tpu.builders import build_propagator, train_kwargs
    from ppnp_tpu.config import RunConfig
    from ppnp_tpu.kernels import spmm as spmm_mod
    from ppnp_tpu.train import train_model

    cfg = RunConfig(propagation="power", backend="pallas", niter=3,
                    max_epochs=8, patience=100, print_interval=0,
                    ntrain_per_class=10, nstopping=40, nknown=150)
    prop = build_propagator(cfg, small_graph)
    interp = functools.partial(spmm_mod.spmm_pair_chunks, interpret=True)
    with mock.patch.object(spmm_mod, "spmm_pair_chunks", interp):
        _, res = train_model(small_graph, prop, epoch_chunk=4,
                             **train_kwargs(cfg))
    assert np.isfinite(res["early_stopping"]["accuracy"])
    assert res["last_epoch"] == 7


@pytest.mark.parametrize("window_src", [256, 512])
def test_kernel_asymmetric_src_window(window_src):
    rng = np.random.RandomState(41)
    a = sp.random(700, 700, density=0.01, random_state=rng, format="csr",
                  dtype=np.float32)
    h = rng.randn(700, 32).astype(np.float32)
    pc = pair_chunks_from_scipy(a, window_src=window_src)
    assert pc.window_src == window_src
    out = spmm_pair_chunks(pc, jnp.asarray(h), interpret=True)
    np.testing.assert_allclose(np.asarray(out), a @ h, rtol=1e-4, atol=1e-4)


def test_kernel_fused_init():
    """out = A@H + init (the fused APPNP α-mix accumulator seed)."""
    rng = np.random.RandomState(7)
    a = sp.random(300, 300, density=0.02, random_state=rng, format="csr",
                  dtype=np.float32)
    h = rng.randn(300, 16).astype(np.float32)
    init = rng.randn(300, 16).astype(np.float32)
    pc = pair_chunks_from_scipy(a)
    out = spmm_pair_chunks(pc, jnp.asarray(h), init=jnp.asarray(init),
                           interpret=True)
    np.testing.assert_allclose(np.asarray(out), a @ h + init,
                               rtol=1e-4, atol=1e-4)


def test_kernel_reordered_transparent():
    """A packing built under an RCM permutation gives results in the
    ORIGINAL row order through the default wrapper path."""
    rng = np.random.RandomState(11)
    a = sp.random(400, 400, density=0.02, random_state=rng, format="csr",
                  dtype=np.float32)
    a = a + a.T  # symmetric for symmetric_mode RCM
    h = rng.randn(400, 8).astype(np.float32)
    pc = pair_chunks_from_scipy(a, reorder="rcm")
    assert pc.perm is not None and pc.iperm is not None
    out = spmm_pair_chunks(pc, jnp.asarray(h), interpret=True)
    np.testing.assert_allclose(np.asarray(out), a @ h, rtol=1e-4, atol=1e-4)


def test_kernel_reordered_assume_permuted():
    """Hot-loop contract: operands already in packed order."""
    rng = np.random.RandomState(13)
    a = sp.random(256, 256, density=0.03, random_state=rng, format="csr",
                  dtype=np.float32)
    a = a + a.T
    h = rng.randn(256, 8).astype(np.float32)
    pc = pair_chunks_from_scipy(a, reorder="rcm")
    p = np.asarray(pc.perm)
    out = spmm_pair_chunks(pc, jnp.asarray(h[p]), interpret=True,
                           assume_permuted=True)
    np.testing.assert_allclose(np.asarray(out), (a @ h)[p],
                               rtol=1e-4, atol=1e-4)


def test_propagation_pallas_reordered_matches_xla(small_graph):
    """Full K-step pallas propagation under RCM reorder + fused α-mix
    matches the XLA backend (eval mode)."""
    import functools
    from unittest import mock
    from ppnp_tpu.kernels import spmm as spmm_mod
    from ppnp_tpu.ops.pairchunks import slot_permutation, transpose_pair

    a_hat = calc_A_hat(small_graph.adj_matrix)
    edges = edge_list_from_scipy(a_hat)
    pc = pair_chunks_from_scipy(a_hat, reorder="rcm")
    pc_t = transpose_pair(a_hat, perm=np.asarray(pc.perm), layout="aligned")
    w_perm = jnp.asarray(slot_permutation(pc, pc_t))

    rng = np.random.RandomState(3)
    h0 = jnp.asarray(rng.randn(small_graph.num_nodes(), 6)
                     .astype(np.float32))
    prop_x = PPRPowerIteration(edges=edges, alpha=0.15, niter=4,
                               backend="xla")
    prop_p = PPRPowerIteration(edges=edges, pair_chunks=pc,
                               pair_chunks_t=pc_t, w_perm=w_perm,
                               alpha=0.15, niter=4, backend="pallas")
    interp = functools.partial(spmm_mod.spmm_pair_chunks, interpret=True)
    with mock.patch.object(spmm_mod, "spmm_pair_chunks", interp):
        out_p = prop_p(h0, train=False)
    out_x = prop_x(h0, train=False)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                               rtol=1e-4, atol=1e-4)


def test_vmem_guard_rejects_oversized_graph():
    """Graphs whose resident buffers exceed VMEM fail fast with a
    pointer to the sharded path (compiled mode only)."""
    import jax
    from ppnp_tpu.ops.pairchunks import PairChunks

    pc_small = pair_chunks_from_scipy(
        sp.random(256, 256, density=0.02, random_state=np.random.RandomState(0),
                  format="csr", dtype=np.float32))
    # Same arrays, absurd static row/col counts: only the guard trips.
    pc_big = pc_small.replace(n_rows=2_000_000, n_rows_pad=2_000_000,
                              n_cols_pad=2_000_000)
    h = jnp.zeros((2_000_000, 8), jnp.float32)
    # interpret=False: the guard protects COMPILED mode; on the CPU test
    # platform the default auto-resolves to interpret (no VMEM to guard).
    with pytest.raises(Exception) as ei:
        jax.eval_shape(lambda hh: spmm_pair_chunks(pc_big, hh,
                                                   interpret=False), h)
    assert "row-shard" in str(ei.value)


def test_edge_dropout_by_id_consistent_across_packings():
    """Same (key, edge) → same Bernoulli draw in fwd + transpose layout."""
    import jax
    from ppnp_tpu.ops.dropout import edge_dropout_by_id
    from ppnp_tpu.ops.pairchunks import transpose_pair

    rng = np.random.RandomState(5)
    a = sp.random(300, 300, density=0.02, random_state=rng, format="csr",
                  dtype=np.float32)
    pc = pair_chunks_from_scipy(a, use_native="never")
    pc_t = transpose_pair(a, layout="aligned", use_native="never")
    key = jax.random.PRNGKey(42)
    w = np.asarray(edge_dropout_by_id(key, pc, 0.5))
    w_t = np.asarray(edge_dropout_by_id(key, pc_t, 0.5))

    def per_edge(p, vals):
        hi = np.asarray(p.eid_hi).T.reshape(-1).astype(np.int64)
        lo = np.asarray(p.eid_lo).T.reshape(-1).astype(np.int64)
        v = vals.T.reshape(-1)
        mask = np.asarray(p.e_w).T.reshape(-1) != 0
        eid = (hi << 32) | lo
        order = np.argsort(eid[mask])
        return eid[mask][order], v[mask][order]

    e1, v1 = per_edge(pc, w)
    e2, v2 = per_edge(pc_t, w_t)
    assert np.array_equal(e1, e2)
    np.testing.assert_allclose(v1, v2, rtol=1e-6)
    kept = np.mean(v1 != 0)
    assert 0.35 < kept < 0.65  # p=0.5 +- sampling noise


def test_spmm_grad_id_dropout_matches_dense(small_graph):
    """Train-mode grad through id-keyed masks == dense autodiff with the
    SAME masked matrices (interpret mode)."""
    import functools
    import jax
    from unittest import mock
    from ppnp_tpu.kernels import spmm as spmm_mod
    from ppnp_tpu.ops.dropout import edge_dropout_by_id
    from ppnp_tpu.ops.pairchunks import slot_permutation, transpose_pair

    a_hat = calc_A_hat(small_graph.adj_matrix)
    pc = pair_chunks_from_scipy(a_hat, use_native="never")
    pc_t = transpose_pair(a_hat, layout="aligned", use_native="never")
    w_perm = jnp.asarray(slot_permutation(pc, pc_t))
    key = jax.random.PRNGKey(7)
    n = a_hat.shape[0]
    rng = np.random.RandomState(2)
    h0 = jnp.asarray(rng.randn(n, 6).astype(np.float32))

    w = edge_dropout_by_id(key, pc, 0.5)
    w_t = edge_dropout_by_id(key, pc_t, 0.5)

    interp = functools.partial(spmm_mod.spmm_pair_chunks, interpret=True)
    with mock.patch.object(spmm_mod, "spmm_pair_chunks", interp):
        f = spmm_mod.make_spmm_grad(pc, pc_t, w_perm)
        g_id = jax.grad(lambda h: jnp.sum(f(h, w, None, w_t) ** 2))(h0)
        # fallback path: transfer the SAME weights through the slot perm
        g_tr = jax.grad(lambda h: jnp.sum(f(h, w) ** 2))(h0)

    # dense oracle with the identical masked matrix
    rows, cols = [], []
    dense = np.zeros((n, n), np.float32)
    hi = np.asarray(pc.eid_hi).T.reshape(-1).astype(np.int64)
    lo = np.asarray(pc.eid_lo).T.reshape(-1).astype(np.int64)
    wv = np.asarray(w).T.reshape(-1)
    valid = np.asarray(pc.e_w).T.reshape(-1) != 0
    span = max(pc.n_rows, pc.n_cols)  # transpose-invariant id span
    eid = (hi << 32) | lo
    dense[eid[valid] // span, eid[valid] % span] = wv[valid]

    def loss(h):
        prod = jax.lax.dot(jnp.asarray(dense), h,
                           precision=jax.lax.Precision.HIGHEST)
        return jnp.sum(prod ** 2)

    g_ref = jax.grad(loss)(h0)
    np.testing.assert_allclose(np.asarray(g_id), np.asarray(g_ref),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(g_tr), np.asarray(g_ref),
                               rtol=1e-3, atol=1e-4)


def test_edge_ids_symmetric_for_rectangular_asymmetric_windows():
    """Edge-id span must be transpose-invariant even for rectangular
    matrices packed with window_src != window (the sharded local
    operators) — regression for an id mismatch that would silently
    decorrelate fwd/bwd dropout masks."""
    from ppnp_tpu.ops.pairchunks import transpose_pair

    rng = np.random.RandomState(21)
    a = sp.random(96, 600, density=0.05, random_state=rng, format="csr",
                  dtype=np.float32)
    pc = pair_chunks_from_scipy(a, window_src=512, use_native="never")
    pc_t = transpose_pair(a, layout="aligned", window_src=512, use_native="never")

    def ids(p):
        hi = np.asarray(p.eid_hi).T.reshape(-1).astype(np.int64)
        lo = np.asarray(p.eid_lo).T.reshape(-1).astype(np.int64)
        valid = np.asarray(p.e_w).T.reshape(-1) != 0
        return np.sort(((hi << 32) | lo)[valid])

    assert np.array_equal(ids(pc), ids(pc_t))
