"""Sparse first layer (ops/sparse_input.py): fc1 through the SpMM kernel.

Reference semantics under test: ``ppnp/pytorch/utils.py`` MixedLinear +
MixedDropout (~L15/~L40, SURVEY.md §2.1) — dropout drops X's nnz VALUES
(rescaled 1/(1-p)), the first layer multiplies sparse X by dense W, and
the backward is dW = X_dropᵀ @ dH with the SAME mask.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from ppnp_tpu.ops.dropout import edge_dropout_by_id
from ppnp_tpu.ops.pairchunks import _slot_coords
from ppnp_tpu.ops.sparse_input import SparseInput, build_sparse_input

# Reduced unroll geometry: the full TPU default (chunk=24, spm=32,
# mps=16) inlines 512 dots per grid step — minutes of XLA:CPU compile
# in interpret mode (same reduction the sharded tests use).
GEO = dict(layout="banded", window=128, window_src=128, chunk=8,
           seg_per_mid=8, mids_per_step=4)


@pytest.fixture(scope="module")
def xwg():
    rng = np.random.RandomState(3)
    x = sp.random(300, 200, density=0.03, random_state=rng,
                  format="csr", dtype=np.float32)
    w = rng.randn(200, 32).astype(np.float32)
    g = rng.randn(300, 32).astype(np.float32)
    return x, w, g


def _masked_dense(si: SparseInput, key, drop_prob: float) -> np.ndarray:
    """Dense X with the id-keyed dropout mask applied (host oracle)."""
    e_w = np.asarray(edge_dropout_by_id(key, si.pc, drop_prob))
    rows, cols, valid = _slot_coords(
        jax.tree.map(np.asarray, si.pc))
    dense = np.zeros((si.n_rows, si.n_features), np.float32)
    flat = e_w.T.reshape(-1)
    dense[rows[valid], cols[valid]] = flat[valid]
    return dense


def test_forward_matches_dense(xwg):
    x, w, _ = xwg
    si = build_sparse_input(x, **GEO)
    out = np.asarray(si.matmul(jnp.asarray(w)))
    expected = x.toarray() @ w
    assert out.shape == expected.shape
    np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-5)


def test_grad_is_xt_g(xwg):
    x, w, g = xwg
    si = build_sparse_input(x, **GEO)
    gj = jnp.asarray(g)

    def loss(wj):
        return jnp.vdot(si.matmul(wj), gj)

    dw = np.asarray(jax.grad(loss)(jnp.asarray(w)))
    expected = x.toarray().T @ g
    np.testing.assert_allclose(dw, expected, rtol=1e-4, atol=1e-4)


def test_train_dropout_masks_values(xwg):
    """Train-mode forward equals dense X with the id-keyed mask."""
    x, w, _ = xwg
    si = build_sparse_input(x, **GEO)
    key = jax.random.PRNGKey(11)
    out = np.asarray(si.matmul(jnp.asarray(w), key=key, train=True,
                               drop_prob=0.5))
    masked = _masked_dense(si, key, 0.5)
    # survivors are rescaled by 2; roughly half the values drop
    nnz_masked = (masked != 0).sum()
    assert 0.3 * x.nnz < nnz_masked < 0.7 * x.nnz
    np.testing.assert_allclose(out, masked @ w, rtol=1e-4, atol=1e-5)


def test_backward_uses_same_mask(xwg):
    """dW must be X_dropᵀ @ g with the FORWARD pass's mask (fwd/bwd
    consistency through the id-keyed transpose packing)."""
    x, w, g = xwg
    si = build_sparse_input(x, **GEO)
    key = jax.random.PRNGKey(4)
    gj = jnp.asarray(g)

    def loss(wj):
        return jnp.vdot(si.matmul(wj, key=key, train=True,
                                  drop_prob=0.5), gj)

    dw = np.asarray(jax.grad(loss)(jnp.asarray(w)))
    masked = _masked_dense(si, key, 0.5)
    np.testing.assert_allclose(dw, masked.T @ g, rtol=1e-4, atol=1e-4)


def test_row_padding(xwg):
    """n_rows > attr rows: extra rows are zero, shape honors the target
    (sharded/padded propagators need H⁰ on their row grid)."""
    x, w, _ = xwg
    si = build_sparse_input(x, n_rows=384, **GEO)
    assert si.shape == (384, 200)
    out = np.asarray(si.matmul(jnp.asarray(w)))
    assert out.shape == (384, 32)
    np.testing.assert_allclose(out[:300], x.toarray() @ w,
                               rtol=1e-4, atol=1e-5)
    assert np.all(out[300:] == 0)


def test_train_model_sparse_x(small_graph):
    """End-to-end: x_format='sparse' trains and scores like dense."""
    from ppnp_tpu.ops.normalize import calc_A_hat
    from ppnp_tpu.ops.propagation import PPRPowerIteration
    from ppnp_tpu.ops.sparse import edge_list_from_scipy
    from ppnp_tpu.train import train_model

    a_hat = calc_A_hat(small_graph.adj_matrix)
    prop = PPRPowerIteration(edges=edge_list_from_scipy(a_hat),
                             alpha=0.1, niter=4)
    kw = dict(idx_split_args={"ntrain_per_class": 20, "nstopping": 60,
                              "nknown": 200, "seed": 11},
              stopping_args={"max_epochs": 60, "patience": 1000},
              seed=0, print_interval=0)
    _, res_d = train_model(small_graph, prop, x_format="dense", **kw)
    _, res_s = train_model(small_graph, prop, x_format="sparse", **kw)
    assert res_d["x_format"] == "dense"
    assert res_s["x_format"] == "sparse"
    # Same protocol, different RNG stream for the input mask — accuracy
    # must land in the same band (seed-class variance).
    assert res_s["valtest"]["accuracy"] > 0.5
    assert abs(res_s["valtest"]["accuracy"]
               - res_d["valtest"]["accuracy"]) < 0.15


def test_auto_keeps_small_graphs_dense(small_graph):
    """The auto rule densifies small graphs (dispatch-bound regime)."""
    from ppnp_tpu.ops.normalize import calc_A_hat
    from ppnp_tpu.ops.propagation import PPRPowerIteration
    from ppnp_tpu.ops.sparse import edge_list_from_scipy
    from ppnp_tpu.train import train_model

    a_hat = calc_A_hat(small_graph.adj_matrix)
    prop = PPRPowerIteration(edges=edge_list_from_scipy(a_hat),
                             alpha=0.1, niter=2)
    _, res = train_model(small_graph, prop,
                         idx_split_args={"ntrain_per_class": 20,
                                         "nstopping": 60,
                                         "nknown": 200, "seed": 11},
                         stopping_args={"max_epochs": 5,
                                        "patience": 1000},
                         seed=0, print_interval=0, x_format="auto")
    assert res["x_format"] == "dense"


def test_sharded_sparse_fc1_matches_dense(xwg):
    """Row-sharded sparse fc1 (eval): shard_map kernel == dense X @ W."""
    from ppnp_tpu.ops.sparse_input import build_sharded_sparse_input
    from ppnp_tpu.parallel.mesh import make_mesh

    x, w, _ = xwg
    mesh = make_mesh(n_devices=4)
    # shard grid: 4 shards of 80 rows (pads 300 -> 320)
    ssi = build_sharded_sparse_input(x, shard_rows=80, n_shards=4,
                                     mesh=mesh, axes=("data",))
    out = np.asarray(ssi.matmul(jnp.asarray(w)))
    ref = np.asarray(x.todense()) @ w
    assert out.shape == (320, 32)
    np.testing.assert_allclose(out[:300], ref, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(out[300:], 0.0, atol=1e-6)


def test_sharded_sparse_fc1_grad_w(xwg):
    """dW = sum_d X_d^T @ dH_d via shard_map's replicated-input psum."""
    from ppnp_tpu.ops.sparse_input import build_sharded_sparse_input
    from ppnp_tpu.parallel.mesh import make_mesh

    x, w, g = xwg
    mesh = make_mesh(n_devices=4)
    ssi = build_sharded_sparse_input(x, shard_rows=80, n_shards=4,
                                     mesh=mesh, axes=("data",))
    gp = jnp.asarray(np.pad(g, ((0, 20), (0, 0))))
    dw = jax.grad(lambda ww: jnp.sum(ssi.matmul(ww) * gp))(
        jnp.asarray(w))
    ref = np.asarray(x.todense()).T @ g
    np.testing.assert_allclose(np.asarray(dw), ref, rtol=1e-3, atol=1e-4)


def test_sharded_sparse_train_dropout_stochastic(xwg):
    from ppnp_tpu.ops.sparse_input import build_sharded_sparse_input
    from ppnp_tpu.parallel.mesh import make_mesh

    x, w, _ = xwg
    mesh = make_mesh(n_devices=2)
    ssi = build_sharded_sparse_input(x, shard_rows=160, n_shards=2,
                                     mesh=mesh, axes=("data",))
    o1 = ssi.matmul(jnp.asarray(w), key=jax.random.PRNGKey(0),
                    train=True)
    o2 = ssi.matmul(jnp.asarray(w), key=jax.random.PRNGKey(1),
                    train=True)
    assert np.isfinite(np.asarray(o1)).all()
    assert not np.allclose(np.asarray(o1), np.asarray(o2))


@pytest.mark.slow
def test_train_model_sharded_sparse_x(small_graph):
    """End-to-end sharded training with the row-sharded sparse fc1
    (VERDICT r4 Weak #7): x_format='sparse' + ShardedPowerIteration."""
    from ppnp_tpu.ops.normalize import calc_A_hat
    from ppnp_tpu.parallel.mesh import make_mesh
    from ppnp_tpu.parallel.partition import build_sharded_graph
    from ppnp_tpu.parallel.sharded import ShardedPowerIteration
    from ppnp_tpu.train import train_model

    a_hat = calc_A_hat(small_graph.adj_matrix)
    mesh = make_mesh(n_devices=4)
    sg = build_sharded_graph(a_hat, n_shards=4)
    prop = ShardedPowerIteration(graph=sg, mesh=mesh, alpha=0.1,
                                 niter=3, drop_prob=0.5)
    kw = dict(idx_split_args={"ntrain_per_class": 20, "nstopping": 60,
                              "nknown": 200, "seed": 11},
              stopping_args={"max_epochs": 40, "patience": 1000},
              seed=0, print_interval=0, epoch_chunk=20)
    _, res_s = train_model(small_graph, prop, x_format="sparse", **kw)
    _, res_d = train_model(small_graph, prop, x_format="dense", **kw)
    assert res_s["x_format"] == "sparse"
    assert res_s["valtest"]["accuracy"] > 0.4
    assert abs(res_s["valtest"]["accuracy"]
               - res_d["valtest"]["accuracy"]) < 0.15
