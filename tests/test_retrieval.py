"""Retrieval-path tests: sharded top-k must equal the unsharded oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ppnp_tpu.models.appnp import init_mlp_params
from ppnp_tpu.ops.normalize import calc_A_hat
from ppnp_tpu.ops.propagation import PPRPowerIteration
from ppnp_tpu.ops.sparse import edge_list_from_scipy
from ppnp_tpu.parallel.mesh import make_mesh
from ppnp_tpu.parallel.partition import build_sharded_graph
from ppnp_tpu.parallel.sharded import ShardedPowerIteration
from ppnp_tpu.retrieval import (build_embedding_table, retrieve_topk,
                                retrieve_topk_sharded)


def test_retrieve_topk_oracle():
    rng = np.random.RandomState(0)
    table = jnp.asarray(rng.randn(200, 16).astype(np.float32))
    queries = jnp.asarray(rng.randn(5, 16).astype(np.float32))
    scores, idx = retrieve_topk(queries, table, k=7)
    ref = np.asarray(queries) @ np.asarray(table).T
    ref_idx = np.argsort(-ref, axis=1)[:, :7]
    np.testing.assert_array_equal(np.asarray(idx), ref_idx)
    np.testing.assert_allclose(
        np.asarray(scores), np.take_along_axis(ref, ref_idx, axis=1),
        rtol=1e-4)


@pytest.mark.parametrize("n_devices", [2, 8])
def test_retrieve_topk_sharded_matches(n_devices):
    if jax.device_count() < n_devices:
        pytest.skip("not enough devices")
    rng = np.random.RandomState(1)
    n, d, k = 333, 16, 9
    mesh = make_mesh(n_devices=n_devices)
    n_pad = ((n + n_devices - 1) // n_devices) * n_devices
    table_np = rng.randn(n, d).astype(np.float32)
    table = jnp.asarray(np.pad(table_np, ((0, n_pad - n), (0, 0))))
    queries = jnp.asarray(rng.randn(4, d).astype(np.float32))
    s_ref, i_ref = retrieve_topk(queries, jnp.asarray(table_np), k=k)
    s, i = retrieve_topk_sharded(queries, table, k=k, mesh=mesh, n_valid=n)
    np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))


def test_build_embedding_table_levels(small_graph):
    a_hat = calc_A_hat(small_graph.adj_matrix)
    prop = PPRPowerIteration(edges=edge_list_from_scipy(a_hat), alpha=0.1,
                             niter=5)
    n, f = small_graph.attr_matrix.shape
    x = jnp.asarray(np.asarray(small_graph.attr_matrix.todense(),
                               dtype=np.float32))
    params = init_mlp_params(jax.random.PRNGKey(0), f, [32], 4)
    t_hidden = build_embedding_table(params, x, prop, level="hidden")
    t_logits = build_embedding_table(params, x, prop, level="logits")
    assert t_hidden.shape == (n, 32)
    assert t_logits.shape == (n, 4)


def test_end_to_end_sharded_retrieval(small_graph):
    """Propagate a sharded table and retrieve — the full BASELINE.json:11
    path on 8 virtual devices."""
    a_hat = calc_A_hat(small_graph.adj_matrix)
    n, f = small_graph.attr_matrix.shape
    mesh = make_mesh(n_devices=8)
    sg = build_sharded_graph(a_hat, n_shards=8)
    prop = ShardedPowerIteration(graph=sg, mesh=mesh, alpha=0.1, niter=5)
    x = np.asarray(small_graph.attr_matrix.todense(), dtype=np.float32)
    x_pad = jnp.asarray(np.pad(x, ((0, sg.n_pad - n), (0, 0))))
    params = init_mlp_params(jax.random.PRNGKey(0), f, [32], 4)
    table = build_embedding_table(params, x_pad, prop, level="hidden")
    queries = table[:3]
    s, i = retrieve_topk_sharded(queries, table, k=5, mesh=mesh, n_valid=n)
    # Oracle: unsharded top-k over the valid rows of the same table.
    s_ref, i_ref = retrieve_topk(queries, table[:n], k=5)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))
    np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref), rtol=1e-4,
                               atol=1e-5)


@pytest.mark.parametrize("n_devices", [2, 8])
def test_retrieve_topk_qsharded_matches(n_devices):
    """Query-sharded transposed-merge path equals the unsharded oracle
    (VERDICT r2 item 8: the many-query regime)."""
    from ppnp_tpu.retrieval import retrieve_topk_qsharded

    if jax.device_count() < n_devices:
        pytest.skip("not enough devices")
    rng = np.random.RandomState(2)
    n, d, k, q = 333, 16, 9, 4 * n_devices
    mesh = make_mesh(n_devices=n_devices)
    n_pad = ((n + n_devices - 1) // n_devices) * n_devices
    table_np = rng.randn(n, d).astype(np.float32)
    table = jnp.asarray(np.pad(table_np, ((0, n_pad - n), (0, 0))))
    queries = jnp.asarray(rng.randn(q, d).astype(np.float32))
    s_ref, i_ref = retrieve_topk(queries, jnp.asarray(table_np), k=k)
    s, i = retrieve_topk_qsharded(queries, table, k=k, mesh=mesh,
                                  n_valid=n)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))
    np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref), rtol=1e-4,
                               atol=1e-5)


def test_retrieve_topk_qsharded_rejects_ragged_batch():
    from ppnp_tpu.retrieval import retrieve_topk_qsharded

    mesh = make_mesh(n_devices=2)
    table = jnp.zeros((8, 4))
    with pytest.raises(ValueError, match="not divisible"):
        retrieve_topk_qsharded(jnp.zeros((3, 4)), table, k=2, mesh=mesh)
