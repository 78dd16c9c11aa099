"""Tests for the SparseGraph container and npz IO.

Mirrors the hygiene semantics of the reference's sparsegraph.py
(SURVEY.md §3.5): unweighted → undirected → no self-loops → LCC.
"""

import numpy as np
import pytest
import scipy.sparse as sp

from ppnp_tpu.data.io import load_from_npz, save_to_npz
from ppnp_tpu.data.sparsegraph import SparseGraph, largest_connected_components


def _toy_graph():
    # Two components: {0,1,2} (triangle, weighted, directed, self-loop)
    # and {3,4} (single edge).
    adj = sp.csr_matrix(np.array([
        [1.0, 2.0, 0.0, 0.0, 0.0],
        [0.0, 0.0, 3.0, 0.0, 0.0],
        [1.0, 0.0, 0.0, 0.0, 0.0],
        [0.0, 0.0, 0.0, 0.0, 1.0],
        [0.0, 0.0, 0.0, 1.0, 0.0],
    ], dtype=np.float32))
    attr = np.eye(5, 3, dtype=np.float32)
    labels = np.array([0, 1, 0, 1, 1])
    return SparseGraph(adj, attr, labels)


def test_basic_properties():
    g = _toy_graph()
    assert g.num_nodes() == 5
    assert g.is_directed()
    assert g.is_weighted()
    assert g.has_self_loops()


def test_standardize_hygiene():
    g = _toy_graph().standardize()
    adj = g.adj_matrix
    # Largest component is the triangle {0,1,2}.
    assert g.num_nodes() == 3
    # Undirected (symmetric), unweighted, no self-loops.
    assert (adj != adj.T).nnz == 0
    assert np.all(adj.data == 1.0)
    assert np.allclose(adj.diagonal(), 0.0)
    # Attributes and labels restricted consistently.
    assert g.attr_matrix.shape[0] == 3
    assert g.labels.shape[0] == 3


def test_largest_connected_components():
    g = _toy_graph()
    keep = largest_connected_components(g, n_components=1)
    assert set(keep.tolist()) == {0, 1, 2}
    keep2 = largest_connected_components(g, n_components=2)
    assert set(keep2.tolist()) == {0, 1, 2, 3, 4}


def test_npz_roundtrip_sparse_attr(tmp_path):
    adj = sp.random(30, 30, density=0.1, format="csr", dtype=np.float32)
    attr = sp.random(30, 12, density=0.3, format="csr", dtype=np.float32)
    labels = np.arange(30) % 4
    g = SparseGraph(adj, attr, labels,
                    class_names=np.array(["a", "b", "c", "d"]))
    path = tmp_path / "g.npz"
    save_to_npz(path, g)
    g2 = load_from_npz(path)
    assert (g2.adj_matrix != g.adj_matrix).nnz == 0
    assert (g2.attr_matrix != g.attr_matrix).nnz == 0
    np.testing.assert_array_equal(g2.labels, labels)
    np.testing.assert_array_equal(g2.class_names, g.class_names)


def test_npz_roundtrip_dense_attr(tmp_path):
    adj = sp.random(10, 10, density=0.2, format="csr", dtype=np.float32)
    attr = np.random.RandomState(0).rand(10, 4).astype(np.float32)
    g = SparseGraph(adj, attr)
    path = tmp_path / "g.npz"
    save_to_npz(path, g)
    g2 = load_from_npz(path)
    np.testing.assert_allclose(g2.attr_matrix, attr)


def test_validation_errors():
    adj = sp.eye(4, format="csr")
    with pytest.raises(ValueError):
        SparseGraph(np.eye(4))  # not sparse
    with pytest.raises(ValueError):
        SparseGraph(sp.random(3, 4, format="csr"))  # not square
    with pytest.raises(ValueError):
        SparseGraph(adj, labels=np.zeros(3))  # wrong label count


def test_synthetic_sbm_shapes(small_graph):
    g = small_graph
    assert g.num_nodes() > 300  # LCC keeps most nodes
    assert g.attr_matrix.shape[1] == 128
    assert set(np.unique(g.labels)) <= {0, 1, 2, 3}
    assert not g.is_directed()
    assert not g.has_self_loops()


def test_networkx_converter():
    nx = pytest.importorskip("networkx")
    from ppnp_tpu.data.io import networkx_to_sparsegraph
    g = nx.Graph()
    g.add_edges_from([(0, 1), (1, 2), (2, 0), (2, 3)])
    for u in g.nodes:
        g.nodes[u]["weight_attr"] = float(u)
        g.nodes[u]["cls"] = "a" if u % 2 == 0 else "b"
    sg = networkx_to_sparsegraph(g, label_name="cls")
    assert sg.num_nodes() == 4
    assert not sg.is_directed()
    np.testing.assert_array_equal(sg.labels, [0, 1, 0, 1])
    assert sg.attr_matrix.shape == (4, 1)
    np.testing.assert_allclose(
        np.asarray(sg.attr_matrix.todense()).ravel(), [0, 1, 2, 3])
