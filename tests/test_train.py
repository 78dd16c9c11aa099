"""Training-loop and model tests, including the end-to-end integration
criterion from BASELINE.json:7 (APPNP, CPU-runnable, ≥0.80 test accuracy).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ppnp_tpu.earlystopping import EarlyStopping, StopVariable
from ppnp_tpu.models.appnp import init_mlp_params, l2_reg, mlp_forward
from ppnp_tpu.ops.exact import PPRExact, calc_ppr_exact
from ppnp_tpu.ops.normalize import calc_A_hat
from ppnp_tpu.ops.propagation import PPRPowerIteration
from ppnp_tpu.ops.sparse import edge_list_from_scipy
from ppnp_tpu.train import train_model


def test_init_mlp_shapes():
    params = init_mlp_params(jax.random.PRNGKey(0), 100, [64, 32], 7)
    assert [w.shape for w in params] == [(100, 64), (64, 32), (32, 7)]


def test_mlp_forward_eval_deterministic():
    params = init_mlp_params(jax.random.PRNGKey(0), 20, [8], 3)
    x = jnp.asarray(np.random.RandomState(0).randn(10, 20).astype(np.float32))
    a = mlp_forward(params, x, train=False)
    b = mlp_forward(params, x, train=False)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert a.shape == (10, 3)


def test_l2_reg_first_layer_only():
    params = [jnp.ones((3, 4)), jnp.full((4, 2), 5.0)]
    assert float(l2_reg(params)) == 12.0


def test_early_stopping_patience():
    es = EarlyStopping(patience=3, max_epochs=100)
    # Improvements keep patience alive; then stagnation exhausts it.
    assert not es.check([0.5, 1.0], 0, state="s0")
    assert not es.check([0.6, 0.9], 1, state="s1")
    assert not es.check([0.4, 1.1], 2, state="s2")  # worse on both
    assert not es.check([0.4, 1.2], 3, state="s3")
    assert es.check([0.4, 1.2], 4, state="s4")  # patience 3 exhausted
    assert es.best_epoch == 1
    assert es.best_state == "s1"


def test_early_stopping_remembers_best_acc_tie_break_loss():
    es = EarlyStopping(patience=10, max_epochs=100)
    es.check([0.7, 1.0], 0, state="a")
    es.check([0.7, 0.8], 1, state="b")  # same acc, better loss
    assert es.best_state == "b"
    es.check([0.8, 2.0], 2, state="c")  # better acc wins regardless of loss
    assert es.best_state == "c"


def test_early_stopping_loss_only():
    es = EarlyStopping(stop_varnames=[StopVariable.LOSS], patience=2,
                       max_epochs=10)
    assert not es.check([1.0], 0, state="x")
    assert not es.check([2.0], 1)
    assert es.check([2.0], 2)
    assert es.best_state == "x"


def _build_power(graph, alpha=0.1, niter=10):
    a_hat = calc_A_hat(graph.adj_matrix)
    return PPRPowerIteration(edges=edge_list_from_scipy(a_hat), alpha=alpha,
                             niter=niter, drop_prob=0.5)


def test_train_reduces_loss_and_reaches_accuracy(small_graph):
    prop = _build_power(small_graph)
    params, res = train_model(
        small_graph, prop, test=True, seed=0, print_interval=0,
        idx_split_args={"ntrain_per_class": 20, "nstopping": 60,
                        "nknown": 200, "seed": 11},
        stopping_args={"max_epochs": 150, "patience": 40})
    assert res["valtest"]["accuracy"] > 0.6
    assert res["last_epoch"] >= 40


def test_train_bf16_attributes_matches_f32(small_graph):
    """x_dtype=bfloat16 keeps weights/Adam in f32 and trains to the same
    quality: only the attribute matrix (data, 8-bit mantissa is plenty
    for L1-normalized bag-of-words) is stored low-precision, so the
    result should track the f32 run within noise."""
    prop = _build_power(small_graph)
    kw = dict(test=True, seed=0, print_interval=0,
              idx_split_args={"ntrain_per_class": 20, "nstopping": 60,
                              "nknown": 200, "seed": 11},
              stopping_args={"max_epochs": 150, "patience": 40})
    params32, res32 = train_model(small_graph, prop, **kw)
    params16, res16 = train_model(small_graph, prop,
                                  x_dtype=jnp.bfloat16, **kw)
    assert all(w.dtype == jnp.float32 for w in params16)
    assert res16["valtest"]["accuracy"] > 0.6
    assert abs(res16["valtest"]["accuracy"]
               - res32["valtest"]["accuracy"]) < 0.05


def test_train_exact_propagation(small_graph):
    a_hat = calc_A_hat(small_graph.adj_matrix)
    prop = PPRExact(ppr=calc_ppr_exact(a_hat, 0.1))
    params, res = train_model(
        small_graph, prop, test=True, seed=0, print_interval=0,
        idx_split_args={"ntrain_per_class": 20, "nstopping": 60,
                        "nknown": 200, "seed": 11},
        stopping_args={"max_epochs": 150, "patience": 40})
    assert res["valtest"]["accuracy"] > 0.6


def test_train_x_prepared_matches_inline(small_graph):
    """Passing a pre-staged X (the seed-sweep fast path) is bit-identical
    to letting train_model prepare it per call."""
    from ppnp_tpu.train import prepare_attr_input

    prop = _build_power(small_graph, niter=3)
    kw = dict(test=True, seed=3, print_interval=0,
              idx_split_args={"ntrain_per_class": 10, "nstopping": 40,
                              "nknown": 150, "seed": 5},
              stopping_args={"max_epochs": 30, "patience": 10})
    params_a, res_a = train_model(small_graph, prop, **kw)
    x_prep = prepare_attr_input(small_graph, prop)
    params_b, res_b = train_model(small_graph, prop, x_prepared=x_prep,
                                  **kw)
    assert res_a["valtest"]["accuracy"] == res_b["valtest"]["accuracy"]
    for wa, wb in zip(params_a, params_b):
        np.testing.assert_array_equal(np.asarray(wa), np.asarray(wb))


def test_train_x_prepared_mismatch_rejected(small_graph):
    """A staged X that disagrees with the explicit x_format/x_dtype
    arguments (or the propagator's padded row count) is rejected at the
    call boundary, not deep inside the jitted chunk."""
    from ppnp_tpu.train import prepare_attr_input

    prop = _build_power(small_graph, niter=3)
    x_prep = prepare_attr_input(small_graph, prop)  # dense f32
    kw = dict(test=True, seed=3, print_interval=0,
              idx_split_args={"ntrain_per_class": 10, "nstopping": 40,
                              "nknown": 150, "seed": 5},
              stopping_args={"max_epochs": 5, "patience": 5})
    with pytest.raises(ValueError, match="x_format='sparse'"):
        train_model(small_graph, prop, x_prepared=x_prep,
                    x_format="sparse", **kw)
    with pytest.raises(ValueError, match="x_dtype=bfloat16"):
        train_model(small_graph, prop, x_prepared=x_prep,
                    x_dtype=jnp.bfloat16, **kw)
    bad = x_prep[:-1]
    with pytest.raises(ValueError, match="shape"):
        train_model(small_graph, prop, x_prepared=bad, **kw)


def test_prepare_attr_auto_respects_vmem_ceiling():
    """x_format='auto' must not pick the sparse fc1 kernel when the
    VMEM-resident SpMM cannot hold its fc1 operands (n ≳ 130k at
    hidden 64) — it crashed at 500k nodes before the bound."""
    import scipy.sparse as sp

    from ppnp_tpu.data.sparsegraph import SparseGraph
    from ppnp_tpu.ops.sparse_input import SparseInput
    from ppnp_tpu.train import prepare_attr_input

    class _Prop:  # minimal duck-typed propagator (unsharded, no padding)
        pass

    def make(n, f, nnz_per_row=3):
        rng = np.random.default_rng(0)
        rows = np.repeat(np.arange(n), nnz_per_row)
        cols = rng.integers(0, f, n * nnz_per_row)
        attr = sp.coo_matrix(
            (np.ones(n * nnz_per_row, np.float32), (rows, cols)),
            shape=(n, f)).tocsr()
        adj = sp.identity(n, format="csr", dtype=np.float32)
        return SparseGraph(adj_matrix=adj, attr_matrix=attr,
                           labels=np.zeros(n, np.int32))

    # Big-n: dense elements >= 16M and density fine, but fc1 would need
    # ~3*200k*64*4 = 147MiB of VMEM -> auto must stay dense.
    x = prepare_attr_input(make(200_000, 100), _Prop())
    assert not isinstance(x, SparseInput)
    # Mid-size: all auto criteria met -> sparse.
    x = prepare_attr_input(make(40_000, 512), _Prop())
    assert isinstance(x, SparseInput)


def test_result_dict_contract(small_graph):
    """The result dict mirrors the reference's train_model contract."""
    prop = _build_power(small_graph, niter=3)
    _, res = train_model(
        small_graph, prop, seed=1, print_interval=0,
        idx_split_args={"ntrain_per_class": 10, "nstopping": 40,
                        "nknown": 150, "seed": 5},
        stopping_args={"max_epochs": 20, "patience": 5})
    for split in ("train", "early_stopping", "valtest"):
        assert 0.0 <= res[split]["accuracy"] <= 1.0
        assert 0.0 <= res[split]["f1_score"] <= 1.0
    assert res["runtime"] > 0
    assert res["runtime_perepoch"] > 0
    assert res["predictions"].shape[0] == small_graph.num_nodes()


@pytest.mark.slow
def test_cora_ml_integration():
    """BASELINE.json:7 — APPNP on Cora-ML (surrogate), CPU-runnable,
    ≥0.80 test accuracy in bounded epochs."""
    from ppnp_tpu.data.datasets import load_dataset
    graph = load_dataset("cora_ml").standardize()
    prop = _build_power(graph, alpha=0.1, niter=10)
    _, res = train_model(graph, prop, test=True, seed=0, print_interval=0,
                         stopping_args={"max_epochs": 300, "patience": 60})
    assert res["valtest"]["accuracy"] >= 0.80
