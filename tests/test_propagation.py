"""Tests for Â normalization, SpMM, power iteration, and exact PPR.

SURVEY.md §4's unit-test list: Â vs scipy oracle, dense solve vs oracle,
power iteration → exact convergence as K→∞ (eval mode), dropout behavior.
"""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from ppnp_tpu.ops.exact import PPRExact, calc_ppr_exact
from ppnp_tpu.ops.normalize import calc_A_hat
from ppnp_tpu.ops.propagation import PPRPowerIteration, spmm_edge_list
from ppnp_tpu.ops.sparse import edge_list_from_scipy


def _random_adj(n, seed=0, density=0.05):
    rng = np.random.RandomState(seed)
    a = sp.random(n, n, density=density, random_state=rng, format="csr")
    a = a.maximum(a.T)
    a.setdiag(0)
    a.eliminate_zeros()
    a.data[:] = 1.0
    return a.astype(np.float32)


def test_calc_A_hat_oracle():
    adj = _random_adj(40, seed=1)
    a_hat = calc_A_hat(adj)
    # Oracle: explicit dense D^{-1/2}(A+I)D^{-1/2}.
    a_dense = adj.toarray() + np.eye(40)
    d = a_dense.sum(1)
    oracle = a_dense / np.sqrt(d)[:, None] / np.sqrt(d)[None, :]
    np.testing.assert_allclose(a_hat.toarray(), oracle, rtol=1e-5)
    # Symmetric, spectral radius ≤ 1.
    np.testing.assert_allclose(a_hat.toarray(), a_hat.toarray().T, rtol=1e-5)
    eigs = np.linalg.eigvalsh(a_hat.toarray())
    assert np.abs(eigs).max() <= 1.0 + 1e-5


def test_spmm_edge_list_matches_dense(random_csr):
    mat = random_csr(64, 50, density=0.1, seed=3)
    h = np.random.RandomState(4).randn(50, 8).astype(np.float32)
    edges = edge_list_from_scipy(mat, pad_multiple=128)
    out = spmm_edge_list(edges, jnp.asarray(h))
    np.testing.assert_allclose(np.asarray(out), mat @ h, rtol=1e-4,
                               atol=1e-5)


def test_spmm_grad_matches_dense():
    mat = _random_adj(30, seed=5, density=0.2)
    edges = edge_list_from_scipy(mat, pad_multiple=64)
    h0 = jnp.asarray(np.random.RandomState(6).randn(30, 4).astype(np.float32))

    def f_sparse(h):
        return jnp.sum(spmm_edge_list(edges, h) ** 2)

    dense = jnp.asarray(mat.toarray())

    def f_dense(h):
        # HIGHEST precision: XLA may otherwise run f32 matmuls in a
        # reduced-precision fast path, breaking an exact-oracle compare.
        prod = jax.lax.dot(dense, h, precision=jax.lax.Precision.HIGHEST)
        return jnp.sum(prod ** 2)

    g_sparse = jax.grad(f_sparse)(h0)
    g_dense = jax.grad(f_dense)(h0)
    np.testing.assert_allclose(np.asarray(g_sparse), np.asarray(g_dense),
                               rtol=1e-3, atol=1e-4)


def test_calc_ppr_exact_oracle():
    adj = _random_adj(35, seed=7)
    a_hat = calc_A_hat(adj)
    alpha = 0.15
    ppr = np.asarray(calc_ppr_exact(a_hat, alpha))
    oracle = alpha * np.linalg.inv(
        np.eye(35) - (1 - alpha) * a_hat.toarray())
    np.testing.assert_allclose(ppr, oracle, rtol=1e-4, atol=1e-5)


def test_calc_ppr_exact_newton_matches_solve():
    """Newton–Schulz (the TPU path for paper-scale graphs — XLA:TPU LU
    fails to compile above n≈8k) must agree with the direct solve to
    f32 precision: M is SPD with eigs in [α, 2−α] so X₀=I converges
    quadratically, residual (1−α)^(2^k)."""
    adj = _random_adj(120, seed=11)
    a_hat = calc_A_hat(adj)
    for alpha in (0.1, 0.25):
        newton = np.asarray(calc_ppr_exact(a_hat, alpha, method="newton"))
        solve = np.asarray(calc_ppr_exact(a_hat, alpha, method="solve"))
        np.testing.assert_allclose(newton, solve, rtol=2e-5, atol=2e-6)
        # Independent residual check: ‖M·(Π/α) − I‖∞ at f32 precision.
        # (Π rows do NOT sum to 1: Â is the SYMMETRIC normalization,
        # not the row-stochastic random-walk matrix.)
        m = np.eye(120, dtype=np.float64) - (1 - alpha) * a_hat.toarray()
        resid = np.abs(m @ (newton / alpha) - np.eye(120)).max()
        assert resid < 5e-5, f"Newton residual {resid:.2e}"


def test_calc_ppr_exact_auto_dispatch():
    """auto = solve below the Newton threshold; unknown methods raise."""
    import pytest

    adj = _random_adj(30, seed=3)
    a_hat = calc_A_hat(adj)
    np.testing.assert_allclose(
        np.asarray(calc_ppr_exact(a_hat, 0.1, method="auto")),
        np.asarray(calc_ppr_exact(a_hat, 0.1, method="solve")),
        rtol=1e-6)
    with pytest.raises(ValueError, match="unknown method"):
        calc_ppr_exact(a_hat, 0.1, method="lu")


def test_power_iteration_converges_to_exact():
    """APPNP → exact PPNP as K→∞ in eval mode (SURVEY.md §3.4 parity)."""
    adj = _random_adj(50, seed=8)
    a_hat = calc_A_hat(adj)
    alpha = 0.1
    h0 = jnp.asarray(
        np.random.RandomState(9).randn(50, 6).astype(np.float32))

    exact = PPRExact(ppr=calc_ppr_exact(a_hat, alpha))
    edges = edge_list_from_scipy(a_hat)
    power_k200 = PPRPowerIteration(edges=edges, alpha=alpha, niter=200)

    z_exact = exact(h0, train=False)
    z_power = power_k200(h0, train=False)
    np.testing.assert_allclose(np.asarray(z_power), np.asarray(z_exact),
                               rtol=1e-3, atol=1e-4)


def test_power_iteration_k10_close_to_exact():
    """K=10 is already close (the paper's working regime)."""
    adj = _random_adj(50, seed=10)
    a_hat = calc_A_hat(adj)
    h0 = jnp.asarray(
        np.random.RandomState(11).randn(50, 6).astype(np.float32))
    exact = PPRExact(ppr=calc_ppr_exact(a_hat, 0.1))
    power = PPRPowerIteration(edges=edge_list_from_scipy(a_hat), alpha=0.1,
                              niter=10)
    z_exact = np.asarray(exact(h0, train=False))
    z_power = np.asarray(power(h0, train=False))
    # Error contracts like (1-α)^K ≈ 0.35 of the typical magnitude.
    rel = np.abs(z_power - z_exact).max() / np.abs(z_exact).max()
    assert rel < 0.5


def test_idx_selection():
    adj = _random_adj(20, seed=12)
    a_hat = calc_A_hat(adj)
    h0 = jnp.asarray(np.random.RandomState(13).randn(20, 3).astype(np.float32))
    power = PPRPowerIteration(edges=edge_list_from_scipy(a_hat), alpha=0.2,
                              niter=5)
    idx = jnp.asarray([3, 7, 11])
    full = power(h0, train=False)
    sel = power(h0, idx, train=False)
    np.testing.assert_allclose(np.asarray(sel), np.asarray(full)[[3, 7, 11]])
    # Exact path: row selection before the matmul gives the same answer.
    exact = PPRExact(ppr=calc_ppr_exact(a_hat, 0.2))
    full_e = exact(h0, train=False)
    sel_e = exact(h0, idx, train=False)
    np.testing.assert_allclose(np.asarray(sel_e),
                               np.asarray(full_e)[[3, 7, 11]], rtol=1e-5)


def test_exact_large_n_selection_paths(monkeypatch):
    """Above the one-hot threshold, PPRExact switches selection
    strategy (eval: (Π@H)[idx] reassociation; train: one-hot dot) —
    both must match the small-n take path exactly (eval) /
    distributionally identically given the same key is not required
    (train masks differ only by which rows they cover)."""
    import ppnp_tpu.ops.exact as exact_mod

    adj = _random_adj(24, seed=21)
    a_hat = calc_A_hat(adj)
    ppr = calc_ppr_exact(a_hat, 0.1)
    h0 = jnp.asarray(
        np.random.RandomState(3).randn(24, 4).astype(np.float32))
    idx = jnp.asarray([1, 5, 9, 20])
    prop = PPRExact(ppr=ppr)

    small_eval = np.asarray(prop(h0, idx, train=False))
    monkeypatch.setattr(exact_mod, "_ONEHOT_SELECT_MIN_N", 8)
    large_eval = np.asarray(prop(h0, idx, train=False))
    np.testing.assert_allclose(large_eval, small_eval, rtol=1e-5,
                               atol=1e-6)
    # Train mode (one-hot selection dot before dropout): dropout keys
    # apply to the selected rows in both regimes, so with the same key
    # the outputs are bit-comparable only if the mask shapes match —
    # they do (|idx| × n) — and the one-hot selection is exact.
    key = jax.random.PRNGKey(7)
    large_train = np.asarray(prop(h0, idx, key=key, train=True))
    monkeypatch.setattr(exact_mod, "_ONEHOT_SELECT_MIN_N", 8192)
    small_train = np.asarray(prop(h0, idx, key=key, train=True))
    np.testing.assert_allclose(large_train, small_train, rtol=1e-5,
                               atol=1e-6)


def test_edge_dropout_statistics():
    """Train-mode propagation is stochastic with ≈unbiased expectation."""
    adj = _random_adj(30, seed=14)
    a_hat = calc_A_hat(adj)
    h0 = jnp.ones((30, 2), dtype=jnp.float32)
    power = PPRPowerIteration(edges=edge_list_from_scipy(a_hat), alpha=0.1,
                              niter=2, drop_prob=0.5)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    z1 = power(h0, train=True, key=k1)
    z2 = power(h0, train=True, key=k2)
    assert not np.allclose(np.asarray(z1), np.asarray(z2))
    # Without a key (or eval mode) propagation is deterministic.
    z3 = power(h0, train=False)
    z4 = power(h0, train=False)
    np.testing.assert_array_equal(np.asarray(z3), np.asarray(z4))
    # Monte-Carlo mean approaches the deterministic value (loose check).
    keys = jax.random.split(jax.random.PRNGKey(1), 200)
    zs = jax.vmap(lambda k: power(h0, train=True, key=k))(keys)
    mc = np.asarray(jnp.mean(zs, axis=0))
    np.testing.assert_allclose(mc, np.asarray(z3), rtol=0.25, atol=0.05)


def test_dense_dropout_statistics_and_quantization():
    """Packed-byte dropout: correct keep rate, exact inverted scaling at
    p=0.5 (a multiple of 1/256), rank-1 and rank-2 shapes, determinism."""
    from ppnp_tpu.ops.dropout import dropout

    key = jax.random.PRNGKey(5)
    x = jnp.ones((500, 333), jnp.float32)
    m = np.asarray(dropout(key, x, 0.5))
    kept = (m != 0).mean()
    assert 0.47 < kept < 0.53
    # survivors are exactly x / keep_q with keep_q = 0.5
    assert set(np.unique(m)) <= {0.0, 2.0}
    # deterministic per key
    m2 = np.asarray(dropout(key, x, 0.5))
    np.testing.assert_array_equal(m, m2)
    # rank-1, non-multiple-of-4 length, p not a multiple of 1/256
    x1 = jnp.ones((1001,), jnp.float32)
    m1 = np.asarray(dropout(jax.random.PRNGKey(6), x1, 0.3))
    keep_q = round(0.7 * 256) / 256
    kept1 = (m1 != 0).mean()
    assert abs(kept1 - keep_q) < 0.05
    surv = np.unique(m1[m1 != 0])
    np.testing.assert_allclose(surv, 1.0 / keep_q, rtol=1e-6)
    # rate 0 is the identity
    np.testing.assert_array_equal(
        np.asarray(dropout(key, x, 0.0)), np.asarray(x))
