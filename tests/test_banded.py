"""Banded (sliding-window) packing tests — interpreter mode on CPU.

The banded packer (`ppnp_tpu.ops.pairchunks.pair_chunks_banded`) must be
a drop-in PairChunks producer: same kernel, same slot-coordinate
contract (edge ids, slot permutation, shard stacking), denser slots.
"""

import functools
from unittest import mock

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from ppnp_tpu.kernels.spmm import (make_spmm_grad, spmm_pair_chunks)
from ppnp_tpu.ops.pairchunks import (pair_chunks_banded,
                                     pair_chunks_from_scipy,
                                     slot_permutation, transpose_pair)


@pytest.fixture(autouse=True)
def _clear_caches_per_test():
    """See test_kernel.py: XLA:CPU accumulates compiled programs."""
    yield
    jax.clear_caches()


interp = functools.partial(spmm_pair_chunks, interpret=True)


@pytest.mark.parametrize("n,density,c", [
    (300, 0.02, 16),
    (1000, 0.005, 128),
    (513, 0.01, 64),   # non-multiple-of-window row count
])
def test_banded_matches_scipy(n, density, c):
    rng = np.random.RandomState(n)
    a = sp.random(n, n, density=density, random_state=rng, format="csr",
                  dtype=np.float32)
    h = rng.randn(n, c).astype(np.float32)
    pc = pair_chunks_banded(a)
    assert pc.align == 8
    out = interp(pc, jnp.asarray(h))
    np.testing.assert_allclose(np.asarray(out), a @ h, rtol=1e-4, atol=1e-4)


def test_banded_rectangular():
    rng = np.random.RandomState(7)
    a = sp.random(200, 450, density=0.02, random_state=rng, format="csr",
                  dtype=np.float32)
    h = rng.randn(450, 32).astype(np.float32)
    pc = pair_chunks_banded(a)
    out = interp(pc, jnp.asarray(h))
    np.testing.assert_allclose(np.asarray(out), a @ h, rtol=1e-4, atol=1e-4)


def test_banded_hub_and_empty_rows():
    n = 260
    rng = np.random.RandomState(3)
    rows = np.concatenate([np.zeros(200, dtype=np.int64),
                           rng.randint(0, n // 2, size=300)])
    cols = rng.randint(0, n, size=500)
    w = rng.rand(500).astype(np.float32)
    a = sp.coo_matrix((w, (rows, cols)), shape=(n, n)).tocsr()
    a.sum_duplicates()
    h = rng.randn(n, 8).astype(np.float32)
    pc = pair_chunks_banded(a)
    out = interp(pc, jnp.asarray(h))
    np.testing.assert_allclose(np.asarray(out), a @ h, rtol=1e-4, atol=1e-4)


def test_banded_empty_matrix():
    a = sp.csr_matrix((256, 256), dtype=np.float32)
    h = np.ones((256, 4), np.float32)
    pc = pair_chunks_banded(a)
    out = interp(pc, jnp.asarray(h))
    np.testing.assert_allclose(np.asarray(out), 0.0)


def test_banded_slot_invariants():
    """Bases are 8-aligned and in range; locals fit their windows;
    every nonzero is represented exactly once."""
    rng = np.random.RandomState(17)
    a = sp.random(700, 700, density=0.01, random_state=rng, format="csr",
                  dtype=np.float32)
    pc = pair_chunks_banded(a, device=False)
    assert pc.align == 8
    assert (np.asarray(pc.seg_bs) % 8 == 0).all()
    assert (np.asarray(pc.mid_bd) % 8 == 0).all()
    assert np.asarray(pc.e_src).max() < pc.window_src
    assert np.asarray(pc.e_dst).max() < pc.window
    assert np.asarray(pc.mid_bd).max() <= pc.n_rows_pad - pc.window
    assert np.asarray(pc.seg_bs).max() <= pc.n_cols_pad - pc.window_src
    # reconstruct the matrix from slots
    chunk, spm = pc.chunk, pc.seg_per_mid
    e_w = np.asarray(pc.e_w).T.reshape(-1)
    e_src = np.asarray(pc.e_src).T.reshape(-1)
    e_dst = np.asarray(pc.e_dst).reshape(pc.n_seg // spm, spm, chunk
                                         ).reshape(-1)
    bs = np.repeat(np.asarray(pc.seg_bs), chunk)
    bd = np.repeat(np.asarray(pc.mid_bd), spm * chunk)
    valid = e_w != 0
    got = sp.coo_matrix(
        (e_w[valid], ((bd + e_dst)[valid], (bs + e_src)[valid])),
        shape=a.shape).tocsr()
    got.sum_duplicates()
    diff = abs(got - a)
    assert (diff.max() if diff.nnz else 0.0) == 0.0
    assert valid.sum() == a.nnz


def test_banded_denser_than_aligned():
    """The whole point: fewer OCCUPIED segments (→ fewer gather dots)
    than the aligned grid. At tiny sizes the mids_per_step round-up can
    equalize total slot counts, so compare real segments on a graph big
    enough for the window structure to matter (pack-only, no kernel)."""
    rng = np.random.RandomState(5)
    a = sp.random(4000, 4000, density=0.003, random_state=rng,
                  format="csr", dtype=np.float32)
    a = (a + a.T).tocsr()
    pc_a = pair_chunks_from_scipy(a, reorder="rcm", device=False,
                                  use_native="never")
    pc_b = pair_chunks_banded(a, reorder="rcm", device=False)
    occupied = lambda pc: int(  # noqa: E731
        np.count_nonzero((np.asarray(pc.e_w) != 0).any(axis=0)))
    assert occupied(pc_b) < occupied(pc_a)


def test_banded_reordered_transparent():
    rng = np.random.RandomState(11)
    a = sp.random(400, 400, density=0.02, random_state=rng, format="csr",
                  dtype=np.float32)
    a = a + a.T
    h = rng.randn(400, 8).astype(np.float32)
    pc = pair_chunks_banded(a, reorder="rcm")
    assert pc.perm is not None and pc.iperm is not None
    out = interp(pc, jnp.asarray(h))
    np.testing.assert_allclose(np.asarray(out), a @ h, rtol=1e-4, atol=1e-4)


def test_banded_grad_matches_dense_oracle():
    """make_spmm_grad over banded fwd+transpose packings == dense vjp."""
    from ppnp_tpu.kernels import spmm as spmm_mod

    rng = np.random.RandomState(23)
    a = sp.random(300, 300, density=0.02, random_state=rng, format="csr",
                  dtype=np.float32)
    a = (a + a.T).tocsr()
    pc = pair_chunks_banded(a, reorder="rcm")
    row_perm = np.asarray(pc.perm)
    pc_t = transpose_pair(a, perm=row_perm, layout="banded")
    w_perm = jnp.asarray(slot_permutation(pc, pc_t))

    h = rng.randn(300, 8).astype(np.float32)
    g = rng.randn(pc.n_rows_pad, 8).astype(np.float32)
    hp = jnp.asarray(np.pad(h[row_perm], ((0, pc.n_rows_pad - 300), (0, 0))))

    f = make_spmm_grad(pc, pc_t, w_perm, keep_padded=True)
    with mock.patch.object(spmm_mod, "spmm_pair_chunks", interp):
        out, vjp = jax.vjp(lambda hh: f(hh, pc.e_w), hp)
        (dh,) = vjp(jnp.asarray(g))

    ad = a[row_perm][:, row_perm]
    np.testing.assert_allclose(np.asarray(out)[:300],
                               ad @ np.asarray(hp)[:300],
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dh)[:300], ad.T @ g[:300],
                               rtol=1e-4, atol=1e-4)


def test_banded_edge_ids_consistent_across_packings():
    """Same (key, edge) → same Bernoulli draw in fwd + transpose banded
    layouts (id-keyed dropout contract)."""
    from ppnp_tpu.ops.dropout import edge_dropout_by_id

    rng = np.random.RandomState(5)
    a = sp.random(300, 300, density=0.02, random_state=rng, format="csr",
                  dtype=np.float32)
    pc = pair_chunks_banded(a)
    pc_t = transpose_pair(a, layout="banded")
    key = jax.random.PRNGKey(42)
    w = np.asarray(edge_dropout_by_id(key, pc, 0.5))
    w_t = np.asarray(edge_dropout_by_id(key, pc_t, 0.5))

    perm = slot_permutation(pc, pc_t)
    flat = w.T.reshape(-1)
    flat_t = w_t.T.reshape(-1)
    m = perm >= 0
    np.testing.assert_allclose(flat_t[m], flat[perm[m]], rtol=0, atol=0)


def test_banded_fused_matches_per_step():
    """Fused K-step kernel accepts a banded packing (align plumbed)."""
    from ppnp_tpu.kernels.fused import appnp_fused

    rng = np.random.RandomState(29)
    a = sp.random(256, 256, density=0.03, random_state=rng, format="csr",
                  dtype=np.float32)
    a = (a + a.T).tocsr()
    pc = pair_chunks_banded(a)
    h0 = jnp.asarray(rng.randn(256, 8).astype(np.float32))
    alpha, k = 0.15, 4

    out_f = appnp_fused(pc, h0, alpha=alpha, niter=k, interpret=True)
    h0p = jnp.pad(h0, ((0, pc.n_rows_pad - 256), (0, 0)))
    h = h0p
    for _ in range(k):
        h = interp(pc, h, e_w=(1 - alpha) * pc.e_w,
                   init=alpha * h0p, assume_permuted=True,
                   keep_padded=True)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(h),
                               rtol=1e-4, atol=1e-4)


# --------------------------------------------------------------------------
# Native (C++) banded packer: ppnp_tpu.native.pack_banded_native[_csr]
# must be BIT-IDENTICAL to the numpy fill (stable per-band src sort), so
# every array leaf is compared exactly, not just the SpMM result.
# --------------------------------------------------------------------------

_PC_ARRAY_FIELDS = ("seg_bs", "mid_bd", "e_src", "e_w", "e_dst",
                    "eid_hi", "eid_lo", "perm", "iperm")
_PC_STATIC_FIELDS = ("n_rows", "n_rows_pad", "n_cols_pad", "nnz", "n_cols",
                     "align", "window", "window_src", "chunk", "seg_per_mid",
                     "mids_per_step")


def _assert_packings_identical(a, b):
    for f in _PC_ARRAY_FIELDS:
        x, y = getattr(a, f), getattr(b, f)
        if x is None:
            assert y is None, f
        else:
            assert np.array_equal(np.asarray(x), np.asarray(y)), f
    for f in _PC_STATIC_FIELDS:
        assert getattr(a, f) == getattr(b, f), f


def _native_or_skip():
    from ppnp_tpu import native
    if not native.native_available():
        pytest.skip("native library unavailable (no compiler)")


@pytest.mark.parametrize("shape,density,kwargs", [
    ((500, 500), 0.01, {}),                    # CSR fast path (no perm)
    ((1000, 700), 0.004, {}),                  # rectangular
    ((40, 40), 0.3, {}),                       # dense, single band
    ((600, 600), 0.01, {"reorder": "rcm"}),    # COO path (perm relabel)
    ((300, 300), 0.02, {"window": 128, "window_src": 256, "chunk": 16}),
])
def test_banded_native_bit_identical(shape, density, kwargs):
    _native_or_skip()
    rng = np.random.RandomState(shape[0])
    a = sp.random(*shape, density=density, random_state=rng, format="csr",
                  dtype=np.float32)
    if "reorder" in kwargs:  # rcm needs a symmetric pattern
        a = ((a + a.T) > 0).astype(np.float32).tocsr()
    numpy_pc = pair_chunks_banded(a, use_native="never", device=False,
                                  **kwargs)
    native_pc = pair_chunks_banded(a, use_native="require", device=False,
                                   **kwargs)
    _assert_packings_identical(numpy_pc, native_pc)


def test_banded_native_duplicates_and_empty_rows():
    _native_or_skip()
    r = np.array([5, 5, 900, 2, 2])
    c = np.array([7, 7, 10, 600, 600])
    a = sp.coo_matrix((np.ones(5, np.float32), (r, c)), shape=(1000, 1000))
    _assert_packings_identical(
        pair_chunks_banded(a, use_native="never", device=False),
        pair_chunks_banded(a, use_native="require", device=False))


def test_banded_native_spmm_correct():
    """Native packing through the actual kernel against the scipy oracle."""
    _native_or_skip()
    rng = np.random.RandomState(11)
    a = sp.random(700, 700, density=0.008, random_state=rng, format="csr",
                  dtype=np.float32)
    h = rng.randn(700, 64).astype(np.float32)
    pc = pair_chunks_banded(a, use_native="require")
    out = interp(pc, jnp.asarray(h))
    np.testing.assert_allclose(np.asarray(out), a @ h, rtol=1e-4, atol=1e-4)


def test_banded_native_require_raises_when_unavailable():
    from ppnp_tpu import native
    a = sp.random(100, 100, density=0.05, random_state=np.random.RandomState(0),
                  format="csr", dtype=np.float32)
    with mock.patch.object(native, "get_lib", return_value=None):
        with pytest.raises(RuntimeError, match="native packer unavailable"):
            pair_chunks_banded(a, use_native="require", device=False)
        # "auto" must fall back silently to the numpy path
        pc = pair_chunks_banded(a, use_native="auto", device=False)
    _assert_packings_identical(
        pc, pair_chunks_banded(a, use_native="never", device=False))


def test_banded_native_empty_matrix():
    """require must work (not silently fall back) for nnz == 0 too."""
    _native_or_skip()
    a = sp.csr_matrix((100, 100), dtype=np.float32)
    _assert_packings_identical(
        pair_chunks_banded(a, use_native="never", device=False),
        pair_chunks_banded(a, use_native="require", device=False))


def test_banded_does_not_mutate_caller_matrix():
    """Packing must not canonicalize the caller's matrix in place."""
    indptr = np.array([0, 3, 3], dtype=np.int32)
    indices = np.array([4, 1, 1], dtype=np.int32)  # unsorted + duplicate
    data = np.array([1.0, 2.0, 3.0], dtype=np.float32)
    for mode in ("never", "auto"):
        a = sp.csr_matrix((data.copy(), indices.copy(), indptr.copy()),
                          shape=(2, 8))
        pair_chunks_banded(a, use_native=mode, device=False)
        assert a.nnz == 3
        np.testing.assert_array_equal(a.indices, indices)
        np.testing.assert_array_equal(a.data, data)
