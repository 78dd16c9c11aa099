"""Property-based tests (hypothesis) — SURVEY.md §4: split generator
stratification properties, normalization invariants, packing invariants.
"""

import numpy as np
import scipy.sparse as sp
from hypothesis import given, settings, strategies as st

from ppnp_tpu import preprocessing
from ppnp_tpu.ops.normalize import calc_A_hat
from ppnp_tpu.ops.pairchunks import pair_chunks_from_scipy


@settings(deadline=None, max_examples=20)
@given(
    n=st.integers(min_value=200, max_value=800),
    n_classes=st.integers(min_value=2, max_value=6),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    test=st.booleans(),
)
def test_split_properties(n, n_classes, seed, test):
    rng = np.random.RandomState(seed % 10000)
    labels = rng.randint(0, n_classes, size=n)
    # make sure every class has enough members
    for c in range(n_classes):
        labels[c * 20:(c + 1) * 20] = c
    args = {"ntrain_per_class": 5, "nstopping": 30,
            "nknown": min(150, n), "seed": seed}
    train, stop, valtest = preprocessing.gen_splits(labels, args, test=test)
    all_idx = np.concatenate([train, stop, valtest])
    # disjoint
    assert len(np.unique(all_idx)) == len(all_idx)
    # stratified: exactly 5 per class (classes guaranteed ≥20 members)
    for c in range(n_classes):
        assert (labels[train] == c).sum() == 5
    assert len(stop) == 30
    # in-range
    assert all_idx.min() >= 0 and all_idx.max() < n


@settings(deadline=None, max_examples=20)
@given(
    n=st.integers(min_value=2, max_value=300),
    density=st.floats(min_value=0.001, max_value=0.2),
    seed=st.integers(min_value=0, max_value=10000),
)
def test_a_hat_spectral_bound(n, density, seed):
    rng = np.random.RandomState(seed)
    a = sp.random(n, n, density=density, random_state=rng, format="csr")
    a = a.maximum(a.T)
    a.setdiag(0)
    a.eliminate_zeros()
    a.data[:] = 1.0
    a_hat = calc_A_hat(a.astype(np.float32))
    # symmetric with eigenvalues in [-1, 1]
    dense = a_hat.toarray()
    np.testing.assert_allclose(dense, dense.T, atol=1e-6)
    eigs = np.linalg.eigvalsh(dense)
    assert np.abs(eigs).max() <= 1.0 + 1e-5


@settings(deadline=None, max_examples=15)
@given(
    n_rows=st.integers(min_value=1, max_value=400),
    n_cols=st.integers(min_value=1, max_value=400),
    density=st.floats(min_value=0.0, max_value=0.1),
    seed=st.integers(min_value=0, max_value=10000),
)
def test_pair_chunk_invariants(n_rows, n_cols, density, seed):
    rng = np.random.RandomState(seed)
    a = sp.random(n_rows, n_cols, density=density, random_state=rng,
                  format="csr", dtype=np.float32)
    pc = pair_chunks_from_scipy(a, use_native="never")
    assert pc.n_seg % pc.seg_per_mid == 0
    assert pc.n_mid * pc.mid == pc.n_seg * pc.chunk
    # every weight of A appears exactly once among the slots
    w_slots = np.sort(np.asarray(pc.e_w).ravel())
    w_slots = w_slots[w_slots != 0]
    np.testing.assert_allclose(w_slots, np.sort(a.tocoo().data), rtol=1e-6)
    # locals within window; bases within padded dims and window-aligned
    assert np.asarray(pc.e_src).max(initial=0) < pc.window
    assert np.asarray(pc.e_dst).max(initial=0) < pc.window
    seg_bs = np.asarray(pc.seg_bs)
    mid_bd = np.asarray(pc.mid_bd)
    assert (seg_bs % pc.window == 0).all()
    assert (mid_bd % pc.window == 0).all()
    assert seg_bs.max(initial=0) < max(pc.n_cols_pad, 1)
    assert mid_bd.max(initial=0) < max(pc.n_rows_pad, 1)


def test_hashrng_matches_jax_threefry_and_is_uniform():
    """ops/hashrng implements exactly jax.random's Threefry-2x32 (so the
    edge-id-keyed masks inherit its statistical quality), and the stream
    looks uniform."""
    import jax
    import jax.numpy as jnp
    from jax._src import prng as jprng
    from ppnp_tpu.ops.hashrng import threefry2x32, uniform_bits

    k = jnp.asarray([0xDEADBEEF, 0x12345678], jnp.uint32)
    n = 4096
    c0 = jnp.arange(n, dtype=jnp.uint32)
    c1 = jnp.arange(n, 2 * n, dtype=jnp.uint32)
    ref = jprng.threefry_2x32(k, jnp.concatenate([c0, c1]))
    m0, m1 = threefry2x32(k[0], k[1], c0, c1)
    assert bool(jnp.all(m0 == ref[:n]) and jnp.all(m1 == ref[n:]))

    bits = np.asarray(uniform_bits(jax.random.PRNGKey(3), c0, c1))
    frac = (bits < np.uint32(2 ** 31)).mean()
    assert 0.47 < frac < 0.53
    # bytewise uniformity (the dropout threshold uses high-order bits)
    hi = bits >> 24
    counts = np.bincount(hi, minlength=256)
    assert counts.min() > 0  # every byte value hit at n=4096
