"""Tests for split generation and attribute normalization.

Reference semantics (SURVEY.md §2.1 preprocessing row): stratified
ntrain_per_class, nstopping from a fixed known pool; val mode valtest from
the known pool remainder, test mode from everything outside the pool.
"""

import numpy as np
import pytest
import scipy.sparse as sp

from ppnp_tpu import preprocessing


@pytest.fixture
def labels():
    rng = np.random.RandomState(0)
    return rng.randint(0, 5, size=2000)


SPLIT_ARGS = {"ntrain_per_class": 20, "nstopping": 300, "nknown": 1000,
              "seed": 42}


def test_split_sizes_and_stratification(labels):
    train, stop, valtest = preprocessing.gen_splits(labels, SPLIT_ARGS)
    assert len(train) == 20 * 5
    assert len(stop) == 300
    for c in range(5):
        assert (labels[train] == c).sum() == 20
    # val mode: valtest from known pool remainder
    assert len(valtest) == 1000 - len(train) - len(stop)


def test_split_disjoint(labels):
    train, stop, valtest = preprocessing.gen_splits(labels, SPLIT_ARGS)
    all_idx = np.concatenate([train, stop, valtest])
    assert len(np.unique(all_idx)) == len(all_idx)


def test_test_mode_population(labels):
    train, stop, valtest = preprocessing.gen_splits(labels, SPLIT_ARGS,
                                                    test=True)
    # test mode: valtest is everything outside the known pool
    assert len(valtest) == len(labels) - 1000
    known = set(train.tolist()) | set(stop.tolist())
    assert known.isdisjoint(set(valtest.tolist()))


def test_known_pool_stable_across_seeds(labels):
    """The known/unknown division is fixed; only train/stop resample."""
    args_a = dict(SPLIT_ARGS, seed=1)
    args_b = dict(SPLIT_ARGS, seed=2)
    _, _, test_a = preprocessing.gen_splits(labels, args_a, test=True)
    _, _, test_b = preprocessing.gen_splits(labels, args_b, test=True)
    np.testing.assert_array_equal(np.sort(test_a), np.sort(test_b))


def test_split_determinism(labels):
    a = preprocessing.gen_splits(labels, SPLIT_ARGS)
    b = preprocessing.gen_splits(labels, SPLIT_ARGS)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_normalize_attributes_sparse():
    attr = sp.random(50, 20, density=0.3, format="csr", dtype=np.float32)
    norm = preprocessing.normalize_attributes(attr)
    sums = np.asarray(norm.sum(axis=1)).ravel()
    nonzero_rows = np.asarray(attr.sum(axis=1)).ravel() > 0
    np.testing.assert_allclose(sums[nonzero_rows], 1.0, rtol=1e-5)
    np.testing.assert_allclose(sums[~nonzero_rows], 0.0)


def test_normalize_attributes_dense():
    attr = np.abs(np.random.RandomState(0).rand(30, 10)).astype(np.float32)
    attr[5] = 0.0  # zero row
    norm = preprocessing.normalize_attributes(attr)
    sums = norm.sum(axis=1)
    np.testing.assert_allclose(np.delete(sums, 5), 1.0, rtol=1e-5)
    assert sums[5] == 0.0


def test_exclude_idx():
    idx = np.arange(10)
    out = preprocessing.exclude_idx(idx, [np.array([1, 3]), np.array([5])])
    np.testing.assert_array_equal(out, [0, 2, 4, 6, 7, 8, 9])


def test_gen_seeds_uint32_contract():
    """Array dtype is uint32 (the reference's return type; VERDICT r1
    minor item) and the scalar form is a plain int in range."""
    import numpy as np

    from ppnp_tpu.preprocessing import gen_seeds

    a = gen_seeds(16)
    assert a.dtype == np.uint32 and a.shape == (16,)
    s = gen_seeds()
    assert isinstance(s, int) and 0 <= s <= np.iinfo(np.uint32).max
