"""Sanitizers: corrupted packings must fail LOUDLY at pack/validate
time instead of silently mis-gathering through the kernel's clamped
dynamic slices (SURVEY.md §5 "Race detection / sanitizers" row;
VERDICT r1 item 9)."""

import numpy as np
import pytest
import scipy.sparse as sp

from ppnp_tpu.ops.pairchunks import (pair_chunks_banded,
                                     pad_stack_pair_chunks,
                                     validate_pair_chunks)


@pytest.fixture()
def packing():
    rng = np.random.default_rng(0)
    n, m = 900, 5000
    dst = rng.integers(0, n, m)
    src = np.clip(dst + (rng.standard_normal(m) * 60).astype(np.int64),
                  0, n - 1)
    mat = sp.coo_matrix((np.ones(m, np.float32), (dst, src)),
                        shape=(n, n)).tocsr()
    mat.sum_duplicates()
    return pair_chunks_banded(mat, device=False, use_native="never")


def test_valid_packing_passes(packing):
    validate_pair_chunks(packing)  # no raise


@pytest.mark.parametrize("corrupt,match", [
    (lambda pc: pc.replace(seg_bs=np.full_like(pc.seg_bs,
                                               pc.n_cols_pad)),
     "seg_bs outside"),
    (lambda pc: pc.replace(mid_bd=pc.mid_bd - 8 * (pc.n_rows_pad // 8)
                           - 8), "mid_bd outside"),
    (lambda pc: pc.replace(seg_bs=np.clip(
        pc.seg_bs + 3, 0, pc.n_cols_pad - pc.window_src)),
     "not 8-aligned"),
    (lambda pc: pc.replace(e_src=np.full_like(pc.e_src, pc.window_src)),
     "e_src outside"),
    (lambda pc: pc.replace(e_dst=np.full_like(pc.e_dst, pc.window)),
     "e_dst outside"),
    (lambda pc: pc.replace(e_w=np.full_like(pc.e_w, np.nan)),
     "non-finite"),
    (lambda pc: pc.replace(e_dst=pc.e_dst[:-1]), "e_dst"),
    (lambda pc: pc.replace(e_w=np.ones_like(pc.e_w)),
     "non-zero slots"),
])
def test_corrupted_packing_fails_loudly(packing, corrupt, match):
    with pytest.raises(ValueError, match=match):
        validate_pair_chunks(corrupt(packing))


def test_packers_validate_at_pack_time(monkeypatch):
    """The pack entry points run validation (auto mode, small pack)."""
    called = {}
    import ppnp_tpu.ops.pairchunks as pcm

    orig = pcm.validate_pair_chunks

    def spy(pc):
        called["yes"] = True
        return orig(pc)

    monkeypatch.setattr(pcm, "validate_pair_chunks", spy)
    mat = sp.random(300, 300, density=0.02, format="csr",
                    dtype=np.float32, random_state=np.random.RandomState(1))
    pcm.pair_chunks_banded(mat, device=False, use_native="never")
    assert called.get("yes")


def test_validate_disabled_by_env(monkeypatch, packing):
    import ppnp_tpu.ops.pairchunks as pcm

    monkeypatch.setenv("PPNP_TPU_VALIDATE", "0")
    bad = packing.replace(e_src=np.full_like(packing.e_src,
                                             packing.window_src))
    assert pcm._maybe_validate(bad) is bad  # no raise when disabled


def test_pad_stack_rejects_mismatched_geometry(packing):
    other = packing.replace(chunk=packing.chunk + 8)
    with pytest.raises(ValueError, match="static geometry"):
        pad_stack_pair_chunks([packing, other])
