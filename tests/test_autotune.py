"""Geometry autotuning: the count-only band walk must stay in lockstep
with the real packer, and the fitted issue-cost model must pick a
measured-best geometry on the sweep graph (docs/PERFORMANCE.md table;
VERDICT r1 item 3)."""

import numpy as np
import pytest
import scipy.sparse as sp

from ppnp_tpu.ops.pairchunks import (banded_segment_counts,
                                     estimate_step_cost, pair_chunks_auto,
                                     pair_chunks_banded, select_geometry)
from ppnp_tpu.utils.padding import round_up_to_multiple


def _banded_matrix(n, m, bw, seed=0):
    rng = np.random.default_rng(seed)
    dst = rng.integers(0, n, m)
    off = (rng.standard_normal(m) * bw).astype(np.int64)
    src = np.clip(dst + off, 0, n - 1)
    mat = sp.coo_matrix((np.ones(m, np.float32), (dst, src)),
                        shape=(n, n)).tocsr()
    mat.sum_duplicates()
    return mat


@pytest.mark.parametrize("window,window_src,chunk,spm", [
    (128, 128, 16, 32),
    (256, 128, 24, 32),
    (384, 128, 16, 64),
])
def test_segment_counts_match_packer(window, window_src, chunk, spm):
    """banded_segment_counts reproduces the packer's exact (n_seg, n_mid)
    — the count walk and pack walk must never drift apart."""
    mat = _banded_matrix(3000, 18000, 120, seed=3)
    n_rows_pad = max(round_up_to_multiple(mat.shape[0], 128), window)
    n_cols_pad = max(round_up_to_multiple(mat.shape[1], 128), window_src)
    n_rows_pad = n_cols_pad = max(n_rows_pad, n_cols_pad)
    dst = np.repeat(np.arange(mat.shape[0], dtype=np.int64),
                    np.diff(mat.indptr))
    src = mat.indices.astype(np.int64)
    nseg_b = banded_segment_counts(dst, src, n_rows_pad, n_cols_pad,
                                   window, window_src, chunk)
    n_mid = int(np.ceil(nseg_b / spm).sum())
    n_mid_pad = round_up_to_multiple(max(n_mid, 1), 16)
    pc = pair_chunks_banded(mat, window=window, window_src=window_src,
                            chunk=chunk, seg_per_mid=spm, device=False,
                            use_native="never")
    assert pc.n_mid == n_mid_pad
    assert pc.n_seg == n_mid_pad * spm


def test_model_picks_measured_best_on_sweep_graph():
    """On the MS Academic surrogate the model must land on a geometry the
    hand sweep measured at (or within 5% of) the best µs/step
    (docs/PERFORMANCE.md: (256,24,32) and (320,24,32) tied at 239)."""
    from ppnp_tpu.builders import load_graph
    from ppnp_tpu.config import RunConfig
    from ppnp_tpu.ops.normalize import calc_A_hat

    a_hat = calc_A_hat(load_graph(RunConfig(dataset="ms_academic"))
                       .adj_matrix)
    geo = select_geometry(a_hat, reorder="rcm")
    # measured µs/step per swept geometry (docs/PERFORMANCE.md)
    measured = {(128, 16, 32): 288, (256, 16, 64): 256,
                (256, 24, 32): 239, (256, 24, 16): 277,
                (256, 32, 32): 290, (320, 24, 32): 239,
                (384, 16, 96): 294}
    key = (geo["window"], geo["chunk"], geo["seg_per_mid"])
    assert key in measured, f"model picked unswept geometry {key}"
    assert measured[key] <= min(measured.values()) * 1.05


def test_model_cost_correlates_with_measured_sweep():
    """Predicted costs (via the count walk on the actual surrogate)
    must rank the swept banded geometries like the measured times do."""
    from scipy.stats import spearmanr

    from ppnp_tpu.builders import load_graph
    from ppnp_tpu.config import RunConfig
    from ppnp_tpu.ops.normalize import calc_A_hat
    from ppnp_tpu.ops.pairchunks import rcm_permutation

    a_hat = calc_A_hat(load_graph(RunConfig(dataset="ms_academic"))
                       .adj_matrix)
    perm = rcm_permutation(a_hat)
    iperm = np.empty_like(perm)
    iperm[perm] = np.arange(len(perm))
    coo = a_hat.tocoo()
    dst = iperm[coo.row.astype(np.int64)]
    src = iperm[coo.col.astype(np.int64)]
    order = np.lexsort((src, dst))
    dst, src = dst[order], src[order]

    sweep = [(128, 16, 32, 288), (256, 16, 64, 256), (256, 24, 32, 239),
             (256, 24, 16, 277), (256, 32, 32, 290), (320, 24, 32, 239),
             (384, 16, 96, 294), (512, 16, 128, 339)]
    n = a_hat.shape[0]
    preds, meas = [], []
    for window, chunk, spm, us in sweep:
        n_pad = max(round_up_to_multiple(n, 128), window)
        nseg_b = banded_segment_counts(dst, src, n_pad, n_pad,
                                       window, 128, chunk)
        n_mid = round_up_to_multiple(
            max(int(np.ceil(nseg_b / spm).sum()), 1), 16)
        preds.append(estimate_step_cost(n_mid * spm, n_mid, chunk,
                                        window, spm))
        meas.append(us)
    rho = spearmanr(preds, meas).statistic
    assert rho > 0.7, f"model ranking diverged from sweep (rho={rho:.2f})"


def test_pair_chunks_auto_packs_correctly():
    """Auto-geometry packing computes the same SpMM as scipy."""
    import jax.numpy as jnp

    from ppnp_tpu.kernels.spmm import spmm_pair_chunks

    mat = _banded_matrix(1200, 7000, 90, seed=5)
    pc = pair_chunks_auto(mat, use_native="never")
    h = np.random.RandomState(0).randn(1200, 16).astype(np.float32)
    out = np.asarray(spmm_pair_chunks(pc, jnp.asarray(h), interpret=True))
    np.testing.assert_allclose(out, mat @ h, rtol=2e-4, atol=2e-4)


def test_auto_layout_build_paths():
    """layout='auto' builds all three pallas-family propagators (power,
    blocked, sharded) with one globally-resolved geometry — per-shard/
    per-block packings must share static geometry to stack."""
    from ppnp_tpu.builders import build_propagator, load_graph
    from ppnp_tpu.config import RunConfig

    for backend, prop in (("pallas", "power"), ("blocked", "power"),
                          ("pallas", "sharded")):
        cfg = RunConfig(dataset="cora_ml", backend=backend,
                        propagation=prop, layout="auto",
                        rows_per_block=1024, n_shards=2)
        p = build_propagator(cfg, load_graph(cfg))
        assert p is not None


def test_auto_geometry_override():
    """Explicit geometry kwargs override the model's pick."""
    mat = _banded_matrix(800, 4000, 60, seed=9)
    pc = pair_chunks_auto(mat, chunk=16, device=False,
                          use_native="never")
    assert pc.chunk == 16


@pytest.mark.slow
def test_select_geometry_sampled_matches_full_count():
    """The >131k-row contiguous-slice sampling path must pick the same
    geometry as the full count walk (VERDICT r2 item 6: validated at
    500k/5M on 2026-08-19 — identical pick, sampled cost scaling within
    1% of the row fraction; this regression keeps a 300k-row guard)."""
    mat = _banded_matrix(300_000, 3_000_000, 2_000, seed=1)
    g_sampled = select_geometry(mat)       # default sample_rows=131072
    g_full = select_geometry(mat, sample_rows=mat.shape[0])
    g_sampled.pop("cost"), g_full.pop("cost")
    assert g_sampled == g_full
