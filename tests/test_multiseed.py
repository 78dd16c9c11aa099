"""Seed-batched training (ppnp_tpu.multiseed) vs the sequential path.

The parity contract: ``train_models(graph, prop, seeds)`` reproduces G
sequential ``train_model`` calls under the reproduce protocol — same
per-seed splits, init, dropout streams, early-stopping decisions.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ppnp_tpu.multiseed import train_models
from ppnp_tpu.ops.normalize import calc_A_hat
from ppnp_tpu.ops.propagation import PPRPowerIteration
from ppnp_tpu.ops.sparse import edge_list_from_scipy
from ppnp_tpu.train import train_model

SEEDS = [2144199730, 794209841, 2985733717]
SPLIT = {"ntrain_per_class": 10, "nstopping": 40, "nknown": 150}
STOP = {"max_epochs": 60, "patience": 15}


def _xla_prop(graph, niter=3):
    a_hat = calc_A_hat(graph.adj_matrix)
    return PPRPowerIteration(edges=edge_list_from_scipy(a_hat), alpha=0.1,
                             niter=niter, drop_prob=0.4)


def _pallas_prop(graph, niter=3):
    from ppnp_tpu.ops.pairchunks import (packer_for, slot_permutation,
                                         transpose_pair)

    a_hat = calc_A_hat(graph.adj_matrix)
    geo = dict(window=128, window_src=128, chunk=8, seg_per_mid=8,
               mids_per_step=4)
    pc = packer_for("banded")(a_hat, edge_ids="direct", reorder="rcm",
                              device=False, **geo)
    pc_t = transpose_pair(a_hat, layout="banded", device=False,
                          perm=np.asarray(pc.perm), **geo)
    perm = jnp.asarray(slot_permutation(pc, pc_t))
    return PPRPowerIteration(
        edges=edge_list_from_scipy(a_hat), pair_chunks=pc,
        pair_chunks_t=pc_t, w_perm=perm, alpha=0.1, niter=niter,
        drop_prob=0.4, backend="pallas")


def _sequential(graph, prop, seeds, **kw):
    out = []
    for s in seeds:
        _, res = train_model(
            graph, prop, seed=int(s), print_interval=0,
            idx_split_args=dict(SPLIT, seed=int(s) & 0x7FFFFFFF),
            stopping_args=dict(STOP), test=True, drop_prob=0.4, **kw)
        out.append(res)
    return out


@pytest.mark.parametrize("backend", ["xla", "pallas"])
def test_batched_matches_sequential(small_graph, backend):
    """Per-seed valtest accuracy, best epoch, and stop epoch of the
    batched sweep match the sequential sweep (same PRNG chains; CPU
    math is bit-stable across the two formulations)."""
    prop = (_xla_prop(small_graph) if backend == "xla"
            else _pallas_prop(small_graph))
    seq = _sequential(small_graph, prop, SEEDS)
    batched = train_models(
        small_graph, prop, SEEDS, drop_prob=0.4, test=True,
        idx_split_args=dict(SPLIT), stopping_args=dict(STOP),
        epoch_chunk=16)
    assert len(batched) == len(SEEDS)
    for (params_g, res_b), res_s in zip(batched, seq):
        assert res_b["best_epoch"] == res_s["best_epoch"]
        assert res_b["last_epoch"] == res_s["last_epoch"]
        np.testing.assert_allclose(res_b["valtest"]["accuracy"],
                                   res_s["valtest"]["accuracy"],
                                   atol=1e-12)
        np.testing.assert_allclose(res_b["valtest"]["f1_score"],
                                   res_s["valtest"]["f1_score"],
                                   atol=1e-12)


def test_batched_seeds_differ(small_graph):
    """Different seeds yield different splits/inits — the batched sweep
    must not silently share state across lanes."""
    prop = _xla_prop(small_graph)
    batched = train_models(
        small_graph, prop, SEEDS, drop_prob=0.4, test=True,
        idx_split_args=dict(SPLIT), stopping_args=dict(STOP),
        epoch_chunk=16)
    accs = [res["valtest"]["accuracy"] for _, res in batched]
    preds = [res["predictions"] for _, res in batched]
    # prediction vectors can't be identical across seeds (different
    # splits and inits) unless lanes leaked into each other
    assert not np.array_equal(preds[0], preds[1])
    assert all(0.0 <= a <= 1.0 for a in accs)


def test_batched_result_contract(small_graph):
    prop = _xla_prop(small_graph)
    (params, res), = train_models(
        small_graph, prop, SEEDS[:1], drop_prob=0.4, test=True,
        idx_split_args=dict(SPLIT), stopping_args=dict(STOP))
    assert {"train", "early_stopping", "valtest", "runtime",
            "last_epoch", "best_epoch"} <= set(res)
    assert isinstance(params, list) and params[0].ndim == 2


def test_batched_sub_batches_match_single(small_graph):
    """run_seed_sweep(batch_size=k) == one full batch, seed for seed
    (sub-batching only changes lane grouping, not per-seed streams)."""
    from ppnp_tpu.config import RunConfig
    from ppnp_tpu.reproduce import run_seed_sweep

    import dataclasses
    cfg = RunConfig(dataset="cora_ml", backend="xla", niter=3,
                    max_epochs=12, patience=1000, test=True)
    # Drive the small_graph directly through the sweep plumbing by
    # monkey-free means: use the dataset loader path is heavy, so call
    # multiseed.train_models twice instead - full batch vs two halves.
    from ppnp_tpu.multiseed import train_models
    from ppnp_tpu.ops.normalize import calc_A_hat
    from ppnp_tpu.ops.propagation import PPRPowerIteration
    from ppnp_tpu.ops.sparse import edge_list_from_scipy

    prop = PPRPowerIteration(
        edges=edge_list_from_scipy(calc_A_hat(small_graph.adj_matrix)),
        alpha=0.1, niter=3)
    kw = dict(hidden_units=(16,), test=True, epoch_chunk=6,
              stopping_args={"max_epochs": 12, "patience": 1000},
              idx_split_args={"ntrain_per_class": 10, "nstopping": 60,
                              "nknown": 200, "seed": 1})
    seeds = [11, 22, 33, 44]
    full = train_models(small_graph, prop, seeds, **kw)
    halves = (train_models(small_graph, prop, seeds[:2], **kw)
              + train_models(small_graph, prop, seeds[2:], **kw))
    for (pf, rf), (ph, rh) in zip(full, halves):
        assert rf["seed"] == rh["seed"]
        assert rf["valtest"]["accuracy"] == rh["valtest"]["accuracy"]
        for a, b in zip(pf, ph):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_safe_seed_batch_default(monkeypatch):
    """run_seed_sweep(batch_size=None) sub-batches at SAFE_SEED_BATCH on
    accelerators (the measured paper-scale fault boundary: G=5 clean,
    G>=8 faults the TPU worker — reproduce.SAFE_SEED_BATCH note) and
    stays single-batch on CPU, where tests rely on full grouping."""
    import jax

    from ppnp_tpu import reproduce as rp

    calls = []

    def fake_train_models(graph, prop, seeds, **kw):
        calls.append(list(seeds))
        return [(None, {"valtest": {"accuracy": 0.5, "f1_score": 0.5}})
                for _ in seeds]

    monkeypatch.setattr("ppnp_tpu.multiseed.train_models",
                        fake_train_models)
    monkeypatch.setattr(rp, "load_graph", lambda cfg: None)
    monkeypatch.setattr(rp, "build_propagator", lambda cfg, g: None)
    monkeypatch.setattr(rp, "train_kwargs",
                        lambda cfg: {"hidden_units": (16,)})
    monkeypatch.setattr("ppnp_tpu.train.prepare_attr_input",
                        lambda *a, **k: None)
    from ppnp_tpu.config import RunConfig
    cfg = RunConfig(dataset="cora_ml", backend="xla", test=True)

    rp.run_seed_sweep(cfg, seeds=list(range(10)), batched=True)
    assert [len(c) for c in calls] == [10]      # CPU: one full batch

    calls.clear()
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    rp.run_seed_sweep(cfg, seeds=list(range(10)), batched=True)
    assert [len(c) for c in calls] == [rp.SAFE_SEED_BATCH,
                                       10 - rp.SAFE_SEED_BATCH]

    calls.clear()                               # explicit size wins
    rp.run_seed_sweep(cfg, seeds=list(range(10)), batched=True,
                      batch_size=3)
    assert [len(c) for c in calls] == [3, 3, 3, 1]


def test_full_table_batch_size_passthrough(monkeypatch):
    """run_full_table forwards batched/batch_size to every power row."""
    from ppnp_tpu import reproduce as rp

    seen = []

    def fake_sweep(cfg, seeds=None, out_path=None, batched=None,
                   batch_size=None):
        seen.append((cfg.dataset, cfg.propagation, batched, batch_size))
        return {"mean_accuracy": 0.5, "ci95_accuracy": 0.01,
                "accuracies": [0.5], "f1_scores": [0.5]}

    monkeypatch.setattr(rp, "run_seed_sweep", fake_sweep)
    monkeypatch.setattr("ppnp_tpu.data.io.load_npz_dataset",
                        lambda name: None)
    rows = rp.run_full_table(datasets=["cora_ml"], nseeds=2,
                             batch_size=4)
    assert ("cora_ml", "power", None, 4) in seen
    # exact rows sweep serially — batched forced to auto/None there too
    assert all(b is None for (_, _, b, _) in seen)
    assert len(rows) == len(seen)
