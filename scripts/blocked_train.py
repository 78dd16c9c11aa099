"""End-to-end TRAINING at 500k nodes on one chip (blocked backend).

Maintained entry point (the source of BASELINE.md's "END-TO-END
TRAINING at 500k nodes" row). The reference's largest graph is MS
Academic (n=18.3k — SURVEY.md §2.1 "its ceiling"); bench
--blocked-scale measures eval-mode propagation at 500k/5M. This script
runs the FULL training pipeline at that scale — dense X (auto falls
back from the sparse fc1 above its VMEM bound), K=10 blocked
propagation fwd + transpose backward + stopping-set eval per epoch,
Adam, patience-100 early stopping — and prints one JSON line with
per-epoch cost + learnability evidence.

Synthetic banded homophilous graph (what a citation graph looks like
after RCM — same shape family as bench_blocked/bench_ingest):
labels = position block, edges ~N(0, bandwidth) off the diagonal so
~95% are intra-class; attributes are a class-informative bag of words.

Usage: python scripts/blocked_train.py [n_nodes] [max_epochs]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import scipy.sparse as sp


def make_banded_classified(n, n_edges, bandwidth, n_classes, n_features,
                           nnz_per_row, seed=0):
    rng = np.random.default_rng(seed)
    dst = rng.integers(0, n, n_edges)
    off = (rng.standard_normal(n_edges) * bandwidth).astype(np.int64)
    src = np.clip(dst + off, 0, n - 1)
    a = sp.coo_matrix((np.ones(n_edges, np.float32), (dst, src)),
                      shape=(n, n)).tocsr()
    a = a.maximum(a.T)
    a.setdiag(0)
    a.eliminate_zeros()
    a.data[:] = 1.0

    labels = (np.arange(n) * n_classes // n).astype(np.int32)

    # Class-informative sparse bag-of-words: each class owns a block of
    # features; 60% of a node's tokens come from its class block.
    block = n_features // n_classes
    rows = np.repeat(np.arange(n), nnz_per_row)
    n_own = int(nnz_per_row * 0.6)
    own = (labels[:, None] * block
           + rng.integers(0, block, (n, n_own))).reshape(-1)
    rand = rng.integers(0, n_features, (n, nnz_per_row - n_own)).reshape(-1)
    cols = np.concatenate(
        [own.reshape(n, n_own), rand.reshape(n, nnz_per_row - n_own)],
        axis=1).reshape(-1)
    attr = sp.coo_matrix(
        (np.ones(len(rows), np.float32), (rows, cols)),
        shape=(n, n_features)).tocsr()
    attr.sum_duplicates()

    from ppnp_tpu.data.sparsegraph import SparseGraph
    return SparseGraph(adj_matrix=a, attr_matrix=attr, labels=labels)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    max_epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 150

    from ppnp_tpu.kernels.blocked import build_blocked_pair_chunks
    from ppnp_tpu.ops.normalize import calc_A_hat
    from ppnp_tpu.ops.propagation import PPRPowerIteration
    from ppnp_tpu.ops.sparse import edge_list_from_scipy
    from ppnp_tpu.train import train_model
    from ppnp_tpu.utils.compcache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    jnp.zeros(8).block_until_ready()  # device init outside the timers

    t0 = time.perf_counter()
    g = make_banded_classified(n, n_edges=n * 10, bandwidth=2_000,
                               n_classes=16, n_features=512,
                               nnz_per_row=5, seed=0)
    t_gen = time.perf_counter() - t0
    a_hat = calc_A_hat(g.adj_matrix)

    t0 = time.perf_counter()
    bpc = build_blocked_pair_chunks(a_hat, rows_per_block=16384,
                                    reorder=None, with_adjoint=True)
    t_ingest = time.perf_counter() - t0
    prop = PPRPowerIteration(edges=edge_list_from_scipy(a_hat),
                             pair_chunks=bpc, alpha=0.1, niter=10,
                             drop_prob=0.5, backend="blocked")

    t0 = time.perf_counter()
    params, res = train_model(
        g, prop, test=True, seed=0, print_interval=0, epoch_chunk=25,
        stopping_args={"max_epochs": max_epochs, "patience": 100})
    t_train = time.perf_counter() - t0

    chunks = res["chunk_times"][1:] or res["chunk_times"]
    per_epoch = sorted(s / ne for ne, s in chunks)
    out = {
        "step": "blocked_train_500k",
        "n": int(a_hat.shape[0]), "nnz": int(a_hat.nnz),
        "n_classes": 16, "n_features": 512,
        "attr_nnz": int(g.attr_matrix.nnz),
        "niter": 10, "epochs_run": res["last_epoch"] + 1,
        "best_epoch": res["best_epoch"],
        "gen_s": round(t_gen, 2), "ingest_s": round(t_ingest, 2),
        "train_wall_s": round(t_train, 2),
        "s_per_epoch_median": per_epoch[len(per_epoch) // 2],
        "valtest_accuracy": res["valtest"]["accuracy"],
        "stopping_accuracy": res["early_stopping"]["accuracy"],
    }
    out["device"] = str(jax.devices()[0])
    print(json.dumps(out))


if __name__ == "__main__":
    main()
