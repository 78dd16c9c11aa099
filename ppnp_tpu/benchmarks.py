"""Benchmark harness: propagation throughput and roofline accounting.

The reference publishes no throughput numbers (SURVEY.md §6); the
north-star metrics are BASELINE.json:2,5 — propagation steps/s/chip,
effective SpMM bandwidth vs the HBM roofline, and multi-host scaling.
This module measures them; the repo-root ``bench.py`` wraps it into the
driver's one-line JSON contract.
"""

from __future__ import annotations

import logging
import time
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ppnp_tpu.config import RunConfig
from ppnp_tpu.builders import load_graph, resolve_alpha
from ppnp_tpu.ops.normalize import calc_A_hat
from ppnp_tpu.ops.pairchunks import pair_chunks_banded
from ppnp_tpu.ops.propagation import PPRPowerIteration
from ppnp_tpu.ops.sparse import edge_list_from_scipy

logger = logging.getLogger(__name__)

__all__ = ["bench_propagation", "HBM_BYTES_PER_S"]

# v5e HBM bandwidth (pltpu.get_tpu_info().mem_bw_bytes_per_second).
HBM_BYTES_PER_S = 820e9


def _sync(r) -> None:
    """Force execution of ``r`` and everything queued before it.

    ``block_until_ready`` is NOT sufficient on the tunneled axon
    platform: for large outputs (measured at n=500k, c=128 — a 256MB
    result) it returns immediately while execution is still deferred,
    so a timing loop that only blocks reads ~0.1ms "per call" for a
    multi-second program. A small device→host fetch forces the whole
    (ordered) dispatch queue to retire. The fetch is ≥8 elements —
    single-element transfers are pathologically slow here
    (docs/PERFORMANCE.md "platform hazard").
    """
    leaf = jnp.ravel(jax.tree.leaves(r)[0])
    np.asarray(leaf[: min(8, leaf.shape[0])])


def _time(f, *args, iters: int = 30) -> float:
    """Median-of-3 timing with a FRESH first argument per call.

    The tunneled single-chip platform shows large timing artifacts when
    the same input buffer is replayed (observed 2x swings); perturbing
    the first arg per call and taking the median of three trials gives
    stable numbers. Each trial ends with a small device→host fetch
    (``_sync``) rather than ``block_until_ready`` — see ``_sync``.
    """
    h0, rest = args[0], args[1:]
    variants = [h0 + jnp.float32(i) * 1e-6 for i in range(iters)]
    jax.block_until_ready(variants)
    r = f(variants[0], *rest)
    _sync(r)
    trials = []
    for _ in range(3):
        t0 = time.perf_counter()
        for h in variants:
            r = f(h, *rest)
        _sync(r)
        t1 = time.perf_counter()
        # Re-sync the now-ready result: pure fetch/RTT cost (~27ms on
        # this tunnel), subtracted so the fetch doesn't inflate short
        # trials. Clamped — a degraded-window spike on the second fetch
        # must not produce a negative measurement.
        _sync(r)
        t_fetch = time.perf_counter() - t1
        trials.append(max((t1 - t0) - t_fetch, (t1 - t0) * 0.1) / iters)
    return sorted(trials)[1]


def bench_propagation(
    dataset: str = "ms_academic",
    c: int = 128,
    niter: int = 100,
    iters: int = 10,
    backends: Sequence[str] = ("xla", "pallas"),
    seed: int = 0,
    layout: str = "banded",
) -> Dict:
    """Time K-step APPNP propagation per backend on a dataset's graph.

    Returns per-backend {seconds, steps_per_s, effective_gbps} plus the
    speed-of-light accounting: bytes/step ≈ nnz·(4+4) + 2·n·c·4
    (edge stream + H in/out, BASELINE.md's roofline formula).

    ``niter`` defaults to a 100-step chain so the number reflects the
    STEADY-STATE per-step cost: this platform's remote-tunnel dispatch
    costs ~1.3ms per jit call, which at the model's K=10 would add a
    constant +130µs/step of pure launch latency to every backend (in
    real training the launch cost amortizes across the whole jitted
    epoch chunk, so the chained measurement is the faithful one).
    """
    cfg = RunConfig(dataset=dataset)
    graph = load_graph(cfg)
    a_hat = calc_A_hat(graph.adj_matrix)
    alpha = resolve_alpha(cfg)
    n = graph.num_nodes()
    nnz = a_hat.nnz
    rng = np.random.RandomState(seed)
    h0 = jnp.asarray(rng.randn(n, c).astype(np.float32))

    bytes_per_step = nnz * 8 + 2 * n * c * 4
    sol_step_s = bytes_per_step / HBM_BYTES_PER_S

    edges = edge_list_from_scipy(a_hat)
    result: Dict = {
        "dataset": dataset, "n": n, "nnz": int(nnz), "c": c,
        "niter": niter,
        "bytes_per_step": int(bytes_per_step),
        "sol_step_us": sol_step_s * 1e6,
        "device": str(jax.devices()[0]),
        "backends": {},
    }
    result["layout"] = layout
    for backend in backends:
        # Packing failures must land in the per-backend error protocol
        # too: an escaped pack-time exception kills the bench.py child
        # with no JSON line and gets misdiagnosed as a hung tunnel.
        try:
            if backend == "pallas":
                from ppnp_tpu.ops.pairchunks import packer_for
                # Auto layout gets the feature width: the cost model's
                # lane-tile term moves the optimum at c >= 256.
                c_kw = {"c": c} if layout == "auto" else {}
                pc = packer_for(layout)(a_hat, reorder="rcm", **c_kw)
            elif backend == "blocked":
                # HBM-streaming row blocks (kernels/blocked.py) — the
                # single-chip path for graphs whose H outgrows VMEM.
                from ppnp_tpu.kernels.blocked import \
                    build_blocked_pair_chunks
                pc = build_blocked_pair_chunks(a_hat, with_adjoint=False)
            else:
                pc = None
            prop = jax.device_put(PPRPowerIteration(
                edges=edges, pair_chunks=pc, alpha=alpha, niter=niter,
                backend=backend))
            # The propagator rides as a jit ARGUMENT, not a closure:
            # closed-over packings become inline HLO constants, and at
            # production graph sizes (bench_blocked: ~100MB of packed
            # arrays) the constant-laden program crashes this platform's
            # remote compile helper (HTTP 500, measured 2026-08-18).
            f = jax.jit(lambda h, p: p(h, train=False))
            t = _time(f, h0, prop, iters=iters)
        except Exception as e:  # pragma: no cover - backend unavailable
            logger.warning("backend %s failed: %s", backend, str(e)[:200])
            result["backends"][backend] = {"error": str(e)[:500]}
            continue
        step_s = t / niter
        result["backends"][backend] = {
            "seconds_per_call": t,
            "steps_per_s": 1.0 / step_s,
            "effective_gbps": bytes_per_step / step_s / 1e9,
            "fraction_of_sol": sol_step_s / step_s,
        }
        if backend == "pallas" and hasattr(pc, "n_seg"):
            # The BINDING roofline for this op (docs/PERFORMANCE.md
            # "Where the time goes"): MXU issue, not HBM bytes.
            result["backends"][backend].update(
                issue_floor_stats(pc, c, step_s))
        logger.info("%s: %.0f steps/s (%.1f us/step, %.1f%% of SOL)",
                    backend, 1 / step_s, step_s * 1e6,
                    100 * sol_step_s / step_s)
    return result


# Calibration of the fitted issue-cost model (ops/pairchunks.py
# ``estimate_step_cost``, arbitrary units) to wall microseconds:
# the healthy-window MS Academic measurement (215 µs/step, BASELINE.md
# 2026-08-18, banded chunk=24/window=256/spm=32 packing with
# n_seg=11,776 / n_mid=368 → 563,997 model units) gives
# 563,997 / 215 ≈ 2,623 units/µs. The model's RELATIVE accuracy over
# the 9-point geometry sweep is 2.4% mean / 5.3% max; this single
# constant pins its absolute scale.
ISSUE_UNITS_PER_US = 2623.2


def issue_floor_stats(pc, c: int, step_s: float) -> Dict:
    """Binding-roofline accounting for a pair-chunks packing.

    Reports (VERDICT r4 item 5) alongside the diagnostic-only HBM
    fraction:

    - ``padding_frac`` — fraction of kernel edge slots that are
      padding (``1 − nnz / (chunk · n_seg)``): the issue floor is
      proportional to slot count, so this is the headroom knob;
    - ``issue_floor_us`` — the fitted issue-cost model evaluated at
      ZERO padding (every chunk-slot full: ``n_seg = ⌈nnz/chunk⌉``),
      scaled to µs via ``ISSUE_UNITS_PER_US``;
    - ``issue_model_us`` — the model at the ACTUAL packed geometry
      (its error vs the measured step is the model's absolute fit);
    - ``fraction_of_issue_floor`` — issue_floor_us / measured step µs:
      1.0 = at the zero-padding one-hot issue floor, the speed-of-light
      for this schedule on this hardware.
    """
    from ppnp_tpu.ops.pairchunks import estimate_step_cost

    slots = pc.chunk * pc.n_seg
    n_seg_floor = -(-pc.nnz // pc.chunk)
    n_mid_floor = -(-n_seg_floor // pc.seg_per_mid)
    floor_us = estimate_step_cost(
        n_seg_floor, n_mid_floor, pc.chunk, pc.window, pc.seg_per_mid,
        c=c) / ISSUE_UNITS_PER_US
    model_us = estimate_step_cost(
        pc.n_seg, pc.n_mid, pc.chunk, pc.window, pc.seg_per_mid,
        c=c) / ISSUE_UNITS_PER_US
    return {
        "padding_frac": 1.0 - pc.nnz / slots,
        "issue_floor_us": floor_us,
        "issue_model_us": model_us,
        "fraction_of_issue_floor": floor_us / (step_s * 1e6),
    }


def bench_c_sweep(
    dataset: str = "ms_academic",
    cs: Sequence[int] = (16, 64, 128, 256),
    niter: int = 100,
    iters: int = 5,
    backends: Sequence[str] = ("xla", "pallas"),
    seed: int = 0,
    layout: str = "banded",
) -> Dict:
    """Propagation throughput across feature widths c.

    Characterizes where the Pallas kernel's advantage starts/ends at the
    widths the system actually uses: training propagates logits at
    c = n_classes (3-15), retrieval embeds at d = 64, the headline bench
    at c = 128 (VERDICT r1 item 8). Each width is a separate
    bench_propagation run (fresh packing — the packing is c-independent
    but cheap relative to measurement).
    """
    result: Dict = {"dataset": dataset, "niter": niter, "cs": list(cs),
                    "layout": layout,
                    "device": str(jax.devices()[0]), "sweep": {}}
    for c in cs:
        res = bench_propagation(dataset=dataset, c=int(c), niter=niter,
                                iters=iters, backends=backends, seed=seed,
                                layout=layout)
        row = {}
        for b, v in res["backends"].items():
            row[b] = ({"error": v["error"]} if "error" in v else
                      {"steps_per_s": v["steps_per_s"],
                       "us_per_step": 1e6 / v["steps_per_s"]})
        ok = {b: v for b, v in row.items() if "error" not in v}
        if "xla" in ok and len(ok) > 1:
            best = max((b for b in ok if b != "xla"),
                       key=lambda b: ok[b]["steps_per_s"])
            row["speedup_vs_xla"] = (ok[best]["steps_per_s"]
                                     / ok["xla"]["steps_per_s"])
        result["sweep"][int(c)] = row
        result["n"], result["nnz"] = res["n"], res["nnz"]
    return result


def bench_blocked(
    n_nodes: int = 500_000,
    n_edges: int = 5_000_000,
    bandwidth: int = 2_000,
    c: int = 128,
    niter: int = 20,
    iters: int = 3,
    rows_per_block: int = 16384,
    seed: int = 0,
    layout: str = "banded",
) -> Dict:
    """XLA vs blocked HBM-streaming propagation on a VMEM-exceeding graph.

    At the default size H alone is n·c·4 = 256MB — far beyond the
    VMEM-resident kernel's reach on one chip — so the contenders are the
    XLA gather+segment-sum path and ``kernels.blocked``. The graph is the
    synthetic banded shape of ``bench_ingest`` (what citation graphs look
    like after RCM), so ``reorder=None`` at pack time: the bandwidth is
    already bounded.
    """
    import scipy.sparse as sp

    from ppnp_tpu.kernels.blocked import build_blocked_pair_chunks

    rng = np.random.default_rng(seed)
    dst = rng.integers(0, n_nodes, n_edges)
    off = (rng.standard_normal(n_edges) * bandwidth).astype(np.int64)
    src = np.clip(dst + off, 0, n_nodes - 1)
    a_hat = sp.coo_matrix((np.ones(n_edges, np.float32), (dst, src)),
                          shape=(n_nodes, n_nodes)).tocsr()
    a_hat.sum_duplicates()
    del dst, src, off
    nnz = int(a_hat.nnz)

    bytes_per_step = nnz * 8 + 2 * n_nodes * c * 4
    sol_step_s = bytes_per_step / HBM_BYTES_PER_S
    result: Dict = {
        "n": n_nodes, "nnz": nnz, "c": c, "niter": niter,
        "bandwidth": bandwidth, "rows_per_block": rows_per_block,
        "bytes_per_step": int(bytes_per_step),
        "sol_step_us": sol_step_s * 1e6,
        "device": str(jax.devices()[0]),
        "backends": {},
    }
    h0 = jnp.asarray(np.random.RandomState(seed).randn(n_nodes, c)
                     .astype(np.float32))
    for backend in ("xla", "blocked"):
        if backend == "blocked":
            pc = build_blocked_pair_chunks(
                a_hat, rows_per_block=rows_per_block, reorder=None,
                with_adjoint=False, c=c,
                geometry=("auto" if layout == "auto" else None))
            result["geometry"] = {
                "window": pc.pcs.window, "window_src": pc.pcs.window_src,
                "chunk": pc.pcs.chunk, "seg_per_mid": pc.pcs.seg_per_mid}
            prop = PPRPowerIteration(edges=None, pair_chunks=pc,
                                     alpha=0.1, niter=niter,
                                     backend="blocked")
        else:
            prop = PPRPowerIteration(edges=edge_list_from_scipy(a_hat),
                                     alpha=0.1, niter=niter, backend="xla")
        # Argument, not closure: at this scale the packings are ~100MB;
        # baked in as HLO constants they crash the remote compile helper
        # (HTTP 500 "tpu_compile_helper subprocess exit code 1",
        # measured 2026-08-18 at 500k nodes / 5M edges).
        prop = jax.device_put(prop)
        f = jax.jit(lambda h, p: p.propagate(h, train=False))
        try:
            t = _time(f, h0, prop, iters=iters)
        except Exception as e:  # pragma: no cover - backend unavailable
            logger.warning("backend %s failed: %s", backend, str(e)[:200])
            result["backends"][backend] = {"error": str(e)[:500]}
            continue
        step_s = t / niter
        result["backends"][backend] = {
            "seconds_per_call": t,
            "steps_per_s": 1.0 / step_s,
            "effective_gbps": bytes_per_step / step_s / 1e9,
            "fraction_of_sol": sol_step_s / step_s,
        }
        logger.info("%s: %.0f steps/s (%.1f ms/step, %.1f%% of SOL)",
                    backend, 1 / step_s, step_s * 1e3,
                    100 * sol_step_s / step_s)
    b = result["backends"]
    if "error" not in b.get("blocked", {"error": 1}) and        "error" not in b.get("xla", {"error": 1}):
        result["blocked_speedup"] = (b["blocked"]["steps_per_s"]
                                     / b["xla"]["steps_per_s"])
    return result


def bench_scaling(
    dataset: str = "pubmed",
    c: int = 128,
    niter: int = 10,
    iters: int = 10,
    n_shards_list: Optional[Sequence[int]] = None,
    exchange: str = "alltoall",
    seed: int = 0,
    backend: str = "xla",
    pack_kwargs: Optional[Dict] = None,
) -> Dict:
    """Strong-scaling of sharded propagation over the local device mesh.

    BASELINE.json:5's ≥0.8 scaling-efficiency target needs a real multi-
    chip pod; on a single chip this measures the n=1 degenerate case, and
    on the CPU test mesh it validates the trend functionally. Efficiency
    at n devices = steps_per_s(n) / (n · steps_per_s(1)).
    """
    from ppnp_tpu.parallel.mesh import make_mesh
    from ppnp_tpu.parallel.partition import (build_sharded_graph,
                                             build_sharded_pair_chunks)
    from ppnp_tpu.parallel.sharded import ShardedPowerIteration

    # Same ingest as the real sharded path (builders.load_graph with
    # propagation="sharded"): RCM-relabel BEFORE row-partitioning so
    # boundaries reflect the production configuration, not the raw
    # node numbering.
    cfg = RunConfig(dataset=dataset, propagation="sharded",
                    shard_reorder="rcm")
    graph = load_graph(cfg)
    a_hat = calc_A_hat(graph.adj_matrix)
    alpha = resolve_alpha(cfg)
    rng = np.random.RandomState(seed)

    if n_shards_list is None:
        nd = jax.device_count()
        n_shards_list = sorted({1, 2, nd} & set(range(1, nd + 1))) or [1]

    result: Dict = {"dataset": dataset, "n": graph.num_nodes(),
                    "nnz": int(a_hat.nnz), "c": c, "niter": niter,
                    "exchange": exchange,
                    "devices": [str(d) for d in jax.devices()],
                    "shards": {}}
    base_sps = None
    for ns in n_shards_list:
        if ns > jax.device_count():
            continue
        mesh = make_mesh(n_devices=ns)
        sg = build_sharded_graph(a_hat, n_shards=ns)
        pc = None
        if backend == "pallas":
            # pack_kwargs lets CPU-mesh (interpret-mode) runs shrink the
            # kernel's static unroll (mids_per_step·spm inline dots) —
            # XLA:CPU compiles of the full TPU geometry take minutes.
            pc, _, _ = build_sharded_pair_chunks(sg, with_adjoint=False,
                                                 **(pack_kwargs or {}))
        prop = ShardedPowerIteration(graph=sg, mesh=mesh, pair_chunks=pc,
                                     alpha=alpha, niter=niter,
                                     exchange=exchange, backend=backend)
        h0 = jax.device_put(
            jnp.asarray(rng.randn(sg.n_pad, c).astype(np.float32)),
            prop.input_sharding())
        # Argument, not closure (see bench_propagation): one device_put
        # commits the tables so the timed loop never re-uploads them;
        # jit inserts any reshard the shard_map in_specs require.
        prop = jax.device_put(prop)
        f = jax.jit(lambda h, p: p(h, train=False))
        t = _time(f, h0, prop, iters=iters)
        sps = niter / t
        if base_sps is None:
            base_sps = sps
        result["shards"][ns] = {
            "steps_per_s": sps,
            "boundary_rows": sg.boundary,
            # all_to_all per step: every shard sends its (padded)
            # boundary-row block to each of ns peers — B·c·4 bytes per
            # (src, dst) shard pair. This scales with the partition CUT
            # (≈ graph bandwidth after RCM), not with n.
            "comm_bytes_per_step": ns * ns * sg.boundary * c * 4,
            "interior_edge_fraction": (sg.interior_pad
                                       / max(sg.edges_pad, 1)),
            "efficiency": sps / (ns * base_sps),
        }
        logger.info("%d shards: %.0f steps/s (eff %.2f)", ns, sps,
                    sps / (ns * base_sps))
    return result


def bench_training(
    dataset: str = "cora_ml",
    backend: str = "pallas",
    epochs: int = 200,
    seed: int = 0,
    x_dtype=None,
    x_format: str = "auto",
    epoch_chunk: int = 50,
    propagation: str = "power",
    n_shards: Optional[int] = None,
) -> Dict:
    """Steady-state training throughput (epochs/s), compile excluded.

    One epoch = the reference protocol's unit of work (SURVEY.md §3.1):
    full-batch forward (K SpMMs) + backward (K transpose SpMMs) + the
    stopping-set eval forward (K SpMMs), all inside the jitted epoch
    chunk. The first chunk is discarded as warm-up/compile.

    ``propagation="sharded"`` measures the FULL sharded training epoch
    (DP MLP + shard_map propagation with boundary exchange) on the real
    mesh — the on-chip sharded-training number VERDICT r4 item 4 asks
    for (the 1-device mesh runs the complete machinery; x_format stays
    dense there, as sharded training requires).
    """
    import jax.numpy as jnp
    from ppnp_tpu.builders import build_propagator
    from ppnp_tpu.train import prepare_attr_input, train_model

    cfg = RunConfig(dataset=dataset, propagation=propagation,
                    backend=backend, n_shards=n_shards,
                    print_interval=0)
    graph = load_graph(cfg)
    prop = build_propagator(cfg, graph)
    x_prepared = prepare_attr_input(graph, prop, x_format=x_format,
                                    x_dtype=x_dtype)

    # Warm-up run compiles the chunk (cached across train_model calls);
    # same chunk size as the timed run so no recompile is timed — epochs
    # is rounded to a multiple of the chunk so the timed run never
    # compiles a differently-shaped remainder chunk.
    chunk = min(epochs, epoch_chunk)
    epochs = max(chunk, (epochs // chunk) * chunk)
    train_model(graph, prop, stopping_args={"max_epochs": chunk,
                                            "patience": 10 ** 6},
                seed=seed, print_interval=0, epoch_chunk=chunk,
                x_dtype=x_dtype, x_format=x_format,
                x_prepared=x_prepared)
    t0 = time.perf_counter()
    _, res = train_model(graph, prop,
                         stopping_args={"max_epochs": epochs,
                                        "patience": 10 ** 6},
                         seed=seed, print_interval=0,
                         epoch_chunk=chunk, x_dtype=x_dtype,
                         x_format=x_format, x_prepared=x_prepared)
    wall = time.perf_counter() - t0
    # Steady state = median per-epoch cost over the jitted epoch chunks
    # (chunk dispatch + device work + the per-chunk metric download),
    # discarding the first chunk as warm-up when more than one ran.
    # Whole-call wall additionally carries per-call fixed costs — the
    # 500MB X upload, host preprocessing — which are large and carry
    # ±50% noise on the tunneled platform, so they are reported
    # separately instead of polluting the per-epoch number.
    chunks = res["chunk_times"][1:] or res["chunk_times"]
    per_epoch = sorted(s / n for n, s in chunks)
    steady = per_epoch[(len(per_epoch) - 1) // 2]
    return {
        "dataset": dataset, "backend": backend, "epochs": epochs,
        "propagation": propagation,
        "x_dtype": str(jnp.dtype(x_dtype or jnp.float32).name),
        "x_format": res["x_format"],
        "epochs_per_s": 1.0 / steady,
        "s_per_epoch": steady,
        "fixed_overhead_s": wall - sum(s for _, s in res["chunk_times"]),
        "wall_s": wall,
        "valtest_accuracy": res["valtest"]["accuracy"],
        "device": str(jax.devices()[0]),
    }


def bench_training_breakdown(
    dataset: str = "ms_academic",
    backend: str = "pallas",
    x_format: str = "auto",
    x_dtype=None,
    iters: int = 30,
) -> Dict:
    """Per-epoch cost decomposition: where does the epoch time go?

    Times each component of the reference's per-epoch unit of work
    (SURVEY.md §3.1) as an independent jitted function: the training
    step (loss fwd + backward + Adam), the stopping-set eval forward,
    and their sub-parts (MLP tower vs K-step propagation, each in train
    and eval mode). Components overlap — e.g. ``grad_step`` contains
    ``fwd_loss`` — so the table reads as a containment hierarchy, not a
    partition; ``train_step + eval_fwd`` should approximate the
    steady-state epoch time measured by ``bench_training``.
    """
    import optax
    from ppnp_tpu.builders import build_propagator
    from ppnp_tpu.models.appnp import (init_mlp_params, l2_reg,
                                       mlp_forward, ppnp_forward)
    from ppnp_tpu.ops.sparse_input import SparseInput
    from ppnp_tpu.train import (_nll, default_idx_split_args,
                                prepare_attr_input)
    from ppnp_tpu import preprocessing

    cfg = RunConfig(dataset=dataset, propagation="power", backend=backend)
    graph = load_graph(cfg)
    prop = build_propagator(cfg, graph)
    x = prepare_attr_input(graph, prop, x_format=x_format, x_dtype=x_dtype)

    labels_np = np.asarray(graph.labels)
    n_classes = int(labels_np.max()) + 1
    # Same split args as train_model's defaults so the components
    # decompose exactly the model bench_training measures.
    idx_split_args = dict(default_idx_split_args,
                          ntrain_per_class=cfg.ntrain_per_class,
                          nstopping=cfg.nstopping, nknown=cfg.nknown)
    idx_train_np, idx_stop_np, _ = preprocessing.gen_splits(
        labels_np, idx_split_args, test=False)
    idx_train = jnp.asarray(idx_train_np)
    idx_stop = jnp.asarray(idx_stop_np)
    y_train = jnp.asarray(labels_np[idx_train_np])
    y_stop = jnp.asarray(labels_np[idx_stop_np])

    # Hyperparameters come FROM THE CONFIG (not literals) so this
    # decomposition measures the same model as bench_training.
    n_feat = x.shape[1]
    params = init_mlp_params(jax.random.PRNGKey(0), n_feat,
                             list(cfg.hidden), n_classes)
    optimizer = optax.adam(cfg.learning_rate)
    opt_state = optimizer.init(params)
    key = jax.random.PRNGKey(42)
    drop_prob, reg_lambda = cfg.drop_prob, cfg.reg_lambda

    # Every timed function takes params' fc1 weight as its FIRST arg so
    # `_time`'s fresh-buffer perturbation applies (it perturbs arg 0).
    # ``x`` and ``prop`` ride as jit ARGUMENTS (both are pytrees):
    # closing over them would embed the attribute matrix / the packed
    # operators as inline HLO constants — pathological remote compiles
    # at dense-X scale (see bench_exact).
    w1, w_rest = params[0], params[1:]

    def loss_fn(p, xx, pp):
        logp = ppnp_forward(p, xx, pp, idx_train, key=key, train=True,
                            drop_prob=drop_prob)
        return _nll(logp, y_train) + (reg_lambda / 2.0) * l2_reg(p)

    fwd_loss = jax.jit(lambda w, xx, pp: loss_fn([w, *w_rest], xx, pp))
    grad_step = jax.jit(
        lambda w, xx, pp: jax.value_and_grad(loss_fn)([w, *w_rest], xx, pp))

    def _train_step(w, xx, pp):
        loss, grads = jax.value_and_grad(loss_fn)([w, *w_rest], xx, pp)
        updates, new_opt = optimizer.update(grads, opt_state)
        return optax.apply_updates([w, *w_rest], updates), new_opt, loss

    train_step = jax.jit(_train_step)
    eval_fwd = jax.jit(lambda w, xx, pp: _nll(
        ppnp_forward([w, *w_rest], xx, pp, idx_stop, train=False), y_stop))
    mlp_train = jax.jit(lambda w, xx: mlp_forward(
        [w, *w_rest], xx, key=key, train=True, drop_prob=drop_prob))
    mlp_eval = jax.jit(lambda w, xx: mlp_forward([w, *w_rest], xx,
                                                 train=False))

    h_dev = mlp_eval(w1, x)
    prop_train = jax.jit(
        lambda h, pp: pp(h, idx_train, key=key, train=True))
    prop_eval = jax.jit(lambda h, pp: pp(h, idx_stop, train=False))

    comps = {
        "train_step": (train_step, (w1, x, prop)),
        "grad_step": (grad_step, (w1, x, prop)),
        "fwd_loss": (fwd_loss, (w1, x, prop)),
        "eval_fwd": (eval_fwd, (w1, x, prop)),
        "mlp_fwd_train": (mlp_train, (w1, x)),
        "mlp_fwd_eval": (mlp_eval, (w1, x)),
        "prop_fwd_train": (prop_train, (h_dev, prop)),
        "prop_fwd_eval": (prop_eval, (h_dev, prop)),
    }
    out = {}
    for name, (fn, args) in comps.items():
        out[name + "_ms"] = _time(fn, *args, iters=iters) * 1e3
    out["epoch_estimate_ms"] = out["train_step_ms"] + out["eval_fwd_ms"]
    out.update(dataset=dataset, backend=backend,
               x_format=("sparse" if isinstance(x, SparseInput)
                         else "dense"),
               # The dtype that actually EXECUTED (the sparse kernel
               # path ignores x_dtype and runs f32) — not the request.
               x_dtype=str(jnp.dtype(x.dtype).name),
               n=int(graph.adj_matrix.shape[0]), n_classes=n_classes,
               niter=prop.niter, device=str(jax.devices()[0]))
    return out


def bench_exact(
    dataset: str = "pubmed",
    idx_size: int = 500,
    iters: int = 10,
) -> Dict:
    """Exact-PPNP path cost on device: the dense PPR solve + forwards.

    SURVEY.md §3.4 / §6: the paper's exact-PPNP column includes PubMed
    (n≈19.7k → a 1.5GB dense Π), which the reproduce harness runs only
    on an accelerator (reproduce.EXACT_FEASIBLE_ACCEL). This measures,
    on the chip: (1) the steady-state solve Π = α(I−(1−α)Â)⁻¹, (2) the
    eval-mode forward Π[idx] @ H at the training |idx| scale, (3) the
    train-mode forward (dropout on the selected rows).
    """
    from ppnp_tpu.ops.exact import (PPRExact, _NEWTON_MIN_N,
                                    calc_ppr_exact, newton_schulz_iters)

    cfg = RunConfig(dataset=dataset, propagation="exact")
    graph = load_graph(cfg)
    a_hat = calc_A_hat(graph.adj_matrix)
    alpha = resolve_alpha(cfg)
    n = a_hat.shape[0]
    n_classes = int(np.asarray(graph.labels).max()) + 1

    # calc_ppr_exact's auto dispatch: XLA LU below the Newton threshold,
    # Newton-Schulz (matmul-only — XLA:TPU LU fails to compile at
    # PubMed scale) above it. Passing Â SPARSE keeps the 4·n² dense
    # bytes off the tunneled host→device link (exact.py densifies on
    # device from the COO triplets). Time the whole construction.
    method = "newton" if n >= _NEWTON_MIN_N else "solve"
    t0 = time.perf_counter()
    ppr = calc_ppr_exact(a_hat, alpha, method=method)
    _sync(ppr)  # block_until_ready lies on large programs (see _sync)
    t_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    ppr2 = calc_ppr_exact(a_hat, alpha, method=method)
    _sync(ppr2)
    t_solve = time.perf_counter() - t0
    del ppr2
    # Independent residual on 512 sampled columns: (Π/α)·M[:, cols]
    # must be I[:, cols] (M symmetric SPD, M⁻¹ symmetric).
    cols = np.random.RandomState(1).choice(n, min(512, n), replace=False)
    m_cols = np.asarray(
        -(1.0 - alpha) * a_hat.tocsc()[:, cols].todense(), np.float32)
    m_cols[cols, np.arange(len(cols))] += 1.0
    i_cols = np.zeros_like(m_cols)
    i_cols[cols, np.arange(len(cols))] = 1.0
    # Per-column maxes fetched as ONE >=8-element array — a 0-d
    # float(...) fetch is the documented platform hazard (2-90s stalls;
    # see train._host_scalars).
    resid_cols = np.asarray(jnp.abs(
        (ppr / alpha) @ jnp.asarray(m_cols) - jnp.asarray(i_cols)
    ).max(axis=0))
    resid = float(resid_cols.max())
    prop = PPRExact(ppr=ppr, drop_prob=0.5)

    rng = np.random.RandomState(0)
    h = jnp.asarray(rng.randn(n, n_classes).astype(np.float32))
    idx = jnp.asarray(rng.choice(n, size=idx_size, replace=False))
    key = jax.random.PRNGKey(0)

    # The propagator rides as a jit ARGUMENT (PPRExact is a pytree):
    # closing over it would embed the n² dense Π as an inline HLO
    # constant, which the remote compile service takes tens of minutes
    # to ingest at paper scale (measured 2026-08-20).
    fwd_eval = jax.jit(lambda hh, p: p(hh, idx))
    fwd_train = jax.jit(lambda hh, p: p(hh, idx, key=key, train=True))
    t_eval = _time(fwd_eval, h, prop, iters=iters)
    t_train = _time(fwd_train, h, prop, iters=iters)

    return {
        "dataset": dataset, "n": n, "alpha": alpha,
        "n_classes": n_classes, "idx_size": idx_size,
        "ppr_bytes": int(n) * int(n) * 4,
        "method": method,
        "newton_iters": (newton_schulz_iters(alpha)
                         if method == "newton" else None),
        "solve_s": t_solve,
        "solve_first_s": t_first,
        "residual_max": resid,
        "eval_forward_s": t_eval,
        "train_forward_s": t_train,
        "device": str(jax.devices()[0]),
    }


def bench_ingest(
    n_nodes: int = 500_000,
    n_edges: int = 5_000_000,
    bandwidth: int = 2_000,
    seed: int = 0,
) -> Dict:
    """Host-side packing throughput: numpy vs the C++ native tier.

    Packs a synthetic banded graph (what citation graphs look like after
    RCM) with ``pair_chunks_banded`` in both modes and reports edges/s.
    Runs entirely on the host — no devices touched (``device=False``).
    """
    import scipy.sparse as sp

    from ppnp_tpu import native

    rng = np.random.default_rng(seed)
    dst = rng.integers(0, n_nodes, n_edges)
    off = (rng.standard_normal(n_edges) * bandwidth).astype(np.int64)
    src = np.clip(dst + off, 0, n_nodes - 1)
    mat = sp.coo_matrix((np.ones(n_edges, np.float32), (dst, src)),
                        shape=(n_nodes, n_nodes)).tocsr()
    del dst, src, off

    result: Dict = {"n_nodes": n_nodes, "n_edges": int(mat.nnz),
                    "bandwidth": bandwidth,
                    "native_available": native.native_available(),
                    "paths": {}}
    modes = ["never"] + (["require"] if native.native_available() else [])
    for mode in modes:
        t0 = time.perf_counter()
        pc = pair_chunks_banded(mat, use_native=mode, device=False,
                                edge_ids=None)
        t = time.perf_counter() - t0
        name = "numpy" if mode == "never" else "native"
        result["paths"][name] = {"seconds": t,
                                 "edges_per_s": mat.nnz / t,
                                 "n_seg": pc.n_seg}
        del pc
    if len(result["paths"]) == 2:
        result["native_speedup"] = (result["paths"]["numpy"]["seconds"]
                                    / result["paths"]["native"]["seconds"])
    return result


def bench_retrieval(
    dataset: str = "ms_academic",
    d: int = 64,
    k: int = 10,
    n_queries: int = 1024,
    iters: int = 30,
    seed: int = 0,
    table_source: str = "trained",
    train_epochs: int = 50,
) -> Dict:
    """Top-k retrieval throughput over the node-embedding table.

    ``table_source="trained"`` (default) runs the one-command production
    story — a quick train (``train_epochs`` epochs, XLA backend) whose
    propagated hidden activations become the table via
    ``build_embedding_table`` (VERDICT r2 item 8); ``"random"`` keeps
    the old randn table (throughput-identical, zero train cost).
    Queries are perturbed table rows (the honest workload for an
    anisotropic trained table); the trained path is sanity-checked by
    top-1 agreement against a numpy oracle.

    Measures three paths on whatever devices exist: single-device
    ``retrieve_topk``; ``retrieve_topk_sharded`` (replicated queries,
    all_gather merge — BASELINE.json:11); ``retrieve_topk_qsharded``
    (queries sharded P(axis), transposed all_to_all merge — the
    many-query regime).
    """
    from ppnp_tpu.retrieval import (retrieve_topk, retrieve_topk_qsharded,
                                    retrieve_topk_sharded)
    from ppnp_tpu.parallel.mesh import make_mesh

    cfg = RunConfig(dataset=dataset)
    graph = load_graph(cfg)
    n = graph.num_nodes()
    rng = np.random.RandomState(seed)
    result: Dict = {"dataset": dataset, "n": n, "d": d, "k": k,
                    "n_queries": n_queries, "table_source": table_source,
                    "device": str(jax.devices()[0]), "paths": {}}
    if table_source == "trained":
        from ppnp_tpu.builders import build_propagator, train_kwargs
        from ppnp_tpu.retrieval import build_embedding_table
        from ppnp_tpu.train import train_model
        tcfg = RunConfig(dataset=dataset, backend="xla", hidden=(d,),
                         max_epochs=train_epochs, patience=train_epochs,
                         test=True)
        from ppnp_tpu import preprocessing
        from ppnp_tpu.train import _densify_attributes
        prop = build_propagator(tcfg, graph)
        params, res = train_model(graph, prop, **train_kwargs(tcfg))
        x = jnp.asarray(_densify_attributes(
            preprocessing.normalize_attributes(graph.attr_matrix)))
        table = build_embedding_table(params, x, prop, level="hidden")
        result["train"] = {"epochs": train_epochs,
                           "valtest_accuracy": res["valtest"]["accuracy"]}
    elif table_source == "random":
        table = jnp.asarray(rng.randn(n, d).astype(np.float32))
    else:
        raise ValueError(f"unknown table_source {table_source!r}")
    # Queries: noisy table rows (trained tables are anisotropic — scoring
    # them with matched queries is the honest workload). Correctness is
    # checked by top-1 agreement with a numpy oracle below — NOT by
    # self-retrieval, which dot-product scoring legitimately fails on an
    # anisotropic table (large-norm rows outscore the source row).
    q_src = rng.randint(0, n, n_queries)
    q = table[q_src] + 0.01 * jnp.asarray(
        rng.randn(n_queries, d).astype(np.float32))
    q = jax.device_put(q)

    f = jax.jit(lambda qq: retrieve_topk(qq, table, k=k))
    t = _time(f, q, iters=iters)
    result["paths"]["single"] = {"seconds": t,
                                 "queries_per_s": n_queries / t}
    if table_source == "trained":
        # Correctness check vs a numpy oracle. NOTE: top-1 SELF-hit is
        # the wrong check for dot-product scoring — a trained table is
        # anisotropic, so argmax_j q·t_j favors large-norm rows over
        # the query's own source row (measured: self-hit ≈ 0 while the
        # scorer is exactly correct). What must hold is argmax
        # agreement with the oracle.
        _, idx = jax.block_until_ready(f(q))
        scores_np = np.asarray(q) @ np.asarray(table).T
        oracle_top1 = scores_np.argmax(axis=1)
        result["oracle_top1_agreement"] = float(
            np.mean(np.asarray(idx[:, 0]) == oracle_top1))

    nd = jax.device_count()
    mesh = make_mesh(n_devices=nd)
    n_pad = ((n + nd * 8 - 1) // (nd * 8)) * nd * 8
    table_pad = jnp.pad(table, ((0, n_pad - n), (0, 0)))
    fs = jax.jit(lambda qq: retrieve_topk_sharded(
        qq, table_pad, k=k, mesh=mesh, n_valid=n))
    t = _time(fs, q, iters=iters)
    result["paths"][f"sharded_{nd}dev"] = {
        "seconds": t, "queries_per_s": n_queries / t}

    q_pad = n_queries - (n_queries % nd) or nd
    fq = jax.jit(lambda qq: retrieve_topk_qsharded(
        qq, table_pad, k=k, mesh=mesh, n_valid=n))
    t = _time(fq, q[:q_pad], iters=iters)
    result["paths"][f"qsharded_{nd}dev"] = {
        "seconds": t, "queries_per_s": q_pad / t}
    return result


def bench_serving(
    dataset: str = "cora_ml",
    backends: Sequence[str] = ("fused", "pallas", "xla"),
    iters: int = 50,
    chain: int = 8,
    hidden: int = 64,
    k_retrieval: int = 10,
    seed: int = 0,
) -> Dict:
    """Warm single-forward SERVING latency per backend (p50/p99).

    One "forward" = the full predict path (``train._predict``: MLP over
    all nodes + K-step propagation + argmax) dispatched ONCE — the
    regime ``predict``/``retrieve`` live in, with no epoch chunk to
    amortize dispatch into. This is where the fused K-step kernel
    (``kernels/fused.py``) earns its keep: the per-step scan pays the
    ~160µs per-kernel-call overhead K times per forward, the fused
    backend once (VERDICT r4 item 3 / Missing #4).

    Two numbers per backend:

    - ``latency_ms_p50``/``p99`` — per-call wall latency net of the
      result-fetch RTT (measured per call and subtracted, clamped at
      10% — ``_time``'s sync discipline). On this tunneled platform the
      residual per-call dispatch RTT (~1.3ms) is real serving latency and is
      NOT subtracted.
    - ``chained_ms`` — ``chain`` data-dependent forwards timed as one
      dispatch, divided by ``chain``: the device-side latency floor
      (what an on-host server loop would see per forward).

    Also reports the retrieval-serving pieces once per backend:
    ``table_build_ms`` (propagated embedding table — where the
    propagation backend matters) and, backend-independently,
    ``retrieve_topk_ms`` for one k-NN query batch over that table.
    """
    from ppnp_tpu.builders import build_propagator
    from ppnp_tpu.models.appnp import init_mlp_params
    from ppnp_tpu.retrieval import build_embedding_table, retrieve_topk
    from ppnp_tpu.train import _predict, prepare_attr_input

    cfg = RunConfig(dataset=dataset)
    graph = load_graph(cfg)
    n = graph.num_nodes()
    n_classes = int(np.asarray(graph.labels).max()) + 1
    result: Dict = {"dataset": dataset, "n": n,
                    "n_classes": n_classes, "iters": iters,
                    "chain": chain,
                    "device": str(jax.devices()[0]), "backends": {}}

    for backend in backends:
        try:
            bcfg = RunConfig(dataset=dataset, backend=backend,
                             hidden=(hidden,))
            propagator = build_propagator(bcfg, graph)
            x = prepare_attr_input(graph, propagator, x_format="dense")
            params = init_mlp_params(jax.random.PRNGKey(seed),
                                     x.shape[1], [hidden], n_classes)

            # Warm the jitted predict (compile + one execution).
            r = _predict(params, x, propagator)
            _sync(r)

            # Per-call latency distribution. A few perturbed X variants
            # guard against same-buffer replay artifacts (see _time).
            variants = [x + jnp.float32(i) * 1e-6 for i in range(8)]
            jax.block_until_ready(variants)
            lats = []
            for i in range(iters):
                xi = variants[i % len(variants)]
                t0 = time.perf_counter()
                r = _predict(params, xi, propagator)
                _sync(r)
                t1 = time.perf_counter()
                _sync(r)  # pure fetch RTT, subtracted below
                t_fetch = time.perf_counter() - t1
                lats.append(max((t1 - t0) - t_fetch, (t1 - t0) * 0.1))
            lats = np.sort(np.asarray(lats))

            # Device-side floor: `chain` data-dependent forwards in one
            # dispatch (feed the logits' exp back into a dummy linear
            # blend with X so the chain cannot be parallelized away).
            @jax.jit
            def chained(params, x, prop):
                def body(carry, _):
                    from ppnp_tpu.models.appnp import ppnp_forward
                    logp = ppnp_forward(params, carry, prop, None,
                                        train=False)
                    carry = carry + 0.0 * jnp.sum(logp)
                    return carry, jnp.argmax(logp[:1], axis=-1)
                _, outs = jax.lax.scan(body, x, None, length=chain)
                return outs

            t_chain = _time(lambda xx: chained(params, xx, propagator),
                            x, iters=3)

            entry = {
                "latency_ms_p50": float(lats[len(lats) // 2]) * 1e3,
                "latency_ms_p99": float(
                    lats[min(len(lats) - 1,
                             int(len(lats) * 0.99))]) * 1e3,
                "latency_ms_min": float(lats[0]) * 1e3,
                "chained_ms": t_chain / chain * 1e3,
            }

            # Retrieval serving: table build (propagation-bound, the
            # backend-dependent piece) + one query-batch top-k. Warm
            # first — the first call carries the (cached-across-runs)
            # compile, which is not serving latency.
            table = build_embedding_table(params, x, propagator)
            _sync(table)
            tb = _time(lambda xx: build_embedding_table(
                params, xx, propagator), x, iters=5)
            entry["table_build_ms"] = tb * 1e3
            q = table[:128]
            tq = _time(lambda qq: retrieve_topk(qq, table[:n],
                                                k=k_retrieval),
                       q, iters=10)
            entry["retrieve_topk_ms"] = tq * 1e3
            result["backends"][backend] = entry
            logger.info("%s: p50 %.2fms p99 %.2fms chained %.2fms",
                        backend, entry["latency_ms_p50"],
                        entry["latency_ms_p99"], entry["chained_ms"])
        except Exception as e:  # pragma: no cover - backend unavailable
            logger.warning("serving backend %s failed: %s", backend,
                           str(e)[:200])
            result["backends"][backend] = {"error": str(e)[:500]}
    return result
