"""CLI: ``python -m ppnp_tpu {train,reproduce,bench,retrieve,info} ...``

Reference analog: the notebooks are the reference's only driver
(SURVEY.md §2.1 "Experiment driver"); this CLI flattens them into
commands with the same defaults as the paper protocol.
"""

from __future__ import annotations

import argparse
import json
import logging
import sys

import numpy as np

from ppnp_tpu.config import RunConfig

logger = logging.getLogger(__name__)


def _add_common(p: argparse.ArgumentParser) -> None:
    p.add_argument("--dataset", default="cora_ml")
    p.add_argument("--propagation", default="power",
                   choices=["power", "exact", "sharded"])
    p.add_argument("--alpha", type=float, default=None,
                   help="PPR teleport (default: dataset-specific)")
    p.add_argument("--k", "--niter", dest="niter", type=int, default=10)
    p.add_argument("--hidden", type=int, nargs="+", default=[64])
    p.add_argument("--drop-prob", type=float, default=0.5)
    p.add_argument("--lr", type=float, default=0.01)
    p.add_argument("--reg-lambda", type=float, default=5e-3)
    p.add_argument("--max-epochs", type=int, default=3000)
    p.add_argument("--patience", type=int, default=100)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--test", action="store_true",
                   help="evaluate on the held-out test population")
    p.add_argument("--backend", default="xla",
                   choices=["xla", "pallas", "blocked", "fused"],
                   help="SpMM path: blocked = HBM-streaming row "
                        "blocks for graphs larger than VMEM; fused = "
                        "all K steps in ONE kernel dispatch (the "
                        "serving-latency path)")
    p.add_argument("--rows-per-block", type=int, default=16384)
    p.add_argument("--layout", default="banded",
                   choices=["banded", "aligned", "auto"],
                   help="pallas slot packing (docs/PERFORMANCE.md); "
                        "auto = per-graph geometry via the issue-cost "
                        "model (ops/pairchunks.select_geometry)")
    p.add_argument("--exchange", default="alltoall",
                   choices=["alltoall", "allgather"])
    p.add_argument("--n-shards", type=int, default=None)
    p.add_argument("--n-slices", type=int, default=None,
                   help="sharded: DCN slice count; >1 partitions the "
                        "shards over a (n_slices × n_shards/n_slices) "
                        "hierarchical mesh — boundary rows exchange "
                        "intra-slice over ICI and once per remote "
                        "slice (deduplicated) over DCN")
    p.add_argument("--shard-reorder", default="rcm",
                   choices=["rcm", "none"],
                   help="relabel nodes before row-partitioning so shard "
                        "boundaries shrink (sharded propagation only)")
    p.add_argument("--print-interval", type=int, default=20)
    p.add_argument("--x-dtype", default=None,
                   choices=["float32", "bfloat16"],
                   help="attribute-matrix storage dtype (bfloat16 halves "
                        "the n×f HBM traffic; weights/optimizer stay f32)")
    p.add_argument("--x-format", default="auto",
                   choices=["auto", "dense", "sparse"],
                   help="attribute-matrix layout: sparse routes fc1 "
                        "through the pair-chunks SpMM kernel (the "
                        "reference's MixedLinear); auto picks sparse "
                        "where the densified X would dominate the epoch")


def _cfg_from_args(args) -> RunConfig:
    return RunConfig(
        dataset=args.dataset, propagation=args.propagation,
        alpha=args.alpha, niter=args.niter, hidden=list(args.hidden),
        drop_prob=args.drop_prob, learning_rate=args.lr,
        reg_lambda=args.reg_lambda, max_epochs=args.max_epochs,
        patience=args.patience, seed=args.seed, test=args.test,
        backend=args.backend, layout=getattr(args, "layout", "banded"),
        exchange=args.exchange,
        n_shards=args.n_shards, print_interval=args.print_interval,
        n_slices=getattr(args, "n_slices", None),
        rows_per_block=getattr(args, 'rows_per_block', 16384),
        shard_reorder=getattr(args, 'shard_reorder', 'rcm'),
        metrics_path=getattr(args, "metrics_out", None),
        checkpoint_dir=getattr(args, "checkpoint_dir", None),
        resume=getattr(args, "resume", False),
        x_dtype=getattr(args, "x_dtype", None) or "float32",
        x_format=getattr(args, "x_format", "auto"),
    )


def cmd_train(args) -> int:
    from ppnp_tpu.builders import build_propagator, load_graph, train_kwargs
    from ppnp_tpu.metrics import JsonlWriter, TeeWriter, TensorboardWriter
    from ppnp_tpu.train import train_model

    cfg = _cfg_from_args(args)
    graph = load_graph(cfg)
    logger.info("dataset %s: %s", cfg.dataset, graph)
    propagator = build_propagator(cfg, graph)
    writers = []
    if cfg.metrics_path:
        writers.append(JsonlWriter(cfg.metrics_path))
    if getattr(args, "tensorboard", None):
        writers.append(TensorboardWriter(args.tensorboard))
    metrics = TeeWriter(*writers) if writers else None
    try:
        _, result = train_model(
            graph, propagator, metrics=metrics,
            checkpoint_dir=cfg.checkpoint_dir, resume=cfg.resume,
            profile_dir=getattr(args, "profile", None),
            **train_kwargs(cfg))
    finally:
        # TensorBoard's SummaryWriter buffers (default flush 120s);
        # short runs would otherwise exit with a truncated events file.
        if metrics is not None:
            metrics.close()
    out = {k: v for k, v in result.items() if k != "predictions"}
    out["config"] = json.loads(cfg.to_json())
    print(json.dumps(out, indent=2, default=float))
    return 0


def cmd_reproduce(args) -> int:
    from ppnp_tpu.reproduce import DEFAULT_SEEDS, run_seed_sweep

    cfg = _cfg_from_args(args)
    cfg.test = True
    if args.all:
        from ppnp_tpu.reproduce import run_full_table
        rows = run_full_table(base_cfg=cfg, datasets=args.datasets,
                              nseeds=args.nseeds, out_prefix=args.out,
                              batched=(False if args.serial_seeds
                                       else None),
                              batch_size=args.batch_size)
        for r in rows:
            line = (f"{r['dataset']:12s} {r['propagation']:5s} "
                    f"{r['mean_accuracy_pct']:.2f} ± {r['ci95_pct']:.2f} %")
            if "paper_pct" in r:
                line += f"  (paper {r['paper_pct']:.2f})"
            if "delta_pct" in r:
                line += (f"  Δ={r['delta_pct']:+.2f} "
                         f"{'OK' if r['within_seed_variance'] else 'DIVERGED'}")
            if not r["real_data"]:
                line += "  [surrogate — no parity diff]"
            print(line)
        print(json.dumps(rows, indent=2, default=float))
        return 0
    seeds = DEFAULT_SEEDS[:args.nseeds]
    rows = []
    for dataset in args.datasets or ["cora_ml", "citeseer", "pubmed"]:
        cfg.dataset = dataset
        res = run_seed_sweep(cfg, batched=(False if args.serial_seeds
                                           else None),
                             batch_size=args.batch_size,
                             seeds=seeds, out_path=args.out and
                             f"{args.out}_{dataset}.json")
        rows.append((dataset, res["mean_accuracy"], res["ci95_accuracy"]))
        print(f"{dataset}: {100*res['mean_accuracy']:.2f} "
              f"± {100*res['ci95_accuracy']:.2f} %")
    print(json.dumps({d: {"mean": m, "ci95": c} for d, m, c in rows},
                     indent=2))
    return 0


def cmd_bench(args) -> int:
    import contextlib

    ctx = contextlib.nullcontext()
    if getattr(args, "profile", None):
        from ppnp_tpu.profiling import trace
        ctx = trace(args.profile, create_perfetto_trace=True)
    with ctx:
        return _cmd_bench_inner(args)


def _parse_x_dtype(args):
    """Map the --x-dtype flag to a jnp dtype (None = train_model's
    float32 default; the bench subcommand has no --dtype flag)."""
    name = getattr(args, "x_dtype", None)
    if name in (None, "", "float32"):
        return None
    import jax.numpy as jnp
    return jnp.bfloat16


def _cmd_bench_inner(args) -> int:
    from ppnp_tpu.benchmarks import bench_propagation, bench_scaling
    if args.training:
        from ppnp_tpu.benchmarks import bench_training
        res = bench_training(dataset=args.dataset,
                             backend=args.backends[0],
                             epochs=args.epochs,
                             x_dtype=_parse_x_dtype(args),
                             x_format=getattr(args, "x_format", "auto"),
                             propagation=getattr(args, "propagation",
                                                 "power"))
    elif args.training_breakdown:
        from ppnp_tpu.benchmarks import bench_training_breakdown
        res = bench_training_breakdown(
            dataset=args.dataset, backend=args.backends[0],
            x_dtype=_parse_x_dtype(args),
            x_format=getattr(args, "x_format", "auto"),
            iters=args.iters)
    elif args.retrieval:
        from ppnp_tpu.benchmarks import bench_retrieval
        res = bench_retrieval(dataset=args.dataset)
    elif args.serving:
        from ppnp_tpu.benchmarks import bench_serving
        res = bench_serving(dataset=args.dataset,
                            backends=tuple(args.backends),
                            iters=args.iters if args.iters != 10 else 50)
    elif args.ingest:
        from ppnp_tpu.benchmarks import bench_ingest
        res = bench_ingest()
    elif args.exact:
        from ppnp_tpu.benchmarks import bench_exact
        res = bench_exact(dataset=args.dataset)
    elif args.blocked_scale:
        from ppnp_tpu.benchmarks import bench_blocked
        res = bench_blocked(n_nodes=args.blocked_nodes, c=args.c,
                            niter=args.niter, iters=args.iters,
                            layout=args.layout)
    elif args.scaling:
        if args.layout == "auto":
            # Per-shard auto-tuning would pick divergent static
            # geometries that cannot stack; the sharded builders resolve
            # auto globally (builders._resolve_layout) — here just warn.
            logging.getLogger(__name__).warning(
                "--layout auto is not supported by --scaling; "
                "using banded")
        res = bench_scaling(
            dataset=args.dataset, c=args.c,
            niter=args.niter, iters=args.iters,
            backend=args.backends[0],
            pack_kwargs=(None if args.layout in ("banded", "auto")
                         else {"layout": args.layout}))
    elif args.c_sweep:
        from ppnp_tpu.benchmarks import bench_c_sweep
        res = bench_c_sweep(dataset=args.dataset, niter=args.niter,
                            iters=args.iters, backends=args.backends,
                            layout=args.layout)
    else:
        res = bench_propagation(dataset=args.dataset, c=args.c,
                                niter=args.niter, iters=args.iters,
                                backends=args.backends,
                                layout=args.layout)
    print(json.dumps(res, indent=2, default=float))
    return 0


def cmd_retrieve(args) -> int:
    import jax.numpy as jnp
    import scipy.sparse as sp

    from ppnp_tpu.builders import build_propagator, load_graph, train_kwargs
    from ppnp_tpu.preprocessing import normalize_attributes
    from ppnp_tpu.retrieval import build_embedding_table, retrieve_topk
    from ppnp_tpu.train import train_model

    cfg = _cfg_from_args(args)
    graph = load_graph(cfg)
    propagator = build_propagator(cfg, graph)
    params, _ = train_model(graph, propagator, **train_kwargs(cfg))
    attr = normalize_attributes(graph.attr_matrix)
    x = jnp.asarray(np.asarray(attr.todense() if sp.issparse(attr) else attr,
                               dtype=np.float32))
    n_rows = getattr(propagator, "n_rows", x.shape[0])
    if n_rows > x.shape[0]:
        x = jnp.pad(x, ((0, n_rows - x.shape[0]), (0, 0)))
    table = build_embedding_table(params, x, propagator, level=args.level)
    queries = table[:args.nqueries]
    scores, idx = retrieve_topk(queries, table[:graph.num_nodes()],
                                k=args.topk)
    for q in range(args.nqueries):
        print(f"query node {q}: top-{args.topk} = "
              f"{np.asarray(idx[q]).tolist()} "
              f"(scores {np.round(np.asarray(scores[q]), 4).tolist()})")
    return 0


def cmd_predict(args) -> int:
    """Restore a trained checkpoint and emit predictions for a dataset.

    The serving-path complement of ``train --checkpoint-dir``: the
    reference's only inference surface is the in-process
    ``get_predictions`` helper (SURVEY.md §3.1, training.py ~L150);
    here a checkpoint from any earlier run is restored (orbax) and the
    batched jitted forward produces argmax classes for every node.
    """
    from ppnp_tpu import checkpoint as ckpt_mod
    from ppnp_tpu.builders import build_propagator, load_graph
    from ppnp_tpu.train import get_predictions, prepare_attr_input

    cfg = _cfg_from_args(args)
    state = ckpt_mod.restore_checkpoint(args.checkpoint_dir,
                                        step=args.step)
    if state is None:
        logger.error("no checkpoint found under %s", args.checkpoint_dir)
        return 1
    # `best_state` is the early-stopping snapshot train_model restores
    # before its final eval; serve that unless --last asks for the
    # raw end-of-training params.
    use_best = (not args.last
                and state.get("early_stopping", {}).get("best_epoch", -1)
                >= 0)
    params = state["best_state"] if use_best else state["params"]

    import jax.numpy as jnp

    graph = load_graph(cfg)
    propagator = build_propagator(cfg, graph)
    x = prepare_attr_input(
        graph, propagator, x_format=cfg.x_format,
        x_dtype=(jnp.bfloat16 if cfg.x_dtype == "bfloat16" else None))
    n = graph.num_nodes()
    preds = get_predictions(params, x, propagator)[:n]

    labels = np.asarray(graph.labels)
    out = {
        "checkpoint": args.checkpoint_dir,
        "step": int(state.get("epoch", -1)),
        "params": "best" if use_best else "last",
        "dataset": cfg.dataset,
        "n": int(n),
        "accuracy_all_nodes": float((preds == labels).mean()),
    }
    if args.out:
        np.savez(args.out, predictions=preds, labels=labels)
        out["out"] = args.out
    print(json.dumps(out, indent=2))
    return 0


def cmd_info(args) -> int:
    import jax
    out = {
        "jax": jax.__version__,
        "devices": [str(d) for d in jax.devices()],
        "process_count": jax.process_count(),
        "default_backend": jax.default_backend(),
    }
    if getattr(args, "health", False):
        # Quick device-health classification: the tunneled TPU has
        # multi-hour degraded windows where compute runs ~10x slow
        # (docs/PERFORMANCE.md "platform hazard"); a 20-matmul chain
        # plus dispatch timing separates healthy / degraded / hung
        # without paying a full bench run.
        import time

        import jax.numpy as jnp
        x = jnp.ones((1024, 1024), jnp.float32)
        y = (x @ x).block_until_ready()  # compile + first dispatch
        t0 = time.perf_counter()
        for _ in range(20):
            y = y @ x
        y.block_until_ready()
        chain_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        (x @ x).block_until_ready()
        dispatch_s = time.perf_counter() - t0
        # v5e: a 1k^3 matmul is ~10µs of MXU work; a 20-chain under
        # ~60ms (dominated by one dispatch round-trip) is healthy.
        # CPU backends are slower but local — classify by chain time
        # only on TPU-like backends.
        is_accel = out["default_backend"] != "cpu"
        status = "healthy"
        if is_accel and chain_s > 0.6:
            status = "degraded"
        if is_accel and chain_s > 6.0:
            status = "severely_degraded"
        out["health"] = {
            "matmul20_chain_s": round(chain_s, 4),
            "single_dispatch_s": round(dispatch_s, 4),
            "status": status,
        }
    print(json.dumps(out, indent=2))
    return 0


def main(argv=None) -> int:
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(name)s %(levelname)s: %(message)s")
    from ppnp_tpu.utils.compcache import enable_compilation_cache
    enable_compilation_cache()
    parser = argparse.ArgumentParser(prog="ppnp_tpu")
    sub = parser.add_subparsers(dest="command", required=True)

    p = sub.add_parser("train", help="train one model")
    _add_common(p)
    p.add_argument("--metrics-out", default=None,
                   help="JSONL per-epoch metrics path")
    p.add_argument("--tensorboard", default=None,
                   help="TensorBoard logdir (mirrors epoch metrics)")
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--profile", default=None, metavar="DIR",
                   help="jax.profiler trace of the steady-state epoch "
                        "chunks (perfetto-compatible) into DIR")
    p.set_defaults(fn=cmd_train)

    p = sub.add_parser("reproduce",
                       help="seed-sweep accuracy table (paper protocol)")
    _add_common(p)
    p.add_argument("--datasets", nargs="+", default=None,
                   help="default: cora_ml citeseer pubmed; with --all: "
                        "all four reference datasets")
    p.add_argument("--nseeds", type=int, default=5)
    p.add_argument("--serial-seeds", action="store_true",
                   help="train seeds one at a time (default: batch all "
                        "seeds into one lane-stacked run where the "
                        "backend supports it — ppnp_tpu.multiseed)")
    p.add_argument("--batch-size", type=int, default=None,
                   help="sub-batch batched sweeps to at most this many "
                        "seeds per train_models call (caps grouped-"
                        "kernel lane count at large G; see "
                        "reproduce.run_seed_sweep)")
    p.add_argument("--out", default=None, help="result JSON path prefix")
    p.add_argument("--all", action="store_true",
                   help="full paper-style table (exact+power × datasets) "
                        "with paper-target diffs when real npz data is "
                        "present")
    p.set_defaults(fn=cmd_reproduce)

    p = sub.add_parser("bench", help="propagation throughput benchmark")
    p.add_argument("--dataset", default="ms_academic")
    p.add_argument("--c", type=int, default=128)
    p.add_argument("--niter", type=int, default=10)
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--backends", nargs="+", default=["xla", "pallas"])
    p.add_argument("--layout", default="banded",
                   choices=["banded", "aligned", "auto"],
                   help="pallas packing layout for the propagation "
                        "bench (auto = per-graph geometry model)")
    p.add_argument("--scaling", action="store_true",
                   help="strong-scaling sweep over the local mesh")
    p.add_argument("--c-sweep", action="store_true",
                   help="propagation throughput across feature widths "
                        "c in {16, 64, 128, 256}")
    p.add_argument("--training", action="store_true",
                   help="steady-state training epochs/s")
    p.add_argument("--x-dtype", default=None,
                   choices=["float32", "bfloat16"],
                   help="attribute-matrix dtype for --training")
    p.add_argument("--x-format", default="auto",
                   choices=["auto", "dense", "sparse"],
                   help="attribute-matrix layout for --training "
                        "(sparse = fc1 through the SpMM kernel)")
    p.add_argument("--training-breakdown", action="store_true",
                   help="per-epoch cost decomposition (train step / "
                        "eval fwd / MLP vs propagation, ms each)")
    p.add_argument("--retrieval", action="store_true",
                   help="top-k retrieval queries/s")
    p.add_argument("--serving", action="store_true",
                   help="warm single-forward serving latency p50/p99 "
                        "per backend (fused vs per-step scan vs xla)")
    p.add_argument("--propagation", default="power",
                   choices=["power", "sharded"],
                   help="with --training: propagation operator family "
                        "(sharded = full train epoch through "
                        "ShardedPowerIteration on the real mesh)")
    p.add_argument("--blocked-scale", action="store_true",
                   help="XLA vs HBM-streaming blocked backend on a "
                        "VMEM-exceeding synthetic banded graph")
    p.add_argument("--blocked-nodes", type=int, default=500_000)
    p.add_argument("--ingest", action="store_true",
                   help="host-side packing edges/s (numpy vs C++)")
    p.add_argument("--exact", action="store_true",
                   help="dense PPR solve + exact-PPNP forward cost "
                        "(use --dataset pubmed for the paper-scale row)")
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--profile", default=None, metavar="DIR",
                   help="jax.profiler trace of the benchmark "
                        "(perfetto-compatible) into DIR")
    p.set_defaults(fn=cmd_bench)

    p = sub.add_parser("retrieve", help="train + top-k retrieval demo")
    _add_common(p)
    p.add_argument("--topk", type=int, default=10)
    p.add_argument("--nqueries", type=int, default=5)
    p.add_argument("--level", default="hidden",
                   choices=["hidden", "logits"])
    p.set_defaults(fn=cmd_retrieve)

    p = sub.add_parser("predict",
                       help="restore a checkpoint and emit predictions")
    _add_common(p)
    p.add_argument("--checkpoint-dir", required=True)
    p.add_argument("--step", type=int, default=None,
                   help="checkpoint step to restore (default: latest)")
    p.add_argument("--last", action="store_true",
                   help="serve end-of-training params instead of the "
                        "early-stopping best snapshot")
    p.add_argument("--out", default=None,
                   help="write predictions (+labels) to this .npz path")
    p.set_defaults(fn=cmd_predict)

    p = sub.add_parser("info", help="device/platform info")
    p.add_argument("--health", action="store_true",
                   help="run a quick device-health probe (classifies "
                        "the tunnel's degraded windows)")
    p.set_defaults(fn=cmd_info)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
