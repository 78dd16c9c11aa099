"""Training loop: full-batch Adam with dual-criterion early stopping.

Reference analog: ``ppnp/pytorch/training.py::train_model`` (~L30 —
SURVEY.md §3.1). Semantics preserved: stratified splits, L1-normalized
attributes, one optimizer step per epoch on the train indices (full-batch),
per-epoch stopping-set evaluation, patience-100 early stopping on acc+loss
with best-state restore, final accuracy + macro-F1 on the valtest set,
L2 (reg_lambda/2·Σ‖W_fc1‖²) on the first layer only, Adam lr=0.01.

TPU-native differences:

- the train step and the evaluation are single jitted functions (no
  Python inside the step). Buffer donation is deliberately OFF: the
  early-stopping replay re-issues a chunk from the pre-chunk
  (params, opt_state, best) tuple, so those buffers must survive the
  first call — at paper scale the extra copies are ~2 MB; the 500k-node
  blocked config trains through its own probe path;
- the propagation operator is a pytree captured in the jitted closures —
  power-iteration (APPNP), exact Π (PPNP), or the sharded operator from
  ``ppnp_tpu.parallel`` all fit the same callable protocol;
- PRNG is explicit: one fold-in per epoch from a root ``jax.random`` key;
- the best parameter snapshot is just a reference to an immutable pytree.
"""

from __future__ import annotations

import functools
import logging
import time
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
import scipy.sparse as sp

from ppnp_tpu import preprocessing
from ppnp_tpu.data.sparsegraph import SparseGraph
from ppnp_tpu.earlystopping import EarlyStopping, stopping_args as \
    default_stopping_args
from ppnp_tpu.metrics import JsonlWriter, accuracy, macro_f1
from ppnp_tpu.models.appnp import (init_mlp_params, l2_reg, ppnp_forward)
from ppnp_tpu.ops.sparse_input import ShardedSparseInput, SparseInput

logger = logging.getLogger(__name__)

__all__ = ["train_model", "get_predictions", "default_idx_split_args",
           "prepare_attr_input"]

default_idx_split_args: Dict[str, int] = {
    "ntrain_per_class": 20,
    "nstopping": 500,
    "nknown": 1500,
    "seed": 2413340114,
}


def _densify_attributes(attr) -> np.ndarray:
    if sp.issparse(attr):
        return np.asarray(attr.todense(), dtype=np.float32)
    return np.asarray(attr, dtype=np.float32)


def _host_scalars(*vals) -> np.ndarray:
    """Download device scalars as ONE padded (≥8,) f32 transfer.

    The tunneled axon platform's single-element device→host path is
    pathologically slow (measured 2-90 s per transfer, vs ~27 ms for
    anything ≥8 elements), so never pull ``float(x)``/``int(x)`` from a
    device scalar directly — stack and pad first. Returns the values as
    a host numpy array in argument order (ints survive exactly up to
    2^24, fine for epoch counters).
    """
    arr = jnp.stack([jnp.ravel(jnp.asarray(v, jnp.float32))[0]
                     for v in vals])
    arr = jnp.pad(arr, (0, max(0, 8 - arr.shape[0])))
    return np.asarray(arr)[:len(vals)]


def _nll(log_probs: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    rows = jnp.take_along_axis(log_probs, labels[:, None], axis=1)
    return -jnp.mean(rows)


@jax.jit
def _predict(params, x, propagator):
    logp = ppnp_forward(params, x, propagator, None, train=False)
    return jnp.argmax(logp, axis=-1)


def get_predictions(params, x: jnp.ndarray, propagator) -> np.ndarray:
    """Argmax class predictions for all nodes (eval mode).

    Reference analog: training.py's batched ``get_predictions`` helper —
    no batching needed here, the whole graph is one device computation
    (module-level jit: compiled once per shape, cached across calls).
    """
    return np.asarray(_predict(params, x, propagator))


@functools.partial(
    jax.jit, static_argnames=("learning_rate", "reg_lambda", "drop_prob",
                              "epoch_chunk"))
def _run_chunk(params, opt_state, best, key_epochs, e0, limit, x,
               idx_train, y_train, idx_stop, y_stop, propagator, *,
               learning_rate, reg_lambda, drop_prob, epoch_chunk):
    """`epoch_chunk` training epochs in ONE compiled lax.scan.

    Module-level so the compilation caches ACROSS ``train_model`` calls:
    a seed sweep (reproduce.py, SURVEY.md §3.6) compiles once per
    graph/propagator shape instead of once per seed. Device dispatch
    costs ~0.4ms (and compiles ~tens of seconds) on this platform while
    the reference does one step per epoch (SURVEY.md §3.1), so both
    per-epoch dispatch and per-seed compilation would otherwise dominate
    small-graph training.

    SHAPE-STABLE: callers always pass exactly ``epoch_chunk`` scan steps
    and a traced scalar ``limit``; epochs >= limit are masked to no-ops
    (state and best-snapshot updates suppressed). One executable thus
    serves full chunks, the final remainder, and the early-stopping
    replay — avoiding a fresh XLA compile per odd chunk length (tens of
    seconds each, and the tunneled backend has been observed to wedge
    when a second differently-shaped compile of this program executes
    in one process).

    The best parameter snapshot (highest stopping acc, ties → lower loss
    — the reference's remember rule) is tracked ON DEVICE inside the
    scan so chunking never loses the exact best epoch.

    Per-epoch PRNG keys derive INSIDE the program from (key_epochs, e0):
    generating them host-side cost ~58ms of op-by-op dispatch per chunk
    on the tunneled platform — ~half the measured 3.9ms/epoch gap
    between the component floor and the in-chunk epoch (perfetto trace,
    2026-08-20). The stacked (3, epoch_chunk) metrics output makes the
    caller's device→host download ONE fetch instead of three.
    """
    epochs = e0 + jnp.arange(epoch_chunk)
    keys = jax.vmap(lambda e: jax.random.fold_in(key_epochs, e))(epochs)
    optimizer = optax.adam(learning_rate)

    def epoch_body(carry, key_epoch):
        params, opt_state, best = carry
        key, epoch = key_epoch
        active = epoch < limit

        def loss_fn(p):
            logp = ppnp_forward(p, x, propagator, idx_train, key=key,
                                train=True, drop_prob=drop_prob)
            return _nll(logp, y_train) + (reg_lambda / 2.0) * l2_reg(p)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, new_opt_state = optimizer.update(grads, opt_state)
        new_params = optax.apply_updates(params, updates)
        params = jax.tree.map(lambda n, o: jnp.where(active, n, o),
                              new_params, params)
        opt_state = jax.tree.map(lambda n, o: jnp.where(active, n, o),
                                 new_opt_state, opt_state)

        logp = ppnp_forward(params, x, propagator, idx_stop, train=False)
        stop_loss = _nll(logp, y_stop)
        stop_acc = jnp.mean(jnp.argmax(logp, axis=-1) == y_stop)

        best_params, best_acc, best_loss, best_epoch = best
        improved = jnp.logical_and(active, jnp.logical_or(
            stop_acc > best_acc,
            jnp.logical_and(stop_acc == best_acc, stop_loss < best_loss)))
        best = (
            jax.tree.map(lambda b, p: jnp.where(improved, p, b),
                         best_params, params),
            jnp.where(improved, stop_acc, best_acc),
            jnp.where(improved, stop_loss, best_loss),
            jnp.where(improved, epoch, best_epoch),
        )
        return (params, opt_state, best), (loss, stop_acc, stop_loss)

    (params, opt_state, best), ms = jax.lax.scan(
        epoch_body, (params, opt_state, best), (keys, epochs))
    return params, opt_state, best, jnp.stack(ms)


def prepare_attr_input(graph: SparseGraph, propagator, *,
                       x_format: str = "auto", x_dtype=None,
                       dtype=jnp.float32, hidden: int = 64):
    """L1-normalize the attribute matrix and stage it for the MLP tower.

    Returns either a dense device array or a packed ``SparseInput``
    (``ops/sparse_input.py`` — the reference's MixedLinear path,
    ``ppnp/pytorch/utils.py`` ~L40).

    ``x_format``: "sparse" keeps the attribute matrix sparse and routes
    fc1 through the pair-chunks SpMM kernel; "dense" densifies (the MXU
    path); "auto" picks sparse exactly where the densified matrix's
    HBM streams dominate the epoch: a scipy-sparse X whose dense form
    is ≥64MB at ≤5% density, on an unsharded propagator. Small graphs
    stay dense (dispatch-bound; dense fc1 is already cheap there).

    Sharded/padded propagators require H⁰ (hence X) padded to their row
    count; padding rows are zero and never selected by any idx.

    ``hidden``: the first hidden width (the fc1 SpMM's lane count) —
    "auto" only picks sparse when the VMEM-resident kernel can hold the
    fc1 forward/backward operands (~3·n·hidden + 2·f·hidden floats);
    beyond that (n ≳ 130k at hidden 64) X stays dense.
    """
    attr_norm = preprocessing.normalize_attributes(graph.attr_matrix)
    n_rows = getattr(propagator, "n_rows", attr_norm.shape[0])
    use_sparse = x_format == "sparse"
    if x_format == "auto":
        from ppnp_tpu.kernels.spmm import _VMEM_LIMIT_BYTES
        n, f = attr_norm.shape
        fc1_vmem = (3 * max(n_rows, n) + 2 * f) * hidden * 4
        use_sparse = (
            sp.issparse(attr_norm)
            and not hasattr(propagator, "input_sharding")
            and n * f >= 16_000_000
            and attr_norm.nnz <= 0.05 * n * f
            and fc1_vmem <= _VMEM_LIMIT_BYTES)
    elif x_format not in ("dense", "sparse"):
        raise ValueError(f"unknown x_format {x_format!r} "
                         "(expected 'auto', 'dense' or 'sparse')")
    if use_sparse:
        if x_dtype is not None and jnp.dtype(x_dtype) != jnp.dtype(
                jnp.float32):
            logger.warning(
                "x_dtype=%s ignored on the sparse path (the pair-chunks "
                "fc1 kernel runs float32)", jnp.dtype(x_dtype).name)
        if not sp.issparse(attr_norm):
            attr_norm = sp.csr_matrix(attr_norm)
        if hasattr(propagator, "input_sharding"):
            # Row-sharded sparse fc1 (ops/sparse_input.py
            # ShardedSparseInput): X row-sliced on the propagator's
            # shard grid, fc1 per shard inside shard_map — no exchange
            # (X rows are owned), W's cotangent psummed by shard_map's
            # transpose rule.
            from ppnp_tpu.ops.sparse_input import \
                build_sharded_sparse_input
            g = propagator.graph
            axes = ((propagator.dcn_axis, propagator.ici_axis)
                    if hasattr(propagator, "dcn_axis")
                    else (propagator.axis,))
            return build_sharded_sparse_input(
                attr_norm, shard_rows=g.shard_rows,
                n_shards=g.n_shards, mesh=propagator.mesh, axes=axes)
        from ppnp_tpu.ops.sparse_input import build_sparse_input
        return build_sparse_input(attr_norm, n_rows=max(
            n_rows, attr_norm.shape[0]))
    x_np = _densify_attributes(attr_norm)
    if n_rows > x_np.shape[0]:
        x_np = np.pad(x_np, ((0, n_rows - x_np.shape[0]), (0, 0)))
    # ``x_dtype`` stores ONLY the attribute matrix in a lower
    # precision (bfloat16 halves the dominant n×f HBM traffic: the
    # train-forward dropout copy, the first-layer dot reads in
    # forward/backward, and the eval forward) while parameters, Adam
    # state, activations past layer 1, and the propagation stay at
    # ``dtype`` — see models/appnp.py mlp_forward's mixed-precision
    # dot.
    x = jnp.asarray(x_np, dtype=x_dtype or dtype)
    if hasattr(propagator, "input_sharding"):
        x = jax.device_put(x, propagator.input_sharding())
    return x


def _check_prepared_input(x, graph, propagator, *, x_format, x_dtype):
    """Validate a caller-staged ``x_prepared`` at the call boundary.

    A staged X silently overrides ``x_format``/``x_dtype``; sweeping
    those arguments while reusing one staged array would otherwise
    measure the wrong configuration (or fail deep inside the jitted
    chunk with an opaque shape error when the propagator's padded row
    count disagrees). Cheap metadata checks only — no device traffic.
    """
    from ppnp_tpu.ops.sparse_input import ShardedSparseInput, SparseInput
    is_sparse = isinstance(x, (SparseInput, ShardedSparseInput))
    if x_format == "sparse" and not is_sparse:
        raise ValueError("x_prepared is a dense array but x_format="
                         "'sparse' was requested; re-stage with "
                         "prepare_attr_input(..., x_format='sparse')")
    if x_format == "dense" and is_sparse:
        raise ValueError("x_prepared is a SparseInput but x_format="
                         "'dense' was requested; re-stage with "
                         "prepare_attr_input(..., x_format='dense')")
    sharded_prop = hasattr(propagator, "input_sharding")
    if isinstance(x, SparseInput) and sharded_prop:
        raise ValueError("x_prepared is an unsharded SparseInput but the "
                         "propagator is sharded; re-stage with "
                         "prepare_attr_input(graph, sharded_propagator, "
                         "x_format='sparse') to get the row-sharded "
                         "packing")
    if isinstance(x, ShardedSparseInput) and not sharded_prop:
        raise ValueError("x_prepared is a ShardedSparseInput but the "
                         "propagator is unsharded; re-stage with the "
                         "unsharded propagator")
    n_attr, n_feat = graph.attr_matrix.shape
    n_need = max(int(getattr(propagator, "n_rows", n_attr)), n_attr)
    if tuple(x.shape) != (n_need, n_feat):
        raise ValueError(
            f"x_prepared has shape {tuple(x.shape)} but this "
            f"(graph, propagator) needs ({n_need}, {n_feat}); it was "
            "staged for a different graph or differently-padded "
            "propagator")
    if x_dtype is not None:
        want = jnp.dtype(x_dtype)
        if is_sparse:
            # The sparse kernel path always runs f32 (SparseInput.matmul
            # force-casts); an explicit non-f32 request is ignored — the
            # same warn-and-run rule as prepare_attr_input's sparse path,
            # so staged and unstaged calls behave identically.
            if want != jnp.dtype(jnp.float32):
                logger.warning(
                    "x_dtype=%s ignored on the sparse path (the pair-"
                    "chunks fc1 kernel runs float32)", want.name)
        elif jnp.dtype(x.dtype) != want:
            raise ValueError(
                f"x_dtype={want.name} requested but x_prepared was "
                f"staged as {jnp.dtype(x.dtype).name}; re-stage with "
                "prepare_attr_input(..., x_dtype=...)")


def train_model(
    graph: SparseGraph,
    propagator,
    *,
    hidden_units: Sequence[int] = (64,),
    drop_prob: float = 0.5,
    learning_rate: float = 0.01,
    reg_lambda: float = 5e-3,
    idx_split_args: Optional[Dict[str, int]] = None,
    stopping_args: Optional[Dict[str, Any]] = None,
    test: bool = False,
    seed: int = 0,
    print_interval: int = 20,
    metrics: Optional[JsonlWriter] = None,
    dtype=jnp.float32,
    checkpoint_dir: Optional[str] = None,
    checkpoint_every: int = 500,
    resume: bool = False,
    # Amortizes the per-chunk dispatch + metric-fetch RTT (~28ms on the
    # tunneled platform) without hurting early-stop exactness (the
    # partial-chunk replay stops at the precise epoch). Measured on MS
    # Academic (2026-08-20): 9.08 / 8.50 / 8.28 ms/epoch at chunk
    # 25/50/100 vs a 7.95 component floor. The cost model is
    # E·(floor + RTT/chunk) + chunk·floor (one chunk of overshoot work
    # at the stopping point), optimal chunk ≈ sqrt(RTT·E/floor) ≈ 60
    # for a typical 1,000-epoch early-stopped run — 50 is within noise
    # of that across 200-3,000-epoch runs.
    epoch_chunk: int = 50,
    profile_dir: Optional[str] = None,
    x_dtype=None,
    x_format: str = "auto",
    x_prepared=None,
) -> Tuple[Any, Dict[str, Any]]:
    """Train PPNP/APPNP on a graph; returns (params, result_dict).

    ``propagator`` is a prebuilt propagation operator (PPRPowerIteration /
    PPRExact / ShardedPowerIteration) — prebuilt by the caller exactly as
    the reference passes a constructed propagation module in model_args
    (SURVEY.md §3.1).

    ``profile_dir``: if set, the steady-state epoch chunks (everything
    after the first, compile-bearing chunk; or all of a single-chunk run)
    are traced with ``jax.profiler`` into that directory, including a
    perfetto-compatible dump (SURVEY.md §5 "Tracing" row). The result
    dict additionally reports ``spmm_gbps`` — effective propagation
    bandwidth derived from the steady-state chunk timer.
    """
    t_start = time.time()
    idx_split_args = dict(idx_split_args or default_idx_split_args)
    stop_args = dict(default_stopping_args)
    stop_args.update(stopping_args or {})
    max_epochs = int(stop_args.pop("max_epochs"))

    labels_np = np.asarray(graph.labels)
    idx_train_np, idx_stop_np, idx_valtest_np = preprocessing.gen_splits(
        labels_np, idx_split_args, test=test)

    # ``x_prepared``: a staged attribute matrix from a prior
    # ``prepare_attr_input`` call. X does not depend on the seed, so a
    # seed sweep (reproduce.py) prepares it ONCE — at MS Academic scale
    # the per-call pack+upload otherwise adds ~1.5s of fixed cost to
    # every seed.
    if x_prepared is not None:
        _check_prepared_input(x_prepared, graph, propagator,
                              x_format=x_format, x_dtype=x_dtype)
        x = x_prepared
    else:
        x = prepare_attr_input(graph, propagator, x_format=x_format,
                               x_dtype=x_dtype, dtype=dtype,
                               hidden=max(hidden_units, default=64))

    idx_train = jnp.asarray(idx_train_np)
    idx_stop = jnp.asarray(idx_stop_np)
    y_train = jnp.asarray(labels_np[idx_train_np])
    y_stop = jnp.asarray(labels_np[idx_stop_np])

    root_key = jax.random.PRNGKey(seed)
    key_init, key_epochs = jax.random.split(root_key)
    params = init_mlp_params(
        key_init, x.shape[1], list(hidden_units),
        int(labels_np.max()) + 1, dtype=dtype)

    optimizer = optax.adam(learning_rate)
    opt_state = optimizer.init(params)

    # Epoch-chunked training: `epoch_chunk` epochs run inside ONE compiled
    # lax.scan call (see _run_chunk — shared/cached across train_model
    # calls so seed sweeps compile once).
    def run_chunk(params, opt_state, best, e0, limit):
        # Always epoch_chunk-wide (shape-stable — see _run_chunk): the
        # trailing epochs past `limit` are masked no-ops inside the
        # scan. Keys/epochs derive inside the program from (root key,
        # e0) — no host-side per-chunk dispatches.
        return _run_chunk(params, opt_state, best, key_epochs,
                          jnp.int32(e0), jnp.int32(limit), x,
                          idx_train, y_train, idx_stop, y_stop, propagator,
                          learning_rate=learning_rate,
                          reg_lambda=reg_lambda, drop_prob=drop_prob,
                          epoch_chunk=epoch_chunk)

    def init_best(params):
        return (params, jnp.float32(-jnp.inf), jnp.float32(jnp.inf),
                jnp.int32(-1))

    early_stopping = EarlyStopping(
        stop_varnames=stop_args["stop_varnames"],
        patience=stop_args["patience"],
        max_epochs=max_epochs)

    best = init_best(params)
    start_epoch = 0
    if resume and checkpoint_dir is not None:
        from ppnp_tpu import checkpoint as ckpt_mod
        # Restore against a live target so optax NamedTuple states keep
        # their structure (orbax would otherwise return plain dicts).
        target = {
            "params": params,
            "opt_state": opt_state,
            "epoch": 0,
            "early_stopping": {
                "best_vals": np.zeros(2), "patience": 0,
                "best_acc": 0.0, "best_loss": 0.0, "best_epoch": 0,
            },
            "best_state": params,
        }
        state = ckpt_mod.restore_checkpoint(checkpoint_dir, target=target)
        if state is not None:
            params = jax.tree.map(jnp.asarray, state["params"])
            opt_state = jax.tree.map(jnp.asarray, state["opt_state"])
            start_epoch = int(state["epoch"]) + 1
            es = state["early_stopping"]
            early_stopping.best_vals = list(np.asarray(es["best_vals"]))
            early_stopping.patience = int(es["patience"])
            early_stopping._best_acc = float(es["best_acc"])
            early_stopping._best_loss = float(es["best_loss"])
            early_stopping.best_epoch = (int(es["best_epoch"])
                                         if es["best_epoch"] >= 0 else None)
            best = (jax.tree.map(jnp.asarray, state["best_state"]),
                    jnp.float32(es["best_acc"]),
                    jnp.float32(es["best_loss"]),
                    jnp.int32(es["best_epoch"]))
            logger.info("resumed from epoch %d", start_epoch)

    def _save(epoch, params, opt_state, best):
        from ppnp_tpu import checkpoint as ckpt_mod
        b_acc, b_loss, b_epoch = _host_scalars(best[1], best[2], best[3])
        ckpt_mod.save_checkpoint(checkpoint_dir, epoch, {
            "params": params,
            "opt_state": opt_state,
            "epoch": epoch,
            "early_stopping": {
                "best_vals": np.asarray(early_stopping.best_vals),
                "patience": early_stopping.patience,
                "best_acc": float(b_acc),
                "best_loss": float(b_loss),
                "best_epoch": int(b_epoch),
            },
            "best_state": best[0],
        })

    last_epoch = max(start_epoch - 1, 0)
    stop = False
    chunk_start = start_epoch
    # Per-chunk (n_epochs, wall_s) pairs: the steady-state epoch cost.
    # Whole-call wall time also includes per-call fixed costs (X upload,
    # host preprocessing) that are large and NOISY on remote-tunneled
    # platforms, so benchmarks read these instead (bench_training).
    chunk_times: list = []
    # Steady-state chunk timer (ticks only on full chunks, starting at
    # the end of the first one so compile never enters the EMA); feeds
    # result["spmm_gbps"] below.
    from ppnp_tpu.profiling import StepTimer
    chunk_timer = StepTimer()
    profiling_active = False
    while chunk_start < max_epochs and not stop:
        if (profile_dir is not None and not profiling_active
                and (chunk_times or max_epochs - start_epoch
                     <= epoch_chunk)):
            # Trace the steady-state chunks: start after the first
            # (compile-bearing) chunk, or at the first if it is the only
            # one. Perfetto dump lands at stop (SURVEY.md §5).
            jax.profiler.start_trace(profile_dir,
                                     create_perfetto_trace=True)
            profiling_active = True
        t_chunk = time.perf_counter()
        count = min(epoch_chunk, max_epochs - chunk_start)
        pre = (params, opt_state, best)
        params, opt_state, best, ms = run_chunk(
            params, opt_state, best, chunk_start, chunk_start + count)
        losses, accs, stop_losses = np.asarray(ms)[:, :count]
        chunk_times.append((count, time.perf_counter() - t_chunk))
        if count == epoch_chunk:
            chunk_timer.tick()
        # NaN guard (the purity/checkify analog of the reference's absent
        # sanitizers — SURVEY.md §5): fail fast with the offending epoch.
        if not np.isfinite(losses).all():
            if profiling_active:
                jax.profiler.stop_trace()
                profiling_active = False
            bad = int(np.where(~np.isfinite(losses))[0][0])
            raise FloatingPointError(
                f"non-finite training loss at epoch {chunk_start + bad} "
                f"(loss={losses[bad]}); check learning rate / inputs")

        stop_at = None
        for i in range(count):
            epoch = chunk_start + i
            last_epoch = epoch
            if metrics is not None:
                metrics.write(event="epoch", epoch=epoch,
                              train_loss=float(losses[i]),
                              stopping_accuracy=float(accs[i]),
                              stopping_loss=float(stop_losses[i]))
            if print_interval and epoch % print_interval == 0:
                logger.info(
                    "epoch %4d: train loss %.4f, stopping acc %.4f "
                    "loss %.4f", epoch, float(losses[i]), float(accs[i]),
                    float(stop_losses[i]))
            if early_stopping.check([float(accs[i]), float(stop_losses[i])],
                                    epoch):
                stop_at = i
                break

        if stop_at is not None:
            stop = True
            if stop_at < count - 1:
                # Replay the partial chunk so the on-device best snapshot
                # stops exactly at the stopping epoch (the reference never
                # sees post-stop epochs — SURVEY.md §3.1).
                params, opt_state, best = pre
                params, opt_state, best, _ = run_chunk(
                    params, opt_state, best, chunk_start,
                    chunk_start + stop_at + 1)
        if checkpoint_dir is not None and (
                stop or (chunk_start // checkpoint_every)
                != ((last_epoch + 1) // checkpoint_every)):
            _save(last_epoch, params, opt_state, best)
        chunk_start += count

    if checkpoint_dir is not None and not stop:
        # The run exhausted max_epochs without tripping early stopping:
        # persist the final state too (the in-loop save only fires on
        # stop or on crossing a checkpoint_every boundary).
        _save(last_epoch, params, opt_state, best)

    trace_written = profiling_active
    if profiling_active:
        jax.profiler.stop_trace()
        profiling_active = False
        logger.info("profiler trace written to %s", profile_dir)

    runtime = time.time() - t_start
    best_params, _, _, best_epoch_dev = best
    best_epoch = int(_host_scalars(best_epoch_dev)[0])
    if best_epoch >= 0:
        params = best_params  # restore best snapshot
    else:
        best_epoch = None

    # Final evaluation (eval mode) on all splits. If training stopped
    # inside the first (compile-bearing) chunk the steady-state trace
    # never started — trace this eval forward instead so profile_dir is
    # never silently left empty.
    if profile_dir is not None and not trace_written and chunk_times:
        logger.warning(
            "training ended during the first epoch chunk; tracing the "
            "final eval forward instead of steady-state chunks")
        with jax.profiler.trace(profile_dir, create_perfetto_trace=True):
            preds = get_predictions(params, x, propagator)
    else:
        preds = get_predictions(params, x, propagator)
    n_classes = int(labels_np.max()) + 1
    result: Dict[str, Any] = {}
    for split_name, idx in (("train", idx_train_np),
                            ("early_stopping", idx_stop_np),
                            ("valtest", idx_valtest_np)):
        result[split_name] = {
            "accuracy": accuracy(labels_np[idx], preds[idx]),
            "f1_score": macro_f1(labels_np[idx], preds[idx], n_classes),
        }
    nepochs = last_epoch + 1
    result.update(
        x_format=("sparse" if isinstance(
            x, (SparseInput, ShardedSparseInput)) else "dense"),
        runtime=runtime,
        runtime_perepoch=runtime / max(nepochs, 1),
        chunk_times=chunk_times,
        last_epoch=last_epoch,
        best_epoch=best_epoch,
        predictions=preds,
    )
    # Effective propagation bandwidth (BASELINE.json:2's metric) from the
    # steady-state chunk EMA: one epoch moves ~3·K SpMMs of traffic
    # (forward K, transpose-backward K, stopping-eval K), each touching
    # the edge stream (nnz·8B) plus H in/out (2·n·c·4B).
    edges = getattr(propagator, "edges", None)
    niter = getattr(propagator, "niter", None)
    if chunk_timer.ema_step_s and edges is not None and niter:
        bytes_per_step = edges.nnz * 8 + 2 * x.shape[0] * n_classes * 4
        result["spmm_gbps"] = chunk_timer.gbps(
            epoch_chunk * 3 * niter * bytes_per_step)
    if metrics is not None:
        metrics.write(event="final", **{
            k: v for k, v in result.items() if k != "predictions"})
    logger.info(
        "done: %d epochs (best %s), valtest acc %.4f f1 %.4f, %.1fs",
        nepochs, best_epoch,
        result["valtest"]["accuracy"], result["valtest"]["f1_score"],
        runtime)
    return params, result
