"""Seed-batched training: train G seeds' models SIMULTANEOUSLY.

Reference analog: the reproduce notebook's serial seed loop
(``reproduce_results_pytorch.ipynb``, SURVEY.md §3.6) — the reference's
entire evaluation protocol is "train the same model under G seeds and
report mean ± CI". Serially that costs G× one run. This module is the
TPU-native replacement: the G models' local logits stack along the MXU
lane axis (c classes each, G·c total lanes), and since the pair-chunks
SpMM kernel is MXU-issue-bound — its per-step cost is flat in lane
count up to 128 (BASELINE.md c-sweep) — ALL of the epoch's propagation
work (train forward, transpose backward, stopping-set eval) for G
seeds issues roughly the MXU work of ONE seed:

- eval-mode propagation shares Â's weights outright (one plain kernel
  call on the stacked matrix);
- train-mode propagation gives each seed its own per-iteration edge-
  dropout mask via the grouped kernel
  (``kernels/spmm.py::_spmm_kernel_grouped``): one shared unit-weight
  gather dot + per-group VPU multiplies + one shared scatter dot;
- the MLP tower runs per-seed via vmap (dense X) or the grouped kernel
  (sparse X), with per-seed dropout keys;
- Adam runs on the G-stacked parameter pytree (elementwise — exactly
  per-seed Adam); early stopping is tracked per seed on host with
  per-seed epoch limits, and the shape-stable chunk replay masks each
  seed's post-stop epochs exactly as ``train.train_model`` does.

Per-seed semantics mirror ``train_model`` key-for-key: each seed's
init, split, dropout masks, and stopping decisions derive from its own
PRNGKey(seed) chain, so a batched sweep reproduces the sequential
sweep (bit-exactly on CPU; at the MXU's default-precision level on
chip).
"""

from __future__ import annotations

import functools
import logging
import time
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ppnp_tpu import preprocessing
from ppnp_tpu.data.sparsegraph import SparseGraph
from ppnp_tpu.earlystopping import EarlyStopping
from ppnp_tpu.metrics import accuracy, macro_f1
from ppnp_tpu.models.appnp import init_mlp_params
from ppnp_tpu.ops.dropout import dropout, edge_dropout_by_id_grouped
from ppnp_tpu.ops.propagation import propagate_grouped
from ppnp_tpu.ops.sparse_input import SparseInput
from ppnp_tpu.train import (_check_prepared_input, _host_scalars,
                            default_idx_split_args, default_stopping_args,
                            prepare_attr_input)

logger = logging.getLogger(__name__)

__all__ = ["train_models", "grouped_forward"]


def _grouped_mlp(params_g, x, keys_mlp_g, *, train: bool, drop_prob: float,
                 groups: int) -> jnp.ndarray:
    """Per-seed MLP towers → (n, G·c) stacked local logits (seed g's
    classes in lanes [g·c, (g+1)·c) — the grouped kernel's layout).

    ``params_g``: list of (G, d_in, d_out) weights; ``keys_mlp_g``: one
    MLP-stream key per seed (split per layer exactly as ``mlp_forward``
    does, so masks match the sequential path). Dense X runs the
    ordinary ``mlp_forward`` under vmap (each seed draws its own input-
    dropout mask — fine at dense-X scale, which is the small graphs by
    construction of ``prepare_attr_input``'s auto rule). Sparse X
    routes fc1 through the grouped kernel with per-seed id-keyed edge
    dropout on X's nnz values.
    """
    n_layers = len(params_g)
    use_drop = bool(train and drop_prob > 0.0 and keys_mlp_g is not None)

    if not isinstance(x, SparseInput):
        from ppnp_tpu.models.appnp import mlp_forward

        def one(params, k):
            return mlp_forward(params, x, key=k, train=train,
                               drop_prob=drop_prob)

        if use_drop:
            hg = jax.vmap(one)(params_g, keys_mlp_g)     # (G, n, c)
        else:
            hg = jax.vmap(lambda p: mlp_forward(p, x))(params_g)
        n = hg.shape[1]
        return jnp.moveaxis(hg, 0, 1).reshape(n, -1)
    keys_mlp = (jax.vmap(lambda k: jax.random.split(k, n_layers))(
        keys_mlp_g) if use_drop else None)

    # Sparse first layer, grouped: fc1_g = dropout_g(X) @ W1_g through
    # the grouped kernel (mirrors SparseInput.matmul per seed). The fc1
    # lane load is G·h1 (64 hidden lanes per seed vs ~c classes in the
    # propagation), so the call is split into the largest sub-batches
    # of seeds whose VMEM residents fit the kernel's budget.
    from ppnp_tpu.kernels.spmm import (_VMEM_LIMIT_BYTES, _spmm_vjp,
                                       _spmm_vjp_grouped)
    pc, pc_t = x.pc, x.pc_t
    w1 = params_g[0]                                     # (G, f, h1)
    h1 = w1.shape[-1]
    per_lane = 4 * (pc.n_cols_pad + 2 * pc.n_rows_pad
                    + pc_t.n_cols_pad + 2 * pc_t.n_rows_pad)
    sub = max(1, min(groups,
                     int(0.85 * _VMEM_LIMIT_BYTES) // (per_lane * h1)))
    w1s = jnp.moveaxis(w1, 0, 1).reshape(x.n_features, groups * h1)
    if w1s.dtype != jnp.float32:
        w1s = w1s.astype(jnp.float32)
    w1p = jnp.pad(w1s, ((0, pc.n_cols_pad - x.n_features), (0, 0)))
    if use_drop:
        k0 = keys_mlp[:, 0]
        e_w_g = edge_dropout_by_id_grouped(k0, pc, drop_prob)
        e_w_g_t = edge_dropout_by_id_grouped(k0, pc_t, drop_prob)
        parts = [_spmm_vjp_grouped(
            w1p[:, lo * h1:min(lo + sub, groups) * h1],
            e_w_g[:, :, lo:min(lo + sub, groups)], None, pc, pc_t,
            x.w_perm, e_w_g_t[:, :, lo:min(lo + sub, groups)], False)
            for lo in range(0, groups, sub)]
        h = jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]
    else:
        # Eval: every seed shares X's stored values — the ordinary
        # (single-weight-set) VJP on the lane-stacked W, sub-batched
        # under the same VMEM budget.
        parts = [_spmm_vjp(w1p[:, lo * h1:min(lo + sub, groups) * h1],
                           pc.e_w, None, pc, pc_t, x.w_perm, pc_t.e_w,
                           False)
                 for lo in range(0, groups, sub)]
        h = jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]
    n = h.shape[0]
    # fc1 is the output layer when hidden_units=() — mlp_forward's
    # last-layer rule applies no activation there.
    if n_layers > 1:
        h = jax.nn.relu(h)
    h = h.reshape(n, groups, h1)
    for i in range(1, n_layers):
        if use_drop:
            h = jax.vmap(lambda k, hh: dropout(k, hh, drop_prob),
                         in_axes=(0, 1), out_axes=1)(keys_mlp[:, i], h)
        h = jnp.einsum("ngd,gde->nge", h, params_g[i])
        if i < n_layers - 1:
            h = jax.nn.relu(h)
    return h.reshape(n, -1)


def grouped_forward(params_g, x, propagator,
                    idx_g: Optional[jnp.ndarray] = None,
                    keys_g: Optional[jax.Array] = None, *,
                    train: bool = False, drop_prob: float = 0.5,
                    groups: int = 1) -> jnp.ndarray:
    """Full PPNP forward for G seeds: MLP → propagate → per-seed idx →
    log_softmax. Returns (G, |idx|, c) log-probs — or (G, n, c) when
    ``idx_g`` is None. Key handling mirrors ``ppnp_forward`` per seed
    (split into MLP and propagation streams, MLP stream split per
    layer)."""
    if keys_g is not None:
        ks = jax.vmap(lambda k: jax.random.split(k))(keys_g)   # (G, 2)
        keys_mlp = ks[:, 0]
        keys_prop = ks[:, 1]
    else:
        keys_mlp = keys_prop = None
    with jax.named_scope("ppnp/grouped_mlp"):
        h = _grouped_mlp(params_g, x, keys_mlp, train=train,
                         drop_prob=drop_prob, groups=groups)
    with jax.named_scope("ppnp/grouped_propagate"):
        z = propagate_grouped(propagator, h, keys_prop, train=train,
                              groups=groups)
    n = z.shape[0]
    zg = z.reshape(n, groups, -1)
    if idx_g is None:
        sel = jnp.moveaxis(zg, 1, 0)                     # (G, n, c)
    else:
        sel = jax.vmap(lambda zs, ig: jnp.take(zs, ig, axis=0),
                       in_axes=(1, 0))(zg, idx_g)        # (G, |idx|, c)
    return jax.nn.log_softmax(sel, axis=-1)


def _mask_tree(new, old, mask_g: jnp.ndarray):
    """Per-seed masked update: leaves carry a leading G axis (params,
    Adam moments); 0-d leaves (Adam's shared step count) always advance
    — correct for every still-active seed, irrelevant for frozen ones
    (their best snapshot is already taken)."""
    def pick(n, o):
        if n.ndim == 0:
            return n
        m = mask_g.reshape((-1,) + (1,) * (n.ndim - 1))
        return jnp.where(m, n, o)
    return jax.tree.map(pick, new, old)


def _nll_g(logp: jnp.ndarray, y_g: jnp.ndarray) -> jnp.ndarray:
    """Per-seed mean NLL: logp (G, m, c), y_g (G, m) → (G,)."""
    rows = jnp.take_along_axis(logp, y_g[:, :, None], axis=2)
    return -jnp.mean(rows, axis=(1, 2))


@functools.partial(
    jax.jit, static_argnames=("learning_rate", "reg_lambda", "drop_prob",
                              "epoch_chunk", "groups"))
def _run_chunk_grouped(params_g, opt_state, best, key_epochs_g, e0,
                       limit_g, x, idx_train_g, y_train_g, idx_stop_g,
                       y_stop_g, propagator, *, learning_rate, reg_lambda,
                       drop_prob, epoch_chunk, groups):
    """The G-seed twin of ``train._run_chunk`` — same shape-stable
    masked scan, with the scalar ``limit`` generalized to a per-seed
    (G,) vector so seeds freeze independently (the early-stopping
    replay then masks exactly each seed's post-stop epochs)."""
    epochs = e0 + jnp.arange(epoch_chunk)
    keys = jax.vmap(lambda e: jax.vmap(
        lambda kg: jax.random.fold_in(kg, e))(key_epochs_g))(epochs)
    optimizer = optax.adam(learning_rate)

    def epoch_body(carry, key_epoch):
        params_g, opt_state, best = carry
        keys_g, epoch = key_epoch
        active_g = epoch < limit_g                       # (G,)

        def loss_fn(p):
            logp = grouped_forward(p, x, propagator, idx_train_g, keys_g,
                                   train=True, drop_prob=drop_prob,
                                   groups=groups)
            loss_g = (_nll_g(logp, y_train_g)
                      + (reg_lambda / 2.0) * jnp.sum(p[0] ** 2,
                                                     axis=(1, 2)))
            return jnp.sum(loss_g), loss_g

        (_, loss_g), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params_g)
        updates, new_opt_state = optimizer.update(grads, opt_state)
        new_params = optax.apply_updates(params_g, updates)
        params_g = _mask_tree(new_params, params_g, active_g)
        opt_state = _mask_tree(new_opt_state, opt_state, active_g)

        logp = grouped_forward(params_g, x, propagator, idx_stop_g,
                               train=False, drop_prob=drop_prob,
                               groups=groups)
        stop_loss_g = _nll_g(logp, y_stop_g)
        stop_acc_g = jnp.mean(jnp.argmax(logp, axis=-1) == y_stop_g,
                              axis=1)

        best_params, best_acc, best_loss, best_epoch = best
        improved = jnp.logical_and(active_g, jnp.logical_or(
            stop_acc_g > best_acc,
            jnp.logical_and(stop_acc_g == best_acc,
                            stop_loss_g < best_loss)))
        best = (
            _mask_tree(params_g, best_params, improved),
            jnp.where(improved, stop_acc_g, best_acc),
            jnp.where(improved, stop_loss_g, best_loss),
            jnp.where(improved, epoch, best_epoch),
        )
        return (params_g, opt_state, best), (loss_g, stop_acc_g,
                                             stop_loss_g)

    (params_g, opt_state, best), ms = jax.lax.scan(
        epoch_body, (params_g, opt_state, best), (keys, epochs))
    return params_g, opt_state, best, jnp.stack(ms)   # (3, chunk, G)


def train_models(
    graph: SparseGraph,
    propagator,
    seeds: Sequence[int],
    *,
    hidden_units: Sequence[int] = (64,),
    drop_prob: float = 0.5,
    learning_rate: float = 0.01,
    reg_lambda: float = 5e-3,
    idx_split_args: Optional[Dict[str, int]] = None,
    stopping_args: Optional[Dict[str, Any]] = None,
    test: bool = False,
    print_interval: int = 0,
    dtype=jnp.float32,
    epoch_chunk: int = 50,
    x_format: str = "auto",
    x_dtype=None,
    x_prepared=None,
) -> List[Tuple[Any, Dict[str, Any]]]:
    """Train one model per seed, all simultaneously; returns a list of
    (params, result_dict) in seed order — the batched equivalent of G
    sequential ``train_model`` calls under the reproduce protocol
    (each seed drives both the split sample and the init/dropout
    streams, SURVEY.md §3.6).

    Supported propagators: PPRPowerIteration with backend "pallas" or
    "xla". Checkpoint/resume and profiling stay on the single-seed
    path.
    """
    t_start = time.time()
    groups = len(seeds)
    if (groups > 6 and graph.adj_matrix.shape[0] >= 16_000
            and jax.default_backend() not in ("cpu",)):
        # Measured axon-platform fault boundary (2026-08-21 bisect,
        # reproduce.SAFE_SEED_BATCH): the combined epoch chunk crashes
        # the TPU worker above G=6 at paper scale. run_seed_sweep
        # sub-batches automatically; direct callers get a warning, not
        # an error — the boundary is platform-specific.
        logger.warning(
            "G=%d seed groups at n=%d: batched chunks above G=6 have "
            "crashed the axon TPU worker at this scale — prefer "
            "sub-batches of reproduce.SAFE_SEED_BATCH (see "
            "docs/PERFORMANCE.md 'Seed-batched sweeps at paper scale')",
            groups, graph.adj_matrix.shape[0])
    idx_split_args = dict(idx_split_args or default_idx_split_args)
    stop_args = dict(default_stopping_args)
    stop_args.update(stopping_args or {})
    max_epochs = int(stop_args.pop("max_epochs"))

    labels_np = np.asarray(graph.labels)
    splits = [preprocessing.gen_splits(
        labels_np, dict(idx_split_args, seed=int(s) & 0x7FFFFFFF), test)
        for s in seeds]
    idx_train_g = jnp.asarray(np.stack([s[0] for s in splits]))
    idx_stop_g = jnp.asarray(np.stack([s[1] for s in splits]))
    y_train_g = jnp.asarray(
        np.stack([labels_np[s[0]] for s in splits]))
    y_stop_g = jnp.asarray(np.stack([labels_np[s[1]] for s in splits]))

    if x_prepared is not None:
        # Same call-boundary validation as train_model: a staged X from
        # a different graph/propagator or mismatched format otherwise
        # fails deep inside the jitted chunk with an opaque shape error.
        _check_prepared_input(x_prepared, graph, propagator,
                              x_format=x_format, x_dtype=x_dtype)
        x = x_prepared
    else:
        x = prepare_attr_input(graph, propagator, x_format=x_format,
                               x_dtype=x_dtype, dtype=dtype,
                               hidden=max(hidden_units, default=64))

    n_classes = int(labels_np.max()) + 1
    params_list, key_epochs_list = [], []
    for s in seeds:
        k_init, k_epochs = jax.random.split(jax.random.PRNGKey(int(s)))
        params_list.append(init_mlp_params(
            k_init, x.shape[1], list(hidden_units), n_classes,
            dtype=dtype))
        key_epochs_list.append(k_epochs)
    params_g = jax.tree.map(lambda *xs: jnp.stack(xs), *params_list)
    key_epochs_g = jnp.stack(key_epochs_list)

    optimizer = optax.adam(learning_rate)
    opt_state = optimizer.init(params_g)
    best = (params_g, jnp.full(groups, -jnp.inf, jnp.float32),
            jnp.full(groups, jnp.inf, jnp.float32),
            jnp.full(groups, -1, jnp.int32))

    def run_chunk(params_g, opt_state, best, e0, limits_np):
        return _run_chunk_grouped(
            params_g, opt_state, best, key_epochs_g, jnp.int32(e0),
            jnp.asarray(limits_np, jnp.int32), x, idx_train_g, y_train_g,
            idx_stop_g, y_stop_g, propagator,
            learning_rate=learning_rate, reg_lambda=reg_lambda,
            drop_prob=drop_prob, epoch_chunk=epoch_chunk, groups=groups)

    es = [EarlyStopping(**stop_args) for _ in seeds]
    stopped = np.zeros(groups, bool)
    limits = np.full(groups, max_epochs, np.int64)
    chunk_start = 0
    last_epoch = np.zeros(groups, np.int64)
    chunk_times: list = []
    while chunk_start < max_epochs and not stopped.all():
        t_chunk = time.perf_counter()
        count = min(epoch_chunk, max_epochs - chunk_start)
        lim = np.minimum(limits, chunk_start + count)
        pre = (params_g, opt_state, best)
        params_g, opt_state, best, ms = run_chunk(
            params_g, opt_state, best, chunk_start, lim)
        ms = np.asarray(ms)[:, :count, :]        # (3, count, G)
        losses, accs, stop_losses = ms
        chunk_times.append((count, time.perf_counter() - t_chunk))
        act = ~stopped
        if not np.isfinite(losses[:, act]).all():
            bad = np.argwhere(~np.isfinite(losses[:, act]))[0]
            # bad[1] indexes the active-seed subset; map back to the
            # global seed position before reporting.
            g_bad = int(np.where(act)[0][bad[1]])
            raise FloatingPointError(
                f"non-finite training loss at epoch "
                f"{chunk_start + bad[0]} (seed {seeds[g_bad]}, "
                f"index {g_bad})")

        replay = False
        for g in range(groups):
            if stopped[g]:
                continue
            for i in range(count):
                epoch = chunk_start + i
                last_epoch[g] = epoch
                if es[g].check([float(accs[i, g]),
                                float(stop_losses[i, g])], epoch):
                    stopped[g] = True
                    limits[g] = epoch + 1
                    if epoch + 1 < chunk_start + count:
                        replay = True
                    break
        if replay:
            # Mask each newly-stopped seed's post-stop epochs exactly
            # (the grouped analog of train_model's partial-chunk replay).
            params_g, opt_state, best, _ = run_chunk(
                *pre, chunk_start, np.minimum(limits, chunk_start + count))
        if print_interval and (chunk_start // epoch_chunk) % max(
                1, print_interval // epoch_chunk) == 0:
            logger.info(
                "epoch %d: mean stopping acc %.4f (%d/%d seeds running)",
                chunk_start + count - 1, float(accs[-1].mean()),
                int((~stopped).sum()), groups)
        chunk_start += count

    best_params, best_acc, best_loss, best_epoch = best
    has_best = best_epoch >= 0
    params_g = _mask_tree(best_params, params_g, has_best)

    # Final predictions for every seed in one grouped eval forward.
    logp = _predict_grouped(params_g, x, propagator, groups)
    preds_g = np.asarray(jnp.argmax(logp, axis=-1))      # (G, n)
    best_epoch_np = np.asarray(_host_scalars(*jnp.ravel(best_epoch))
                               if groups <= 8 else best_epoch
                               ).astype(np.int64)[:groups]

    runtime = time.time() - t_start
    results = []
    for g in range(groups):
        idx_tr, idx_st, idx_vt = splits[g]
        res: Dict[str, Any] = {}
        for name, idx in (("train", idx_tr), ("early_stopping", idx_st),
                          ("valtest", idx_vt)):
            res[name] = {
                "accuracy": accuracy(labels_np[idx], preds_g[g][idx]),
                "f1_score": macro_f1(labels_np[idx], preds_g[g][idx],
                                     n_classes),
            }
        nepochs = int(last_epoch[g]) + 1
        res.update(
            runtime=runtime, runtime_perepoch=runtime / max(nepochs, 1),
            last_epoch=int(last_epoch[g]),
            best_epoch=int(best_epoch_np[g]),
            chunk_times=chunk_times, seed=int(seeds[g]),
            batched_seeds=groups,
            predictions=preds_g[g],
        )
        params_one = jax.tree.map(lambda a, g=g: a[g], params_g)
        results.append((params_one, res))
    return results


@functools.partial(jax.jit, static_argnames=("groups",))
def _predict_grouped(params_g, x, propagator, groups):
    return grouped_forward(params_g, x, propagator, train=False,
                           groups=groups)
