"""Builders: RunConfig + graph → propagation operator / training kwargs.

The reference's callers construct the propagation module by hand in each
notebook (SURVEY.md §3.1: ``model_args['propagation']`` is pre-built);
this module is the single place where the CLI and the experiment harness
translate a config into operators.
"""

from __future__ import annotations

import logging
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from ppnp_tpu.config import RunConfig
from ppnp_tpu.data.datasets import DATASETS, load_dataset
from ppnp_tpu.data.sparsegraph import SparseGraph
from ppnp_tpu.ops.exact import PPRExact, calc_ppr_exact
from ppnp_tpu.ops.normalize import calc_A_hat
from ppnp_tpu.ops.propagation import PPRPowerIteration
from ppnp_tpu.ops.sparse import edge_list_from_scipy

logger = logging.getLogger(__name__)

__all__ = ["load_graph", "build_propagator", "train_kwargs"]


def load_graph(cfg: RunConfig) -> SparseGraph:
    graph = load_dataset(cfg.dataset).standardize()
    if cfg.propagation == "sharded" and cfg.shard_reorder == "rcm":
        # Relabel by a bandwidth-reducing order BEFORE row-partitioning:
        # RCM clusters each node's neighbors near it, so far fewer edges
        # cross shard boundaries and the per-step exchange shrinks
        # (docs/DISTRIBUTED.md). The permuted graph is the same graph
        # under a new numbering — splits/metrics/names stay consistent.
        from ppnp_tpu.ops.pairchunks import rcm_permutation
        graph.permute(rcm_permutation(graph.adj_matrix))
    return graph


def resolve_alpha(cfg: RunConfig) -> float:
    if cfg.alpha is not None:
        return cfg.alpha
    spec = DATASETS.get(cfg.dataset)
    return spec.alpha if spec is not None else 0.1


def _resolve_layout(cfg: RunConfig, a_hat, reorder: str = "rcm"):
    """(packer layout, geometry kwargs, precomputed perm) for the config.

    ``layout="auto"`` runs the issue-cost geometry model ONCE on the
    full matrix (ppnp_tpu.ops.pairchunks.select_geometry) and pins the
    result as explicit kwargs, so forward/transpose packings — and every
    shard of a sharded build — share one static geometry. The RCM
    permutation computed for the model is returned so callers pack
    under it instead of recomputing RCM (it is the expensive host step
    at ingest scale). ``reorder=None`` skips RCM (e.g. the sharded path,
    whose graph was already relabeled by ``load_graph``).
    """
    if cfg.layout != "auto":
        return cfg.layout, {}, None
    from ppnp_tpu.ops.pairchunks import rcm_permutation, select_geometry
    perm = rcm_permutation(a_hat) if reorder == "rcm" else None
    geo = select_geometry(a_hat, perm=perm)
    cost = geo.pop("cost")
    logger.info("auto geometry: %s (model cost %.3g)", geo, cost)
    return "banded", geo, perm


def build_propagator(cfg: RunConfig, graph: SparseGraph):
    """Construct the propagation operator named by the config."""
    a_hat = calc_A_hat(graph.adj_matrix)
    alpha = resolve_alpha(cfg)
    if cfg.propagation == "exact":
        return PPRExact(ppr=calc_ppr_exact(a_hat, alpha),
                        drop_prob=cfg.drop_prob)
    if cfg.propagation == "power":
        pc = pc_t = perm = None
        if cfg.backend in ("pallas", "fused"):
            import numpy as np
            import jax.numpy as jnp
            from ppnp_tpu.ops.pairchunks import (packer_for,
                                                 slot_permutation,
                                                 to_device,
                                                 transpose_pair)
            # Bandwidth-reducing reorder densifies window pairs (see
            # ppnp_tpu.kernels.spmm); the same row permutation must be
            # used for the forward and transpose packings. Pack + slot
            # permutation run host-side, ONE upload at the end (device
            # round-trips are very slow on tunneled platforms).
            layout, geo, aperm = _resolve_layout(cfg, a_hat)
            reorder_kw = ({"perm": aperm} if aperm is not None
                          else {"reorder": "rcm"})
            pc = packer_for(layout)(a_hat, device=False, **reorder_kw,
                                    **geo)
            row_perm = (np.asarray(pc.perm) if pc.perm is not None
                        else None)
            pc_t = transpose_pair(a_hat, perm=row_perm, device=False,
                                  layout=layout, **geo)
            perm = jnp.asarray(slot_permutation(pc, pc_t))
            pc, pc_t = to_device(pc), to_device(pc_t)
        elif cfg.backend == "blocked":
            # HBM-streaming row blocks for graphs whose H outgrows VMEM
            # on one chip (ppnp_tpu.kernels.blocked).
            from ppnp_tpu.kernels.blocked import build_blocked_pair_chunks
            # layout="auto" tunes geometry INSIDE the blocked builder, on
            # a representative (rows_per_block × hw) block sub-operator —
            # the shape the packer actually sees — not the full matrix.
            pc = build_blocked_pair_chunks(
                a_hat, rows_per_block=cfg.rows_per_block,
                geometry=("auto" if cfg.layout == "auto" else None))
            logger.info("blocked: %d blocks of %d rows, H window %d",
                        pc.n_blocks, pc.rows_per_block, pc.hw)
        return PPRPowerIteration(
            edges=edge_list_from_scipy(a_hat), pair_chunks=pc,
            pair_chunks_t=pc_t, w_perm=perm,
            alpha=alpha, niter=cfg.niter, drop_prob=cfg.drop_prob,
            backend=cfg.backend)
    if cfg.propagation == "sharded":
        from ppnp_tpu.parallel.mesh import make_mesh
        from ppnp_tpu.parallel.partition import (build_sharded_graph,
                                                 build_sharded_pair_chunks)
        from ppnp_tpu.parallel.sharded import ShardedPowerIteration
        n_shards = cfg.n_shards or jax.device_count()
        if (cfg.n_slices or 1) > 1:
            # Hierarchical 2-axis (dcn, ici) mesh: boundary rows
            # exchange intra-slice over ICI and once per remote slice
            # (deduplicated) over DCN (parallel/hier.py; the SURVEY §5
            # "ICI intra-slice / DCN across slices" comm design).
            from ppnp_tpu.parallel.hier import (HierShardedPowerIteration,
                                                build_hier_pair_chunks,
                                                build_hier_sharded_graph)
            from ppnp_tpu.parallel.mesh import make_hier_mesh
            D = int(cfg.n_slices)
            if n_shards % D:
                raise ValueError(
                    f"n_shards={n_shards} not divisible by "
                    f"n_slices={D}")
            I = n_shards // D
            hmesh = make_hier_mesh(D, I)
            hg = build_hier_sharded_graph(a_hat, D, I)
            logger.info(
                "hier-sharded %dx%d: S=%d b_ici=%d b_dcn=%d E=%d",
                D, I, hg.shard_rows, hg.b_ici, hg.b_dcn, hg.edges_pad)
            hpc = hpc_t = hperm = None
            if cfg.backend == "pallas":
                layout, geo, _ = _resolve_layout(cfg, a_hat, reorder=None)
                hpc, hpc_t, hperm = build_hier_pair_chunks(
                    hg, layout=layout, **geo)
            return HierShardedPowerIteration(
                graph=hg, mesh=hmesh, pair_chunks=hpc,
                pair_chunks_t=hpc_t, w_perm=hperm, alpha=alpha,
                niter=cfg.niter, drop_prob=cfg.drop_prob,
                backend=cfg.backend)
        mesh = make_mesh(n_devices=n_shards)
        sg = build_sharded_graph(a_hat, n_shards=n_shards)
        logger.info("sharded over %d devices: S=%d B=%d E=%d",
                    n_shards, sg.shard_rows, sg.boundary, sg.edges_pad)
        pc = pc_t = w_perm = None
        if cfg.backend == "pallas":
            # load_graph already RCM-relabeled the sharded graph, so the
            # geometry model runs on the relabeled matrix directly.
            layout, geo, _ = _resolve_layout(cfg, a_hat, reorder=None)
            pc, pc_t, w_perm = build_sharded_pair_chunks(
                sg, layout=layout, **geo)
        return ShardedPowerIteration(
            graph=sg, mesh=mesh, pair_chunks=pc, pair_chunks_t=pc_t,
            w_perm=w_perm, alpha=alpha, niter=cfg.niter,
            drop_prob=cfg.drop_prob, exchange=cfg.exchange,
            backend=cfg.backend)
    raise ValueError(f"unknown propagation {cfg.propagation!r}")


def train_kwargs(cfg: RunConfig) -> Dict[str, Any]:
    """kwargs for ``ppnp_tpu.train.train_model`` from a config."""
    return dict(
        hidden_units=list(cfg.hidden),
        drop_prob=cfg.drop_prob,
        learning_rate=cfg.learning_rate,
        reg_lambda=cfg.reg_lambda,
        idx_split_args={
            "ntrain_per_class": cfg.ntrain_per_class,
            "nstopping": cfg.nstopping,
            "nknown": cfg.nknown,
            "seed": cfg.split_seed,
        },
        stopping_args={"max_epochs": cfg.max_epochs,
                       "patience": cfg.patience},
        test=cfg.test,
        seed=cfg.seed,
        print_interval=cfg.print_interval,
        x_dtype=(jnp.bfloat16 if cfg.x_dtype == "bfloat16" else None),
        x_format=cfg.x_format,
    )
