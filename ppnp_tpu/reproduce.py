"""Seed-sweep evaluation harness.

Reference analog: ``reproduce_results_pytorch.ipynb`` (SURVEY.md §3.6):
for each dataset × propagation, train over a list of seeds (each seed
drives both the split sampling and the model init) and report mean
accuracy with a bootstrap confidence interval — the parity contract of
BASELINE.json:5 ("within seed variance").
"""

from __future__ import annotations

import dataclasses
import json
import logging
import time
from typing import Dict, List, Optional, Sequence

import numpy as np

from ppnp_tpu.builders import build_propagator, load_graph, train_kwargs
from ppnp_tpu.config import RunConfig
from ppnp_tpu.train import train_model

logger = logging.getLogger(__name__)

__all__ = ["run_seed_sweep", "bootstrap_ci"]

# A fixed seed list, in the spirit of the reference's fixed seed arrays.
DEFAULT_SEEDS = [
    2144199730, 794209841, 2985733717, 2282690970, 1901557222,
    2009332812, 2266730407, 635625077, 3538425002, 960893189,
]


def bootstrap_ci(values: Sequence[float], n_boot: int = 1000,
                 seed: int = 0) -> float:
    """Half-width of the 95% bootstrap CI of the mean."""
    values = np.asarray(values, dtype=np.float64)
    if len(values) < 2:
        return 0.0
    rng = np.random.RandomState(seed)
    means = [
        rng.choice(values, size=len(values), replace=True).mean()
        for _ in range(n_boot)
    ]
    lo, hi = np.percentile(means, [2.5, 97.5])
    return float((hi - lo) / 2)


def run_seed_sweep(cfg: RunConfig,
                   seeds: Optional[Sequence[int]] = None,
                   out_path: Optional[str] = None) -> Dict:
    """Train cfg over seeds; returns {accuracies, mean, ci, ...}."""
    seeds = list(seeds if seeds is not None else DEFAULT_SEEDS)
    graph = load_graph(cfg)
    propagator = build_propagator(cfg, graph)
    kwargs = train_kwargs(cfg)

    accs: List[float] = []
    f1s: List[float] = []
    t0 = time.time()
    for i, seed in enumerate(seeds):
        # Each sweep seed drives both the split sample and the init,
        # mirroring the reference's protocol (SURVEY.md §3.6).
        kw = dict(kwargs)
        kw["seed"] = int(seed)
        kw["idx_split_args"] = dict(kw["idx_split_args"],
                                    seed=int(seed) & 0x7FFFFFFF)
        _, res = train_model(graph, propagator, **kw)
        accs.append(res["valtest"]["accuracy"])
        f1s.append(res["valtest"]["f1_score"])
        logger.info("seed %d (%d/%d): acc %.4f (running mean %.4f)",
                    seed, i + 1, len(seeds), accs[-1], np.mean(accs))

    result = {
        "config": dataclasses.asdict(cfg),
        "seeds": [int(s) for s in seeds],
        "accuracies": accs,
        "f1_scores": f1s,
        "mean_accuracy": float(np.mean(accs)),
        "ci95_accuracy": bootstrap_ci(accs),
        "mean_f1": float(np.mean(f1s)),
        "runtime": time.time() - t0,
    }
    if out_path:
        with open(out_path, "w") as f:
            json.dump(result, f, indent=2)
    return result
