"""Seed-batched vs serial sweep timing probe (ppnp_tpu.multiseed).

Run on the real TPU. Reports per-chunk steady-state ms/epoch for the
batched sweep plus total wall; pass a dataset name as argv[1]
(default cora_ml) and nseeds as argv[2] (default 5).
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, numpy as np
from ppnp_tpu.config import RunConfig
from ppnp_tpu.utils.compcache import enable_compilation_cache
enable_compilation_cache()
from ppnp_tpu.reproduce import DEFAULT_SEEDS
from ppnp_tpu.builders import load_graph, build_propagator, train_kwargs
from ppnp_tpu.multiseed import train_models
from ppnp_tpu.train import prepare_attr_input

dataset = sys.argv[1] if len(sys.argv) > 1 else "cora_ml"
nseeds = int(sys.argv[2]) if len(sys.argv) > 2 else 5
cfg = RunConfig(dataset=dataset, backend="pallas", layout="auto")
graph = load_graph(cfg)
prop = build_propagator(cfg, graph)
kw = train_kwargs(cfg)
kw.pop("seed", None)
kw["x_prepared"] = prepare_attr_input(graph, prop,
    x_format=kw.get("x_format", "auto"), x_dtype=kw.get("x_dtype"),
    hidden=max(kw["hidden_units"], default=64))
t0 = time.time()
results = train_models(graph, prop, DEFAULT_SEEDS[:nseeds], **kw)
t1 = time.time()
res = results[0][1]
ct = res["chunk_times"]
steady = sorted(1000*s/c for c, s in ct)[len(ct)//2]
print(f"{dataset} G={nseeds}: wall {t1-t0:.2f}s  compile-chunk {ct[0][1]:.1f}s  "
      f"median {steady:.2f} ms/epoch (all {nseeds} seeds) = "
      f"{steady/nseeds:.2f} ms/epoch/seed")
print("last epochs", [r["last_epoch"] for _, r in results],
      "accs", [round(r["valtest"]["accuracy"], 4) for _, r in results])
