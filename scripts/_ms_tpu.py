import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, numpy as np, jax
from ppnp_tpu.config import RunConfig
from ppnp_tpu.utils.compcache import enable_compilation_cache
enable_compilation_cache()
from ppnp_tpu.reproduce import DEFAULT_SEEDS
from ppnp_tpu.builders import load_graph, build_propagator, train_kwargs
from ppnp_tpu.multiseed import train_models
from ppnp_tpu.train import prepare_attr_input

cfg = RunConfig(dataset="cora_ml", backend="pallas", layout="auto")
graph = load_graph(cfg)
prop = build_propagator(cfg, graph)
kw = train_kwargs(cfg)
kw.pop("seed", None)
kw["x_prepared"] = prepare_attr_input(graph, prop,
    x_format=kw.get("x_format", "auto"), x_dtype=kw.get("x_dtype"),
    hidden=max(kw["hidden_units"], default=64))
t0 = time.time()
results = train_models(graph, prop, DEFAULT_SEEDS[:5], **kw)
t1 = time.time()
res = results[0][1]
print("wall", round(t1-t0,2), "last epochs", [r["last_epoch"] for _, r in results])
for cnt, sec in res["chunk_times"]:
    print(f"  chunk {cnt:3d} epochs  {sec:8.3f}s  ({1000*sec/cnt:7.2f} ms/epoch)")
