import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from ppnp_tpu.config import RunConfig
from ppnp_tpu.builders import load_graph, build_propagator
from ppnp_tpu.ops.dropout import edge_dropout_by_id, edge_dropout_by_id_grouped

G = 5
cfg = RunConfig(dataset="ms_academic", backend="pallas", layout="auto")
graph = load_graph(cfg)
prop = build_propagator(cfg, graph)
pc = prop.pair_chunks
keys = jax.random.split(jax.random.PRNGKey(0), G)
print("pc e_w shape", pc.e_w.shape, "n_mid", pc.n_mid, "mid", pc.mid)

def timeit(f, *a, n=50, label=""):
    o = f(*a); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(n):
        o = f(*a)
    jax.block_until_ready(o)
    print(f"{label}: {1000*(time.perf_counter()-t0)/n:.3f} ms", flush=True)

timeit(jax.jit(lambda ks: edge_dropout_by_id_grouped(ks, pc, 0.4)), keys,
       label="grouped fused (n_mid,mid,G)")
timeit(jax.jit(lambda ks: jax.vmap(lambda k: edge_dropout_by_id(k, pc, 0.4))(ks)), keys,
       label="vmapped per-seed (G,chunk,n_seg)")
timeit(jax.jit(lambda k: edge_dropout_by_id(k, pc, 0.4)), keys[0],
       label="single-seed")
