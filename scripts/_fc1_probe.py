import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from ppnp_tpu.config import RunConfig
from ppnp_tpu.builders import load_graph, build_propagator, train_kwargs
from ppnp_tpu.train import prepare_attr_input
from ppnp_tpu.kernels.spmm import spmm_pair_chunks_grouped, stack_group_weights
from ppnp_tpu.ops.dropout import edge_dropout_by_id

cfg = RunConfig(dataset="ms_academic", backend="pallas", layout="auto")
graph = load_graph(cfg)
prop = build_propagator(cfg, graph)
kw = train_kwargs(cfg)
x = prepare_attr_input(graph, prop, x_format="sparse", hidden=64)
pc = x.pc
G, ksub = 5, 32
print("X pc: n_seg", pc.n_seg, "chunk", pc.chunk, "window", pc.window,
      "window_src", pc.window_src, "spm", pc.seg_per_mid, "mps", pc.mids_per_step,
      "rows_pad", pc.n_rows_pad, "cols_pad", pc.n_cols_pad, flush=True)
rng = np.random.RandomState(0)
h = jnp.asarray(rng.randn(pc.n_cols_pad, ksub * G).astype(np.float32))
keys = jax.random.split(jax.random.PRNGKey(0), G)
ws = jax.vmap(lambda k: edge_dropout_by_id(k, pc, 0.5))(keys)
e_w_g = jnp.moveaxis(ws, 0, -1).reshape(ws.shape[1], -1)
t0 = time.perf_counter()
out = jax.jit(lambda h, w: spmm_pair_chunks_grouped(pc, h, w))(h, e_w_g)
out.block_until_ready()
print("fc1 grouped kernel OK", f"{time.perf_counter()-t0:.1f}s", out.shape, flush=True)

# and the propagation-shaped instance (cg=15)
pcp = prop.pair_chunks
hp = jnp.asarray(rng.randn(pcp.n_cols_pad, 15 * G).astype(np.float32))
wsp = jax.vmap(lambda k: edge_dropout_by_id(k, pcp, 0.5))(keys)
e_w_gp = jnp.moveaxis(wsp, 0, -1).reshape(wsp.shape[1], -1)
t0 = time.perf_counter()
outp = jax.jit(lambda h, w: spmm_pair_chunks_grouped(pcp, h, w))(hp, e_w_gp)
outp.block_until_ready()
print("prop grouped kernel OK", f"{time.perf_counter()-t0:.1f}s", outp.shape, flush=True)
