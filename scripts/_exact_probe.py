import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, sys
t00 = time.perf_counter()
def log(msg):
    print(f"[{time.perf_counter()-t00:8.1f}s] {msg}", flush=True)

import numpy as np, jax, jax.numpy as jnp
from ppnp_tpu.config import RunConfig
from ppnp_tpu.builders import load_graph
from ppnp_tpu.ops.normalize import calc_A_hat
log(f"imports done, device={jax.devices()[0]}")

cfg = RunConfig(dataset="pubmed", propagation="exact")
graph = load_graph(cfg)
a_hat = calc_A_hat(graph.adj_matrix)
n = a_hat.shape[0]
log(f"graph loaded n={n} nnz={a_hat.nnz}")
a_dense = np.asarray(a_hat.todense(), dtype=np.float32)
log(f"densified {a_dense.nbytes/1e9:.2f} GB")
t0 = time.perf_counter()
a_dev = jnp.asarray(a_dense)
a_dev.block_until_ready()
log(f"host->device transfer: {time.perf_counter()-t0:.1f}s")
t0 = time.perf_counter()
s = float(jnp.sum(a_dev[:8,:8]))
log(f"small fetch sync: {time.perf_counter()-t0:.3f}s (s={s:.3f})")

from ppnp_tpu.ops.exact import calc_ppr_exact, newton_schulz_iters
alpha = 0.1
log(f"newton iters = {newton_schulz_iters(alpha)}")
t0 = time.perf_counter()
ppr = calc_ppr_exact(a_dev, alpha, method="newton")
_ = float(jnp.sum(ppr[:8,:8]))
log(f"newton solve (first, incl compile): {time.perf_counter()-t0:.1f}s")
t0 = time.perf_counter()
ppr2 = calc_ppr_exact(a_dev, alpha, method="newton")
_ = float(jnp.sum(ppr2[:8,:8]))
log(f"newton solve (steady): {time.perf_counter()-t0:.1f}s")
