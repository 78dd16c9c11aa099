"""Step-by-step timing probe for the PubMed-scale exact-PPNP path.

Run on the real TPU: logs each stage (graph load, device densify,
Newton solve first/steady, eval forward) with wall-clock offsets so a
stall is attributable to a specific stage. The bench-grade version of
this measurement is `python -m ppnp_tpu bench --exact --dataset pubmed`.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
t00 = time.perf_counter()
def log(msg):
    print(f"[{time.perf_counter()-t00:8.1f}s] {msg}", flush=True)

import numpy as np, jax, jax.numpy as jnp
from ppnp_tpu.utils.compcache import enable_compilation_cache
enable_compilation_cache()
from ppnp_tpu.config import RunConfig
from ppnp_tpu.builders import load_graph
from ppnp_tpu.ops.normalize import calc_A_hat
log(f"imports done, device={jax.devices()[0]}")

cfg = RunConfig(dataset="pubmed", propagation="exact")
graph = load_graph(cfg)
a_hat = calc_A_hat(graph.adj_matrix)
n = a_hat.shape[0]
log(f"graph loaded n={n} nnz={a_hat.nnz}")

from ppnp_tpu.ops.exact import (PPRExact, _dense_from_scipy,
                                calc_ppr_exact, newton_schulz_iters)
import scipy.sparse as sp
alpha = 0.1
t0 = time.perf_counter()
m_sp = (sp.identity(n, dtype=np.float32, format="csr")
        - np.float32(1.0 - alpha) * a_hat.tocsr())
m = _dense_from_scipy(m_sp)
m.block_until_ready()
log(f"device densify (block_until_ready): {time.perf_counter()-t0:.1f}s")
t0 = time.perf_counter()
s = np.asarray(m[:1, :8])
log(f"densify row fetch sync: {time.perf_counter()-t0:.3f}s sum={s.sum():.3f}")

log(f"newton iters = {newton_schulz_iters(alpha)}")
t0 = time.perf_counter()
ppr = calc_ppr_exact(a_hat, alpha, method="newton")
ppr.block_until_ready()
log(f"newton solve #1 (block_until_ready): {time.perf_counter()-t0:.1f}s")
t0 = time.perf_counter()
s = np.asarray(ppr[:1, :8])
log(f"newton #1 fetch sync: {time.perf_counter()-t0:.3f}s")
t0 = time.perf_counter()
ppr2 = calc_ppr_exact(a_hat, alpha, method="newton")
ppr2.block_until_ready()
_ = np.asarray(ppr2[:1, :8])
# _newton_invert is module-level jitted keyed on (shape, iters), so this
# second call genuinely hits the jit cache (steady-state, no recompile).
log(f"newton solve (steady, incl fetch): {time.perf_counter()-t0:.1f}s")

# Eval-mode exact forward at PubMed scale: Z = (Pi @ H0)[idx] (c=3).
# NB: the propagator must be a jit ARGUMENT (it is a pytree) — closing
# over it embeds the 1.5GB Pi as an inline HLO constant, which the
# remote compile service takes tens of minutes to ingest.
prop = PPRExact(ppr2, drop_prob=0.5)
rng = np.random.default_rng(0)
h0 = jnp.asarray(rng.standard_normal((n, 3)), jnp.float32)
idx = jnp.asarray(rng.choice(n, 500, replace=False))
fwd = jax.jit(lambda h, p, i: p(h, i))
t0 = time.perf_counter()
out = fwd(h0, prop, idx)
_ = np.asarray(out[:1])
log(f"eval forward #1 (incl compile): {time.perf_counter()-t0:.2f}s")
t0 = time.perf_counter()
reps = 20
for _i in range(reps):
    out = fwd(h0, prop, idx)
_ = np.asarray(out[:1])
log(f"exact eval forward ((Pi @ H0)[idx]): "
    f"{(time.perf_counter()-t0)/reps*1e3:.2f} ms/call")
t0 = time.perf_counter()
key = jax.random.PRNGKey(0)
fwd_t = jax.jit(lambda h, p, i, k: p(h, i, key=k, train=True))
out = fwd_t(h0, prop, idx, key)
_ = np.asarray(out[:1])
log(f"train forward #1 (one-hot select, incl compile): "
    f"{time.perf_counter()-t0:.2f}s")
t0 = time.perf_counter()
for _i in range(reps):
    out = fwd_t(h0, prop, idx, key)
_ = np.asarray(out[:1])
log(f"exact train forward (dropout(onehot@Pi) @ H0): "
    f"{(time.perf_counter()-t0)/reps*1e3:.2f} ms/call")
