import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, numpy as np, jax, jax.numpy as jnp
from ppnp_tpu.config import RunConfig
from ppnp_tpu.utils.compcache import enable_compilation_cache
enable_compilation_cache()
from ppnp_tpu.reproduce import DEFAULT_SEEDS
from ppnp_tpu.builders import load_graph, build_propagator, train_kwargs
import ppnp_tpu.multiseed as ms
from ppnp_tpu.train import prepare_attr_input
from ppnp_tpu import preprocessing
from ppnp_tpu.models.appnp import init_mlp_params
import optax

dataset = sys.argv[1] if len(sys.argv) > 1 else "ms_academic"
G = 5
cfg = RunConfig(dataset=dataset, backend="pallas", layout="auto")
graph = load_graph(cfg)
prop = build_propagator(cfg, graph)
kw = train_kwargs(cfg)
x = prepare_attr_input(graph, prop, x_format=kw.get("x_format", "auto"),
                       x_dtype=kw.get("x_dtype"), hidden=64)
labels_np = np.asarray(graph.labels)
seeds = DEFAULT_SEEDS[:G]
splits = [preprocessing.gen_splits(labels_np, dict(ms.default_idx_split_args, seed=int(s) & 0x7FFFFFFF), False) for s in seeds]
idx_train_g = jnp.asarray(np.stack([s[0] for s in splits]))
idx_stop_g = jnp.asarray(np.stack([s[1] for s in splits]))
y_train_g = jnp.asarray(np.stack([labels_np[s[0]] for s in splits]))
y_stop_g = jnp.asarray(np.stack([labels_np[s[1]] for s in splits]))
n_classes = int(labels_np.max()) + 1
pl, kl = [], []
for s in seeds:
    ki, ke = jax.random.split(jax.random.PRNGKey(int(s)))
    pl.append(init_mlp_params(ki, x.shape[1], [64], n_classes))
    kl.append(ke)
params_g = jax.tree.map(lambda *xs: jnp.stack(xs), *pl)
key_epochs_g = jnp.stack(kl)
opt_state = optax.adam(0.01).init(params_g)
best = (params_g, jnp.full(G, -jnp.inf, jnp.float32),
        jnp.full(G, jnp.inf, jnp.float32), jnp.full(G, -1, jnp.int32))

f = ms._run_chunk_grouped.__wrapped__  # un-jitted
jf = jax.jit(f, static_argnames=("learning_rate", "reg_lambda", "drop_prob", "epoch_chunk", "groups"))
args = (params_g, opt_state, best, key_epochs_g, jnp.int32(0),
        jnp.full(G, 50, jnp.int32), x, idx_train_g, y_train_g,
        idx_stop_g, y_stop_g, prop)
kwargs = dict(learning_rate=0.01, reg_lambda=5e-3, drop_prob=0.5,
              epoch_chunk=50, groups=G)
t0 = time.perf_counter(); lowered = jf.lower(*args, **kwargs)
t1 = time.perf_counter(); print(f"lower (trace): {t1-t0:.1f}s", flush=True)
compiled = lowered.compile()
t2 = time.perf_counter(); print(f"compile: {t2-t1:.1f}s", flush=True)
out = compiled(*args)
jax.block_until_ready(out[0])
t3 = time.perf_counter(); print(f"first run: {t3-t2:.3f}s", flush=True)
