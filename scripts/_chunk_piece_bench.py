import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp, optax
from ppnp_tpu.config import RunConfig
from ppnp_tpu.builders import load_graph, build_propagator, train_kwargs
from ppnp_tpu.train import prepare_attr_input
from ppnp_tpu import preprocessing
from ppnp_tpu.models.appnp import init_mlp_params
import ppnp_tpu.multiseed as ms

G = 5
cfg = RunConfig(dataset="ms_academic", backend="pallas", layout="auto")
graph = load_graph(cfg)
prop = build_propagator(cfg, graph)
x = prepare_attr_input(graph, prop, x_format="sparse", hidden=64)
labels_np = np.asarray(graph.labels)
seeds = list(range(G))
splits = [preprocessing.gen_splits(labels_np, dict(ms.default_idx_split_args, seed=s), False) for s in seeds]
idx_train_g = jnp.asarray(np.stack([s[0] for s in splits]))
y_train_g = jnp.asarray(np.stack([labels_np[s[0]] for s in splits]))
idx_stop_g = jnp.asarray(np.stack([s[1] for s in splits]))
n_classes = int(labels_np.max()) + 1
pl_ = [init_mlp_params(jax.random.PRNGKey(s), x.shape[1], [64], n_classes) for s in seeds]
params_g = jax.tree.map(lambda *xs: jnp.stack(xs), *pl_)
keys_g = jax.random.split(jax.random.PRNGKey(7), G)

def nll(p, kg):
    logp = ms.grouped_forward(p, x, prop, idx_train_g, kg, train=True,
                              drop_prob=0.5, groups=G)
    return jnp.sum(ms._nll_g(logp, y_train_g))

train_step = jax.jit(lambda p, kg: jax.grad(nll)(p, kg))
eval_fwd = jax.jit(lambda p: ms.grouped_forward(p, x, prop, idx_stop_g,
                                                train=False, drop_prob=0.5,
                                                groups=G))
fwd_only = jax.jit(lambda p, kg: nll(p, kg))

def timeit(f, *a, n=20, label=""):
    o = f(*a); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(n):
        o = f(*a)
    jax.block_until_ready(o)
    print(f"{label}: {1000*(time.perf_counter()-t0)/n:.2f} ms", flush=True)

timeit(fwd_only, params_g, keys_g, label="train fwd (loss only)")
timeit(train_step, params_g, keys_g, label="train fwd+bwd (grad)")
timeit(eval_fwd, params_g, label="eval fwd")
