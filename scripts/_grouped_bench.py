import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from ppnp_tpu.config import RunConfig
from ppnp_tpu.builders import load_graph, build_propagator, train_kwargs
from ppnp_tpu.train import prepare_attr_input
from ppnp_tpu.kernels.spmm import (spmm_pair_chunks, spmm_pair_chunks_grouped,
                                   stack_group_weights)
from ppnp_tpu.ops.dropout import edge_dropout_by_id

cfg = RunConfig(dataset="ms_academic", backend="pallas", layout="auto")
graph = load_graph(cfg)
prop = build_propagator(cfg, graph)
kw = train_kwargs(cfg)
x = prepare_attr_input(graph, prop, x_format="sparse", hidden=64)
G = 5
rng = np.random.RandomState(0)
keys = jax.random.split(jax.random.PRNGKey(0), G)

def bench(pc, cg, label, niter=100):
    h = jnp.asarray(rng.randn(pc.n_cols_pad, cg * G).astype(np.float32))
    ws = jax.vmap(lambda k: edge_dropout_by_id(k, pc, 0.5))(keys)
    e_w_g = stack_group_weights(list(ws), pc)
    h1 = jnp.asarray(rng.randn(pc.n_cols_pad, cg).astype(np.float32))

    @jax.jit
    def chain(h, w):
        def body(hh, _):
            return spmm_pair_chunks_grouped(pc, hh[:pc.n_rows], w,
                                            keep_padded=True), None
        hp = jnp.pad(h, ((0, max(0, pc.n_rows_pad - h.shape[0])), (0, 0)))
        out, _ = jax.lax.scan(body, hp, None, length=niter)
        return out
    # square packing only for chains
    if pc.n_rows_pad == pc.n_cols_pad:
        o = chain(h, e_w_g); o.block_until_ready()
        t0 = time.perf_counter(); o = chain(h, e_w_g); o.block_until_ready()
        dt = (time.perf_counter() - t0) / niter
        print(f"{label} grouped chain: {1e6*dt:.1f} us/step")
        @jax.jit
        def chain1(h):
            def body(hh, _):
                return spmm_pair_chunks(pc, hh[:pc.n_rows], keep_padded=True,
                                        assume_permuted=True), None
            hp = jnp.pad(h, ((0, max(0, pc.n_rows_pad - h.shape[0])), (0, 0)))
            out, _ = jax.lax.scan(body, hp, None, length=niter)
            return out
        o = chain1(h1); o.block_until_ready()
        t0 = time.perf_counter(); o = chain1(h1); o.block_until_ready()
        dt = (time.perf_counter() - t0) / niter
        print(f"{label} single (cg lanes): {1e6*dt:.1f} us/step")
    else:
        f = jax.jit(lambda h, w: spmm_pair_chunks_grouped(pc, h, w))
        o = f(h, e_w_g); o.block_until_ready()
        t0 = time.perf_counter()
        for _ in range(20):
            o = f(h, e_w_g)
        o.block_until_ready()
        dt = (time.perf_counter() - t0) / 20
        print(f"{label} grouped single-call: {1e6*dt:.1f} us/call (incl dispatch)")

bench(prop.pair_chunks, 15, "prop(cg=15,G=5)")
bench(x.pc, 64, "fc1(cg=64,G=5)")
