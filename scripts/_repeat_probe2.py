import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

G, cg, chunk = 5, 15, 8

def k_tile(w_ref, o_ref):
    w = w_ref[:]                         # (chunk, G)
    o_ref[:] = pltpu.repeat(w, cg, axis=1)   # (chunk, cg*G) tiled?

def k_concat(w_ref, o_ref):
    w = w_ref[:]
    o_ref[:] = jnp.concatenate([w] * cg, axis=1)

w = jnp.asarray(np.random.RandomState(0).randn(chunk, G).astype(np.float32))
want = np.tile(np.asarray(w), (1, cg))
for name, k in [("pltpu.repeat", k_tile), ("concat", k_concat)]:
    try:
        out = pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((chunk, G * cg), jnp.float32),
        )(w)
        ok = np.allclose(np.asarray(out), want)
        print(name, "OK" if ok else "WRONG VALUES")
    except Exception as e:
        print(name, "FAIL:", str(e).splitlines()[0][:200])
