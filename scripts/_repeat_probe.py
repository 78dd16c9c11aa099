import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

G, cg, chunk = 5, 15, 8

def k_repeat(w_ref, o_ref):
    w = w_ref[:]                       # (chunk, G)
    big = jnp.repeat(w, cg, axis=1)    # (chunk, G*cg) elementwise repeat
    o_ref[:] = big

def k_bcast(w_ref, o_ref):
    w = w_ref[:]                               # (chunk, G)
    big = jnp.broadcast_to(w[:, :, None], (chunk, G, cg)).reshape(chunk, G * cg)
    o_ref[:] = big

w = jnp.asarray(np.random.RandomState(0).randn(chunk, G).astype(np.float32))
want = np.repeat(np.asarray(w), cg, axis=1)
for name, k in [("repeat", k_repeat), ("bcast_reshape", k_bcast)]:
    try:
        out = pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((chunk, G * cg), jnp.float32),
        )(w)
        ok = np.allclose(np.asarray(out), want)
        print(name, "OK" if ok else "WRONG VALUES")
    except Exception as e:
        print(name, "FAIL:", str(e).splitlines()[0][:200])
