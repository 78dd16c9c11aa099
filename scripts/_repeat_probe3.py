import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

G, cg, chunk, nseg = 5, 32, 8, 512
lanes = cg * G

def mk(kind):
    def k(w_ref, x_ref, o_ref):
        acc = jnp.zeros((chunk, lanes), jnp.float32)
        for s in range(nseg):
            if kind == "flat":
                w = w_ref[:, s * G:(s + 1) * G]        # (chunk, G) unaligned lane slice
            else:
                w = w_ref[s]                            # (chunk, G) major-axis slice
            acc = acc + x_ref[:] * pltpu.repeat(w, cg, axis=1)
        o_ref[:] = acc
    return k

rng = np.random.RandomState(0)
x = jnp.asarray(rng.randn(chunk, lanes).astype(np.float32))
wf = jnp.asarray(rng.randn(chunk, nseg * G).astype(np.float32))
w3 = jnp.asarray(np.moveaxis(np.asarray(wf).reshape(chunk, nseg, G), 1, 0).copy())

for kind, w in [("flat", wf), ("3d", w3)]:
    try:
        t0 = time.perf_counter()
        out = pl.pallas_call(
            mk(kind), out_shape=jax.ShapeDtypeStruct((chunk, lanes), jnp.float32),
        )(w, x)
        out.block_until_ready()
        print(kind, "OK", f"{time.perf_counter()-t0:.1f}s")
    except Exception as e:
        msg = str(e)
        key = [l for l in msg.splitlines() if "vmem" in l.lower() or "spill" in l.lower() or "error" in l.lower()][:2]
        print(kind, "FAIL:", " | ".join(key)[:250])
