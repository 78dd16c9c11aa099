"""Bisect the blocked-backend remote-compile crash by block geometry.

The 500k-node / 5M-edge `bench --blocked-scale` config crashes the axon
remote compile helper (HTTP 500, subprocess exit 1) when compiling the
scanned per-block Pallas kernel at rows_per_block=32768. This probes a
grid of (n, rows_per_block) compile-only points to find the boundary.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import scipy.sparse as sp

from ppnp_tpu.utils.compcache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ppnp_tpu.kernels.blocked import build_blocked_pair_chunks  # noqa: E402
from ppnp_tpu.ops.propagation import PPRPowerIteration  # noqa: E402


def graph(n, e, bw, seed=0):
    rng = np.random.default_rng(seed)
    dst = rng.integers(0, n, e)
    src = np.clip(dst + (rng.standard_normal(e) * bw).astype(np.int64),
                  0, n - 1)
    a = sp.coo_matrix((np.ones(e, np.float32), (dst, src)),
                      shape=(n, n)).tocsr()
    a.sum_duplicates()
    return a


def probe(n, e, rpb, c=128):
    a = graph(n, e, 2000)
    t0 = time.time()
    bpc = build_blocked_pair_chunks(a, rows_per_block=rpb, reorder=None,
                                    with_adjoint=False)
    t_pack = time.time() - t0
    prop = jax.device_put(PPRPowerIteration(
        edges=None, pair_chunks=bpc, alpha=0.1, niter=1, backend="blocked"))
    h0 = jnp.asarray(np.random.RandomState(0).randn(n, c)
                     .astype(np.float32))
    f = jax.jit(lambda h, p: p.propagate(h, train=False))
    t0 = time.time()
    try:
        r = f(h0, prop)
        np.asarray(jnp.ravel(r)[:8])
        out = {"ok": True, "compile_s": round(time.time() - t0, 1)}
    except Exception as exc:  # noqa: BLE001
        out = {"ok": False, "err": str(exc)[:200]}
    out.update(n=n, e=e, rpb=rpb, hw=bpc.hw, n_blocks=bpc.n_blocks,
               pack_s=round(t_pack, 1),
               n_seg=int(np.asarray(bpc.pcs.seg_bs).shape[-1]))
    print(json.dumps(out), flush=True)
    return out["ok"]


if __name__ == "__main__":
    points = [
        (131072, 1_300_000, 32768),
        (500_000, 5_000_000, 8192),
        (500_000, 5_000_000, 16384),
        (500_000, 5_000_000, 32768),
    ]
    if len(sys.argv) > 1:
        points = [tuple(int(x) for x in p.split(","))
                  for p in sys.argv[1:]]
    for n, e, rpb in points:
        probe(n, e, rpb)
