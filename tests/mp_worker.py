"""Multi-process worker for tests/test_multiprocess.py.

Runs as ``python mp_worker.py <pid> <nprocs> <port> <mode>`` under the
JAX multi-controller runtime with one CPU device per process — the
TPU-native analog of a multi-host pod (SURVEY.md §5 "Distributed
communication backend" / "Failure detection" rows).

Modes:
- ``sharded``: row-sharded APPNP propagation over the 2-process mesh,
  checked against the host scipy oracle (boundary all_to_all crosses a
  real process boundary here).
- ``fault``: process 1 dies abruptly after the first healthy heartbeat;
  process 0 must detect the dead peer (bounded heartbeat → exception or
  watchdog timeout) and exit with the fail-fast code 3.
"""

import os
import sys
import threading
import time

pid, nprocs, port, mode = (int(sys.argv[1]), int(sys.argv[2]),
                           sys.argv[3], sys.argv[4])

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=nprocs, process_id=pid,
                           initialization_timeout=60)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from ppnp_tpu.parallel.health import heartbeat  # noqa: E402
from ppnp_tpu.parallel.mesh import NODE_AXIS, make_mesh  # noqa: E402

mesh = make_mesh()
assert mesh.size == nprocs, mesh
hb = heartbeat(mesh, timeout_s=60.0)
print(f"proc {pid} heartbeat_ok {hb:.4f}s", flush=True)


def main_fault():
    if pid == 1:
        os._exit(17)  # die without cleanup: simulates a host failure

    # Fail-fast contract: a collective against a dead peer either raises
    # promptly or wedges; the supervisor-side watchdog bounds the wedge.
    def watchdog():
        time.sleep(30)
        print("proc 0 fault_detected watchdog-timeout", flush=True)
        os._exit(3)

    threading.Thread(target=watchdog, daemon=True).start()
    time.sleep(1.0)  # let proc 1 die first
    try:
        heartbeat(mesh, timeout_s=5.0)
        print("proc 0 fault_missed", flush=True)
        sys.exit(1)
    except BaseException as e:  # noqa: BLE001 - any signal counts
        print(f"proc 0 fault_detected {type(e).__name__}", flush=True)
        os._exit(3)


def main_sharded():
    from ppnp_tpu.data.synthetic import make_attributed_sbm
    from ppnp_tpu.ops.normalize import calc_A_hat
    from ppnp_tpu.parallel.partition import build_sharded_graph
    from ppnp_tpu.parallel.sharded import ShardedPowerIteration

    g = make_attributed_sbm(300, 3, 32, 1200, seed=5).standardize()
    a = calc_A_hat(g.adj_matrix)
    sg = build_sharded_graph(a, n_shards=nprocs)

    def put(arr, spec):
        arr = np.asarray(arr)
        sharding = NamedSharding(mesh, spec)
        return jax.make_array_from_callback(arr.shape, sharding,
                                            lambda idx: arr[idx])

    # Globalize the stacked per-shard arrays: each process owns its row.
    sg = sg.replace(
        dst=put(sg.dst, P(NODE_AXIS)), src=put(sg.src, P(NODE_AXIS)),
        src_global=put(sg.src_global, P(NODE_AXIS)),
        w=put(sg.w, P(NODE_AXIS)), send_idx=put(sg.send_idx, P(NODE_AXIS)))
    prop = ShardedPowerIteration(graph=sg, mesh=mesh, alpha=0.1, niter=5)

    rng = np.random.RandomState(0)
    h0 = rng.randn(sg.n_pad, 8).astype(np.float32)
    h0_g = put(h0, P(NODE_AXIS, None))
    # Global arrays must be jit ARGS, not closure captures.
    z = jax.jit(lambda h, p: p(h, train=False))(h0_g, prop)

    from jax.experimental import multihost_utils
    z_full = np.asarray(multihost_utils.process_allgather(z, tiled=True))

    n = a.shape[0]
    hh = h0[:n]
    for _ in range(5):
        hh = 0.9 * (a @ hh) + 0.1 * h0[:n]
    err = float(np.max(np.abs(z_full[:n] - hh)) / np.max(np.abs(hh)))
    print(f"proc {pid} sharded_err {err:.2e}", flush=True)
    assert err < 1e-4, err


if mode == "fault":
    main_fault()
elif mode == "sharded":
    main_sharded()
else:
    raise SystemExit(f"unknown mode {mode}")
