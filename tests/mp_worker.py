"""Multi-process worker for tests/test_multiprocess.py.

Runs as ``python mp_worker.py <pid> <nprocs> <port> <mode>`` under the
JAX multi-controller runtime with one CPU device per process — the
TPU-native analog of a multi-host pod (SURVEY.md §5 "Distributed
communication backend" / "Failure detection" rows).

Modes:
- ``sharded``: row-sharded APPNP propagation over the 2-process mesh,
  checked against the host scipy oracle (boundary all_to_all crosses a
  real process boundary here).
- ``sharded_pallas``: the same check through the sharded pair-chunk
  kernel path (interior+boundary per-shard packings, interpret mode on
  CPU), plus a train-mode grad so the custom VJP and the id-keyed
  edge-dropout masks run under REAL multi-controller jax.distributed —
  exactly the machinery that can work single-process and die
  cross-process.
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


def main_sharded(backend="xla"):
    from ppnp_tpu.data.synthetic import make_attributed_sbm
    from ppnp_tpu.ops.normalize import calc_A_hat
    from ppnp_tpu.parallel.partition import (build_sharded_graph,
                                             build_sharded_pair_chunks)
    from ppnp_tpu.parallel.sharded import ShardedPowerIteration

    g = make_attributed_sbm(300, 3, 32, 1200, seed=5).standardize()
    a = calc_A_hat(g.adj_matrix)
    sg = build_sharded_graph(a, n_shards=nprocs)

    def put(arr, spec):
        arr = np.asarray(arr)
        sharding = NamedSharding(mesh, spec)
        return jax.make_array_from_callback(arr.shape, sharding,
                                            lambda idx: arr[idx])

    pc = pc_t = w_perm = None
    if backend == "pallas":
        # Deterministic host-side packing (identical on every process);
        # globalize each stacked leaf so shard_map hands every device its
        # own slice. Reduced unroll geometry — XLA:CPU compile cost, same
        # rationale as dryrun_multichip.
        pc, pc_t, w_perm = build_sharded_pair_chunks(
            sg, use_native="never", chunk=8, seg_per_mid=8,
            mids_per_step=4)
        globalize = lambda tree: jax.tree.map(  # noqa: E731
            lambda x: put(x, P(NODE_AXIS)), tree)
        pc, pc_t, w_perm = globalize(pc), globalize(pc_t), \
            globalize(w_perm)

    # Globalize the stacked per-shard arrays: each process owns its row.
    sg = sg.replace(
        dst=put(sg.dst, P(NODE_AXIS)), src=put(sg.src, P(NODE_AXIS)),
        src_global=put(sg.src_global, P(NODE_AXIS)),
        w=put(sg.w, P(NODE_AXIS)), send_idx=put(sg.send_idx, P(NODE_AXIS)))
    prop = ShardedPowerIteration(graph=sg, mesh=mesh, alpha=0.1, niter=5,
                                 pair_chunks=pc, pair_chunks_t=pc_t,
                                 w_perm=w_perm, backend=backend)

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

    if backend == "pallas":
        # Train-mode grad: custom VJP through the per-shard transpose
        # packings + id-keyed dropout masks, under real multi-controller
        # collectives (the all_to_all cotangent crosses processes).
        def loss(h, p, k):
            return jnp.sum(p(h, train=True, key=k) ** 2)

        lv, gh = jax.jit(jax.value_and_grad(loss, argnums=0))(
            h0_g, prop, jax.random.PRNGKey(2))
        gn = jax.jit(lambda x: jnp.vdot(x, x))(gh)
        lv, gn = float(lv), float(gn)
        assert np.isfinite(lv) and np.isfinite(gn) and gn > 0.0, (lv, gn)
        print(f"proc {pid} pallas_grad_ok loss={lv:.4f} gnorm2={gn:.4f}",
              flush=True)


def main_hier():
    """Hierarchical two-level exchange with the DCN axis crossing a
    REAL process boundary (2 slices × 1 chip): the inter-slice
    all_to_all between co-positioned chips plus the (trivial) ICI
    fan-out, checked against the host scipy oracle."""
    from ppnp_tpu.data.synthetic import make_attributed_sbm
    from ppnp_tpu.ops.normalize import calc_A_hat
    from ppnp_tpu.parallel.hier import (HierShardedPowerIteration,
                                        build_hier_sharded_graph)
    from ppnp_tpu.parallel.mesh import make_hier_mesh

    hmesh = make_hier_mesh(nprocs, 1)
    ax = ("dcn", "ici")
    g = make_attributed_sbm(300, 3, 32, 1200, seed=5).standardize()
    a = calc_A_hat(g.adj_matrix)
    hg = build_hier_sharded_graph(a, nprocs, 1)

    def put(arr, spec):
        arr = np.asarray(arr)
        sharding = NamedSharding(hmesh, spec)
        return jax.make_array_from_callback(arr.shape, sharding,
                                            lambda idx: arr[idx])

    hg = hg.replace(
        dst=put(hg.dst, P(ax)), src=put(hg.src, P(ax)),
        src_global=put(hg.src_global, P(ax)), w=put(hg.w, P(ax)),
        send_idx_ici=put(hg.send_idx_ici, P(ax)),
        send_idx_dcn=put(hg.send_idx_dcn, P(ax)))
    prop = HierShardedPowerIteration(graph=hg, mesh=hmesh, alpha=0.1,
                                     niter=5)

    rng = np.random.RandomState(0)
    h0 = rng.randn(hg.n_pad, 8).astype(np.float32)
    h0_g = put(h0, P(ax, None))
    z = jax.jit(lambda h, p: p(h, train=False))(h0_g, prop)

    from jax.experimental import multihost_utils
    z_full = np.asarray(multihost_utils.process_allgather(z, tiled=True))

    n = a.shape[0]
    hh = h0[:n]
    for _ in range(5):
        hh = 0.9 * (a @ hh) + 0.1 * h0[:n]
    err = float(np.max(np.abs(z_full[:n] - hh)) / np.max(np.abs(hh)))
    print(f"proc {pid} hier_err {err:.2e}", flush=True)
    assert err < 1e-4, err


if mode == "fault":
    main_fault()
elif mode == "sharded":
    main_sharded()
elif mode == "sharded_pallas":
    main_sharded(backend="pallas")
elif mode == "hier":
    main_hier()
else:
    raise SystemExit(f"unknown mode {mode}")
