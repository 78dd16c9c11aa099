"""One-shot healthy-window measurement battery.

The tunneled TPU has multi-hour degraded windows (BASELINE.md timing
methodology); when a healthy window appears it may not last, so this
script runs every pending measurement in PRIORITY order, each step in a
child process under its own timeout, appending one JSON line per step to
``measurements.jsonl``. Re-running skips steps that already have a
result line (pass ``--redo STEP`` to force one).

Usage:  python scripts/tpu_measurements.py [--out PATH] [--redo STEP]
Steps (priority order):
  warm          pre-compile all bench.py tiers into .jax_cache
  headline      bench.py tier 0 (the driver metric)
  c_sweep       bench_c_sweep at c in {16, 64, 128, 256}
  auto_ab       --layout auto vs banded on all four datasets
  blocked       bench_blocked at 500k nodes / 5M edges
  training      bench_training on ms_academic (pallas + xla)
  geometry_x    extra geometry points the hand sweep never measured
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

STEPS = [
    ("warm", 900, """
import bench
bench.warm()
print(json.dumps({"step": "warm", "ok": True}))
"""),
    ("headline", 420, """
import bench
rc = bench.measure_once(0)
print(json.dumps({"step": "headline", "rc": rc}))
"""),
    ("c_sweep", 900, """
from ppnp_tpu.benchmarks import bench_c_sweep
res = bench_c_sweep(dataset="ms_academic", niter=100, iters=5)
print(json.dumps({"step": "c_sweep", "res": res}, default=float))
"""),
    ("auto_ab", 1200, """
from ppnp_tpu.benchmarks import bench_propagation
out = {}
for ds in ("cora_ml", "citeseer", "pubmed", "ms_academic"):
    row = {}
    for layout in ("banded", "auto"):
        r = bench_propagation(dataset=ds, c=128, niter=100, iters=5,
                              backends=("pallas",), layout=layout)
        b = r["backends"]["pallas"]
        row[layout] = (None if "error" in b else
                       round(1e6 / b["steps_per_s"], 1))
    out[ds] = row  # us/step per layout
print(json.dumps({"step": "auto_ab", "us_per_step": out}))
"""),
    ("blocked", 900, """
from ppnp_tpu.benchmarks import bench_blocked
res = bench_blocked()
print(json.dumps({"step": "blocked", "res": res}, default=float))
"""),
    ("training", 600, """
from ppnp_tpu.benchmarks import bench_training
out = {}
for backend in ("pallas", "xla"):
    r = bench_training(dataset="ms_academic", backend=backend, epochs=200)
    out[backend] = {"s_per_epoch": r["s_per_epoch"],
                    "epochs_per_s": r["epochs_per_s"]}
print(json.dumps({"step": "training", "res": out}, default=float))
"""),
    ("geometry_x", 1200, """
# Geometry points outside the measured sweep: validates the cost
# model's extrapolations (two-mids-per-scatter = spm 64 at chunk 24;
# wider gather K = window_src 256; chunk 48).
import numpy as np, jax, jax.numpy as jnp, time
from ppnp_tpu.builders import load_graph
from ppnp_tpu.config import RunConfig
from ppnp_tpu.ops.normalize import calc_A_hat
from ppnp_tpu.ops.pairchunks import pair_chunks_banded
from ppnp_tpu.ops.propagation import PPRPowerIteration
from ppnp_tpu.benchmarks import _time
a_hat = calc_A_hat(load_graph(RunConfig(dataset="ms_academic")).adj_matrix)
h0 = jnp.asarray(np.random.RandomState(0).randn(a_hat.shape[0], 128)
                 .astype(np.float32))
out = {}
for window, wsrc, chunk, spm in [(256, 128, 24, 64), (256, 256, 24, 32),
                                 (256, 128, 48, 16), (320, 128, 24, 64)]:
    try:
        pc = pair_chunks_banded(a_hat, window=window, window_src=wsrc,
                                chunk=chunk, seg_per_mid=spm,
                                reorder="rcm")
        prop = PPRPowerIteration(edges=None, pair_chunks=pc, alpha=0.1,
                                 niter=100, backend="pallas")
        f = jax.jit(lambda h, p=prop: p.propagate(h, train=False))
        t = _time(f, h0, iters=5)
        out[f"{window}/{wsrc}/{chunk}/{spm}"] = round(t / 100 * 1e6, 1)
    except Exception as e:
        out[f"{window}/{wsrc}/{chunk}/{spm}"] = f"error: {str(e)[:120]}"
print(json.dumps({"step": "geometry_x", "us_per_step": out}))
"""),
]

PREAMBLE = """
import json
from ppnp_tpu.utils.compcache import enable_compilation_cache
enable_compilation_cache()
"""


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(ROOT,
                                                  "measurements.jsonl"))
    ap.add_argument("--redo", action="append", default=[])
    ap.add_argument("--only", action="append", default=[],
                    help="run only these steps")
    args = ap.parse_args()

    done = set()
    if os.path.exists(args.out):
        for line in open(args.out):
            try:
                done.add(json.loads(line).get("step"))
            except json.JSONDecodeError:
                pass

    for name, timeout, body in STEPS:
        if args.only and name not in args.only:
            continue
        if name in done and name not in args.redo:
            print(f"[skip] {name} (already measured)", file=sys.stderr)
            continue
        print(f"[run ] {name} (timeout {timeout}s)", file=sys.stderr)
        t0 = time.time()
        try:
            proc = subprocess.run(
                [sys.executable, "-c", PREAMBLE + body],
                capture_output=True, text=True, timeout=timeout,
                cwd=ROOT)
            lines = [ln for ln in proc.stdout.splitlines()
                     if ln.startswith("{")]
            if lines:
                with open(args.out, "a") as f:
                    for ln in lines:
                        f.write(ln + "\n")
                print(f"[ ok ] {name} in {time.time() - t0:.0f}s",
                      file=sys.stderr)
            else:
                print(f"[fail] {name}: rc={proc.returncode} "
                      f"{proc.stderr[-400:]}", file=sys.stderr)
        except subprocess.TimeoutExpired:
            print(f"[hang] {name} after {timeout}s — window degraded? "
                  f"continuing", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
