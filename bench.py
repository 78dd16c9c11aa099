"""Driver benchmark: one JSON line on stdout.

Measures steady-state APPNP power-iteration propagation throughput on
the MS Academic-scale graph (the largest reference config,
BASELINE.json:10) at c=128, for both the XLA gather+segment-sum path and
the Pallas pair-chunk MXU kernel, on the local TPU. A 100-step chain per
dispatch amortizes this platform's ~1.3ms remote-tunnel launch latency —
the per-step cost that matters in training, where hundreds of kernel
calls ride one jitted epoch chunk.

Printed metric: propagation steps/s (best backend).
vs_baseline: speedup over the XLA gather+segment-sum implementation —
the reference-equivalent formulation on identical hardware (the reference
itself publishes no throughput numbers; SURVEY.md §6 / BASELINE.md).
"""

import json
import sys


def main() -> int:
    import logging
    logging.basicConfig(level=logging.WARNING)
    from ppnp_tpu.utils.compcache import enable_compilation_cache
    enable_compilation_cache()
    from ppnp_tpu.benchmarks import bench_propagation

    res = bench_propagation(dataset="ms_academic", c=128, niter=100,
                            iters=10, backends=("xla", "pallas"))
    backends = {k: v for k, v in res["backends"].items() if "error" not in v}
    if not backends:
        print(json.dumps({"metric": "appnp_propagation_steps_per_s",
                          "value": 0.0, "unit": "steps/s",
                          "vs_baseline": 0.0,
                          "error": res["backends"]}))
        return 1
    best_name = max(backends, key=lambda k: backends[k]["steps_per_s"])
    best = backends[best_name]
    xla = backends.get("xla", best)
    line = {
        "metric": "appnp_propagation_steps_per_s",
        "value": round(best["steps_per_s"], 1),
        "unit": "steps/s",
        "vs_baseline": round(best["steps_per_s"] / xla["steps_per_s"], 3),
        "backend": best_name,
        "dataset": res["dataset"],
        "n": res["n"],
        "nnz": res["nnz"],
        "c": res["c"],
        "effective_gbps": round(best["effective_gbps"], 2),
        "fraction_of_hbm_sol": round(best["fraction_of_sol"], 4),
        "device": res["device"],
    }
    print(json.dumps(line))
    return 0


if __name__ == "__main__":
    sys.exit(main())
