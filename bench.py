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

Degraded-window protection: the tunneled TPU has multi-hour windows
where device compute runs ~10x slow or dispatch hangs outright
(BASELINE.md "timing methodology"). The orchestrator therefore runs the
actual measurement in a child process (`bench.py --once`) under a hard
timeout, retries a few times when the child hangs, dies, or reports
throughput far below the recorded healthy watermark, and prints the
best line observed. In a healthy window the first attempt passes the
watermark and no retry happens.
"""

import json
import subprocess
import sys
import time

# Healthy-window record for this config (BASELINE.md): ~4,010 steps/s.
# A measurement below WATERMARK_FRACTION of it means the tunnel is in a
# degraded window; retry rather than record it as this round's number.
HEALTHY_STEPS_PER_S = 4010.0
WATERMARK_FRACTION = 0.5

ATTEMPT_TIMEOUT_S = 420.0
MAX_ATTEMPTS = 3
RETRY_SLEEP_S = 30.0


def measure_once() -> int:
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


def _parse_line(stdout: str):
    """Last measurement JSON object on the child's stdout, or None.

    Error lines (child ran but every backend failed) are rejected so a
    persistent real failure keeps ``best`` empty and main() exits 1 —
    otherwise a kernel regression would be recorded as a successful
    0.0-steps/s measurement.
    """
    for raw in reversed(stdout.strip().splitlines()):
        raw = raw.strip()
        if raw.startswith("{"):
            try:
                obj = json.loads(raw)
            except json.JSONDecodeError:
                continue
            if obj.get("metric") and "error" not in obj:
                return obj
    return None


def main() -> int:
    best = None
    for attempt in range(1, MAX_ATTEMPTS + 1):
        try:
            proc = subprocess.run(
                [sys.executable, __file__, "--once"],
                capture_output=True, text=True, timeout=ATTEMPT_TIMEOUT_S)
            line = _parse_line(proc.stdout)
        except subprocess.TimeoutExpired:
            line = None  # child killed by the timeout — tunnel hung
        if line is not None and (best is None
                                 or line["value"] > best["value"]):
            best = line
        if best is not None and best["value"] >= (HEALTHY_STEPS_PER_S
                                                  * WATERMARK_FRACTION):
            break  # healthy window — this is the number
        if attempt < MAX_ATTEMPTS:
            time.sleep(RETRY_SLEEP_S)
    if best is None:
        print(json.dumps({"metric": "appnp_propagation_steps_per_s",
                          "value": 0.0, "unit": "steps/s",
                          "vs_baseline": 0.0,
                          "error": "all attempts hung or failed "
                                   "(degraded TPU tunnel window)"}))
        return 1
    best["attempts"] = attempt
    print(json.dumps(best))
    return 0


if __name__ == "__main__":
    if "--once" in sys.argv[1:]:
        sys.exit(measure_once())
    sys.exit(main())
