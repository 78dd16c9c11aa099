"""Driver benchmark: one JSON line on stdout.

Measures steady-state APPNP power-iteration propagation throughput on
the MS Academic-scale graph (the largest reference config,
BASELINE.json:10) at c=128, for both the XLA gather+segment-sum path and
the Pallas pair-chunk MXU kernel, on the local TPU. A long chain per
dispatch amortizes this platform's ~1.3ms remote-tunnel launch latency —
the per-step cost that matters in training, where hundreds of kernel
calls ride one jitted epoch chunk.

Printed metric: propagation steps/s (best backend).
vs_baseline: speedup over the XLA gather+segment-sum implementation —
the reference-equivalent formulation on identical hardware (the
reference itself publishes no throughput numbers; SURVEY.md §6 /
BASELINE.md).

Degraded-window protection (round-2 hardening; BENCH_r01 recorded 0.0
because round 1's 3x420s retry loop was no match for a multi-hour
degraded tunnel window):

- The measurement runs in a child process (``bench.py --once --tier N``)
  under a hard timeout; the orchestrator retries on hang/death/low
  watermark.
- TIERED FALLBACK: tier 0 is the headline config; tiers 1-2 shrink the
  chain and then the graph so that even a ~10x-degraded window finishes
  inside the child timeout. Fallback results carry ``fallback_tier`` and
  their own dataset fields.
- PROGRESSIVE OUTPUT: the child prints a provisional line as soon as the
  Pallas backend is timed (vs_baseline vs the recorded healthy XLA
  number, flagged via ``vs_baseline_basis``) and a final line once XLA
  is also measured; a child killed mid-XLA still yields a number. The
  orchestrator parses a timed-out child's partial stdout too.
- The orchestrator re-prints the best-so-far line after every attempt,
  so even if bench.py itself is killed externally, the LAST printed JSON
  line is the best real measurement.
- Results below the healthy watermark are flagged ``"degraded": true``
  but still printed — never 0.0 when any child produced a number.
- ``bench.py --warm`` pre-compiles every tier's programs into the
  persistent JAX compilation cache (``.jax_cache``) so measurement
  attempts pay zero (noisy, separately-degradable) remote compile time.
"""

import json
import os
import subprocess
import sys
import time

# Tier table. ``healthy`` = steps/s recorded in a healthy window for the
# tier's config (BASELINE.md); a measurement below WATERMARK_FRACTION of
# it means the tunnel is degraded — keep the number but keep retrying.
# ``xla_ref`` = healthy-window XLA steps/s, used only for the provisional
# vs_baseline on partial lines (flagged, replaced by the measured ratio
# whenever the child finishes both backends).
TIERS = [
    {"tier": 0, "dataset": "ms_academic", "c": 128, "niter": 100,
     "iters": 10, "timeout": 420.0, "healthy": 4500.0, "xla_ref": 441.0},
    # healthy/xla_ref recalibrated 2026-08-18 after the _time sync fix
    # (fetch-forced execution + fetch-RTT subtraction, benchmarks._sync):
    # measured healthy-window values were 4527.6 / 4643.6 / 41597.8
    # steps/s for tiers 0/1/2 respectively.
    {"tier": 1, "dataset": "ms_academic", "c": 128, "niter": 50,
     "iters": 3, "timeout": 300.0, "healthy": 4600.0, "xla_ref": 443.0},
    {"tier": 2, "dataset": "cora_ml", "c": 128, "niter": 50,
     "iters": 3, "timeout": 240.0, "healthy": 41000.0, "xla_ref": 4241.0},
]
WATERMARK_FRACTION = 0.5

# Attempt plan: tier index per attempt, with escalating sleeps between.
ATTEMPT_PLAN = [0, 0, 1, 0, 2, 1, 0, 2]
SLEEPS_S = [20, 30, 60, 90, 120, 150, 180]
TOTAL_BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", 2700))


def measure_once(tier_idx: int) -> int:
    """Child: measure one tier, printing progressive JSON lines."""
    import logging
    logging.basicConfig(level=logging.WARNING)
    from ppnp_tpu.utils.compcache import enable_compilation_cache
    enable_compilation_cache()
    from ppnp_tpu.benchmarks import bench_propagation

    t = TIERS[tier_idx]

    def emit(res):
        backends = {k: v for k, v in res["backends"].items()
                    if "error" not in v}
        if not backends:
            return False
        best_name = max(backends, key=lambda k: backends[k]["steps_per_s"])
        best = backends[best_name]
        line = {
            "metric": "appnp_propagation_steps_per_s",
            "value": round(best["steps_per_s"], 1),
            "unit": "steps/s",
            "backend": best_name,
            "dataset": res["dataset"],
            "n": res["n"],
            "nnz": res["nnz"],
            "c": res["c"],
            "niter": res["niter"],
            "tier": tier_idx,
            "effective_gbps": round(best["effective_gbps"], 2),
            "fraction_of_hbm_sol": round(best["fraction_of_sol"], 4),
            "device": res["device"],
        }
        # Binding-roofline fields (VERDICT r4 item 5): the op is
        # MXU-issue-bound; fraction_of_hbm_sol above is diagnostic only
        # (docs/PERFORMANCE.md). 1.0 on fraction_of_issue_floor = at
        # the zero-padding one-hot issue floor.
        for k in ("fraction_of_issue_floor", "padding_frac",
                  "issue_floor_us", "issue_model_us"):
            if k in best:
                line[k] = round(best[k], 4)
        if "xla" in backends:
            line["vs_baseline"] = round(
                best["steps_per_s"] / backends["xla"]["steps_per_s"], 3)
            line["vs_baseline_basis"] = "measured"
        else:
            line["vs_baseline"] = round(
                best["steps_per_s"] / t["xla_ref"], 3)
            line["vs_baseline_basis"] = "recorded_healthy_xla"
        print(json.dumps(line), flush=True)
        return True

    # Pallas first: it is the number that matters; a provisional line
    # lands on stdout before the (4-10x slower) XLA arm runs, so a child
    # killed mid-XLA still reports.
    res = bench_propagation(dataset=t["dataset"], c=t["c"],
                            niter=t["niter"], iters=t["iters"],
                            backends=("pallas",))
    got_pallas = emit(res)
    res_xla = bench_propagation(dataset=t["dataset"], c=t["c"],
                                niter=t["niter"], iters=t["iters"],
                                backends=("xla",))
    res["backends"].update(res_xla["backends"])
    ok = emit(res)
    if not (ok or got_pallas):
        print(json.dumps({"metric": "appnp_propagation_steps_per_s",
                          "value": 0.0, "unit": "steps/s",
                          "vs_baseline": 0.0, "tier": tier_idx,
                          "error": str(res["backends"])[:500]}),
              flush=True)
        return 1
    return 0


def measure_xla_only(tier_idx: int) -> int:
    """Child: measure ONLY the XLA arm of a tier (basis-upgrade runs)."""
    import logging
    logging.basicConfig(level=logging.WARNING)
    from ppnp_tpu.utils.compcache import enable_compilation_cache
    enable_compilation_cache()
    from ppnp_tpu.benchmarks import bench_propagation

    t = TIERS[tier_idx]
    res = bench_propagation(dataset=t["dataset"], c=t["c"],
                            niter=t["niter"], iters=t["iters"],
                            backends=("xla",))
    xla = res["backends"].get("xla", {})
    if "error" in xla or "steps_per_s" not in xla:
        print(json.dumps({"metric": "xla_arm_steps_per_s", "value": 0.0,
                          "tier": tier_idx,
                          "error": str(xla.get("error", "missing"))[:300]}),
              flush=True)
        return 1
    print(json.dumps({"metric": "xla_arm_steps_per_s",
                      "value": round(xla["steps_per_s"], 1),
                      "unit": "steps/s", "tier": tier_idx}), flush=True)
    return 0


def _run_xla_child(tier_idx: int, timeout: float):
    """Run the XLA-only child; returns its steps/s or None."""
    try:
        proc = subprocess.run(
            [sys.executable, __file__, "--xla-only",
             "--tier", str(tier_idx)],
            capture_output=True, text=True, timeout=timeout)
        lines = _parse_lines(proc.stdout)
    except subprocess.TimeoutExpired as e:
        out = e.stdout
        if isinstance(out, bytes):
            out = out.decode("utf-8", "replace")
        lines = _parse_lines(out or "")
    for line in lines:
        if line.get("metric") == "xla_arm_steps_per_s":
            return float(line["value"])
    return None


def upgrade_basis(best, remaining_s: float, runner=None):
    """Convert a provisional ``recorded_healthy_xla`` ratio to a measured
    one when budget remains (VERDICT r2 item 7: never ship a mixed-basis
    headline if an XLA-only child still fits the budget).

    The pallas and XLA arms then come from separate child processes —
    closer in time than the recorded healthy number, and flagged via
    ``xla_arm_window`` so the provenance stays explicit.
    """
    if best is None or best.get("vs_baseline_basis") == "measured":
        return best
    t = TIERS[best["tier"]]
    if remaining_s < t["timeout"] * 0.5:
        return best
    runner = runner or _run_xla_child
    xla = runner(best["tier"], min(t["timeout"], max(60.0, remaining_s)))
    if xla and xla > 0:
        best = dict(best)
        best["vs_baseline"] = round(best["value"] / xla, 3)
        best["vs_baseline_basis"] = "measured"
        best["xla_arm_steps_per_s"] = round(xla, 1)
        best["xla_arm_window"] = "separate_child"
    return best


def warm() -> int:
    """Pre-compile every tier's programs into the persistent cache."""
    from ppnp_tpu.utils.compcache import enable_compilation_cache
    enable_compilation_cache()
    from ppnp_tpu.benchmarks import bench_propagation
    for t in TIERS:
        t0 = time.perf_counter()
        # iters=1 → one warm-up compile + a single timed call per backend.
        bench_propagation(dataset=t["dataset"], c=t["c"], niter=t["niter"],
                          iters=1, backends=("pallas", "xla"))
        print(f"warmed tier {t['tier']} ({t['dataset']}, niter={t['niter']})"
              f" in {time.perf_counter() - t0:.1f}s", file=sys.stderr)
    return 0


def _parse_lines(stdout: str):
    """All measurement JSON objects on a child's stdout (value > 0)."""
    out = []
    for raw in (stdout or "").strip().splitlines():
        raw = raw.strip()
        if raw.startswith("{"):
            try:
                obj = json.loads(raw)
            except json.JSONDecodeError:
                continue
            if obj.get("metric") and "error" not in obj \
                    and obj.get("value", 0) > 0:
                out.append(obj)
    return out


def _better(a, b):
    """True if line ``a`` beats line ``b``.

    Lower tier first (most representative config), then HIGHER measured
    value — the steps/s value is a real measurement in both provisional
    and complete lines, so a healthy provisional must not be displaced
    by a later degraded-but-complete one; the basis only decides
    vs_baseline and is used as the final tiebreak.
    """
    if b is None:
        return True
    ka = (a["tier"], -a["value"], a.get("vs_baseline_basis") != "measured")
    kb = (b["tier"], -b["value"], b.get("vs_baseline_basis") != "measured")
    return ka < kb


def main() -> int:
    start = time.monotonic()
    best = None
    attempts = 0
    plan = list(ATTEMPT_PLAN)
    for i, tier_idx in enumerate(plan):
        tier = TIERS[tier_idx]
        remaining = TOTAL_BUDGET_S - (time.monotonic() - start)
        if remaining < tier["timeout"]:
            # Downgrade to the smallest tier that still fits; if none
            # fits and we have nothing yet, take one last short shot.
            fitting = [t for t in TIERS if t["timeout"] <= remaining]
            if not fitting:
                if best is None and remaining > 60:
                    tier = dict(TIERS[-1], timeout=max(60.0, remaining - 5))
                else:
                    break
            else:
                tier = fitting[0]
        attempts += 1
        try:
            proc = subprocess.run(
                [sys.executable, __file__, "--once",
                 "--tier", str(tier["tier"])],
                capture_output=True, text=True, timeout=tier["timeout"])
            lines = _parse_lines(proc.stdout)
        except subprocess.TimeoutExpired as e:
            out = e.stdout
            if isinstance(out, bytes):
                out = out.decode("utf-8", "replace")
            lines = _parse_lines(out or "")
        for line in lines:
            if _better(line, best):
                best = line
        if best is not None:
            healthy = TIERS[best["tier"]]["healthy"]
            best["degraded"] = bool(
                best["value"] < healthy * WATERMARK_FRACTION)
            best["attempts"] = attempts
            if best["tier"] > 0:
                best["fallback_tier"] = best["tier"]
            print(json.dumps(best), flush=True)  # best-so-far checkpoint
            if best["tier"] == 0 and not best["degraded"] \
                    and best.get("vs_baseline_basis") == "measured":
                return 0  # healthy headline measurement — done
        if i < len(plan) - 1:
            sleep = SLEEPS_S[min(i, len(SLEEPS_S) - 1)]
            if time.monotonic() - start + sleep < TOTAL_BUDGET_S:
                time.sleep(sleep)
    if best is None:
        print(json.dumps({"metric": "appnp_propagation_steps_per_s",
                          "value": 0.0, "unit": "steps/s",
                          "vs_baseline": 0.0,
                          "error": "all attempts hung or failed "
                                   "(degraded TPU tunnel window)",
                          "attempts": attempts,
                          "last_healthy_recorded_steps_per_s":
                              TIERS[0]["healthy"],
                          "last_healthy_recorded_note":
                              "BASELINE.md 2026-08-17, banded pallas "
                              "kernel, NOT measured this run"}))
        return 1
    best = upgrade_basis(best,
                         TOTAL_BUDGET_S - (time.monotonic() - start))
    print(json.dumps(best), flush=True)
    return 0


if __name__ == "__main__":
    argv = sys.argv[1:]
    if "--warm" in argv:
        sys.exit(warm())
    if "--xla-only" in argv:
        tier = 0
        if "--tier" in argv:
            tier = int(argv[argv.index("--tier") + 1])
        sys.exit(measure_xla_only(tier))
    if "--once" in argv:
        tier = 0
        if "--tier" in argv:
            tier = int(argv[argv.index("--tier") + 1])
        sys.exit(measure_once(tier))
    sys.exit(main())
